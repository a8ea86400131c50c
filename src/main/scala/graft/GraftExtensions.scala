package graft

import graft.functions.{ArrayShiftExpr, DotProductExpr, KgramHashesExpr, MinHashSigExpr, SimHashAgg, WordShinglesExpr, XxSortedHashesExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the graft custom expressions as SQL functions, so
  * `spark.sql` users get the same operators as the Column API:
  *
  *   SELECT dot_product(a.embedding, b.embedding)        -- codegen'd dot
  *   SELECT array_shift(embedding, 2, CAST(NULL AS FLOAT))
  *   SELECT simhash_agg(xxhash64(tok)) ... GROUP BY doc_id
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` (cluster config), or
  *  - `GraftFunctions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[graft] val descriptors: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("array_shift",
      new ExpressionInfo(classOf[ArrayShiftExpr].getName, "array_shift"),
      exprs => exprs match {
        case Seq(arr, k) =>
          ArrayShiftExpr(arr, litInt(k, "lag"), None)
        case Seq(arr, k, Literal(null, _)) =>
          ArrayShiftExpr(arr, litInt(k, "lag"), None)
        case Seq(arr, k, Literal(fill, _)) =>
          ArrayShiftExpr(arr, litInt(k, "lag"), Some(fill))
        case other => throw new IllegalArgumentException(
          s"array_shift(array, lag[, fill]) — got ${other.size} args")
      }),
    ("dot_product",
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      exprs => DotProductExpr(exprs(0), exprs(1))),
    ("simhash_agg",
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      exprs => SimHashAgg(exprs.head).toAggregateExpression()),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      exprs => MinHashSigExpr(exprs(0), litInt(exprs(1), "numHashes"))),
    ("xx_sorted_hashes",
      new ExpressionInfo(classOf[XxSortedHashesExpr].getName, "xx_sorted_hashes"),
      exprs => XxSortedHashesExpr(exprs(0))),
    ("kgram_hashes",
      new ExpressionInfo(classOf[KgramHashesExpr].getName, "kgram_hashes"),
      exprs => KgramHashesExpr(exprs(0), litInt(exprs(1), "k"))),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "word_shingles"),
      exprs => WordShinglesExpr(exprs(0), litInt(exprs(1), "n"))))

  /** Imperative registration for sessions built without extensions. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
