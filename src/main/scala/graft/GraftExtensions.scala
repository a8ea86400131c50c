package graft

import graft.functions.{ArrayShiftExpr, BpeCountExpr, BpeVocab, DotProductExpr, KgramHashesExpr, MinHashSigExpr, SimHashAgg, TextGateStatsExpr, WordShinglesExpr, XxSortedHashesExpr}
import org.apache.spark.sql.GraftColumnBridge
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
      exprs => WordShinglesExpr(exprs(0), litInt(exprs(1), "n"))),
    // ---- the SQL front door for the text/dedup pipeline family ----
    // text_gate_stats(text) → struct(n_tokens, n_chars, n_punct, n_stop):
    // the fused gate kernel under the same union-stopword dictionary the
    // Column API uses, so a SQL-only user computes bit-identical stats.
    ("text_gate_stats",
      new ExpressionInfo(classOf[TextGateStatsExpr].getName, "text_gate_stats"),
      exprs => TextGateStatsExpr(exprs.head, graft.textops.TextOps.unionStopwords)),
    // text_quality(text) → the composed deterministic quality score —
    // built by the SAME Column builder as the DataFrame operator, so the
    // SQL form can never drift from the engine's scoring arithmetic.
    ("text_quality",
      new ExpressionInfo(classOf[TextGateStatsExpr].getName, "text_quality"),
      exprs => GraftColumnBridge.toExpressionEager(
        graft.textops.TextOps.qualityScore(
          GraftColumnBridge.toColumn(exprs.head)))),
    // text_lang(text) → the n-gram/stopword language-ID heuristic —
    // same composed-Column construction as text_quality.
    ("text_lang",
      new ExpressionInfo(classOf[TextGateStatsExpr].getName, "text_lang"),
      exprs => GraftColumnBridge.toExpressionEager(
        graft.textops.TextOps.langId(
          GraftColumnBridge.toColumn(exprs.head)))),
    // bpe_count(text) → total BPE token count under the fixture merge
    // table (the unit every `_bpe` budget operator meters in).
    ("bpe_count",
      new ExpressionInfo(classOf[BpeCountExpr].getName, "bpe_count"),
      exprs => new BpeCountExpr(exprs.head, BpeVocab.merges)),
    // html_clean(html) → the cleaned prose under the full extraction
    // contract (block drops → tag strip → entity decode &amp;-last →
    // whitespace collapse) — the SAME Column builder the DataFrame
    // operator uses, so the SQL form cannot drift from it.
    ("html_clean",
      new ExpressionInfo(classOf[TextGateStatsExpr].getName, "html_clean"),
      exprs => GraftColumnBridge.toExpressionEager(
        graft.textops.Html.cleanText(GraftColumnBridge.toColumn(exprs.head)))),
    // html_main(html[, minWords, maxLinkPct]) → MAIN-content text (the
    // justext-core block scoring) via the same eager-bridge path.
    ("html_main",
      new ExpressionInfo(classOf[TextGateStatsExpr].getName, "html_main"),
      exprs => exprs match {
        case Seq(h) => GraftColumnBridge.toExpressionEager(
          graft.textops.Html.mainText(GraftColumnBridge.toColumn(h)))
        case Seq(h, mw, pct) => GraftColumnBridge.toExpressionEager(
          graft.textops.Html.mainText(GraftColumnBridge.toColumn(h),
            litInt(mw, "minWords"), litInt(pct, "maxLinkPct")))
        case other => throw new IllegalArgumentException(
          s"html_main(html[, minWords, maxLinkPct]) — got ${other.size} args")
      }))

  /** Imperative registration for sessions built without extensions. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
