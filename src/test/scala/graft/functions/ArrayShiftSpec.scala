package graft.functions

import graft.TestSpark
import graft.lagops.ArrayLag
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd ArrayShiftExpr must agree exactly with the built-in
  * composition (concat/array_repeat/slice) it replaces.
  */
class ArrayShiftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches built-in composition on real embeddings, fill and null-fill") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    for ((k, fill) <- Seq((0, None), (2, None), (5, Some(0.5f)),
        (64, Some(1f)), (100, None))) {
      val fillCol = fill.map(f => lit(f)).getOrElse(lit(null).cast("float"))
      val both = emb.select(
        ArrayLag.shift(col("embedding"), k, fillCol).as("builtin"),
        ArrayShiftExpr(col("embedding"), k, fill).as("native"))
      val bad = both.filter(
        !(col("builtin") <=> col("native"))).count()
      assert(bad == 0, s"k=$k fill=$fill: $bad rows differ")
    }
  }

  test("null rows and nested nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, null, 3f)),
      (2L, null.asInstanceOf[Seq[java.lang.Float]])).toDF("id", "a")
    val out = df.select(col("id"),
      ArrayShiftExpr(col("a"), 1, Some(9f)).as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1)))
      .toMap
    assert(out(1L) == Seq(9f, 1f, null))
    assert(out(2L) == null)
  }

  test("stays inside whole-stage codegen") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(ArrayShiftExpr(col("embedding"), 2, None))
      .queryExecution.executedPlan
    // the "*(n)" prefix in the plan string marks a WholeStageCodegen span
    assert(plan.toString.startsWith("*("),
      s"projection not codegen'd:\n$plan")
  }
}
