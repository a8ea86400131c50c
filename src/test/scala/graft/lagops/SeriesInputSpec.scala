package graft.lagops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Ingest adapters (reference O6/O8/O9) and schema metadata (O5). */
class SeriesInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the reference's 2-series fixture (src/lib.rs:925-961 / :999-1039):
  // s0 = [1,2,3,4], s1 = [-1,-2,-3,-4]
  private val rowMajorFlat = Seq(1.0, 2.0, 3.0, 4.0, -1.0, -2.0, -3.0, -4.0)
  private val colMajorFlat = Seq(1.0, -1.0, 2.0, -2.0, 3.0, -3.0, 4.0, -4.0)

  test("row-major and column-major flats normalize to the same long form") {
    val a = SeriesInput.from2D(spark, rowMajorFlat, RowMajor(4))
      .orderBy("series_id", "t").collect().map(_.toSeq).toSeq
    val b = SeriesInput.from2D(spark, colMajorFlat, ColumnMajor(4))
      .orderBy("series_id", "t").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.take(4).map(_(2)) == Seq(1.0, 2.0, 3.0, 4.0))
    assert(a.drop(4).map(_(2)) == Seq(-1.0, -2.0, -3.0, -4.0))
  }

  test("fromSeq makes index-is-time explicit") {
    val df = SeriesInput.fromSeq(spark, Seq(42, 40, 38))
    assert(df.columns.toSeq == Seq("t", "value"))
    assert(df.orderBy("t").collect().map(_.getDouble(1)).toSeq ==
      Seq(42.0, 40.0, 38.0))
  }

  test("InvalidLength when data is not a multiple of series length " +
      "(src/lib.rs:683-686)") {
    assert(intercept[LagException](
      SeriesInput.from2D(spark, Seq(1.0, 2.0, 3.0), RowMajor(2))).kind ==
      "InvalidLength")
  }

  test("lag columns carry the lag index as schema metadata (O5 accessors)") {
    val df = SeriesInput.fromSeq(spark, Seq(1, 2, 3, 4))
    val out = LagMatrix.wide(df, "value",
      LagSpec(Seq("t"), Nil, Seq(1, 3), Some(TestSpark.INF)))
    val md1 = out.schema("value_lag_1").metadata
    val md3 = out.schema("value_lag_3").metadata
    assert(md1.getLong("lag") == 1L && md3.getLong("lag") == 3L)
    assert(md1.getBoolean("fill_sentinel"))
  }
}
