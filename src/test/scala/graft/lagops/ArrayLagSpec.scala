package graft.lagops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Array-encoded lag (reference ndarray adapters, src/ndarray_support.rs):
  * truncating shift with head fill, per row.
  */
class ArrayLagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shifted(arr: Seq[Double], k: Int, fill: Option[Double]): Seq[Any] = {
    import spark.implicits._
    val df = Seq(Tuple1(arr)).toDF("a")
    val f = fill.map(lit).getOrElse(lit(null).cast("double"))
    df.select(ArrayLag.shift(col("a"), k, f).as("out"))
      .collect().head.getSeq[Any](0)
  }

  test("shift 0 is identity") {
    assert(shifted(Seq(1, 2, 3, 4), 0, None) == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("truncating shift, not rotation (src/lib.rs:262-264)") {
    assert(shifted(Seq(1, 2, 3, 4), 2, Some(9.0)) == Seq(9.0, 9.0, 1.0, 2.0))
  }

  test("null fill heads") {
    assert(shifted(Seq(1, 2, 3), 1, None) == Seq(null, 1.0, 2.0))
  }

  test("k >= length: all fill, same length") {
    assert(shifted(Seq(1, 2), 5, Some(0.0)) == Seq(0.0, 0.0))
  }

  test("matrix: caller lag order preserved") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("a")
    val out = df.select(
      ArrayLag.matrix(col("a"), "a", Seq(1, 3, 2), lit(0.0)): _*)
    assert(out.columns.toSeq == Seq("a_lag_1", "a_lag_3", "a_lag_2"))
    val r = out.collect().head
    assert(r.getSeq[Double](0) == Seq(0.0, 1.0, 2.0))
    assert(r.getSeq[Double](1) == Seq(0.0, 0.0, 0.0))
    assert(r.getSeq[Double](2) == Seq(0.0, 0.0, 1.0))
  }
}
