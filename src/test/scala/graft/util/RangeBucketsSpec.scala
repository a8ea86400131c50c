package graft.util

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeBucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucket ids are monotone in the key and reproducible") {
    import spark.implicits._
    val df = new scala.util.Random(5).shuffle((0 until 1000).toList)
      .map(_.toLong).toDF("k")
    val bounds = RangeBuckets.boundaries(df, "k", 8)
    assert(bounds.length <= 7 && bounds.sorted.sameElements(bounds))
    val assigned = df
      .select(col("k"), RangeBuckets.bucketCol(col("k"), bounds).as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    // monotone: bucket never decreases as the key grows
    assert(assigned.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    // deterministic: a second evaluation assigns identically (the whole
    // point vs. spark_partition_id over a re-sampled range exchange)
    val again = df
      .select(col("k"), RangeBuckets.bucketCol(col("k"), bounds).as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(assigned.sameElements(again))
    // roughly balanced (quantile cut points, 0.1% error)
    val sizes = assigned.groupBy(_._2).map(_._2.length)
    assert(sizes.max <= 3 * sizes.min, s"unbalanced: $sizes")
  }

  test("degenerate inputs: empty frame and constant key") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k")
    assert(RangeBuckets.boundaries(empty, "k", 8).isEmpty)
    val const = Seq.fill(100)(7L).toDF("k")
    val b = RangeBuckets.boundaries(const, "k", 8)
    // all cut points collapse to the single value (deduped)
    assert(b.length <= 1)
    assert(RangeBuckets.boundaries(const, "k", 1).isEmpty)
  }
}
