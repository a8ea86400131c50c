package graft.lagops

import graft.TestSpark
import graft.TestSpark.seriesDf
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** DistributedLag must equal the single-partition global window bit for
  * bit — on synthetic series and on real data across bucket boundaries.
  */
class DistributedLagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("equals naive global lag on a small series (with fill, many buckets)") {
    val df = seriesDf((1 to 50).map(_.toDouble))
    val spec = LagSpec(Seq("t"), Nil, Seq(0, 1, 3), Some(-1.0))
    val naive = LagMatrix.wide(df, "value", spec)
    val dist = DistributedLag.wide(df, "value", spec, numBuckets = 7)
    assert(canon(dist) == canon(naive))
  }

  test("equals naive global lag on sf0.001 events (null fill)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val spec = LagSpec(Seq("ts_ns", "event_id"), Nil, Seq(1, 2, 3), None)
    val naive = LagMatrix.wide(ev, "value", spec)
      .select("event_id", "value_lag_1", "value_lag_2", "value_lag_3")
    val dist = DistributedLag.wide(ev, "value", spec, numBuckets = 16)
      .select("event_id", "value_lag_1", "value_lag_2", "value_lag_3")
    assert(canon(dist) == canon(naive))
  }

  // repartitionByRange sampling can make buckets with FEWER rows than
  // max(lags) — pads must then cascade across several earlier buckets
  // (a "previous bucket only" rule would silently fill heads with the
  // fill value). 20 rows over 64 requested buckets with maxLag=5 forces
  // every bucket to be undersized or empty.
  test("pads cascade across undersized and empty buckets") {
    val df = seriesDf((1 to 20).map(_.toDouble))
    val spec = LagSpec(Seq("t"), Nil, Seq(1, 5), Some(-1.0))
    val naive = LagMatrix.wide(df, "value", spec)
    val dist = DistributedLag.wide(df, "value", spec, numBuckets = 64)
    assert(canon(dist) == canon(naive))
  }

  // fork-safety proof for the pinned-boundary rewrite: base rows, tails
  // and pads are three subplans over the same bucketed frame; with
  // exchange reuse off each re-evaluates independently, which would let
  // a spark_partition_id()-derived bucket disagree across branches.
  // Literal cut points make the bucket a deterministic projection.
  test("fork-safe: equals naive lag with exchange reuse and AQE disabled") {
    val conf = spark.conf
    val prevReuse = conf.get("spark.sql.exchange.reuse", "true")
    val prevAqe = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.exchange.reuse", "false")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = seriesDf((1 to 100).map(_.toDouble))
      val spec = LagSpec(Seq("t"), Nil, Seq(0, 1, 4), None)
      val naive = LagMatrix.wide(df, "value", spec)
      val dist = DistributedLag.wide(df, "value", spec, numBuckets = 8)
      assert(canon(dist) == canon(naive))
    } finally {
      conf.set("spark.sql.exchange.reuse", prevReuse)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("rejects per-series specs (those parallelize via LagMatrix.wide)") {
    val df = seriesDf(Seq(1, 2, 3))
    intercept[IllegalArgumentException] {
      DistributedLag.wide(df.withColumn("s",
          org.apache.spark.sql.functions.lit("x")), "value",
        LagSpec(Seq("t"), Seq("s"), Seq(1), None))
    }
  }

  test("no single-partition exchange in the distributed plan") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val spec = LagSpec(Seq("ts_ns", "event_id"), Nil, Seq(1), None)
    val plan = DistributedLag.wide(ev, "value", spec, numBuckets = 16)
      .queryExecution.executedPlan.toString
    // the naive global window plans Exchange SinglePartition; ours must not
    assert(!plan.contains("SinglePartition"))
  }
}
