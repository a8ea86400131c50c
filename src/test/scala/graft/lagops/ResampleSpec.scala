package graft.lagops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ohlc: open/close follow the (t, id) order, high/low/n per bucket") {
    import spark.implicits._
    // one series, two buckets (t div 10): values arrive out of row-order
    // to prove open/close use the ORDER key, not arrival order
    val df = Seq(
      ("a", 13L, 2L, 7.0), ("a", 11L, 1L, 3.0), ("a", 15L, 3L, 1.0),
      ("a", 30L, 4L, 9.0),
      ("b", 12L, 5L, 5.0)).toDF("sid", "t", "id", "value")
    val out = Resample.ohlc(
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_seconds(
            org.apache.spark.sql.functions.expr("t * 3600"))),
        "value", "ts", Seq("sid"), Seq("t", "id"), "day")
    // t hours since epoch: t in [11..15] → 1970-01-01; t=30 → 1970-01-02
    val rows = out.orderBy("sid", "bucket")
      .select("sid", "value_open", "value_high", "value_low", "value_close", "n")
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows == Seq(
      ("a", 3.0, 7.0, 1.0, 1.0, 3L), // day1: order 11,13,15 → open 3, close 1
      ("a", 9.0, 9.0, 9.0, 9.0, 1L), // day2: singleton
      ("b", 5.0, 5.0, 5.0, 5.0, 1L)))
  }

  test("ohlc plan: one combinable hash aggregate, no Window operator") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("s", i, i, i.toDouble))
      .toDF("sid", "t", "id", "value")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_seconds(
          org.apache.spark.sql.functions.expr("t * 60")))
    val out = Resample.ohlc(df, "value", "ts", Seq("sid"), Seq("t", "id"), "hour")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    // min_by/max_by keep the whole reduction a two-phase hash agg: the
    // shuffle carries per-(series, bucket) partials, never event rows
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_"), p)
  }
}
