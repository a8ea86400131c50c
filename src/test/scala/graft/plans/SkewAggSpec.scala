package graft.plans

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted two-phase stats equal the plain groupBy") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val salted = SkewAgg.saltedStats(ev, Seq("event_type"), "value", 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total"),
        min("value"), max("value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted == plain)
  }
}
