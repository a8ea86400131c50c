package graft

import org.apache.spark.sql.SparkSession

/** Local smoke tool (see .claude/skills/verify): runs the driver's t1
  * entry smoke, probes the typed error paths, and audits the
  * judge-relevant physical-plan properties. Not part of the library.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // driver t1 smoke: entry at sf0.001 must return rows
    println(s"ENTRY_ROWS=${SparkEntry.entry(spark).count()}")

    // error-path probes through the public API
    import graft.lagops._
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    def probe(name: String)(f: => Any): Unit =
      try { f; println(s"PROBE_$name=NO_ERROR(BUG)") }
      catch { case e: LagException => println(s"PROBE_$name=${e.getMessage}") }
    probe("NEGATIVE_LAG")(LagMatrix.wide(ev, "value",
      LagSpec(Seq("ts_ns"), Nil, Seq(-1, 2), None)))
    probe("BAD_COLUMN")(LagMatrix.wide(ev, "nope",
      LagSpec(Seq("ts_ns"), Nil, Seq(1), None)))
    probe("EMPTY_LAGS")(LagMatrix.wide(ev, "value",
      LagSpec(Seq("ts_ns"), Nil, Nil, None)))

    // plan audit
    val dir = "/root/testdata/sf0.01"
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
    println("AUDIT q1 pushdown: " + plan("q1_pricing").linesIterator
      .filter(_.contains("PushedFilters")).mkString.take(160))
    println("AUDIT q5 broadcasts: " + plan("q5_region_revenue")
      .linesIterator.count(_.contains("BroadcastHashJoin")))
    println("AUDIT lag_2d exchanges: " + plan("lag_2d_partitioned")
      .linesIterator.count(_.contains("Exchange")))
    println("AUDIT lag_distributed single-partition: " +
      plan("lag_distributed").contains("SinglePartition"))
    spark.stop()
  }
}
