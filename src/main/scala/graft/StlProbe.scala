package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adjudication probe for `stl_seasonal`'s superlinear anchors (round
  * 10 verdict task 5): times the registered shape and its candidate
  * rewrites on an anchor dir and dumps the FINAL adaptive plan, so the
  * join-back / double-window hypotheses are measured, not guessed.
  * Usage: StlProbe <sfDir> [variant ...]; variants default to all.
  */
object StlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variants = if (args.length > 1) args.drop(1).toSet
      else Set("current", "window2", "explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def events = graft.sources.Tables.events(spark, dir)
      .withColumn("hod", hour(col("ts")))
    val spec = graft.lagops.LagSpec(Seq("ts_ns", "event_id"),
      Seq("user_id"), Seq(1))

    def time(name: String)(df: => DataFrame): Unit = {
      val d = df
      val t0 = System.nanoTime()
      // full physical-plan evaluation — Dataset.count() would prune
      // the window pipeline to a bare scan count (the harness hole
      // this probe uncovered; Bench/ScaleBench now share this action)
      val n = d.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STLPROBE $name%s sec=$sec%.2f rows=$n")
    }

    if (variants("current")) {
      time("current")(graft.lagops.SeriesStats.seasonalDecompose(
        events, "value", "hod", spec, halfWidth = 12)
        .select("user_id", "event_id", "hod", "value", "trend",
          "seasonal", "remainder"))
      time("current_2nd")(graft.lagops.SeriesStats.seasonalDecompose(
        events, "value", "hod", spec, halfWidth = 12)
        .select("user_id", "event_id", "hod", "value", "trend",
          "seasonal", "remainder"))
    }
    if (variants("explain")) {
      val d = graft.lagops.SeriesStats.seasonalDecompose(
        events, "value", "hod", spec, halfWidth = 12)
        .select("user_id", "event_id", "hod", "value", "trend",
          "seasonal", "remainder")
      d.count()
      println("==== FINAL ADAPTIVE PLAN ====")
      println(d.queryExecution.executedPlan.toString.take(8000))
      println("==== COUNT PLAN (what ScaleBench times) ====")
      println(d.groupBy().count().queryExecution.executedPlan
        .toString.take(4000))
    }
    spark.stop()
  }
}
