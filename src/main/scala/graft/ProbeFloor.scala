package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): what is the per-row fixed floor? Times trivial
  * plans (empty range, 10 MB scan, scan+agg, the registered
  * q1_pricing) warm, min of 3.
  * Usage: runMain graft.ProbeFloor [sfDir]
  */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t) / 1e9
      }
      once()
      val v = Seq(once(), once(), once()).min
      println(f"FLOOR $label%-22s $v%.3f")
    }
    time("range_1") { spark.range(1).toDF() }
    time("range_shuffle") {
      spark.range(1000).toDF().groupBy(col("id") % 7).count() }
    time("li_scan") { graft.sources.Tables.lineitem(spark, dir) }
    time("li_scan_fresh_read") {
      spark.read.parquet(s"$dir/lineitem.parquet") }
    time("li_agg") {
      graft.sources.Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag")).count() }
    time("q1_registered") { SparkEntry.queries("q1_pricing")(spark, dir) }
    // planning-only vs execution split for the registered q1
    locally {
      def planOnce(): Double = {
        val t = System.nanoTime()
        SparkEntry.queries("q1_pricing")(spark, dir)
          .queryExecution.executedPlan
        (System.nanoTime() - t) / 1e9
      }
      planOnce()
      val v = Seq(planOnce(), planOnce(), planOnce()).min
      println(f"FLOOR q1_plan_only           $v%.3f")
    }
    locally {
      val df = SparkEntry.queries("q1_pricing")(spark, dir)
      df.queryExecution.toRdd.count()
      def ex(): Double = {
        val t = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t) / 1e9
      }
      val v = Seq(ex(), ex(), ex()).min
      println(f"FLOOR q1_exec_same_df        $v%.3f")
    }
    time("docs_scan") { graft.sources.Tables.documents(spark, dir) }
    time("docs_spread") {
      graft.util.Par.spread(graft.sources.Tables.documents(spark, dir)) }
    spark.stop()
  }
}
