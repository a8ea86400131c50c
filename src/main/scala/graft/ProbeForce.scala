package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time a registered query with EVERY output column forced.
  *
  * Bench/ScaleBench time `.count()`, under which Catalyst prunes the
  * projection — correct for join/agg-shaped rows (their cost is the
  * shuffle the count still pays) but a pure-projection row (html
  * extraction, quality filters, per-row stats) collapses to a parquet
  * scan + count, timing the scan instead of the kernel. This probe
  * aggregates an xxhash64 over all output columns, so every expression
  * in the projection must actually evaluate — the honest per-row cost
  * for scan-stage operators, without paying a sink write.
  *
  * Usage: runMain graft.ProbeForce <sfDir> <name>[,<name>...]
  */
object ProbeForce {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeForce <sfDir> <names>")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
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
    def timeOne(name: String): (Double, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      // xxhash64 over every column: nothing prunes, nothing spills
      val h = df.select(xxhash64(df.columns.map(c => col(s"`$c`")): _*)
          .as("h"))
        .agg(sum("h"), count(lit(1))).collect().head
      ((System.nanoTime() - t0) / 1e9, h.getLong(1))
    }
    for (name <- names) {
      val (s1, _) = timeOne(name)
      val (s2, n) = timeOne(name)
      println(f"""PROBEFORCE {"query":"$name","sec":${math.min(s1, s2)}%.3f,"rows":$n,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
