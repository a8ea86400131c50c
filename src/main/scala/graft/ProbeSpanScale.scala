package graft

import org.apache.spark.sql.SparkSession

/** Isolated A/B for the corpus-scaled winnow window: times
  * Dedup.spanPairs at explicit w values (and AUTO) on one dir, fresh
  * plans each pass, two-pass min — the fixture behind the round-8
  * BASELINE.md dedup_spans re-anchor.
  *
  * Usage: runMain graft.ProbeSpanScale <sfDir> [w,w,...|auto]
  */
object ProbeSpanScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "benchdata/zsf1"
    val ws = (if (args.length > 1) args(1) else "4,7,auto").split(",")
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
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.count() // warm the scan
    ws.foreach { wSpec =>
      val w = if (wSpec == "auto") -1 else wSpec.toInt
      var best = Double.MaxValue; var rows = 0L
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        rows = graft.dedup.Dedup.spanPairs(docs, "doc_id", "text",
          k = 8, w = w, minShared = 5, maxDf = 16).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"SPANSCALE {dir} w=$wSpec rows=$rows sec=$best%.2f")
    }
    spark.stop()
  }
}
