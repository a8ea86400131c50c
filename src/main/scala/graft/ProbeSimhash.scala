package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the dedup_simhash bench regression (round-2 verdict
  * item): times the query repeatedly in one session, with and without
  * the Bench warmup set, to split plan cost from JIT/ordering effects.
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // cold: no warmup at all
    time("simhash_cold") {
      SparkEntry.queries("dedup_simhash")(spark, sfDir).count()
    }
    (1 to 3).foreach { i =>
      time(s"simhash_warm$i") {
        SparkEntry.queries("dedup_simhash")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
