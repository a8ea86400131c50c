package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Random-access probe for the `.warc.gz` offset index: write the
  * twin documents table as member-per-record gzip shards WITH the CDX
  * sidecar, then time (a) fetching K records through
  * `Warc.readAt(offset, length)` vs (b) the full streaming scan.
  * The point at the 100× anchor: (a) is O(K records) — flat as the
  * corpus grows — while (b) pays the whole-shard inflate, so the
  * per-record fetch cost must NOT scale with corpus size.
  *
  * Usage: WarcIndexProbe <sfDir> [K=100]
  */
object WarcIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_warc_idx_probe").toString
    val d = sources.Tables.documents(spark, sfDir).select(
      concat(lit("http://graft.invalid/doc/"), col("doc_id"))
        .as("target_uri"),
      col("text"))
    val t0 = System.nanoTime()
    sources.Warc.writeWet(d, dir, gzipPerRecord = true, writeIndex = true)
    val tWrite = (System.nanoTime() - t0) / 1e9
    // deterministic K-record want-list: every (n/k)-th index row
    val idx = sources.Warc.readIndex(spark, dir)
      .orderBy("record_id").collect()
    val wanted = (0 until k).map(i => idx(i * idx.length / k))
    val conf = spark.sparkContext.hadoopConfiguration
    val t1 = System.nanoTime()
    var bytes = 0L
    wanted.foreach { r =>
      val rec = sources.Warc.readAt(conf, r.getString(0), r.getLong(2),
        r.getLong(3))
      bytes += rec.content.length
    }
    val tRandom = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val n = sources.Warc.read(spark, dir).count()
    val tScan = (System.nanoTime() - t2) / 1e9
    println(f"""WARC_INDEX_PROBE {"sf":"$sfDir","records":$n,"k":$k,""" +
      f""""write_sec":$tWrite%.3f,"random_k_sec":$tRandom%.3f,""" +
      f""""per_record_ms":${tRandom * 1000 / k}%.3f,"full_scan_sec":$tScan%.3f,""" +
      f""""bytes_fetched":$bytes}""")
    spark.stop()
  }
}
