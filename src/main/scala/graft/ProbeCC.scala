package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: pair counts and cluster structure of the two LSH pair
  * graphs at a given SF — sizes the connected-components workload
  * (rounds ≈ component diameter).
  */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    for ((name, pairs) <- Seq(
      "minhash" -> graft.dedup.Dedup.minhashLsh(docs, "doc_id", "text",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5),
      "simhash" -> graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3))) {
      val n = pairs.count()
      val cc = graft.dedup.Dedup.clusters(pairs)
      val stats = cc.agg(countDistinct(col("cluster_id")).as("nc"),
        max(col("cluster_size")).as("maxsz"), count(lit(1)).as("nodes"))
        .head()
      println(s"PROBE $name pairs=$n clusters=${stats.getLong(0)} " +
        s"maxSize=${stats.getLong(1)} nodes=${stats.getLong(2)}")
    }
    spark.stop()
  }
}
