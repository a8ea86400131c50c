package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: times just the connected-components queries (the round-3
  * bench ceiling) under the bench session config, with the same warmup
  * family Bench.scala drives — isolates the CC-loop overhead fix's
  * effect from the 52-query run.
  */
object ProbeCCBench {
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
    // warmup: drive the kernel families these queries use
    try {
      val docs = graft.sources.Tables.documents(spark, sfDir).limit(600)
      graft.dedup.Dedup.minhashLsh(docs, "doc_id", "text").count()
      graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text").count()
      val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(600)
      graft.simops.Similarity.nearDupPairsBanded(
        emb, "vec_id", "embedding", 0.4, numPlanes = 64, bands = 8).count()
    } catch { case _: Throwable => }
    for (q <- Seq("dedup_simhash", "dedup_clusters_simhash", "dedup_clusters",
        "embedding_clusters", "dedup_resolve")) {
      System.gc()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"PROBE $q rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
