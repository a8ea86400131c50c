package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the persisted-signature-store ingest claim, measured.
  * Splits a documents table by md5 bucket (>= 70 = increment), writes
  * the corpus side's SignatureStore to parquet ONCE (the amortized
  * ingest-time cost), then times the daily decision three ways:
  * direct text-rescanning incremental, store built inline, and the
  * persisted store read back from parquet (two-pass min each).
  * Usage: runMain graft.ProbeSigStore [sfDir] [cut]
  * (`cut` = md5-bucket split point, default 70; 99 gives the
  * realistic tiny-increment regime where the store's O(increment)
  * probe beats the direct form's per-ingest corpus rescan)
  */
object ProbeSigStore {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cut = if (args.length > 1) args(1).toInt else 70
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
    val d = graft.sources.Tables.documents(spark, dir)
    val bucket = graft.util.Sampling.md5Bucket(col("doc_id"))
    val inc = d.filter(bucket >= cut)
    val corpus = d.filter(bucket < cut)
    val tmp = java.nio.file.Files.createTempDirectory("sigstore").toString

    val t0 = System.nanoTime()
    graft.dedup.SignatureStore.write(
      graft.dedup.SignatureStore.build(corpus, "doc_id", "text"), tmp)
    println(f"PROBESIGSTORE build+write=${(System.nanoTime() - t0) / 1e9}%.3f")

    val store = graft.dedup.SignatureStore.read(spark, tmp)
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warmup
      val times = (1 to 2).map { _ =>
        System.gc()
        val t = System.nanoTime(); mk.count(); (System.nanoTime() - t) / 1e9
      }
      println(f"PROBESIGSTORE $label%-16s min=${times.min}%.3f")
    }
    time("direct") { graft.dedup.Dedup.minhashIncremental(
      inc, corpus, "doc_id", "text") }
    time("inline_store") {
      val s = graft.dedup.SignatureStore.build(corpus, "doc_id", "text")
      graft.dedup.Dedup.minhashIncrementalStored(inc, s, "doc_id", "text") }
    time("persisted_store") { graft.dedup.Dedup.minhashIncrementalStored(
      inc, store, "doc_id", "text") }

    // the span (winnow-fingerprint) family, same three-way comparison
    val tmp2 = java.nio.file.Files.createTempDirectory("spanstore").toString
    val t1 = System.nanoTime()
    graft.dedup.SignatureStore.writeSpans(
      graft.dedup.SignatureStore.buildSpans(corpus, "doc_id", "text"), tmp2)
    println(f"PROBESIGSTORE span_build+write=${(System.nanoTime() - t1) / 1e9}%.3f")
    val spanStore = graft.dedup.SignatureStore.readSpans(spark, tmp2)
    time("span_direct") { graft.dedup.Dedup.spanIncremental(
      inc, corpus, "doc_id", "text") }
    time("span_persisted") { graft.dedup.Dedup.spanIncrementalStored(
      inc, spanStore, "doc_id", "text") }
    spark.stop()
  }
}
