package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r17): stage breakdown of minhashLsh at anchor scale —
  * the zsf10 c32 run reads 70 s (c8: 40 s) and the historical 8×2
  * anchor read 9.75 s; the geometry is now 18×3 (scaledBandGeometry at
  * 500k docs), so which stage owns the seconds: the signature kernel,
  * the bucket-cap WINDOW (full sort of n_docs × bands rows), the
  * within-bucket self-join, or the melt verify?
  * Usage: runMain graft.dedup.ProbeLshStages [sfDir]
  */
object ProbeLshStages {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "benchdata/zsf10"
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
    val d = _root_.graft.sources.Tables.documents(spark, dir)
    val n = d.count()
    val (bands, rows) = Dedup.scaledBandGeometry(n)
    println(s"LSHSTAGE n=$n geometry=${bands}x$rows")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        System.gc()
        val t = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t) / 1e9
      }
      once()
      val v = Seq(once(), once()).min
      println(f"LSHSTAGE $label%-26s $v%8.3f")
    }

    val spreadD = _root_.graft.util.Par.spread(d)
    time("shingles_kernel") {
      Dedup.shingleSetsOf(spreadD, "doc_id", "text", 3) }
    time("banded_kernel") {
      Dedup.bandKeysOf(
        Dedup.shingleSetsOf(spreadD, "doc_id", "text", 3), bands, rows) }
    time("bucket_window_cap") {
      val banded = Dedup.bandKeysOf(
        Dedup.shingleSetsOf(spreadD, "doc_id", "text", 3), bands, rows)
      banded.withColumn("n_in_bucket",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("bucket"))))
        .filter(col("n_in_bucket") <= 64) }
    time("candidate_pairs") {
      Dedup.lshCandidatePairs(d, "doc_id", "text", 3, bands, rows, 64) }
    time("full_minhash_lsh") {
      Dedup.minhashLsh(d, "doc_id", "text", 3, -1, -1, 0.5, 64, n) }
    spark.stop()
  }
}
