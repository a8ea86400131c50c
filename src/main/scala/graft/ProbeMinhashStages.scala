package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16 optimization): stage breakdown of the stored-minhash
  * probe path — where do `dedup_minhash_probe`'s seconds actually go?
  * Times each piece of [[graft.dedup.Dedup.minhashIncrementalStored]]
  * separately with the bench's toRdd drain.
  * Usage: runMain graft.ProbeMinhashStages [sfDir]
  */
object ProbeMinhashStages {
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
    
    val d = _root_.graft.sources.Tables.documents(spark, dir)
    val bucket = _root_.graft.util.Sampling.md5Bucket(col("doc_id"))
    val inc = d.filter(bucket >= 70 && bucket < 85)
    val sd = java.nio.file.Files.createTempDirectory("mhstage").toString
    SignatureStore.write(
      SignatureStore.build(d.filter(bucket < 70), "doc_id", "text"), sd)
    val store = SignatureStore.read(spark, sd)

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        System.gc()
        val t = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t) / 1e9
      }
      once() // warm
      val v = Seq(once(), once()).min
      println(f"MHSTAGE $label%-24s $v%.3f")
    }

    time("inc_scan_only") { inc }
    time("inc_shingles") {
      Dedup.shingleSetsOf(_root_.graft.util.Par.spread(inc), "doc_id", "text", 3) }
    def ckptSh(): org.apache.spark.sql.DataFrame = Dedup.shingleSetsOf(
      _root_.graft.util.Par.spread(inc), "doc_id", "text", 3).localCheckpoint()
    locally {
      // checkpoint cost: measure wall of the localCheckpoint call
      def once(): Double = {
        System.gc(); val t = System.nanoTime(); ckptSh()
        (System.nanoTime() - t) / 1e9
      }
      once(); val v = Seq(once(), once()).min
      println(f"MHSTAGE ckpt_shingles            $v%.3f")
    }
    val incSh = ckptSh()
    locally {
      def once(): Double = {
        System.gc(); val t = System.nanoTime()
        Dedup.bandKeysOf(incSh, 8, 2).localCheckpoint()
        (System.nanoTime() - t) / 1e9
      }
      once(); val v = Seq(once(), once()).min
      println(f"MHSTAGE ckpt_banded              $v%.3f")
    }
    val incBanded = Dedup.bandKeysOf(incSh, 8, 2).localCheckpoint()
    time("store_banded_scan") { store.banded }
    time("store_hashes_scan") { store.shingleHashes }
    val incKeys = incBanded.select(col("band"), col("bucket")).distinct()
    time("matched") {
      store.banded.join(broadcast(incKeys), Seq("band", "bucket")) }
    time("capped_window") {
      val matched = store.banded.join(broadcast(incKeys), Seq("band", "bucket"))
      matched.withColumn("_n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("bucket"))))
        .filter(col("_n") <= 64) }
    time("full_probe") {
      Dedup.minhashIncrementalStored(inc, store, "doc_id", "text",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5) }
    spark.stop()
  }
}
