package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe (r17 optimization): stage + job-count breakdown of the
  * pair_neardup_probe_updated row (image modality) — the r16 verdict's
  * top target (8 of the top-15 bench rows are this family). Replicates
  * SparkEntry.pairUpdatedStored step by step against the persisted
  * stores and reports (a) wall seconds per stage, (b) Spark JOB COUNT
  * per stage (the family's floor was measured as ~15 fixed-latency
  * jobs per row — eager broadcast builds + bounded localCheckpoints).
  * Usage: runMain graft.ProbePairStages [sfDir]
  */
object ProbePairStages {
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
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    val sfBase = new java.io.File(dir).getName
    val tSd = s"benchdata/stores/$sfBase/minhash"
    val mSd = s"benchdata/stores/$sfBase/media_image"
    require(new java.io.File(s"$tSd/signatures/_SUCCESS").exists(),
      s"minhash store missing at $tSd — run the bench once first")
    require(new java.io.File(s"$mSd/fingerprints/_SUCCESS").exists(),
      s"media_image store missing at $mSd")

    val d = _root_.graft.sources.Tables.documents(spark, dir)
    val ids = d.select(col("doc_id"))
    val bucket = _root_.graft.util.Sampling.md5Bucket(col("doc_id"))
    def imageSig(imgs: DataFrame): DataFrame =
      _root_.graft.multimodal.Multimodal.dhashFeatures(imgs)
        .filter(col("decodable"))
        .select(col("media_id"), col("dhash"))
    def gen(i: DataFrame, base: Boolean, twins: Boolean): DataFrame =
      _root_.graft.multimodal.Multimodal.syntheticImagesNearDup(
        i, "doc_id", base = base, twins = twins)

    def timed[T](label: String)(body: => T): T = {
      System.gc()
      val j0 = jobs.get(); val t = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t) / 1e9
      println(f"PAIRSTAGE $label%-28s ${dt}%8.3f s  jobs=${jobs.get() - j0}")
      r
    }

    // one full warm pass first (JIT + codegen + store footer caches)
    def fullRow(): DataFrame = {
      val tStore = SignatureStore.read(spark, tSd)
      val tStore0 = SignatureStore.Store(
        tStore.banded.filter(
          _root_.graft.util.Sampling.md5Bucket(col("doc_id")) >= 5),
        tStore.shingleHashes.filter(
          _root_.graft.util.Sampling.md5Bucket(col("doc_id")) >= 5))
      val mStore0 = MediaStore.read(spark, mSd)
        .filter(_root_.graft.util.Sampling.md5Bucket(col("media_id")) >= 5)
      val incTextsA = d.filter(bucket < 5).select(col("doc_id"), col("text"))
      val incFpsA = imageSig(gen(ids.filter(bucket < 5), true, false))
        .localCheckpoint()
      val probeA = Dedup.pairNearDupStored(incTextsA, tStore0,
        incFpsA, mStore0, "doc_id", "text", "media_id", "dhash",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5,
        maxHamming = 3, maxBucket = 64)
      val accIds = probeA.filter(col("is_new")).select(col("doc_id"))
        .localCheckpoint()
      val accStore = SignatureStore.build(
        incTextsA.join(broadcast(accIds), "doc_id"), "doc_id", "text",
        shingleSize = 3, bands = 8, rowsPerBand = 2)
      val tStore1 = SignatureStore.Store(
        tStore0.banded.unionByName(accStore.banded.localCheckpoint()),
        tStore0.shingleHashes.unionByName(
          accStore.shingleHashes.localCheckpoint()))
      val mStore1 = mStore0.unionByName(incFpsA.join(
        broadcast(accIds.withColumnRenamed("doc_id", "media_id")),
        "media_id"))
      val twinTexts = d.filter(bucket < 5)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          concat(col("text"), lit(" repost")).as("text"))
      val incTextsB = d.filter(bucket >= 85)
        .select(col("doc_id"), col("text")).unionByName(twinTexts)
      val incFpsB = imageSig(gen(ids.filter(bucket >= 85), true, false)
        .unionByName(gen(ids, false, true)))
      Dedup.pairNearDupStored(incTextsB, tStore1, incFpsB,
        mStore1, "doc_id", "text", "media_id", "dhash",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5,
        maxHamming = 3, maxBucket = 64)
    }
    println("warm pass...")
    fullRow().queryExecution.toRdd.count()
    fullRow().queryExecution.toRdd.count()

    // ---- decomposed, measured pass ----
    println("decomposed pass:")
    val tStore = SignatureStore.read(spark, tSd)
    val tStore0 = SignatureStore.Store(
      tStore.banded.filter(
        _root_.graft.util.Sampling.md5Bucket(col("doc_id")) >= 5),
      tStore.shingleHashes.filter(
        _root_.graft.util.Sampling.md5Bucket(col("doc_id")) >= 5))
    val mStore0 = MediaStore.read(spark, mSd)
      .filter(_root_.graft.util.Sampling.md5Bucket(col("media_id")) >= 5)
    val incTextsA = d.filter(bucket < 5).select(col("doc_id"), col("text"))
    val incFpsA = timed("A_img_decode_ckpt") {
      imageSig(gen(ids.filter(bucket < 5), true, false)).localCheckpoint()
    }
    val probeA = Dedup.pairNearDupStored(incTextsA, tStore0,
      incFpsA, mStore0, "doc_id", "text", "media_id", "dhash",
      shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5,
      maxHamming = 3, maxBucket = 64)
    val accIds = timed("A_probe_plus_accIds_ckpt") {
      probeA.filter(col("is_new")).select(col("doc_id")).localCheckpoint()
    }
    val accStore = SignatureStore.build(
      incTextsA.join(broadcast(accIds), "doc_id"), "doc_id", "text",
      shingleSize = 3, bands = 8, rowsPerBand = 2)
    val tStore1 = timed("accStore_two_ckpts") {
      SignatureStore.Store(
        tStore0.banded.unionByName(accStore.banded.localCheckpoint()),
        tStore0.shingleHashes.unionByName(
          accStore.shingleHashes.localCheckpoint()))
    }
    val mStore1 = mStore0.unionByName(incFpsA.join(
      broadcast(accIds.withColumnRenamed("doc_id", "media_id")),
      "media_id"))
    val twinTexts = d.filter(bucket < 5)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(col("text"), lit(" repost")).as("text"))
    val incTextsB = d.filter(bucket >= 85)
      .select(col("doc_id"), col("text")).unionByName(twinTexts)
    val incFpsB = imageSig(gen(ids.filter(bucket >= 85), true, false)
      .unionByName(gen(ids, false, true)))
    val bRow = Dedup.pairNearDupStored(incTextsB, tStore1,
      incFpsB, mStore1, "doc_id", "text", "media_id", "dhash",
      shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5,
      maxHamming = 3, maxBucket = 64)
    timed("B_probe_drain") { bRow.queryExecution.toRdd.count() }

    // ---- isolated legs of the B probe, built fresh (warm kernels) ----
    timed("B_text_leg_only") {
      val (_, tver) = Dedup.minhashIncrementalStoredVerified(
        incTextsB, tStore1, "doc_id", "text", 3, 8, 2, 0.5, 64)
      tver.queryExecution.toRdd.count()
    }
    timed("B_media_leg_only") {
      val (_, mver) = Dedup.hammingIncrementalVerified(
        incFpsB, mStore1, "media_id", "dhash", 3, 64)
      mver.queryExecution.toRdd.count()
    }
    timed("B_img_decode_only") {
      imageSig(gen(ids.filter(bucket >= 85), true, false)
        .unionByName(gen(ids, false, true))).queryExecution.toRdd.count()
    }
    timed("B_text_sign_only") {
      Dedup.shingleSetsOf(
        _root_.graft.util.Par.spread(incTextsB), "doc_id", "text", 3)
        .queryExecution.toRdd.count()
    }
    // full end-to-end again for the job count record
    timed("full_row_end_to_end") { fullRow().queryExecution.toRdd.count() }
    timed("full_row_again") { fullRow().queryExecution.toRdd.count() }
    spark.stop()
  }
}
