package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.textops.TextOps

/** The persisted EXACT-dedup ingest index: the corpus's normalized
  * content fingerprints as a bare parquet column plus a Bloom
  * membership sketch over their xxhash64.
  *
  * Why a sketch on top of a fingerprint store: the exact daily-ingest
  * decision ([[Dedup.exactIncremental]]) broadcasts the INCREMENT's
  * distinct fingerprints into the corpus-side probe — O(increment)
  * broadcast bytes. At recrawl scale the increment is the same order
  * as the corpus, and the broadcast stops being trivial. The Bloom
  * sketch (fixed ~7 bits/key at 3% fpp, built ONCE at corpus-ingest
  * time) prefilters the increment MAP-SIDE: only bloom-POSITIVE
  * fingerprints enter the verify join, so the broadcast shrinks to
  * O(true dups + fpp·increment) while the decision stays EXACT — a
  * Bloom filter has no false negatives, and the verify join against
  * the fingerprint store removes its false positives. The corpus
  * itself is never read at probe time at all: the store's fingerprint
  * column (16 bytes/doc) is the only corpus-derived input.
  */
object BloomStore {

  final case class Store(fps: DataFrame, bloom: BloomFilter)

  /** Default false-positive rate: 3% wastes ~3% of the verify
    * broadcast on ghosts — far below the win of not broadcasting the
    * other 97% — at ~7.3 bits per corpus key.
    */
  val DefaultFpp = 0.03

  final case class Meta(expectedN: Long, fpp: Double)

  def build(corpus: DataFrame, idCol: String, textCol: String,
            fpp: Double = DefaultFpp): (Store, Meta) = {
    val fps = graft.util.Par.spread(corpus)
      .select(TextOps.fingerprint(col(textCol)).as("fingerprint"))
    val n = math.max(fps.count(), 1L)
    val bloom = fps.select(xxhash64(col("fingerprint")).as("fp64"))
      .stat.bloomFilter("fp64", n, fpp)
    (Store(fps, bloom), Meta(n, fpp))
  }

  private def conf = new org.apache.hadoop.conf.Configuration()

  private def writeBloom(bloom: BloomFilter, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/bloom.bin")
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try bloom.writeTo(out) finally out.close()
  }

  def write(store: Store, meta: Meta, dir: String): Unit = {
    store.fps.write.mode("overwrite").parquet(s"$dir/fingerprints")
    writeBloom(store.bloom, dir)
    val mp = new org.apache.hadoop.fs.Path(s"$dir/bloom.meta")
    val out = mp.getFileSystem(conf).create(mp, true)
    try out.write(s"${meta.expectedN} ${meta.fpp}".getBytes("UTF-8"))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): (Store, Meta) = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/bloom.bin")
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    val bloom = try BloomFilter.readFrom(in) finally in.close()
    val mp = new org.apache.hadoop.fs.Path(s"$dir/bloom.meta")
    val mIn = mp.getFileSystem(conf).open(mp)
    val ms = try new java.io.BufferedReader(
        new java.io.InputStreamReader(mIn, "UTF-8")).readLine().trim.split(" ")
      finally mIn.close()
    (Store(spark.read.parquet(s"$dir/fingerprints"), bloom),
      Meta(ms(0).toLong, ms(1).toDouble))
  }

  /** Close the daily loop O(increment): the accepted increment's
    * fingerprints append to the store files, and a sketch built over
    * them WITH THE ORIGINAL GEOMETRY (same expectedN/fpp → same bit
    * size and hash count) merges into the persisted one — Bloom
    * insertion is monotone, no rebuild, no rewrite; fpp drifts up
    * slowly until a compaction refits at the grown count.
    */
  def appendWrite(acceptedFps: DataFrame, store: Store, meta: Meta,
                  dir: String): Unit = {
    acceptedFps.write.mode("append").parquet(s"$dir/fingerprints")
    val inc = acceptedFps.select(xxhash64(col("fingerprint")).as("fp64"))
      .stat.bloomFilter("fp64", meta.expectedN, meta.fpp)
    store.bloom.mergeInPlace(inc)
    writeBloom(store.bloom, dir)
  }
}
