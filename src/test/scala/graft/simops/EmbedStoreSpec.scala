package graft.simops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The persisted ANN serving index ([[VectorIndexStore]]): stored
  * probes must decide bit-identically to the in-DAG
  * [[Embed.ivfPqTopK]] they replace, frozen-index appends must make
  * increment vectors retrievable cross-increment, and compact must
  * heal double-appended retries without changing any decision.
  */
class EmbedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randomVecs(n: Int, dim: Int, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      i -> Seq.fill(dim)(rng.nextFloat() * 2 - 1)
    }.toDF("vec_id", "embedding")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    .sortBy(r => (r._1, r._4)).toSeq

  test("stored topK decides bit-identically to the in-DAG ivfPqTopK") {
    // same corpus, same geometry: the parquet round-trip (centroids +
    // codebooks + codes) must change the physics only — every
    // (query, neighbor, adist, rank) row identical
    val corpus = randomVecs(300, 16, 17)
    val q = corpus.filter(col("vec_id") < 8)
    val direct = rows(Embed.ivfPqTopK(q, corpus, "vec_id", "embedding",
      kNN = 5, nlist = 8, nprobe = 3, m = 4, k = 8, iters = 1,
      fitSamplePct = 60, dim = 16))
    val sd = java.nio.file.Files.createTempDirectory("vec_store").toString
    VectorIndexStore.write(VectorIndexStore.build(corpus, "vec_id",
      "embedding", nlist = 8, m = 4, k = 8, iters = 1,
      fitSamplePct = 60, dim = 16), sd)
    val stored = rows(VectorIndexStore.topK(q,
      VectorIndexStore.read(spark, sd), "vec_id", "embedding",
      kNN = 5, nprobe = 3))
    assert(stored == direct)
    assert(direct.nonEmpty)
  }

  test("frozen-index append: a query retrieves a vector appended in a prior increment") {
    // corpus = ids 0..199 (the index's fit input); increment A = a
    // fresh vector (id 900), appended ENCODED UNDER THE FROZEN index;
    // query = an exact copy of it (id 500). The copy assigns to the
    // same list (identical kernel input -> identical argmax) and its
    // residual reconstructs to the same codes, so the appended vector
    // MUST come back rank 1 with the minimal adist for that query —
    // the cross-increment retrieval the _updated row certifies.
    val corpus = randomVecs(200, 16, 23)
    val a900 = randomVecs(1, 16, 77)
      .select((col("vec_id") + 900).as("vec_id"), col("embedding"))
    val q500 = a900.select(lit(500L).as("vec_id"), col("embedding"))
    val sd = java.nio.file.Files.createTempDirectory("vec_ab").toString
    val built = VectorIndexStore.build(corpus, "vec_id", "embedding",
      nlist = 8, m = 4, k = 8, iters = 1, fitSamplePct = 60, dim = 16)
    VectorIndexStore.write(built, sd)
    val store0 = VectorIndexStore.read(spark, sd)
    VectorIndexStore.appendWrite(
      VectorIndexStore.encode(a900, "vec_id", "embedding", store0.index), sd)
    val got = rows(VectorIndexStore.topK(q500,
      VectorIndexStore.read(spark, sd), "vec_id", "embedding",
      kNN = 3, nprobe = 3))
    val top = got.find(_._4 == 1).get
    assert(top._2 == 900L,
      s"appended vector must be the copy-query's rank-1 neighbor: $got")
  }

  test("compact heals a double-appended retry without changing decisions") {
    val corpus = randomVecs(250, 16, 31)
    val inc = randomVecs(270, 16, 31).filter(col("vec_id") >= 250)
    val q = corpus.filter(col("vec_id") < 6)
    val sd = java.nio.file.Files.createTempDirectory("vec_compact").toString
    VectorIndexStore.write(VectorIndexStore.build(corpus, "vec_id",
      "embedding", nlist = 8, m = 4, k = 8, iters = 1,
      fitSamplePct = 60, dim = 16), sd)
    val store0 = VectorIndexStore.read(spark, sd)
    val baseN = store0.coded.count()
    val encoded = VectorIndexStore.encode(inc, "vec_id", "embedding",
      store0.index).localCheckpoint() // pre-compact lineage must not
                                      // chase renamed store files
    // the single-append reference decision, computed BEFORE compact
    // (its lineage reads the pre-compact store files, which the
    // rename-aside swap moves)
    val expect = rows(VectorIndexStore.topK(q, VectorIndexStore.Store(
      store0.index, store0.coded.localCheckpoint().unionByName(encoded)),
      "vec_id", "embedding", kNN = 5, nprobe = 3))
    VectorIndexStore.appendWrite(encoded, sd)
    VectorIndexStore.appendWrite(encoded, sd) // the retry
    assert(VectorIndexStore.read(spark, sd).coded.count()
      == baseN + 2 * encoded.count())
    VectorIndexStore.compact(spark, sd)
    val healed = VectorIndexStore.read(spark, sd)
    assert(healed.coded.count() == baseN + encoded.count(),
      "compact must restore one code row per vec_id")
    // post-compact probe = single-append decisions exactly
    assert(rows(VectorIndexStore.topK(q, healed, "vec_id", "embedding",
      kNN = 5, nprobe = 3)) == expect)
  }
}
