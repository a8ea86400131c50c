package graft.simops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The persisted ANN serving index ([[VectorIndexStore]]) at the
  * scale-true geometry: the literal and relational forest builds must
  * produce bit-identical stores (the [[Ivf.ForestLiteralMaxLists]]
  * dispatch is a physics knob, invisible to results), frozen-index
  * appends must make increment vectors retrievable cross-increment,
  * compact must heal double-appended retries without changing any
  * decision, and the stored probe's recall against exact top-k must
  * stay well above chance at the autoNlist geometry.
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

  test("literal and relational forest builds produce identical stores " +
      "and identical probe decisions") {
    // the ForestLiteralMaxLists dispatch (task: large-nlist builds go
    // through fitHierR/assignHierR) pinned at store level: literalMax=1
    // forces the relational branch at a spec-sized geometry; every
    // (query, neighbor, adist, rank) row and every stored code row
    // must be identical to the literal build's
    val corpus = randomVecs(300, 16, 17)
    val q = corpus.filter(col("vec_id") < 8)
    val lit0 = VectorIndexStore.build(corpus, "vec_id", "embedding",
      targetListSize = 32, m = 4, k = 8, iters = 1, fitSamplePct = 60,
      dim = 16)
    val rel0 = VectorIndexStore.build(corpus, "vec_id", "embedding",
      targetListSize = 32, m = 4, k = 8, iters = 1, fitSamplePct = 60,
      dim = 16, literalMax = 1)
    val sdL = java.nio.file.Files.createTempDirectory("vec_lit").toString
    val sdR = java.nio.file.Files.createTempDirectory("vec_rel").toString
    VectorIndexStore.write(lit0, sdL)
    VectorIndexStore.write(rel0, sdR)
    def codeRows(sd: String) = spark.read.parquet(s"$sd/codes")
      .select(col("vec_id"), col("list_id"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).sortBy(_._1).toSeq
    assert(codeRows(sdL) == codeRows(sdR),
      "stored (vec_id, list_id, codes) must not depend on the dispatch")
    val pl = rows(VectorIndexStore.topK(q,
      VectorIndexStore.read(spark, sdL), "vec_id", "embedding",
      kNN = 5, nprobe = 3))
    val pr = rows(VectorIndexStore.topK(q,
      VectorIndexStore.read(spark, sdR), "vec_id", "embedding",
      kNN = 5, nprobe = 3))
    assert(pl == pr)
    assert(pl.nonEmpty)
  }

  test("codes are partitioned by the part_id bucket key and the probe " +
      "join prunes to the probed partitions") {
    val corpus = randomVecs(300, 16, 17)
    val sd = java.nio.file.Files.createTempDirectory("vec_part").toString
    VectorIndexStore.write(VectorIndexStore.build(corpus, "vec_id",
      "embedding", targetListSize = 32, m = 4, k = 8, iters = 1,
      fitSamplePct = 60, dim = 16), sd)
    // layout: hive-style part_id=N bucket directories (one list per
    // bucket below the MaxCodeParts cap)
    val dirs = new java.io.File(s"$sd/codes").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("part_id=")),
      s"expected part_id partition dirs, got: ${dirs.toSeq}")
    // plan: the probed (part_id, list_id) set is bounded and known
    // before the scan, so the codes scan must carry LITERAL pruning
    // filters — a static partition filter on part_id (directory
    // pruning, no DPP subquery needed) and a pushed In(list_id)
    // parquet filter (row-group pruning inside a bucket, the clamp
    // region's scan-amplification fix)
    val q = corpus.filter(col("vec_id") < 8)
    val plan = VectorIndexStore.topK(q, VectorIndexStore.read(spark, sd),
      "vec_id", "embedding", kNN = 5, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [part_id"),
      s"codes scan must be statically pruned to the probed buckets:\n$plan")
    assert(plan.contains("PushedFilters: [In(list_id"),
      s"codes scan must push the probed list set to parquet:\n$plan")
  }

  test("appendWrite lands at most one new file per touched bucket " +
      "(the daily-append small-file contract)") {
    // without the repartition an append lands up to (tasks × buckets)
    // small files — a year of daily ingests is 10⁵–10⁶ files per
    // store before compaction, and the listing/footer tax showed as a
    // measured 2.6× last-decade probe drift (r15 verdict). The write
    // contract: every append adds ≤ 1 parquet file per part_id bucket.
    val corpus = randomVecs(300, 16, 17)
    val inc = randomVecs(340, 16, 17).filter(col("vec_id") >= 300)
    val sd = java.nio.file.Files.createTempDirectory("vec_files").toString
    VectorIndexStore.write(VectorIndexStore.build(corpus, "vec_id",
      "embedding", targetListSize = 32, m = 4, k = 8, iters = 1,
      fitSamplePct = 60, dim = 16), sd)
    def filesPerBucket: Map[String, Int] =
      new java.io.File(s"$sd/codes").listFiles()
        .filter(_.isDirectory).map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = filesPerBucket
    val store0 = VectorIndexStore.read(spark, sd)
    VectorIndexStore.appendWrite(
      VectorIndexStore.encode(inc, "vec_id", "embedding", store0), sd)
    val after = filesPerBucket
    assert(after.forall { case (d, n) => n <= before.getOrElse(d, 0) + 1 },
      s"append must add at most one file per bucket: $before -> $after")
    assert(after.exists { case (d, n) => n == before.getOrElse(d, 0) + 1 },
      s"append touched no bucket at all: $before -> $after")
  }

  test("frozen-index append: a query retrieves a vector appended in a prior increment") {
    // corpus = ids 0..199 (the index's fit input); increment A = a
    // fresh vector (id 900), appended ENCODED UNDER THE FROZEN forest;
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
    VectorIndexStore.write(VectorIndexStore.build(corpus, "vec_id",
      "embedding", targetListSize = 32, m = 4, k = 8, iters = 1,
      fitSamplePct = 60, dim = 16), sd)
    val store0 = VectorIndexStore.read(spark, sd)
    VectorIndexStore.appendWrite(
      VectorIndexStore.encode(a900, "vec_id", "embedding", store0), sd)
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
      "embedding", targetListSize = 32, m = 4, k = 8, iters = 1,
      fitSamplePct = 60, dim = 16), sd)
    val store0 = VectorIndexStore.read(spark, sd)
    val baseN = store0.coded.count()
    val encoded = VectorIndexStore.encode(inc, "vec_id", "embedding",
      store0).localCheckpoint() // pre-compact lineage must not
                                // chase renamed store files
    // the single-append reference decision, computed BEFORE compact
    // (its lineage reads the pre-compact store files, which the
    // rename-aside swap moves)
    val expect = rows(VectorIndexStore.topK(q, store0.copy(
      coded = store0.coded.localCheckpoint().unionByName(encoded)),
      "vec_id", "embedding", kNN = 5, nprobe = 3))
    VectorIndexStore.appendWrite(encoded, sd)
    VectorIndexStore.appendWrite(encoded, sd) // the retry
    assert(VectorIndexStore.read(spark, sd).coded.count()
      == baseN + 2 * encoded.count())
    VectorIndexStore.compact(spark, sd)
    val healed = VectorIndexStore.read(spark, sd)
    assert(healed.coded.count() == baseN + encoded.count(),
      "compact must restore one code row per vec_id")
    // compact must also preserve the partitioned layout (the probe's
    // pruning contract)
    val dirs = new java.io.File(s"$sd/codes").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("part_id=")),
      s"compact must keep part_id partitions, got: ${dirs.toSeq}")
    // post-compact probe = single-append decisions exactly
    assert(rows(VectorIndexStore.topK(q, healed, "vec_id", "embedding",
      kNN = 5, nprobe = 3)) == expect)
  }

  test("stored probe recall@5 vs exact top-k at the registered " +
      "autoNlist geometry (real embeddings)") {
    // the serving-geometry guard: a forest/geometry change that
    // silently trades recall for speed fails here, not in production.
    // Same fixture + floor conventions as EmbedSpec's in-DAG recall
    // tests (sf0.001 embeddings, brute-force cosine reference).
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(emb("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sd = java.nio.file.Files.createTempDirectory("vec_recall").toString
    VectorIndexStore.write(VectorIndexStore.build(emb, "vec_id",
      "embedding", targetListSize = 32, m = 8, k = 16, iters = 1,
      fitSamplePct = 60, dim = 64), sd)
    val store = VectorIndexStore.read(spark, sd)
    val stored = VectorIndexStore.topK(q, store,
      "vec_id", "embedding", kNN = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerank = VectorIndexStore.topKRerank(q, store,
      "vec_id", "embedding", emb, kNN = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = Embed.ivfPqTopK(q, emb, "vec_id", "embedding", kNN = 5,
      nlist = 16, nprobe = 4, m = 8, k = 16, iters = 1, fitSamplePct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rStored = stored.intersect(brute).size.toDouble / brute.size
    val rRerank = rerank.intersect(brute).size.toDouble / brute.size
    val rFlat = flat.intersect(brute).size.toDouble / brute.size
    info(f"stored hier-probe recall@5 $rStored%.3f, two-stage rerank " +
      f"$rRerank%.3f, in-DAG flat IVFPQ $rFlat%.3f (nprobe=4)")
    // floors anchored to the OBSERVED values minus a margin (not
    // near-chance): a geometry change that badly degrades recall
    // fails here, not in production. Observed: stored 0.280, flat
    // 0.320, rerank strictly above stored (exact re-scoring can only
    // fix ADC quantization misrankings inside the shortlist).
    assert(rStored >= 0.2, s"stored probe recall $rStored")
    assert(rStored >= rFlat - 0.15,
      s"stored probe recall $rStored collapsed vs in-DAG flat $rFlat")
    // observed 0.520 vs 0.280 — the rerank stage must keep a
    // MATERIAL margin over ADC-only, not merely match it
    assert(rRerank >= rStored + 0.1,
      s"two-stage rerank recall $rRerank not materially above " +
        s"ADC-only $rStored")
  }
}
