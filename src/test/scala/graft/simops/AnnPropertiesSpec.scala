package graft.simops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-independent brute-force replays of the ANN/dedup decision
  * rules on randomized corpora: the DuckDB gate checks engine-vs-engine
  * agreement, these check the OPERATOR agrees with its own definition
  * computed naively on the driver.
  */
class AnnPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randomVecs(n: Int, dim: Int, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      i -> Seq.fill(dim)(rng.nextFloat() * 2 - 1)
    }.toDF("vec_id", "embedding")
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("semanticDedup replays its greedy rule exactly on random corpora") {
    for (seed <- Seq(7, 21)) {
      val df = randomVecs(120, 8, seed)
      val t = 0.55
      val out = Embed.semanticDedup(df, "vec_id", "embedding",
        threshold = t, nlist = 4, iters = 1).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      assert(out.length == 120)
      val vecs = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      val byList = out.groupBy(_._2)
      byList.foreach { case (_, members) =>
        // the list's minimum id is unconditionally kept
        val minId = members.map(_._1).min
        assert(members.find(_._1 == minId).get._3,
          s"min id $minId of a list must be kept (seed $seed)")
        members.foreach { case (id, _, kept) =>
          // rounded cosine, same as the operator scores
          val hasLowerNeighbor = members.exists { case (o, _, _) =>
            o < id && BigDecimal(cos(vecs(o), vecs(id)))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= t
          }
          assert(kept == !hasLowerNeighbor,
            s"vec $id kept=$kept but lower-neighbor=$hasLowerNeighbor (seed $seed)")
        }
      }
    }
  }

  test("semanticDedupHier replays its greedy rule exactly on random corpora") {
    // the hier path must satisfy the SAME definition as the flat one:
    // within every (two-level) list, a vector is dropped iff a lower-id
    // list-mate scores rounded cosine >= t — geometry changes WHICH
    // pairs are compared, never the rule
    for (seed <- Seq(7, 21)) {
      val df = randomVecs(200, 8, seed)
      val t = 0.55
      // targetListSize=8 -> nlist=25, C=5, S=5: genuinely two-level
      val out = Embed.semanticDedupHier(df, "vec_id", "embedding",
        threshold = t, targetListSize = 8, iters = 1).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      assert(out.length == 200)
      assert(out.map(_._2).distinct.length > 5,
        "autoNlist geometry must yield more lists than the flat-16 knee")
      val vecs = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      out.groupBy(_._2).foreach { case (_, members) =>
        val minId = members.map(_._1).min
        assert(members.find(_._1 == minId).get._3,
          s"min id $minId of a list must be kept (seed $seed)")
        members.foreach { case (id, _, kept) =>
          val hasLowerNeighbor = members.exists { case (o, _, _) =>
            o < id && BigDecimal(cos(vecs(o), vecs(id)))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= t
          }
          assert(kept == !hasLowerNeighbor,
            s"vec $id kept=$kept but lower-neighbor=$hasLowerNeighbor (seed $seed)")
        }
      }
    }
  }

  test("semanticDedupIncremental: within-list best-match decision replayed") {
    // corpus = ids 0..149, increment = exact copies of corpus vectors
    // (ids +1000) plus fresh random vectors (ids +2000). An exact copy
    // assigns to its original's list deterministically (identical input
    // -> identical kernel argmax), so it MUST come back is_new=false
    // with a cosine-1.0 best match; every flagged dup must share the
    // incoming vector's list and be its highest-cosine lowest-id mate.
    import org.apache.spark.sql.functions._
    val corpus = randomVecs(150, 8, 13)
    val copies = corpus.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val fresh = randomVecs(10, 8, 99)
      .select((col("vec_id") + 2000).as("vec_id"), col("embedding"))
    val out = Embed.semanticDedupIncremental(copies.union(fresh), corpus,
      "vec_id", "embedding", threshold = 0.99, targetListSize = 8,
      iters = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(4)))
    assert(out.length == 30)
    val byId = out.map(r => r._1 -> r).toMap
    (0L until 20L).foreach { i =>
      val (_, _, dupOf, isNew) = byId(i + 1000)
      assert(!isNew, s"exact copy ${i + 1000} must be flagged")
      assert(dupOf == i,
        s"copy ${i + 1000} best match should be its original, got $dupOf")
    }
  }

  test("semanticDedupStored decides identically to the in-DAG incremental") {
    // the parquet round-trip (forest + assignments) must change the
    // physics only: same forest, same doubles, same decisions
    import org.apache.spark.sql.functions._
    val corpus = randomVecs(120, 8, 31)
    val inc = randomVecs(160, 8, 31).filter(col("vec_id") >= 120)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) 0.0 else r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1).toSeq
    val direct = rows(Embed.semanticDedupIncremental(inc, corpus,
      "vec_id", "embedding", threshold = 0.55, targetListSize = 8))
    val sd = java.nio.file.Files.createTempDirectory("sem_store").toString
    SemanticStore.write(SemanticStore.build(corpus, "vec_id", "embedding",
      targetListSize = 8), sd)
    val spark2 = corpus.sparkSession
    val stored = rows(Embed.semanticDedupStored(inc,
      SemanticStore.read(spark2, sd), "vec_id", "embedding",
      threshold = 0.55))
    assert(stored == direct)
    assert(direct.length == 40)
  }

  test("semantic A/B loop: a B copy of an ACCEPTED A vector is caught cross-increment") {
    // corpus = ids 0..99; A = one fresh vector (id 500) + one corpus
    // copy (id 501 = copy of 7, rejected); B = a copy of the ACCEPTED
    // A vector (id 900 -> must be flagged dup_of=500 through the
    // appended membership), a copy of corpus vector 3 (id 901), and a
    // fresh vector (id 902)
    import org.apache.spark.sql.functions._
    val corpus = randomVecs(100, 8, 41)
    val a500 = randomVecs(1, 8, 77).select((col("vec_id") + 500).as("vec_id"),
      col("embedding"))
    val a501 = corpus.filter(col("vec_id") === 7)
      .select(lit(501L).as("vec_id"), col("embedding"))
    val incA = a500.union(a501)
    val b900 = a500.select(lit(900L).as("vec_id"), col("embedding"))
    val b901 = corpus.filter(col("vec_id") === 3)
      .select(lit(901L).as("vec_id"), col("embedding"))
    val b902 = randomVecs(1, 8, 88).select((col("vec_id") + 902).as("vec_id"),
      col("embedding"))
    val incB = b900.union(b901).union(b902)
    val sd = java.nio.file.Files.createTempDirectory("sem_ab").toString
    SemanticStore.write(SemanticStore.build(corpus, "vec_id", "embedding",
      targetListSize = 8), sd)
    val store = SemanticStore.read(corpus.sparkSession, sd)
    val probeA = Embed.semanticDedupStored(incA, store, "vec_id",
      "embedding", threshold = 0.99)
    val acceptedA = SemanticStore.assign(store, incA, "vec_id", "embedding")
      .join(probeA.filter(col("is_new")).select(col("vec_id")), "vec_id")
    val got = Embed.semanticDedupStored(incB,
        SemanticStore.append(store, acceptedA), "vec_id", "embedding",
        threshold = 0.99)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(4))).toMap
    assert(got(900L) == (500L, false), s"cross-increment catch: $got")
    assert(got(901L) == (3L, false), s"corpus catch: $got")
    assert(got(902L) == (-1L, true), s"fresh: $got")
  }

  test("SemanticStore.compact heals double-appended retries without changing decisions") {
    // a retried ingest appends the same accepted assignments twice;
    // compact must dedup assigned/ back to one row per vec_id, and the
    // probe decisions must be bit-identical before and after (the
    // within-list verify is per-pair, so duplicates only cost bytes)
    import org.apache.spark.sql.functions._
    val corpus = randomVecs(120, 8, 53)
    val incA = randomVecs(140, 8, 53).filter(col("vec_id") >= 120)
    val incB = randomVecs(12, 8, 61)
      .select((col("vec_id") + 3000).as("vec_id"), col("embedding"))
    val sd = java.nio.file.Files.createTempDirectory("sem_compact").toString
    val spark2 = corpus.sparkSession
    SemanticStore.write(SemanticStore.build(corpus, "vec_id", "embedding",
      targetListSize = 8), sd)
    val store = SemanticStore.read(spark2, sd)
    val baseN = store.assigned.count()
    // the retried double-append: the SAME accepted frame lands twice
    val acceptedA = SemanticStore.assign(store, incA, "vec_id", "embedding")
      .select(col("vec_id"), col("list_id"), col("vec").as("vec"))
      .localCheckpoint() // decision frame must not chase post-compact files
    SemanticStore.appendWrite(acceptedA, sd)
    SemanticStore.appendWrite(acceptedA, sd)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) 0.0 else r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1).toSeq
    val doubled = SemanticStore.read(spark2, sd)
    assert(doubled.assigned.count() == baseN + 2 * acceptedA.count())
    val before = rows(Embed.semanticDedupStored(incB, doubled,
      "vec_id", "embedding", threshold = 0.55))
    SemanticStore.compact(spark2, sd)
    val healed = SemanticStore.read(spark2, sd)
    assert(healed.assigned.count() == baseN + acceptedA.count(),
      "compact must restore one row per vec_id")
    assert(rows(Embed.semanticDedupStored(incB, healed,
      "vec_id", "embedding", threshold = 0.55)) == before,
      "probe decisions must be bit-identical across compact")
  }

  test("pqTopK ranks by the true reconstruction distance (self-consistency)") {
    // encode + ADC must agree: for every vector, querying WITH ITSELF
    // excluded, its own adist to any neighbor is symmetric in the codes
    // sense — verify the weaker but decisive invariant that adist is
    // non-negative and ranks are dense 1..k per query
    val df = randomVecs(150, 8, 3)
    val q = df.filter(df("vec_id") < 6)
    val rows = Embed.pqTopK(q, df, "vec_id", "embedding", kNN = 4,
      m = 4, k = 8, iters = 1, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.forall(_._3 >= 0.0))
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length), s"query $qid")
      // ranks follow adist order with the neighbor-id tiebreak
      val sorted = rs.sortBy(r => (r._3, r._2)).map(_._2).toSeq
      assert(rs.sortBy(_._4).map(_._2).toSeq == sorted, s"query $qid")
      assert(!rs.exists(_._2 == qid), "self must be excluded")
    }
  }
}
