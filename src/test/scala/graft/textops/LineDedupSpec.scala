package graft.textops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedupLinesIntra keeps first occurrence, preserves order") {
    val df = Seq(
      (1L, "a b\nc d\na b\ne\nc d"), // two repeats
      (2L, "x\nx\nx"),               // all same
      (3L, "solo"),                  // nothing to drop
      (4L, "")                       // empty text = one empty line
    ).toDF("doc_id", "text")
    val got = LineDedup.dedupLinesIntra(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == (5L, 3L, "a b\nc d\ne"))
    assert(got(2L) == (3L, 1L, "x"))
    assert(got(3L) == (1L, 1L, "solo"))
    assert(got(4L) == (1L, 1L, ""))
  }

  test("array_distinct intra form ≡ the O(n²) HOF twin, incl. a 1k-line doc") {
    // the codegen'd hash-set pass must reproduce the HOF form exactly
    // on every reachable input shape: scattered repeats, all-dup docs,
    // adjacent dups, empty lines mid-doc, and a LONG doc (the shape
    // where the quadratic twin actually hurts)
    val longDoc = (0 until 1000).map(i => s"line ${i % 137}").mkString("\n")
    val df = Seq(
      (1L, "a b\nc d\na b\ne\nc d"),
      (2L, "x\nx\nx"),
      (3L, "solo"),
      (4L, ""),
      (5L, "p\n\nq\n\np"),          // empty lines are lines too
      (6L, longDoc)
    ).toDF("doc_id", "text")
    val fast = LineDedup.dedupLinesIntra(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val hof = LineDedup.dedupLinesIntraHof(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(fast == hof)
    // and the long doc really deduped to its 137 distinct lines
    assert(fast.find(_.head == 6L).get(2) == 137L)
  }

  test("corpus rebuild by position-indexing ≡ the membership-scan HOF twin") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq("a", "b", "c", "d"), Seq(0, 2)),
      (Seq("a", "b"), Seq[Int]()),       // nothing kept -> empty text
      (Seq("x"), Seq(0)),
      ((0 until 500).map(i => s"l$i"), (0 until 500 by 7))) // long doc
      .toDF("_lines", "_kp")
    val got = df.select(
      array_join(transform(col("_kp"),
        i => element_at(col("_lines"), i + 1)), "\n").as("fast"),
      LineDedup.rebuildByMembershipHof(col("_lines"), col("_kp")).as("hof"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("dedupLinesCorpus: global first occurrence wins across and within docs") {
    val df = Seq(
      (10L, "banner\nunique ten\nbanner"), // owns banner at pos 0; pos-2 copy drops
      (20L, "banner\nunique twenty"),      // banner drops (doc 10 owns it)
      (30L, "unique thirty\nbanner")       // banner drops
    ).toDF("doc_id", "text")
    val got = LineDedup.dedupLinesCorpus(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(10L) == (3L, 2L, "banner\nunique ten"))
    assert(got(20L) == (2L, 1L, "unique twenty"))
    assert(got(30L) == (2L, 1L, "unique thirty"))
  }

  test("dedupLinesCorpus: a doc that keeps no lines gets empty text_clean") {
    val df = Seq(
      (1L, "only line"),
      (2L, "only line")
    ).toDF("doc_id", "text")
    val got = LineDedup.dedupLinesCorpus(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == (1L, 1L, "only line"))
    assert(got(2L) == (1L, 0L, ""))
  }

  test("dedupLinesIncremental: corpus hit, within-increment first-wins, clean pass") {
    val corpus = Seq(
      (1L, "known banner\ncorpus prose one"),
      (2L, "corpus prose two")).toDF("doc_id", "text")
    val inc = Seq(
      (10L, "known banner\nfresh ten"),       // banner drops (corpus owns it)
      (11L, "fresh eleven\nfresh shared"),    // owns 'fresh shared' (min doc)
      (12L, "fresh shared\nfresh twelve"),    // 'fresh shared' drops (11 owns)
      (13L, "untouched lines\nall fresh"))
      .toDF("doc_id", "text")
    val got = LineDedup.dedupLinesIncremental(inc, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(10L) == (2L, 1L, "fresh ten"))
    assert(got(11L) == (2L, 2L, "fresh eleven\nfresh shared"))
    assert(got(12L) == (2L, 1L, "fresh twelve"))
    assert(got(13L) == (2L, 2L, "untouched lines\nall fresh"))
    // probe shape: the corpus side never shuffles — its line hashes
    // meet the BROADCAST increment hash set; and no sort-based
    // aggregate sneaks in (the packed-long min stays hash-aggregable)
    val plan = LineDedup.dedupLinesIncremental(inc, corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("NULL doc id is a dirty row that drops, not a job abort") {
    // assert_true fires on NULL conditions too — before the isNull
    // disjunct, a NULL id failed the whole job with a misleading
    // 'packed owner key would overflow' message. The contract now:
    // NULL-id rows claim no lines and keep none (RangeJoin's
    // dirty-rows-drop convention), clean ids are unaffected.
    val df = Seq[(Option[Long], String)](
      (Some(1L), "a\nb"),
      (None, "a\nzz"),     // dirty: shares 'a' with doc 1, owns 'zz'
      (Some(2L), "zz\nc")
    ).toDF("doc_id", "text")
    val got = LineDedup.dedupLinesCorpus(df, "doc_id", "text")
      .collect().map(r => Option(r.get(0)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(got(Some(1L)) == (2L, "a\nb"))
    // the NULL doc never claims ownership: doc 2 keeps 'zz'
    assert(got(Some(2L)) == (2L, "zz\nc"))
    assert(got(None) == (0L, ""))

    val inc = LineDedup.dedupLinesIncremental(
      Seq[(Option[Long], String)]((Some(9L), "new\na"), (None, "new"))
        .toDF("doc_id", "text"),
      Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => Option(r.get(0)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(inc(Some(9L)) == (1L, "new"))
    assert(inc(None) == (0L, ""))
  }

  test("multilineFixture: 8-token lines, boilerplate and self-dup plants") {
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    // bucket draws are md5(doc_id)-determined: scan ids for one in
    // each regime so the test doesn't hardcode hash values
    val probe = (0L until 200L).map(i => (i, text)).toDF("doc_id", "text")
    val ml = LineDedup.multilineFixture(probe, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = Seq((1 to 8), (9 to 16), (17 to 20))
      .map(_.map(i => s"t$i").mkString(" "))
    val plain = ml.values.find(_.split("\n").length == 3)
    val boiler = ml.values.find(_.contains(LineDedup.Boilerplate))
    val selfDup = ml.values.find(v =>
      v.split("\n").count(_ == base.head) == 2)
    assert(plain.contains(base.mkString("\n")))
    assert(boiler.isDefined)
    assert(selfDup.isDefined)
    // every variant starts with the same base lines
    ml.values.foreach(v => assert(v.startsWith(base.mkString("\n")), v))
  }

  test("dedupLinesCorpus plan: line strings never cross an exchange") {
    val df = Seq((1L, "a\nb"), (2L, "b\nc")).toDF("doc_id", "text")
    val p = LineDedup.dedupLinesCorpus(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // exchanges key on the 8-byte line hash or doc_id — never the line
    assert(!p.linesIterator.exists(l =>
      l.contains("hashpartitioning(_ln")), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
