package graft.textops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bm25: higher tf wins at equal length; rarer term outranks common") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple pear pear pear"),
      (2L, "apple pear pear pear pear pear"),
      (3L, "pear pear pear pear pear pear"),
      (4L, "kiwi pear pear pear pear pear"))
      .toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text",
      Seq("qa" -> "apple", "qk" -> "kiwi"), k = 10)
    val byQuery = got.collect()
      .groupBy(_.getString(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(r =>
          (r.getLong(2), r.getDouble(3))).toSeq
      }
    // apple: doc 1 (tf 3) above doc 2 (tf 1); doc 3/4 absent
    assert(byQuery("qa").map(_._1) == Seq(1L, 2L))
    assert(byQuery("qa")(0)._2 > byQuery("qa")(1)._2)
    // kiwi (df 1) scores doc 4 higher than apple (df 2) scores doc 2
    // at identical tf/dl: rarer term ⇒ larger idf
    assert(byQuery("qk") == Seq(4L).zip(byQuery("qk").map(_._2)) &&
      byQuery("qk").head._2 > byQuery("qa")(1)._2)
  }

  test("bm25: length normalization favors the shorter doc at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple pear"),
      (2L, "apple pear pear pear pear pear pear pear pear pear"))
      .toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text",
        Seq("q" -> "apple"), k = 10)
      .collect().sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L) && got(0)._2 > got(1)._2)
  }

  test("bm25: query terms broadcast against the corpus token stream") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Search.bm25(docs, "doc_id", "text",
        Seq("q1" -> "hash join"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term narrowing must be a broadcast join:\n$plan")
  }

  test("pmi: the planted always-adjacent pair survives; per-doc noise falls to minCount") {
    import spark.implicits._
    // "rio grande" adjacent in every doc (joint 6); every other bigram
    // involves a per-doc filler word and counts ≤ 2 < minCount
    val docs = (1 to 6).map(i => (i.toLong, s"f$i f$i rio grande"))
      .toDF("doc_id", "text")
    val got = Search.pmiBigrams(docs, "text", minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq("rio grande") && got.head._2 == 6L,
      s"only the planted pair survives minCount: ${got.toSeq}")
  }

  test("pmi: a dependent pair outranks an independent one at equal counts") {
    import spark.implicits._
    // "rio grande": rio/grande occur ONLY together (6 of each).
    // "salt water": salt and water each occur 12 times but are adjacent
    // only 6 — same joint count, weaker association, lower PMI.
    val docs = (1 to 6).map(i =>
        (i.toLong, "rio grande salt water then water then salt again"))
      .toDF("doc_id", "text")
    val got = Search.pmiBigrams(docs, "text", minCount = 5, k = 20)
      .collect().map(r => (r.getString(0), r.getDouble(4))).toMap
    assert(got("rio grande") > got("salt water"),
      s"exclusive pair must score above independent pair: $got")
    val ordered = Search.pmiBigrams(docs, "text", minCount = 5, k = 20)
      .collect().map(_.getDouble(4))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
  }
}
