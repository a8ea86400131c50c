package graft

import graft.lagops.LagSpec
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** The fluent surface must hit the same operators as the object API. */
class SyntaxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("series, document, and embedding syntax all resolve and run") {
    import graft.syntax._
    val ev = Tables.events(spark, dir)
    val lagged = ev.lagMatrix("value",
      LagSpec(Seq("ts_ns", "event_id"), Seq("user_id"), Seq(1, 2), None))
    assert(lagged.columns.contains("value_lag_2"))
    assert(lagged.count() == ev.count())

    val docs = Tables.documents(spark, dir)
    assert(docs.dedupExact("doc_id", "text").count() > 0)
    assert(docs.withQualityScore("text").columns.contains("quality"))

    val emb = Tables.embeddings(spark, dir)
    val topk = emb.topKNeighbors(emb.filter(emb("vec_id") < 2),
      "vec_id", "embedding", 3)
    assert(topk.count() == 6)
  }
}
