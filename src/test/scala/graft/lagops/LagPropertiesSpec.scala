package graft.lagops

import graft.TestSpark
import graft.TestSpark.seriesDf
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property fixtures from FIXTURES.md §A: algebraic laws the reference's
  * copy loops satisfy by construction, which our window plans must too.
  * Uses scalacheck's Prop/Test API directly (the scalatest bridge artifact
  * is not in the offline cache). Few, small cases — each check round-trips
  * a Spark job.
  */
class LagPropertiesSpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5).withMaxSize(12)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: $res")
  }

  private val seriesGen: Gen[List[Double]] =
    Gen.resize(10, Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)))

  private def lagged(vs: Seq[Double], k: Int): Seq[Option[Double]] =
    LagMatrix.wide(seriesDf(vs), "value",
        LagSpec(Seq("t"), Nil, Seq(k), None))
      .orderBy("t").collect().toSeq
      .map(r => if (r.isNullAt(r.length - 1)) None
                else Some(r.getDouble(r.length - 1)))

  test("lag 0 is identity") {
    check("identity", Prop.forAll(seriesGen) { vs =>
      lagged(vs, 0) == vs.map(Some(_))
    })
  }

  test("drop/shift equivalence: lag_k(s)(k..) == s(0..D-k)") {
    check("dropShift",
      Prop.forAll(seriesGen, Gen.chooseNum(1, 4)) { (vs, k) =>
        val out = lagged(vs, k)
        out.take(math.min(k, vs.size)).forall(_.isEmpty) &&
          out.drop(k) == vs.dropRight(k).map(Some(_))
      })
  }

  test("composition: lag_a then lag_b == lag_{a+b} under NULL fill") {
    check("composition",
      Prop.forAll(seriesGen, Gen.chooseNum(1, 3), Gen.chooseNum(1, 3)) {
        (vs, a, b) =>
          val once = lagged(vs, a + b)
          val inner = lagged(vs, a)
          val composed = (Seq.fill(math.min(b, vs.size))(
            None: Option[Double]) ++ inner.dropRight(b)).take(vs.size)
          once == composed
      })
  }

  test("row count and lag-column count invariants (LagMatrix accessors)") {
    check("counts", Prop.forAll(seriesGen, Gen.chooseNum(1, 3)) { (vs, n) =>
      val lags = (0 until n).toSeq
      val out = LagMatrix.wide(seriesDf(vs), "value",
        LagSpec(Seq("t"), Nil, lags, None))
      out.count() == vs.size && out.columns.length == 1 + lags.size
    })
  }

  test("partition isolation: lag never crosses series_id") {
    val df = TestSpark.seriesDf2(Map(
      "a" -> Seq(1.0, 2.0, 3.0), "b" -> Seq(10.0, 20.0, 30.0)))
    val out = LagMatrix.wide(df, "value",
      LagSpec(Seq("t"), Seq("series_id"), Seq(1), None))
    val aHead = out.filter(out("series_id") === "a")
      .orderBy("t").collect().head
    val bHead = out.filter(out("series_id") === "b")
      .orderBy("t").collect().head
    assert(aHead.isNullAt(2) && bHead.isNullAt(2))
  }
}
