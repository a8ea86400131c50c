package graft.textops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("scoreLinear: weighted mean in micro-units, OOV zero, empty doc NULL") {
    import spark.implicits._
    val weights = Seq(("alpha", 100L), ("beta", 200L), ("gamma", 0L))
      .toDF("token", "weight")
    val d = docs(
      1L -> "alpha beta",          // (100+200)/2 = 150 -> 150_000_000? no: 1e6*300/2 = 150e6/1e6... score=150 -> 150000000 micro? 10^6*mean
      2L -> "alpha oov oov",       // (100+0+0)/3
      3L -> "",                    // no tokens -> NULL
      4L -> "gamma")               // in-vocab, weight 0
    val out = Classifier.scoreLinear(d, "doc_id", "text", weights)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L) == (2L, 2L, Some(150000000L)))
    // round_half_up(10^6 * 100 / 3) = 33333333 (.33 truncates after +n/2)
    assert(out(2L) == (3L, 1L, Some(33333333L)))
    assert(out(3L) == (0L, 0L, None))
    assert(out(4L) == (1L, 1L, Some(0L)))
  }

  test("scoreLinear: round-half-up at the boundary") {
    import spark.implicits._
    // mean = 1/2 -> 10^6/2 = 500000 exactly; mean = 3/2 token weights
    // summing to odd halves exercise the +n/2 rounding
    val w = Seq(("a", 1L), ("b", 0L)).toDF("token", "weight")
    val out = Classifier.scoreLinear(docs(1L -> "a b"), "doc_id", "text", w)
      .collect().head
    assert(out.getLong(3) == 500000L)
  }

  test("fixtureWeights: deterministic top-vocab cut with md5 weights in [0, 2000]") {
    val d = docs(1L -> "x x x y y z", 2L -> "x y w")
    val w = Classifier.fixtureWeights(d, "text", vocab = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // top-3 by (count desc, token asc): x(4), y(3), then w/z tie at 1 -> w
    assert(w.keySet == Set("x", "y", "w"))
    assert(w.values.forall(v => v >= 0 && v <= 2000))
    // repeatable
    val w2 = Classifier.fixtureWeights(d, "text", vocab = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w == w2)
  }

  test("weightsFromFile round-trips the token-weight text format") {
    val p = java.nio.file.Files.createTempFile("weights", ".txt")
    java.nio.file.Files.writeString(p,
      "# fastText-exported unigram weights (micro-scaled)\n" +
        "alpha 120\nbeta  -40\n\ngamma 7\n")
    val w = Classifier.weightsFromFile(spark, p.toString)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w == Map("alpha" -> 120L, "beta" -> -40L, "gamma" -> 7L))
  }

  test("scoring plan: weight table broadcasts, one combinable aggregate, no corpus-wide shuffle beyond doc partials") {
    import spark.implicits._
    val d = docs((1L to 50L).map(i => i -> s"tok$i alpha beta"): _*)
    val w = Seq(("alpha", 5L)).toDF("token", "weight")
    val plan = Classifier.scoreLinear(d, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
