package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("backward as-of join: latest right row at or before left time, per key") {
    import spark.implicits._
    val left = Seq(
      ("k1", 10L, "e1"), ("k1", 20L, "e2"), ("k1", 5L, "e0"),
      ("k2", 10L, "e3")).toDF("key", "t", "ev")
    val right = Seq(
      ("k1", 8L, 1.0), ("k1", 15L, 2.0), ("k1", 20L, 3.0),
      ("k2", 99L, 9.0)).toDF("key", "rt", "price")
    val out = AsOfJoin.backward(left, right, "key", "t", "rt", Seq("price"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(out == Set(
      ("k1", 10L, 1.0),   // 8 <= 10 < 15
      ("k1", 20L, 3.0),   // simultaneous right row IS visible (>= semantics)
      ("k1", 5L, null),   // nothing at or before 5
      ("k2", 10L, null))) // k2's only order is later
  }

  test("forward as-of join: earliest right row at or after left time") {
    import spark.implicits._
    val left = Seq(
      ("k1", 10L, "e1"), ("k1", 20L, "e2"), ("k1", 25L, "e3")).toDF("key", "t", "ev")
    val right = Seq(
      ("k1", 15L, 1.0), ("k1", 20L, 2.0)).toDF("key", "rt", "price")
    val out = AsOfJoin.forward(left, right, "key", "t", "rt", Seq("price"))
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(out == Set(
      (10L, 1.0),   // 15 is the first >= 10
      (20L, 2.0),   // simultaneous right row visible
      (25L, null))) // nothing at or after 25
  }

  test("as-of join preserves left row count (no fan-out)") {
    import spark.implicits._
    val left = (1L to 100L).map(i => ("k", i, i)).toDF("key", "t", "x")
    val right = Seq(("k", 50L, 1.0), ("k", 50L, 2.0)).toDF("key", "rt", "p")
    // duplicate right timestamps: caller contract is one row per (key, t) —
    // here we just require no row explosion
    val out = AsOfJoin.backward(left, right, "key", "t", "rt", Seq("p"))
    assert(out.count() == 100)
  }
}
