package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("point-in-interval matches the naive BETWEEN join exactly") {
    import spark.implicits._
    // deterministic pseudo-random points and intervals spanning
    // multiple buckets, including boundary hits at both ends
    val pts = (0 until 400).map(i =>
      (i.toLong, (i * 7919L) % 1000)).toDF("pid", "p")
    val ivs = (0 until 60).map(i =>
      (i.toLong + 1000, (i * 104729L) % 900, (i * 104729L) % 900 + (i % 7) * 37L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e",
        bucketWidth = 50)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty, s"got=${got.size} want=${want.size}")
    // each qualifying pair appears exactly ONCE (a point owns one bucket)
    val n = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 50).count()
    assert(n == want.size.toLong)
  }

  test("boundary inclusivity, zero-length intervals, and negative domains") {
    import spark.implicits._
    val pts = Seq((1L, -100L), (2L, 0L), (3L, 100L), (4L, 101L))
      .toDF("pid", "p")
    val ivs = Seq(
      (10L, -100L, -100L), // zero-length, negative: pid 1 only
      (11L, 0L, 100L))     // inclusive both ends: pids 2 and 3
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 30)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("NULL-bounded intervals drop silently; the spread guard still fires") {
    import spark.implicits._
    val pts = Seq((1L, 50L)).toDF("pid", "p")
    // a NULL start/end is a dirty row, not a sizing error: it must drop
    // (prior sequence(null,..) behavior), not fail the job via the
    // assert_true spread guard nulling out
    val dirty = Seq((10L, Option.empty[Long], Option(100L)),
                    (11L, Option(0L), Option.empty[Long]),
                    (12L, Option(0L), Option(100L)))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, dirty, "p", "s", "e", 30)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 12L)))
    // and an absurdly undersized bucketWidth still fails loudly
    val wide = Seq((20L, 0L, 10000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, wide, "p", "s", "e", 1).count()
    }
    assert(ex.getMessage != null)
  }

  test("equi keys narrow candidates before the residual filter") {
    import spark.implicits._
    val pts = Seq(("u1", 1L, 50L), ("u2", 2L, 50L)).toDF("user", "pid", "p")
    val ivs = Seq(("u1", 10L, 0L, 100L), ("u2", 11L, 60L, 100L))
      .toDF("user", "iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 10,
        equiKeys = Seq("user"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // u2's point (50) is inside u1's window but NOT u2's — the key must
    // keep it out even though the time buckets collide
    assert(got == Set((1L, 10L)))
  }

  test("plans as an equi shuffle join, never a nested-loop/cartesian") {
    import spark.implicits._
    val pts = (0 until 100).map(i => (i.toLong, i.toLong * 3)).toDF("pid", "p")
    val ivs = (0 until 20).map(i => (i.toLong, i * 50L, i * 50L + 80))
      .toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must rewrite to an equi join:\n$plan")
  }

  test("rejects a non-positive bucket width") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("pid", "p")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, df, "p", "p", "p", 0)
    }
  }

  test("rejects inputs that already carry the reserved work column") {
    import spark.implicits._
    val clash = Seq((1L, 1L, 9L)).toDF("pid", "p", "_graft_rj_bucket")
    val ivs = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(clash, ivs, "p", "s", "e", 10)
    }
  }

  test("fails loud when an interval spans pathologically many buckets") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    // one interval covering 10^6 buckets at width 1: a mis-sized
    // bucketWidth must abort with the sizing message, not build a
    // million-element sequence per interval row
    val ivs = Seq((1L, 0L, 1000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 1).collect()
    }
    assert(ex.getMessage != null || ex.getCause != null)
  }
}
