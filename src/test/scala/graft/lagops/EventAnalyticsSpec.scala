package graft.lagops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("funnel: steps must follow in order, per user, strictly after") {
    import spark.implicits._
    // u1: full ordered funnel; u2: click BEFORE view (step 2 not
    // reached via that click), later click converts; u3: view only;
    // u4: purchase first (no view → nothing counts), then view
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 15L),
      (3L, "view", 7L),
      (4L, "purchase", 1L), (4L, "view", 2L))
      .toDF("user_id", "event_type", "ts_ns")
      .withColumn("event_id", col("ts_ns"))
    val got = EventAnalytics.funnel(ev, "user_id", "event_type",
        Seq("ts_ns", "event_id"), Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("funnel: single user-keyed exchange feeds the chained windows") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = EventAnalytics.funnel(ev, "user_id", "event_type",
      Seq("ts_ns", "event_id"), Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    // the chained running-min windows and the per-user reduce all share
    // the user_id partitioning: exactly ONE user-keyed exchange
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size
    assert(userExchanges == 1, s"expected 1 user-keyed exchange:\n$plan")
  }

  test("histogram: exact buckets, edge buckets absorb outliers") {
    import spark.implicits._
    val ev = Seq(
      ("a", 0.0), ("a", 9.99), ("a", 10.0), ("a", 55.5),
      ("a", -3.0),   // below range → bucket 0
      ("a", 500.0),  // above range → bucket 11
      ("b", 25.0))
      .toDF("event_type", "value")
    val got = EventAnalytics.histogram(ev, "event_type", "value",
        width = 10.0, nBuckets = 12)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(("a", 0L)) == ((3L, -3.0, 9.99))) // 0.0, 9.99, -3.0
    assert(got(("a", 1L))._1 == 1L) // 10.0
    assert(got(("a", 5L))._1 == 1L) // 55.5
    assert(got(("a", 11L)) == ((1L, 500.0, 500.0)))
    assert(got(("b", 2L))._1 == 1L)
    assert(got.size == 5)
  }

  test("debounce: bursts collapse to first event, gaps split bursts") {
    import spark.implicits._
    // u1/click: 3 events inside the gap, then one past it → 2 bursts;
    // u1/view: independent key, 1 event; u2/click: exactly-at-gap is
    // INSIDE the burst (strict > starts a new one)
    val ev = Seq(
      (1L, "click", 100L, 10L), (1L, "click", 150L, 11L),
      (1L, "click", 190L, 12L), (1L, "click", 400L, 13L),
      (1L, "view", 120L, 14L),
      (2L, "click", 0L, 20L), (2L, "click", 100L, 21L))
      .toDF("user_id", "event_type", "ts_ns", "event_id")
    val got = EventAnalytics.debounce(ev, Seq("user_id", "event_type"),
        "ts_ns", "event_id", Seq("ts_ns", "event_id"), gapNs = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._4)).toSeq
    assert(got == Seq(
      (1L, "click", 10L, 100L, 3L), (1L, "click", 13L, 400L, 1L),
      (1L, "view", 14L, 120L, 1L),
      (2L, "click", 20L, 0L, 2L)))
  }

  test("debounce: burst aggregate reuses the window exchange") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = EventAnalytics.debounce(ev, Seq("user_id", "event_type"),
        "ts_ns", "event_id", Seq("ts_ns", "event_id"),
        gapNs = 86400L * 1000000000L)
      .queryExecution.executedPlan.toString
    // the (user, type, burst) aggregate's grouping keys extend the
    // window partitioning → ONE exchange in the whole plan
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange:\n$plan")
  }

  test("retention: cohort by first-event week, offsets count whole weeks") {
    import spark.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(d)
    val ev = Seq(
      // u1 cohort = week of Mon 2024-01-01; active that week and +2w
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-04 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      // u2 cohort = next week; active cohort week only
      (2L, ts("2024-01-08 09:00:00")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.retention(ev, "user_id", "ts", "week")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      ("2024-01-01 00:00:00.0", 0, 1L), ("2024-01-01 00:00:00.0", 2, 1L),
      ("2024-01-08 00:00:00.0", 0, 1L)))
  }

  test("interpolate: interior gaps are time-weighted, edges clamp") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L, None: Option[Double]),   // leading gap → back-fill 10
      (1L, 10L, Some(10.0)),
      (1L, 14L, None),                  // 10 + (20-10)*(14-10)/(20-10) = 14
      (1L, 20L, Some(20.0)),
      (1L, 99L, None),                  // trailing gap → LOCF 20
      (2L, 5L, None))                   // all-null series stays null
      .toDF("user_id", "t", "v")
    val got = EventAnalytics.interpolate(df, "v", "t",
        Seq("user_id"), Seq("t"))
      .select(col("user_id"), col("t"), col("v_interp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSet
    assert(got.contains((1L, 0L, 10.0)))
    assert(got.contains((1L, 14L, 14.0)))
    assert(got.contains((1L, 99L, 20.0)))
    assert(got.exists(x => x._1 == 2L && x._3.isNaN))
  }

  test("distributionStats equals the direct distribution windows exactly") {
    import spark.implicits._
    // the re-keyed form must be value-identical to the single-window
    // form it replaces, including the shapes that stress the closed
    // forms: duplicated values (ties share a range bucket), a group
    // smaller than the tile count (every ntile size formula branch),
    // and a singleton group (percent_rank's n-1 = 0 guard). buckets=4
    // on 300 rows forces multi-row buckets so the prefix-sum offsets
    // genuinely fix up local ranks.
    val rng = new scala.util.Random(17)
    val rows = (0 until 300).map { i =>
      (i.toLong, s"t${i % 3}", math.floor(rng.nextDouble() * 40) / 4.0)
    } ++ Seq((1000L, "tiny", 5.0), (1001L, "tiny", 3.0),
      (1002L, "tiny", 3.0), (2000L, "single", 9.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3), r.getDouble(4), r.getDouble(5))
    val direct = df.select(col("event_id"), col("event_type"), col("value"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .collect().map(key).sortBy(_._1).toSeq
    val rekeyed = EventAnalytics.distributionStats(df, "event_type",
        "value", "event_id", tiles = 4, buckets = 4)
      .collect().map(key).sortBy(_._1).toSeq
    assert(rekeyed == direct)
  }

  test("distributionStats ranks NULL values first — the direct window's " +
      "nulls-first semantics (sentinel bucket, not a silent drop)") {
    import spark.implicits._
    // NULL values route to sentinel bucket -1; without it the inner
    // join on (group, _b) would silently drop them — a contract
    // divergence from the single-window form (r12 ADVICE). Includes an
    // all-null group (percentile cuts are NULL there).
    val rows: Seq[(Long, String, Option[Double])] = Seq(
      (1L, "a", None), (2L, "a", Some(5.0)), (3L, "a", Some(1.0)),
      (4L, "a", None), (5L, "a", Some(3.0)), (6L, "a", Some(2.0)),
      (7L, "allnull", None), (8L, "allnull", None))
    val df = rows.toDF("event_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    def key(r: org.apache.spark.sql.Row) =
      // NULL -> a finite sentinel, not NaN: NaN != NaN would fail the
      // comparison even when both sides agree
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1e18 else r.getDouble(2),
        r.getInt(3), r.getDouble(4), r.getDouble(5))
    val direct = df.select(col("event_id"), col("event_type"), col("value"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .collect().map(key).sortBy(_._1).toSeq
    val rekeyed = EventAnalytics.distributionStats(df, "event_type",
        "value", "event_id", tiles = 4, buckets = 4)
      .collect().map(key).sortBy(_._1).toSeq
    assert(rekeyed == direct)
    assert(rekeyed.size == 8) // every row survives, none dropped
  }

  test("interpolate: duplicate-timestamp bracket fills (no 0/0 null)") {
    import spark.implicits._
    // the null row's previous and next observations share t=10: the
    // slope term is 0/0, which Spark's Divide nulls — the degenerate
    // bracket must still fill (with the previous observation), keeping
    // the 'interior gaps are filled' contract on duplicate-ts data
    val df = Seq(
      (1L, 10L, 1L, Some(3.0)),
      (1L, 10L, 2L, None: Option[Double]),
      (1L, 10L, 3L, Some(7.0)))
      .toDF("user_id", "t", "seq", "v")
    val got = EventAnalytics.interpolate(df, "v", "t",
        Seq("user_id"), Seq("t", "seq"))
      .select(col("seq"), col("v_interp")).collect()
      .map(r => (r.getLong(0), r.isNullAt(1), if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, false, 3.0), (2L, false, 3.0), (3L, false, 7.0)))
  }
}
