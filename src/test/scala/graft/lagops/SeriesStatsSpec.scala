package graft.lagops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeriesStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val spec = LagSpec(Seq("t"), Seq("sid"), Seq(1))

  test("acf: linear series has acf 1 at every lag; alternating has -1 at lag 1") {
    import spark.implicits._
    val lin = (1 to 12).map(i => (1L, i.toLong, i.toDouble))
    val alt = (1 to 12).map(i => (2L, i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val df = (lin ++ alt).toDF("sid", "t", "v")
    val got = SeriesStats.acf(df, "v", spec, maxLag = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got((1L, 1)) == ((11L, Some(1.0))))
    assert(got((1L, 2)) == ((10L, Some(1.0))))
    assert(got((2L, 1)) == ((11L, Some(-1.0))))
    assert(got((2L, 2)) == ((10L, Some(1.0))))
  }

  test("acf: undefined correlation (too few pairs) is NULL, not NaN") {
    import spark.implicits._
    // 2 rows → lag-2 has 0 pairs, lag-1 exactly 1 pair (corr undefined)
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 7.0)).toDF("sid", "t", "v")
    val rows = SeriesStats.acf(df, "v", spec, maxLag = 2).collect()
    assert(rows.forall(r => r.isNullAt(3)))
    assert(rows.map(r => (r.getInt(1), r.getLong(2))).toSet ==
      Set((1, 1L), (2, 0L)))
  }

  test("acf: one exchange feeds both the window and the per-series agg") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = SeriesStats.acf(ev, "value",
        LagSpec(Seq("ts_ns", "event_id"), Seq("user_id"), Seq(1)), 5)
      .queryExecution.executedPlan.toString
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size
    assert(userExchanges == 1, s"expected 1 user-keyed exchange:\n$plan")
  }

  test("crossCorr: planted one-bucket lead shows up at shift +1 only") {
    import spark.implicits._
    // vb at bucket t+1 equals va at bucket t (nonlinear series, so no
    // other shift correlates perfectly)
    val f = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0)
    val a = f.indices.map(i =>
      (i.toLong, "A", new java.sql.Timestamp(i * 3600L * 1000L), f(i)))
    val b = f.indices.map(i =>
      (100L + i, "B", new java.sql.Timestamp((i + 1) * 3600L * 1000L), f(i)))
    val df = (a ++ b).toDF("event_id", "event_type", "ts", "value")
    val got = SeriesStats.crossCorr(df, "event_type", "ts", "value",
        "A", "B", bucketSeconds = 3600L, maxShift = 2)
      .collect().map(r => (r.getInt(0),
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(1)._2.contains(1.0), s"shift +1 must be exactly 1.0: $got")
    assert(got(1)._1 == 10L)
    assert(got(0)._2.exists(v => math.abs(v) < 0.999))
    assert(got(-1)._2.exists(v => math.abs(v) < 0.999))
  }

  test("decompose: trend recovers a constant, resid carries the spike") {
    import spark.implicits._
    val df = ((1 to 7).map(i => (1L, i.toLong, 10.0)) :+ ((1L, 8L, 24.0)))
      .toDF("sid", "t", "v")
    val got = SeriesStats.decompose(df, "v", spec, halfWidth = 2)
      .orderBy("t").collect()
      .map(r => (r.getDouble(r.fieldIndex("trend")),
        r.getDouble(r.fieldIndex("resid"))))
    // rows far from the spike: trend == value, resid 0
    assert(got(0) == ((10.0, 0.0)) && got(2) == ((10.0, 0.0)))
    // spike row: trend = mean(10,10,24) ≈ 14.666667 (tail-shrunk frame)
    assert(got(7)._1 == 14.666667 && math.abs(got(7)._2 - 9.333333) < 1e-9)
  }

  test("seasonalDecompose: additive identity holds exactly in micro-units") {
    import spark.implicits._
    // 3 repeats of a 4-phase pattern on a rising base: season buckets
    // 0..3 via t % 4
    val vals = (0 until 12).map(i => 10.0 + i + Seq(5.0, -2.0, 0.0, -3.0)(i % 4))
    val df = vals.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong % 4, v) }.toDF("sid", "t", "season", "v")
    val got = SeriesStats.seasonalDecompose(df, "v", "season",
        spec, halfWidth = 2).orderBy("t").collect()
    got.foreach { r =>
      val v = r.getDouble(r.fieldIndex("v"))
      val parts = r.getDouble(r.fieldIndex("trend")) +
        r.getDouble(r.fieldIndex("seasonal")) +
        r.getDouble(r.fieldIndex("remainder"))
      assert(math.round(parts * 1e6) == math.round(v * 1e6),
        s"additive identity at t=${r.getLong(1)}: $v vs $parts")
    }
    // seasonal effects should separate the high phase from the low one
    val bySeason = got.groupBy(_.getLong(2)).map { case (s, rs) =>
      s -> rs.head.getDouble(rs.head.fieldIndex("seasonal")) }
    assert(bySeason(0L) > bySeason(3L),
      s"phase 0 (+5) must sit above phase 3 (-3): $bySeason")
  }

  test("seasonalDecompose: half-tie means round deterministically (ties toward +inf)") {
    import spark.implicits._
    // one series, one season bucket, two rows; trend frame covers both
    // rows at every position (halfWidth 2 > series length), so
    // trend = mean(1.00, 1.01) = 1.005 exactly — a half-micro tie at
    // cents scale is impossible, but the SEASONAL mean of the two
    // detrended values (-0.005, +0.005) sums to zero; construct the
    // tie on the trend instead: mean in micros = 1005000 exact. Use 3
    // rows where the group mean of detrended micros ends in .5
    val df = Seq((1L, 0L, 0L, 1.00), (1L, 1L, 0L, 1.01))
      .toDF("sid", "t", "season", "v")
    val got = SeriesStats.seasonalDecompose(df, "v", "season",
        spec, halfWidth = 2).orderBy("t").collect()
    val trend = got.map(_.getDouble(got.head.fieldIndex("trend")))
    assert(trend.forall(_ == 1.005), s"exact micro mean: ${trend.toSeq}")
    got.foreach { r =>
      val parts = r.getDouble(r.fieldIndex("trend")) +
        r.getDouble(r.fieldIndex("seasonal")) +
        r.getDouble(r.fieldIndex("remainder"))
      assert(math.round(parts * 1e6) ==
        math.round(r.getDouble(r.fieldIndex("v")) * 1e6))
    }
  }

  test("rollingCorr: locally linear series shows corr 1 once the frame fills") {
    import spark.implicits._
    val df = (0 until 10).map(i => (1L, i.toLong, 2.0 * i + 3.0))
      .toDF("sid", "t", "v")
    val got = SeriesStats.rollingCorr(df, "v", spec, window = 4)
      .orderBy("t").collect()
    val head = got(0)
    assert(head.isNullAt(head.fieldIndex("roll_corr")) &&
      head.getLong(head.fieldIndex("n_pairs")) == 0L)
    // from the third row on, >= 2 (value, lag) pairs of a linear series
    got.drop(2).foreach { r =>
      assert(r.getDouble(r.fieldIndex("roll_corr")) == 1.0)
      assert(r.getLong(r.fieldIndex("n_pairs")) <= 4L)
    }
  }

  test("anomalies: spike flags against its own past, not itself") {
    import spark.implicits._
    val vals = Seq(10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 50.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("sid", "t", "v")
    val got = SeriesStats.anomalies(df, "v", spec, window = 6,
        threshold = 3.0)
      .orderBy("t").collect()
    val flags = got.map(_.getBoolean(got.head.fieldIndex("is_anomaly")))
    assert(flags.count(identity) == 1 && flags(6),
      s"only the spike flags: ${flags.toSeq}")
    // the row AFTER the spike: baseline now contains the spike, so its
    // own z is modest — must not flag
    assert(!flags(7))
    // head row: no baseline → z NULL, not flagged
    assert(got(0).isNullAt(got(0).fieldIndex("z")) && !flags(0))
  }

  test("property: acf values stay in [-1, 1] and n_pairs decreases with lag") {
    import spark.implicits._
    // deterministic pseudo-random series (hash-derived, no RNG state)
    val vals = (0 until 200).map(i =>
      (1L + i % 3, i.toLong, ((i * 2654435761L) % 1000L).toDouble / 10.0))
    val got = SeriesStats.acf(vals.toDF("sid", "t", "v"), "v", spec,
      maxLag = 6).collect()
    got.foreach { r =>
      if (!r.isNullAt(3)) {
        val a = r.getDouble(3)
        assert(a >= -1.0 && a <= 1.0, s"acf out of range: $r")
      }
    }
    val bySeries = got.groupBy(_.getLong(0))
    bySeries.foreach { case (_, rs) =>
      val ns = rs.sortBy(_.getInt(1)).map(_.getLong(2))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        s"n_pairs must not grow with lag: ${ns.toSeq}")
    }
  }

  test("property: histogram counts partition the input exactly") {
    import spark.implicits._
    val vals = (0 until 500).map(i =>
      (s"t${i % 4}", ((i * 131) % 140).toDouble - 10.0))
    val df = vals.toDF("event_type", "value")
    val got = graft.lagops.EventAnalytics.histogram(df, "event_type",
      "value", width = 10.0, nBuckets = 12).collect()
    assert(got.map(_.getLong(2)).sum == 500L)
    assert(got.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 11))
    // per-group totals match the input partition
    val byType = got.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val expected = vals.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(byType == expected)
  }

  test("anomalies: zero-spread baseline yields NULL z (never a division blowup)") {
    import spark.implicits._
    val df = (1 to 6).map(i => (1L, i.toLong, 5.0)).toDF("sid", "t", "v")
    val got = SeriesStats.anomalies(df, "v", spec, window = 4,
        threshold = 2.0).collect()
    assert(got.forall(r => r.isNullAt(r.fieldIndex("z"))))
    assert(got.forall(r => !r.getBoolean(r.fieldIndex("is_anomaly"))))
  }
}
