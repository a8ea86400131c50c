package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("piiScrub redacts planted emails and IPv4s and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact alice@example.com or bob.smith@mail.co today"),
      (2L, "server at 10.0.0.1 and backup at 192.168.1.255 ok"),
      (3L, "mixed carol+x@a.io from 127.0.0.1"),
      (4L, "no pii here at all")).toDF("doc_id", "text")
    val out = Pipeline.piiScrub(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((2, 0), (0, 2), (1, 1), (0, 0)))
    assert(out(0).getString(3) ==
      md5hex("contact <EMAIL> or <EMAIL> today"))
    assert(out(2).getString(3) == md5hex("mixed <EMAIL> from <IP>"))
    assert(out(3).getString(3) == md5hex("no pii here at all"))
  }

  test("seqPack equals the single-window global prefix sum") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = rng.shuffle((0 until 500).toList)
      .map(i => (i.toLong, ("tok " * (1 + rng.nextInt(40))).trim))
      .toDF("doc_id", "text")
    val packed = Pipeline.seqPack(df, "doc_id", "text", budget = 64,
      numBuckets = 7)
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .select(col("doc_id"),
        graft.textops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("pre", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("pre") / 64).cast("long").as("pack_id"),
        (col("pre") % 64).as("pack_offset"))
    val a = packed.orderBy("doc_id").collect().toSeq
    val b = expected.orderBy("doc_id").collect().toSeq
    assert(a == b)
    packed.collect().foreach { r =>
      val off = r.getLong(3)
      assert(off >= 0 && off < 64)
    }
  }

  // the fork-safety proof for the pinned-boundary rewrite: the bucketed
  // frame feeds TWO subplans (in-bucket prefixes + base offsets), and
  // with exchange reuse off each subplan re-evaluates its own shuffle.
  // A spark_partition_id()-derived bucket could then see different range
  // boundaries per branch and emit inconsistent pack offsets; a literal-
  // boundary bucket column cannot.
  test("seqPack is fork-safe: exact with exchange reuse and AQE disabled") {
    import spark.implicits._
    val conf = spark.conf
    val prevReuse = conf.get("spark.sql.exchange.reuse", "true")
    val prevAqe = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.exchange.reuse", "false")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rng = new scala.util.Random(7)
      val df = rng.shuffle((0 until 300).toList)
        .map(i => (i.toLong, ("tok " * (1 + rng.nextInt(20))).trim))
        .toDF("doc_id", "text")
      val packed = Pipeline.seqPack(df, "doc_id", "text", budget = 64,
        numBuckets = 5)
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val expected = df
        .select(col("doc_id"),
          graft.textops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("pre", coalesce(sum("n_tokens").over(w), lit(0L)))
        .select(col("doc_id"), col("n_tokens"),
          floor(col("pre") / 64).cast("long").as("pack_id"),
          (col("pre") % 64).as("pack_offset"))
      assert(packed.orderBy("doc_id").collect().toSeq ==
        expected.orderBy("doc_id").collect().toSeq)
    } finally {
      conf.set("spark.sql.exchange.reuse", prevReuse)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("seqPack tolerates an empty corpus") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Pipeline.seqPack(df, "doc_id", "text", budget = 64).count() == 0)
  }

  test("corpusShuffle packs the exact shuffle-key order, deterministically") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val df = rng.shuffle((0 until 400).toList)
      .map(i => (i.toLong, ("tok " * (1 + rng.nextInt(30))).trim))
      .toDF("doc_id", "text")
    val packed = Pipeline.corpusShuffle(df, "doc_id", "text", budget = 64,
      seed = "s1", numBuckets = 7)
    val rows = packed.collect()
    // a permutation: every document exactly once
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      (0L until 400L))
    // the pack assignment IS the prefix sum in (shuffle_key, doc_id)
    // order: replay it driver-side
    var pre = 0L
    rows.sortBy(r => (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id")))
      .foreach { r =>
        assert(r.getAs[Long]("pack_id") == pre / 64 &&
          r.getAs[Long]("pack_offset") == pre % 64,
          s"misplaced pack slot at doc ${r.getAs[Long]("doc_id")}")
        pre += r.getAs[Long]("n_tokens")
      }
    // shuffle key matches the portable definition: top 60 md5 bits
    rows.take(20).foreach { r =>
      val expected = java.lang.Long.parseLong(
        md5hex(s"s1-${r.getAs[Long]("doc_id")}").take(15), 16)
      assert(r.getAs[Long]("shuffle_key") == expected)
    }
    // deterministic: same seed reproduces; a different seed reorders
    assert(Pipeline.corpusShuffle(df, "doc_id", "text", budget = 64,
        seed = "s1", numBuckets = 7).collect().toSet == rows.toSet)
    val reseeded = Pipeline.corpusShuffle(df, "doc_id", "text", budget = 64,
      seed = "s2", numBuckets = 7)
      .select("doc_id", "pack_id", "pack_offset").collect().toSet
    assert(reseeded !=
      rows.map(r => org.apache.spark.sql.Row(r.getAs[Long]("doc_id"),
        r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset"))).toSet)
  }

  test("sampleQualityTiers: quantile tiers, ramped keep rates, no global window") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Pipeline.sampleQualityTiers(docs, "doc_id", "text",
      tiers = 4, pctByTier = Map(1 -> 5, 2 -> 20, 3 -> 50, 4 -> 90))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // keep-rate ramp: kept-count per tier must rise with the tier's pct
    // relative to the (ntile-equal) tier populations — with 4 equal
    // tiers of ~125 docs at sf0.001, expect roughly 6/25/62/112 keeps;
    // assert the monotone ramp, not exact counts (tie-straddling
    // boundaries shift populations slightly)
    val byTier = rows.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert((1 to 4).forall(byTier.contains), s"missing tier in $byTier")
    assert(byTier(1) < byTier(2) && byTier(2) < byTier(3) &&
      byTier(3) < byTier(4), s"keep ramp violated: $byTier")
    // quality ordering across tiers: max quality of tier t ≤ min... not
    // strictly (ties straddle); assert means are monotone
    val meanQ = rows.groupBy(_.getInt(2)).view
      .mapValues(rs => rs.map(_.getDouble(1)).sum / rs.length).toMap
    assert(meanQ(1) <= meanQ(2) && meanQ(2) <= meanQ(3) &&
      meanQ(3) <= meanQ(4), s"tier quality not monotone: $meanQ")
    // the scale contract: no single-partition global window anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["), s"unexpected window op:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"), "thresholds must broadcast")
  }

  test("corpusClean composes gate -> dedup -> sample -> pack coherently") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Pipeline.corpusClean(docs, "doc_id", "text", "lang",
      minQuality = 0.3, pctByStratum = Map("en" -> 80, "zh" -> 50),
      defaultPct = 25, budget = 256)
    val rows = out.orderBy("doc_id").collect()
    assert(rows.nonEmpty && rows.length < docs.count())
    // quality floor holds; offsets are valid pack positions
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.3)
      val off = r.getLong(5)
      assert(off >= 0 && off < 256)
    }
    // packing is the prefix sum over survivors in id order: recompute
    // globally and compare
    var pre = 0L
    rows.foreach { r =>
      assert(r.getLong(4) == pre / 256, s"pack_id at ${r.getLong(0)}")
      assert(r.getLong(5) == pre % 256, s"pack_offset at ${r.getLong(0)}")
      pre += r.getLong(3)
    }
  }

  test("corpusCleanNear: gate, exact-dup, then greedy smaller-id near-dedup") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then the " +
      "small cat walks near the old tree while a bird sings of summer " +
      "days in the town square"
    val other = "catalyst plans the shuffle stages while tungsten packs " +
      "the rows into unsafe buffers and the scheduler assigns every task " +
      "to an executor core until the whole stage completes"
    val docs = Seq(
      (1L, base, "en"),              // keeper (smallest id of its group)
      (2L, base + " tonight", "en"), // near-dup of 1 -> dropped
      (3L, base, "en"),              // exact dup of 1 -> dropped in stage 2
      (4L, other, "en"),             // unrelated keeper
      (5L, "junk", "en")             // one token: below the quality floor
    ).toDF("doc_id", "text", "lang")
    val out = Pipeline.corpusCleanNear(docs, "doc_id", "text", "lang",
      minQuality = 0.3).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 4L), out.mkString(";"))
    // survivors keep the narrow-stage columns
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.3)
      assert(r.getLong(3) > 0)
    }
  }

  test("decontaminate flags n-gram overlap with probes, excludes probes") {
    import spark.implicits._
    val leak = "the capital of france is paris and the answer is forty two"
    val corpus = Seq(
      10L -> s"training text that quotes: $leak verbatim in the middle",
      11L -> "completely unrelated content about spark catalyst plans here",
      1L -> leak // the probe doc itself also present in the corpus
    ).toDF("doc_id", "text")
    val probes = Seq(1L -> leak).toDF("doc_id", "text")
    val out = Pipeline.decontaminate(corpus, probes, "doc_id", "text",
      shingleSize = 5, minShared = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(10L) && out(10L) >= 1) // leaked 5-grams found
    assert(!out.contains(11L)) // clean doc untouched
    assert(!out.contains(1L))  // probe rows are not findings
  }

  test("decontaminatePairs attributes each leak to its probe document") {
    import spark.implicits._
    val leakA = "the capital of france is paris and the answer is forty two"
    val leakB = "neural networks memorize benchmark answers when data leaks badly"
    val corpus = Seq(
      10L -> s"quotes first probe: $leakA verbatim here",
      11L -> s"quotes second probe: $leakB in the middle",
      12L -> s"quotes both: $leakA also $leakB",
      13L -> "entirely clean content about catalyst optimizer rules"
    ).toDF("doc_id", "text")
    val probes = Seq(1L -> leakA, 2L -> leakB).toDF("doc_id", "text")
    val pairs = Pipeline.decontaminatePairs(corpus, probes, "doc_id",
      "text", shingleSize = 5, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (11L, 2L), (12L, 1L), (12L, 2L)))
    // pairs aggregate to exactly the gate's per-doc decision
    val gate = Pipeline.decontaminate(corpus, probes, "doc_id", "text",
      shingleSize = 5, minShared = 1).collect().map(_.getLong(0)).toSet
    assert(pairs.map(_._1) == gate)
  }

  test("sampleStratified applies per-stratum rates deterministically") {
    import spark.implicits._
    val df = (0 until 1000)
      .map(i => (i.toLong, Seq("en", "zh", "de")(i % 3)))
      .toDF("doc_id", "lang").withColumn("text", lit("x"))
    val pct = Map("en" -> 80, "zh" -> 50)
    val once = Pipeline.sampleStratified(df, "doc_id", "lang", pct, 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val again = Pipeline.sampleStratified(df, "doc_id", "lang", pct, 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(once == again)
    once.foreach { case (_, lang, bucket) =>
      assert(bucket < pct.getOrElse(lang, 25), s"$lang bucket $bucket")
    }
    // rates are roughly honored (md5 buckets are uniform-ish)
    val byLang = once.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang("en") > 200 && byLang("zh") > 100 && byLang("de") > 40)
    assert(byLang("en") > byLang("zh") && byLang("zh") > byLang("de"))
  }

  test("ingestClean: gate, exact and near checks compose into the accept bit") {
    import spark.implicits._
    val kept = ("spark catalyst and tungsten keep the query plan both " +
      "declarative and fast for everyone involved in it ") * 3
    val near = kept.replace("fast", "quick")
    val corpus = Seq(1L -> kept).toDF("doc_id", "text")
    val incoming = Seq(
      10L -> "??", // gate-rejected (too short / low quality)
      11L -> kept, // exact dup of corpus doc 1
      12L -> near, // near-dup of corpus doc 1
      13L -> ("a genuinely new document about entirely different things " +
        "with plenty of common words that clear the quality bar here ") * 3,
      14L -> (("another brand new passage that should be accepted and is " +
        "long enough to pass the quality threshold comfortably today ") * 3)
    ).toDF("doc_id", "text")
    val out = Pipeline.ingestClean(incoming, corpus, "doc_id", "text",
        minQuality = 0.3, threshold = 0.3).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(out(10L) == (false, false, false)) // rejected, never evaluated
    assert(out(11L) == (false, false, false)) // exact dup (near also fires)
    assert(out(12L)._2 == false && !out(12L)._3) // near-dup rejected
    assert(out(12L)._1 == true) // ...but not an exact dup
    assert(out(13L) == (true, true, true))
    assert(out(14L) == (true, true, true))
  }

  test("packManifest: per-pack member lists with boundary offsets in order") {
    import spark.implicits._
    // budget 10: docs of 4/4/4 tokens -> doc 3 starts at offset 8 and
    // straddles into pack 1; doc 4 (2 tokens) lands at pack 1 offset 2
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"), (4L, "a b")
    ).toDF("doc_id", "text")
    val out = Pipeline.packManifest(df, "doc_id", "text", budget = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(out(0L) == (3L, 12L, "0,4,8", "1,2,3")) // straddler counted at start
    assert(out(1L) == (1L, 2L, "2", "4"))
  }

  test("sampleTemperature: τ=1 is the identity mix (natural shares keep everything)") {
    import spark.implicits._
    val df = (0 until 900)
      .map(i => (i.toLong, Seq("web", "code", "books")(i % 3), "a b c d e"))
      .toDF("doc_id", "source", "text")
    // τ=1: share_s = T_s/ΣT exactly, so T_s/share_s = ΣT for every
    // stratum, T_out = ΣT, keep = 100% everywhere
    val out = Pipeline.sampleTemperature(df, "doc_id", "source", "text",
      temperature = 1.0).count()
    assert(out == 900L)
  }

  test("sampleTemperature: τ>1 keeps the low-resource stratum whole and downsamples the head") {
    import spark.implicits._
    // web 8x the mass of books: at τ=2 target shares flatten toward
    // uniform, so books (smallest) binds and keeps ~everything while
    // web sheds mass
    val docs = (0 until 800).map(i => (i.toLong, "web", "a b c d e")) ++
      (800 until 900).map(i => (i.toLong, "books", "a b c d e"))
    val out = Pipeline.sampleTemperature(docs.toDF("doc_id", "source", "text"),
        "doc_id", "source", "text", temperature = 2.0).collect()
      .map(r => r.getString(1))
    val bySource = out.groupBy(identity).view.mapValues(_.length).toMap
    val books = bySource.getOrElse("books", 0)
    val web = bySource.getOrElse("web", 0)
    // books keeps ~100% (md5 draw jitter aside); web keeps
    // sqrt(8)/1 · 100/800 ≈ 35% of its docs
    assert(books >= 95, s"books must keep ~all: $bySource")
    assert(web > 200 && web < 420, s"web must downsample to ~35%: $bySource")
  }

  test("sampleMixture lands output token shares on the target weights") {
    import spark.implicits._
    // 3000 docs, 5 tokens each, equal thirds by language; target
    // shares en:zh:de = 3:1:1. de/zh are co-binding? No: equal input
    // mass, en wants 3/5 of output — en binds (keeps all), zh/de
    // downsample to 1/3 of en's tokens each.
    val df = (0 until 3000)
      .map(i => (i.toLong, Seq("en", "zh", "de")(i % 3), "a b c d e"))
      .toDF("doc_id", "lang", "text")
    val out = Pipeline.sampleMixture(df, "doc_id", "lang", "text",
        Map("en" -> 3.0, "zh" -> 1.0, "de" -> 1.0)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // deterministic
    val again = Pipeline.sampleMixture(df, "doc_id", "lang", "text",
      Map("en" -> 3.0, "zh" -> 1.0, "de" -> 1.0)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val tokensByLang = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // binding stratum keeps (almost) everything: 1000 docs x 5 tokens
    assert(tokensByLang("en") >= 4995L * 1, s"en kept ${tokensByLang("en")}")
    // zh and de land near 1/3 of en's mass (md5 draw is uniform-ish)
    for (l <- Seq("zh", "de")) {
      val ratio = tokensByLang(l).toDouble / tokensByLang("en")
      assert(ratio > 0.25 && ratio < 0.42, s"$l share ratio $ratio")
    }
    // weight-0 strata drop entirely
    val dropped = Pipeline.sampleMixture(df, "doc_id", "lang", "text",
      Map("en" -> 1.0)).collect().map(_.getString(1)).toSet
    assert(dropped == Set("en"))
  }

  test("capPerGroup: salted two-phase equals the global per-group rank") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("doc_id", "grp").repartition(7)
    val got = Pipeline.capPerGroup(df, "doc_id", "grp", k = 5, numSalts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every group capped at exactly k
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("g0" -> 5, "g1" -> 5, "g2" -> 5))
    // equals the unsalted global rank (the oracle's formulation)
    val want = df
      .withColumn("draw", md5(col("doc_id").cast("string")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy(col("draw"), col("doc_id"))))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("grp"), col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == want.toSet)
    // a group smaller than k survives whole
    val small = Pipeline.capPerGroup(
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "grp"),
      "doc_id", "grp", k = 5).collect()
    assert(small.length == 3)
  }
}
