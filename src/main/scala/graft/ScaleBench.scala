package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: runs EVERY registered query at one scale directory and
  * prints a JSON line per query. Run it at sf0.1 (or a mult=1 twin) and
  * at a 10× ScaleGen output dir, and the ratio table shows which
  * operators scale linearly and which are dominated by fixed stage
  * cost. The list is derived from SparkEntry.queries (round 6:
  * ScaleGen now twins the TPC-H tables too, so the relational family
  * anchors alongside documents/embeddings/events — and a newly
  * registered query can never silently fall out of the anchor).
  *
  * Usage: runMain graft.ScaleBench <sfDir>
  */
object ScaleBench {
  def queryNames: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    // optional 2nd arg: comma-separated subset to time (focused reruns)
    val names = if (args.length > 1) {
      val keep = args(1).split(",").toSet
      queryNames.filter(keep)
    } else queryNames
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // dimension tables stay broadcast-side past the 10x anchor
      // (orders at zsf1 is 25 MB — a trivial broadcast on any real
      // executor, but over the 10 MB default, which flipped q3/q5
      // to full shuffle joins); split single-file twin tables into
      // enough scan partitions to feed the cores
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup families as Bench.scala
    try {
      SparkEntry.queries("lag_null_fill")(spark, sfDir).count()
      val docs = graft.sources.Tables.documents(spark, sfDir).limit(600)
      graft.dedup.Dedup.minhashLsh(docs, "doc_id", "text").count()
      graft.dedup.Dedup.ngramJaccardSortedPrefix(docs, "doc_id", "text").count()
      graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text").count()
      graft.textops.TextOps.winnowing(docs, "doc_id", "text").count()
      val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(600)
      graft.simops.Similarity.nearDupPairsBanded(
        emb, "vec_id", "embedding", 0.9, numPlanes = 64, bands = 4).count()
      // vocabulary + span + semantic families added in round 4: their
      // first use otherwise lands on whichever of them the timed loop
      // hits first (concat_ws/transform lambdas, centroid-sims kernel,
      // within-list join shapes)
      graft.textops.Vocab.topNgrams(docs, "text", n = 2, k = 10).count()
      graft.textops.Vocab.tfidfTerms(docs, "doc_id", "text", k = 2).count()
      graft.dedup.Dedup.spanPairs(docs, "doc_id", "text").count()
      graft.simops.Embed.semanticDedup(emb.limit(300), "vec_id",
        "embedding", threshold = 0.4, nlist = 4).count()
      graft.simops.Embed.pqTopK(emb.limit(20), emb.limit(300), "vec_id",
        "embedding", kNN = 3, m = 8, k = 8).count()
      for (q <- Seq("text_stats", "quality_score", "lang_id",
          "doc_fingerprint", "rep_stats", "pii_scrub",
          "embedding_quantize", "multimodal_meta"))
        SparkEntry.queries(q)(spark, sfDir).count()
    } catch { case _: Throwable => }
    // two timed passes, report the min: at larger SFs the first full-size
    // execution of each heavy kernel family still absorbs multi-second
    // C2 recompiles (measured 2× swings on the minhash family at sf1
    // between consecutive in-session runs), which is JVM state, not plan
    // cost — the min is the steady-state a long-running cluster job sees
    // per-row GC accounting: the one-JVM suite's ±30% noise is almost
    // always collector time charged to whichever query runs while the
    // heap is full of a PREDECESSOR's garbage. Recording the driver
    // JVM's collector-time delta per timed run (and flagging rows
    // where gc > 30% of wall) makes an anchor table self-certifying —
    // a flagged row needs an isolated re-anchor (the subset arg), an
    // unflagged row's seconds are real.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def timeOne(name: String): (Double, Long, Double) = {
      // drop PREVIOUS queries' localCheckpoint blocks before timing:
      // they accumulate in the one-JVM MemoryStore with no unpersist
      // hook, and by the alphabetical dedup_* block the eviction
      // pressure costs rows up to 10× (r9: dedup_resolve_best 121s
      // in-suite vs 12s isolated — with driver gc_sec ≈ 0, so the
      // gc_noisy flag alone cannot catch this class)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // broadcast blocks are NOT RDDs: their cleanup rides the async
      // ContextCleaner, and after ~160 queries the accumulated blocks
      // inflated the heavy dedup rows 1.4-4x vs isolated (r9-r11
      // adjudications). Drop them synchronously so in-suite == isolated.
      try org.apache.spark.graftbench.BroadcastDrain.drain(spark.sparkContext)
      catch { case _: Throwable => }
      System.gc()
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      // FULL-evaluation count (round 11, shared with Bench): .count()
      // let Catalyst prune pure projection/window rows to a bare scan
      // count — those anchors timed the scan, not the operator. toRdd
      // executes the real physical plan with all output columns.
      val n = try SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.count()
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] $name failed: ${e.getMessage}")
          -1L
        }
      ((System.nanoTime() - t0) / 1e9, n, (gcMillis() - g0) / 1e3)
    }
    val pass1 = names.map(n => n -> timeOne(n)).toMap
    val results = names.map { name =>
      val (s2, n, g2) = timeOne(name)
      // report the faster pass's seconds WITH that pass's gc time
      val (sec, gc) =
        if (pass1(name)._1 <= s2) (pass1(name)._1, pass1(name)._3)
        else (s2, g2)
      val gcFlag = if (sec > 1.0 && gc > 0.3 * sec) ",\"gc_noisy\":true" else ""
      println(f"""SCALEBENCH {"query":"$name","sec":$sec%.3f,"rows":$n,"gc_sec":$gc%.2f$gcFlag,"sf":"$sfDir"}""")
      name -> sec
    }
    println(f"""SCALEBENCH_TOTAL {"sec":${results.map(_._2).sum}%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
