package graft

import graft.simops.{Ivf, VectorIndexStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the SERVING index at large-nlist geometry (the
  * HierForestProbe convention applied to [[VectorIndexStore]]): builds
  * the store over synthetic hash-uniform vectors through BOTH dispatch
  * branches at the same geometry, pins stored-code equality, and
  * reports wall time plus driver-heap growth — the literal branch's
  * driver state is the O(nlist·dim) forest; the relational branch's
  * must stay O(√nlist·dim + m·k·subDim) no matter how large nlist
  * grows. Then times the stored probe and prints the fraction of code
  * partitions its DPP-pruned scan actually read.
  *
  * Usage: VecIndexStoreProbe [nVecs] [targetListSize]
  *   [compareLiteral(0|1)] [writeStore(0|1)]
  * `writeStore=0` compares the in-memory coded frames and skips the
  * parquet write + probe — the mode for past-threshold geometries
  * (>2¹⁶ lists), where the claim under test is the BUILD's driver
  * flatness, not the local filesystem's tolerance for 10⁵ partition
  * directories (object stores at cluster scale don't share that
  * constraint).
  */
object VecIndexStoreProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val tls = if (args.length > 1) args(1).toInt else 8
    val compareLit = args.length <= 2 || args(2) == "1"
    val writeStore = args.length <= 3 || args(3) == "1"
    // rowGroupBytes (arg 5, 0 = parquet default): shrink the parquet
    // row-group/page geometry for the WRITE so a local-scale bucket
    // holds many row groups — the shape a 100 TB store has naturally
    // (a clamp-region bucket is corpus/256 rows ≈ hundreds of 128 MB
    // groups) — letting the within-bucket list_id pushdown's
    // row-group pruning be MEASURED locally instead of asserted
    val rowGroupBytes = if (args.length > 4) args(4).toInt else 0
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (rowGroupBytes > 0) {
      val hc = spark.sparkContext.hadoopConfiguration
      hc.setInt("parquet.block.size", rowGroupBytes)
      hc.setInt("parquet.page.size", math.max(rowGroupBytes / 8, 1024))
      println(s"PROBE rowGroupBytes=$rowGroupBytes (scale-simulation " +
        "write geometry)")
    }

    val dim = 64
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      array((0 until dim).map(i =>
        pmod(xxhash64(col("id"), lit(i)), lit(100000L)).cast("double")
          / 50000.0 - 1.0): _*).as("embedding"))
      .localCheckpoint() // bounded probe input, keeps gen out of timings

    def heapMb(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }
    def time[T](label: String)(f: => T): T = {
      val h0 = heapMb()
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label%-34s $sec%8.3f s  heap ${h0}->${heapMb()} MB")
      r
    }

    val nlist = graft.simops.Embed.autoNlist(n, tls)
    println(s"PROBE n=$n tls=$tls -> nlist=$nlist dim=$dim " +
      s"(relational=${nlist > Ivf.ForestLiteralMaxLists} at the " +
      s"production threshold ${Ivf.ForestLiteralMaxLists})")

    val sdR = java.nio.file.Files.createTempDirectory("vecprobe_r").toString
    val relS = time(if (writeStore) "relational build+write"
                    else "relational build") {
      val st = VectorIndexStore.build(vecs, "vec_id",
        "embedding", targetListSize = tls, m = 8, k = 16, iters = 1,
        fitSamplePct = 60, dim = dim, knownCount = n, literalMax = 1)
      if (writeStore) VectorIndexStore.write(st, sdR)
      else st.coded.queryExecution.toRdd.count()
      st
    }
    if (compareLit) {
      val litS = time(if (writeStore) "literal    build+write"
                      else "literal    build") {
        val st = VectorIndexStore.build(vecs, "vec_id",
          "embedding", targetListSize = tls, m = 8, k = 16, iters = 1,
          fitSamplePct = 60, dim = dim, knownCount = n,
          literalMax = Int.MaxValue)
        if (writeStore) {
          val sdL = java.nio.file.Files
            .createTempDirectory("vecprobe_l").toString
          VectorIndexStore.write(st, sdL)
        } else st.coded.queryExecution.toRdd.count()
        st
      }
      val diff = time("stored-code equality check") {
        relS.coded.select(col("vec_id"), col("list_id").as("lr"),
            col("codes").as("cr"))
          .join(litS.coded.select(col("vec_id"),
            col("list_id").as("ll"), col("codes").as("cl")), "vec_id")
          .filter(col("lr") =!= col("ll") || col("cr") =!= col("cl"))
          .count()
      }
      println(s"PROBE stored_code_mismatches=$diff")
    }
    if (writeStore) {
      val store = VectorIndexStore.read(spark, sdR)
      val q = vecs.filter(col("vec_id") < 10)
      // warmup then timed probe
      VectorIndexStore.topK(q, store, "vec_id", "embedding", kNN = 5)
        .queryExecution.toRdd.count()
      val probe = time("stored probe (10 queries)") {
        val df = VectorIndexStore.topK(q, store, "vec_id", "embedding",
          kNN = 5)
        df.queryExecution.toRdd.count()
        df
      }
      val planStr = probe.queryExecution.executedPlan.toString
      val pruned = planStr.contains("PartitionFilters: [part_id") &&
        planStr.contains("PushedFilters: [In(list_id")
      // the within-bucket amplification measurement (clamp region:
      // each part_id bucket holds nlist/MaxCodeParts lists): rows the
      // pruned scan actually emitted vs the two structural bounds —
      // all rows in the probed BUCKETS (what bucket-level pruning
      // alone reads: the pre-pushdown cost) and the rows of the
      // probed LISTS (the ideal). The scan metric should sit at or
      // near the list bound once row-group stats can bite (at
      // production row-group sizes a bucket holds many groups; see
      // rowGroupBytes below for the local simulation knob).
      val qp = VectorIndexStore.probeFrame(q, store, "vec_id",
        "embedding", nprobe = 4)
      val probedPL = qp.select(col("part_id"), col("list_id"))
        .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
      val bucketRows = store.coded.filter(
        col("part_id").isin(probedPL.map(_._1).distinct.toSeq: _*)).count()
      val listRows = store.coded.filter(
        col("list_id").isin(probedPL.map(_._2).distinct.toSeq: _*)).count()
      // walk through AQE wrappers (AdaptiveSparkPlanExec replaces its
      // tree at runtime; QueryStageExec wraps materialized stages) to
      // reach the actual executed codes scan and its row metric
      def scanRows(p: org.apache.spark.sql.execution.SparkPlan): Long = {
        val self = p match {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.toString.contains("codes") =>
            s.metrics("numOutputRows").value
          case _ => 0L
        }
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => Seq(qs.plan)
          case other => other.children
        }
        self + kids.map(scanRows).sum
      }
      val scanRowsRead = scanRows(probe.queryExecution.executedPlan)
      println(s"PROBE literal_pruned=$pruned scan_rows_read=$scanRowsRead " +
        s"probed_bucket_rows=$bucketRows probed_list_rows=$listRows " +
        s"stored=${store.coded.count()} codes in $nlist lists")
    }
    spark.stop()
  }
}
