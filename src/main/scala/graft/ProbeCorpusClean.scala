package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: times corpus_clean's sub-stages in isolation (scan+gate,
  * dedup window, checkpoint materialization, pack assignment, final
  * join) under the bench session config, to attribute its wall-clock
  * across the composed DAG.
  */
object ProbeCorpusClean {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "benchdata/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.textops.TextOps
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the kernel families once
    try {
      SparkEntry.queries("corpus_clean")(spark, sfDir).count()
    } catch { case _: Throwable => }

    for (_ <- 1 to 2) {
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val gated = graft.util.Par.spread(docs)
        .select(col("doc_id"), col("lang"), col("text"),
          TextOps.qualityScore(col("text")).as("quality"))
        .filter(graft.util.Par.noPushdown(col("quality") >= 0.3))
      println(gated.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(110)).take(25).mkString("\n"))
      time("gate")(gated.count())
      val w = Window.partitionBy(col("_fp")).orderBy(col("doc_id"))
      val deduped = gated
        .withColumn("_fp", TextOps.fingerprint(col("text")))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .drop("_fp", "_rn")
      time("gate+dedup")(deduped.count())
      val sampled = time("checkpoint") {
        deduped
          .filter(pmod(conv(substring(md5(col("doc_id").cast("string")),
            1, 15), 16, 10).cast("long"), lit(100L)) <
            when(col("lang") === "en", 80)
              .when(col("lang") === "zh", 50).otherwise(25))
          .select(col("doc_id"), col("lang"), col("quality"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
          .localCheckpoint()
      }
      val packed = graft.pipeline.Pipeline
        .seqPackCounted(sampled, "doc_id", 2048)
      time("seqPackCounted")(packed.count())
      time("final join")(packed
        .join(sampled.select(col("doc_id"), col("lang"), col("quality")),
          Seq("doc_id")).count())
      time("whole corpus_clean")(
        SparkEntry.queries("corpus_clean")(spark, sfDir).count())
    }
    spark.stop()
  }
}
