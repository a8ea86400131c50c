package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-level timing of the novelty_score pipeline at a
  * scale directory (backs the BASELINE.md analysis of its anchor
  * ratio). Prints one line per stage: grams kernel+explode, the df
  * aggregate, the probe join, and the full query.
  *
  * Usage: runMain graft.NoveltyProbe <sfDir>
  */
object NoveltyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "benchdata/zsf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime() // warm pass then timed pass
      f
      val t1 = System.nanoTime()
      val n = f
      val t2 = System.nanoTime()
      println(f"NOVELTYPROBE $tag warm=${(t1 - t0) / 1e9}%.2f " +
        f"timed=${(t2 - t1) / 1e9}%.2f rows=$n")
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val gramsNoCk = graft.util.Par.spread(docs)
      .select(col("doc_id"), explode(graft.functions.NgramXxSetExpr(
        graft.textops.TextOps.tokens(lower(col("text"))), 2)).as("_gh"))

    time("scan_only")(docs.count())
    time("grams_kernel")(gramsNoCk.count())
    time("dfreq_agg")(
      gramsNoCk.groupBy(col("_gh")).agg(count(lit(1)).as("_df")).count())
    val full = graft.textops.Vocab.noveltyScore(docs, "doc_id", "text")
    time("full_query")(full.count())
    println("NOVELTYPROBE_PLAN\n" + full.queryExecution.executedPlan)
    val lm = graft.textops.Vocab.lmScore(docs, "doc_id", "text")
    time("lm_score")(lm.count())
    println("LM_PLAN\n" + lm.queryExecution.executedPlan)
    spark.stop()
  }
}
