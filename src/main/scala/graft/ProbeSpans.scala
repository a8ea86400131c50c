package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the spanPairs pipeline at one
  * scale dir — winnow+checkpoint, df aggregate, pruned materialize,
  * self-join+agg — to attribute the query's cost before tuning the
  * join strategy. Usage: runMain graft.ProbeSpans [sfDir]
  */
object ProbeSpans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "benchdata/zsf1"
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    val fps = t("winnow+ckpt") {
      graft.textops.TextOps.winnowing(docs, "doc_id", "text", 8, 4)
        .select(col("doc_id").cast("long").as("_id"), col("fp"))
        .localCheckpoint()
    }
    println(s"PROBE fps_rows ${fps.count()}")
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= 16).select(col("fp"))
    val pruned = t("pruned+ckpt") { fps.join(rare, "fp").localCheckpoint() }
    println(s"PROBE pruned_rows ${pruned.count()}")
    val joined = pruned.as("a").join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5)
    println(s"PROBE pairs ${t("selfjoin+agg")(joined.count())}")
    // second pass to split JIT from steady state
    println(s"PROBE pairs2 ${t("selfjoin+agg2")(joined.count())}")
    spark.stop()
  }
}
