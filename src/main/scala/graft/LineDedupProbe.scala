package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-document anchor for the line-dedup kernels: the registered
  * fixture docs are ~6 lines, where the old O(lines²) HOF forms were
  * invisible — this probe builds 1000-LINE documents (the real web-page
  * shape the C4/MassiveText rules exist for: ~30% repeated lines) and
  * times the rewritten forms at each twin scale, plus one bounded
  * HOF-vs-rewrite comparison quantifying the quadratic tax the rewrite
  * removes.
  *
  * Usage: LineDedupProbe <sfDir> [hofDocs=500]
  */
object LineDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hofDocs = if (args.length > 1) args(1).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 1000 lines/doc, values mod 700 -> ~300 within-doc repeats, and
    // the low line ids repeat across EVERY doc (corpus-rule fodder)
    def longDocs(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(999)),
        i => concat(lit("line "), pmod(col("id") * 7 + i, lit(700)))),
        "\n").as("text"))
    val rows = sources.Tables.documents(spark, sfDir).count()
    def time(label: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = thunk
      println(f"""LINEDEDUP_PROBE {"sf":"$sfDir","which":"$label",""" +
        f""""sec":${(System.nanoTime() - t0) / 1e9}%.3f,"docs":$rows,""" +
        f""""kept_sum":$out}""")
    }
    val d = longDocs(rows)
    time("intra_distinct") {
      textops.LineDedup.dedupLinesIntra(d, "doc_id", "text")
        .agg(sum("n_kept")).head().getLong(0)
    }
    time("corpus_indexed") {
      textops.LineDedup.dedupLinesCorpus(d, "doc_id", "text")
        .agg(sum("n_kept")).head().getLong(0)
    }
    // the quadratic twin, on a BOUNDED doc count (it would not finish
    // at any anchor scale — that is the point)
    val small = longDocs(hofDocs)
    time(s"intra_hof_${hofDocs}docs") {
      textops.LineDedup.dedupLinesIntraHof(small, "doc_id", "text")
        .agg(sum("n_kept")).head().getLong(0)
    }
    time(s"intra_distinct_${hofDocs}docs") {
      textops.LineDedup.dedupLinesIntra(small, "doc_id", "text")
        .agg(sum("n_kept")).head().getLong(0)
    }
    spark.stop()
  }
}
