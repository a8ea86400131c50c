package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16 optimization): stage breakdown of `crawl_clean` —
  * WARC write, WARC read, narrow extraction+gate+exact-dedup,
  * survivor-text minhash, full row.
  * Usage: runMain graft.ProbeCrawlStages [sfDir]
  */
object ProbeCrawlStages {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    val q = SparkEntry.queries("crawl_clean")
    // warm
    q(spark, dir).queryExecution.toRdd.count()

    def time(label: String)(body: => Unit): Unit = {
      def once(): Double = {
        System.gc(); val t = System.nanoTime(); body
        (System.nanoTime() - t) / 1e9
      }
      once()
      val v = Seq(once(), once()).min
      println(f"CRAWLSTAGE $label%-22s $v%.3f")
    }

    val d = graft.sources.Tables.documents(spark, dir)
    val rows = d.select(
      concat(lit("http://graft.invalid/doc/"), col("doc_id"))
        .as("target_uri"),
      lit("HTTP/1.1 200 OK").as("status_line"),
      array(struct(lit("Content-Type").as("name"),
        lit("text/html; charset=utf-8").as("value"))).as("http_headers"),
      lit("<p>x</p>").cast("binary").as("body"))
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_crawlstage").toString
    time("warc_write") {
      graft.sources.Warc.writeResponse(rows, tmp, warcinfo = true) }
    val tmp2 = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_crawl_clean").toString
    val resp = graft.sources.Warc.readResponses(spark, tmp2).select(
      regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"),
      col("body").cast("string").as("html"))
    time("warc_read_drain") { resp.queryExecution.toRdd.count() }
    time("narrow") {
      graft.pipeline.Pipeline.crawlCleanNarrow(resp, "doc_id", "html", 0.3)
        .queryExecution.toRdd.count() }
    time("builder_only") { q(spark, dir) }
    val built = q(spark, dir)
    time("drain_only") { built.queryExecution.toRdd.count() }
    time("full_row") { q(spark, dir).queryExecution.toRdd.count() }
    spark.stop()
  }
}
