package graft

import graft.sources.Tables
import graft.simops.Ivf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev tool: stage-level timing for the IVF query (mirrors JaccardProbe)
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val emb = Tables.embeddings(spark, dir)
    println(s"PROBE rows=${emb.count()}")
    // warmup kernels
    Ivf.topK(emb.limit(50), emb.limit(500), "vec_id", "embedding", 5).count()

    for (_ <- 1 to 2) {
      val queries = emb.orderBy("vec_id").limit(50)
      val cents = time("fitCentroids(2 iters)") {
        Ivf.fitCentroids(emb, "vec_id", "embedding", 16, 2)
      }
      time("full topK") {
        Ivf.topK(queries, emb, "vec_id", "embedding", 5).count()
      }
      time("fit 1 iter") {
        Ivf.fitCentroids(emb, "vec_id", "embedding", 16, 1)
      }
      time("fit 0 iters") {
        Ivf.fitCentroids(emb, "vec_id", "embedding", 16, 0)
      }
      time("queries.limit collect") { queries.count() }
    }
    spark.stop()
  }
}
