package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: pair counts and cluster structure of the two LSH pair
  * graphs at a given SF — sizes the connected-components workload
  * (rounds ≈ component diameter).
  */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    for ((name, pairs) <- Seq(
      "minhash" -> graft.dedup.Dedup.minhashLsh(docs, "doc_id", "text",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5),
      "simhash" -> graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3))) {
      val n = pairs.count()
      val cc = graft.dedup.Dedup.clusters(pairs)
      val stats = cc.agg(countDistinct(col("cluster_id")).as("nc"),
        max(col("cluster_size")).as("maxsz"), count(lit(1)).as("nodes"))
        .head()
      println(s"PROBE $name pairs=$n clusters=${stats.getLong(0)} " +
        s"maxSize=${stats.getLong(1)} nodes=${stats.getLong(2)}")
      // replicate the propagation loop with a round counter: how deep is
      // the fixpoint for this graph?
      val p = pairs.select(col("doc_a").cast("long").as("src"),
        col("doc_b").cast("long").as("dst")).localCheckpoint()
      val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      var labels = edges.select(col("src").as("node"), col("dst").as("label"))
        .union(edges.select(col("src").as("node"), col("src").as("label")))
        .groupBy("node").agg(min("label").as("label")).localCheckpoint()
      def s(df: org.apache.spark.sql.DataFrame) =
        df.agg(coalesce(sum(col("label").cast("decimal(28,0)")),
          lit(0).cast("decimal(28,0)"))).head().getDecimal(0)
      var prev = s(labels); var rounds = 0; var done = false
      val t0 = System.nanoTime()
      while (!done && rounds < 64) {
        val prop = edges.join(labels, edges("dst") === labels("node"))
          .select(col("src").as("node"), col("label"))
          .union(labels)
          .groupBy("node").agg(min("label").as("label")).localCheckpoint()
        labels = prop.join(prop.toDF("_n", "_l"),
            col("label") === col("_n"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("_l"), col("label")))
              .as("label"))
          .localCheckpoint()
        val cur = s(labels); done = cur.compareTo(prev) == 0; prev = cur
        rounds += 1
      }
      println(f"PROBE $name rounds=$rounds loopSec=${(System.nanoTime()-t0)/1e9}%.2f")
      // variant B: propagate + jump folded into ONE aggregate per round
      // (jump reads the PREVIOUS labels — one checkpoint/round, stale
      // shortcut). Measures whether the extra checkpoint or the extra
      // round dominates.
      var lb = edges.select(col("src").as("node"), col("dst").as("label"))
        .union(edges.select(col("src").as("node"), col("src").as("label")))
        .groupBy("node").agg(min("label").as("label")).localCheckpoint()
      var prevB = s(lb); var roundsB = 0; var doneB = false
      val t1 = System.nanoTime()
      while (!doneB && roundsB < 64) {
        val jumped = lb.join(lb.toDF("_n", "_l"),
            col("label") === col("_n"), "left")
          .select(col("node"), coalesce(col("_l"), col("label")).as("label"))
        lb = edges.join(lb, edges("dst") === lb("node"))
          .select(col("src").as("node"), col("label"))
          .union(lb.select(col("node"), col("label")))
          .union(jumped)
          .groupBy("node").agg(min("label").as("label")).localCheckpoint()
        val cur = s(lb); doneB = cur.compareTo(prevB) == 0; prevB = cur
        roundsB += 1
      }
      println(f"PROBE $name variantB rounds=$roundsB loopSec=${(System.nanoTime()-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
