package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes `embedding_clusters_planted`'s anchor ratio (7.0×/decade
  * at the round-8 100× point) into its stages: planted-union pair
  * generation, the eager pair checkpoint inside [[graft.dedup.Dedup.clusters]],
  * the closure itself, and the output window. Run at zsf1 and zsf10:
  *
  *   runMain graft.ProbeCCPlanted benchdata/zsf1
  *   runMain graft.ProbeCCPlanted benchdata/zsf10
  */
object ProbeCCPlanted {
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
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def planted = {
      val e = Tables.embeddings(spark, dir)
      e.unionByName(e
        .filter(graft.util.Sampling.md5Bucket(col("vec_id")) < 5)
        .select((col("vec_id") + lit(10000000L)).as("vec_id"),
          concat(array(element_at(col("embedding"), 1) * lit(0.5f)),
            slice(col("embedding"), 2, 63)).as("embedding"),
          col("label")))
    }
    def pairs = graft.simops.Similarity.nearDupPairsBanded(planted,
      "vec_id", "embedding", 0.9, numPlanes = 64, bands = 4, dim = 64)

    def time(name: String)(f: => Long): Unit = {
      // two passes, min — the ScaleBench convention
      def one(): (Double, Long) = {
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (s1, n) = one(); val (s2, _) = one()
      println(f"""PROBE_CC {"stage":"$name","sec":${math.min(s1, s2)}%.3f,"rows":$n,"dir":"$dir"}""")
    }

    time("pairgen_count") { pairs.count() }
    time("pairs_checkpoint") {
      val p = pairs.select(col("id_a").cast("long"),
        col("id_b").cast("long")).localCheckpoint()
      val n = p.count(); p.unpersist(); n
    }
    time("clusters_total") {
      graft.dedup.Dedup.clusters(pairs, aCol = "id_a", bCol = "id_b").count()
    }
    // pair gen paid ONCE up front; the closure timer sees only the
    // checkpointed edge frame
    val pMat = pairs.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b")).localCheckpoint()
    pMat.count()
    time("clusters_closure_only") {
      graft.dedup.Dedup.clusters(pMat, aCol = "id_a", bCol = "id_b").count()
    }
    pMat.unpersist()
    spark.stop()
  }
}
