package graft

import graft.simops.Ivf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the LARGE-nlist two-level forest path (the
  * broadcast-relation regime past [[Ivf.ForestLiteralMaxLists]]):
  * fits a ≥10⁴-list geometry over synthetic hash-uniform vectors with
  * BOTH paths, pins assignment equality at probe scale, and reports
  * wall time plus driver-heap growth — the literal path's cost is
  * exactly the O(nlist·dim) per-pass collect + per-task forest bytes
  * the relational path removes.
  *
  * Usage: HierForestProbe [nVecs] [nlist] [compareLiteral(0|1)]
  */
object HierForestProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val nlist = if (args.length > 1) args(1).toInt else 16384
    val compareLit = args.length <= 2 || args(2) == "1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 64
    // deterministic hash-uniform vectors in [-1, 1) — index-fit
    // physics only, no oracle surface
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

    println(s"PROBE n=$n nlist=$nlist dim=$dim " +
      s"(forest=${nlist.toLong * dim} doubles)")
    // warmup
    Ivf.assignHierRelational(vecs.limit(2000), "vec_id", "embedding",
      64, 1, 100, 2000).queryExecution.toRdd.count()

    val rel = time(s"relational fit+assign") {
      val df = Ivf.assignHierRelational(vecs, "vec_id", "embedding",
        nlist, 1, 100, n)
      df.queryExecution.toRdd.count()
      df
    }
    if (compareLit) {
      val lit0 = time(s"literal    fit+assign") {
        val df = Ivf.assignHierLiteral(vecs, "vec_id", "embedding",
          nlist, 1, 100, n)
        df.queryExecution.toRdd.count()
        df
      }
      val diff = time("equality check") {
        rel.select(col("_id"), col("list_id").as("lr"))
          .join(lit0.select(col("_id"), col("list_id").as("ll")), "_id")
          .filter(col("lr") =!= col("ll")).count()
      }
      println(s"PROBE assignment_mismatches=$diff")
    }
    val lists = rel.groupBy("list_id").count()
      .agg(count(lit(1)), max("count")).collect()(0)
    println(s"PROBE lists=${lists.getLong(0)} max_list=${lists.getLong(1)}")
    spark.stop()
  }
}
