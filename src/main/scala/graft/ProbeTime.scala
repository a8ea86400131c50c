package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time individual registered queries under the Bench
  * session config (local[N], AQE on), two timed passes each with the
  * min reported — the same convention as [[ScaleBench]], so numbers
  * line up with BENCH rows without running the whole suite.
  * Usage: runMain graft.ProbeTime <q1,q2,...> [sfDir] [passes]
  */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
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
    for (name <- names) {
      // one untimed warmup pass per query (JIT + codegen + parquet
      // footers), then `passes` timed runs, min wins
      try SparkEntry.queries(name)(spark, dir).count()
      catch { case _: Throwable => }
      val times = (1 to passes).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, dir).count()
        catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBETIME $name%-28s min=${times.min}%.3f all=" +
        times.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
