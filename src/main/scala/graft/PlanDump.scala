package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print a registered query's executed plan at sf0.001 —
  * the quickest way to check fence strings (PushedFilters,
  * PartitionFilters, scan counts) against the real plan text.
  * Usage: PlanDump <queryName> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "similarity_ivfpq_probe"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    println(s"=== EXECUTED PLAN: $name ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
