package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print the executed plan of one registered query.
  * Usage: runMain graft.ProbePlan <queryName> [sfDir]
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.count()
    println("PLAN_BEGIN")
    println(df.queryExecution.executedPlan.toString)
    println("PLAN_END")
    spark.stop()
  }
}
