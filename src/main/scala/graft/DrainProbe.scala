package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe for the round-12 in-suite broadcast fix: proves
  * [[org.apache.spark.graftbench.BroadcastDrain]] (a) removes the
  * broadcast blocks a join leaves behind (first drain > 0), (b) is
  * idempotent (second drain == 0), and (c) leaves the session fully
  * usable (the same broadcast-join shape re-runs clean afterwards).
  * Backs the Bench/ScaleBench change that makes in-suite anchor rows
  * match their isolated numbers (rounds 9–11 adjudicated 1.4–4×
  * in-suite inflation on the heavy dedup rows to exactly this
  * accumulation).
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val big = spark.range(100000).withColumn("k", col("id") % 100)
    val small = spark.range(100).withColumn("k", col("id"))
      .withColumn("v", lit("x"))
    big.join(broadcast(small), "k").queryExecution.toRdd.count()
    val n1 = org.apache.spark.graftbench.BroadcastDrain.drain(spark.sparkContext)
    val n2 = org.apache.spark.graftbench.BroadcastDrain.drain(spark.sparkContext)
    println(s"DRAIN first=$n1 second=$n2")
    // re-run the same shaped query after draining: must still work
    big.join(broadcast(small), "k").queryExecution.toRdd.count()
    println("RERUN OK")
    spark.stop()
  }
}
