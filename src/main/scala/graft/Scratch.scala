package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway local experiments; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val d = sources.Tables.documents(spark, dir)
    d.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }

    val th = d.select(col("doc_id"),
      explode_outer(graft.textops.TextOps.tokens(lower(col("text")))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    time("token_hashes")(th.count())
    val bitAggs = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val counted = th.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    time("bit_agg")(counted.count())
    time("simhash_full")(graft.dedup.Dedup.simhash(d, "doc_id", "text").count())
    time("simhash_pairs")(
      graft.dedup.Dedup.simhashPairs(d, "doc_id", "text", 3).count())
    time("simhash_pairs2")(
      graft.dedup.Dedup.simhashPairs(d, "doc_id", "text", 3).count())
    spark.stop()
  }
}
