package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loader for the driver-generated parquet tables.
  *
  * The `events` table carries a nanosecond-precision timestamp, which
  * Spark's parquet reader rejects by default (PARQUET_TYPE_ILLEGAL for
  * TIMESTAMP(NANOS)). We read it via `spark.sql.legacy.parquet.nanosAsLong`
  * as a raw epoch-nanos long, exposed as:
  *   - `ts_ns: long`  — full-precision order key (what windows sort by);
  *   - `ts: timestamp` — microsecond-truncated timestamp for time bucketing
  *     (matches DuckDB's ns→µs truncation, so oracles agree).
  */
object Tables {

  private def ensureNanosConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureNanosConf(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    else df
  }

  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
}
