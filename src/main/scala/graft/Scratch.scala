package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local experiments; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // driver t1 smoke: entry at sf0.001 must return rows
    val e = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${e.count()}")
    e.show(5, false)

    // error-path probe through the public API
    import graft.lagops._
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
    try {
      LagMatrix.wide(ev, "value", LagSpec(Seq("ts_ns"), Nil, Seq(-1, 2), None))
      println("PROBE_NEGATIVE_LAG=NO_ERROR(BUG)")
    } catch {
      case ex: LagException => println(s"PROBE_NEGATIVE_LAG=${ex.getMessage}")
    }
    try {
      LagMatrix.wide(ev, "nope", LagSpec(Seq("ts_ns"), Nil, Seq(1), None))
      println("PROBE_BAD_COLUMN=NO_ERROR(BUG)")
    } catch {
      case ex: LagException => println(s"PROBE_BAD_COLUMN=${ex.getMessage}")
    }
    try {
      LagMatrix.wide(ev, "value", LagSpec(Seq("ts_ns"), Nil, Nil, None))
      println("PROBE_EMPTY_LAGS=NO_ERROR(BUG)")
    } catch {
      case ex: LagException => println(s"PROBE_EMPTY_LAGS=${ex.getMessage}")
    }
    spark.stop()
  }
}
