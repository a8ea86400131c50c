package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink-side scale patterns: bucketed co-located joins and partitioned
  * writes with partition pruning — the storage layouts a 100 TB
  * deployment leans on, exercised end-to-end through real writes.
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"

  test("bucketed tables join with zero exchanges") {
    // warehouse dir is a temp dir set statically in TestSpark
    val li = Tables.lineitem(spark, src)
    val o = Tables.orders(spark, src)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    // bucket-compatible layout: the join itself needs no shuffle — with
    // broadcast disabled it must plan a SortMergeJoin over bucket scans
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b").join(spark.table("o_b"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // a non-bucketed layout would shuffle both sides on the join keys
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join should not re-shuffle its inputs:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE o_b")
    }
  }

  test("partitioned write prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, src)
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).filter(col("event_type") === "click")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), scan)
    val expect = ev.filter(col("event_type") === "click").count()
    assert(back.count() == expect)
  }
}
