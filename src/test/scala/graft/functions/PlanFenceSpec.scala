package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PlanFenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fenced predicate filters identically, including null semantics") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double])](
      (1L, Some(0.1)), (2L, Some(0.5)), (3L, None), (4L, Some(0.9)))
      .toDF("id", "q")
    val plain = df.filter(col("q") >= 0.3).select("id")
      .collect().map(_.getLong(0)).sorted
    val fenced = df.filter(PlanFence.fence(col("q") >= 0.3)).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(fenced.sameElements(plain) && plain.sameElements(Array(2L, 4L)))
  }

  test("fence blocks pushdown below a repartition; result is unchanged") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id").repartition(4)
      .select(col("id"), (col("id") * 2).as("d"))
    val fenced = df.filter(PlanFence.fence(col("d") > 100))
    val p = fenced.queryExecution.executedPlan.toString
    // the filter must sit ABOVE the exchange: scan-side filtering would
    // show the predicate in a Filter below Exchange (or in DataFilters)
    val lines = p.linesIterator.toSeq
    val exchangeAt = lines.indexWhere(_.contains("Exchange"))
    val filterAt = lines.indexWhere(_.contains("planfenceexpr"))
    assert(filterAt >= 0 && exchangeAt > filterAt,
      s"fence did not hold above the exchange:\n$p")
    assert(fenced.count() == 49)
  }
}
