package graft

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions must be reachable from plain SQL. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("dot_product from SQL") {
    val r = spark.sql(
      """SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
        |""".stripMargin).collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("array_shift from SQL, with and without fill") {
    val withFill = spark.sql(
      "SELECT array_shift(array(1.0D, 2.0D, 3.0D), 1, 9.0D) AS s")
      .collect().head.getSeq[Double](0)
    assert(withFill == Seq(9.0, 1.0, 2.0))
    val noFill = spark.sql(
      "SELECT array_shift(array(1.0D, 2.0D, 3.0D), 2) AS s")
      .collect().head.getSeq[Any](0)
    assert(noFill == Seq(null, null, 1.0))
  }

  test("simhash_agg from SQL groups to a 64-bit fingerprint") {
    spark.sql("SELECT explode(array('a','b','c')) AS tok")
      .createOrReplaceTempView("toks")
    val r = spark.sql(
      "SELECT simhash_agg(xxhash64(tok)) AS s FROM toks")
      .collect().head.getLong(0)
    // deterministic: same tokens → same fingerprint on every run
    val r2 = spark.sql(
      "SELECT simhash_agg(xxhash64(tok)) AS s FROM toks")
      .collect().head.getLong(0)
    assert(r == r2)
  }
}
