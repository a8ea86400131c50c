package graft.lagops

import graft.TestSpark.seriesDf
import org.scalatest.funsuite.AnyFunSuite

/** Error-path tests the reference never wrote (SURVEY.md §5.1): each
  * LagError analogue raises a typed LagException BEFORE any job runs.
  */
class LagErrorSpec extends AnyFunSuite {
  private val df = seriesDf(Seq(1, 2, 3, 4))

  private def kindOf(f: => Any): String =
    intercept[LagException](f).kind

  test("InvalidLags: empty lag set") {
    assert(kindOf(LagMatrix.wide(df, "value",
      LagSpec(Seq("t"), Nil, Nil, None))) == "InvalidLags")
  }

  test("InvalidLags: negative lag") {
    assert(kindOf(LagMatrix.wide(df, "value",
      LagSpec(Seq("t"), Nil, Seq(-2), None))) == "InvalidLags")
  }

  test("UnknownColumn: missing value column") {
    assert(kindOf(LagMatrix.wide(df, "nope",
      LagSpec(Seq("t"), Nil, Seq(1), None))) == "UnknownColumn")
  }

  test("UnknownColumn: missing order column") {
    assert(kindOf(LagMatrix.wide(df, "value",
      LagSpec(Seq("zzz"), Nil, Seq(1), None))) == "UnknownColumn")
  }

  test("InvalidOrder: no order column") {
    assert(kindOf(LagMatrix.wide(df, "value",
      LagSpec(Nil, Nil, Seq(1), None))) == "InvalidOrder")
  }

  test("EmptyData: empty input (opt-in data check)") {
    val empty = df.filter(df("t") < 0)
    assert(kindOf(LagMatrix.validate(empty, "value",
      LagSpec(Seq("t"), Nil, Seq(1), None),
      checkSeriesLength = true)) == "EmptyData")
  }

  test("LagExceedsValueCount: max(lag) >= series length " +
      "(reference panics on usize underflow, src/lib.rs:520 — we reject)") {
    assert(kindOf(LagMatrix.validate(df, "value",
      LagSpec(Seq("t"), Nil, Seq(7), None),
      checkSeriesLength = true)) == "LagExceedsValueCount")
  }

  test("InvalidFill: numeric fill on non-numeric column") {
    val sdf = df.withColumn("s", org.apache.spark.sql.functions.lit("x"))
    assert(kindOf(LagMatrix.wide(sdf, "s",
      LagSpec(Seq("t"), Nil, Seq(1), Some(0.0)))) == "InvalidFill")
  }
}
