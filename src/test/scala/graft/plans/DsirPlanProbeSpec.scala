package graft.plans

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** dsirScore's single-kernel-scan contract: the tokenize+md5 explode
  * collapses once to a (doc_id, _t, _b, count) exchange that BOTH the
  * bucket-model aggregate and the per-doc scorer consume via runtime
  * ReuseExchange. A refactor that forks the kernel lineage again (the
  * round-9 shape replayed the full corpus kernel per consumer), or
  * that lets constraint propagation make the subtrees non-identical
  * (the isnotnull-on-one-branch trap), shows up here as a second live
  * kernel exchange in the FINAL adaptive plan.
  */
class DsirPlanProbeSpec extends AnyFunSuite {
  test("sample_dsir's kernel scan materializes exactly one exchange") {
    val spark = TestSpark.spark
    val df = SparkEntry.queries("sample_dsir")(spark, "/root/testdata/sf0.001")
    df.collect() // AQE: exchange reuse is visible only in the final plan
    // AdaptiveSparkPlan.toString appends the pre-execution "Initial
    // Plan" section after the final one — audit only the final section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val kernelEx = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning(doc_id") && l.contains("_b")).toSeq
    val live = kernelEx.filterNot(_.contains("ReusedExchange"))
    val reused = kernelEx.filter(_.contains("ReusedExchange"))
    assert(live.size == 1,
      s"expected ONE live kernel exchange, got ${live.size}:\n${kernelEx.mkString("\n")}")
    assert(reused.nonEmpty, s"no ReusedExchange of the kernel scan:\n$plan")
  }
}
