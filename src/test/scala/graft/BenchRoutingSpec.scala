package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fence on the scored-artifact routing: bench.json is ONLY written
  * by a run against the canonical sf0.1 dir. Two past rounds lost the
  * scored artifact to clobbering (an sf0.01 debug run, an interleaved
  * re-run), and the first guard's `endsWith("sf0.1")` still matched
  * the zsf0.1 anchor dir — the basename must match exactly.
  */
class BenchRoutingSpec extends AnyFunSuite {
  test("only the exact sf0.1 basename routes to the scored artifact") {
    assert(Bench.artifactFor("/root/testdata/sf0.1") == "bench.json")
    assert(Bench.artifactFor("/root/testdata/sf0.1/") == "bench.json")
    // the round-10 ADVICE case: anchor data must NOT clobber the score
    assert(Bench.artifactFor("/root/testdata/zsf0.1") == "bench_adhoc.json")
    assert(Bench.artifactFor("/tmp/mysf0.1") == "bench_adhoc.json")
    assert(Bench.artifactFor("/root/testdata/sf0.01") == "bench_adhoc.json")
    assert(Bench.artifactFor("/root/testdata/sf0.1/sub") == "bench_adhoc.json")
  }
}
