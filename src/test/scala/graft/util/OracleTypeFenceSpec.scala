package graft.util

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.sys.process.{Process, ProcessLogger}

/** Oracle result-TYPE fence.
  *
  * The driver's correctness hash is type-sensitive: DuckDB silently
  * widens sum(BIGINT) to HUGEINT (int128), which stringifies/hashes
  * differently than Spark's int64 even when every value is identical —
  * the round-9 quality_model_score red row. This spec binds all
  * registered oracle queries in DuckDB (plan-only, nothing executes)
  * and asserts no result column has a type outside the Spark-emittable
  * set, so the next sum-of-ints can't silently widen.
  *
  * Cancels (rather than fails) when python3+duckdb or the testdata
  * directory is absent — the fence is environmental by nature.
  */
class OracleTypeFenceSpec extends AnyFunSuite {

  test("all oracle result types are Spark-emittable (no HUGEINT widening)") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      s"testdata not present at $sfDir")
    val devNull = ProcessLogger(_ => (), _ => ())
    val hasDuck =
      try Process(Seq("python3", "-c", "import duckdb")).!(devNull) == 0
      catch { case _: java.io.IOException => false }
    assume(hasDuck, "python3 + duckdb not available; type fence skipped")

    val tmp = Files.createTempDirectory("oracle_types")
    val jsonPath = tmp.resolve("oracle_sql.json")
    Files.writeString(jsonPath, graft.Verify.oracleJson)

    val buf = new StringBuilder
    val log = ProcessLogger(l => buf.append(l).append('\n'),
                            l => buf.append(l).append('\n'))
    val rc = Process(Seq("python3", "tools/check_oracle_types.py",
      sfDir, jsonPath.toString)).!(log)
    assert(rc == 0 && buf.toString.contains("ALL_TYPES_OK"),
      s"oracle type fence failed:\n${buf.toString.take(4000)}")
  }
}
