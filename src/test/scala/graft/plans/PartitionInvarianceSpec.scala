package graft.plans

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The whole-surface determinism fence: EVERY registered query must
  * produce the identical row multiset at 4 and at 32 shuffle
  * partitions (sf0.001). Partition count changes task boundaries,
  * merge order of partial aggregates, and window input arrival — so
  * any operator leaning on accidental ordering, non-commutative float
  * accumulation outside its rounding margin, or first()-style
  * nondeterminism breaks this hash. It is the cheapest
  * whole-surface guarantee protecting every oracle row: the driver
  * gate runs at one partitioning, the bench at another, and a real
  * cluster at thousands — all three must see one answer.
  *
  * (The per-query spark.sql.shuffle.partitions switch is a RUNTIME
  * conf on the shared session; suites in the forked test JVM run
  * sequentially, and the conf is restored after each hash.)
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Canonical multiset hash: rows → normalized strings (floats at
    * 12 significant digits, the tools/check_oracle.py convention) →
    * sorted → md5. Column order is fixed by the query itself.
    */
  private def canonHash(df: DataFrame): String = {
    def norm(v: Any): String = v match {
      case null => "NULL"
      case d: java.lang.Double => String.format("%.12g", d)
      case f: java.lang.Float => String.format("%.12g",
        java.lang.Double.valueOf(f.doubleValue()))
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case s: scala.collection.Seq[_] => s.map(norm).mkString("[", ",", "]")
      case r: org.apache.spark.sql.Row =>
        (0 until r.length).map(i => norm(r.get(i))).mkString("(", ",", ")")
      case x => x.toString
    }
    val rows = df.collect()
      .map(r => (0 until r.length).map(i => norm(r.get(i))).mkString(""))
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def hashAt(parts: Int,
                     fn: (org.apache.spark.sql.SparkSession, String) => DataFrame): String = {
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try canonHash(fn(spark, dir))
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"partition-invariant: $name") {
      val h4 = hashAt(4, fn)
      val h32 = hashAt(32, fn)
      assert(h4 == h32,
        s"$name output differs between 4 and 32 shuffle partitions")
    }
  }
}
