package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("piiScrub redacts planted emails and IPv4s and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact alice@example.com or bob.smith@mail.co today"),
      (2L, "server at 10.0.0.1 and backup at 192.168.1.255 ok"),
      (3L, "mixed carol+x@a.io from 127.0.0.1"),
      (4L, "no pii here at all")).toDF("doc_id", "text")
    val out = Pipeline.piiScrub(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((2, 0), (0, 2), (1, 1), (0, 0)))
    assert(out(0).getString(3) ==
      md5hex("contact <EMAIL> or <EMAIL> today"))
    assert(out(2).getString(3) == md5hex("mixed <EMAIL> from <IP>"))
    assert(out(3).getString(3) == md5hex("no pii here at all"))
  }

  test("seqPack equals the single-window global prefix sum") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = rng.shuffle((0 until 500).toList)
      .map(i => (i.toLong, ("tok " * (1 + rng.nextInt(40))).trim))
      .toDF("doc_id", "text")
    val packed = Pipeline.seqPack(df, "doc_id", "text", budget = 64,
      numBuckets = 7)
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .select(col("doc_id"),
        graft.textops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("pre", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("pre") / 64).cast("long").as("pack_id"),
        (col("pre") % 64).as("pack_offset"))
    val a = packed.orderBy("doc_id").collect().toSeq
    val b = expected.orderBy("doc_id").collect().toSeq
    assert(a == b)
    packed.collect().foreach { r =>
      val off = r.getLong(3)
      assert(off >= 0 && off < 64)
    }
  }

  test("sampleStratified applies per-stratum rates deterministically") {
    import spark.implicits._
    val df = (0 until 1000)
      .map(i => (i.toLong, Seq("en", "zh", "de")(i % 3)))
      .toDF("doc_id", "lang").withColumn("text", lit("x"))
    val pct = Map("en" -> 80, "zh" -> 50)
    val once = Pipeline.sampleStratified(df, "doc_id", "lang", pct, 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val again = Pipeline.sampleStratified(df, "doc_id", "lang", pct, 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(once == again)
    once.foreach { case (_, lang, bucket) =>
      assert(bucket < pct.getOrElse(lang, 25), s"$lang bucket $bucket")
    }
    // rates are roughly honored (md5 buckets are uniform-ish)
    val byLang = once.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang("en") > 200 && byLang("zh") > 100 && byLang("de") > 40)
    assert(byLang("en") > byLang("zh") && byLang("zh") > byLang("de"))
  }
}
