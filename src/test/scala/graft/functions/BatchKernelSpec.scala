package graft.functions

import graft.TestSpark
import graft.simops.Similarity
import graft.textops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batch kernels must be BIT-IDENTICAL to the Column-expression forms
  * they replaced — those forms are what the DuckDB oracles mirror, so any
  * divergence here is an oracle break waiting to happen at verify time.
  */
class BatchKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "a",                          // fewer tokens than any shingle size
      "",                           // empty text
      "  padded   whitespace  runs   here ",
      "répétition déjà vu œuvre — ünïcode tëst",
      "的 是 了 在 和 有 我 不 这 他", // multi-byte chars
      "dup dup dup dup dup dup",    // heavy shingle duplication
      ("lorem ipsum dolor sit amet " * 20).trim
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def toks = TextOps.tokens(lower(col("text")))

  test("WordShinglesExpr == array_distinct/array_join HOF form") {
    for (n <- Seq(1, 2, 3, 5)) {
      val both = docs.select(col("doc_id"), toks.as("_t"))
        .select(
          TextOps.shinglesFromTokens(col("_t"), n).as("k"),
          TextOps.shinglesFromTokensExpanded(col("_t"), n).as("e"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("WordKgramXxExpr == string-tokenized reference fold") {
    import org.apache.spark.unsafe.types.UTF8String
    // independent path: regex tokenization on String, xx64 of each
    // token re-encoded through UTF8String, then the same LCG fold
    def ref(text: String, k: Int): Seq[Long] = {
      val ts = text.split("[ \t\n\u000B\f\r]+").filter(_.nonEmpty)
      if (ts.length < k) Seq.empty
      else {
        val th = ts.map { t =>
          val u = UTF8String.fromString(t)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        }
        (0 to ts.length - k).map { s =>
          var acc = 42L
          for (j <- 0 until k) acc = acc * 6364136223846793005L + th(s + j)
          acc
        }
      }
    }
    for (k <- Seq(1, 2, 5)) {
      val rows = docs.select(col("text"),
        WordKgramXxExpr(col("text"), k).as("g")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == ref(r.getString(0), k),
          s"k=$k text='${r.getString(0)}'")
      }
    }
  }

  test("MinHashSigExpr == staged md5/conv/zip_with form") {
    val staged = docs.select(col("doc_id"), toks.as("_t"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("_t"), 3).as("sh"))
      .select(col("doc_id"), transform(col("sh"), s => md5(s)).as("_m"))
      .select(col("doc_id"),
        transform(col("_m"),
          m => conv(substring(m, 1, 15), 16, 10).cast("long")).as("_h1"),
        transform(col("_m"),
          m => conv(substring(m, 17, 14), 16, 10).cast("long")).as("_h2"))
      .select(col("doc_id"),
        graft.dedup.Dedup.minhashSignatureFromHalves(
          col("_h1"), col("_h2"), 16).as("sig"))
    val kernel = docs.select(col("doc_id"), toks.as("_t"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("_t"), 3).as("sh"))
      .select(col("doc_id"), MinHashSigExpr(col("sh"), 16).as("sig"))
    val s = staged.orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val k = kernel.orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(s.toSeq.map(_.toSeq) == k.toSeq.map(_.toSeq))
  }

  test("XxSortedHashesExpr == array_sort(transform(xxhash64)) form") {
    val both = docs.select(col("doc_id"), toks.as("_t"))
      .select(col("doc_id"), TextOps.shinglesFromTokens(col("_t"), 3).as("sh"))
      .select(
        XxSortedHashesExpr(col("sh")).as("k"),
        array_sort(transform(col("sh"), s => xxhash64(s))).as("e"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("KgramHashesExpr == transform(sequence)/md5/conv form") {
    for (k <- Seq(3, 8)) {
      val both = docs
        .select(
          KgramHashesExpr(col("text"), k).as("k"),
          TextOps.kgramHashesExpanded(col("text"), k).as("e"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k")
      }
    }
  }

  test("DsirBucketsExpr == explode/md5Bucket HOF form") {
    for (b <- Seq(16, 10000)) {
      val both = docs
        .select(
          DsirBucketsExpr(lower(col("text")), b).as("k"),
          graft.textops.Classifier
            .dsirBucketsViaColumns(lower(col("text")), b).as("e"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"b=$b")
      }
    }
  }

  test("HyperplaneSigExpr == per-plane when/dot form") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vecs = (0 until 64).map { i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "v")
    val planes = Similarity.hyperplanes(numPlanes = 64, dim = 16)
    val both = vecs.select(
      Similarity.lshSignature(col("v"), planes).as("k"),
      Similarity.lshSignatureExpanded(col("v"), planes).as("e")).collect()
    both.foreach { r => assert(r.getLong(0) == r.getLong(1)) }
  }
}
