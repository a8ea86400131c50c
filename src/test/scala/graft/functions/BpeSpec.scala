package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BPE tokenizer fixture: trainer determinism, kernel ≡ reference
  * encoder (the executable spec the DuckDB oracle's recursive CTE also
  * replays), and the Column expression end to end.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("trainer is deterministic and yields a full merge table") {
    val m1 = BpeVocab.train(BpeVocab.sample, BpeVocab.numMerges)
    val m2 = BpeVocab.train(BpeVocab.sample, BpeVocab.numMerges)
    assert(m1 == m2)
    assert(m1 == BpeVocab.merges)
    // the embedded sample must support the requested merge count — a
    // short sample would silently shrink the vocabulary
    assert(m1.size == BpeVocab.numMerges, s"only ${m1.size} merges trained")
    assert(m1.distinct.size == m1.size, "duplicate merge pair emitted")
  }

  test("common sample words compress to few tokens, rare words to many") {
    val enc = (w: String) => BpeVocab.encodeReference(w, BpeVocab.merges)
    assert(enc("the") == Seq("the"))
    val c = enc("corpus")
    assert(c.mkString("") == "corpus")
    assert(c.length < "corpus".length)
    // a word with no sample support stays near character-granularity
    assert(enc("qqqq").length >= 3)
  }

  /** Boundary fixtures shared with the gate-kernel spec's philosophy:
    * whitespace variety, empties, multi-byte scripts, astral plane,
    * long repeats, plus words from the training sample itself.
    */
  private val words = Seq(
    "", "the", "and", "tokenizer", "deduplication", "xyz", "a",
    "café", "的是了", "😀😀", "İstanbul",
    "supercalifragilisticexpialidocious",
    "thethethethe", "aaaa", "qqqq", "e", "er", "ing",
    "documents", "pipeline", "cluster", "zzz-punct!mix")

  test("kernel wordCount equals the reference encoder") {
    val ranks = BpeKernelUtil.buildRanks(BpeVocab.merges)
    for (w <- words) {
      val ref = BpeVocab.encodeReference(w, BpeVocab.merges)
      assert(ref.mkString("") == w, s"encoder lost content on '$w'")
      assert(BpeKernelUtil.wordCount(w, ranks) == ref.length,
        s"kernel diverged on '$w'")
    }
  }

  test("docCount splits on the same whitespace as the gate kernel") {
    val ranks = BpeKernelUtil.buildRanks(BpeVocab.merges)
    def wc(w: String) = BpeKernelUtil.wordCount(w, ranks).toLong
    val docs = Seq(
      "" -> 0L,
      "   \t\n " -> 0L,
      "the" -> 1L,
      "the the\tthe\nthe" -> 4L,
      "  leading and trailing  " ->
        (wc("leading") + wc("and") + wc("trailing")),
      // NBSP is NOT Java-regex whitespace: 'a b' is ONE word
      "a b c" -> (BpeKernelUtil.wordCount("a b", ranks).toLong + 1L))
    for ((text, want) <- docs)
      assert(BpeKernelUtil.docCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), ranks) == want,
        s"docCount diverged on '$text'")
  }

  test("Column expression equals per-word reference sums on a frame") {
    import spark.implicits._
    val texts = Seq(
      "the training corpus for a large language model",
      "every document in the collection is scored",
      "qqqq zzzz unseen-words here",
      "café 的是了 😀 mixed scripts",
      "",
      "the " * 50)
    val got = texts.toDF("text")
      .select(graft.textops.TextOps.bpeTokenCount(col("text")).as("n"))
      .as[Long].collect().toSeq
    val want = texts.map(t =>
      t.split("[ \t\n\f\r]+").filter(_.nonEmpty)
        .map(w => BpeVocab.encodeReference(w, BpeVocab.merges).length.toLong)
        .sum)
    assert(got == want)
  }
}
