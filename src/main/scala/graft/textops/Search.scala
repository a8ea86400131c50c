package graft.textops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval and collocation mining over the corpus — the two
  * text-side queries a data-curation pipeline runs beside the
  * embedding-side ANN family: BM25 keyword search (retrieval-based
  * corpus auditing, "which docs answer this probe") and PMI bigram
  * collocations (multi-word-expression discovery, the classic signal
  * for tokenizer/vocab decisions).
  *
  * Scale shape: corpus tokens are exploded ONCE in the scan stage and
  * immediately narrowed — BM25 keeps only tokens matching the (tiny,
  * broadcast) query-term list before anything shuffles; PMI's two
  * count aggregates are combinable, and the downstream joins touch
  * vocabulary-sized frames keyed on 8-byte `xxhash64` (the
  * [[Vocab.lmScore]] precedent: string keys only where output needs
  * them, identical up to the vanishing collision contract its oracle
  * documents).
  */
object Search {

  /** BM25 top-k document retrieval for a literal query set.
    *
    * Standard Robertson/Sparck-Jones BM25 with the +1 idf floor
    * (Lucene's form, non-negative for any df):
    * `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`,
    * `score(q,d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`.
    *
    * Plan: doc tokens explode in the scan stage and broadcast-join the
    * query-term list (query terms × docs-containing-them survive — the
    * corpus never shuffles at full width); tf is one combinable
    * aggregate, df one vocabulary-sized aggregate over it; N and avgdl
    * ride in as broadcast 1-row scalar frames; the per-query top-k is
    * a window over candidate-scale rows partitioned by query. Ranking
    * cut on (6dp score, doc_id) so both engines agree on ties.
    *
    * Output: (query_id, rank, doc_id, score).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(String, String)], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25 needs at least one query")
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._

    val qterms = queries
      .flatMap { case (qid, qtext) =>
        qtext.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
          .map(t => (qid, t))
      }
      .toDF("query_id", "term")

    val toks = graft.util.Par.spread(docs)
      .select(col(idCol), TextOps.tokens(lower(col(textCol))).as("_toks"))
    val docLen = toks.select(col(idCol), size(col("_toks")).as("_dl"))
    // corpus scalars: one combinable pass, broadcast back as 1-row frames
    val scalars = docLen.agg(count(lit(1)).as("_n_docs"),
      avg(col("_dl")).as("_avgdl"))

    // narrow to query terms BEFORE any shuffle: broadcast semi-ish join
    val matched = toks
      .select(col(idCol), explode(col("_toks")).as("term"))
      .join(broadcast(qterms), "term")
    val tf = matched.groupBy(col("query_id"), col("term"), col(idCol))
      .agg(count(lit(1)).as("_tf"))
    // document frequency per term (query-term-vocabulary-sized)
    val dfreq = tf.select(col("term"), col(idCol)).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("_df"))

    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(docLen, idCol)
      .crossJoin(broadcast(scalars))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n_docs") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_contrib",
        col("_idf") * (col("_tf") * lit(k1 + 1.0)) /
          (col("_tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("_contrib")), 6).as("score"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("score"))
  }

  /** Top-k bigram collocations by pointwise mutual information:
    * `pmi(w1 w2) = ln( (c12/NB) / ((c1/NU)·(c2/NU)) )` with a minimum
    * joint count (PMI's low-frequency pathology guard — a hapax pair
    * otherwise maxes the statistic).
    *
    * Plan: ONE bigram count aggregate and ONE unigram count aggregate
    * (both combinable, map-side partials absorb the Zipf head); the
    * marginal lookups join the `minCount`-filtered bigram frame to the
    * vocabulary-sized unigram frame on `xxhash64(word)`; NB/NU are
    * broadcast scalars; the cut is a TakeOrdered top-k on
    * (6dp pmi desc, bigram) — a total order both engines replay.
    *
    * Output: (bigram, c12, c1, c2, pmi).
    */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Int,
                 k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = graft.util.Par.spread(docs)
      .select(TextOps.tokens(lower(col(textCol))).as("_toks"))

    val uni = toks.select(explode(col("_toks")).as("_w"))
    val c1 = uni.groupBy(xxhash64(col("_w")).as("_wh"))
      .agg(count(lit(1)).as("_c"))
    val nu = uni.agg(count(lit(1)).as("_nu"))

    val bg = toks.select(explode(Vocab.ngrams(col("_toks"), 2)).as("bigram"))
    val c12 = bg.groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
    val nb = bg.agg(count(lit(1)).as("_nb"))

    val w1h = xxhash64(substring_index(col("bigram"), " ", 1))
    val w2h = xxhash64(substring_index(col("bigram"), " ", -1))
    // c12-after-minCount vs unigram vocab: both vocabulary-sized; the
    // join keys are 8-byte hashes and AQE picks broadcast when either
    // side fits — no hint, so neither side is forced driver-resident
    // at 100 TB vocab sizes
    c12
      .join(c1.withColumnRenamed("_c", "c1"), w1h === col("_wh"))
      .drop("_wh")
      .join(c1.withColumnRenamed("_c", "c2"), w2h === col("_wh"))
      .drop("_wh")
      .crossJoin(broadcast(nb))
      .crossJoin(broadcast(nu))
      .withColumn("pmi", round(log(
        (col("c12") / col("_nb")) /
          ((col("c1") / col("_nu")) * (col("c2") / col("_nu")))), 6))
      .select(col("bigram"), col("c12"), col("c1"), col("c2"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
  }
}
