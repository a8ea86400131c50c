package graft

import graft.dedup.Dedup
import graft.lagops.{DistributedLag, LagMatrix, LagSpec, Lead, Rolling}
import graft.plans.AsOfJoin
import graft.simops.{Ivf, Similarity}
import graft.textops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** One import for the fluent surface over every operator family:
  *
  * {{{
  * import graft.syntax._
  * events.lagMatrix("value", spec)
  * docs.dedupExact("doc_id", "text")
  * embeddings.nearDupPairs("vec_id", "embedding", 0.9)
  * }}}
  *
  * Mirrors the reference's `CreateLagMatrix` method-call sugar
  * (`src/lib.rs:258-440`) extended to the whole engine.
  */
object syntax {

  implicit final class SeriesOps(private val df: DataFrame) extends AnyVal {
    def lagMatrix(valueCol: String, spec: LagSpec): DataFrame =
      LagMatrix.wide(df, valueCol, spec)
    def lagMatrixLong(valueCol: String, spec: LagSpec): DataFrame =
      LagMatrix.long(df, valueCol, spec)
    def lagMatrixDistributed(valueCol: String, spec: LagSpec,
                             numBuckets: Int = 32): DataFrame =
      DistributedLag.wide(df, valueCol, spec, numBuckets)
    def leadMatrix(valueCol: String, spec: LagSpec): DataFrame =
      Lead.wide(df, valueCol, spec)
    def rolling(valueCol: String, spec: LagSpec, window: Int): DataFrame =
      Rolling.over(df, valueCol, spec, window)
    def asOfJoinBackward(right: DataFrame, keyCol: String, leftTime: String,
                         rightTime: String, payload: Seq[String]): DataFrame =
      AsOfJoin.backward(df, right, keyCol, leftTime, rightTime, payload)
    def asOfJoinForward(right: DataFrame, keyCol: String, leftTime: String,
                        rightTime: String, payload: Seq[String]): DataFrame =
      AsOfJoin.forward(df, right, keyCol, leftTime, rightTime, payload)
  }

  implicit final class DocumentOps(private val df: DataFrame) extends AnyVal {
    def textStats(idCol: String, textCol: String): DataFrame =
      TextOps.textStats(df, idCol, textCol)
    def dedupExact(idCol: String, textCol: String): DataFrame =
      Dedup.exact(df, idCol, textCol)
    def dedupMinHash(idCol: String, textCol: String,
                     threshold: Double = 0.5): DataFrame =
      Dedup.minhashLsh(df, idCol, textCol, threshold = threshold)
    def dedupSimHash(idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame =
      Dedup.simhashPairs(df, idCol, textCol, maxHamming)
    def ngramJaccard(idCol: String, textCol: String,
                     threshold: Double = 0.2): DataFrame =
      Dedup.ngramJaccard(df, idCol, textCol, threshold = threshold)
    def withFingerprint(textCol: String,
                        out: String = "fingerprint"): DataFrame =
      df.withColumn(out, TextOps.fingerprint(col(textCol)))
    def withLangId(textCol: String, out: String = "lang_pred"): DataFrame =
      df.withColumn(out, TextOps.langId(col(textCol)))
    def withQualityScore(textCol: String, out: String = "quality"): DataFrame =
      df.withColumn(out, TextOps.qualityScore(col(textCol)))
  }

  implicit final class EmbeddingOps(private val df: DataFrame) extends AnyVal {
    def nearDupPairs(idCol: String, vecCol: String,
                     threshold: Double): DataFrame =
      Similarity.nearDupPairs(df, idCol, vecCol, threshold)
    def topKNeighbors(queries: DataFrame, idCol: String, vecCol: String,
                      k: Int): DataFrame =
      Similarity.bruteForceTopK(queries, df, idCol, vecCol, k)
    def topKNeighborsLsh(queries: DataFrame, idCol: String, vecCol: String,
                         k: Int): DataFrame =
      Similarity.lshTopK(queries, df, idCol, vecCol, k)
    def topKNeighborsIvf(queries: DataFrame, idCol: String, vecCol: String,
                         k: Int): DataFrame =
      Ivf.topK(queries, df, idCol, vecCol, k)
  }
}
