package graft.simops

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k: exact baseline. The query side is tiny and
  *    broadcast, so the "cross join" is a broadcast nested loop over ONE
  *    pass of the candidate set — no shuffle of the big side. At 100 TB
  *    this is the per-batch scoring pattern (Q queries × N candidates,
  *    embarrassingly parallel over candidate partitions).
  *  - random-hyperplane LSH: signature per vector (narrow), band-bucket
  *    join to generate candidates (shuffle keyed on small band keys),
  *    exact re-rank within candidates. The scale path: candidate count
  *    per query is ~bucket size, not N.
  *
  * Dot products use the codegen'd [[graft.functions.DotProductExpr]]
  * kernel (primitive unpack + tight loop); per-vector norms are computed
  * ONCE in a projection before pairing, so each pair costs one dot
  * product, not three. Accumulation is deterministic left-to-right double
  * (matters for oracle parity; SURVEY.md §7.3).
  */
object Similarity {

  /** Σ aᵢ·bᵢ with elements widened to double before multiply. */
  def dot(a: Column, b: Column): Column = VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. Pairwise form
    * (recomputes norms) — the batch operators below hoist norms out.
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  private def cosinePre(dotCol: Column, na: Column, nb: Column): Column =
    when(na * nb === 0.0, 0.0).otherwise(dotCol / (na * nb))

  /** Exact brute-force top-k neighbors for each query vector.
    * `queries` must be small (it is broadcast). Ranking is on the rounded
    * similarity with id tiebreak so results are reproducible across
    * engines and runs.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = candidates.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        cosinePre(dot(col("qv"), col("cv")), col("qn"), col("cn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Deterministic random hyperplanes: `numPlanes` × `dim` in [-1, 1),
    * fixed seed — same planes on every run and every executor.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rng.nextDouble() * 2 - 1)
  }

  /** Sign-bit LSH signature of `vec` against `planes`, packed into a long.
    * Plane dots use the float kernel via a float-cast literal plane.
    */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(v => lit(v.toFloat)): _*)
      when(dot(vec, plane) > 0.0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: candidates are vectors sharing at
    * least one signature band with the query (catches near-identical sign
    * patterns), re-ranked by exact cosine. Recall < 1 by construction;
    * bands/planes trade recall vs candidate volume.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 16, bands: Int = 4,
              dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val bits = numPlanes / bands
    def banded(df: DataFrame, id: String, vec: String, n: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          norm(col(vecCol)).as(n),
          lshSignature(col(vecCol), planes).as("sig"))
        .select(col(id), col(vec), col(n),
          posexplode(array((0 until bands).map { b =>
            shiftright(col("sig"), b * bits)
              .bitwiseAND((1L << bits) - 1)
          }: _*)).as(Seq("band", "key")))
    val qb = banded(queries, "query_id", "qv", "qn")
    val cb = banded(candidates, "neighbor_id", "cv", "cn")
    val cand = cb.join(broadcast(qb), Seq("band", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(
        cosinePre(dot(col("qv"), col("cv")), col("qn"), col("cn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup family): all pairs with
    * cosine ≥ threshold. Exact O(n²) pair scan — but norms are hoisted
    * (n, not n², norm computations) and each pair is one codegen'd dot.
    * The scale path bucketizes with `lshSignature` first.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(
        cosinePre(dot(col("va"), col("vb")), col("na"), col("nb")), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
