package graft.simops

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to hyperplane LSH ([[Similarity.lshTopK]]).
  *
  * Index: k-means-style centroids (deterministic seeds = lowest-id
  * vectors, a few Lloyd refinements), each candidate assigned to its
  * nearest centroid ("list"). Query: probe the `nprobe` nearest lists
  * only, exact-rank within them. Candidate volume per query drops from N
  * to ~N·nprobe/nlist.
  *
  * Shuffle shape at scale: centroids are tiny and broadcast everywhere;
  * assignment is a narrow map; the probe join shuffles candidates once on
  * the small `list_id` key. Lloyd's element-wise mean is the only
  * iterative part — one explode + groupBy(centroid, dim) per iteration,
  * which is how distributed k-means is expressed relationally.
  */
object Ivf {

  /** (list_id, centroid array<double>) — deterministic for a fixed input.
    *
    * Refined centroids are ROUNDED to 6 decimal places: a double mean's
    * partial-aggregation association order varies run to run at the
    * 1e-15 level, and every downstream assignment/probe compares
    * distances derived from the centroids — rounding well above the
    * association noise (and well below any real centroid separation)
    * makes the whole index bit-reproducible across runs AND engines,
    * which is what lets the DuckDB oracle replay Lloyd's iteration.
    */
  def fitCentroids(df: DataFrame, idCol: String, vecCol: String,
                   nlist: Int, iters: Int = 2): DataFrame = {
    val vecs = graft.util.Par.spread(df).select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    var centroids = vecs.orderBy("_id").limit(nlist)
      .select((row_number().over(Window.orderBy("_id")) - 1).as("list_id"),
        col("_v").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(vecs, centroids, "_v")
      centroids = materialize(assigned
        .select(col("list_id"), posexplode(col("_v")).as(Seq("dim", "x")))
        .groupBy("list_id", "dim").agg(round(avg("x"), 6).as("m"))
        .groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("p"))
        .select(col("list_id"),
          transform(col("p"), s => s.getField("m")).as("centroid")))
    }
    centroids
  }

  /** Pin a fitted centroid frame as a LOCAL relation: `nlist` rows of
    * index metadata, deterministic (6-dp rounded means). Every consumer
    * (per-iteration reassign, candidate assign, query probe) would
    * otherwise re-run the whole Lloyd lineage — an index must be built
    * once and then be a constant, exactly like the literal hyperplane
    * matrix in [[Similarity.lshSignature]]. Not a driver-side data
    * loop: the collected frame is O(nlist), never O(rows).
    */
  private def materialize(centroids: DataFrame): DataFrame = {
    val spark = centroids.sparkSession
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    centroids.collect().foreach(rows.add)
    spark.createDataFrame(rows, centroids.schema)
  }

  /** Nearest centroid per row by cosine (broadcast centroids, narrow).
    *
    * Two scale choices, both result-identical to the naive
    * sort-window-over-pairs form:
    *  - norms are hoisted — one per row and one per centroid — so each
    *    (row × centroid) pair costs a single dot product, not three;
    *  - the winner is picked with `max_by` over `(sim, -list_id)` (ties
    *    break to the smallest list id, exactly like
    *    `row_number over (order by sim desc, list_id)`): a hash
    *    aggregate with map-side partial aggregation, so the shuffle
    *    moves ONE row per vector instead of one per (vector × centroid)
    *    — nlist× fewer bytes, and the vectors cross the wire once.
    */
  private def assign(vecs: DataFrame, centroids: DataFrame,
                     vecField: String): DataFrame = {
    val vn = vecs.withColumn("_vn", Similarity.norm(col(vecField)))
    val cn = centroids.withColumn("_cn", Similarity.norm(col("centroid")))
    val scored = vn.join(broadcast(cn))
      .withColumn("_sim", Similarity.cosinePre(
        VectorOps.dot(col(vecField), col("centroid")),
        col("_vn"), col("_cn")))
    scored.groupBy(col("_id"))
      .agg(max_by(
        struct(col(vecField).as("v"), col("list_id").as("lid")),
        struct(col("_sim"), (-col("list_id")).as("nlid"))).as("_best"))
      .select(col("_id"), col("_best.v").as(vecField),
        col("_best.lid").as("list_id"))
  }

  /** Probe-and-rank top-k. Queries must be small (broadcast). */
  def topK(queries: DataFrame, candidates: DataFrame, idCol: String,
           vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
           iters: Int = 2): DataFrame = {
    val centroids = fitCentroids(candidates, idCol, vecCol, nlist, iters)

    val cand = assign(
      graft.util.Par.spread(candidates).select(col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("_v")),
      centroids, "_v")
      .select(col("_id").as("neighbor_id"), col("_v").as("cv"),
        Similarity.norm(col("_v")).as("cn"), col("list_id"))

    // each query probes its nprobe nearest lists
    val qProbe = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .join(broadcast(centroids))
      .withColumn("_sim", Similarity.cosine(col("qv"), col("centroid")))
      .withColumn("_rn", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("_sim").desc, col("list_id"))))
      .filter(col("_rn") <= nprobe)
      .select(col("query_id"), col("qv"),
        Similarity.norm(col("qv")).as("qn"), col("list_id"))

    val scored = cand.join(broadcast(qProbe), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
