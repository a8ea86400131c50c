package graft.simops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The persisted ANN SERVING index — IVF centroids, PQ codebooks, and
  * every corpus vector's (list assignment, packed PQ codes), written
  * once at corpus-ingest time. The last store family the 100 TB
  * contract needed: [[Embed.ivfPqTopK]] (the in-DAG form kept beside
  * this one) re-fits both indexes AND re-encodes the ENTIRE candidate
  * corpus to PQ codes inside the query DAG — correct, but the whole
  * point of PQ at scale is that the compressed codes ARE the stored
  * index. A daily/online query batch should pay query-side encode +
  * ADC over STORED codes only: O(queries · nprobe · listSize), never
  * O(corpus). The exact bar the media family cleared for decode
  * ([[graft.dedup.MediaStore]]) applied to the vector modality.
  *
  * Layout (plain columnar parquet under `dir/`):
  *  - `centroids/` — (list_id, centroid: array<double>): the fitted
  *    IVF centroids. O(nlist·dim) index metadata, never O(rows).
  *  - `codebooks/` — (m, code, centroid: array<double>): the fitted
  *    per-subspace PQ codebooks (original code ids — Lloyd-emptied
  *    cells keep the survivors' ids, the [[Embed.fitBooks]]
  *    convention). O(m·k·subDim).
  *  - `codes/`     — (vec_id, list_id, codes: array<int>): each corpus
  *    vector's global list id and m-byte-scale code array — the scan
  *    side of every probe. m ints/vector ≈ 32× smaller than the
  *    vector at the registered m=8/k=16/dim=64. At cluster scale,
  *    bucket by `list_id` so a probe prunes row groups to its
  *    `nprobe` lists.
  *  - `meta/`      — one row (m, k, residual): the code-budget
  *    constants the ADC scorer needs back.
  *
  * Decisions are bit-identical to the in-DAG form: the fits are the
  * same deterministic sampled kernels (6dp-rounded Lloyd means),
  * doubles and ints round-trip parquet exactly, and the probe replays
  * [[Embed.ivfPqTopK]]'s query pipeline against the stored frames —
  * so a stored probe shares the in-DAG row's oracle (pinned in
  * EmbedStoreSpec).
  *
  * [[appendWrite]] closes the daily loop under the FROZEN index (the
  * [[SemanticStore]] frozen-forest convention): new vectors assign to
  * the stored centroids and encode under the stored codebooks —
  * O(increment) work, no refit, no rewrite; queries retrieve them the
  * moment the append lands. [[compact]] heals double-appended retries.
  */
object VectorIndexStore {

  /** The driver-resident index half: O(nlist·dim + m·k·subDim) —
    * index metadata, never O(rows).
    */
  final case class Index(cents: Seq[(Int, Seq[Double])],
                         codes: Array[Array[Int]],
                         books: Array[Array[Array[Double]]],
                         m: Int, k: Int, residual: Boolean)

  /** `index` plus the corpus-sized stored code frame
    * (vec_id, list_id, codes).
    */
  final case class Store(index: Index, coded: DataFrame)

  /** Fit + assign + encode the corpus — the IDENTICAL kernels and
    * sample draws [[Embed.ivfPqTopK]] runs in-DAG (same seeds, same
    * Lloyd arithmetic, same residual projection), so stored probes can
    * never drift from the in-DAG operator they replace.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            nlist: Int = 16, m: Int = 8, k: Int = 16, iters: Int = 1,
            fitSamplePct: Int = 100, dim: Int = 64,
            residual: Boolean = true): Store = {
    val cents = Ivf.fitSeq(corpus, idCol, vecCol, nlist, iters,
      fitSamplePct)
    val assigned = assignEncodeSpace(corpus, idCol, vecCol, cents, residual)
    // PQ codebooks fit on the encoded space — the md5-bucket sample,
    // materialized once (the ivfPqTopK fitFrame discipline: the seed
    // collect and every Lloyd pass re-read this frame)
    val fitFrame = (if (fitSamplePct >= 100) assigned
      else assigned.filter(
        graft.util.Sampling.md5Bucket(col("vec_id")) < lit(fitSamplePct)))
      .select(col("vec_id"), col("_ev"))
      .localCheckpoint()
    val (codes, books) = Embed.fitBooks(fitFrame, "vec_id", "_ev", m, k,
      iters, 100, dim)
    val idx = Index(cents, codes, books, m, k, residual)
    Store(idx, encodeWith(assigned, idx))
  }

  /** Assign each vector its nearest stored centroid and project the
    * ENCODE-space vector (`v − centroid(list(v))` when residual — the
    * IVFADC composition — else the raw vector). Pure codegen'd
    * projection against literal centroids: no join, no shuffle.
    */
  private def assignEncodeSpace(df: DataFrame, idCol: String,
                                vecCol: String,
                                cents: Seq[(Int, Seq[Double])],
                                residual: Boolean): DataFrame =
    graft.util.Par.spread(df)
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("_cv"))
      .withColumn("_sims", Ivf.simsCol(cents, col("_cv")))
      .withColumn("list_id", Ivf.nearestList(cents, col("_sims")))
      .withColumn("_ev",
        if (residual) Embed.residualCol(cents, col("_cv"), col("list_id"))
        else col("_cv"))
      .select(col("vec_id"), col("list_id"), col("_ev"))

  private def encodeWith(assigned: DataFrame, idx: Index): DataFrame =
    assigned.select(col("vec_id"), col("list_id"),
      graft.functions.PqCodesExpr(col("_ev"), idx.codes, idx.books)
        .as("codes"))

  /** Encode a frame under the FROZEN stored index — the (vec_id,
    * list_id, codes) shape [[appendWrite]] expects. O(increment) pure
    * projection: stored centroids and codebooks ride as plan literals,
    * no refit, no corpus read.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             idx: Index): DataFrame =
    encodeWith(assignEncodeSpace(df, idCol, vecCol, idx.cents,
      idx.residual), idx)

  def write(store: Store, dir: String): Unit = {
    val spark = store.coded.sparkSession
    centsFrame(spark, store.index.cents).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    booksFrame(spark, store.index).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    metaFrame(spark, store.index).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    store.coded.write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Rebuild the driver-resident index (two bounded collects — the
    * same class as the fits' own driver state) and reopen the stored
    * code frame.
    */
  def read(spark: SparkSession, dir: String): Store = {
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val (m, k, residual) = (meta.getInt(0), meta.getInt(1),
      meta.getBoolean(2))
    val bookRows = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    // per subspace: surviving original code ids SORTED, books aligned
    // by code order — exactly how Embed.fitBooks leaves them
    val byM = bookRows.groupBy(_._1)
    val codes = Array.tabulate(m)(mi =>
      byM.getOrElse(mi, Array.empty).map(_._2).sorted)
    val books = Array.tabulate(m)(mi =>
      byM.getOrElse(mi, Array.empty).sortBy(_._2).map(_._3))
    Store(Index(cents, codes, books, m, k, residual),
      spark.read.parquet(s"$dir/codes"))
  }

  /** Close the daily loop O(increment): the increment's frozen-index
    * code rows ([[encode]] output) land as new parquet files — no
    * rewrite, no refit; the index serves them on the next probe. A
    * retried ingest that appends the same vector twice is healed by
    * [[compact]] (duplicate code rows never change WHICH neighbors
    * exist, only duplicate result rows — compact on the retry cadence
    * before serving).
    */
  def appendWrite(encoded: DataFrame, dir: String): Unit =
    encoded.write.mode("append").parquet(s"$dir/codes")

  /** Dedup the code rows by vec_id and rewrite via the crash-safe
    * rename-aside protocol ([[graft.dedup.SignatureStore.compactOne]])
    * — one scan of the m-int code rows, never a corpus re-encode.
    */
  def compact(spark: SparkSession, dir: String): Unit =
    graft.dedup.SignatureStore.compactOne(spark, s"$dir/codes",
      Seq("vec_id"))

  /** The serving-path top-k: [[Embed.ivfPqTopK]]'s query pipeline
    * against the STORED index — query-side encode is a pure literal
    * projection, candidates come from the stored code frame pruned to
    * each query's `nprobe` lists, and the ADC scan touches only the
    * m-int code arrays. No corpus fit, no corpus encode, no corpus
    * vector read anywhere in the timed plan (fenced in PlanAuditSpec).
    *
    * Output: (query_id, neighbor_id, adist, rank) — bit-identical to
    * the in-DAG form on the same corpus (same literals, same kernels,
    * same window tiebreaks), so both share an oracle.
    */
  def topK(queries: DataFrame, store: Store, idCol: String,
           vecCol: String, kNN: Int, nprobe: Int = 4): DataFrame = {
    val ix = store.index
    val idx = Embed.codeIndex(ix.codes, ix.k)
    val cand = store.coded.select(col("vec_id").as("neighbor_id"),
      col("list_id"), col("codes").as("_codes"))
    val qp = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("_qv"))
      .withColumn("_sims", Ivf.simsCol(ix.cents, col("_qv")))
      .withColumn("list_id",
        explode(Ivf.probeLists(ix.cents, col("_sims"), nprobe)))
      .withColumn("_qe",
        if (ix.residual) Embed.residualCol(ix.cents, col("_qv"),
          col("list_id"))
        else col("_qv"))
      .select(col("query_id"), col("list_id"), col("_qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    cand.join(broadcast(qp), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", round(graft.functions.PqAdcExpr(
        col("_qe"), col("_codes"), idx, ix.books), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNN)
      .select(col("query_id"), col("neighbor_id"), col("adist"),
        col("rank"))
  }

  private val centsSchema = StructType(Seq(
    StructField("list_id", IntegerType, nullable = false),
    StructField("centroid", ArrayType(DoubleType), nullable = false)))

  private def centsFrame(spark: SparkSession,
                         cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    cents.foreach { case (lid, c) => rows.add(Row(lid, c)) }
    spark.createDataFrame(rows, centsSchema)
  }

  private val booksSchema = StructType(Seq(
    StructField("m", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("centroid", ArrayType(DoubleType), nullable = false)))

  private def booksFrame(spark: SparkSession, ix: Index): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    for (mi <- 0 until ix.m; pos <- ix.codes(mi).indices)
      rows.add(Row(mi, ix.codes(mi)(pos), ix.books(mi)(pos).toSeq))
    spark.createDataFrame(rows, booksSchema)
  }

  private val metaSchema = StructType(Seq(
    StructField("m", IntegerType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("residual", BooleanType, nullable = false)))

  private def metaFrame(spark: SparkSession, ix: Index): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(ix.m, ix.k, ix.residual))
    spark.createDataFrame(rows, metaSchema)
  }
}
