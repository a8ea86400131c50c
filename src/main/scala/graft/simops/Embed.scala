package graft.simops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage/bandwidth operators. At 100 TB the embedding
  * column IS the corpus — symmetric int8 quantization cuts it 4× before
  * it ever shuffles or lands in an index, at ~0.4% RMS error for unit
  * vectors. Pure per-row Column expressions: single scan + project,
  * whole-stage codegen, no shuffle.
  */
object Embed {

  /** Per-vector symmetric int8 quantization:
    * `scale = max|xᵢ| / 127`, `qᵢ = floor(xᵢ/scale + 0.5)` ∈ [−127, 127].
    *
    * `floor(x + 0.5)` (not `round`) on purpose: Spark's round
    * half-rounds away from zero for negatives while DuckDB matches only
    * on magnitudes, and the floor form is the same arithmetic in both
    * engines bit for bit — ties are deterministic, so the whole operator
    * is oracle-checkable. The quantized vector is emitted as a CSV
    * string (exact ints; the driver's value-hash treats array columns
    * engine-specifically) alongside the scale and the RMS reconstruction
    * error.
    *
    * Zero and empty vectors are safe: the scale is floored at 1e-30 and
    * rmse guards the empty division.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val base = df.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("_v"))
    // _scale must be a MATERIALIZED alias: it is referenced inside the
    // lambdas below, and Catalyst does no CSE inside higher-order
    // functions — an inline max-abs would re-reduce the vector per element
    val withScale = base.withColumn("_scale",
      greatest(array_max(transform(col("_v"), x => abs(x))), lit(1e-30))
        / 127.0)
    def q(x: Column) = floor(x / col("_scale") + 0.5)
    withScale.select(col("vec_id"), col("_scale").as("scale"),
      array_join(transform(col("_v"),
        x => q(x).cast("long").cast("string")), ",").as("q_csv"),
      when(size(col("_v")) === 0, 0.0).otherwise(
        round(sqrt(aggregate(
          transform(col("_v"), x => (x - q(x) * col("_scale"))
            * (x - q(x) * col("_scale"))),
          lit(0.0), (acc, e) => acc + e) / size(col("_v"))), 6))
        .as("rmse"))
  }
}
