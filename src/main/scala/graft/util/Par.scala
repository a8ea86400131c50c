package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy NARROW stages (per-row hashing,
  * shingling, signature dots): a small single-file parquet source yields
  * ONE input split, so everything upstream of the first shuffle runs on
  * one core. `spread` round-robins such inputs across the cluster's
  * default parallelism; when the source already has at least that many
  * splits — i.e. any real at-scale input — it is a no-op, so no shuffle
  * is added in the 100 TB regime.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
