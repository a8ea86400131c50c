package graft.util

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
    // A/B'd at the zsf10 anchor (r17): firing only below cores/2 was a
    // net LOSS — it saved ngram_jaccard's posting exchange (−15 s) but
    // halved the effective parallelism of the kernel-heavy narrow rows
    // (dedup_spans 14.8 → 42.6 s, lm_score 8.4 → 14.1 s), which is
    // exactly the single-core starvation this guard exists to prevent.
    // The `< cores` rule stays.
    if (estimatedSplits(df) < cores) df.repartition(cores) else df
  }

  /** A filter condition the optimizer will NOT push below a [[spread]]
    * exchange — see [[graft.functions.PlanFence]] for why and when.
    */
  def noPushdown(cond: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PlanFence.fence(cond)

  /** Input-split estimate from the FILE INDEX, not from `df.rdd` (which
    * builds the whole physical RDD lineage per call just to read a
    * partition count): for file-backed frames, mirror Spark's own
    * split-sizing rule — `min(maxPartitionBytes, max(openCostInBytes,
    * bytes/defaultParallelism))` per split — over the index's total
    * size. Frames with no file relation (literal test data, checkpoint
    * RDDs) fall back to the RDD count; operators only call [[spread]]
    * on raw source tables, so the fallback is a test-only path.
    */
  private def estimatedSplits(df: DataFrame): Int = {
    val spark = df.sparkSession
    val fsBytes = df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.sizeInBytes
        case _ => -1L
      }
    }
    if (fsBytes.nonEmpty && fsBytes.forall(_ >= 0L)) {
      def bytesConf(key: String, fallback: String): Long =
        JavaUtils.byteStringAsBytes(spark.conf.get(key, fallback))
      val maxBytes = bytesConf("spark.sql.files.maxPartitionBytes", "128m")
      val openCost = bytesConf("spark.sql.files.openCostInBytes", "4m")
      val total = fsBytes.sum
      val perCore = total / math.max(1, spark.sparkContext.defaultParallelism)
      val split = math.min(maxBytes, math.max(openCost, perCore))
      math.min(Int.MaxValue.toLong, math.max(1L, (total + split - 1) / split))
        .toInt
    } else df.rdd.getNumPartitions
  }
}
