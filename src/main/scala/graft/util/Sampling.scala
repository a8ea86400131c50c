package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling keys.
  *
  * Reproducible sampling at corpus scale cannot use `rand()`: a retried
  * task would re-draw, a forked subplan would disagree with its twin,
  * and no oracle could replay the draw. Instead every sampling decision
  * here is a pure function of the row's id — an md5-derived bucket in
  * [0,100) — so any engine that agrees on md5 (all of them) draws the
  * identical sample, and re-evaluation anywhere in the plan is safe.
  */
object Sampling {

  /** Deterministic [0,mod) bucket from the id's md5 (first 15 hex chars
    * → long → mod). Shared by [[graft.pipeline.Pipeline]]'s
    * stratified/mixture samplers and [[graft.simops.Ivf]]'s fit
    * sampling; the DuckDB twin is the `list_sum(list_transform(...))`
    * fold used in their oracles. The default mod 100 is the percent
    * draw; the mixture sampler draws at 10000 for basis-point rates.
    */
  def md5Bucket(id: Column, mod: Long = 100L): Column = pmod(
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(mod))

  /** Absolute row target for sampled index fits (IVF centroids, PQ
    * codebooks, the OPQ variance rank). Round-7 100× anchor lesson: a
    * PERCENT fit sample grows linearly with the corpus, so "the fit is
    * O(sample)" silently meant O(corpus) — at 200k vectors the 60%
    * codebook fit cost more than the encode it served. ~20k rows
    * estimates k ≤ 256 cell means far inside the rounding the fits
    * already apply (6dp).
    */
  val FitSampleTarget = 20000L

  /** Percent draw capped to an ABSOLUTE sample size: the largest pct
    * ≤ `pct` whose expected draw stays near `targetRows` —
    * `clamp(1, pct, ceil(targetRows·100 / n))`, integer arithmetic so
    * the DuckDB oracles replay it exactly from their own `count(*)`.
    * Fit cost becomes O(target), flat in corpus size; corpora small
    * enough that `pct` already draws ≤ ~target keep the identical
    * sample they always had.
    */
  def cappedPct(n: Long, pct: Int, targetRows: Long = FitSampleTarget): Int =
    if (n <= 0) pct
    else math.max(1L, math.min(pct.toLong, (targetRows * 100 + n - 1) / n))
      .toInt
}
