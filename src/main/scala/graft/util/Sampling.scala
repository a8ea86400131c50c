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
}
