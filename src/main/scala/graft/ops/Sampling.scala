package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable corpus sampling — the reproducibility
  * primitive a training-data pipeline needs where `df.sample()` cannot be
  * trusted: Spark's RNG sampling changes membership with partitioning,
  * retries, and Spark versions, so an ablation's "10% subset" silently
  * drifts between runs. Here membership is a pure function of the row's
  * OWN id: keep a row iff `md5(cast(id as string)) < threshold`, where the
  * 32-hex-digit threshold is `floor(fraction · 16^32)`. The same rows are
  * kept on every engine (md5 is bit-identical everywhere — the same
  * portability argument as [[Dedup]]'s oracle-checkable hashing), every
  * partitioning, every run; subsets NEST (a 10% sample is a subset of the
  * 20% sample — thresholds are ordered), which ablation ladders rely on.
  * Scale: a per-row codegen'd predicate on the scan — no shuffle, no
  * driver state, pushes through column pruning.
  */
object Sampling {

  /** 32-hex-digit lexicographic threshold for `fraction` of md5 space —
    * public so an external mirror (SQL oracle, another engine) can embed
    * the IDENTICAL literal instead of re-deriving it through its own
    * float semantics.
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    val space = BigInt(1) << 128
    val cut = (BigDecimal(space) * fraction).toBigInt.min(space)
    if (cut >= space) "g" // lexicographically above every hex digest
    else {
      val s = cut.toString(16)
      ("0" * (32 - s.length)) + s
    }
  }

  /** Keep-predicate column for (`idCol`, `fraction`). */
  def keep(id: Column, fraction: Double): Column =
    md5(id.cast("string")) < lit(hexThreshold(fraction))

  /** The sampled frame: rows whose id-hash falls under `fraction`. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(keep(col(idCol), fraction))

  /** Stratified variant: a per-stratum fraction (e.g. downsample one
    * language, keep another whole), `default` for unlisted strata. The
    * per-stratum thresholds compile into ONE when-chain predicate — still
    * a scan-local filter, no join, no shuffle; strata counts are expected
    * to be config-small (languages, sources), not data-scale.
    */
  def sampleByHashStratified(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], default: Double): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    val pred = fractions.toSeq.sortBy(_._1).foldRight(
      h < lit(hexThreshold(default))) { case ((s, f), acc) =>
      when(col(stratumCol) === s, h < lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(pred)
  }
}
