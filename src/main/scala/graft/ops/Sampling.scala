package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deterministic sampling operators for training-data pipelines.
  *
  * Everything keys off the portable 60-bit content hash (`TextOps
  * .hash60`), never `rand()`: a sample must be reproducible across
  * runs, engines, task retries, and partitionings — `df.sample` is
  * none of those (seeded per-partition, so a repartition reshuffles
  * membership). Hash-gating is also embarrassingly parallel: a pure
  * map-side filter, no shuffle, no state.
  *
  * Scale notes: the gate is a codegen'd expression evaluated inside the
  * scan's WholeStageCodegen span; stratified quotas are one keyed
  * window (single exchange on the stratum key).
  */
object Sampling {

  private val Buckets = 10000L

  /** The gate bucket for a key: uniform in [0, 10000).
    *
    * NULL keys hash to NULL and thus fail every gate — null-keyed rows
    * are excluded from all samples (a sample keyed on a nullable column
    * is a caller bug; coalesce first if nulls are meaningful).
    */
  def gateBucket(key: Column, salt: String): Column =
    TextOps.seededHash60(lit(salt), key.cast(StringType)) % Buckets

  /** Keep rows whose key hashes under `fraction`: a deterministic,
    * engine-portable Bernoulli sample. Same key + salt → same verdict,
    * always; vary `salt` for independent samples.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
                 salt: String = "sample"): DataFrame =
    df.filter(gateBucket(key, salt) < (fraction * Buckets).toLong)

  /** Stratified quota sample: the `k` rows of each stratum whose keys
    * hash smallest (a deterministic per-group reservoir). Balanced
    * per-language / per-source quotas for training mixtures come out as
    * one window over the stratum key.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       k: Int, salt: String = "strat"): DataFrame = {
    // key is the tiebreak: hash collisions are ~2^-60, but a sample
    // operator must be total-order deterministic even then.
    val w = Window.partitionBy(stratum)
      .orderBy(TextOps.seededHash60(lit(salt), key.cast(StringType)), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Mixture weighting: per-source keep-rates (dataset mixing for
    * training runs). Unlisted sources fall back to `defaultRate`.
    * Deterministic per key, map-side only — at 100 TB this is a pure
    * scan+filter with the rate CASE folded into codegen.
    */
  def mixtureSample(df: DataFrame, sourceCol: Column, key: Column,
                    rates: Map[String, Double], defaultRate: Double,
                    salt: String = "mix"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(sourceCol === src, lit(r)).otherwise(acc)
    }
    df.filter(gateBucket(key, salt) <
      (rate * Buckets).cast(org.apache.spark.sql.types.LongType))
  }
}
