package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overwhelm single reducers.
  *
  * Grouped aggregation rarely needs this — partial (map-side) combine
  * already collapses hot keys before the shuffle. The real victim is a
  * shuffle JOIN against a side too big to broadcast: every row of a hot
  * key lands on one reducer. Salting splits each hot key across
  * `saltBuckets` reducers by joining on (key, salt) with the smaller
  * side replicated across all salts.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles many
  * cases at runtime; explicit salting remains the deterministic-shape
  * fallback for extreme single-key skew or non-AQE deployments.
  */
object Skew {

  /** Left side: assign each row a salt in [0, saltBuckets). The salt
    * only has to spread rows, not be stable across task retries — the
    * right side carries every salt value, so any assignment joins
    * identically.
    */
  def saltLeft(df: DataFrame, saltBuckets: Int): DataFrame =
    df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))

  /** Right side: replicate each row once per salt value. */
  def explodeRight(df: DataFrame, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))

  /** Salted equi-join: result is row-identical to
    * `large.join(small, keys)` but each hot key's rows spread over
    * `saltBuckets` reducers instead of one.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int): DataFrame =
    saltLeft(large, saltBuckets)
      .join(explodeRight(small, saltBuckets), keys :+ "__salt")
      .drop("__salt")
}
