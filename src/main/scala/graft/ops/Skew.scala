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

  /** Key-skew DIAGNOSTICS for a prospective join/aggregation key — the
    * measurement that decides whether [[saltedJoin]] (or AQE skew
    * handling) is needed before anyone pays for a skewed shuffle.
    *
    * One map-side-combined `groupBy(key).count` (the same shuffle shape
    * the diagnosed operation would have, so the report costs no more
    * than one run of it), collapsed to a single row of integer-exact
    * ratios:
    *
    *   - `n_rows`, `n_keys`, `max_cnt`: raw shape
    *   - `top_share_ppm`  = max_cnt·1e6 div n_rows — the fraction of
    *     all rows carried by the single hottest key
    *   - `skew_x1000`     = max_cnt·1000·n_keys div n_rows — hottest
    *     key vs the MEAN key (1000 = perfectly uniform)
    *   - `salt_advised`   = skew_x1000 > threshold·1000, i.e. the
    *     hottest reducer would run `threshold`× longer than average
    *
    * All ratios are integral `div` (non-negative operands, so Spark's
    * truncating div and DuckDB's floor `//` agree bit-for-bit). The
    * products are widened to DECIMAL(38,0) before the divide: on the
    * huge high-cardinality tables this diagnostic exists for,
    * `max_cnt·1000·n_keys` can exceed Long (e.g. 1e7 · 1000 · 1e9),
    * and a silent Long wrap would flip `salt_advised` exactly where it
    * matters. Spark's `div` accepts decimals and still returns BIGINT,
    * so the output schema is unchanged; the oracle mirrors with
    * HUGEINT.
    */
  def keySkewReport(df: DataFrame, key: String, label: String,
                    threshold: Int = 5): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    counts.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"))
      .select(
        lit(label).as("key_col"),
        col("n_rows"), col("n_keys"), col("max_cnt"),
        expr("cast(max_cnt as decimal(38,0)) * 1000000 div n_rows")
          .as("top_share_ppm"),
        expr("cast(max_cnt as decimal(38,0)) * 1000 * n_keys div n_rows")
          .as("skew_x1000"),
        (expr("cast(max_cnt as decimal(38,0)) * 1000 * n_keys div n_rows")
          > threshold * 1000L).as("salt_advised"))
  }
}
