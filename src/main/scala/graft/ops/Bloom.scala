package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: semi-join reduction for the case where
  * the dimension side is too big to broadcast as ROWS but its key SET
  * fits a few-MB filter.
  *
  * A 100 M-key dimension at 1% fpp is a ~120 MB broadcast as a Bloom
  * filter vs tens of GB as a hash relation — so the fact side can be
  * pre-filtered MAP-SIDE, before its join shuffle, shipping only rows
  * that can possibly match. No false negatives means the subsequent
  * exact join returns the identical result; false positives only cost
  * a little extra shuffle volume (they're dropped by the join itself).
  *
  * This is the manual, composable form of Spark's runtime bloom-filter
  * rewrite (`spark.sql.optimizer.runtime.bloomFilter.*`) — explicit so
  * pipelines can build the filter once and reuse it across several
  * fact scans of the same feed.
  *
  * EAGER BY CONTRACT: every method here runs the filter-build
  * aggregation (one Spark job over the dim side) AT CALL TIME — the
  * filter's bits must exist on the driver before the returned plan can
  * embed the broadcast probe. Calling one of these is an action, not a
  * plan transform: construct the pruned frame once and reuse it; don't
  * call inside a per-query plan builder expecting laziness. (The truly
  * lazy form is the optimizer's own rewrite above, which injects the
  * build as a scalar subquery — internal Catalyst machinery by design.)
  * PlanSpec pins this contract.
  */
object Bloom {

  /** Build a Bloom filter over `dim(dimKey)` (distributed aggregation —
    * each partition builds a partial filter, merged with bitwise OR),
    * broadcast it, and return `fact` reduced to rows whose `factKey`
    * might match. Keys must be integral (hashed as longs on both the
    * build and probe side).
    */
  def pruneByKey(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    fact.filter(might(col(factKey)))
  }

  /** Bloom-pruned inner equi-join: prune the fact side map-side, then
    * run the exact join. Result is row-identical to
    * `fact.join(dim, fact(factKey) === dim(dimKey))` at any fpp.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    pruneByKey(fact, dim, factKey, dimKey, expectedItems, fpp)
      .join(dim, col(factKey) === col(dimKey))

  /** COMPOSITE-key variant of [[pruneByKey]]: both sides derive a
    * 64-bit `xxhash64` over the key columns and the filter is built /
    * probed on that derived key — so multi-column join keys prune
    * without materializing a packed key column. Hash collisions only
    * ADD false positives (two key tuples sharing an xxhash64 value);
    * they can never drop a real match, so the no-false-negative
    * contract of the exact downstream join is preserved at any fpp.
    *
    * `expectedItems` may be capped below the true dim cardinality to
    * bound the broadcast (a saturated filter degrades toward higher
    * fpp, never toward false negatives) — the graceful-degradation
    * contract a 100 TB build side needs.
    */
  def pruneByHashedKeys(fact: DataFrame, factKeys: Seq[String],
      dim: DataFrame, dimKeys: Seq[String],
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val keyed = dim.select(xxhash64(dimKeys.map(col): _*).as("__bk"))
    val bf = keyed.stat.bloomFilter("__bk", math.max(expectedItems, 1L), fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    fact.filter(might(xxhash64(factKeys.map(col): _*)))
  }
}
