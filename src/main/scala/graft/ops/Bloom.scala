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
}
