package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core relational operators of the reference engine (SURVEY.md §2.2–§2.4,
  * §2.6–§2.7), expressed as reusable DataFrame transforms.
  *
  * Everything here is a declarative Catalyst plan: filters and projections
  * push down into the parquet scan, groupBys get map-side partial
  * aggregation, and small join sides are broadcast explicitly. No
  * collect(), no driver loops — each transform scales with executor count.
  */
object Relational {

  /** Point snapshot: equality filter + projection + presentation sort.
    * Reference: queries/snapshots.py:56-64 (F1+O1).
    */
  def snapshot(df: DataFrame, pred: Column, cols: Seq[String], sortBy: Seq[String]): DataFrame =
    df.filter(pred).select(cols.map(col): _*).orderBy(sortBy.map(col): _*)

  /** Range scan with BETWEEN predicate. Reference: queries/snapshots.py:100-108 (F2). */
  def range(df: DataFrame, c: Column, lo: Any, hi: Any): DataFrame =
    df.filter(c.between(lit(lo), lit(hi)))

  /** Distinct projection (A9). Reference: queries/snapshots.py:100-108. */
  def distinctOf(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** Grouped count, sorted by group key (A1/A2).
    * Reference: queries/analytics.py:52-60. Map-side combine makes this a
    * single shuffle of (key, partialCount) pairs — safe at any scale.
    */
  def countBy(df: DataFrame, key: Column, keyName: String, cntName: String = "n"): DataFrame =
    df.groupBy(key.as(keyName)).agg(count(lit(1)).as(cntName)).orderBy(keyName)

  /** Group + HAVING on the aggregated count (A3).
    * Reference: validation/completeness.py:79-89.
    */
  def havingCountLt(df: DataFrame, key: Column, keyName: String, min: Long): DataFrame =
    df.groupBy(key.as(keyName))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < min)
      .orderBy(keyName)

  /** Conditional aggregation: SUM(CASE WHEN cond THEN 1 ELSE 0 END) per key
    * (A8 — the reference's materialized-view refresh shape,
    * database/availability_db.py:232-242).
    */
  def conditionalCounts(df: DataFrame, key: Column, keyName: String, cond: Column): DataFrame =
    df.groupBy(key.as(keyName)).agg(
      count(lit(1)).as("total"),
      sum(when(cond, 1L).otherwise(0L)).as("matched"),
      // NOT total − matched via `!cond`: a null condition satisfies
      // neither branch and would break total = matched + unmatched.
      (count(lit(1)) - sum(when(cond, 1L).otherwise(0L))).as("unmatched")
    ).orderBy(keyName)

  /** Anti-join: rows of `left` whose key never appears in `right` (J3/J4).
    * Reference: queries/analytics.py:94-108 (NOT IN subquery → left_anti).
    * Catalyst broadcasts the right side when it is under the broadcast
    * threshold, turning this into a map-only broadcast-anti at scale.
    */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Left join + COALESCE default for missing measures (J2).
    * Reference: generate_volume_rankings.py:151 + :147.
    */
  def leftJoinWithDefault(left: DataFrame, right: DataFrame, keys: Seq[String],
                          measure: String, default: Column): DataFrame =
    left.join(right, keys, "left")
      .withColumn(measure, coalesce(col(measure), default))

  /** Overlap guard: inner-join key intersection used to reject duplicate
    * appends (J7). Reference: generate_volume_rankings.py:274-282.
    */
  def overlap(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.select(keys.map(col): _*).distinct()
      .join(b.select(keys.map(col): _*).distinct(), keys, "inner")
}
