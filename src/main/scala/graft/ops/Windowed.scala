package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.5 W1–W7) as reusable specs.
  *
  * Scale notes: every spec here partitions by a key (date or symbol), so
  * evaluation is one hash shuffle per distinct partitioning and the frame
  * is computed within each partition without a global sort. The only
  * intentionally-global window is `globalRank`, which mirrors the
  * reference's RANK() OVER (ORDER BY ...) on an already-filtered one-day
  * cohort (queries/volume.py:54) — bounded input by construction; never
  * apply it to an unfiltered fact table.
  */
object Windowed {

  /** W1: global rank over a pre-filtered cohort (volume.py:54,118). */
  def globalRank(orderBy: Column): Column =
    rank().over(Window.orderBy(orderBy))

  /** W2: DENSE_RANK per partition — ties share rank, no gaps
    * (generate_volume_rankings.py:102; ADR-0013:69-75).
    */
  def denseRankIn(part: String, orderBy: Column): Column =
    dense_rank().over(Window.partitionBy(part).orderBy(orderBy))

  /** W3: PERCENT_RANK * 100 per partition (generate_volume_rankings.py:103). */
  def percentRankIn(part: String, orderBy: Column): Column =
    percent_rank().over(Window.partitionBy(part).orderBy(orderBy)) * 100

  /** W4: unbounded partition total (generate_volume_rankings.py:104;
    * volume.py:55,119 uses the empty-OVER variant on a filtered day).
    */
  def partitionTotal(measure: Column, part: String*): Column =
    sum(measure).over(Window.partitionBy(part.map(col): _*))

  /** W5: row-offset LAG ladder per key ordered by time
    * (generate_volume_rankings.py:129-132). Row-offset, NOT calendar
    * offset — bug-compatible with the reference (SURVEY §7.4.4).
    */
  def lagBy(c: Column, n: Int, part: String, order: String): Column =
    lag(c, n).over(Window.partitionBy(part).orderBy(order))

  /** W6: trailing row-frame spec, e.g. rows [-29, 0] for "days available
    * in trailing 30 observed rows" (generate_volume_rankings.py:114-118).
    */
  def trailing(part: String, order: String, precedingRows: Int): WindowSpec =
    Window.partitionBy(part).orderBy(order).rowsBetween(-precedingRows, 0)

  /** W7: share-of-total percent with NULLIF(total, 0) div-by-zero guard
    * (generate_volume_rankings.py:104).
    */
  def shareOfTotalPct(measure: Column, total: Column): Column =
    measure / when(total === 0, lit(null)).otherwise(total) * 100

  /** W13: rolling z-score anomaly flags over an INTEGER measure —
    * trailing `win`-observation mean/std from exact BIGINT window sums
    * (Σx, Σx²); only the final mean/var/sqrt run in doubles, as one
    * fixed expression, so the float outputs are engine-reproducible
    * (IEEE sqrt is correctly rounded). Variance clamps at 0 before
    * sqrt — the moment formula can land an ulp below zero and a NaN
    * would poison downstream equality/hashing. Rows whose frame holds
    * fewer than `win` observations are warmup: never flagged.
    *
    * Input rows must be unique per (key, ord). Returns the input plus
    * (win_n, mean, std, is_anomaly).
    */
  def rollingZScore(df: DataFrame, key: String, ord: Column, n: Column,
                    win: Int, threshold: Double): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord).rowsBetween(-(win - 1), 0)
    df.withColumn("win_n", count(n).over(w))
      .withColumn("__s", sum(n).over(w))
      .withColumn("__ss", sum(n * n).over(w))
      .withColumn("mean", col("__s") / col("win_n"))
      .withColumn("std", sqrt(greatest(
        (col("__ss") - col("__s") * col("__s") / col("win_n")) / col("win_n"),
        lit(0.0))))
      .withColumn("is_anomaly",
        col("win_n") === win && abs(n - col("mean")) > lit(threshold) * col("std"))
      .drop("__s", "__ss")
  }
}
