package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's volume-rankings pipeline (SURVEY.md §2.5, §3.3) as one
  * declarative window pipeline — the parity centerpiece.
  *
  * Reference: .github/scripts/generate_volume_rankings.py:95-153 — CTE
  * `daily_ranks` (DENSE_RANK / PERCENT_RANK / per-date totals) inner-joined
  * to `rank_changes` (LAG ladder over 1/7/14/30 rows) and left-joined to
  * `trailing_availability` (ROWS BETWEEN 29 PRECEDING rolling count),
  * with exact narrow casts (SMALLINT/TINYINT/FLOAT,
  * generate_volume_rankings.py:138-148).
  *
  * Scale notes (100 TB view):
  *  - Both window families partition by a key (`date` or `symbol`), so
  *    each is ONE hash-partitioned shuffle; no global sort, no OVER ()
  *    single-partition collapse anywhere.
  *  - The three branches share the same filtered scan; Spark reuses the
  *    exchange output where partitioning matches (the per-symbol LAG and
  *    the per-symbol rolling count share one shuffle).
  *  - LAG is deliberately ROW-offset, not calendar-offset — the reference
  *    is "bug-compatible" here (SURVEY §7.4.4): a symbol with missing days
  *    gets "n rows ago", not "n days ago".
  */
object Rankings {

  /** Full rankings frame (13 columns with `generationTs`, matching
    * generate_volume_rankings.py:38-52; 12 without — the timestamp is
    * omitted by default because it would make oracle hash-comparison
    * nondeterministic).
    *
    * @param daily input with exactly one row per (date, symbol):
    *              date DATE, symbol STRING, volume DOUBLE (non-null),
    *              trade_count LONG.
    * @param generationTs batch stamp for the archive's
    *                     generation_timestamp column.
    */
  def pipeline(daily: DataFrame,
               generationTs: Option[java.sql.Timestamp] = None): DataFrame = {
    // NO symbol tie-break on the ranking window — the reference ranks on
    // volume alone (ties share a dense rank), and adding one would
    // change semantics.
    val perDateByVolume = Window.partitionBy("date").orderBy(col("volume").desc)
    val perDateAll = Window.partitionBy("date")
    val perSymbol = Window.partitionBy("symbol").orderBy("date")

    // daily_ranks CTE (generate_volume_rankings.py:98-106)
    val ranked = daily
      .withColumn("rank", dense_rank().over(perDateByVolume))
      .withColumn("percentile", percent_rank().over(perDateByVolume) * 100)
      .withColumn("total_volume",
        sum(col("volume").cast(DecimalType(25, 2))).over(perDateAll).cast(DoubleType))

    // rank_changes CTE (generate_volume_rankings.py:110-132): LAG ladder,
    // deltas NULL when history is shorter than the offset.
    val withLags = Seq(1, 7, 14, 30).foldLeft(ranked) { (df, n) =>
      df.withColumn(s"rank_change_${n}d",
        (col("rank") - lag(col("rank"), n).over(perSymbol)).cast(ShortType))
    }

    // trailing_availability CTE (generate_volume_rankings.py:114-118):
    // observed-row rolling count, 30-row frame.
    val out = withLags
      .withColumn("days_available",
        count(lit(1)).over(perSymbol.rowsBetween(-29, 0)).cast(ByteType))
      .withColumn("market_share_pct",
        (col("volume") / when(col("total_volume") === 0, lit(null)).otherwise(col("total_volume")) * 100)
          .cast(FloatType))
      .withColumn("percentile", col("percentile").cast(FloatType))
      .withColumn("rank", col("rank").cast(ShortType))

    val base = out.select(
      col("date"), col("symbol"), col("rank"),
      col("volume").as("quote_volume_usdt"), col("trade_count"),
      col("rank_change_1d"), col("rank_change_7d"),
      col("rank_change_14d"), col("rank_change_30d"),
      col("percentile"), col("market_share_pct"), col("days_available"))
    generationTs.fold(base)(ts =>
        base.withColumn("generation_timestamp", lit(ts)))
      .orderBy("date", "rank", "symbol")
  }
}
