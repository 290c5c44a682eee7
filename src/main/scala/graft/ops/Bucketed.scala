package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for shuffle-free co-located joins (SURVEY §1.3: the
  * reference's `idx_symbol_date` becomes layout, not an index object).
  *
  * Writing both sides bucketed (and sorted) by the join key with the
  * same bucket count pre-partitions the data on disk: a later join
  * reads matching buckets pair-wise and sort-merges with ZERO exchanges
  * — the shuffle is paid once at write time and amortized over every
  * subsequent join, which is exactly the trade a 100 TB fact table
  * wants for its hottest join key.
  */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
