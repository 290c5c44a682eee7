package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. Loading is a plain
  * `spark.read.parquet` — Catalyst handles column pruning and filter
  * pushdown into the scan, so callers should express filters/projections
  * declaratively and never pre-collect.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view for the `spark.sql` surface.
    * `events` goes through its nanos-normalizing loader.
    */
  def createViews(spark: SparkSession, sfDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    events(spark, sfDir).createOrReplaceTempView("events")
  }

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** `events.ts` has been written two ways by the driver across rounds:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read nanos as long and truncate to micros, same as DuckDB's ns→us
    * cast) and plain `timestamp[us]` without a timezone (which Spark
    * reads as TIMESTAMP_NTZ). Normalize both to a micros TimestampType
    * column; the session timezone is pinned to UTC everywhere, so the
    * NTZ→LTZ cast preserves every wall-clock value bit-for-bit.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, d, "events"))
  }

  /** Normalize an events-shaped frame's `ts` to micros TimestampType,
    * whichever way the driver wrote it. Shared by the batch loader above
    * and the STREAMING readers (StreamQueries st4/st5) — the streaming
    * path once hardcoded the nanos-long branch and broke the round-6
    * driver gate when the testdata switched to timestamp[us].
    */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
