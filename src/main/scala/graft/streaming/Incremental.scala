package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming idioms for the reference's incremental patterns
  * (SURVEY.md §2.9): the rankings archive's "process only rows after the
  * cursor" append (generate_volume_rankings.py:346-379) becomes a file
  *-source stream with `Trigger.AvailableNow` — the checkpoint replaces
  * the hand-rolled max(date) cursor, exactly-once per input file, and
  * the same code serves a continuous deployment by switching trigger.
  */
object Incremental {

  /** Incremental append: each invocation processes only files not yet
    * recorded in the checkpoint, applies `transform`, and appends to
    * `sinkPath`. Returns after draining available input.
    */
  def appendAvailableNow(spark: SparkSession, sourcePath: String, schema: StructType,
                         checkpoint: String, sinkPath: String)
                        (transform: DataFrame => DataFrame): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 32)
      .parquet(sourcePath)
      .transform(transform)
      .writeStream
      .format("parquet")
      .option("path", sinkPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Continuous UPSERT ingest: stream micro-batches merged into the
    * partitioned store through `Store.upsert` via `foreachBatch` — the
    * streaming twin of the batch upsert path (same dynamic-partition
    * overwrite, same crash-safe lineage cut, same latest-row-per-key
    * semantics). The checkpoint gives exactly-once batch REPLAY, and
    * upsert itself is idempotent (replaying a batch re-merges the same
    * rows to the same latest-per-key winners), so the composition is
    * end-to-end exactly-once on the store.
    *
    * Scale: each micro-batch touches only its own partitions (the
    * upsert semi-joins the store on the batch's partition values), so
    * ingest cost tracks batch size, not table size.
    */
  def upsertStream(updates: DataFrame, path: String, checkpoint: String,
                   partCol: String, keys: Seq[String], tsCol: String,
                   tieBreak: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // batchId deliberately unused: upsert is idempotent (a replayed
        // batch re-merges the same rows to the same latest-per-key
        // winners), so no txn log keyed by batchId is needed for
        // exactly-once — the checkpoint's replay + idempotent merge is
        // the whole story.
        // The store must exist (seed with Store.writePartitioned).
        if (!batch.isEmpty)
          graft.ops.Store.upsert(batch.sparkSession, path, batch,
            partCol, keys, tsCol, tieBreak)
      }
      .start()

  /** Streaming exact dedup with bounded state — the stream-time shape of
    * the training-ingest content-hash dedup (`Dedup.exactGroups` for
    * batch): duplicates of a key arriving within the watermark horizon
    * are dropped, and — unlike plain `dropDuplicates` — state for keys
    * older than the watermark is evicted, so state size is bounded by
    * the horizon's key cardinality, not the stream's lifetime.
    */
  def dedupedStream(events: DataFrame, tsCol: String, watermark: String,
                    keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked tumbling-window counts — the streaming shape of the
    * daily-counts summary (A1/A8) with bounded state: late rows beyond
    * the watermark are dropped, state for closed windows is evicted.
    */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
                     window: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Stream-stream interval join — the streaming twin of
    * `Temporal.intervalJoin`: each left event pairs with right events
    * for the same key in `(leftTs, leftTs + window]`. Both sides carry
    * watermarks and the join condition is time-bounded in BOTH
    * directions, so Spark can evict buffered state: left rows older
    * than (watermark − window) can never match a future right row, and
    * vice versa — without the two-sided bound the join would buffer
    * both streams forever.
    *
    * `left`/`right` must expose `key` plus a TimestampType `ts`; their
    * other columns are disambiguated with an `l_`/`r_` prefix.
    */
  /** `joinType` additionally admits "left_outer": an unmatched left row
    * emits with nulls once the global watermark (min of the two input
    * watermarks) proves no future right row can land in its window —
    * i.e. when the row is evicted from state. Rows still in state when
    * an AvailableNow run terminates never emit; StreamQueries.st8's
    * oracle states that rule in batch SQL.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         watermark: String, window: String,
                         joinType: String = "inner"): DataFrame = {
    val l = left.columns.foldLeft(left) { (df, c) =>
      if (c == key || c == "ts") df else df.withColumnRenamed(c, s"l_$c")
    }.withColumnRenamed("ts", "l_ts").withWatermark("l_ts", watermark)
    val r = right.columns.foldLeft(right) { (df, c) =>
      if (c == key || c == "ts") df else df.withColumnRenamed(c, s"r_$c")
    }.withColumnRenamed("ts", "r_ts").withWatermark("r_ts", watermark)
    l.join(r,
      l(key) === r(key) &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"),
      joinType)
      // For outer joins the unmatched side's key column is null —
      // surface ONE key column that is always populated.
      .withColumn("__k", coalesce(l(key), r(key)))
      .drop(l(key)).drop(r(key))
      .withColumnRenamed("__k", key)
  }
}
