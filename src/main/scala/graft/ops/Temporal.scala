package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join + sessionization operators.
  *
  * The reference engine works over daily-grain availability facts, so its
  * temporal logic is date arithmetic (timelines.py, gap detection). A
  * training-data / market-data pipeline additionally needs event-time
  * operators: as-of joins (latest quote at-or-before a trade), interval
  * joins (events within a window of an anchor), and gap sessionization.
  * Spark has no built-in as-of or interval join, so these compose the
  * scalable formulations by hand:
  *
  *  - [[asOfJoin]] — the union+window trick: ONE hash shuffle on the key,
  *    one sort, zero join nodes. Never builds the (left × right-history)
  *    intermediate that a `JOIN ... ON r.ts <= l.ts` + row_number plan
  *    materializes (which is O(n·m) per key and is how the DuckDB oracle
  *    states the semantics).
  *  - [[intervalJoin]] — equi-join on (key, coarse time bucket) with the
  *    right side exploded to the buckets its window can reach, then an
  *    exact range post-filter. Quadratic only within a (key, bucket)
  *    cell, never across the corpus; bucket width = window width keeps
  *    the explode factor at exactly 2.
  *  - [[sessionize]] — the classic lag/cumsum formulation: both window
  *    functions share one (key) exchange + sort, then one keyed
  *    aggregation. The streaming twin (arbitrary-state flatMapGroups)
  *    lives in streaming/Sessionize.scala; this is the batch/backfill
  *    path over the same semantics.
  */
object Temporal {

  /** Left as-of join: for each left row, attach `payloadCols` from the
    * single right row with the greatest (`rightTs`, tie-break
    * `rightOrder`) such that `rightTs <= leftTs` and the keys match.
    * Unmatched left rows keep NULL payloads.
    *
    * Implementation: tag right rows side=0 and left rows side=1, union,
    * then `last(payload, ignoreNulls)` over a running row frame ordered
    * by (ts, side, rightOrder). Right rows sort before left rows at
    * equal timestamps, giving inclusive at-or-before semantics; left
    * rows carry NULL payloads so `ignoreNulls` skips them. One exchange
    * on `key`, one sort — the same shape a 1000-executor range-
    * partitioned backfill wants, with no join hash table of the right
    * side's full history.
    *
    * `leftCols` are the left columns to carry through (must not collide
    * with `payloadCols`); `rightOrder` is a deterministic right-side
    * tie-break column (e.g. an event id).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: Column, rightTs: Column,
               leftCols: Seq[String], payloadCols: Seq[Column],
               payloadNames: Seq[String], rightOrder: Column): DataFrame = {
    require(payloadCols.length == payloadNames.length, "payload arity")
    val payloadTypes = right.select(payloadCols: _*).schema.fields.map(_.dataType)
    val l = left.select(
      col(key) +: lit(1).as("__side") +: leftTs.as("__ts") +: lit(null).cast("long").as("__ord") +:
        (leftCols.map(col) ++ payloadNames.zip(payloadTypes).map {
          case (n, t) => lit(null).cast(t).as(n)
        }): _*)
    val r = right.select(
      col(key) +: lit(0).as("__side") +: rightTs.as("__ts") +: rightOrder.cast("long").as("__ord") +:
        (leftCols.map(n => lit(null).cast(left.schema(n).dataType).as(n)) ++
          payloadCols.zip(payloadNames).map { case (c, n) => c.as(n) }): _*)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select(col(key) +: col("__side") +: leftCols.map(col) ++:
        payloadNames.map(n => last(col(n), ignoreNulls = true).over(w).as(n)): _*)
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** Forward as-of join: the EARLIEST right row with `rightTs >=
    * leftTs` (ties broken by MIN `rightOrder`) — "next maintenance
    * window after this event". Same union+window single-shuffle shape
    * as [[asOfJoin]], realized by running it over negated timestamps
    * and order keys: latest(-t) at-or-before -leftTs ⇔ earliest t
    * at-or-after leftTs, and max(-ord) ⇔ min(ord). Negation is exact
    * for integral epoch-us values, so semantics carry over unchanged.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: Column, rightTs: Column,
                      leftCols: Seq[String], payloadCols: Seq[Column],
                      payloadNames: Seq[String], rightOrder: Column): DataFrame =
    asOfJoin(left, right, key,
      leftTs = -leftTs, rightTs = -rightTs,
      leftCols, payloadCols, payloadNames, rightOrder = -rightOrder)

  /** Interval (range) join: pairs (l, r) with matching `key` and
    * `rightTs` in the half-open window `(leftTs, leftTs + windowUs]`,
    * timestamps as epoch-microsecond longs.
    *
    * Scale shape: both sides bucket by `floor(ts / windowUs)`; a left
    * anchor can only reach right rows in its own bucket or the next, so
    * the left side explodes to exactly those 2 buckets and the join is
    * a plain equi shuffle join on (key, bucket) + exact range filter.
    * Each qualifying pair matches in exactly one bucket (the right
    * row's), so no dedup pass is needed. Work is proportional to
    * genuinely-near pairs, never |L|×|R|.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftUs: Column, rightUs: Column, windowUs: Long,
                   leftOut: Seq[(String, Column)], rightOut: Seq[(String, Column)]): DataFrame = {
    // Integer (floor) division keeps bucket assignment exact for any
    // epoch value — double division would round at bucket boundaries.
    val l = left.select(col(key).as("__lk") +: leftUs.as("__lus") +:
        explode(array(lit(0L), lit(1L))).as("__boff") +: leftOut.map { case (n, c) => c.as(n) }: _*)
      .withColumn("__b", expr(s"__lus div ${windowUs}L") + col("__boff"))
    val r = right.select(col(key).as("__rk") +: rightUs.as("__rus") +:
        rightOut.map { case (n, c) => c.as(n) }: _*)
      .withColumn("__b", expr(s"__rus div ${windowUs}L"))
    l.join(r, l("__lk") === r("__rk") && l("__b") === r("__b") &&
        r("__rus") > l("__lus") && r("__rus") <= l("__lus") + lit(windowUs))
      .select((leftOut.map(_._1) ++ rightOut.map(_._1)).map(col) :+
        (col("__rus") - col("__lus")).as("delta_us"): _*)
  }

  /** Time-bucket resampling to OHLC-style bars: one row per
    * (`groupCols`, bucket) with open/close (value at the first/last
    * event in the bucket), low/high, event count, and an exact decimal
    * sum of `valueCol`.
    *
    * open/close use `min_by`/`max_by` over a (ts, tieBreak) struct —
    * a plain aggregation with map-side partial merge, NOT a window:
    * first/last-in-bucket via row_number would shuffle and sort every
    * event, while min_by reduces each task's bucket to one candidate
    * before the exchange. `tieBreak` must make (ts, tieBreak) unique
    * within a bucket (an event id) or open/close are nondeterministic.
    */
  def resampleBars(events: DataFrame, groupCols: Seq[String], tsUs: Column,
                   valueCol: Column, tieBreak: Column, bucketUs: Long): DataFrame = {
    val ord = struct(tsUs.as("ts"), tieBreak.as("tb"))
    events
      // integer floor-division keeps bucket assignment exact at
      // boundaries (double division would round)
      .withColumn("__us", tsUs)
      .withColumn("bucket", expr(s"__us div ${bucketUs}L"))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(
        min_by(valueCol, ord).as("open"),
        max_by(valueCol, ord).as("close"),
        min(valueCol).as("lo"),
        max(valueCol).as("hi"),
        count(lit(1)).as("n_events"),
        Exact.sum2(valueCol).as("volume"))
  }

  /** Gap-based sessionization: events for the same `key` belong to one
    * session while consecutive gaps are <= `gapUs` microseconds.
    * Returns one row per session: (key, session_id, n_events, start_us,
    * end_us, duration_us), session ids numbered 1.. per key in time
    * order.
    *
    * lag() and the running sum share one (key)-hash exchange and one
    * (key, ts) sort; the per-session rollup is a second keyed shuffle
    * on (key, session_id) — both keys are high-cardinality and
    * skew-free at scale (bounded events per user per day).
    */
  def sessionize(events: DataFrame, key: String, tsUs: Column, gapUs: Long): DataFrame = {
    val byTime = Window.partitionBy(key).orderBy(col("__us"))
    val run = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(key), tsUs.as("__us"))
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(byTime) <= gapUs, 0L).otherwise(1L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Daily gap fill + forward fill: densify each key's observed span to
    * a complete per-day grid, then carry the last observed value across
    * the gaps (pandas `resample('D').ffill()`, for a distributed table).
    *
    * Returns (key, day, was_filled, v, n_obs): `v` is the exact daily
    * average ([[Exact.avg2]], order-independent so it hash-matches any
    * engine) forward-filled over missing days; `was_filled` marks grid
    * days with no observations. `v` is never NULL — each key's grid
    * starts at its own first observed day.
    *
    * Scale shape: the raw events collapse map-side into the (key, day)
    * aggregate before its shuffle; the span frame is one row per key;
    * `sequence` densifies per key WITHOUT a cross join against a global
    * calendar (a key observed for a week never materializes the whole
    * corpus date range); the forward-fill window and the grid/daily
    * join both hash on `key`, so AQE coalesces them onto the same
    * exchange footprint. Per-key grid length is bounded by that key's
    * own observed span, so skew equals genuine span skew, not fan-out.
    */
  def gapFillDaily(df: DataFrame, key: String, day: Column, value: Column): DataFrame = {
    val daily = df.groupBy(col(key), day.as("day"))
      .agg(Exact.avg2(value).as("v_obs"), count(lit(1)).as("n_obs"))
    val grid = daily.groupBy(col(key))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col(key), explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val run = Window.partitionBy(key).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(key, "day"), "left")
      .withColumn("was_filled", col("v_obs").isNull)
      .withColumn("v", last(col("v_obs"), ignoreNulls = true).over(run))
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .drop("v_obs")
  }
}
