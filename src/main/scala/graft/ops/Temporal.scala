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

  /** As-of join with a TOLERANCE (the pandas `merge_asof` contract): a
    * match older than `tolerance` time units below `leftTs` is
    * discarded — payloads go NULL, exactly as if no right row existed.
    * Because the as-of pick is the LATEST at-or-before row, "latest is
    * stale ⇒ everything is stale", so nullifying the one picked match
    * equals restricting the join to the window — no second pass over
    * the right side. Same single-shuffle union+window plan as
    * [[asOfJoin]], with the matched right timestamp carried as one
    * extra payload column and dropped after the staleness gate.
    *
    * `leftTs` must name a column in `leftCols` (the gate re-reads it on
    * the joined frame); `tolerance` is in the timestamp's own units.
    */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTs: Column, rightTs: Column,
                        leftCols: Seq[String], payloadCols: Seq[Column],
                        payloadNames: Seq[String], rightOrder: Column,
                        tolerance: Long): DataFrame = {
    val matchTs = "__match_ts"
    val joined = asOfJoin(left, right, key, leftTs, rightTs, leftCols,
      payloadCols :+ rightTs, payloadNames :+ matchTs, rightOrder)
    val fresh = col(matchTs).isNotNull && (leftTs - col(matchTs) <= tolerance)
    payloadNames.foldLeft(joined)((df, n) =>
        df.withColumn(n, when(fresh, col(n))))
      .drop(matchTs)
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

  /** Integer-exact THEIL–SEN robust trend per key: the median of all
    * pairwise slopes over a bounded x-window — one outlier point
    * cannot bend it, unlike least squares. Slopes are scaled by
    * `scaleL`, which the caller picks as a common multiple of every
    * possible Δx (e.g. lcm(1..maxDx)) so `(Δy·scaleL) div Δx` is
    * REMAINDER-FREE — that's what lets Spark's truncating `div` and a
    * floor-division oracle agree even on NEGATIVE slopes (trunc ==
    * floor exactly when the remainder is zero).
    *
    * Pairs are quadratic only in the per-key window (`Δx ≤ maxDx` —
    * a production monitor always trends a bounded trailing window);
    * the median is discrete rank selection over one keyed window
    * exchange. Input `perX`: one row per (key, x) with an integral
    * `y`.
    */
  def theilSenTrend(perX: DataFrame, keyCol: String, xCol: String, yCol: String,
                    maxDx: Int, scaleL: Long): DataFrame = {
    val a = perX.select(col(keyCol), col(xCol).as("__xa"), col(yCol).as("__ya"))
    val b = perX.select(col(keyCol), col(xCol).as("__xb"), col(yCol).as("__yb"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("slope"), col("__xa"), col("__xb"))
    val wc = Window.partitionBy(keyCol)
    a.join(b, Seq(keyCol))
      .where(col("__xb") > col("__xa") && col("__xb") - col("__xa") <= maxDx)
      .withColumn("slope",
        expr(s"(__yb - __ya) * ${scaleL}L div (__xb - __xa)"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col(keyCol), col("n").as("n_pairs"),
        col("slope").as("slope_scaled"),
        when(col("slope") > 0, "up").when(col("slope") < 0, "down")
          .otherwise("flat").as("trend"))
  }

  /** CUSUM change-point detection per key, window-only: the classic
    * recurrence S_i = max(0, S_{i−1} + (x_i − target)) looks
    * sequential, but the identity
    *
    *   S_i = P_i − min(0, min_{j ≤ i} P_j),  P = running Σ (x − target)
    *
    * turns it into two PLAIN window functions (running sum + running
    * min) — one keyed exchange, no fold, no recursion, engine-exact
    * in integers. A day is flagged when the accumulated upward drift
    * exceeds `threshold` — the sustained-shift monitor that point
    * rules (q_w13) and seasonal medians (q_v6) both miss, because it
    * integrates SMALL drifts over time instead of testing each day
    * alone.
    *
    * Input `perX`: one row per (key, x) with integral `y`; `target`
    * is the per-key null-hypothesis level (pass the trailing mean the
    * caller believes in).
    */
  def cusumFlags(perX: DataFrame, keyCol: String, xCol: String, yCol: String,
                 target: Column, threshold: Column): DataFrame = {
    val wRun = Window.partitionBy(keyCol).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perX
      .withColumn("__d", col(yCol) - target)
      .withColumn("__p", sum(col("__d")).over(wRun))
      .withColumn("cusum",
        col("__p") - least(lit(0L), min(col("__p")).over(wRun)))
      .withColumn("flagged", col("cusum") > threshold)
      .select(col(keyCol), col(xCol), col(yCol), col("cusum"), col("flagged"))
  }

  /** NEAREST-match as-of join (the pandas `merge_asof
    * direction='nearest'` contract, completing the backward /
    * forward / tolerance family): each left row takes the right match
    * with the SMALLEST absolute time distance, a tie going to the
    * backward (at-or-before) match. Within a direction, ties at equal
    * timestamp resolve by `rightOrder` exactly as [[asOfJoin]] does
    * (backward: largest; forward: smallest).
    *
    * One union + ONE keyed exchange-and-sort carries BOTH directions:
    * the backward candidate is `last(ignoreNulls)` over the preceding
    * frame, the forward candidate `first(ignoreNulls)` over the
    * following frame of the SAME window ordering, so Spark reuses one
    * sort — never two as-of passes glued by a join. The matched right
    * timestamp rides along per direction to decide the winner; all
    * payloads switch sides TOGETHER on that one row-level condition.
    *
    * Timestamps must be numeric (epoch units) — the distance
    * comparison needs subtraction, the [[asOfJoinTolerance]]
    * convention.
    */
  def asOfJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: Column, rightTs: Column,
                      leftCols: Seq[String], payloadCols: Seq[Column],
                      payloadNames: Seq[String], rightOrder: Column): DataFrame = {
    require(payloadCols.length == payloadNames.length, "payload arity")
    val names2 = payloadNames :+ "__mts"
    val pay2 = payloadCols :+ rightTs
    val payloadTypes = right.select(pay2: _*).schema.fields.map(_.dataType)
    val l = left.select(
      col(key) +: lit(1).as("__side") +: leftTs.as("__ts") +:
        lit(null).cast("long").as("__ord") +:
        (leftCols.map(col) ++ names2.zip(payloadTypes).map {
          case (n, t) => lit(null).cast(t).as(n)
        }): _*)
    val r = right.select(
      col(key) +: lit(0).as("__side") +: rightTs.as("__ts") +:
        rightOrder.cast("long").as("__ord") +:
        (leftCols.map(n => lit(null).cast(left.schema(n).dataType).as(n)) ++
          pay2.zip(names2).map { case (c, n) => c.as(n) }): _*)
    val wB = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = l.unionByName(r)
      .select(col(key) +: col("__side") +: col("__ts") +: leftCols.map(col) ++:
        (names2.map(n => last(col(n), ignoreNulls = true).over(wB).as(s"__b_$n")) ++
          names2.map(n => first(col(n), ignoreNulls = true).over(wF).as(s"__f_$n"))): _*)
      .filter(col("__side") === 1)
    // equal-ts rights sort BEFORE the left row (side 0 < 1), so they
    // appear only in the backward frame — distance 0, and backward wins
    // the tie anyway, so the forward frame genuinely means "strictly
    // after".
    val takeB = col("__f___mts").isNull ||
      (col("__b___mts").isNotNull &&
        (col("__ts") - col("__b___mts") <= col("__f___mts") - col("__ts")))
    filled.select(col(key) +: leftCols.map(col) ++:
      payloadNames.map(n =>
        when(takeB, col(s"__b_$n")).otherwise(col(s"__f_$n")).as(n)): _*)
  }

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

  /** Interval-OVERLAP join: pairs of intervals (same `key`, one from
    * each side) whose half-open intersection is NON-EMPTY —
    * `max(lStart, rStart) < min(lEnd, rEnd)` — with the overlap length
    * attached. (The textbook `s1 < e2 && s2 < e1` predicate is NOT
    * equivalent once zero-length intervals appear: it admits pairs
    * whose intersection is empty.) The interval×interval
    * generalization of [[intervalJoin]]'s point×window shape.
    *
    * Scale shape: each interval explodes to the `gridUs` buckets it
    * covers and candidates pair by equi-join on (key, bucket). A pair
    * sharing several buckets would match repeatedly, so the match is
    * kept ONLY in the bucket containing the overlap's start
    * (max of the two starts) — every true pair survives exactly once
    * and no distinct/dedup pass ever runs. Work is proportional to
    * co-bucketed candidates; pick `gridUs` near the typical interval
    * length to keep the explode factor ~2.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, key: String,
                  lStart: Column, lEnd: Column, rStart: Column, rEnd: Column,
                  gridUs: Long,
                  leftOut: Seq[(String, Column)], rightOut: Seq[(String, Column)]): DataFrame = {
    // Integer TRUNCATING division for bucket math (Spark's `div` rounds
    // toward zero, not floor — a negative epoch start would make the
    // bucket straddling zero double-width). Correct regardless:
    // truncation is still monotonic, so the overlap-start-bucket dedup
    // invariant below holds; only bucket geometry across zero is
    // uneven. Double division would round at bucket boundaries for
    // large epoch values, which truncating integer div avoids.
    val l = left.select(col(key).as("__lk") +: lStart.as("__ls") +: lEnd.as("__le") +:
        leftOut.map { case (n, c) => c.as(n) }: _*)
      .withColumn("__lsb", expr(s"__ls div ${gridUs}L"))
      .withColumn("__b", explode(expr(s"sequence(__lsb, __le div ${gridUs}L)")))
    val r = right.select(col(key).as("__rk") +: rStart.as("__rs") +: rEnd.as("__re") +:
        rightOut.map { case (n, c) => c.as(n) }: _*)
      .withColumn("__rsb", expr(s"__rs div ${gridUs}L"))
      .withColumn("__b", explode(expr(s"sequence(__rsb, __re div ${gridUs}L)")))
    l.join(r, l("__lk") === r("__rk") && l("__b") === r("__b") &&
        greatest(l("__ls"), r("__rs")) < least(l("__le"), r("__re")) &&
        // keep the pair only in its overlap-start bucket (dedup-free)
        l("__b") === when(l("__ls") >= r("__rs"), l("__lsb")).otherwise(r("__rsb")))
      .select((leftOut.map(_._1) ++ rightOut.map(_._1)).map(col) :+
        (least(l("__le"), r("__re")) - greatest(l("__ls"), r("__rs"))).as("overlap_us"): _*)
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

  /** Step-sequenced funnel: how many keys reach step 1, then step 2
    * at-or-after their step-1 time, then step 3 at-or-after that, ...
    * Returns one row per step: (step_no, step, users, total_wait_us)
    * where `total_wait_us` sums each key's wait from the previous
    * step's reach time (0 for the first step). "Reach time" is the
    * EARLIEST qualifying event — the standard strict-order funnel.
    *
    * Scale shape: every stage is a keyed MIN aggregation (map-side
    * partial) plus an equi join against the previous stage's one-row-
    * per-key frame — all shuffles hash on the same `key`, so AQE reuses
    * one exchange footprint and nothing is ever quadratic. The
    * per-step rollup is a 1-row global aggregate of an already-tiny
    * frame. No windows, no event-level sort.
    */
  def funnel(events: DataFrame, key: String, tsUs: Column, stepCol: Column,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(key).as("__k"), tsUs.as("__us"), stepCol.as("__step"))
    var prev: DataFrame = null
    val rollups = steps.zipWithIndex.map { case (st, i) =>
      val cand = e.filter(col("__step") === st)
      val cur =
        if (i == 0)
          cand.groupBy(col("__k")).agg(min(col("__us")).as("__t"))
            .withColumn("__w", lit(0L))
        else
          cand.join(prev.select(col("__k"), col("__t").as("__pt")), "__k")
            .filter(col("__us") >= col("__pt"))
            .groupBy(col("__k"))
            // __pt is constant per key; MAX is just the aggregate-safe
            // way to carry it through the grouping.
            .agg(min(col("__us")).as("__t"), max(col("__pt")).as("__pt"))
            .withColumn("__w", col("__t") - col("__pt"))
            .drop("__pt")
      prev = cur
      cur.agg(count(lit(1)).as("users"),
          coalesce(sum(col("__w")), lit(0L)).as("total_wait_us"))
        .select(lit(i + 1).as("step_no"), lit(st).as("step"),
          col("users"), col("total_wait_us"))
    }
    rollups.reduce(_.unionByName(_))
  }

  /** Weekly cohort retention: cohort = ISO week of each key's first
    * activity; a (cohort_week, week_offset) cell counts the distinct
    * keys from that cohort active `week_offset` weeks later.
    *
    * Scale shape: the first-activity frame is one keyed MIN (map-side
    * partial); the join back hashes on the same key; the final
    * COUNT(DISTINCT key) groups by the low-cardinality (cohort, offset)
    * pair but Spark expands distinct aggregation over the
    * (cohort, offset, key) triple first, so no cell ever materializes
    * its member list. Both date_trunc('week') engines are ISO-Monday.
    */
  def cohortRetention(df: DataFrame, key: String, dayCol: Column): DataFrame = {
    val firstDay = df.groupBy(col(key)).agg(min(dayCol).as("__c"))
    df.select(col(key), dayCol.as("__d"))
      .join(firstDay, key)
      .select(col(key),
        date_trunc("week", col("__c")).cast("date").as("__cw"),
        date_trunc("week", col("__d")).cast("date").as("__w"))
      .withColumn("week_offset", expr("datediff(__w, __cw) div 7"))
      .groupBy(col("__cw").as("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(key)).as("n_users"))
  }

  /** SCD type-2 dimension build from an event changelog: collapse each
    * key's consecutive identical states, then emit one validity
    * interval per state run — (key, version, state, effective_from,
    * effective_to, is_current), `effective_to` NULL on the open
    * current row. `tieBreak` must make (ts, tieBreak) unique per key
    * or run boundaries are nondeterministic.
    *
    * Scale shape: one hash exchange on `key` and one (ts, tieBreak)
    * sort serve all three window functions — the change-detection lag
    * runs first, and the post-filter row_number/lead windows reuse the
    * same partitioning and ordering, so Catalyst plans no second
    * exchange or sort.
    */
  def scd2(df: DataFrame, key: String, tsCol: Column, stateCol: Column,
           tieBreak: Column): DataFrame = {
    val byT = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tb"))
    df.select(col(key).as("__k"), tsCol.as("__ts"), tieBreak.as("__tb"),
        stateCol.as("state"))
      .withColumn("__prev", lag(col("state"), 1).over(byT))
      .filter(col("__prev").isNull || col("__prev") =!= col("state"))
      .withColumn("version", row_number().over(byT).cast("long"))
      .withColumn("effective_to", lead(col("__ts"), 1).over(byT))
      .select(col("__k").as(key), col("version"), col("state"),
        col("__ts").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"))
  }

  /** Incremental SCD2 maintenance: fold a delta changelog into an
    * existing dimension built by [[scd2]]. Keys untouched by the delta
    * keep their stored interval rows verbatim; affected keys recompute
    * from their RAW base events plus the delta.
    *
    * Raw re-read is load-bearing, not a shortcut skipped: a late delta
    * event can SPLIT an existing run (base A@10,A@40 + late B@30 must
    * yield A[10,30) B[30,40) A[40,∞)), and the collapsed dim only
    * remembers the run's first event — reconstructing the changelog
    * from dim rows would lose the A@40 reopening and emit B[30,∞).
    * The spec pins exactly this case.
    *
    * Scale shape: the delta's key set drives one semi join (recompute
    * cohort) and one anti join (carry-over cohort), both hashed on the
    * dimension key; the scd2 re-run sorts only the affected keys'
    * events. With a key-partitioned base table the semi join prunes to
    * affected partitions — refresh cost tracks the delta, not history.
    */
  def scd2Merge(dimBase: DataFrame, baseEvents: DataFrame, delta: DataFrame,
                key: String, tsCol: Column, stateCol: Column,
                tieBreak: Column): DataFrame = {
    val affected = delta.select(col(key)).distinct()
    val untouched = dimBase.join(affected, Seq(key), "left_anti")
    val recomputed = scd2(
      baseEvents.join(affected, Seq(key), "left_semi").unionByName(delta),
      key, tsCol, stateCol, tieBreak)
    untouched.unionByName(recomputed)
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
