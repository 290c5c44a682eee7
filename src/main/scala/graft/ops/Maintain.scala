package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental materialized-aggregate maintenance: keep a per-key
  * aggregate table current by merging the aggregate of ONLY the new
  * partition into the stored aggregate state, instead of rescanning
  * the full history (availability_db.py's daily-refresh summary is the
  * reference shape; at 100 TB the rescan is the difference between a
  * 2-minute and a 2-hour refresh).
  *
  * The state carried per key is the classic mergeable partial: COUNT
  * plus an exact DECIMAL sum (see [[Exact]] — decimal, not double, so
  * the merge is associative to the bit and the maintained table never
  * drifts from a full recompute, which is also what makes the
  * invariant `merge(agg(base), agg(delta)) == agg(base ∪ delta)`
  * oracle-checkable). Finalized columns (double total, average) are
  * DERIVED on read, never stored — deriving from exact state is what
  * keeps repeated merges from accumulating float error.
  */
object Maintain {
  private val Dec = DecimalType(18, 2)

  /** Aggregate a slice into mergeable per-key state:
    * (keys..., cnt, sum_dec).
    */
  def countSumState(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(value).as("cnt"), sum(value.cast(Dec)).as("sum_dec"))

  /** Merge any number of state tables: union + re-aggregate — the same
    * algebra Spark's own partial aggregation uses, so it is associative
    * and commutative by construction. One keyed shuffle over the
    * (small) state tables, never over raw facts.
    */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_dec")).as("sum_dec"))
  }

  /** Finalize state into presentation columns: exact double total and
    * average (both derived from the decimal sum, so bit-stable).
    */
  def finalizeCountSum(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("cnt"),
      col("sum_dec").cast(DoubleType).as("total"),
      (col("sum_dec").cast(DoubleType) / col("cnt")).as("avg_value")): _*)

  /** Golden-record survivorship merge: collapse each key's records into
    * one best row — the most recent attribute value, lifetime stats,
    * and the modal category (ties broken lexicographically, so
    * the survivor is deterministic). The multi-source entity-resolution
    * endgame: after matching, SOMETHING must pick the surviving field
    * values.
    *
    * Scale shape: the recency/stats pass is one keyed aggregation with
    * `max_by` over the unique (ts, tieBreak) order — map-side partial,
    * no window sort of raw records. The modal pass aggregates
    * (key, category) then takes per-key rank 1; its window input is one
    * row per distinct category per key, not per record.
    */
  def goldenRecord(df: DataFrame, key: String, ts: Column, tieBreak: Column,
                   attr: Column, category: Column, value: Column): DataFrame = {
    val ord = struct(ts.as("ts"), tieBreak.as("tb"))
    val base = df.groupBy(col(key)).agg(
      max_by(attr, ord).as("latest_attr"),
      min(ts).as("first_us"),
      max(ts).as("last_us"),
      count(lit(1)).as("n_events"),
      coalesce(Exact.sum2(value), lit(0).cast(DoubleType)).as("ltv"))
    val modal = df.groupBy(col(key), category.as("top_category"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col("__n").desc, col("top_category"))))
      .filter(col("__rn") === 1)
      .select(col(key), col("top_category"))
    base.join(modal, key)
  }

  /** CDC changelog materialization — apply a Debezium-shaped change
    * stream (op ∈ I/U/D with a per-key monotone sequence) into final
    * table state: the latest change per key wins, and a key whose
    * latest op is D vanishes (an I arriving AFTER a D resurrects it —
    * upsert-with-tombstone semantics, the snapshot rule every
    * lakehouse MERGE implements).
    *
    * Scale shape: one keyed aggregation via `max_by` over the
    * (seq, tieBreak) order — partial aggregation collapses each key's
    * history map-side, so the shuffle carries one candidate row per
    * (key × partition), never the changelog. A window formulation
    * (row_number over seq DESC) would shuffle and sort every change
    * row; at 100 TB of changelog that difference is the job.
    *
    * `tieBreak` must make (seq, tieBreak) unique per key or the
    * surviving row is nondeterministic.
    */
  def applyCdc(changelog: DataFrame, key: String, seq: Column,
               tieBreak: Column, op: Column,
               payload: Seq[String]): DataFrame = {
    val last = changelog.groupBy(col(key)).agg(
      max_by(struct(op.as("__op") +: payload.map(col): _*),
        struct(seq.as("s"), tieBreak.as("tb"))).as("__last"))
    last.filter(last("__last.__op") =!= "D")
      .select(col(key) +: payload.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** [[applyCdc]]'s STATE-CARRYING sibling for incremental / streamed
    * application: returns the winning change per key INCLUDING the D
    * tombstones, with the winning (seq, op) preserved — the frame a
    * CDC follower persists as its state and unions with the next
    * batch unchanged. Feeding the stored seq back (instead of
    * re-seeding the state at seq 0 every batch) is what makes the
    * apply ORDER-INDEPENDENT: a late batch carrying an older seq for
    * an already-deleted key loses to the persisted tombstone instead
    * of resurrecting the row. Final table state is
    * `filter(op <> 'D')` over this frame; tombstones accumulate by
    * design (one row per deleted key) and are purged by compaction
    * once the feed's low-watermark passes their seq.
    *
    * Same scale shape as [[applyCdc]]: one map-side-combined `max_by`
    * per key; the shuffle carries one candidate row per
    * (key × partition), never the changelog.
    */
  def applyCdcState(changelog: DataFrame, key: String, seqCol: String,
                    tieBreak: Column, opCol: String,
                    payload: Seq[String]): DataFrame = {
    val last = changelog.groupBy(col(key)).agg(
      max_by(
        struct(col(seqCol).as("__seq") +: col(opCol).as("__op") +:
          payload.map(col): _*),
        struct(col(seqCol).as("s"), tieBreak.as("tb"))).as("__last"))
    last.select(col(key) +: col("__last.__seq").as(seqCol) +:
      col("__last.__op").as(opCol) +:
      payload.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** CDC EXTRACTION — [[applyCdc]]'s inverse: diff two snapshots of a
    * keyed table into the minimal I/U/D changelog that transforms
    * `before` into `after` (the change-data-feed a lakehouse emits so
    * downstream consumers can incrementally follow a table they cannot
    * re-scan). Round-trip law, pinned by MaintainSpec:
    * `applyCdc(old ∪ diffToCdc(before, after)) == after`.
    *
    * One full-outer join on the key; the row-equality test compares the
    * payload structs (null-safe), so an unchanged row emits nothing —
    * the changelog is proportional to the CHANGE, not the table.
    */
  def diffToCdc(before: DataFrame, after: DataFrame, key: String,
                payload: Seq[String]): DataFrame = {
    val b = before.select(col(key).as("__kb"),
      struct(payload.map(col): _*).as("__pb"))
    val a = after.select(col(key).as("__ka"),
      struct(payload.map(col): _*).as("__pa"))
    b.join(a, col("__kb") === col("__ka"), "full_outer")
      .withColumn("op",
        when(col("__kb").isNull, lit("I"))
          .when(col("__ka").isNull, lit("D"))
          .when(!(col("__pb") <=> col("__pa")), lit("U")))
      .filter(col("op").isNotNull)
      // D carries the last before-image; I/U carry the after-image —
      // selected by op, NOT coalesce, so an update TO null survives.
      .select(coalesce(col("__ka"), col("__kb")).as(key) +: col("op") +:
        payload.map(c =>
          when(col("op") === "D", col(s"__pb.$c"))
            .otherwise(col(s"__pa.$c")).as(c)): _*)
  }

  /** INCREMENTAL JOIN-VIEW maintenance — the join analogue of
    * [[mergeStates]]' aggregate maintenance. For a materialized view
    * V = A ⋈ B and bounded delta batches ΔA, ΔB, the classic delta
    * algebra gives the exact increment
    *
    *   ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * so `V' = V ∪ ΔV` is ROW-IDENTICAL to recomputing
    * (A ∪ ΔA) ⋈ (B ∪ ΔB) from scratch — which at 100 TB is the
    * difference between joining two delta batches against yesterday's
    * bases and re-joining two full bases.
    *
    * The deltas ride a `broadcast` hint: a delta batch is bounded by
    * CONTRACT (one ingest increment, the same boundedness
    * `mergeStates` relies on), so each of the two base-side terms is a
    * map-side hash join — the stored view and both bases are scanned
    * once each and NEVER shuffled. The ΔA ⋈ ΔB corner is delta-sized
    * on both sides.
    *
    * `project` maps each (left, right) row pair to the view's output
    * columns; it must be the same projection that built `baseView`.
    */
  def incrJoinView(baseView: DataFrame, baseA: DataFrame, baseB: DataFrame,
                   deltaA: DataFrame, deltaB: DataFrame,
                   join: (DataFrame, DataFrame) => DataFrame): DataFrame =
    baseView.unionByName(joinViewDelta(baseA, baseB, deltaA, deltaB, join))

  /** Just the increment ΔV of [[incrJoinView]] — the three delta join
    * terms, without the stored view. This is what downstream
    * INCREMENTAL consumers want: an aggregate over the view is
    * maintained by merging `countSumState(joinViewDelta(...))` into its
    * stored state ([[mergeStates]]), so neither the view NOR its
    * aggregate ever recomputes from the bases.
    */
  def joinViewDelta(baseA: DataFrame, baseB: DataFrame,
                    deltaA: DataFrame, deltaB: DataFrame,
                    join: (DataFrame, DataFrame) => DataFrame): DataFrame =
    join(broadcast(deltaA), baseB)
      .unionByName(join(baseA, broadcast(deltaB)))
      .unionByName(join(broadcast(deltaA), deltaB))

  /** SCHEMA-EVOLUTION read: union snapshots whose schemas drifted over
    * time (columns added in later writes), aligning columns BY NAME and
    * null-filling the ones a snapshot predates — the read-side half of
    * additive schema evolution, which at 100 TB is the only kind that
    * doesn't force a rewrite of every historical file. Purely
    * declarative (`unionByName(allowMissingColumns)`): no shuffle, each
    * snapshot scans once with its own pushed-down projection, and the
    * fill is a literal in the scan projection, not a join.
    *
    * Columns present in several snapshots must agree in type; that's
    * the additive-evolution contract (widen/rename are rewrite-class
    * changes and excluded by `unionByName`'s analysis-time error, which
    * is the behavior you want — silent coercion hides corruption).
    */
  def readEvolved(snapshots: Seq[DataFrame]): DataFrame = {
    require(snapshots.nonEmpty, "at least one snapshot")
    snapshots.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
