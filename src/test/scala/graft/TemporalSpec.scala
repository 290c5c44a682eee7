package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** Semantics + plan-shape checks for the temporal operators, against
  * independent naive Spark formulations (the oracle SQL cross-checks the
  * same semantics against DuckDB; these specs pin edge cases the sf
  * tables may not exercise: ties, unmatched rows, exact boundaries).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // (key, us, id) fixtures with deliberate ties and boundary hits.
  private lazy val trades = Seq(
    (1L, 100L, 10L), (1L, 200L, 11L), (1L, 50L, 12L), // 50: before any quote
    (2L, 100L, 20L),                                  // ties a quote exactly
    (3L, 500L, 30L)                                   // key with no quotes
  ).toDF("k", "us", "id")
  private lazy val quotes = Seq(
    (1L, 60L, 100L), (1L, 100L, 101L), (1L, 100L, 102L), // tie at 100: max id wins
    (1L, 150L, 103L),
    (2L, 100L, 200L), (2L, 101L, 201L)
  ).toDF("k", "us", "qid")

  private def asof() = Temporal.asOfJoin(
    trades, quotes, "k", leftTs = $"us", rightTs = $"us",
    leftCols = Seq("id", "us"), payloadCols = Seq($"qid"),
    payloadNames = Seq("quote_id"), rightOrder = $"qid")

  test("asOfJoin: inclusive at-or-before, max-(ts,id) tie-break, left semantics") {
    val got = asof().select("id", "quote_id").as[(Long, Option[Long])]
      .collect().toMap
    got shouldBe Map(
      10L -> Some(102L), // quote at exactly 100 counts; id 102 beats 101
      11L -> Some(103L),
      12L -> None,       // earliest quote is at 60 > 50
      20L -> Some(200L), // 101-quote is after the trade
      30L -> None)       // no quotes for key 3 at all
  }

  test("asOfJoinTolerance: stale matches go NULL, the boundary gap is inclusive") {
    val got = Temporal.asOfJoinTolerance(
      trades, quotes, "k", leftTs = $"us", rightTs = $"us",
      leftCols = Seq("id", "us"), payloadCols = Seq($"qid"),
      payloadNames = Seq("quote_id"), rightOrder = $"qid",
      tolerance = 50L)
      .select("id", "quote_id").as[(Long, Option[Long])].collect().toMap
    got shouldBe Map(
      10L -> Some(102L), // gap 0 ≤ 50: kept
      11L -> Some(103L), // gap 200−150 = 50: exactly at tolerance — kept
      12L -> None,       // no at-or-before quote at all
      20L -> Some(200L), // gap 0
      30L -> None)
    // Tightening the tolerance drops the boundary match but nothing else.
    val tight = Temporal.asOfJoinTolerance(
      trades, quotes, "k", leftTs = $"us", rightTs = $"us",
      leftCols = Seq("id", "us"), payloadCols = Seq($"qid"),
      payloadNames = Seq("quote_id"), rightOrder = $"qid",
      tolerance = 49L)
      .select("id", "quote_id").as[(Long, Option[Long])].collect().toMap
    tight(11L) shouldBe None   // 50 > 49: the picked match is stale
    tight(10L) shouldBe Some(102L)
  }

  test("asOfJoin agrees with the naive join+row_number formulation") {
    val naive = trades.alias("t")
      .join(quotes.alias("q"), $"q.k" === $"t.k" && $"q.us" <= $"t.us", "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"t.id").orderBy($"q.us".desc_nulls_last, $"q.qid".desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"t.id", $"q.qid".as("quote_id"))
    val a = asof().select("id", "quote_id").collect().toSet
    naive.collect().toSet shouldBe a
  }

  test("asOfJoin plans one hash exchange and zero join nodes") {
    val p = asof().queryExecution.executedPlan.toString
    p.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
    p should not include "Join"
  }

  test("intervalJoin: half-open (t, t+W] window, bucket-boundary pairs kept once") {
    val left = Seq((1L, 0L, 1L), (1L, 95L, 2L), (2L, 10L, 3L)).toDF("k", "us", "lid")
    // W=100: anchors at 0 reach (0,100]; 95 reaches (95,195] across buckets.
    val right = Seq(
      (1L, 0L, 50L),   // ts == anchor: excluded (strict >)
      (1L, 100L, 51L), // exactly t+W for anchor 0: included
      (1L, 101L, 52L), // just past anchor-0's window, inside anchor-95's
      (1L, 196L, 53L), // past both
      (2L, 200L, 54L)  // wrong window
    ).toDF("k", "us", "rid")
    val got = Temporal.intervalJoin(left, right, "k",
        $"us", $"us", 100L,
        leftOut = Seq("lid" -> $"lid"), rightOut = Seq("rid" -> $"rid"))
      .select($"lid", $"rid", $"delta_us").as[(Long, Long, Long)].collect().toSet
    got shouldBe Set((1L, 51L, 100L), (2L, 51L, 5L), (2L, 52L, 6L))
  }

  test("intervalJoin agrees with the naive cross formulation") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"))
    val clicks = e.filter($"event_type" === "click")
    val errors = e.filter($"event_type" === "error")
    val w = 3600L * 1000000
    val naive = clicks.alias("c").join(errors.alias("r"),
        $"r.user_id" === $"c.user_id" && $"r.us" > $"c.us" && $"r.us" <= $"c.us" + w)
      .select($"c.event_id", $"r.event_id").as[(Long, Long)].collect().toSet
    val got = Temporal.intervalJoin(clicks, errors, "user_id", $"us", $"us", w,
        leftOut = Seq("cid" -> $"event_id"), rightOut = Seq("rid" -> $"event_id"))
      .select($"cid", $"rid").as[(Long, Long)].collect().toSet
    got shouldBe naive
    got should not be empty
  }

  test("sessionize: gap splits, singleton sessions, inclusive boundary gap") {
    val ev = Seq(
      (1L, 0L), (1L, 10L), (1L, 20L),   // one session (gap 10 <= 10)
      (1L, 31L),                        // gap 11 > 10: new session
      (2L, 5L)                          // singleton
    ).toDF("k", "us")
    val got = Temporal.sessionize(ev, "k", $"us", 10L)
      .select($"k", $"session_id", $"n_events", $"start_us", $"end_us", $"duration_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    got shouldBe Set(
      (1L, 1L, 3L, 0L, 20L, 20L),
      (1L, 2L, 1L, 31L, 31L, 0L),
      (2L, 1L, 1L, 5L, 5L, 0L))
  }

  test("resampleBars: open/close by (ts, id) order, deterministic on ts ties") {
    val ev = Seq(
      // bucket 0 (us 0..99): ts tie at 10 — lower id (1, v=7.5) wins open
      ("a", 10L, 2L, 5.25), ("a", 10L, 1L, 7.5), ("a", 90L, 3L, 1.0),
      // bucket 1: single event — open == close == lo == hi
      ("a", 150L, 4L, 3.0),
      ("b", 20L, 5L, 9.0), ("b", 80L, 6L, 2.0)
    ).toDF("g", "us", "id", "v")
    val got = Temporal.resampleBars(ev, Seq("g"), $"us", $"v", $"id", 100L)
      .select($"g", $"bucket", $"open", $"close", $"lo", $"hi", $"n_events", $"volume")
      .as[(String, Long, Double, Double, Double, Double, Long, Double)]
      .collect().toSet
    got shouldBe Set(
      ("a", 0L, 7.5, 1.0, 1.0, 7.5, 3L, 13.75),
      ("a", 1L, 3.0, 3.0, 3.0, 3.0, 1L, 3.0),
      ("b", 0L, 9.0, 2.0, 2.0, 9.0, 2L, 11.0))
  }

  test("resampleBars partial-aggregates before the shuffle (no window sort of events)") {
    val ev = Seq(("a", 10L, 1L, 1.0)).toDF("g", "us", "id", "v")
    val p = Temporal.resampleBars(ev, Seq("g"), $"us", $"v", $"id", 100L)
      .queryExecution.executedPlan.toString
    p should include("partial_min_by")
    p should not include "Window"
  }

  test("asOfJoinForward: inclusive at-or-after, min-(ts,id) tie-break") {
    val got = Temporal.asOfJoinForward(
        trades, quotes, "k", leftTs = $"us", rightTs = $"us",
        leftCols = Seq("id", "us"), payloadCols = Seq($"qid"),
        payloadNames = Seq("quote_id"), rightOrder = $"qid")
      .select("id", "quote_id").as[(Long, Option[Long])]
      .collect().toMap
    got shouldBe Map(
      10L -> Some(101L), // quotes AT 100 count; tie → MIN qid 101
      11L -> None,       // no quote at/after 200 for key 1... except 150<200: none
      12L -> Some(100L), // earliest quote ≥ 50 is at 60
      20L -> Some(200L), // exact-time quote matches forward too
      30L -> None)       // keyless
  }

  test("gapFillDaily: densifies each key's own span and forward-fills values") {
    val obs = Seq(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-01", 20.0), // two obs → avg 15
      ("a", "2024-01-04", 40.0),
      ("b", "2024-02-10", 7.0) // single-day key: grid of one, nothing filled
    ).toDF("k", "day", "v").withColumn("day", to_date($"day"))
    val got = Temporal.gapFillDaily(obs, "k", $"day", $"v")
      .select($"k", date_format($"day", "yyyy-MM-dd").as("day"),
        $"was_filled", $"v", $"n_obs")
      .as[(String, String, Boolean, Double, Long)].collect().toSet
    got shouldBe Set(
      ("a", "2024-01-01", false, 15.0, 2L),
      ("a", "2024-01-02", true, 15.0, 0L), // gap day carries the last value
      ("a", "2024-01-03", true, 15.0, 0L),
      ("a", "2024-01-04", false, 40.0, 1L),
      ("b", "2024-02-10", false, 7.0, 1L)) // b's grid never extends to a's span
  }

  test("funnel: strict step order, inclusive same-timestamp advance, wait sums") {
    val ev = Seq(
      // u1 completes A→B→B→C; first B at 20 counts, second-B later ignored
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 60L, "B"), (1L, 30L, "C"),
      // u2 has B BEFORE its first A — that B must not count; no B after
      (2L, 50L, "B"), (2L, 70L, "A"),
      // u3: B at exactly its A timestamp advances (inclusive >=)
      (3L, 5L, "A"), (3L, 5L, "B"),
      // u4 never does A: contributes to no step
      (4L, 1L, "B"), (4L, 2L, "C")
    ).toDF("k", "us", "et")
    val got = Temporal.funnel(ev, "k", $"us", $"et", Seq("A", "B", "C"))
      .as[(Int, String, Long, Long)].collect().toSet
    got shouldBe Set(
      (1, "A", 3L, 0L),          // u1, u2, u3
      (2, "B", 2L, 10L + 0L),    // u1 waits 10, u3 waits 0; u2 filtered
      (3, "C", 1L, 10L))         // u1: C at 30, reached B at 20
  }

  test("cohortRetention: cohorts are per-key first weeks, offsets in whole weeks") {
    val acts = Seq(
      // k1 first active Mon 2024-01-01 week; again 2 weeks later
      ("k1", "2024-01-02"), ("k1", "2024-01-16"),
      // k2 same cohort week (activity on Sunday the 7th), never returns
      ("k2", "2024-01-07"),
      // k3 a later cohort
      ("k3", "2024-01-10")
    ).toDF("k", "day").withColumn("day", to_date($"day"))
    val got = Temporal.cohortRetention(acts, "k", $"day")
      .select(date_format($"cohort_week", "yyyy-MM-dd").as("cw"),
        $"week_offset", $"n_users")
      .as[(String, Long, Long)].collect().toSet
    got shouldBe Set(
      ("2024-01-01", 0L, 2L), // k1 + k2 in the Jan-1 cohort's own week
      ("2024-01-01", 2L, 1L), // only k1 returns (offset 2 weeks)
      ("2024-01-08", 0L, 1L)) // k3's own cohort
  }

  test("scd2: collapses same-state runs, versions, open current row") {
    val log = Seq(
      (1L, 10L, 100L, "bronze"), (1L, 20L, 101L, "bronze"), // run collapses
      (1L, 30L, 102L, "silver"),
      (1L, 40L, 103L, "bronze"), // back to bronze → NEW version, not merged
      (2L, 5L, 200L, "gold")
    ).toDF("k", "us", "id", "tier")
    val got = Temporal.scd2(log, "k", $"us", $"tier", $"id")
      .as[(Long, Long, String, Long, Option[Long], Boolean)].collect().toSet
    got shouldBe Set(
      (1L, 1L, "bronze", 10L, Some(30L), false),
      (1L, 2L, "silver", 30L, Some(40L), false),
      (1L, 3L, "bronze", 40L, None, true),
      (2L, 1L, "gold", 5L, None, true))
  }

  test("point-in-time (as-of vs scd2 dim) equals the interval-containment join") {
    val log = Seq(
      (1L, 10L, 100L, "s1"), (1L, 30L, 101L, "s2"), (1L, 50L, 102L, "s3"),
      (2L, 5L, 200L, "t1")
    ).toDF("k", "us", "id", "st")
    val dim = Temporal.scd2(log, "k", $"us", $"st", $"id")
    val facts = Seq((1L, 10L, 900L), (1L, 29L, 901L), (1L, 30L, 902L),
      (1L, 99L, 903L), (2L, 6L, 904L)).toDF("k", "us", "fid")
    val viaAsOf = Temporal.asOfJoin(facts, dim, "k",
        leftTs = $"us", rightTs = $"effective_from",
        leftCols = Seq("fid", "us"),
        payloadCols = Seq($"state", $"version"),
        payloadNames = Seq("state", "version"), rightOrder = $"version")
      .select("fid", "state", "version")
    val naive = facts.alias("f").join(dim.alias("d"),
        $"d.k" === $"f.k" && $"d.effective_from" <= $"f.us" &&
          ($"d.effective_to".isNull || $"f.us" < $"d.effective_to"))
      .select($"f.fid", $"d.state", $"d.version")
    viaAsOf.collect().toSet shouldBe naive.collect().toSet
    viaAsOf.as[(Long, String, Long)].collect().toSet shouldBe Set(
      (900L, "s1", 1L), // boundary: fact AT the interval start
      (901L, "s1", 1L),
      (902L, "s2", 2L), // fact exactly at the next version's start
      (903L, "s3", 3L), // open current interval
      (904L, "t1", 1L))
  }

  test("scd2Merge == full rebuild, including a late event splitting an existing run") {
    // base: user 1 has A@10, A@40 (ONE collapsed run A[10,∞)); user 2 untouched
    val base = Seq(
      (1L, 10L, 100L, "A"), (1L, 40L, 101L, "A"),
      (2L, 5L, 200L, "X")
    ).toDF("k", "us", "id", "st")
    // delta: LATE B@30 lands inside user 1's run and must split it —
    // only recomputing from raw base events can resurrect the A@40 edge
    val delta = Seq((1L, 30L, 300L, "B")).toDF("k", "us", "id", "st")
    val dimBase = Temporal.scd2(base, "k", $"us", $"st", $"id")
    val merged = Temporal.scd2Merge(dimBase, base, delta, "k", $"us", $"st", $"id")
      .as[(Long, Long, String, Long, Option[Long], Boolean)].collect().toSet
    val full = Temporal.scd2(base.unionByName(delta), "k", $"us", $"st", $"id")
      .as[(Long, Long, String, Long, Option[Long], Boolean)].collect().toSet
    merged shouldBe full
    merged shouldBe Set(
      (1L, 1L, "A", 10L, Some(30L), false),
      (1L, 2L, "B", 30L, Some(40L), false),
      (1L, 3L, "A", 40L, None, true), // the resurrected reopening
      (2L, 1L, "X", 5L, None, true))  // untouched key carried verbatim
  }

  test("overlapJoin: multi-bucket pairs exactly once, touching/disjoint/zero-length edges") {
    // grid = 10. Left interval [5, 35) spans buckets 0..3.
    val left = Seq(
      (1L, 5L, 35L, 100L),  // wide: overlaps rid=200 and rid=201
      (1L, 60L, 61L, 101L), // disjoint from everything
      (2L, 7L, 7L, 102L)    // zero-length: [7,7) is empty, overlaps nothing
    ).toDF("k", "s", "e", "lid")
    val right = Seq(
      (1L, 25L, 50L, 200L), // overlaps lid=100 in [25,35) across buckets 2,3
      (1L, 0L, 6L, 201L),   // overlaps lid=100 in [5,6)
      (1L, 35L, 40L, 202L), // touches lid=100 at 35 (half-open): NO overlap
      (2L, 0L, 20L, 203L)   // covers lid=102's point, but [7,7) ∩ it is empty
    ).toDF("k", "s", "e", "rid")
    val got = Temporal.overlapJoin(left, right, "k",
        lStart = $"s", lEnd = $"e", rStart = $"s", rEnd = $"e", gridUs = 10L,
        leftOut = Seq("lid" -> $"lid"), rightOut = Seq("rid" -> $"rid"))
      .select("lid", "rid", "overlap_us")
      .as[(Long, Long, Long)].collect().toSeq
    // each true pair appears EXACTLY once despite sharing several buckets
    got.sorted shouldBe Seq((100L, 200L, 10L), (100L, 201L, 1L))
    val naive = left.alias("l").join(right.alias("r"),
        $"l.k" === $"r.k" &&
          greatest($"l.s", $"r.s") < least($"l.e", $"r.e"))
      .select($"lid", $"rid",
        (least($"l.e", $"r.e") - greatest($"l.s", $"r.s")).as("o"))
      .as[(Long, Long, Long)].collect().toSeq
    got.sorted shouldBe naive.sorted
  }

  test("overlapJoin equals the naive join on 400 random interval pairs, several grids") {
    val rnd = new scala.util.Random(20260813) // fixed seed: deterministic case set
    def mk(n: Int, tag: Long) = Seq.tabulate(n) { i =>
      val k = rnd.nextInt(6).toLong
      val s0 = rnd.nextInt(500).toLong
      (k, s0, s0 + rnd.nextInt(60).toLong, tag * 1000 + i) // zero-length included
    }.toDF("k", "s", "e", "id")
    val (l, r) = (mk(20, 1L), mk(20, 2L))
    val naive = l.alias("l").join(r.alias("r"),
        $"l.k" === $"r.k" && greatest($"l.s", $"r.s") < least($"l.e", $"r.e"))
      .select($"l.id".as("lid"), $"r.id".as("rid"),
        (least($"l.e", $"r.e") - greatest($"l.s", $"r.s")).as("o"))
      .as[(Long, Long, Long)].collect().toSet
    for (grid <- Seq(7L, 10L, 64L, 500L)) {
      val got = Temporal.overlapJoin(l, r, "k", $"s", $"e", $"s", $"e", grid,
          leftOut = Seq("lid" -> $"id"), rightOut = Seq("rid" -> $"id"))
        .select("lid", "rid", "overlap_us")
        .as[(Long, Long, Long)].collect()
      withClue(s"grid=$grid: ") {
        got.length shouldBe got.toSet.size // no duplicate pair under any grid
        got.toSet shouldBe naive
      }
    }
  }

  test("scd2 plans exactly one exchange and one sort for all three windows") {
    val log = Seq((1L, 10L, 100L, "a")).toDF("k", "us", "id", "tier")
    val plan = Temporal.scd2(log, "k", $"us", $"tier", $"id")
      .queryExecution.executedPlan.toString
    plan.split("Exchange hashpartitioning").length - 1 shouldBe 1
    // one sort node feeding the window family (LocalTableScan inputs
    // may add a zero exchange for the scan itself, never a second sort)
    plan.split("\\[Sort ").length - 1 should be <= 2
  }
}
