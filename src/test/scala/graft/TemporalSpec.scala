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
}
