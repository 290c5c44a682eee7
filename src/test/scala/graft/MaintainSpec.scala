package graft

import org.apache.spark.sql.functions._
import graft.ops.Maintain

/** Edge semantics for the maintenance operators: merge algebra over
  * disjoint/overlapping key sets, exactness under re-merge, and the
  * golden-record survivorship tie-breaks.
  */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  test("mergeStates over slices equals the full recompute, keys one-sided included") {
    val base = Seq((1L, 10.10), (1L, 0.90), (2L, 5.00)).toDF("k", "v")
    val delta = Seq((2L, 1.25), (3L, 7.75)).toDF("k", "v") // 3 is delta-only
    val merged = Maintain.finalizeCountSum(
      Maintain.mergeStates(Seq(
        Maintain.countSumState(base, Seq("k"), $"v"),
        Maintain.countSumState(delta, Seq("k"), $"v")), Seq("k")), Seq("k"))
    val full = Maintain.finalizeCountSum(
      Maintain.countSumState(base.union(delta), Seq("k"), $"v"), Seq("k"))
    merged.orderBy("k").collect() shouldBe full.orderBy("k").collect()
    merged.as[(Long, Long, Double, Double)].collect().toSet shouldBe Set(
      (1L, 2L, 11.0, 5.5), (2L, 2L, 6.25, 3.125), (3L, 1L, 7.75, 7.75))
  }

  test("repeated re-merge never drifts (decimal state, not float)") {
    val slices = (0 until 10).map(i =>
      Seq((1L, 0.10 + i)).toDF("k", "v")) // 0.1 is inexact in binary
    val state = slices.map(Maintain.countSumState(_, Seq("k"), $"v"))
      // left fold one slice at a time — the worst case for float drift
      .reduce((a, b) => Maintain.mergeStates(Seq(a, b), Seq("k")))
    val got = Maintain.finalizeCountSum(state, Seq("k"))
      .as[(Long, Long, Double, Double)].head()
    got shouldBe ((1L, 10L, 46.0, 4.6)) // exact: 10*0.1 + 0..9 = 46
  }

  test("goldenRecord: recency by (ts, tie), modal category lexicographic tie-break") {
    val e = Seq(
      // user 1: tie at ts=30 — higher event_id (id 5, props "new") wins;
      // category counts A=2, B=2 — tie → 'A' (lexicographically first)
      (1L, 10L, 1L, "old", "A", Some(2.0)),
      (1L, 30L, 4L, "mid", "B", None),
      (1L, 30L, 5L, "new", "B", Some(1.5)),
      (1L, 20L, 2L, "x", "A", None),
      // user 2: single record, null-ish value → ltv 0
      (2L, 7L, 9L, "only", "C", None)
    ).toDF("k", "us", "id", "p", "cat", "v")
    val got = Maintain.goldenRecord(e, "k", $"us", $"id",
        attr = $"p", category = $"cat", value = $"v")
      .select("k", "latest_attr", "first_us", "last_us", "n_events", "ltv", "top_category")
      .as[(Long, String, Long, Long, Long, Double, String)].collect().toSet
    got shouldBe Set(
      (1L, "new", 10L, 30L, 4L, 3.5, "A"),
      (2L, "only", 7L, 7L, 1L, 0.0, "C"))
  }

  test("goldenRecord's recency pass partial-aggregates before the exchange") {
    val e = Seq((1L, 10L, 1L, "p", "A", Some(1.0))).toDF("k", "us", "id", "p", "cat", "v")
    val plan = Maintain.goldenRecord(e, "k", $"us", $"id", $"p", $"cat", $"v")
      .queryExecution.executedPlan.toString
    // max_by/min/max/count run as partial HashAggregate below the
    // shuffle — the reason the stats pass never window-sorts raw rows
    plan should include("partial_max_by")
  }

  test("applyCdc: latest op wins, D tombstones, I-after-D resurrects, input order irrelevant") {
    import spark.implicits._
    import graft.ops.Maintain
    // (key, seq, op, v): k1 plain insert; k2 I→U; k3 I→D (gone);
    // k4 I→D→I (resurrected with the NEW payload); k5 single D (never
    // inserted — still no row).
    val changes = Seq(
      (1L, 1L, "I", "a1"),
      (2L, 1L, "I", "b1"), (2L, 2L, "U", "b2"),
      (3L, 1L, "I", "c1"), (3L, 2L, "D", "c1"),
      (4L, 1L, "I", "d1"), (4L, 2L, "D", "d1"), (4L, 3L, "I", "d3"),
      (5L, 1L, "D", "e1"))
    def run(rows: Seq[(Long, Long, String, String)]) =
      Maintain.applyCdc(rows.toDF("k", "seq", "op", "v"),
          "k", col("seq"), col("seq"), col("op"), Seq("v"))
        .as[(Long, String)].collect().toSet
    val expected = Set((1L, "a1"), (2L, "b2"), (4L, "d3"))
    run(changes) shouldBe expected
    // arrival order must not matter: the aggregation is order-insensitive
    run(scala.util.Random.shuffle(changes)) shouldBe expected
  }

  test("diffToCdc emits the minimal feed and round-trips through applyCdc") {
    import spark.implicits._
    import graft.ops.Maintain
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, null.asInstanceOf[String], 40))
      .toDF("k", "v", "n")
    // 1 unchanged, 2 updated (to NULL — the coalesce trap), 3 deleted,
    // 4 updated, 5 inserted
    val after = Seq((1L, "a", 10), (2L, null.asInstanceOf[String], 20), (4L, "d", 41), (5L, "e", 50))
      .toDF("k", "v", "n")
    val cdc = Maintain.diffToCdc(before, after, "k", Seq("v", "n"))
    val byKey = cdc.as[(Long, String, String, Int)].collect()
      .map(r => r._1 -> r).toMap
    byKey.keySet shouldBe Set(2L, 3L, 4L, 5L) // unchanged key 1 emits nothing
    byKey(2L)._2 shouldBe "U"; byKey(2L)._3 shouldBe null // update TO null survives
    byKey(3L)._2 shouldBe "D"; byKey(3L)._3 shouldBe "c"  // delete carries before-image
    byKey(4L)._2 shouldBe "U"; byKey(5L)._2 shouldBe "I"
    // round-trip law: old-state inserts (seq 0) + the diff (seq 1) == after
    val replay = before.withColumn("seq", lit(0L)).withColumn("op", lit("I"))
      .unionByName(cdc.withColumn("seq", lit(1L)))
    val rebuilt = Maintain.applyCdc(replay, "k", col("seq"), col("seq"),
        col("op"), Seq("v", "n"))
      .as[(Long, String, Int)].collect().toSet
    rebuilt shouldBe after.as[(Long, String, Int)].collect().toSet
  }

  test("readEvolved aligns drifted schemas by name and null-fills, " +
    "in either snapshot order") {
    val v1 = Seq((1L, "a")).toDF("k", "x")
    val v2 = Seq((2L, "b", 42)).toDF("k", "x", "y")
    val fwd = Maintain.readEvolved(Seq(v1, v2))
      .select("k", "x", "y").as[(Long, String, Option[Int])]
      .collect().toSet
    fwd shouldBe Set((1L, "a", None), (2L, "b", Some(42)))
    val rev = Maintain.readEvolved(Seq(v2, v1))
      .select("k", "x", "y").as[(Long, String, Option[Int])]
      .collect().toSet
    rev shouldBe fwd // alignment is by NAME, not by snapshot position
  }

  test("readEvolved refuses a type conflict instead of coercing silently") {
    val v1 = Seq((1L, "a")).toDF("k", "x")
    val v3 = Seq((2L, 9)).toDF("k", "x") // x drifted string -> int
    an[Exception] should be thrownBy
      Maintain.readEvolved(Seq(v1, v3)).collect()
  }

  test("applyCdcState folded over ANY batch split and order equals the " +
    "one-shot batch apply (seeded property)") {
    // a seeded random changelog: 20 keys × up to 6 ops each
    val rnd = new scala.util.Random(42)
    val ops = Seq("I", "U", "D")
    val changelog = (1L to 20L).flatMap { k =>
      (1 to 1 + rnd.nextInt(5)).map { s =>
        (k, s.toLong, ops(rnd.nextInt(3)), s"v$k-$s")
      }
    }
    val full = changelog.toDF("k", "seq", "op", "v")
    val expected = Maintain.applyCdc(full, "k", col("seq"), col("seq"),
        col("op"), Seq("v"))
      .as[(Long, String)].collect().toSet
    // five trials: shuffle the changelog, cut into random batches, fold
    // the state-carrying apply — the final live view must always match
    (1 to 5).foreach { trial =>
      val shuffled = new scala.util.Random(trial).shuffle(changelog)
      var state = Seq.empty[(Long, Long, String, String)]
        .toDF("k", "seq", "op", "v")
      var rest = shuffled
      val r = new scala.util.Random(100 + trial)
      while (rest.nonEmpty) {
        val take = 1 + r.nextInt(math.max(1, rest.size))
        val (batch, tail) = rest.splitAt(take)
        rest = tail
        state = Maintain.applyCdcState(
          state.unionByName(batch.toDF("k", "seq", "op", "v")),
          "k", "seq", col("seq"), "op", Seq("v"))
          .localCheckpoint(eager = true)
      }
      state.filter(col("op") =!= "D").select("k", "v")
        .as[(Long, String)].collect().toSet shouldBe expected
    }
  }
}
