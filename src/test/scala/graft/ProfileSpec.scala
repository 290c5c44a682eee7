package graft

import org.apache.spark.sql.functions._
import graft.ops.Profile

class ProfileSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (3L, null),
      (null, "b"), (2L, "c"))
      .toDF("k", "v")
  }

  test("profile reports nulls, distincts, and min/max per column") {
    val out = Profile.profile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    out("k") shouldBe ((5L, 1L, 3L, "1", "3"))   // distinct over non-null {1,2,3}
    out("v") shouldBe ((5L, 1L, 3L, "a", "c"))   // {a,b,c}
  }

  test("neither profile variant EXPANDs the row stream") {
    // agg(countDistinct(a), countDistinct(b), ...) would plan an Expand
    // that duplicates every input row k+1 ways; the melt (exact) and
    // HLL (approx) formulations must not.
    val exact = Profile.profile(df, Seq("k", "v"))
      .queryExecution.executedPlan.toString
    val approx = Profile.profile(df, Seq("k", "v"), exact = false)
      .queryExecution.executedPlan.toString
    exact should not include "Expand"
    approx should not include "Expand"
  }

  test("approx profile reports HLL estimates (exact here, tiny input)") {
    val out = Profile.profile(df, Seq("k", "v"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    out("k") shouldBe 3L
    out("v") shouldBe 3L
  }

  test("kAnonymize suppresses under-k groups into one pooled row; the " +
    "pool itself must reach k to have its totals released") {
    import spark.implicits._
    // groups: a=5 rows, b=5, c=2, d=1  (k=4: c and d suppress, pool=3 < 4)
    val rows = (Seq.fill(5)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }.toDF("grp", "v")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getString(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          (if (r.isNullAt(2)) -1L else r.getLong(2)), r.getBoolean(3))
      }.toMap
    val k4 = asMap(graft.ops.Profile.kAnonymize(rows, Seq("grp"), 4L))
    // pool of 3 < k: the pool row is SURFACED (suppressed = true) but
    // its totals are withheld as null — not silently vanished
    k4.keySet shouldBe Set("a", "b", "__suppressed__")
    k4("a") shouldBe ((5L, 0L, false))
    k4("__suppressed__") shouldBe ((-1L, -1L, true))
    // k=3: the pool (c+d = 3 rows, 2 groups) reaches k and is released
    val k3 = asMap(graft.ops.Profile.kAnonymize(rows, Seq("grp"), 3L))
    k3("__suppressed__") shouldBe ((3L, 2L, true))
    k3.keySet shouldBe Set("a", "b", "__suppressed__")
    // every released group (pool aside) meets the k floor
    k3.collect { case (g, (n, _, false)) => n }.foreach(_ should be >= 3L)
  }

  test("kAnonymize: a genuine group VALUE equal to the display sentinel " +
    "stays distinguishable from the pool via the suppressed marker") {
    import spark.implicits._
    val rows = (Seq.fill(4)("__suppressed__") ++ Seq.fill(4)("a") ++ Seq("b"))
      .zipWithIndex.map { case (g, i) => (g, i.toLong) }.toDF("grp", "v")
    val out = graft.ops.Profile.kAnonymize(rows, Seq("grp"), 3L).collect()
      .map(r => (r.getString(0), r.getBoolean(3)) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // the genuine '__suppressed__'-valued group survives with its own
    // count and marker false; the pool row (group b, 1 row < k, pool
    // 1 < k → withheld) carries marker true
    out(("__suppressed__", false)) shouldBe 4L
    out(("a", false)) shouldBe 4L
    out(("__suppressed__", true)) shouldBe -1L
    out.size shouldBe 3
  }
}
