package graft

import java.sql.Date
import graft.ops.Validation

/** Continuity-gap goldens from tests/test_validation/test_continuity.py
  * (FIXTURES.md §3).
  */
class ValidationSpec extends SparkSpec {

  private def observed(dates: String*) = {
    import spark.implicits._
    dates.map(Date.valueOf).toSeq.toDF("event_date")
  }

  test("single gap: rows on {15,17} → gap [16]") {
    val gaps = Validation.continuityGaps(spark,
        observed("2024-01-15", "2024-01-17"), "event_date", "2024-01-15", "2024-01-17")
      .collect().map(_.getDate(0).toString)
    gaps.toSeq shouldBe Seq("2024-01-16")
  }

  test("multiple non-consecutive gaps: {15,17,19} → [16, 18]") {
    val gaps = Validation.continuityGaps(spark,
        observed("2024-01-15", "2024-01-17", "2024-01-19"), "event_date",
        "2024-01-15", "2024-01-19")
      .collect().map(_.getDate(0).toString)
    gaps.toSeq shouldBe Seq("2024-01-16", "2024-01-18")
  }

  test("complete range → no gaps; single-day range → no gaps") {
    Validation.continuityGaps(spark,
      observed("2024-01-15", "2024-01-16", "2024-01-17"), "event_date",
      "2024-01-15", "2024-01-17").count() shouldBe 0
    Validation.continuityGaps(spark,
      observed("2024-01-15"), "event_date", "2024-01-15", "2024-01-15")
      .count() shouldBe 0
  }

  test("incompleteKeys flags groups below the expected count") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("k", "v")
    val out = Validation.incompleteKeys(df, "k", 2L).collect()
    out.length shouldBe 1
    out.head.getString(0) shouldBe "b"
  }

  test("keySetDiff tags only_a / only_b / both") {
    import spark.implicits._
    val a = Seq("x", "y").toDF("k")
    val b = Seq("y", "z").toDF("k")
    val out = Validation.keySetDiff(a, b, "k")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    out shouldBe Set(("x", "only_a"), ("z", "only_b"), ("y", "both"))
  }
}
