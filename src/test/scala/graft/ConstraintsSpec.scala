package graft

import graft.ops.Constraints

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("validate counts null, range, regex, and uniqueness violations") {
    val df = Seq(
      (Some(1L), 5.0, "A"),
      (Some(1L), 5.0, "A"),   // duplicate key
      (None, 10.0, "R"),      // null id
      (Some(3L), 99.0, "N"),  // out of range
      (Some(4L), Double.NaN, "X") // NaN fails range (NULL-ish), bad flag
    ).toDF("id", "qty", "flag")

    val out = Constraints.validate(df,
        Seq(
          Constraints.notNull("id"),
          Constraints.inRange("qty", 1.0, 50.0),
          Constraints.matches("flag", "^[ANR]$")),
        uniqueKeys = Seq(Seq("id")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    out("not_null(id)") shouldBe ((1L, false))
    out("range(qty,1.0,50.0)") shouldBe ((2L, false)) // 99.0 and NaN
    out("matches(flag)") shouldBe ((1L, false))
    // 5 rows, distinct ids = {1, null, 3, 4} → 1 duplicate
    out("unique(id)") shouldBe ((1L, false))
  }

  test("references counts orphaned and null foreign keys") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val out = Constraints.references(fact, "fk", dim, "pk")
      .as[(String, Long, Boolean)].head()
    out shouldBe (("references(fk->pk)", 2L, false)) // 9 and NULL
  }

  test("a clean table reports every constraint ok") {
    val df = Seq((1L, 5.0, "A"), (2L, 7.5, "R")).toDF("id", "qty", "flag")
    val out = Constraints.validate(df,
        Seq(Constraints.notNull("id"), Constraints.inRange("qty", 1.0, 50.0)),
        uniqueKeys = Seq(Seq("id")))
      .as[(String, Long, Boolean)].collect()
    all(out.map(_._3)) shouldBe true
    all(out.map(_._2)) shouldBe 0L
  }
}
