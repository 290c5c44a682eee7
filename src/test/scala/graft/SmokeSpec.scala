package graft
class SmokeSpec extends SparkSpec {
  test("driver contract: entry returns rows; registries aligned") {
    SparkEntry.entry(spark).count() should be > 0L
    // every oracle key has a query; every query has an oracle
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    (o -- q) shouldBe empty
    (q -- o) shouldBe empty
    q.size should be >= 148
  }
}
