package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The SQL surface must reach the same custom kernels as the DataFrame
  * API (GraftExtensions injectFunction registrations).
  */
class ExtensionsSpec extends SparkSpec {

  test("SQL hash60 equals the DataFrame-API expression") {
    import spark.implicits._
    val viaSql = spark.sql("SELECT hash60('binance') AS h")
      .collect().head.getLong(0)
    val viaApi = Seq("binance").toDF("s")
      .select(TextOps.hash60(col("s"))).collect().head.getLong(0)
    viaSql shouldBe viaApi
  }

  test("SQL shingles generator emits word n-grams in LATERAL VIEW position") {
    val rows = spark.sql(
      """SELECT sh FROM (SELECT 'a b c d' AS t)
        |LATERAL VIEW shingles(t, 3) g AS sh""".stripMargin)
      .collect().map(_.getString(0))
    rows.toSeq shouldBe Seq("a b c", "b c d")
  }

  test("shingles rejects a non-literal n at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingles('a b c', length('xx'))").collect()
    }
    e.getMessage should include("LITERAL")
  }

  test("SQL nfc composes decomposed forms; normalized dedup catches byte-variant dups") {
    import spark.implicits._
    // decomposed "e"+combining-acute (U+0301) vs precomposed U+00E9:
    // different bytes, equal after NFC.
    val decomposed = "Cafe\u0301"
    val precomposed = "Caf\u00e9"
    spark.sql(s"SELECT nfc('$decomposed') = '$precomposed' AS eq")
      .collect().head.getBoolean(0) shouldBe true
    // The dedup pipeline misses the pair without normalization and
    // finds it with - the reason normalizeText exists.
    val docs = Seq((1L, decomposed + " au lait"), (2L, precomposed + " au lait"))
      .toDF("id", "text")
    graft.ops.Dedup.exactGroups(docs, "id", "text").count() shouldBe 0L
    val normalized = docs.withColumn("text", TextOps.normalizeText(col("text")))
    graft.ops.Dedup.exactGroups(normalized, "id", "text").count() shouldBe 1L
  }

  test("SQL vec_dot / vec_cosine equal the DataFrame-API expressions") {
    val row = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c""".stripMargin)
      .collect().head
    row.getDouble(0) shouldBe 11.0
    row.getDouble(1) shouldBe 1.0
  }

  test("SQL zorder_key equals the kernel") {
    spark.sql("SELECT zorder_key(3L, 5L) AS z").collect().head.getLong(0) shouldBe
      graft.functions.ZOrderImpl.interleave(3L, 5L)
  }
}
