package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowFormulation(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rank", row_number().over(
        Window.partitionBy($"g").orderBy($"v".desc, $"id")).cast("int"))
      .filter($"rank" <= k)
      .select($"g", $"rank", $"id", $"v")

  test("topKPerGroup matches the window formulation, ties and small groups included") {
    // deterministic pseudo-random data with duplicate values (ties) and
    // groups smaller than k
    val rows = for (i <- 0 until 500) yield {
      val g = s"g${i % 7}"
      val v = ((i * 2654435761L) % 40).toDouble // many ties
      (g, v, i.toLong)
    }
    val df = (rows ++ Seq(("tiny", 1.0, 9001L))).toDF("g", "v", "id")
      .repartition(5) // force multi-partition partial buffers + merge()
    val got = TopK.topKPerGroup(df, "g", $"v", $"id", 4, "v", "id")
      .select($"g", $"rank", $"id", $"v").collect().toSet
    val want = windowFormulation(df, 4).collect().toSet
    got shouldBe want
    got.count(_.getString(0) == "tiny") shouldBe 1 // group smaller than k
  }

  test("the aggregate partial-applies before the exchange") {
    val df = Seq(("a", 1.0, 1L)).toDF("g", "v", "id")
    val p = TopK.topKPerGroup(df, "g", $"v", $"id", 3, "v", "id")
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate with a partial mode instance = losers are
    // dropped map-side; the exchange carries k-bounded buffers.
    p should include("ObjectHashAggregate")
    p should include("partial")
  }

  test("merge truncates at k and preserves best-first order") {
    val agg = new TopK.TopKAgg(3)
    val x = Array((9.0, 1L), (7.0, 2L))
    val y = Array((8.0, 3L), (7.0, 1L), (1.0, 9L))
    agg.merge(x, y).toSeq shouldBe Seq((9.0, 1L), (8.0, 3L), (7.0, 1L))
  }
}
