package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bloom, Metrics}

/** Locks RELATIVE traffic claims with measured executed-plan metrics —
  * the point of the scale patterns is what they keep OFF the wire, and
  * that is a number, not a code-review opinion.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("measure reports scan rows and shuffle traffic for a keyed agg") {
    val m = Metrics.measure(
      Tables.orders(spark, sf).groupBy($"o_orderpriority").agg(count(lit(1)).as("n")))
    val nOrders = Tables.orders(spark, sf).count()
    m.scanRows shouldBe nOrders
    // partial agg collapses to ≤ |priorities| rows per input partition
    m.shuffleRows should be > 0L
    m.shuffleRows should be < nOrders
  }

  test("bloom pre-gate shuffles fewer fact rows than the plain shuffle join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sf)
      val dim = Tables.customer(spark, sf)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")

      val plain = Metrics.measure(
        orders.join(dim, $"o_custkey" === $"c_custkey")
          .groupBy($"o_orderpriority").agg(count(lit(1)).as("n")))
      val pruned = Metrics.measure(
        Bloom.prunedJoin(orders, dim, "o_custkey", "c_custkey", 10000L)
          .groupBy($"o_orderpriority").agg(count(lit(1)).as("n")))

      // ~4/5 of orders belong to other segments and must not reach the
      // join exchange once the gate is in place.
      pruned.shuffleRows should be < plain.shuffleRows
      pruned.shuffleRows.toDouble should be < plain.shuffleRows * 0.6
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("broadcast join reports build-side bytes, no fact-side shuffle") {
    val m = Metrics.measure(
      Tables.orders(spark, sf)
        .join(broadcast(Tables.customer(spark, sf).select($"c_custkey")),
          $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n")))
    m.broadcastBytes should be > 0L
    // only the partial-agg rows shuffle, never the joined fact rows
    m.shuffleRows should be < 100L
  }
}
