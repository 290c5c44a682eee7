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

  test("pruneByHashedKeys degrades gracefully when saturated: a filter " +
    "built far under the true cardinality still loses NO matches") {
    val li = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf).select($"o_orderkey")
    val exact = li.join(dim, $"l_orderkey" === $"o_orderkey").count()
    // expectedItems = 1 for thousands of build keys: the filter
    // saturates toward fpp 1 — pruning power gone, correctness intact
    val gated = graft.ops.Bloom
      .pruneByHashedKeys(li, Seq("l_orderkey"), dim, Seq("o_orderkey"),
        expectedItems = 1L, fpp = 0.03)
      .join(dim, $"l_orderkey" === $"o_orderkey").count()
    gated shouldBe exact
  }

  test("triangle Bloom gate cuts the closing-edge join's shuffle to near " +
    "triangle scale, result unchanged") {
    // the q_g10 edge derivation at this SF: parts co-attached to an order
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = li.join(li.withColumnRenamed("p", "p2"), "o")
      .where(col("p") < col("p2"))
      .select(col("p").as("src"), col("p2").as("dst"))
      .localCheckpoint(eager = true) // one fixed edge set for both runs
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the closing-edge join to SHUFFLE on both sides, as it
      // would at 100 TB edge scale, so the wedge-side traffic is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = Metrics.measure(
        graft.ops.Graph.triangleCount(pairs, checkpoint = false, bloomGate = false))
      val gated = Metrics.measure(
        graft.ops.Graph.triangleCount(pairs, checkpoint = false, bloomGate = true))
      gated.shuffleRows should be < plain.shuffleRows
      // most wedges close nothing: the gate must remove the bulk of the
      // wedge stream before its exchange, not shave a few percent
      gated.shuffleRows.toDouble should be < plain.shuffleRows * 0.7
      // and the gate must not change the answer
      val a = graft.ops.Graph.triangleCount(pairs, bloomGate = false)
        .as[(Long, Long)].collect().toMap
      val b = graft.ops.Graph.triangleCount(pairs, bloomGate = true)
        .as[(Long, Long)].collect().toMap
      b shouldBe a
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
