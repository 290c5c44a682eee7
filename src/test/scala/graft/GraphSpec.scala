package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {

  test("pageRank: star hub outranks leaves, leaves tie exactly") {
    import spark.implicits._
    // 6 leaves ↔ hub 0 (both directions, like the bipartite gate graph)
    val fwd = (1L to 6L).map(l => (l, 0L))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    val hub = out(0L)
    val leaves = (1L to 6L).map(out)
    all(leaves) shouldBe leaves.head // exact integer tie
    hub should be > leaves.head * 3 // hub absorbs every leaf's mass
  }

  test("pageRank: symmetric cycle stays exactly uniform through truncation") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 4).as[(Long, Long)].collect().toMap
    out.values.toSet.size shouldBe 1 // identical floor-division path per node
  }

  test("pageRank is partitioning-invariant and multi-edge-insensitive") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 2L))
    val a = Graph.pageRank(base.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    // duplicated edges + different physical layout must not move a rank
    val b = Graph.pageRank((base ++ base).toDF("src", "dst").repartition(5),
      iters = 3).as[(Long, Long)].collect().toMap
    b shouldBe a
  }

  test("personalized pageRank concentrates mass near the seed") {
    import spark.implicits._
    val fwd = (1L to 6L).map(l => (l, 0L))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = Graph.pageRank(edges, iters = 5, seeds = Some(seeds))
      .as[(Long, Long)].collect().toMap
    // seed leaf holds teleport + return flow; non-seed leaves only get
    // the hub's split of the seed's mass — strictly less, all equal.
    out(1L) should be > out(2L)
    (2L to 6L).map(out).toSet.size shouldBe 1
    // the hub still outranks non-seed leaves (it absorbs the seed's 85%)
    out(0L) should be > out(2L)
  }
}
