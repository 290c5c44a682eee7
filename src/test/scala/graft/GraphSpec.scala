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

  test("triangleCount: K4 gives each node C(3,2)=3 triangles; star gives none") {
    import spark.implicits._
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val out = Graph.triangleCount(k4).as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    // a star is wedge-rich but triangle-free: the orientation must not
    // fabricate closures from the hub's (stripped) out-list
    val star = (1L to 6L).map(l => (0L, l)).toDF("src", "dst")
    Graph.triangleCount(star).count() shouldBe 0L
  }

  test("triangleCount is orientation-exact: each triangle counted once " +
    "regardless of edge direction, duplication, or layout") {
    import spark.implicits._
    // two triangles sharing edge (1,2): nodes 1,2 in both; 3,4 in one
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 2L))
    val messy = (base ++ base.map(_.swap) ++ base).toDF("src", "dst").repartition(7)
    val out = Graph.triangleCount(messy).as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L)
  }

  test("triangleCount: the hub of a wheel closes a triangle per rim edge " +
    "but generates no hub-centered wedges (degree orientation)") {
    import spark.implicits._
    // wheel: rim cycle 1-2-3-4-5-1 + hub 0 to every rim node
    val rim = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    val spokes = (1L to 5L).map(r => (0L, r))
    val out = Graph.triangleCount((rim ++ spokes).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // 5 triangles (hub, rim_i, rim_i+1): hub in all 5, each rim node in
    // its two adjacent ones
    out(0L) shouldBe 5L
    (1L to 5L).foreach(r => out(r) shouldBe 2L)
  }

  test("kCore: K4 with a pendant chain keeps exactly the K4 at k=3 — " +
    "the chain peels even though its root touches the core") {
    import spark.implicits._
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L)) // 5 and 6 must cascade out
    val out = Graph.kCore((k4 ++ chain).toDF("src", "dst"), k = 3, rounds = 4)
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("kCore: a path peels from both ends one ring per round — " +
    "bounded rounds expose exactly the unconverged frontier") {
    import spark.implicits._
    val path = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("src", "dst")
    // k=2 on a path has an EMPTY 2-core; after 1 round only the
    // endpoints have peeled — the cap is a contract, not convergence
    val r1 = Graph.kCore(path, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    r1.keySet shouldBe Set(2L, 3L, 4L, 5L)
    Graph.kCore(path, k = 2, rounds = 3).count() shouldBe 0L
  }

  test("kCore converges on the gate's bipartite graph shape at its k " +
    "(rounds 6 == rounds 8), and the result is direction/layout-invariant") {
    import spark.implicits._
    // deterministic bipartite fixture in the gate's shape: parts 2m,
    // suppliers 2s+1, part m links suppliers (m+j) mod 25 for j < 8
    val edges = (for { m <- 0L until 120L; j <- 0L until 8L }
      yield (2L * m, 2L * ((m + j) % 25L) + 1L)).toDF("src", "dst")
    val r6 = Graph.kCore(edges, k = 8, rounds = 6)
      .as[(Long, Long)].collect().toMap
    val r8 = Graph.kCore(edges, k = 8, rounds = 8)
      .as[(Long, Long)].collect().toMap
    r8 shouldBe r6 // converged well inside the cap
    r6 should not be empty
    val flipped = Graph.kCore(
      edges.select(col("dst").as("src"), col("src").as("dst")).repartition(7),
      k = 8, rounds = 6).as[(Long, Long)].collect().toMap
    flipped shouldBe r6
  }
}
