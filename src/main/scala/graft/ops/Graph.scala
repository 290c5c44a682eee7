package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph centrality.
  *
  * PageRank is the canonical iterative-propagation workload (the other
  * graph member here — connected components — lives in Dedup as the
  * dup-cluster machinery). In a training-data pipeline a link-graph
  * centrality score is a standard quality prior (rank domains/documents
  * by endorsement rather than content), so the engine needs the
  * iterate-join-aggregate shape as a first-class operator.
  */
object Graph {

  /** Integer fixed-point PageRank: `iters` rounds of
    *
    *   r₀(v)    = S div n
    *   rₖ₊₁(v) = (S div n)·15 div 100
    *             + (Σ_{(u,v)∈E} rₖ(u) div deg(u)) · 85 div 100
    *
    * with every operation an exact BIGINT floor-division — no floats,
    * so the final ranks hash-match any engine that replays the same
    * algebra (the same engine-exactness stance as the t-family's
    * log-free scores). Classic damping-0.85 PageRank, with truncation
    * drift identical on both sides by construction.
    *
    * Scale shape: one round = one equi-join of the rank table with the
    * edge list on `src` (both shuffle-partitioned on the same key, so
    * AQE reuses the layout) + one map-side-combined SUM by `dst`.
    * The driver loop is bounded by `iters` (an explicit constant, the
    * d2b/d2c capped-rounds pattern) and holds no data — the single
    * driver-side action is the node COUNT for the teleport share.
    * Lineage is checkpoint-cut each round so the plan stays flat at
    * any iteration count.
    *
    * `edges` must expose BIGINT-castable (src, dst); multi-edges are
    * collapsed. Nodes are the endpoint union; every src has a degree
    * by construction, and a pure sink simply contributes nothing
    * (simplified dangling-mass semantics, stated by the oracle too).
    */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"bounded iteration count, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg) is re-read every round — persist the JOINED frame,
    // not just e, or the deg aggregation+join re-executes per iteration.
    val srcSide = e.join(deg, "src").persist()

    val n = nodes.count() // the one driver-side scalar (teleport share)
    val init = scale / n
    val base = init * 15L / 100L

    var ranks = nodes.withColumn("r", lit(init))
    var round = 0
    while (round < iters) {
      val inflow = srcSide.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("coalesce(inflow, 0L) * 85 div 100")).as("r"))
        .localCheckpoint() // flat plan regardless of round count
      round += 1
    }
    e.unpersist(); nodes.unpersist(); srcSide.unpersist()
    ranks
  }

  /** The DuckDB replay of [[pageRank]] as an unrolled CTE chain over an
    * `e(src, dst)` CTE the caller supplies — kept NEXT TO the operator
    * so the two formulations cannot drift apart silently.
    */
  def pageRankSql(edgesCte: String, iters: Int,
                  scale: Long = 1000000000000L): String = {
    val header =
      s"""WITH e AS ($edgesCte),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
         |params AS (SELECT $scale // COUNT(*) AS init FROM nodes),
         |r0 AS (SELECT node, init AS r FROM nodes, params)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.node,
         |    (SELECT init * 15 // 100 FROM params)
         |      + COALESCE(inf.s, 0) * 85 // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(p.r // d.deg) AS s
         |    FROM e JOIN r${k - 1} p ON p.node = e.src
         |           JOIN deg d ON d.node = e.src
         |    GROUP BY 1) inf USING (node))""".stripMargin
    }
    (header +: rounds).mkString(",\n") +
      s"\nSELECT node, CAST(r AS BIGINT) AS r FROM r$iters"
  }
}
