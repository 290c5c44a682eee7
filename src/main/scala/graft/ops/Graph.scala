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
               scale: Long = 1000000000000L,
               seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1 && iters <= 50, s"bounded iteration count, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg) is re-read every round — persist the JOINED frame,
    // not just e, or the deg aggregation+join re-executes per iteration.
    val srcSide = e.join(deg, "src").persist()

    // PERSONALIZED variant: teleport mass lands only on the seed set
    // (proximity-to-trusted-seeds scoring — the quality-prior read of
    // centrality). `nb` carries each node's per-round teleport term and
    // initial mass; the uniform case is seeds == nodes.
    val seedSet = seeds.map(_.select(col("node").cast("long").as("node")).distinct())
    val n = seedSet.getOrElse(nodes).count() // one driver-side scalar
    val init = scale / n
    val base = init * 15L / 100L
    val nb = (seedSet match {
      case None => nodes.select(col("node"), lit(base).as("b"), lit(init).as("r0"))
      case Some(sn) =>
        nodes.join(sn.withColumn("__s", lit(1)), Seq("node"), "left")
          .select(col("node"),
            when(col("__s").isNotNull, lit(base)).otherwise(lit(0L)).as("b"),
            when(col("__s").isNotNull, lit(init)).otherwise(lit(0L)).as("r0"))
    }).persist()

    var ranks = nb.select(col("node"), col("r0").as("r"))
    var round = 0
    while (round < iters) {
      val inflow = srcSide.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nb.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (col("b") + expr("coalesce(inflow, 0L) * 85 div 100")).as("r"))
        .localCheckpoint() // flat plan regardless of round count
      round += 1
    }
    e.unpersist(); srcSide.unpersist(); nb.unpersist()
    ranks
  }

  /** The DuckDB replay of [[pageRank]] as an unrolled CTE chain over an
    * `e(src, dst)` CTE the caller supplies — kept NEXT TO the operator
    * so the two formulations cannot drift apart silently.
    */
  def pageRankSql(edgesCte: String, iters: Int,
                  scale: Long = 1000000000000L,
                  seedsCte: Option[String] = None): String = {
    val seedsSql = seedsCte.getOrElse("SELECT node FROM nodes")
    val header =
      s"""WITH e AS ($edgesCte),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
         |seeds AS (SELECT DISTINCT node FROM ($seedsSql)),
         |params AS (SELECT $scale // COUNT(*) AS init FROM seeds),
         |nb AS (
         |  SELECT n.node,
         |    CASE WHEN s.node IS NOT NULL
         |         THEN (SELECT init * 15 // 100 FROM params) ELSE 0 END AS b,
         |    CASE WHEN s.node IS NOT NULL
         |         THEN (SELECT init FROM params) ELSE 0 END AS r0v
         |  FROM nodes n LEFT JOIN seeds s USING (node)),
         |r0 AS (SELECT node, r0v AS r FROM nb)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.node, n.b + COALESCE(inf.s, 0) * 85 // 100 AS r
         |  FROM nb n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(p.r // d.deg) AS s
         |    FROM e JOIN r${k - 1} p ON p.node = e.src
         |           JOIN deg d ON d.node = e.src
         |    GROUP BY 1) inf USING (node))""".stripMargin
    }
    (header +: rounds).mkString(",\n") +
      s"\nSELECT node, CAST(r AS BIGINT) AS r FROM r$iters"
  }
}
