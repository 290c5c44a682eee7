package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Sketches, TextOps}

/** Sketch-based estimation queries: KMV distinct-count and Count-Min
  * frequency. Both sketches use the portable 60-bit md5 hash, so the
  * DuckDB oracle recomputes the sketch content bit-for-bit and the
  * ESTIMATES (not just the exact sides) hash-match across engines —
  * the determinism a reproducible 100 TB pipeline needs.
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---- K1: KMV distinct sketch ----------------------------------------

  /** K1: distinct (user, day) combinations per event_type, exact AND
    * via a k=64 KMV sketch. The sketch column is a real mergeable
    * aggregate (fixed 512-byte state per group, partial-merged
    * map-side); the exact count rides along for error visibility. The
    * estimator arithmetic stays in exactly-representable doubles so
    * both engines produce the identical bits.
    */
  private val K = 64
  val k1Kmv: Q = (s, d) => {
    val kmv = Sketches.kmvSketch(K)
    Tables.events(s, d)
      .select(col("event_type"),
        TextOps.hash60(concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd"))).as("h"))
      .groupBy("event_type")
      .agg(countDistinct(col("h")).as("n_exact"), kmv(col("h")).as("sk"))
      .select(col("event_type"), col("n_exact"),
        Sketches.kmvThreshold(col("sk"), K).as("kth_min"),
        Sketches.kmvEstimate(col("sk"), K).as("est_distinct"))
      .orderBy("event_type")
  }
  val k1KmvSql: String = {
    val h = TextOps.hash60Sql(
      "CAST(user_id AS VARCHAR)||':'||strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')")
    s"""WITH e AS (SELECT event_type, $h AS h FROM events),
       |d AS (SELECT DISTINCT event_type, h FROM e),
       |r AS (SELECT event_type, h,
       |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
       |        COUNT(*) OVER (PARTITION BY event_type) AS nd
       |      FROM d)
       |SELECT event_type, MAX(nd) AS n_exact,
       |  MAX(CASE WHEN rn = $K THEN h END) AS kth_min,
       |  CASE WHEN MAX(nd) < $K THEN CAST(MAX(nd) AS DOUBLE)
       |       ELSE ${K - 1}.0 * 1152921504606846976 / MAX(CASE WHEN rn = $K THEN h END)
       |  END AS est_distinct
       |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  // ---- K2: Count-Min frequency sketch ----------------------------------

  /** K2: estimated vs exact counts for the exact top-20 corpus terms,
    * through a depth-4 × width-1024 Count-Min cell table. The cell
    * table is ≤ 4096 rows regardless of corpus size and is broadcast
    * for the probe join; estimates never undercount (CMS guarantee —
    * spec-asserted, and visible in the driver compare since the oracle
    * reproduces the identical cells).
    */
  private val Depth = 4
  private val Width = 1024
  val k2Cms: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(explode(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("tok"))
      .select(lower(col("tok")).as("term"))
    val exact = toks.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(20)
    val cells = Sketches.cmsCells(toks, col("term"), Depth, Width)
    Sketches.cmsEstimate(cells, exact.select("term"), Depth, Width)
      .join(exact, "term")
      .select(col("term"), col("exact_cnt"), col("est_cnt"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }
  val k2CmsSql: String =
    s"""WITH toks AS (
       |  SELECT lower(tok) AS term
       |  FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS tok FROM documents)),
       |exact AS (
       |  SELECT term, COUNT(*) AS exact_cnt FROM toks GROUP BY 1
       |  ORDER BY exact_cnt DESC, term LIMIT 20),
       |cells AS (
       |${Sketches.cmsCellsSql("toks", Depth, Width)}),
       |probes AS (
       |  SELECT t.term, s.seed,
       |         ${TextOps.seededHash60Sql("s.seed", "t.term")} % $Width AS cell
       |  FROM exact t CROSS JOIN (SELECT unnest(generate_series(0, ${Depth - 1})) AS seed) s),
       |est AS (
       |  SELECT p.term, MIN(c.cnt) AS est_cnt
       |  FROM probes p JOIN cells c ON c.seed = p.seed AND c.cell = p.cell
       |  GROUP BY 1)
       |SELECT e.term, e.exact_cnt, est.est_cnt
       |FROM exact e JOIN est ON est.term = e.term
       |ORDER BY e.exact_cnt DESC, e.term""".stripMargin

  // ---- K5: Count-Min merge algebra -------------------------------------

  /** K5: CMS MERGE — each source builds its own depth×width cell table
    * (the per-shard sketch); the global sketch is their CELL-WISE SUM.
    * The oracle computes the single-pass global cells directly, so the
    * gate PROVES merge(shard sketches) == sketch(all) — the property
    * that lets 1000 executors sketch locally and ship 4096-row tables
    * instead of term streams. Same hash family and dimensions as K2.
    */
  val k5CmsMerge: Q = (s, d) => {
    val perSource = Tables.documents(s, d)
      .select(col("source"),
        explode(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("tok"))
      .select(col("source"), lower(col("tok")).as("term"))
      .select(col("source"),
        explode(array((0 until Depth).map(lit): _*)).as("seed"), col("term"))
      .select(col("source"), col("seed"),
        pmod(TextOps.seededHash60(col("seed"), col("term")), lit(Width.toLong)).as("cell"))
      .groupBy("source", "seed", "cell")
      .agg(count(lit(1)).as("cnt"))
    perSource
      .groupBy("seed", "cell")
      .agg(sum(col("cnt")).as("cnt"))
      .orderBy("seed", "cell")
  }
  val k5CmsMergeSql: String =
    s"""WITH toks AS (
       |  SELECT lower(tok) AS term
       |  FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS tok FROM documents)),
       |cells AS (
       |${Sketches.cmsCellsSql("toks", Depth, Width)})
       |SELECT seed, cell, cnt FROM cells ORDER BY seed, cell""".stripMargin

  // ---- K3: KMV sketch union (merge algebra) ---------------------------

  /** K3: sketch MERGE — per-source KMV sketches unioned into one global
    * sketch, against the exact global distinct. This is the 100 TB
    * pattern the sketch exists for: every shard summarizes locally
    * (fixed k-long state), only sketches travel, and the combined
    * estimate is computed without ever shuffling the key universe.
    * Bottom-k of a union equals bottom-k of the per-source bottom-ks
    * (each global minimum is a minimum within its own source), so the
    * merged sketch — and therefore the ESTIMATE — is provably identical
    * to sketching the whole corpus at once; the oracle recomputes
    * exactly that union-of-bottom-ks.
    */
  val k3KmvUnion: Q = (s, d) => {
    val kmv = Sketches.kmvSketch(K)
    val hashes = Tables.documents(s, d)
      .select(col("source"), TextOps.hash60(col("text")).as("h"))
    val perSource = hashes.groupBy("source").agg(kmv(col("h")).as("sk"))
    val unioned = perSource
      .select(explode(col("sk")).as("h"))
      .agg(count(lit(1)).as("n_candidates"), kmv(col("h")).as("sk"))
    val exact = hashes.agg(
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("h")).as("n_exact"))
    exact.crossJoin(broadcast(unioned))
      .select(col("n_sources"), col("n_exact"), col("n_candidates"),
        Sketches.kmvThreshold(col("sk"), K).as("kth_min"),
        Sketches.kmvEstimate(col("sk"), K).as("est_distinct"))
  }
  val k3KmvUnionSql: String = {
    val h = TextOps.hash60Sql("text")
    s"""WITH e AS (SELECT source, $h AS h FROM documents),
       |d AS (SELECT DISTINCT source, h FROM e),
       |r AS (SELECT source, h,
       |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |      FROM d),
       |cand AS (SELECT h FROM r WHERE rn <= $K),
       |u AS (SELECT DISTINCT h FROM cand),
       |ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn,
       |         COUNT(*) OVER () AS nu
       |       FROM u),
       |g AS (SELECT COUNT(DISTINCT source) AS n_sources,
       |        COUNT(DISTINCT h) AS n_exact,
       |        (SELECT COUNT(*) FROM cand) AS n_candidates
       |      FROM e)
       |SELECT g.n_sources, g.n_exact, g.n_candidates,
       |  MAX(CASE WHEN ur.rn = $K THEN ur.h END) AS kth_min,
       |  CASE WHEN MAX(ur.nu) < $K THEN CAST(MAX(ur.nu) AS DOUBLE)
       |       ELSE ${K - 1}.0 * 1152921504606846976 / MAX(CASE WHEN ur.rn = $K THEN ur.h END)
       |  END AS est_distinct
       |FROM ur, g GROUP BY g.n_sources, g.n_exact, g.n_candidates""".stripMargin
  }

  // ---- K4: HyperLogLog registers + raw estimator ----------------------

  /** K4: per-event-type HLL over the same (user, day) stream as K1 —
    * the full 64-register table (absent buckets zero-filled) plus the
    * raw estimator and zero-register count. Registers AND estimate
    * hash-match the oracle because the rank uses the binary-string msb
    * (integer-exact) and the estimator's only float ops are one
    * constant product and one division (see Sketches.hllRegisters/
    * hllEstimate). Duplicate (user, day) activity needs no pre-
    * distinct: re-inserting a hash can't raise a register's max.
    */
  private val P = 6
  val k4Hll: Q = (s, d) => {
    val src = Tables.events(s, d)
      .select(col("event_type"),
        TextOps.hash60(concat(col("user_id").cast("string"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd"))).as("h"))
    val regs = Sketches.hllRegisters(src, Seq("event_type"), col("h"), P)
    val est = Sketches.hllEstimate(regs, Seq("event_type"), P)
    regs.join(broadcast(est), "event_type")
      .select(col("event_type"), col("bucket"), col("r"), col("n_zero"),
        col("est_raw"))
      .orderBy("event_type", "bucket")
  }
  val k4HllSql: String = {
    val h = TextOps.hash60Sql(
      "CAST(user_id AS VARCHAR)||':'||strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')")
    s"""WITH src AS (SELECT event_type, $h AS h FROM events),
       |${Sketches.hllRegistersSql("src", "event_type", P)},
       |est AS (
       |${Sketches.hllEstimateSql("event_type", P)})
       |SELECT f.event_type, f.bucket, f.r, est.n_zero, est.est_raw
       |FROM filled f JOIN est USING (event_type)
       |ORDER BY event_type, bucket""".stripMargin
  }

  // ---- registry ---------------------------------------------------------

  val all: Map[String, Q] = Map(
    "q_k1_kmv" -> k1Kmv,
    "q_k2_cms" -> k2Cms,
    "q_k5_cms_merge" -> k5CmsMerge,
    "q_k3_kmv_union" -> k3KmvUnion,
    "q_k4_hll" -> k4Hll)

  val oracles: Map[String, String] = Map(
    "q_k1_kmv" -> k1KmvSql,
    "q_k2_cms" -> k2CmsSql,
    "q_k5_cms_merge" -> k5CmsMergeSql,
    "q_k3_kmv_union" -> k3KmvUnionSql,
    "q_k4_hll" -> k4HllSql)
}
