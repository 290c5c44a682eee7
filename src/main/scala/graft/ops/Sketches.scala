package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable sketches for cardinality and frequency estimation at
  * 100 TB scale, where exact answers would shuffle the full key set.
  *
  * Two families:
  *
  *   - KMV (k-minimum-values, the bottom-k / theta sketch): keep the k
  *     smallest distinct 60-bit hashes per group. Fixed k·8-byte state
  *     per group regardless of input size, associative+commutative merge
  *     (union of two sketches = sketch of the union), so Spark's partial
  *     aggregation combines map-side and only sketches cross the
  *     shuffle. Estimator: (k−1) · 2^60 / h_(k) — Beyer et al.,
  *     "On Synopses for Distinct-Value Estimation Under Multiset
  *     Operations" (SIGMOD'07).
  *
  *   - Count-Min (Cormode & Muthukrishnan '05), kept RELATIONAL: the
  *     d×w counter matrix is represented as a (seed, cell, cnt) table
  *     built by one keyed aggregation. d·w is a constant (a few
  *     thousand rows) regardless of corpus size, the partial aggregate
  *     collapses each task's contribution to ≤ d·w rows before the
  *     shuffle, and point lookups are a broadcast join against the
  *     cell table. No driver-side state at all, and the same hash
  *     (seeded md5-60) is reproducible in any engine.
  *
  * Both use the portable hash60 so the DuckDB oracle can recompute the
  * sketch bit-for-bit (see TextOps.hash60Sql).
  */
object Sketches {

  /** 2^60 as an exact double (6-bit mantissa after the multiply below —
    * no rounding), shared by the Spark and oracle estimator.
    */
  val Exp60: Double = 1152921504606846976L.toDouble

  /** KMV sketch aggregator: the k smallest DISTINCT hash values, as a
    * sorted array. The buffer is immutable-by-convention (a new array
    * is allocated only when the sketch actually changes; the common
    * case at steady state — h above the current k-th minimum — is a
    * branch and no allocation).
    */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)

    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        // classic two-pointer sorted-union, truncated at k
        val out = new Array[Long](math.min(k, a.length + b.length))
        var i = 0; var j = 0; var n = 0
        while (n < out.length && (i < a.length || j < b.length)) {
          val take =
            if (i == a.length) { j += 1; b(j - 1) }
            else if (j == b.length) { i += 1; a(i - 1) }
            else if (a(i) < b(j)) { i += 1; a(i - 1) }
            else if (b(j) < a(i)) { j += 1; b(j - 1) }
            else { i += 1; j += 1; a(i - 1) } // equal: consume both
          if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
        }
        if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      }

    def finish(b: Array[Long]): Array[Long] = b

    private def insert(b: Array[Long], h: Long): Array[Long] = {
      if (b.length == k && h >= b(k - 1)) return b // steady state: no alloc
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) return b // already present
      val ins = -pos - 1
      val outLen = math.min(k, b.length + 1)
      val out = new Array[Long](outLen)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(b, ins, out, ins + 1, outLen - ins - 1)
      out
    }

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** KMV sketch as an aggregate column over a non-null LongType hash
    * column. Use with `groupBy(...).agg(kmvSketch(64)(col("h")))`.
    */
  def kmvSketch(k: Int): Column => Column = {
    val agg = udaf(new KmvAgg(k), Encoders.scalaLong)
    h => agg(h)
  }

  /** Distinct-count estimate from a KMV sketch array: exact when the
    * sketch isn't full (it holds every distinct hash), otherwise
    * (k−1)·2^60 / h_(k). `get` (0-based) returns NULL out of bounds, so
    * this is ANSI-safe on partial sketches.
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast(DoubleType))
      .otherwise(lit((k - 1).toDouble * Exp60) / get(sketch, lit(k - 1)).cast(DoubleType))

  /** The k-th minimum hash (the sketch threshold θ), NULL until full. */
  def kmvThreshold(sketch: Column, k: Int): Column = get(sketch, lit(k - 1))

  // ---- Bottom-k quantile sketch ----------------------------------------

  /** Mergeable QUANTILE sketch: the k pairs (h, v) with the smallest
    * (h, v) in lexicographic order, where h is the 60-bit hash of the
    * ROW IDENTITY (not the value) — a fixed-size, hash-determined
    * uniform row sample per group. Rank/percentile estimates are order
    * statistics of the sample's values.
    *
    * Why bottom-k and not literal KLL/t-digest: a KLL compactor's
    * state depends on arrival grouping, so sketch(shard A) merged with
    * sketch(shard B) is NOT bit-identical to sketch(A ∪ B) — only
    * statistically equivalent. This engine's sketch algebra holds
    * itself to the stronger bar the KMV/CMS/HLL members already meet
    * (and the oracle gate enforces): per-shard sketches merged in ANY
    * order/grouping produce the EXACT same state as sketching the
    * whole corpus at once, because the k smallest elements of a union
    * are the k smallest of the per-shard k-smallest. That makes the
    * estimate reproducible across engines, partitionings, and retries
    * — at the cost of O(1/ε²) sample size where KLL needs
    * O(1/ε·log²log(1/ε)); at k=2¹⁰–2¹⁴ per group the state is still a
    * few KB, which is what actually matters at 100 TB (only sketches
    * cross the shuffle; map-side partials collapse each task to one
    * k-long buffer per group).
    *
    * The sample is a MULTISET sorted by (h, v): duplicate pairs are
    * kept (two identical rows are two sample slots), matching the
    * oracle's `row_number() OVER (ORDER BY h, v) <= k` replay exactly.
    */
  final class BottomKAgg(k: Int)
      extends Aggregator[(Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {
    require(k >= 2, s"bottom-k sketch needs k >= 2, got $k")

    @inline private def lte(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
      h1 < h2 || (h1 == h2 && v1 <= v2)

    def zero: Array[(Long, Double)] = Array.empty

    def reduce(b: Array[(Long, Double)], x: (Long, Double)): Array[(Long, Double)] = {
      if (b.length == k && lte(b(k - 1)._1, b(k - 1)._2, x._1, x._2)) return b // steady state
      // first index whose element is strictly greater than x
      var lo = 0; var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lte(b(mid)._1, b(mid)._2, x._1, x._2)) lo = mid + 1 else hi = mid
      }
      val outLen = math.min(k, b.length + 1)
      val out = new Array[(Long, Double)](outLen)
      System.arraycopy(b, 0, out, 0, lo)
      out(lo) = x
      System.arraycopy(b, lo, out, lo + 1, outLen - lo - 1)
      out
    }

    def merge(a: Array[(Long, Double)], b: Array[(Long, Double)]): Array[(Long, Double)] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        // two-pointer multiset merge truncated at k (no dedup — see doc)
        val out = new Array[(Long, Double)](math.min(k, a.length + b.length))
        var i = 0; var j = 0; var n = 0
        while (n < out.length) {
          val takeA = i < a.length &&
            (j == b.length || lte(a(i)._1, a(i)._2, b(j)._1, b(j)._2))
          if (takeA) { out(n) = a(i); i += 1 } else { out(n) = b(j); j += 1 }
          n += 1
        }
        out
      }

    def finish(b: Array[(Long, Double)]): Array[(Long, Double)] = b

    def bufferEncoder: Encoder[Array[(Long, Double)]] =
      ExpressionEncoder[Array[(Long, Double)]]()
    def outputEncoder: Encoder[Array[(Long, Double)]] =
      ExpressionEncoder[Array[(Long, Double)]]()
  }

  /** Bottom-k quantile sketch as an aggregate over (hash, value)
    * columns: `groupBy(...).agg(bottomKSketch(1024)(col("h"), col("v")))`.
    */
  def bottomKSketch(k: Int): (Column, Column) => Column = {
    val agg = udaf(new BottomKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    (h, v) => agg(h, v)
  }

  // ---- Heavy hitters (mergeable top-k frequency summary) ---------------

  /** Mergeable HEAVY-HITTER summary, SpaceSaving/Misra-Gries bar met
    * through an order-insensitive algebra (same design stance as the
    * bottom-k quantile sketch): each SHARD keeps its exact top-m
    * (count, term) list plus a threshold = its m-th count (0 when the
    * shard's full vocabulary fits, i.e. the list is complete). A term
    * absent from a shard's list has, by construction, count ≤ that
    * shard's threshold there — so for any candidate term the merged
    * summary brackets the true global count:
    *
    *   lb(t) = Σ_{shards listing t} cnt   ≤   true(t)   ≤
    *   ub(t) = lb(t) + Σ_{shards NOT listing t} threshold
    *
    * and any term with true global count > Σ_s threshold_s MUST appear
    * in some shard's list (it cannot be below threshold everywhere) —
    * the never-miss guarantee, the exact analogue of Misra-Gries'
    * "every item with freq > n/(m+1) survives". State per shard is m
    * rows; the merge is relational (no stream-order dependence, so
    * shard summaries combined in any grouping give the identical
    * result — DuckDB-replayable). This is the TPUT/three-phase
    * distributed top-k shape [Cao & Wang, PODC'04] rather than a
    * sequential counter sketch, which is the right decomposition when
    * shards are data partitions, not streams.
    */
  def hhShardSummaries(tokens: DataFrame, shardCol: Column, termCol: Column,
                       m: Int, weight: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // weight: rank by summed integer weight instead of row count
    // (volume-weighted heavy hitters) — every bound/guarantee holds
    // verbatim with "count" read as "total weight", since the proof
    // only uses additivity and non-negativity.
    val counts = tokens.groupBy(shardCol.as("shard"), termCol.as("term"))
      .agg(weight.map(w => sum(w)).getOrElse(count(lit(1))).as("cnt"))
    val w = Window.partitionBy(col("shard")).orderBy(col("cnt").desc, col("term"))
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") <= m)
  }

  /** Per-shard absent-term bound: the m-th count, or 0 when the list
    * holds the shard's whole vocabulary (absent ⇒ count 0).
    */
  def hhThresholds(summaries: DataFrame, m: Int): DataFrame =
    summaries.groupBy("shard").agg(
      when(max(col("rn")) < m, lit(0L)).otherwise(min(col("cnt"))).as("thr"))

  /** Merged candidate bounds over the union of shard lists. The grid is
    * candidates × shards (≤ m·s × s rows — summary-sized, never
    * data-sized); thresholds broadcast.
    */
  def hhMergedBounds(summaries: DataFrame, thresholds: DataFrame): DataFrame =
    summaries.select("term").distinct()
      .crossJoin(broadcast(thresholds))
      .join(summaries.select(col("shard"), col("term"), col("cnt")),
        Seq("shard", "term"), "left")
      .groupBy("term")
      .agg(sum(coalesce(col("cnt"), lit(0L))).as("lb"),
        (sum(coalesce(col("cnt"), lit(0L))) +
          sum(when(col("cnt").isNull, col("thr")).otherwise(lit(0L)))).as("ub"))

  // ---- Count-Min --------------------------------------------------------

  /** Count-Min cell table: one row per (seed, cell) with the summed hit
    * count. `depth` independent hash rows via the seeded 60-bit hash,
    * `width` cells per row. The explode multiplies input rows by
    * `depth`, but the partial aggregate collapses each task to at most
    * depth·width rows before anything shuffles.
    */
  def cmsCells(df: DataFrame, term: Column, depth: Int, width: Int): DataFrame = {
    val seeded = df.select(
      explode(array((0 until depth).map(lit): _*)).as("seed"),
      term.as("term"))
    seeded
      .select(col("seed"),
        pmod(TextOps.seededHash60(col("seed"), col("term")), lit(width.toLong)).as("cell"))
      .groupBy("seed", "cell")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell table from a PRE-COUNTED (term, weight) frame: identical
    * cells to [[cmsCells]] over the raw instances (grouping by term
    * first then summing commutes with the per-(seed, cell) count), but
    * the depth-way explode and the seeded hashing run over DISTINCT
    * terms, not token instances — the explicit form of the map-side
    * combine, worth a depth× reduction in hashed rows when the
    * vocabulary is far smaller than the corpus (it always is).
    */
  def cmsCellsWeighted(termCounts: DataFrame, term: Column, cnt: Column,
                       depth: Int, width: Int): DataFrame =
    termCounts
      .select(explode(array((0 until depth).map(lit): _*)).as("seed"),
        term.as("term"), cnt.as("__c"))
      .select(col("seed"),
        pmod(TextOps.seededHash60(col("seed"), col("term")), lit(width.toLong)).as("cell"),
        col("__c"))
      .groupBy("seed", "cell")
      .agg(sum(col("__c")).as("cnt"))

  /** Point-estimate the frequency of each term in `terms` (a frame with
    * a `term` column) against a cell table: min over the d row counters.
    * The cell table is tiny (≤ depth·width rows) and is broadcast; the
    * estimate never underestimates (CMS guarantee).
    */
  def cmsEstimate(cells: DataFrame, terms: DataFrame, depth: Int, width: Int): DataFrame = {
    val probes = terms
      .select(col("term"), explode(array((0 until depth).map(lit): _*)).as("seed"))
      .withColumn("cell",
        pmod(TextOps.seededHash60(col("seed"), col("term")), lit(width.toLong)))
    probes
      .join(broadcast(cells), Seq("seed", "cell"))
      .groupBy("term")
      .agg(min(col("cnt")).as("est_cnt"))
  }

  /** Oracle fragment: the cell table in DuckDB SQL over a `term` source
    * CTE. Mirrors `cmsCells` exactly (same seeded hash, same modulus).
    */
  def cmsCellsSql(termsCte: String, depth: Int, width: Int): String =
    s"""SELECT seed, ${TextOps.seededHash60Sql("seed", "term")} % $width AS cell,
       |       COUNT(*) AS cnt
       |FROM $termsCte CROSS JOIN (SELECT unnest(generate_series(0, ${depth - 1})) AS seed) seeds
       |GROUP BY 1, 2""".stripMargin

  // ---- HyperLogLog (relational, integer-exact) -------------------------

  /** HyperLogLog (Flajolet et al. '07) register table, kept RELATIONAL
    * like the CMS cells: 2^p registers per group, each the max "rank"
    * (position of the first 1-bit in the hash remainder) observed —
    * one keyed aggregation, fixed 2^p rows per group at any input
    * size, sketch-of-union == max-merge of sketches.
    *
    * Bit layout over the 60-bit hash: top `p` bits select the bucket,
    * the low 60−p bits w give rank = (60−p) − msb(w) + 1, with rank
    * 60−p+1 for w = 0. msb comes from `length(bin(w))` — both Spark
    * and DuckDB print minimal binary strings, so the rank is
    * integer-exact and engine-portable (no log2 anywhere). Absent
    * buckets surface as rank 0 via a per-group `sequence` grid —
    * never a global calendar-style cross join.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], h: Column, p: Int): DataFrame = {
    val rem = 60 - p
    val regs = df
      .select(groupCols.map(col) :+ shiftright(h, rem).as("bucket") :+
        h.bitwiseAND(lit((1L << rem) - 1)).as("__w"): _*)
      .withColumn("__rank",
        lit(rem + 1) - length(expr("trim(LEADING '0' FROM bin(__w))")))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rank")).as("__r"))
    val grid = regs.select(groupCols.map(col): _*).distinct()
      .select(groupCols.map(col) :+
        explode(expr(s"sequence(0L, ${(1L << p) - 1}L)")).as("bucket"): _*)
    grid.join(regs, groupCols :+ "bucket", "left")
      .withColumn("r", coalesce(col("__r"), lit(0)).cast(LongType))
      .drop("__r")
  }

  /** Raw HLL estimator α_m·m²/Σ2^(−r) over a register frame, computed
    * through an integer-exact scaled sum: Σ2^(−r) ≡ Σ2^(REM+1−r) /
    * 2^(REM+1), every term a BIGINT shift — so the only floating-point
    * steps are one constant product and one division, bit-identical in
    * any IEEE engine. Deliberately no small/large-range correction:
    * that needs ln(), whose last ulp is libm-dependent; callers get
    * the raw estimator plus `n_zero` to judge the regime.
    */
  /** Published small-m alpha constants (Flajolet et al., HLL paper §4):
    * p∈{4,5,6} have dedicated values; larger m uses the asymptotic
    * formula. p < 4 is outside the algorithm's validated range.
    */
  private def hllAlpha(p: Int): Double = p match {
    case 4 => 0.673
    case 5 => 0.697
    case 6 => 0.709
    case _ => 0.7213 / (1 + 1.079 / (1L << p))
  }

  def hllEstimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(p >= 4, s"HLL precision p must be >= 4 (got $p)")
    val m = 1L << p
    val rem1 = 60 - p + 1
    val alpha = hllAlpha(p)
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($rem1 - r AS INT))")).as("__s"),
        sum(when(col("r") === 0, 1L).otherwise(0L)).as("n_zero"))
      .withColumn("est_raw",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble) *
          lit(math.pow(2.0, rem1)) / col("__s"))
      .drop("__s")
  }

  /** Oracle fragments mirroring [[hllRegisters]]/[[hllEstimate]]: the
    * register table (with the zero-filled grid) and the scaled-sum
    * estimator, over a CTE exposing (`groupCol`, h).
    */
  def hllRegistersSql(sourceCte: String, groupCol: String, p: Int): String = {
    val rem = 60 - p
    s"""regs AS (
       |  SELECT $groupCol, h >> $rem AS bucket,
       |    MAX(${rem + 1} - length(ltrim(bin(h & ${(1L << rem) - 1}), '0'))) AS mr
       |  FROM $sourceCte GROUP BY 1, 2),
       |grid AS (
       |  SELECT DISTINCT $groupCol, unnest(generate_series(0, ${(1L << p) - 1})) AS bucket
       |  FROM regs),
       |filled AS (
       |  SELECT g.$groupCol, g.bucket, CAST(COALESCE(r.mr, 0) AS BIGINT) AS r
       |  FROM grid g LEFT JOIN regs r
       |    ON r.$groupCol = g.$groupCol AND r.bucket = g.bucket)""".stripMargin
  }

  def hllEstimateSql(groupCol: String, p: Int,
                     from: String = "filled"): String = {
    require(p >= 4, s"HLL precision p must be >= 4 (got $p)")
    val m = 1L << p
    val rem1 = 60 - p + 1
    val alpha = hllAlpha(p).toString
    s"""SELECT $groupCol,
       |  CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |  $alpha * ${m.toDouble} * ${m.toDouble} * ${math.pow(2.0, rem1)}
       |    / CAST(SUM(1::BIGINT << CAST($rem1 - r AS INTEGER)) AS BIGINT) AS est_raw
       |FROM $from GROUP BY 1""".stripMargin
  }
}
