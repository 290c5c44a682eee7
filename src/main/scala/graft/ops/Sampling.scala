package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deterministic sampling and packing operators for training-data
  * pipelines.
  *
  * Everything keys off the portable 60-bit content hash (`TextOps
  * .hash60`), never `rand()`: a sample must be reproducible across
  * runs, engines, task retries, and partitionings — `df.sample` is
  * none of those (seeded per-partition, so a repartition reshuffles
  * membership). Hash-gating is also embarrassingly parallel: a pure
  * map-side filter, no shuffle, no state.
  *
  * Scale notes: the gate is a codegen'd expression evaluated inside the
  * scan's WholeStageCodegen span; stratified quotas are one keyed
  * window (single exchange on the stratum key).
  */
object Sampling {

  private val Buckets = 10000L

  /** The gate bucket for a key: uniform in [0, 10000).
    *
    * NULL keys hash to NULL and thus fail every gate — null-keyed rows
    * are excluded from all samples (a sample keyed on a nullable column
    * is a caller bug; coalesce first if nulls are meaningful).
    */
  def gateBucket(key: Column, salt: String): Column =
    TextOps.seededHash60(lit(salt), key.cast(StringType)) % Buckets

  /** Keep rows whose key hashes under `fraction`: a deterministic,
    * engine-portable Bernoulli sample. Same key + salt → same verdict,
    * always; vary `salt` for independent samples.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
                 salt: String = "sample"): DataFrame =
    df.filter(gateBucket(key, salt) < (fraction * Buckets).toLong)

  /** Stratified quota sample: the `k` rows of each stratum whose keys
    * hash smallest (a deterministic per-group reservoir). Balanced
    * per-language / per-source quotas for training mixtures come out as
    * one window over the stratum key.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       k: Int, salt: String = "strat"): DataFrame = {
    // key is the tiebreak: hash collisions are ~2^-60, but a sample
    // operator must be total-order deterministic even then.
    val w = Window.partitionBy(stratum)
      .orderBy(TextOps.seededHash60(lit(salt), key.cast(StringType)), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** The 100 TB path for stratified quotas. `stratifiedSample`'s window
    * funnels each stratum through ONE task's sort — with few strata
    * (languages, sources) that's the whole table through a handful of
    * cores. This variant pre-gates on a hash THRESHOLD before
    * windowing: per stratum of size n, keep rows whose 60-bit order
    * hash is below `oversample·k/n · 2^60` (expected survivors =
    * oversample·k, a constant), then window over survivors only.
    *
    * The gate is a prefix of the sort order (h < T is monotone in h),
    * so if a stratum keeps ≥ min(k, n) survivors, its gated top-k IS
    * the exact top-k — same rows as the plain window, proven by the
    * oracle. Strata where the gate came up short (probability
    * e^-Θ(oversample·k) by Chernoff) are recomputed ungated and
    * unioned, so the result is exact ALWAYS, not just in expectation.
    * Cost: one count aggregate + a broadcast join + a window over
    * ~oversample·k rows per stratum.
    */
  def stratifiedSampleScalable(df: DataFrame, stratum: Column, key: Column,
                               k: Int, salt: String = "strat",
                               oversample: Double = 4.0): DataFrame = {
    val MaxHash = 1L << 60
    val h = TextOps.seededHash60(lit(salt), key.cast(StringType))
    val counts = df.groupBy(stratum.as("__s")).agg(count(lit(1)).as("__n"))
    val withT = df
      // null-safe equality: a null stratum is a group too, same as the
      // plain window's partitionBy.
      .join(broadcast(counts), stratum <=> col("__s"))
      .withColumn("__h", h)
      // n ≤ oversample·k → threshold ≥ 2^60 → keep everything.
      .withColumn("__t",
        least(lit(MaxHash.toDouble),
          lit(oversample * k) / col("__n") * MaxHash).cast("long"))
    val gated = withT.filter(col("__h") < col("__t"))
    val w = Window.partitionBy(col("__s")).orderBy(col("__h"), key)
    val topk = gated.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    // Exactness check: a stratum is complete iff it kept min(k, n)
    // rows. Deficient strata (vanishingly rare) recompute ungated.
    val kept = topk.groupBy(col("__s").as("__sk")).agg(count(lit(1)).as("__kept"))
    val deficient = counts
      .join(kept, col("__s") === col("__sk"), "left")
      .filter(coalesce(col("__kept"), lit(0L)) < least(lit(k.toLong), col("__n")))
      .select(col("__s")).collect().map(_.get(0))
    val helper = Seq("__s", "__n", "__h", "__t", "__rn")
    if (deficient.isEmpty) topk.drop(helper: _*)
    else {
      val redo = withT.filter(col("__s").isin(deficient.toIndexedSeq: _*))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
      topk.filter(!col("__s").isin(deficient.toIndexedSeq: _*))
        .unionByName(redo)
        .drop(helper: _*)
    }
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * blocks by contiguous fill along a deterministic global order (the
    * order hash — reshuffling the corpus never repacks). A document
    * starting at global token offset `cum − n_tok` lands in block
    * `(cum − n_tok) div budget`; boundary-straddling documents are
    * charged to their starting block (the packer downstream splits
    * them).
    *
    * The global running sum is a DISTRIBUTED two-phase prefix sum, not
    * a global window (`Window.orderBy` with no partition funnels the
    * corpus through one task):
    *  phase 1 — hash-range buckets partition the global order, so each
    *    bucket's running sum is an independent keyed window (parallel);
    *  phase 2 — the per-bucket totals (`buckets` rows, trivially tiny)
    *    cumsum on the driver-side window and broadcast-join back as
    *    offsets.
    * Exactly the plan you'd want at 100 TB: one keyed window over the
    * data + one broadcast of `buckets` offsets.
    */
  def packSequences(df: DataFrame, idCol: Column, nTokCol: Column,
                    budget: Long, buckets: Int = 64,
                    salt: String = "pack"): DataFrame = {
    val MaxHash = 1L << 60
    val h = TextOps.seededHash60(lit(salt), idCol.cast(StringType))
    // Order-ALIGNED range bucketing (floor(h / width)): bucket id is
    // monotone in h, which is what lets per-bucket sums compose into a
    // global prefix sum. (A pmod/hash bucket would balance load but
    // scramble the order.)
    val bucketed = df
      .withColumn("__h", h)
      .withColumn("__b", (col("__h") / lit(MaxHash / buckets)).cast("int"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__h"), idCol)
    val partial = bucketed.withColumn("__cum_in", sum(nTokCol).over(wIn))
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = partial.groupBy(col("__b")).agg(sum(nTokCol).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    // Exact integer floor-div: (x − x mod b) is an exact multiple of b
    // whose quotient is an integer ≤ 2^53, so the double division is
    // exact — a plain (x/b).cast(long) could truncate a quotient the
    // double ROUNDED UP across an integer boundary.
    partial.join(broadcast(offsets), Seq("__b"))
      .withColumn("__start", col("__off") + col("__cum_in") - nTokCol)
      .withColumn("block_offset", pmod(col("__start"), lit(budget)))
      .withColumn("block_id",
        ((col("__start") - col("block_offset")) / lit(budget)).cast("long"))
      .drop("__h", "__b", "__cum_in", "__off", "__start")
  }

  /** Weighted sample WITHOUT replacement, k rows, deterministic
    * (Efraimidis–Spirakis): each row gets key u^(1/w) with u a hash-
    * derived uniform in (0,1], and the k largest keys win — inclusion
    * probability scales with weight, and the same data + salt always
    * picks the same rows (task retries and repartitions included,
    * where `rand()`-based reservoirs are not even self-consistent).
    *
    * Scale shape: the top-k is the k-bounded mergeable aggregate
    * (ops/TopK.scala) — losers die in the map-side partial, the
    * exchange carries k rows per partition — and winners re-attach by
    * broadcast semi-join on the hash. No global sort, no full-table
    * window funnel.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
                     salt: String = "wsample"): DataFrame = {
    val MaxHash = (1L << 60).toDouble
    val h = TextOps.seededHash60(lit(salt), key.cast(StringType))
    val withH = df.withColumn("__h", h)
    val es = pow((col("__h") + 1).cast("double") / lit(MaxHash),
      lit(1.0) / weight)
    val winners = TopK.topKPerGroup(
        withH.withColumn("__es", es).withColumn("__g", lit(1)),
        "__g", col("__es"), col("__h"), k, "__es", "__h")
      .select("__h")
    withH.join(broadcast(winners), Seq("__h"), "left_semi").drop("__h")
  }

  /** Uniform k-sample per group WITHOUT replacement — the distributed,
    * deterministic reservoir: keep the rows whose seeded portable hash
    * falls within the group's k smallest (the sampling face of the KMV
    * bottom-k sketch, which is exactly a uniform sample of the key
    * space). State is one k-long buffer per group at any group size;
    * losers die in the map-side partial, the exchange carries ≤k
    * entries per (group × partition). Deterministic under task retry
    * and any repartitioning, where a `rand()` reservoir is not even
    * self-consistent.
    *
    * Hash ties re-attach every tied row (KMV threshold semantics,
    * `h <= k-th smallest`), so a collision can return k+1 rows rather
    * than silently dropping an arbitrary one — the same rule a SQL
    * replay states, keeping the operator engine-exact.
    */
  def groupSample(df: DataFrame, groupCol: Column, key: Column, k: Int,
                  salt: String = "gsample"): DataFrame = {
    val h = TextOps.seededHash60(lit(salt), key.cast(StringType))
    val sk = Sketches.bottomKSketch(k)
    val withH = df.withColumn("__h", h)
    val winners = withH.groupBy(groupCol.as("__g"))
      .agg(sk(col("__h"), lit(0.0)).as("__sk"))
      .select(col("__g"), explode(col("__sk")).as("__m"))
      .select(col("__g"), col("__m._1").as("__h"))
      .distinct()
    // No broadcast hint: winners is k rows PER GROUP, so its size
    // scales with group cardinality — AQE broadcasts it when small and
    // shuffle-semi-joins on (group, hash) when it is not.
    withH.join(winners,
        withH("__h") === winners("__h") && groupCol === col("__g"), "left_semi")
      .drop("__h")
  }

  /** Mixture weighting: per-source keep-rates (dataset mixing for
    * training runs). Unlisted sources fall back to `defaultRate`.
    * Deterministic per key, map-side only — at 100 TB this is a pure
    * scan+filter with the rate CASE folded into codegen.
    */
  def mixtureSample(df: DataFrame, sourceCol: Column, key: Column,
                    rates: Map[String, Double], defaultRate: Double,
                    salt: String = "mix"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(sourceCol === src, lit(r)).otherwise(acc)
    }
    df.filter(gateBucket(key, salt) <
      (rate * Buckets).cast(org.apache.spark.sql.types.LongType))
  }

  /** Greedy MAX-COVERAGE selection (the submodular facility-location
    * pick of data curation): choose `k` documents one at a time, each
    * round taking the document that adds the most NOT-YET-COVERED
    * feature hashes (ties to the lowest id) — the classic (1 − 1/e)
    * greedy for building a small probe/eval set that touches as much
    * of the corpus's feature space as possible. The diversity dual of
    * Vectors.mmrSelect: MMR penalizes similarity to picks, coverage
    * counts only what picks haven't claimed.
    *
    * `features` must expose (id, h) pairs (Dedup.shingleHashSet's
    * shape). Per round: one anti-join of the feature table against the
    * covered set + one map-side-combined gain count; the single
    * driver-side action is the 1-row argmax (the BPE-merge discipline
    * — k rows total cross the driver). The covered set is bounded by
    * the picks' own features, not the corpus, and is checkpoint-cut
    * each round. Zero-gain rounds still pick (lowest unpicked id) so
    * the output is always exactly k rows, stated by the oracle too.
    */
  def coverSelect(features: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"bounded selection, got $k")
    val spark = features.sparkSession
    val feats = features
      .select(col("id").cast("long").as("id"), col("h").cast("long").as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ids = feats.select(col("id")).distinct()
    var covered = spark.range(0).select(col("id").as("h"))
    val picks = scala.collection.mutable.ListBuffer.empty[(Int, Long, Long, Long)]
    var total = 0L
    var r = 1
    while (r <= k) {
      val gains = feats.join(covered, Seq("h"), "left_anti")
        .groupBy(col("id")).agg(count(lit(1)).as("gain"))
      val already = picks.map(_._2)
      val winRows = ids
        .filter(if (already.isEmpty) lit(true) else !col("id").isin(already.toSeq: _*))
        .join(gains, Seq("id"), "left")
        .select(col("id"), coalesce(col("gain"), lit(0L)).as("gain"))
        .orderBy(col("gain").desc, col("id")).limit(1)
        .collect() // exactly one row per round crosses the driver
      if (winRows.nonEmpty) {
        val (wid, gain) = (winRows(0).getLong(0), winRows(0).getLong(1))
        total += gain
        picks += ((r, wid, gain, total))
        covered = covered
          .union(feats.filter(col("id") === wid).select(col("h")))
          .distinct()
          .localCheckpoint(eager = true) // flat plan, bounded by picks
      } else r = k // fewer docs than k: stop early with what exists
      r += 1
    }
    feats.unpersist()
    import spark.implicits._
    picks.toSeq.toDF("rank", "doc_id", "new_hashes", "covered_total")
  }

  /** DETERMINISTIC WEIGHTED INTERLEAVE — the data-mixing dataloader
    * ORDER, materialized: source s with weight w_s contributes its
    * i-th example at slot key `i·L div w_s` (L a common multiple of
    * the weights), so sorting by (slot, source) yields the smooth
    * round-robin schedule where a weight-3 source appears 3× as often
    * as a weight-1 source, uniformly — not in bursts. Within each
    * source, order is a seeded hash (deterministic reshuffle, the
    * [[curriculumOrder]] rule).
    *
    * Complements q_p2's mixture SAMPLING (which docs survive) with the
    * SCHEDULE (in what order the survivors are read). No global
    * window anywhere: one row_number per source partition + a
    * map-side slot computation; consumers ORDER BY (slot, source) —
    * an output-side sort, not a plan barrier.
    *
    * `weights` must be positive; `scaleL` a common multiple of all of
    * them so the slot division is remainder-free (engine-exact).
    */
  def weightedInterleave(df: DataFrame, idCol: String, srcCol: String,
                         weights: Map[String, Int], scaleL: Long,
                         seed: String): DataFrame = {
    require(weights.values.forall(_ > 0), "weights must be positive")
    require(weights.values.forall(scaleL % _ == 0), "scaleL must clear every weight")
    val wExpr = weights.foldLeft(lit(null).cast("int")) {
      case (acc, (s, w)) => when(col(srcCol) === s, lit(w)).otherwise(acc)
    }
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(graft.ops.TextOps.seededHash60(lit(seed), col(idCol).cast("string")),
        col(idCol))
    df.withColumn("w", wExpr)
      .filter(col("w").isNotNull)
      .withColumn("i", row_number().over(wIn).cast("long"))
      .withColumn("slot", expr(s"i * ${scaleL}L div w"))
      .select(col(idCol), col(srcCol), col("i"), col("slot"))
  }

  /** CURRICULUM-ORDERED epoch materialization — the training-order
    * contract a 100 TB dataloader needs written down, not improvised:
    * for each epoch, every example gets a deterministic (shard,
    * pos_in_shard) so any worker can open exactly its shard files and
    * read them in order, and a preempted job resumes at a byte offset.
    *
    *   - shard: seeded-hash assignment — epoch-varying, so consecutive
    *     epochs see different co-residency (the "reshuffle each epoch"
    *     guarantee) without any global sort or rand() (deterministic
    *     under task retry, unlike rand/monotonic ids).
    *   - pos_in_shard: row_number per (epoch, shard) ordered by
    *     (curriculum bin asc, seeded hash, id) — easy examples first
    *     WITHIN each shard; since shard assignment is hash-uniform,
    *     the interleaved global stream a round-robin reader sees is
    *     curriculum-ordered in expectation, with no global window
    *     anywhere. One window per (epoch, shard) partition — the
    *     parallelism is the shard count, thousands in production.
    *
    * `binCol` is the caller's integer curriculum key (a quality bin, a
    * length bucket); lower = earlier.
    */
  def curriculumOrder(df: DataFrame, idCol: String, binCol: Column,
                      epochs: Int, shards: Int): DataFrame = {
    val keyed = df
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("bin", binCol)
      .withColumn("h", graft.ops.TextOps.seededHash60(
        concat(lit("ep"), col("epoch").cast("string")), col(idCol).cast("string")))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("bin"), col("h"), col(idCol))
    keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("epoch"), col(idCol), col("bin"), col("shard"), col("pos"))
  }
}
