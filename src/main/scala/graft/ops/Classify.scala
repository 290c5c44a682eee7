package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-based learned quality classifier — the FineWeb-Edu/DCLM-shaped
  * upgrade over the rule gates (q_t2's heuristics, q_t12's Gopher
  * thresholds): score documents with a model TRAINED from labeled
  * examples instead of hand-set thresholds.
  *
  * Model family: binary Naive-Bayes-style bag-of-words over HASHED
  * features (`hash60("nb:"||token) mod nFeatures` — the hashing trick,
  * so the model is ≤ `nFeatures` rows BY CONSTRUCTION, independent of
  * vocabulary growth). Per-feature evidence is the Laplace-smoothed
  * class-conditional probability scaled to a 1e6 integer; a feature's
  * weight is the probability DIFFERENCE `p_pos1e6 − p_neg1e6`, and a
  * document's score is the occurrence-weighted sum of its features'
  * weights.
  *
  * Why probability-difference instead of NB's log-ratio: the engine's
  * integer-exactness stance (q_t18's PMI surrogate, q_t15's LM score) —
  * a libm `ln()` hash-differs across engines, while these weights are
  * pure integer arithmetic, so train AND inference are oracle-checkable
  * bit-for-bit. The weight keeps NB's sign structure (positive iff the
  * feature is more common in the positive class, magnitude growing with
  * the evidence) and the classifier remains a trained linear model over
  * count-estimated per-feature evidence.
  *
  * Scale shape (100 TB): training is ONE map-side-combined groupBy over
  * 8-byte hashed features — the shuffle carries ≤ nFeatures rows per
  * upstream task; the two scalar totals ride a 1-row broadcast.
  * Inference BROADCASTS the bounded model (the hint is justified: the
  * frame is ≤ nFeatures rows by construction), collapses per-doc
  * feature counts map-side, and shuffles one row per (doc × distinct
  * feature) — never per token.
  */
object Classify {

  private def feats(docs: DataFrame, textCol: String, nFeatures: Int): DataFrame =
    Partitioning.spread(docs)
      .withColumn("__w", explode(split(lower(col(textCol)), "\\s+")))
      .filter(length(col("__w")) >= 2)
      .withColumn("feat",
        pmod(TextOps.seededHash60(lit("nb"), col("__w")), lit(nFeatures.toLong)))

  /** Train: one row per observed feature —
    * (feat, n_pos, n_neg, w1e6) with
    * `w1e6 = (n_pos+1)·1e6 div (tot_pos+nFeatures)
    *       − (n_neg+1)·1e6 div (tot_neg+nFeatures)`.
    * Both quotients are non-negative, so Spark's truncating `div` and
    * an oracle's floor `//` agree.
    */
  def nbTrain(docs: DataFrame, textCol: String, label: Column,
              nFeatures: Int = 256): DataFrame = {
    // Materialize the count table (≤ nFeatures rows): it feeds BOTH the
    // totals and the weight join below — without the cut, each
    // reference re-runs the full corpus tokenize+count pass.
    val counts = feats(docs.withColumn("__y", label), textCol, nFeatures)
      .groupBy(col("feat"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("n_neg"))
      .localCheckpoint(eager = true)
    val totals = counts.agg(sum(col("n_pos")).as("tot_pos"),
      sum(col("n_neg")).as("tot_neg"))
    counts.crossJoin(broadcast(totals))
      // DECIMAL(38,0) products: per-feature counts reach ~tot/nFeatures,
      // and at 1e14-token corpora (n+1)·1e6 closes on Long's ceiling —
      // the silent-wrap class the skew report was hardened against.
      // `div` on decimals still returns BIGINT (same schema/values at
      // any non-overflowing scale); the oracle mirrors with HUGEINT.
      .withColumn("w1e6", expr(
        s"""cast(n_pos + 1 as decimal(38,0)) * 1000000 div (tot_pos + $nFeatures)
           | - cast(n_neg + 1 as decimal(38,0)) * 1000000 div (tot_neg + $nFeatures)""".stripMargin))
      .select(col("feat"), col("n_pos"), col("n_neg"), col("w1e6"))
  }

  /** Score: (id, n_tok, score) per document — score = Σ n_occ·w1e6 over
    * the document's features. Features never seen in training back off
    * to the zero-count weight (recomputed from the model's own totals),
    * so scoring a fresh corpus needs no retrain. Documents with no
    * qualifying token produce no row (nothing to score).
    *
    * The raw integer SUM is returned, not a per-token mean: the sum can
    * be negative, and truncating vs flooring division disagree there —
    * callers ranking by length-normalized score divide as floats
    * downstream, where exact cross-engine hashing is not at stake.
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, nFeatures: Int = 256): DataFrame = {
    // The model is referenced twice (weight join + fallback totals);
    // materialize the ≤ nFeatures rows once so a lazily-passed model
    // plan (e.g. nbTrain's) is not trained twice.
    val m = model.localCheckpoint(eager = true)
    val occ = feats(docs, textCol, nFeatures)
      .groupBy(col(idCol), col("feat"))
      .agg(count(lit(1)).as("n_occ"))
    val fallback = m
      .agg(sum(col("n_pos")).as("tot_pos"), sum(col("n_neg")).as("tot_neg"))
      .select(expr(
        s"""1000000L div (tot_pos + $nFeatures)
           | - 1000000L div (tot_neg + $nFeatures)""".stripMargin).as("w_unseen"))
    occ
      .join(broadcast(m.select(col("feat"), col("w1e6"))), Seq("feat"), "left")
      .crossJoin(broadcast(fallback))
      .withColumn("__w", coalesce(col("w1e6"), col("w_unseen")))
      .groupBy(col(idCol))
      .agg(sum(col("n_occ")).as("n_tok"),
        sum(col("n_occ") * col("__w")).as("score"))
  }

  /** AUC of an integer score against a boolean label — the
    * Mann-Whitney formulation, integer-exact: over all (positive,
    * negative) example pairs, `auc = (wins + ties/2) / (n_pos·n_neg)`
    * where a win is `score_pos > score_neg`. Reported doubled so the
    * half-credit ties stay integral: `auc_num = 2·wins + ties`,
    * `auc_den = 2·n_pos·n_neg`, plus the floor-scaled
    * `auc1e6 = auc_num·1e6 div auc_den` (DECIMAL(38,0) internally —
    * wins is O(n_pos·n_neg) and overflows BIGINT long before the row
    * counts do). The evaluation loop a learned gate needs before its
    * threshold is trusted — recall@k's classifier sibling.
    *
    * NOT the quadratic pair join: collapse to one row per DISTINCT
    * score (keyed groupBy, map-side combined), then
    * `wins = Σ n_pos(s)·n_neg(<s)` via a prefix sum of negative counts
    * in score order. The prefix sum is the DISTRIBUTED two-phase shape
    * (`Sampling.packSequences`): min/max bounds ride a 1-row broadcast
    * into monotone range buckets, each bucket's running sum is an
    * independent keyed window, and the per-bucket totals (`buckets`
    * rows) cumsum + broadcast back as offsets. No global-order window
    * funnel anywhere.
    */
  /** Calibration table: fixed-width score bins over [min, max] with
    * per-bin example count, positive count, and the positive fraction
    * as a floor-scaled 1e6 integer — the reliability diagram behind a
    * threshold choice (AUC says the RANKING is good; this says what a
    * score of X actually means). Bin width comes from a 1-row min/max
    * broadcast (the same monotone-bucket trick as [[auc]]), never a
    * global-order ntile window; the aggregation is one keyed groupBy,
    * map-side combined.
    */
  def calibration(scored: DataFrame, scoreCol: Column, labelCol: Column,
                  bins: Int = 10): DataFrame = {
    val bounds = scored.agg(min(scoreCol).as("__lo"), max(scoreCol).as("__hi"))
    scored.select(scoreCol.as("__sc"),
        when(labelCol, 1L).otherwise(0L).as("__y"))
      .crossJoin(broadcast(bounds))
      // (sc − lo)·bins div (hi − lo + 1) ∈ [0, bins−1]; numerator and
      // denominator both non-negative so truncating div == floor.
      .withColumn("bin", expr(s"(__sc - __lo) * $bins div (__hi - __lo + 1L)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        min(col("__sc")).as("score_lo"), max(col("__sc")).as("score_hi"))
      .withColumn("pos1e6", expr("n_pos * 1000000L div n"))
  }

  def auc(scored: DataFrame, scoreCol: Column, labelCol: Column,
          buckets: Int = 64): DataFrame = {
    val sc = scored
      .groupBy(scoreCol.as("__sc"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("__np"),
        sum(when(labelCol, 0L).otherwise(1L)).as("__nn"))
    val bounds = sc.agg(min(col("__sc")).as("__lo"), max(col("__sc")).as("__hi"))
    val bucketed = sc.crossJoin(broadcast(bounds))
      // Monotone-in-score bucket id: floor((sc − lo) / width). Width ≥ 1
      // keeps the degenerate all-equal-scores case from dividing by 0.
      .withColumn("__w", expr(s"greatest(1L, (__hi - __lo) div $buckets + 1L)"))
      .withColumn("__b", expr("(__sc - __lo) div __w").cast("int"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__sc"))
    val partial = bucketed.withColumn("__cum_in", sum(col("__nn")).over(wIn))
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = partial.groupBy(col("__b")).agg(sum(col("__nn")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    partial.join(broadcast(offsets), Seq("__b"))
      .withColumn("__nn_below", col("__off") + col("__cum_in") - col("__nn"))
      .agg(sum(col("__np")).as("n_pos"), sum(col("__nn")).as("n_neg"),
        sum(expr("CAST(__np AS DECIMAL(38,0)) * __nn_below")).as("__wins"),
        sum(expr("CAST(__np AS DECIMAL(38,0)) * __nn")).as("__ties"))
      .select(col("n_pos"), col("n_neg"),
        expr("CAST(2 * __wins + __ties AS DECIMAL(38,0))").as("auc_num"),
        expr("CAST(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg AS DECIMAL(38,0))").as("auc_den"),
        expr("""CASE WHEN n_pos > 0 AND n_neg > 0
                | THEN CAST((2 * __wins + __ties) * 1000000
                |           div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)
                |END""".stripMargin).as("auc1e6"))
  }
}
