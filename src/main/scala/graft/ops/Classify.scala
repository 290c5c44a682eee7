package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
      .withColumn("w1e6", expr(
        s"""(n_pos + 1) * 1000000L div (tot_pos + $nFeatures)
           | - (n_neg + 1) * 1000000L div (tot_neg + $nFeatures)""".stripMargin))
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
}
