package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The COMPOSED end-to-end curation pipeline — every stage the engine
  * already gates individually (blocklist t32, Gopher t12, learned NB
  * quality t19/t20, near-dup purge d9, decontamination d6, mixture p2)
  * chained into ONE operator that also emits the per-stage drop
  * manifest. The manifest is produced by the run that did the dropping
  * — the dataset-card provenance row is a by-product of curation, not
  * a separately-computed report that can drift from it.
  */
object Curate {

  /** One manifest row per stage: 1-based stage number, stage name,
    * rows entering, rows dropped, rows surviving.
    */
  val ManifestColumns: Seq[String] =
    Seq("stage", "name", "rows_in", "rows_dropped", "rows_out")

  /** Run the six-stage pipeline over `docs` (`id`, `text`, `source`,
    * plus whatever `nbLabel` references). Returns (survivors,
    * manifest).
    *
    * Stage semantics (each the EXACT algebra of its standalone gate):
    *   1. blocklist     — drop docs tripping any lexicon category at
    *                      `blockThreshold` hits ([[TextOps.blocklistGate]]);
    *   2. gopher        — keep docs passing the word-level quality gate
    *                      ([[TextOps.gopherWordGate]]);
    *   3. quality       — train the NB classifier ON THE SURVIVORS
    *                      (`nbLabel` as the positive class), keep
    *                      score > 0; a doc with no hashable token has
    *                      no score and is dropped (stated contract);
    *   4. neardup       — keep each near-dup cluster's minimum-id
    *                      member (the d9 purge algebra);
    *   5. decontaminate — drop docs sharing ANY 3-shingle with
    *                      `evalSet` ([[Dedup.decontaminate]]);
    *   6. mixture       — per-source deterministic hash-gate keep rates
    *                      ([[Sampling.mixtureSample]]).
    *
    * Scale shape: every stage is the already-audited operator — nothing
    * corpus² anywhere; the inter-stage frames are materialized with an
    * eager lineage cut (what a production pipeline does by writing each
    * stage), so no stage recomputes its predecessors and the six
    * manifest counts are one cheap action each over a cached frame.
    * Driver traffic is the six Long counts.
    */
  def pipeline(docs: DataFrame, evalSet: DataFrame,
               lexicon: Map[String, Seq[String]], blockThreshold: Int,
               nbLabel: Column, nbFeatures: Int,
               mixRates: Map[String, Double], mixDefault: Double,
               stops: Seq[String] = TextOps.gopherStops)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    def cut(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)

    val s0 = cut(docs)
    val blocked = TextOps.blocklistGate(s0, "id", "text", lexicon, blockThreshold)
      .filter(col("cat_blocked")).select(col("id")).distinct()
    val s1 = cut(s0.join(blocked, Seq("id"), "left_anti"))

    val passing = TextOps.gopherWordGate(s1, "id", "text", stops)
      .filter(col("pass")).select(col("id"))
    val s2 = cut(s1.join(passing, Seq("id"), "left_semi"))

    val model = Classify.nbTrain(s2, "text", nbLabel, nbFeatures)
    val good = Classify.nbScore(s2, "id", "text", model, nbFeatures)
      .filter(col("score") > 0).select(col("id"))
    val s3 = cut(s2.join(good, Seq("id"), "left_semi"))

    val removed = Dedup.dupClusters(Dedup.nearDupPairs(s3, "id", "text"))
      .filter(col("id") =!= col("cluster_id")).select(col("id"))
    val s4 = cut(s3.join(removed, Seq("id"), "left_anti"))

    val contaminated = Dedup.decontaminate(s4, evalSet, "id", "text")
      .filter(col("n_overlap") > 0).select(col("id"))
    val s5 = cut(s4.join(contaminated, Seq("id"), "left_anti"))

    val s6 = cut(Sampling.mixtureSample(s5, col("source"), col("id"),
      mixRates, mixDefault))

    val names = Seq("blocklist", "gopher", "quality", "neardup",
      "decontaminate", "mixture")
    val counts = Seq(s0, s1, s2, s3, s4, s5, s6).map(_.count())
    val manifest = names.zipWithIndex.map { case (nm, i) =>
      ((i + 1).toLong, nm, counts(i), counts(i) - counts(i + 1), counts(i + 1))
    }.toDF(ManifestColumns: _*)
    (s6, manifest)
  }
}
