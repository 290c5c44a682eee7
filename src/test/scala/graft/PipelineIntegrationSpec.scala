package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Profile, Sampling, Store, TextOps}

/** End-to-end training-data lifecycle: dedup-on-ingest → profile →
  * decontaminate → near-dup clustering → redact → stratified sample.
  * One spec proving the pipeline operators compose on a single corpus —
  * the LLM-data counterpart of IntegrationSpec's reference lifecycle.
  */
class PipelineIntegrationSpec extends SparkSpec {

  // Deterministic corpus: 40 base docs over a 40-word vocabulary, plus
  // near-dups (first token dropped), exact dups, and eval leaks.
  private lazy val corpus = {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega",
      "red", "green", "blue", "cyan", "teal", "plum", "jade", "ruby",
      "opal", "onyx", "pearl", "coral", "amber", "ivory", "slate", "umber")
    val rnd = new scala.util.Random(7)
    def text(): String =
      Seq.fill(30 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    val base = (0L until 40L).map(i =>
      (i, text(), if (i % 4 == 0) "fr" else "en"))
    val nearDups = base.take(5).map { case (i, t, l) =>
      (i + 100, t.split(" ", 2)(1), l) }
    val exactDups = base.slice(5, 10).map { case (i, t, l) => (i + 200, t, l) }
    (base ++ nearDups ++ exactDups).toDF("id", "text", "lang")
  }

  test("the full curation lifecycle composes: ingest-dedup through sampling") {
    import spark.implicits._

    // 1. Ingest with dedup-on-append: the 5 exact dups never land.
    val store = corpus.filter($"id" < 100) // initial store: the 40 base docs
    val batch = corpus.filter($"id" >= 100) // near + exact dups arrive later
    val appended = Store.appendDeduped(store, batch, "text", tieBreak = "id")
    appended.count() shouldBe 5L // near-dups pass (different bytes), exacts dropped
    val ingested = store.unionByName(appended)
    ingested.count() shouldBe 45L

    // 2. Profile the ingested corpus: one row per column, zero nulls.
    val prof = Profile.profile(ingested, Seq("id", "lang"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    prof("id") shouldBe ((45L, 0L, 45L))
    prof("lang")._3 shouldBe 2L

    // 3. Decontaminate against an eval set containing base doc 3's text:
    //    doc 3 AND its near-dup 103 are flagged; clean docs are not.
    val evalSet = ingested.filter($"id" === 3L)
      .select(($"id" + 1000).as("id"), $"text")
    val contaminated = Dedup.decontaminate(ingested, evalSet, "id", "text")
      .filter($"overlap_frac" > 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    contaminated should contain(3L)
    contaminated should contain(103L)
    val clean = ingested.join(
      contaminated.toSeq.toDF("id"), Seq("id"), "left_anti")

    // 4. Near-dup clustering on what remains: each surviving near-dup
    //    pair collapses to its minimum id.
    val pairs = Dedup.nearDupPairs(clean, "id", "text", threshold = 0.5)
    val clusters = Dedup.dupClusters(pairs)
    val drop = clusters.filter($"id" =!= $"cluster_id")
      .select("id").collect().map(_.getLong(0)).toSet
    drop.foreach(_ should be >= 100L) // only planted near-dups collapse
    val deduped = clean.join(drop.toSeq.toDF("id"), Seq("id"), "left_anti")

    // 5. Redact + stratified sample: 10 per language, all redacted rows
    //    intact (corpus has no PII, so redaction is identity here).
    val redacted = deduped.withColumn("text", TextOps.redact($"text"))
    redacted.count() shouldBe deduped.count()
    val sample = Sampling.stratifiedSample(redacted, $"lang", $"id", k = 10)
    val perLang = sample.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.values.foreach(_ should be <= 10L)
    perLang.keySet shouldBe Set("en", "fr")
  }
}
