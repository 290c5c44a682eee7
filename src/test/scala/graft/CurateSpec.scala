package graft

import org.apache.spark.sql.functions._
import graft.ops.Curate

/** Stage-attribution probe for the composed pipeline: one planted
  * defect per stage, each of which must be dropped at EXACTLY its
  * stage — the oracle gate (q_t33) proves the manifest counts; this
  * proves the right document died at the right stage.
  */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  /** 60 tokens: 30 doc-unique words interleaved with a shared word —
    * shingle-unique across docs (every 3-gram contains a unique token),
    * Gopher-passing (60 words, ~4-char mean, all alphabetic, the
    * shared word doubles as the stopword), and NB-separable (the
    * shared word's feature carries the doc's class mass).
    */
  private def mk(id: Long, shared: String): String =
    (1 to 30).flatMap(k => Seq(s"u${id}x$k", shared)).mkString(" ")

  /** PERIODIC doc: `reps` repetitions of (u<id>rep good). Any two reps
    * counts ≥ 3 give the IDENTICAL 3-shingle SET ({u g u, g u g}) — so
    * a pair of them is near-dup-paired unconditionally (content-group
    * semantics, no banding involved) — while the NB score scales with
    * the occurrence count: score = reps · (w(u<id>rep) + w(good)).
    * The deterministic way to plant a cluster whose BEST copy is not
    * its min-id copy.
    */
  private def per(id: Long, reps: Int): String =
    (1 to reps).flatMap(_ => Seq(s"u${id}rep", "good")).mkString(" ")

  test("pipeline drops each planted defect at its own stage and the " +
    "manifest attributes every drop") {
    val docs = Seq(
      // stage-1 kill: trips the latency lexicon at threshold 2
      (1L, mk(1, "good") + " slow fast slow fast", "keep", "en"),
      // stage-2 kill: 10 words < the Gopher word-count floor
      (2L, "only ten little words here under that word count gate", "keep", "en"),
      // stage-3 kill: the one non-en doc — its shared-word feature
      // carries negative class mass, score < 0
      (3L, mk(3, "bad"), "keep", "de"),
      // stage-4 kill: near-dup twins whose BETTER-scoring copy is the
      // LARGER id (id 5 repeats the same periodic content 45× vs 30×,
      // so its NB score is 1.5× id 4's) — keep-min would keep id 4 and
      // throw the best copy away; keep-best must keep id 5
      (4L, per(4, 30), "keep", "en"),
      (5L, per(4, 45), "keep", "en"),
      // stage-5 kill: shares the "alpha beta gamma" shingle with eval
      (6L, mk(6, "good") + " alpha beta gamma", "keep", "en"),
      // stage-6 kill: source routed to a 0.0 keep rate
      (7L, mk(7, "good"), "cut", "en"),
      // clean survivors
      (8L, mk(8, "good"), "keep", "en"),
      (9L, mk(9, "good"), "keep", "en"),
      (10L, mk(10, "good"), "keep", "en"),
      (11L, mk(11, "good"), "keep", "en")
    ).toDF("id", "text", "source", "lang")
    val evalSet = Seq((100L, "alpha beta gamma")).toDF("id", "text")

    val (survivors, manifest) = Curate.pipeline(docs, evalSet,
      lexicon = Map("latency" -> Seq("slow", "fast")), blockThreshold = 2,
      nbLabel = col("lang") === "en", nbFeatures = 256,
      mixRates = Map("keep" -> 1.0, "cut" -> 0.0), mixDefault = 1.0,
      stops = Seq("good", "bad"))

    manifest.orderBy("stage")
      .select("stage", "name", "rows_in", "rows_dropped", "rows_out")
      .as[(Long, String, Long, Long, Long)].collect().toSeq shouldBe Seq(
        (1L, "blocklist", 11L, 1L, 10L),
        (2L, "gopher", 10L, 1L, 9L),
        (3L, "quality", 9L, 1L, 8L),
        (4L, "neardup", 8L, 1L, 7L),
        (5L, "decontaminate", 7L, 1L, 6L),
        (6L, "mixture", 6L, 1L, 5L))
    // the twin that survives dedup is the BEST-scoring member (id 5),
    // NOT the cluster minimum — the d20 keep-best rule, live in the
    // composed pipeline
    survivors.select("id").as[Long].collect().toSet shouldBe
      Set(5L, 8L, 9L, 10L, 11L)
  }

  test("staged pipeline matches the in-session pipeline, and a run killed " +
    "after stage N resumes to the identical manifest without recomputing " +
    "completed stages") {
    val docs = ((1L to 6L).map(i => (i, mk(i, "good"), "keep", "en")) :+
      (7L, mk(4, "good"), "keep", "en") :+ // near-dup twin of id 4
      (8L, mk(8, "good") + " alpha beta gamma", "keep", "en") :+ // contaminated
      (9L, mk(9, "good"), "cut", "en")) // mixture-killed source
      .toDF("id", "text", "source", "lang")
    val evalSet = Seq((100L, "alpha beta gamma")).toDF("id", "text")
    def run(dir: String) = Curate.pipelineStaged(docs, evalSet,
      lexicon = Map("latency" -> Seq("slow", "fast")), blockThreshold = 2,
      nbLabel = col("lang") === "en", nbFeatures = 256,
      mixRates = Map("keep" -> 1.0, "cut" -> 0.0), mixDefault = 1.0,
      runDir = dir, stops = Seq("good", "bad"))

    val runDir = java.nio.file.Files.createTempDirectory("graft-curate").toString + "/run"
    val (sv1, mf1) = run(runDir)
    val expected = Curate.pipeline(docs, evalSet,
      lexicon = Map("latency" -> Seq("slow", "fast")), blockThreshold = 2,
      nbLabel = col("lang") === "en", nbFeatures = 256,
      mixRates = Map("keep" -> 1.0, "cut" -> 0.0), mixDefault = 1.0,
      stops = Seq("good", "bad"))
    val mfRows = mf1.orderBy("stage")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    mfRows shouldBe expected._2.orderBy("stage")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val svIds = sv1.select("id").as[Long].collect().toSet
    svIds shouldBe expected._1.select("id").as[Long].collect().toSet

    // ---- simulate death after stage 3 (quality): stages 4-6 never ran,
    // and stage 4 was killed MID-WRITE (dir present, no _SUCCESS, stray
    // job staging inside)
    def stageDir(i: Int, name: String) =
      new java.io.File(runDir, f"stage$i%02d_$name")
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete()
    }
    rmTree(stageDir(4, "neardup")); rmTree(stageDir(5, "decontaminate"))
    rmTree(stageDir(6, "mixture"))
    val partial = stageDir(4, "neardup")
    new java.io.File(partial, "_temporary/0").mkdirs() shouldBe true
    java.nio.file.Files.writeString(
      new java.io.File(partial, "part-00000").toPath, "garbage")

    // completed stages must NOT be recomputed on resume: their success
    // markers keep their mtimes
    val keptMarker = new java.io.File(stageDir(3, "quality"), "_SUCCESS")
    val mtimeBefore = keptMarker.lastModified()

    val (sv2, mf2) = run(runDir)
    mf2.orderBy("stage")
      .as[(Long, String, Long, Long, Long)].collect().toSeq shouldBe mfRows
    sv2.select("id").as[Long].collect().toSet shouldBe svIds
    keptMarker.lastModified() shouldBe mtimeBefore
    // the partial stage was swept and rewritten to a committed state
    new java.io.File(partial, "_SUCCESS").exists() shouldBe true
    new java.io.File(partial, "_temporary").exists() shouldBe false

    // ---- resuming under a DIFFERENT configuration fails fast on the
    // params fingerprint instead of silently reusing the old stages
    val drift = intercept[IllegalArgumentException](Curate.pipelineStaged(
      docs, evalSet,
      lexicon = Map("latency" -> Seq("slow", "fast")), blockThreshold = 3, // was 2
      nbLabel = col("lang") === "en", nbFeatures = 256,
      mixRates = Map("keep" -> 1.0, "cut" -> 0.0), mixDefault = 1.0,
      runDir = runDir, stops = Seq("good", "bad")))
    drift.getMessage should include("fingerprint")
    // same configuration still resumes cleanly after the refused attempt
    run(runDir)._2.orderBy("stage")
      .as[(Long, String, Long, Long, Long)].collect().toSeq shouldBe mfRows
    // ---- a RESOLVED label column (carries per-session expression ids
    // — the legitimate cross-session-resume spelling) fingerprints
    // identically to the unresolved one: the fingerprint hashes
    // expr.sql, which strips exprIds. Column.toString would embed them
    // and spuriously refuse this resume.
    Curate.pipelineStaged(docs, evalSet,
      lexicon = Map("latency" -> Seq("slow", "fast")), blockThreshold = 2,
      nbLabel = docs("lang") === "en", nbFeatures = 256,
      mixRates = Map("keep" -> 1.0, "cut" -> 0.0), mixDefault = 1.0,
      runDir = runDir, stops = Seq("good", "bad"))
      ._2.orderBy("stage")
      .as[(Long, String, Long, Long, Long)].collect().toSeq shouldBe mfRows

    // ---- a dir stamped by PRE-keep-best code (the exact byte formats
    // old code wrote to _params.sha256: NUL-joined repr WITHOUT the
    // stage-algebra tag — both the expr.sql rendering and the older
    // Column.toString rendering) must be REFUSED: its stage04_neardup
    // holds keep-MIN output the current algebra would never produce,
    // so accepting it would silently mix purge rules across stages.
    // Fingerprint archaeology (hexdump-verified, the join byte is
    // invisible in diffs): 6df147e introduced the fp as
    // NUL-joined + nbLabel.toString; 758481f changed ONLY the
    // rendering to expr.sql (join still the raw NUL byte); the
    // space-joined legacyFp d6978cd added could therefore never match
    // a hash either writer produced — which is why removing it lost
    // nothing, and why THESE two NUL-joined reprs are the real
    // historical formats this test guards against re-accepting.
    def sha(repr: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(repr.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nbl = col("lang") === "en"
    def oldRepr(label: String): String = Seq(
      "latency:slow|fast", "2", label, "256",
      "cut=0.0;keep=1.0", "1.0", "good|bad").mkString("\u0000")
    for (staleFp <- Seq(
        sha(oldRepr(graft.functions.Cols.expression(nbl).sql)), // r12 format
        sha(oldRepr(nbl.toString())))) {                        // pre-r12 format
      // drop the CRC sidecar Hadoop's checksummed local fs keeps for
      // the file we are overwriting behind its back
      new java.io.File(runDir, "._params.sha256.crc").delete()
      java.nio.file.Files.writeString(
        new java.io.File(runDir, "_params.sha256").toPath, staleFp)
      val stale = intercept[IllegalArgumentException](run(runDir))
      stale.getMessage should include("fingerprint")
    }
    rmTree(new java.io.File(runDir))
  }
}
