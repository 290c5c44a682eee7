package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Graph, Maintain, Sampling, Skew, TextOps, Vectors}

/** Fixture-level behavior pins for the curation-frontier operators:
  * incremental join-view maintenance, noisy-label audit, class
  * separation, BM25, cross-source matrix, curriculum ordering, skew
  * diagnostics, neighbor Jaccard.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- Maintain.incrJoinView ------------------------------------------

  test("incrJoinView == full recompute, including the delta×delta corner") {
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3"), (4L, "dA4")).toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2"), (4L, "dB4"), (4L, "b4x")).toDF("k", "bv")
    // deltas: k=4 on BOTH sides — the ΔA⋈ΔB term is the only way that
    // pair materializes; dropping it is the classic delta-algebra bug.
    val (baseA, dA) = (a.filter($"k" =!= 4), a.filter($"k" === 4))
    val (baseB, dB) = (b.filter($"k" =!= 4), b.filter($"k" === 4))
    val join = (x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =>
      x.join(y, "k").select($"k", $"av", $"bv")
    val incr = Maintain.incrJoinView(join(baseA, baseB), baseA, baseB, dA, dB, join)
    val full = join(a, b)
    incr.count() shouldBe full.count()
    incr.exceptAll(full).count() shouldBe 0
    full.exceptAll(incr).count() shouldBe 0
    // and the delta×delta corner really is present
    incr.filter($"k" === 4).count() shouldBe 2
  }

  test("incrJoinView maintains a parquet-STORED view — the production shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ijv").toString
    val a = (1L to 40L).map(k => (k, s"a$k")).toDF("k", "av")
    val b = (1L to 40L).flatMap(k => Seq((k, s"b$k"), (k, s"c$k"))).toDF("k", "bv")
    val join = (x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =>
      x.join(y, "k").select($"k", $"av", $"bv")
    val (baseA, dA) = (a.filter($"k" % 9 =!= 0), a.filter($"k" % 9 === 0))
    val (baseB, dB) = (b.filter($"k" % 7 =!= 0), b.filter($"k" % 7 === 0))
    join(baseA, baseB).write.parquet(s"$dir/view")
    val stored = spark.read.parquet(s"$dir/view")
    val maintained = Maintain.incrJoinView(stored, baseA, baseB, dA, dB, join)
    maintained.exceptAll(join(a, b)).count() shouldBe 0
    join(a, b).exceptAll(maintained).count() shouldBe 0
  }

  test("aggregate maintained from joinViewDelta == direct aggregate of the full join") {
    import graft.ops.Maintain
    val a = (1L to 30L).map(k => (k, s"g${k % 3}")).toDF("k", "grp")
    val b = (1L to 30L).flatMap(k => Seq((k, k * 10.0), (k, k * 1.0))).toDF("k", "x")
    val join = (x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =>
      x.join(y, "k").select($"grp", $"x")
    val (baseA, dA) = (a.filter($"k" % 5 =!= 0), a.filter($"k" % 5 === 0))
    val (baseB, dB) = (b.filter($"k" % 4 =!= 0), b.filter($"k" % 4 === 0))
    val maintained = Maintain.finalizeCountSum(
      Maintain.mergeStates(Seq(
        Maintain.countSumState(join(baseA, baseB), Seq("grp"), $"x"),
        Maintain.countSumState(
          Maintain.joinViewDelta(baseA, baseB, dA, dB, join), Seq("grp"), $"x")),
        Seq("grp")), Seq("grp"))
    val direct = Maintain.finalizeCountSum(
      Maintain.countSumState(join(a, b), Seq("grp"), $"x"), Seq("grp"))
    maintained.exceptAll(direct).count() shouldBe 0
    direct.exceptAll(maintained).count() shouldBe 0
  }

  test("incrJoinView traffic law: maintenance moves delta-scale traffic " +
    "while the full recompute shuffles both bases") {
    import graft.ops.{Maintain, Metrics}
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1") // force SMJ for unhinted joins
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-ijvm").toString
      val a = (1L to 4000L).map(k => (k, s"a$k")).toDF("k", "av")
      val b = (1L to 4000L).flatMap(k => Seq((k, s"b$k"), (k, s"c$k"))).toDF("k", "bv")
      val join = (x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =>
        x.join(y, "k").select($"k", $"av", $"bv")
      val (baseA, dA) = (a.filter($"k" % 100 =!= 0), a.filter($"k" % 100 === 0))
      val (baseB, dB) = (b.filter($"k" % 90 =!= 0), b.filter($"k" % 90 === 0))
      join(baseA, baseB).write.parquet(s"$dir/view")
      val stored = spark.read.parquet(s"$dir/view")
      val incr = Metrics.measure(
        Maintain.incrJoinView(stored, baseA, baseB, dA, dB, join))
      val full = Metrics.measure(join(a, b))
      // recompute shuffles both bases through the SMJ...
      full.shuffleRows should be >= 12000L
      // ...maintenance doesn't: the stored view unions through, the
      // delta terms ride explicit broadcasts, so shuffle traffic is
      // delta-scale at most.
      incr.shuffleRows should be <= full.shuffleRows / 10
    } finally spark.conf.set(thresholdKey, saved)
  }

  // ---- Vectors.labelNoiseAudit ----------------------------------------

  test("labelNoiseAudit flags the planted mislabel and clears the clean anchor") {
    // two tight clusters in 4-d; vector 20 sits in cluster A but wears
    // cluster B's label.
    def v(base: Double, j: Int) = Array.tabulate(4)(i => base + 0.01 * j + 0.001 * i)
    val rows =
      (0 until 8).map(j => (j.toLong, 0L, v(1.0, j))) ++ // cluster A, label 0
        (10 until 18).map(j => (j.toLong, 1L, v(-1.0, j))) :+ // cluster B, label 1
        ((20L, 1L, v(1.0, 9))) // in A, labeled 1 → noisy
    val vecs = rows.toDF("vid", "label", "e")
    val anchors = vecs.filter($"vid".isin(0L, 10L, 20L))
      .select($"vid".as("q_id"), $"label".as("q_label"), $"e".as("qe"))
    val out = Vectors.labelNoiseAudit(vecs, anchors, 5)
      .select("vec_id", "noisy").as[(Long, Boolean)].collect().toMap
    out(20L) shouldBe true
    out(0L) shouldBe false
    out(10L) shouldBe false
  }

  // ---- Vectors.labelSeparation ----------------------------------------

  test("labelSeparation: separated labels report inter >> intra") {
    // within-label spread must survive the shared 0..255 quantization
    // grid (which spans BOTH clusters), so spread ~0.5 against a 10.0
    // inter-cluster gap: intra stays non-zero, inter stays dominant.
    def v(base: Double, j: Int) = Array.tabulate(4)(i => base + 0.5 * j + 0.05 * i)
    val vecs = ((0 until 10).map(j => (j.toLong, 0L, v(0.0, j))) ++
      (10 until 20).map(j => (j.toLong, 1L, v(20.0, j)))).toDF("vec_id", "label", "e")
    val rep = Vectors.labelSeparation(vecs, "vec_id", "label", "e")
      .orderBy("label").collect()
    rep.length shouldBe 2
    rep.foreach { r =>
      r.getAs[Long]("n_vecs") shouldBe 10L
      r.getAs[Long]("nearest_d2") should be > r.getAs[Long]("intra_msd")
      r.getAs[Long]("sep_x1000") should be > 1000L
    }
    rep(0).getAs[Long]("nearest_label") shouldBe 1L
    rep(1).getAs[Long]("nearest_label") shouldBe 0L
  }

  // ---- TextOps.bm25Rank -----------------------------------------------

  test("bm25Rank: rarer query term outranks common one; long docs are discounted") {
    val docs = Seq(
      (1L, "rare common common pad pad pad"),
      (2L, "common common common pad pad pad"),
      // same tf of 'rare' as doc 1 but twice the length → discounted
      (3L, "rare common pad pad pad pad pad pad pad pad pad pad"),
      (4L, "pad filler filler filler pad pad")
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Rank(docs, "doc_id", "text", Seq("rare", "common"), 10)
      .as[(Long, Long)].collect()
    val score = out.toMap
    // doc 1 holds the rare term → beats the common-only doc 2
    score(1L) should be > score(2L)
    // doc 3 has doc 1's rare tf at twice the length → scores below doc 1
    score(1L) should be > score(3L)
    // doc 4 contains no query term → absent from the ranking
    score.contains(4L) shouldBe false
  }

  // ---- Dedup.exactPairs / crossSourceMatrix ---------------------------

  test("crossSourceMatrix folds unordered source pairs; composes over any pair frame") {
    val docs = Seq(
      (1L, "alpha text", "srcA"), (2L, "alpha text", "srcB"),
      (3L, "alpha text", "srcB"), (4L, "beta text", "srcA"),
      (5L, "gamma text", "srcC")).toDF("id", "text", "source")
    val m = Dedup.crossSourceMatrix(Dedup.exactPairs(docs, "id", "text"),
        docs, "id", "source")
      .as[(String, String, Long)].collect().toSet
    // pairs in the alpha group: (1,2) (1,3) cross srcA/srcB; (2,3) inside srcB
    m shouldBe Set(("srcA", "srcB", 2L), ("srcB", "srcB", 1L))
    // composes over a hand-made (perceptual/minhash-style) pair frame
    val handPairs = Seq((4L, 5L)).toDF("ia", "ib")
    Dedup.crossSourceMatrix(handPairs, docs, "id", "source")
      .as[(String, String, Long)].collect().toSet shouldBe Set(("srcA", "srcC", 1L))
  }

  // ---- Sampling.curriculumOrder ---------------------------------------

  test("curriculumOrder: bins ascend with pos inside every shard; epochs reshuffle; retry-deterministic") {
    val docs = (0L until 200L).map(i => (i, (i % 7).toInt)).toDF("doc_id", "len7")
    val out = Sampling.curriculumOrder(docs, "doc_id", ($"len7" % 4).cast("long"),
      epochs = 2, shards = 4)
    // curriculum: within each (epoch, shard), bin never decreases as pos grows
    val viol = out.as[(Int, Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._4)).values.map { rows =>
        val sorted = rows.sortBy(_._5).map(_._3)
        sorted.zip(sorted.tail).count { case (x, y) => x > y }
      }.sum
    viol shouldBe 0
    // every example appears exactly once per epoch
    out.groupBy("epoch").count().as[(Int, Long)].collect().toMap
      .values.toSet shouldBe Set(200L)
    // epochs genuinely reshuffle: shard assignment differs somewhere
    val byEpoch = out.select("epoch", "doc_id", "shard")
      .as[(Int, Long, Long)].collect().groupBy(_._1)
      .map { case (e, rs) => e -> rs.map(r => r._2 -> r._3).toMap }
    byEpoch(0) should not equal byEpoch(1)
    // deterministic under repartition (task-retry surrogate)
    val again = Sampling.curriculumOrder(docs.repartition(7), "doc_id",
      ($"len7" % 4).cast("long"), epochs = 2, shards = 4)
    again.exceptAll(out).count() shouldBe 0
  }

  // ---- Vectors.cellOutliers -------------------------------------------

  test("cellOutliers flags the planted stray, spares the tight cluster") {
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 0.0, 1.0, 0.0)),
      (2L, Array(0.0, 0.0, 0.0, 1.0))).toDF("cid", "ce")
    val vecs = ((10 until 20).map(j =>
        (j.toLong, Array(1.0, 0.001 * j, 0.0, 0.0))) :+
        // still nearest to centroid 0, but 60° off-axis → sim ≈ 0.5
        ((99L, Array(0.5, 0.866, 0.0, 0.0)))).toDF("vid", "e")
    val out = Vectors.cellOutliers(vecs, cents, 0.05)
      .select("vec_id").as[Long].collect()
    out.toSeq shouldBe Seq(99L)
  }

  // ---- streaming upsert: batch-structure invariance -------------------

  test("foreachBatch Store.upsert converges to batch latest-by-key under " +
    "multi-batch arrival, including a late batch with older timestamps") {
    import graft.ops.Store
    val dir = java.nio.file.Files.createTempDirectory("graft-st12spec").toString
    def rows(t: (String, Long, Long, Long, String)*) =
      t.toSeq.toDF("day", "user_id", "ts", "event_id", "v")
    // seed state: u1's day-1 row
    Store.latestByKey(rows(("d1", 1L, 1L, 1L, "seed")),
        Seq("day", "user_id"), "ts", "event_id")
      .write.partitionBy("day").parquet(s"$dir/store")
    // two arrival FILES (flat single-file parquet, mtime-ordered so the
    // file source replays f1 then f2); the SECOND carries an OLDER
    // update for (d1,u1) — the merge must keep the newer stored row,
    // not blindly append.
    new java.io.File(s"$dir/feed").mkdirs()
    def one(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-st12part").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dst = new java.io.File(s"$dir/feed", name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    one(rows(("d1", 1L, 3L, 3L, "new"), ("d1", 2L, 2L, 2L, "u2")),
      "f1.parquet", 1700000000000L)
    one(rows(("d1", 1L, 2L, 9L, "stale"), ("d2", 3L, 5L, 5L, "u3")),
      "f2.parquet", 1700000100000L)
    val schema = spark.read.parquet(s"$dir/feed").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/feed")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Store.upsert(spark, s"$dir/store", batch, "day",
          Seq("day", "user_id"), "ts", "event_id")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$dir/store")
      .select("day", "user_id", "event_id", "v")
      .as[(String, Long, Long, String)].collect().toSet
    got shouldBe Set(("d1", 1L, 3L, "new"), ("d1", 2L, 2L, "u2"),
      ("d2", 3L, 5L, "u3"))
  }

  // ---- Temporal.asOfJoinNearest ---------------------------------------

  test("asOfJoinNearest: closer side wins, exact tie goes backward, " +
    "one-sided rows fall through") {
    import graft.ops.Temporal
    val left = Seq(
      (1L, "u", 100L), // back at 90 (d=10), fwd at 130 (d=30) → back
      (2L, "u", 125L), // back at 90 (d=35), fwd at 130 (d=5) → fwd
      (3L, "u", 110L), // back at 90 (d=20), fwd at 130 (d=20) → TIE → back
      (4L, "v", 50L),  // only a forward match exists
      (5L, "w", 50L)   // no match at all
    ).toDF("eid", "k", "lts")
    val right = Seq(("u", 90L, 1L), ("u", 130L, 2L), ("v", 80L, 3L))
      .toDF("k", "rts", "rid")
    val out = Temporal.asOfJoinNearest(left, right, "k",
        leftTs = $"lts", rightTs = $"rts",
        leftCols = Seq("eid", "lts"),
        payloadCols = Seq($"rts", $"rid"), payloadNames = Seq("m_ts", "m_id"),
        rightOrder = $"rid")
      .select("eid", "m_ts", "m_id")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out(1L) shouldBe ((Some(90L), Some(1L)))
    out(2L) shouldBe ((Some(130L), Some(2L)))
    out(3L) shouldBe ((Some(90L), Some(1L))) // tie → backward
    out(4L) shouldBe ((Some(80L), Some(3L)))
    out(5L) shouldBe ((None, None))
  }

  // ---- Vectors.ivfTuning ----------------------------------------------

  test("ivfTuning: scanned count and recall are non-decreasing in nprobe; " +
    "probing every cell recovers brute-force exactly") {
    def v(a: Double, b: Double) = Array(a, b, 0.1, 0.1)
    val vecs = ((1 until 20).map(j => (j.toLong, v(1.0 + 0.01 * j, 0.0))) ++
      (20 until 40).map(j => (j.toLong, v(0.0, 1.0 + 0.01 * j)))).toDF("vid", "e")
    val cents = Seq((0L, v(1.0, 0.0)), (1L, v(0.0, 1.0))).toDF("cid", "ce")
    val query = Seq(Tuple1(v(1.0, 0.05))).toDF("e")
    val t = graft.ops.Vectors.ivfTuning(vecs, cents, query, k = 5, nprobes = Seq(1, 2))
      .orderBy("nprobe").as[(Int, Long, Long)].collect()
    t.map(_._1).toSeq shouldBe Seq(1, 2)
    t(1)._2 should be >= t(0)._2
    t(1)._3 should be >= t(0)._3
    // nprobe = |cells| scans everything → identical to brute force
    t(1)._2 shouldBe 39L
    t(1)._3 shouldBe 1000000L
  }

  test("dimTruncationTuning: full dimension recovers exactly; truncation " +
    "loses the vectors whose signal lives in the cut dimensions") {
    // corpus where vectors 1..5 match the query in dims 0-1 and vectors
    // 6..10 match ONLY via dims 2-3: truncating to d=2 must lose the
    // latter from the top-5.
    val vecs = ((1 to 5).map(j => (j.toLong, Array(1.0, 1.0, 0.0, 0.01 * j))) ++
      (6 to 10).map(j => (j.toLong, Array(0.0, 0.0, 1.0, 1.0 + 0.01 * j))) ++
      (11 to 20).map(j => (j.toLong, Array(-1.0, 0.5, -0.5, 0.02 * j))))
      .toDF("vid", "e")
    val query = Seq(Tuple1(Array(0.1, 0.1, 1.0, 1.0))).toDF("e")
    val t = graft.ops.Vectors.dimTruncationTuning(vecs, query, k = 5, dims = Seq(2, 4))
      .orderBy("dim").as[(Int, Long)].collect()
    t.map(_._1).toSeq shouldBe Seq(2, 4)
    t(1)._2 shouldBe 1000000L // full dim == exact by construction
    t(0)._2 should be < 1000000L // dims 2-3 carried the signal
  }

  // ---- TextOps.blocklistGate ------------------------------------------

  test("blocklistGate: threshold separates topical docs from incidental hits") {
    val docs = Seq(
      (1L, "gore gore violence everywhere"), // topical: 3 hits in cat v
      (2L, "one mention of gore only"),      // incidental: 1 hit
      (3L, "spam spam and also gore"),       // topical in s, incidental in v
      (4L, "perfectly clean text")
    ).toDF("id", "text")
    val out = TextOps.blocklistGate(docs, "id", "text",
        Map("v" -> Seq("gore", "violence"), "s" -> Seq("spam")), threshold = 2)
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    out((1L, "v")) shouldBe ((3L, true))
    out((2L, "v")) shouldBe ((1L, false))
    out((3L, "s")) shouldBe ((2L, true))
    out((3L, "v")) shouldBe ((1L, false))
    out.keys.map(_._1) should not contain 4L // zero-hit docs never materialize
  }

  // ---- Dedup.contaminationReport --------------------------------------

  test("contaminationReport: each benchmark's leak counted independently") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),   // leaks bench A's shingle
      (2L, "epsilon zeta eta theta"),   // leaks bench B's
      (3L, "iota kappa lambda mu")      // clean
    ).toDF("id", "text")
    val bA = Seq((100L, "alpha beta gamma nothing")).toDF("id", "text")
    val bB = Seq((200L, "epsilon zeta eta other")).toDF("id", "text")
    val rep = graft.ops.Dedup.contaminationReport(corpus,
        Seq("A" -> bA, "B" -> bB), "id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rep("A") shouldBe ((1L, 1L)) // doc 1, one shared 3-shingle
    rep("B") shouldBe ((1L, 1L))
  }

  // ---- Dedup.lshTuning ------------------------------------------------

  test("lshTuning: fewer rows per band never loses candidates; verified ⊆ candidates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about spark query planning"),
      (4L, "a completely different document about spark query planning today"),
      (5L, "unrelated text with its own words entirely")).toDF("id", "text")
    val t = graft.ops.Dedup.lshTuning(docs, "id", "text", 3, 16, Seq(2, 4, 8), 0.5)
      .orderBy("rows_per_band")
      .as[(Int, Int, Long, Long, Option[Long])].collect()
    t.map(_._1).toSeq shouldBe Seq(2, 4, 8)
    // banding with fewer rows per band is strictly more permissive:
    // every pair sharing a 2r-row band also shares one of its r-row halves
    t(0)._3 should be >= t(1)._3
    t(1)._3 should be >= t(2)._3
    t.foreach(r => r._4 should be <= r._3)
    // the planted exact pair survives every config
    t.foreach(r => r._4 should be >= 1L)
  }

  // ---- Dedup.lshRecall ------------------------------------------------

  test("lshRecall: recall is monotone non-increasing over nested band " +
    "configs; empty sample degrades to n_true = 0 with null recall") {
    val docs = Seq(
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "the quick brown fox jumps over the lazy dog again and again"),
      (6L, "a completely different document about spark query planning"),
      (8L, "a completely different document about spark query planning today"),
      (10L, "unrelated text with its own words entirely"),
      (12L, "more filler prose so the gated sample keeps several documents"),
      (14L, "yet another page of distinct words to populate the sample")).toDF("id", "text")
    // sampleMod = 1 keeps everything: the recall ordering claim is
    // about banding, not the gate.
    val t = graft.ops.Dedup.lshRecall(docs, "id", "text", 3, 16, Seq(2, 4, 8),
        threshold = 0.5, sampleMod = 1)
      .orderBy("rows_per_band")
      .as[(Int, Int, Long, Long, Option[Long])].collect()
    t.map(_._1).toSeq shouldBe Seq(2, 4, 8)
    // n_true is config-independent by construction
    t.map(_._3).distinct.length shouldBe 1
    t.head._3 should be >= 2L // the exact pair and the near pair are both true
    // nested band boundaries (2 | 4 | 8 all divide 16): a pair sharing
    // a 2r-row band shares one of its r-row halves, so hits (and
    // recall) can only DROP as rows-per-band grows
    t(0)._4 should be >= t(1)._4
    t(1)._4 should be >= t(2)._4
    // the planted exact pair is hit by every config
    t.foreach(r => r._4 should be >= 1L)
    t.foreach(r => r._4 should be <= r._3)
    // a gate that keeps nothing: no truth, no hits, NULL recall —
    // never a division by zero
    val empty = graft.ops.Dedup.lshRecall(docs, "id", "text", 3, 16, Seq(4),
        threshold = 0.5, sampleMod = 1000003)
      .as[(Int, Int, Long, Long, Option[Long])].collect()
    empty.length shouldBe 1
    empty.head._3 shouldBe 0L
    empty.head._4 shouldBe 0L
    empty.head._5 shouldBe None
  }

  // ---- Graph.labelPropagate -------------------------------------------

  test("labelPropagate: two cliques joined by one bridge keep distinct " +
    "communities — where the components closure would merge them") {
    // K4 on {1..4} and K4 on {10..13}, bridged by a single 4–10 edge
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L))).toDF("src", "dst")
    val lab = graft.ops.Graph.labelPropagate(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    val left = Set(1L, 2L, 3L, 4L).map(lab)
    val right = Set(10L, 11L, 12L, 13L).map(lab)
    left.size shouldBe 1
    right.size shouldBe 1
    left should not equal right
    // contrast: the connected-components closure merges everything
    val pairs = edges.select($"src".as("ia"), $"dst".as("ib"))
    graft.ops.Dedup.dupClusters(pairs)
      .select("cluster_id").distinct().count() shouldBe 1L
  }

  // ---- Temporal.theilSenTrend -----------------------------------------

  test("theilSenTrend: one outlier day cannot bend the robust slope") {
    // clean slope +2/day with one wild spike at x=5
    val rows = (0 to 9).map(x =>
      ("k", x.toLong, if (x == 5) 1000L else 100L + 2L * x))
      .toDF("key", "x", "y")
    val out = graft.ops.Temporal.theilSenTrend(rows, "key", "x", "y",
        maxDx = 9, scaleL = 2520L) // lcm(1..9)
      .collect().head
    out.getAs[String]("trend") shouldBe "up"
    // the median pairwise slope is the clean +2/day (×2520), spike ignored
    out.getAs[Long]("slope_scaled") shouldBe 2L * 2520L
    // a least-squares-style mean of slopes WOULD be bent far above 2/day:
    // 9 of 45 pairs involve the spike with |slope| up to 900/day.
  }

  // ---- Sampling.weightedInterleave ------------------------------------

  test("weightedInterleave: slot order respects weights smoothly — a " +
    "weight-2 source appears twice per weight-1 appearance, never in bursts") {
    val docs = ((1 to 12).map(i => (i.toLong, "heavy")) ++
      (101 to 106).map(i => (i.toLong, "light"))).toDF("id", "src")
    val out = Sampling.weightedInterleave(docs, "id", "src",
        Map("heavy" -> 2, "light" -> 1), scaleL = 2L, seed = "t")
      .orderBy("slot", "src", "id")
      .select("src").as[String].collect()
    // slots: heavy i → i·1, light i → i·2; so between consecutive light
    // appearances there are at most 2 heavies — smooth, not front-loaded
    val lightPos = out.zipWithIndex.filter(_._1 == "light").map(_._2)
    lightPos.zip(lightPos.tail).foreach { case (a, b) =>
      (b - a) should be <= 3 }
    out.count(_ == "heavy") shouldBe 12
    // deterministic under repartition
    val again = Sampling.weightedInterleave(docs.repartition(5), "id", "src",
      Map("heavy" -> 2, "light" -> 1), scaleL = 2L, seed = "t")
    again.exceptAll(Sampling.weightedInterleave(docs, "id", "src",
      Map("heavy" -> 2, "light" -> 1), scaleL = 2L, seed = "t")).count() shouldBe 0
  }

  // ---- Temporal.cusumFlags --------------------------------------------

  test("cusumFlags window identity == the sequential max(0, S+d) recurrence") {
    val ys = Seq(5L, 5L, 2L, 9L, 9L, 9L, 1L, 5L, 14L, 0L)
    val target = 5L
    val rows = ys.zipWithIndex.map { case (y, x) => ("k", x.toLong, y) }
      .toDF("key", "x", "y")
    val got = graft.ops.Temporal.cusumFlags(rows, "key", "x", "y",
        lit(target), lit(6L))
      .orderBy("x").select("cusum").as[Long].collect().toSeq
    val expected = ys.scanLeft(0L)((s, y) => math.max(0L, s + y - target)).tail
    got shouldBe expected
    // and the flag fires exactly where the accumulated drift > 6
    val flags = graft.ops.Temporal.cusumFlags(rows, "key", "x", "y",
        lit(target), lit(6L))
      .orderBy("x").select("flagged").as[Boolean].collect().toSeq
    flags shouldBe expected.map(_ > 6L)
  }

  // ---- Store.manifestAudit --------------------------------------------

  test("manifestAudit: healthy table is empty; orphan and ghost files surface") {
    import graft.ops.Store
    val dir = java.nio.file.Files.createTempDirectory("graft-maudit").toString + "/t"
    (1L to 50L).map(i => (i, i % 5)).toDF("v", "p")
      .write.partitionBy("p").parquet(dir)
    Store.refreshManifest(spark, dir, Seq("v"))
    Store.manifestAudit(spark, dir).count() shouldBe 0L
    // orphan: a data file the manifest has never seen
    val part = new java.io.File(s"$dir/p=0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val orphan = new java.io.File(s"$dir/p=0/orphan-copy.parquet")
    java.nio.file.Files.copy(part.toPath, orphan.toPath)
    // ghost: a manifest row whose file is gone
    part.delete()
    val audit = Store.manifestAudit(spark, dir)
      .as[(String, Boolean, Boolean)].collect()
    audit.exists(r => r._1.endsWith("orphan-copy.parquet") && r._2 && !r._3) shouldBe true
    audit.exists(r => r._1.endsWith(part.getName) && !r._2 && r._3) shouldBe true
  }

  // ---- streaming CDC apply: multi-batch composition -------------------

  private def cdcFollowerRun(dir: String,
                             files: Seq[(Seq[(Long, Long, String, String)], String, Long)])
      : Set[(Long, String)] = {
    import graft.ops.Maintain
    // stored state: three keys, seeded as seq-0 inserts WITH their
    // (seq, op) persisted — the applyCdcState contract
    Seq((1L, "v1"), (2L, "v1"), (3L, "v1")).toDF("k", "v")
      .withColumn("seq", lit(0L)).withColumn("op", lit("I"))
      .select("k", "seq", "op", "v")
      .write.parquet(s"$dir/store")
    def one(rows: Seq[(Long, Long, String, String)], name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-st13part").toString
      rows.toDF("k", "seq", "op", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dst = new java.io.File(s"$dir/feed"); dst.mkdirs()
      val out = new java.io.File(dst, name)
      java.nio.file.Files.copy(part.toPath, out.toPath)
      out.setLastModified(mtime)
    }
    files.foreach { case (rows, name, mtime) => one(rows, name, mtime) }
    val schema = spark.read.parquet(s"$dir/feed").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/feed")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val st = spark.read.parquet(s"$dir/store")
        Maintain.applyCdcState(
            st.unionByName(batch.select(st.columns.map(col): _*)),
            "k", "seq", col("seq"), "op", Seq("v"))
          .localCheckpoint(eager = true)
          .write.mode("overwrite").parquet(s"$dir/store")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(s"$dir/store").filter($"op" =!= "D")
      .select("k", "v").as[(Long, String)].collect().toSet
  }

  test("streaming CDC apply composes across batches — a delete in batch 1 " +
    "stays gone until batch 2 re-inserts the key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-st13spec").toString
    cdcFollowerRun(dir, Seq(
      (Seq((1L, 2L, "U", "v2"), (2L, 2L, "D", "v1")), "f1.parquet", 1700000000000L),
      (Seq((2L, 3L, "I", "v9")), "f2.parquet", 1700000100000L))) shouldBe
      Set((1L, "v2"), (2L, "v9"), (3L, "v1"))
  }

  test("streaming CDC apply is ORDER-INDEPENDENT — an older U arriving " +
    "after a newer D does not resurrect the deleted key") {
    // batch 1 deletes key 2 at seq 3; batch 2 arrives LATE carrying the
    // superseded seq-2 update for the same key. With the winning (seq,
    // op) persisted as a tombstone, the late U loses; re-seeding the
    // store at seq 0 each batch (the old formulation) would resurrect.
    val dir = java.nio.file.Files.createTempDirectory("graft-st13ooo").toString
    cdcFollowerRun(dir, Seq(
      (Seq((2L, 3L, "D", "v1")), "f1.parquet", 1700000000000L),
      (Seq((2L, 2L, "U", "v2"), (1L, 2L, "U", "v2")), "f2.parquet", 1700000100000L))) shouldBe
      Set((1L, "v2"), (3L, "v1"))
  }

  // ---- Store.readEvolvedMonth -----------------------------------------

  test("readEvolvedMonth: the transposed month filter prunes BOTH " +
    "partition generations, including the day-partitioned history") {
    import graft.ops.{Metrics, Store}
    val dir = java.nio.file.Files.createTempDirectory("graft-s11spec").toString
    val rows = Seq(
      ("1994-12-03", 1L), ("1994-12-07", 2L), ("1994-11-20", 3L),
      ("1995-01-04", 4L), ("1995-01-09", 5L), ("1995-02-11", 6L))
      .toDF("day", "v")
    rows.filter($"day" < "1995-01-01")
      .write.partitionBy("day").parquet(s"$dir/old")
    rows.filter($"day" >= "1995-01-01")
      .withColumn("month", substring($"day", 1, 7)).drop("day")
      .write.partitionBy("month").parquet(s"$dir/new")
    // full read covers every generation
    Store.readEvolvedMonth(spark, s"$dir/old", s"$dir/new")
      .count() shouldBe 6L
    // a month living in the OLD generation: the day-prefix transposition
    // must partition-prune — only that month's rows leave any scan
    val old1 = Store.readEvolvedMonth(spark, s"$dir/old", s"$dir/new",
      Some("1994-12"))
    old1.select("v").as[Long].collect().toSet shouldBe Set(1L, 2L)
    Metrics.measure(old1).scanRows shouldBe 2L
    // and a month in the NEW generation prunes symmetrically
    val new1 = Store.readEvolvedMonth(spark, s"$dir/old", s"$dir/new",
      Some("1995-01"))
    new1.select("v").as[Long].collect().toSet shouldBe Set(4L, 5L)
    Metrics.measure(new1).scanRows shouldBe 2L
  }

  // ---- Skew.keySkewReport ---------------------------------------------

  test("keySkewReport advises salting exactly when a key dominates") {
    val hot = ((0 until 900).map(_ => "hot") ++ (0 until 100).map(i => s"k$i"))
      .toDF("k")
    val rep = Skew.keySkewReport(hot, "k", "hot").collect().head
    rep.getAs[Long]("max_cnt") shouldBe 900L
    rep.getAs[Long]("top_share_ppm") shouldBe 900000L
    rep.getAs[Boolean]("salt_advised") shouldBe true
    val uniform = (0 until 1000).map(i => s"k${i % 100}").toDF("k")
    Skew.keySkewReport(uniform, "k", "uni").collect()
      .head.getAs[Boolean]("salt_advised") shouldBe false
  }

  // ---- Graph.neighborJaccard ------------------------------------------

  test("neighborJaccard: exact overlap ratios; hot keys excluded from candidates") {
    // node 1 attaches {a,b,c}, node 2 {b,c,d} → co=2, jac = 2/4
    val inc = Seq(("a", 1L), ("b", 1L), ("c", 1L),
      ("b", 2L), ("c", 2L), ("d", 2L), ("d", 3L)).toDF("k", "node")
    val out = Graph.neighborJaccard(inc, 0)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    out((1L, 2L)) shouldBe 500000L
    out((2L, 3L)) shouldBe 333333L // co=1, degs 3+1 → 1e6 div 3
    // a key hotter than maxList contributes no candidate pairs
    val viral = (1L to 50L).map(n => ("viral", n)).toDF("k", "node")
    Graph.neighborJaccard(viral, 0, maxList = 10).count() shouldBe 0
  }

  test("canonicalUrl: every normalization step, and non-defaults survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // case/www/default-port/trailing-slash/fragment noise collapses
      "https://Example.COM/docs/7/"                       -> "https://example.com/docs/7",
      "HTTPS://www.example.com:443/docs/7"                -> "https://example.com/docs/7",
      "https://example.com/docs/7#section-2"              -> "https://example.com/docs/7",
      "https://example.com/docs/7?utm_source=a&utm_b=x"   -> "https://example.com/docs/7",
      "http://example.com:80/"                            -> "http://example.com/",
      // surviving params sort; utm_* dropped from the middle
      "https://example.com/s?b=2&utm_source=x&a=1"        -> "https://example.com/s?a=1&b=2",
      // NON-defaults survive: https on :80, explicit odd port, subdomain
      "https://example.com:80/p"                          -> "https://example.com:80/p",
      "http://example.com:8080/p"                         -> "http://example.com:8080/p",
      "https://api.example.com/p"                         -> "https://api.example.com/p",
      // root path normalizes to a single slash
      "https://example.com"                               -> "https://example.com/",
      "https://example.com///"                            -> "https://example.com/")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), graft.ops.TextOps.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      withClue(s"$in: ") { got(in) shouldBe want }
    }
  }
}
