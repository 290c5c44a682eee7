package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sampling, TextOps}

class SamplingSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, s"src${i % 10}", s"lang${i % 5}"))
      .toDF("id", "source", "lang")
  }

  test("hashSample is deterministic, repartition-invariant, and near the target rate") {
    val a = Sampling.hashSample(docs, col("id"), 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), col("id"), 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    a shouldBe b // membership depends only on the key, never the partitioning
    a.size.toDouble / 2000 shouldBe 0.2 +- 0.05
    // Different salts give (near-)independent samples, not the same set.
    val c = Sampling.hashSample(docs, col("id"), 0.2, salt = "other")
      .select("id").collect().map(_.getLong(0)).toSet
    c should not equal a
  }

  test("stratifiedSample returns exactly k per stratum, deterministically") {
    val out = Sampling.stratifiedSample(docs, col("lang"), col("id"), k = 15)
    val perLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.values.toSet shouldBe Set(15L)
    perLang.keySet should have size 5
    // Same invocation twice → identical membership (no rand()).
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(docs, col("lang"), col("id"), k = 15)
      .select("id").collect().map(_.getLong(0)).toSet
    ids1 shouldBe ids2
  }

  test("mixtureSample applies per-source rates with the default fallback") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.0)
    val out = Sampling.mixtureSample(docs, col("source"), col("id"),
      rates, defaultRate = 0.5)
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc("src0") shouldBe 200L          // rate 1.0 keeps all 200
    bySrc.get("src1") shouldBe None      // rate 0.0 keeps none
    // the other eight sources sit near 50% of their 200 rows
    val rest = bySrc.filterKeys(k => k != "src0").values
    all(rest.map(_.toDouble / 200)) shouldBe 0.5 +- 0.15
  }

  test("hashSample fractions nest: sample(f1) is a subset of sample(f2) for f1 <= f2") {
    // The gate is `bucket < f*10000`, so growing the fraction can only
    // ADD rows — incremental corpus growth never resamples old docs.
    val s10 = Sampling.hashSample(docs, col("id"), 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    val s30 = Sampling.hashSample(docs, col("id"), 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    s10.subsetOf(s30) shouldBe true
    s10.size should be < s30.size
  }

  test("stratifiedSample quotas nest: k=5 rows are the first 5 of k=15") {
    val k5 = Sampling.stratifiedSample(docs, col("lang"), col("id"), k = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val k15 = Sampling.stratifiedSample(docs, col("lang"), col("id"), k = 15)
      .select("id").collect().map(_.getLong(0)).toSet
    k5.subsetOf(k15) shouldBe true
  }

  test("stratifiedSampleScalable returns exactly the plain window's rows") {
    val plain = Sampling.stratifiedSample(docs, col("lang"), col("id"), k = 15)
      .select("id").collect().map(_.getLong(0)).toSet
    val scalable = Sampling.stratifiedSampleScalable(docs, col("lang"), col("id"), k = 15)
      .select("id").collect().map(_.getLong(0)).toSet
    scalable shouldBe plain
  }

  test("stratifiedSampleScalable stays exact when the gate comes up short") {
    // oversample ≈ 0 forces an empty gate for every stratum — the
    // deficiency fallback must recompute ungated, not return less.
    val starved = Sampling.stratifiedSampleScalable(
        docs, col("lang"), col("id"), k = 15, oversample = 1e-6)
      .select("id").collect().map(_.getLong(0)).toSet
    val plain = Sampling.stratifiedSample(docs, col("lang"), col("id"), k = 15)
      .select("id").collect().map(_.getLong(0)).toSet
    starved shouldBe plain
  }

  test("packSequences two-phase prefix sum equals the global-window cumsum") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sized = docs.withColumn("n_tok", (col("id") % 37 + 1).cast("long"))
    val packed = Sampling.packSequences(sized, col("id"), col("n_tok"),
        budget = 100L, buckets = 8)
      .select("id", "block_id", "block_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Reference: single global window (the formulation that does NOT
    // scale — one task sorts everything — but is obviously correct).
    val h = graft.ops.TextOps.seededHash60(lit("pack"), col("id").cast("string"))
    val ref = sized.withColumn("__h", h)
      .withColumn("cum", sum("n_tok").over(Window.orderBy(col("__h"), col("id"))))
      .withColumn("start", col("cum") - col("n_tok"))
      .select(col("id"), (col("start") - pmod(col("start"), lit(100L))) / 100L,
        pmod(col("start"), lit(100L)))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1).toLong, r.getLong(2))).toMap
    packed shouldBe ref
    // Start-blocks are contiguous from 0 (n_tok < budget here, so
    // consecutive starts can never skip a block).
    val ids = packed.values.map(_._1).toSet
    ids shouldBe (0L to ids.max).toSet
  }

  test("redact scrubs emails, IPs, and long digit runs; leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "mail me at john.doe+x@sub.example.org today",
      "server 192.168.0.1 and card 1234567890 leaked",
      "ip-ish 1.2.3 stays, short 12345678 stays",
      "clean text with no pii at all")
      .toDF("text").select(TextOps.redact(col("text")).as("r"))
      .collect().map(_.getString(0))
    rows(0) shouldBe "mail me at <EMAIL> today"
    rows(1) shouldBe "server <IP> and card <NUM> leaked"
    rows(2) shouldBe "ip-ish 1.2.3 stays, short 12345678 stays"
    rows(3) shouldBe "clean text with no pii at all"
  }

  test("weightedSample: exact k, deterministic, partitioning-invariant") {
    import spark.implicits._
    val df = (1 to 400).map(i => (s"k$i", if (i % 4 == 0) 5.0 else 0.5))
      .toDF("key", "w")
    val a = Sampling.weightedSample(df, col("key"), col("w"), 60)
      .select("key").as[String].collect().sorted.toSeq
    val b = Sampling.weightedSample(df.repartition(7), col("key"), col("w"), 60)
      .select("key").as[String].collect().sorted.toSeq
    a.length shouldBe 60
    b shouldBe a
  }

  test("weightedSample matches the naive full-sort ES formulation") {
    import spark.implicits._
    val df = (1 to 300).map(i => (s"k$i", 0.1 + (i % 7))).toDF("key", "w")
    val h = TextOps.seededHash60(lit("wsample"), col("key"))
    val es = pow((h + 1).cast("double") / lit((1L << 60).toDouble), lit(1.0) / col("w"))
    val naive = df.withColumn("__es", es).orderBy(col("__es").desc, h.asc)
      .limit(40).select("key").as[String].collect().toSet
    val got = Sampling.weightedSample(df, col("key"), col("w"), 40)
      .select("key").as[String].collect().toSet
    got shouldBe naive
  }

  test("weightedSample favors heavier rows across independent salts") {
    import spark.implicits._
    // 400 rows, 100 heavy (w=5) vs 300 light (w=0.5); k=80. E[heavy in
    // sample] far exceeds E[light]; sum over 5 salts to de-noise.
    val df = (1 to 400).map(i => (s"k$i", i <= 100))
      .toDF("key", "heavy")
      .withColumn("w", when(col("heavy"), 5.0).otherwise(0.5))
    val counts = (1 to 5).map { s =>
      Sampling.weightedSample(df, col("key"), col("w"), 80, salt = s"ws$s")
        .groupBy("heavy").count().as[(Boolean, Long)].collect().toMap
    }
    val heavy = counts.map(_.getOrElse(true, 0L)).sum
    val light = counts.map(_.getOrElse(false, 0L)).sum
    heavy + light shouldBe 400L // 5 salts x k=80
    // with these weights the heavy class should win a large majority
    heavy.toDouble should be > light.toDouble * 1.5
  }

  test("p9 pack slices: conservation, block fullness, within-doc contiguity") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val B = 2048L
    val slices = PipelineQueries.p9PackSlices(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    val nTok = graft.Tables.documents(spark, d)
      .select($"doc_id",
        org.apache.spark.sql.functions.size(graft.ops.TextOps.tokens($"text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    // conservation: every document's slices sum to its token count
    slices.groupBy(_._1).foreach { case (id, ss) =>
      withClue(s"doc $id: ") { ss.map(_._4).sum shouldBe nTok(id) }
    }
    // block fullness: every block except the highest holds exactly B
    val byBlock = slices.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastBlock = byBlock.keys.max
    byBlock.foreach { case (b, tot) =>
      if (b != lastBlock) withClue(s"block $b: ") { tot shouldBe B }
      else tot should be <= B
    }
    // contiguity: a straddler's slices advance by exactly the previous
    // slice length (no gaps, no overlap)
    slices.groupBy(_._1).foreach { case (id, ss) =>
      val ordered = ss.sortBy(_._2).toList
      ordered.sliding(2).foreach {
        case List((_, b1, st1, ln1), (_, b2, st2, _)) =>
          withClue(s"doc $id blocks $b1->$b2: ") {
            b2 shouldBe b1 + 1
            st2 shouldBe st1 + ln1
          }
        case _ =>
      }
    }
    // straddlers actually exist in the corpus (the operator is exercised)
    slices.groupBy(_._1).count(_._2.length > 1) should be > 0
  }

  test("p8 cluster-aware split: no near-dup pair ever straddles a split boundary") {
    import spark.implicits._
    // The dedup corpus plants near-dups (id ↔ id+100000, id%5==0) and
    // exact dups (id ↔ id+200000, id%7==0). Leakage-safety means every
    // such pair — and transitively every cluster — lands whole on one
    // side of the split; q_p5's per-doc gate demonstrably does NOT
    // guarantee this, which is the point of p8.
    val d = "/root/testdata/sf0.001"
    val split = PipelineQueries.p8ClusterSplit(spark, d)
      .select("id", "split").as[(Long, String)].collect().toMap
    val pairs = graft.ops.Dedup.nearDupPairs(
        PipelineQueries.corpus(spark, d), "id", "text")
      .select("ia", "ib").as[(Long, Long)].collect()
    pairs.length should be > 0
    pairs.foreach { case (a, b) =>
      withClue(s"near-dup pair ($a, $b) split across sides: ") {
        split(a) shouldBe split(b)
      }
    }
    // the split itself is a real 80/10/10-ish partition, not degenerate
    val bySide = split.values.groupBy(identity).view.mapValues(_.size).toMap
    bySide.keySet shouldBe Set("train", "val", "test")
  }

  test("groupSample: k rows per group, small groups whole, partitioning-invariant") {
    import spark.implicits._
    import graft.ops.Sampling
    val rows = (1L to 500L).map(i => (if (i % 2 == 0) "a" else "b", i)) ++
      Seq(("c", 1001L), ("c", 1002L), ("c", 1003L))
    val df = rows.toDF("g", "id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.groupSample(d, col("g"), col("id"), 10)
        .as[(String, Long)].collect().sorted.toSeq
    val base = run(df)
    base.groupBy(_._1).view.mapValues(_.size).toMap shouldBe
      Map("a" -> 10, "b" -> 10, "c" -> 3)
    // the winners are a property of the data, not the physical layout
    run(df.repartition(7)) shouldBe base
    run(df.orderBy(col("id").desc)) shouldBe base
  }

  test("coverSelect is greedy-optimal on a planted overlap geometry, " +
    "zero-gain rounds still pick deterministically") {
    import spark.implicits._
    // doc 1 covers {1..6}; doc 2 covers {1..4, 7, 8} (gain 2 after 1);
    // doc 3 covers {5, 6, 7, 8} (gain 0 after 1 and 2); doc 4 = {9}
    val feats = (
      (1L to 6L).map(h => (1L, h)) ++
        Seq(1L, 2L, 3L, 4L, 7L, 8L).map(h => (2L, h)) ++
        Seq(5L, 6L, 7L, 8L).map(h => (3L, h)) ++
        Seq((4L, 9L))
      ).toDF("id", "h")
    val out = Sampling.coverSelect(feats, k = 4)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // greedy: 1 (6 new), 2 (+2: 7,8), 4 (+1: 9), then 3 at gain 0 —
    // still emitted, lowest unpicked id, cumulative total flat
    out shouldBe Seq((1, 1L, 6L, 6L), (2, 2L, 2L, 8L),
      (3, 4L, 1L, 9L), (4, 3L, 0L, 9L))
    // layout invariance: the pick sequence is data, not partitioning
    Sampling.coverSelect(feats.repartition(5), k = 4)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq shouldBe out
  }
}
