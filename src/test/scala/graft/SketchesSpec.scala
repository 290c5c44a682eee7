package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bloom, Sketches, TextOps}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- KMV ------------------------------------------------------------

  test("KMV sketch equals the k smallest distinct hashes, any partitioning") {
    val k = 8
    val kmv = Sketches.kmvSketch(k)
    val df = (1 to 500).map(i => s"key${i % 137}").toDF("s")
      .select(TextOps.hash60($"s").as("h"))
    val expected = df.distinct().orderBy("h").as[Long].take(k).toSeq

    for (parts <- Seq(1, 3, 7)) {
      val sk = df.repartition(parts).agg(kmv($"h")).as[Seq[Long]].head()
      sk shouldBe expected
    }
  }

  test("KMV sketch is exact (and the estimate is the count) below k") {
    val k = 64
    val kmv = Sketches.kmvSketch(k)
    val df = (1 to 10).map(i => s"v$i").toDF("s")
      .select(TextOps.hash60($"s").as("h"))
    val out = df.agg(kmv($"h").as("sk"))
      .select(org.apache.spark.sql.functions.size($"sk").as("n"),
        Sketches.kmvEstimate($"sk", k).as("est"),
        Sketches.kmvThreshold($"sk", k).as("kth"))
      .head()
    out.getInt(0) shouldBe 10
    out.getDouble(1) shouldBe 10.0
    out.isNullAt(2) shouldBe true
  }

  test("KMV estimate lands near the true cardinality when full") {
    val k = 64
    val kmv = Sketches.kmvSketch(k)
    val n = 5000
    val df = (1 to n).map(i => s"item-$i").toDF("s")
      .select(TextOps.hash60($"s").as("h"))
    val est = df.agg(kmv($"h").as("sk"))
      .select(Sketches.kmvEstimate($"sk", k)).as[Double].head()
    // std error ~ 1/sqrt(k-2) ~ 13%; allow 4 sigma
    est shouldBe (n.toDouble +- n * 0.5)
  }

  test("KMV merge: sketch of a union == merge of the halves' sketches") {
    val k = 16
    val kmv = Sketches.kmvSketch(k)
    val a = (1 to 300).map(i => s"a$i").toDF("s").select(TextOps.hash60($"s").as("h"))
    val b = (200 to 500).map(i => s"a$i").toDF("s").select(TextOps.hash60($"s").as("h"))
    val whole = a.union(b).agg(kmv($"h")).as[Seq[Long]].head()
    // union() concatenates partitions, so the aggregator must merge
    // per-partition sketches — compare against a single-partition run
    val serial = a.union(b).coalesce(1).agg(kmv($"h")).as[Seq[Long]].head()
    whole shouldBe serial
  }

  // ---- Count-Min -------------------------------------------------------

  test("CMS estimates never undercount, and are exact for unique cells") {
    val depth = 4; val width = 512
    val words = Seq.fill(200)("the") ++ Seq.fill(90)("cat") ++
      (1 to 150).map(i => s"rare$i")
    val toks = words.toDF("term")
    val cells = Sketches.cmsCells(toks, $"term", depth, width)
    // total mass per row of the matrix == input count
    val mass = cells.groupBy("seed").agg(sum($"cnt").as("m"))
      .select("m").as[Long].collect()
    all(mass) shouldBe words.size.toLong

    val exact = toks.groupBy("term").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(cells, exact.select("term"), depth, width)
    val joined = est.join(exact, "term")
      .select($"term", $"est_cnt", $"exact").collect()
    joined.foreach { r =>
      r.getLong(1) should be >= r.getLong(2)
    }
    // the heavy hitters collide with ~nothing at this width
    joined.filter(r => r.getString(0) == "the" || r.getString(0) == "cat")
      .foreach(r => r.getLong(1) shouldBe r.getLong(2))
  }

  // ---- Bloom join pruning ---------------------------------------------

  test("bloom-pruned join is row-identical to the plain join") {
    val orders = Tables.orders(spark, sf)
    val dim = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val pruned = Bloom.prunedJoin(orders, dim, "o_custkey", "c_custkey", 10000L)
      .select($"o_orderkey", $"c_custkey").orderBy("o_orderkey")
    val plain = orders.join(dim, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey").orderBy("o_orderkey")
    pruned.collect() shouldBe plain.collect()
  }

  test("bloom pre-gate filters the fact side below the join exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sf)
      val dim = Tables.customer(spark, sf)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val pruned = Bloom.prunedJoin(orders, dim, "o_custkey", "c_custkey", 10000L)
      val plan = pruned.queryExecution.executedPlan.toString
      // the UDF gate must sit in the fact scan's stage (below the
      // exchange), not above the join
      val gateIdx = plan.indexOf("UDF(o_custkey")
      gateIdx should be >= 0
      val joinIdx = plan.indexOf("SortMergeJoin")
      joinIdx should be >= 0
      gateIdx should be > joinIdx // printed below the join == earlier in execution
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ---- registered sketch queries oracle smoke -------------------------

  // ---- HLL ------------------------------------------------------------

  test("HLL registers: bucket/rank bit extraction and zero-filled grid") {
    // p=6 → rem=54. Hand-placed hashes: bucket = h >> 54, w = low 54 bits.
    val rows = Seq(
      (3L << 54) | 1L,          // bucket 3, w=1 → msb 1 → rank 54
      (3L << 54),               // bucket 3, w=0 → rank 55 (wins the max)
      (0L << 54) | (1L << 53),  // bucket 0, top remainder bit → rank 1
      (63L << 54) | (1L << 10)  // bucket 63, msb 11 → rank 44
    ).toDF("h").withColumn("g", lit("x"))
    val regs = Sketches.hllRegisters(rows, Seq("g"), $"h", p = 6)
      .select("bucket", "r").as[(Long, Long)].collect().toMap
    regs.size shouldBe 64 // full grid, absent buckets zero-filled
    regs(3L) shouldBe 55L
    regs(0L) shouldBe 1L
    regs(63L) shouldBe 44L
    regs(17L) shouldBe 0L
  }

  test("HLL merge property: registers of a union == max-merge of slices") {
    val a = (1 to 300).map(i => s"a$i").toDF("s").select(TextOps.hash60($"s").as("h"), lit("g").as("g"))
    val b = (1 to 300).map(i => s"b$i").toDF("s").select(TextOps.hash60($"s").as("h"), lit("g").as("g"))
    val unioned = Sketches.hllRegisters(a.union(b), Seq("g"), $"h", 6)
      .select("bucket", "r").as[(Long, Long)].collect().toMap
    val ra = Sketches.hllRegisters(a, Seq("g"), $"h", 6)
      .select("bucket", "r").as[(Long, Long)].collect().toMap
    val rb = Sketches.hllRegisters(b, Seq("g"), $"h", 6)
      .select("bucket", "r").as[(Long, Long)].collect().toMap
    unioned shouldBe ra.map { case (k, v) => k -> math.max(v, rb(k)) }
  }

  test("HLL raw estimate lands near the true cardinality when registers fill") {
    val n = 5000
    val df = (1 to n).map(i => s"v$i").toDF("s")
      .select(TextOps.hash60($"s").as("h"), lit("g").as("g"))
    val regs = Sketches.hllRegisters(df, Seq("g"), $"h", 6)
    val (nZero, est) = Sketches.hllEstimate(regs, Seq("g"), 6)
      .select("n_zero", "est_raw").as[(Long, Double)].head()
    nZero shouldBe 0L
    // raw HLL at m=64 has ~13% relative error (1.04/sqrt(64))
    est shouldBe (n.toDouble +- n * 0.35)
  }

  test("KMV buffer doubles as a truncated posting list (bottom-16 distinct ids)") {
    // a "term" seen in 20 docs (with repeats) keeps exactly doc ids 1..16
    val kmv = Sketches.kmvSketch(16)
    val docs = ((1 to 20) ++ (5 to 9)).map(_.toLong).toDF("doc_id")
    val got = docs.repartition(3).agg(kmv($"doc_id")).as[Seq[Long]].head()
    got shouldBe (1L to 16L)
  }

  test("q_k1_kmv / q_k2_cms run and keep their invariants") {
    val k1 = SketchQueries.k1Kmv(spark, sf).collect()
    k1.length shouldBe 5 // one row per event_type
    k1.foreach { r =>
      val exact = r.getLong(1)
      val est = r.getDouble(3)
      if (exact < 64) est shouldBe exact.toDouble
      else est shouldBe (exact.toDouble +- exact * 0.8)
    }
    val k2 = SketchQueries.k2Cms(spark, sf).collect()
    k2.length shouldBe 20
    k2.foreach(r => r.getLong(2) should be >= r.getLong(1))
  }

  // ---- bottom-k quantile sketch ---------------------------------------

  /** Driver-side twin of TextOps.hash60 (first 15 md5 hex chars as a
    * 60-bit Long) for building spec fixtures without a Spark roundtrip.
    */
  private def h60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)

  test("bottom-k quantile sketch: shard-merge equals the direct sketch, any partitioning") {
    val k = 32
    val bk = Sketches.bottomKSketch(k)
    val df = (1 to 2000).map { i =>
      (s"g${i % 2}", s"shard${i % 7}",
        h60(s"row-$i"), (i * 37 % 991).toDouble)
    }.toDF("g", "shard", "h", "v")
    val direct = df.groupBy("g").agg(bk($"h", $"v").as("sk"))
      .orderBy("g").as[(String, Seq[(Long, Double)])].collect()
    for (parts <- Seq(1, 3, 8)) {
      val shards = df.repartition(parts).groupBy("g", "shard")
        .agg(bk($"h", $"v").as("sk"))
      val merged = shards
        .select($"g", explode($"sk").as("c"))
        .select($"g", $"c._1".as("h"), $"c._2".as("v"))
        .groupBy("g").agg(bk($"h", $"v").as("sk"))
        .orderBy("g").as[(String, Seq[(Long, Double)])].collect()
      merged shouldBe direct
    }
    // sorted by (h, v), length == k, and == the k smallest rows
    direct.foreach { case (_, sk) =>
      sk.length shouldBe k
      sk shouldBe sk.sortBy(identity)
    }
  }

  test("bottom-k quantile sketch keeps duplicate (h, v) pairs (multiset semantics)") {
    val bk = Sketches.bottomKSketch(4)
    val df = Seq((1L, 5.0), (1L, 5.0), (2L, 7.0), (3L, 1.0), (9L, 9.0))
      .toDF("h", "v")
    val sk = df.repartition(2).agg(bk($"h", $"v")).as[Seq[(Long, Double)]].head()
    sk shouldBe Seq((1L, 5.0), (1L, 5.0), (2L, 7.0), (3L, 1.0))
  }

  test("quantile sketch accuracy contract: sample percentile rank error within 4 sigma") {
    // k=64 sample of n=5000 skewed values; the p-quantile estimate's
    // true CDF position must sit within p ± 4·sqrt(p(1-p)/k).
    val k = 64
    val bk = Sketches.bottomKSketch(k)
    val n = 5000
    val df = (1 to n).map { i =>
      (h60(s"id-$i"), math.pow(i.toDouble, 2.5))
    }.toDF("h", "v")
    val sk = df.agg(bk($"h", $"v")).as[Seq[(Long, Double)]].head()
    val sample = sk.map(_._2).sorted
    val all = (1 to n).map(i => math.pow(i.toDouble, 2.5)).sorted
    for (p <- Seq(0.5, 0.9)) {
      val est = sample(math.ceil(p * sample.length).toInt - 1)
      val cdfPos = all.count(_ <= est).toDouble / n
      val tol = 4.0 * math.sqrt(p * (1 - p) / k)
      math.abs(cdfPos - p) should be <= tol
    }
  }

  test("stored sketch table: parquet round-trip + incremental day append, rollup == direct") {
    // The k8 shape end to end: per-day sketches persisted as a parquet
    // table, a NEW day appended without touching history, and the
    // weekly rollup computed from stored sketches alone — identical to
    // sketching the raw union directly.
    val k = 16
    val kmv = Sketches.kmvSketch(k)
    val path = java.nio.file.Files.createTempDirectory("graft-sktbl").toString + "/t"
    def day(n: Int) = (1 to 400).map(i => (s"d$n", h60(s"u${(i * (n + 7)) % 997}")))
      .toDF("day", "h")
    val history = day(1).union(day(2)).union(day(3))
    history.groupBy("day").agg(kmv($"h").as("sk"))
      .write.parquet(path) // the stored sketch table
    // a new day arrives: ONE new row appended, history untouched
    day(4).groupBy("day").agg(kmv($"h").as("sk"))
      .write.mode("append").parquet(path)
    val rolledUp = spark.read.parquet(path)
      .select(explode($"sk").as("h"))
      .agg(kmv($"h")).as[Seq[Long]].head()
    val direct = history.union(day(4))
      .agg(kmv($"h")).as[Seq[Long]].head()
    rolledUp shouldBe direct
  }

  // ---- heavy hitters ---------------------------------------------------

  test("heavy hitters: bounds bracket truth and nothing above the threshold sum is missed") {
    // Skewed vocabulary over 6 shards: global heavy terms spread thin so
    // per-shard lists genuinely truncate.
    val rows = for {
      shard <- 0 until 6
      (term, cnt) <- (1 to 40).map(t => (s"t$t", 1 + (41 - t) * (1 + (t + shard) % 3)))
      _ <- 1 to cnt
    } yield (s"s$shard", term)
    val toks = rows.toDF("shard", "term")
    val m = 8
    val summ = Sketches.hhShardSummaries(toks, $"shard", $"term", m)
    val thr = Sketches.hhThresholds(summ, m)
    val bounds = Sketches.hhMergedBounds(summ, thr)
    val exact = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val thrTotal = thr.agg(sum($"thr")).as[Long].head()
    val got = bounds.as[(String, Long, Long)].collect()
    got.length should be > 0
    // lb <= true <= ub for every candidate
    got.foreach { case (t, lb, ub) =>
      lb should be <= exact(t)
      exact(t) should be <= ub
    }
    // never-miss: every term with true count > sum(thresholds) is a candidate
    val cands = got.map(_._1).toSet
    exact.foreach { case (t, c) =>
      if (c > thrTotal) withClue(s"term $t (count $c > thrTotal $thrTotal) missed: ") {
        cands should contain(t)
      }
    }
    // sanity: the data actually exercises the guarantee (some term above,
    // some vocabulary below)
    exact.values.count(_ > thrTotal) should be > 0
    exact.size should be > cands.size
  }

  test("weighted heavy hitters: bounds bracket summed weights (trade-count-style)") {
    // one row per (shard, term, weight): ranks by Σweight, not row count
    val rows = for {
      shard <- 0 until 4
      t <- 1 to 30
    } yield (s"s$shard", s"t$t", ((31 - t).toLong * (1 + (t + shard) % 4)))
    val toks = rows.toDF("shard", "term", "w")
    val m = 6
    val summ = Sketches.hhShardSummaries(toks, $"shard", $"term", m, Some($"w"))
    val thr = Sketches.hhThresholds(summ, m)
    val bounds = Sketches.hhMergedBounds(summ, thr)
    val exact = toks.groupBy("term").agg(sum($"w").as("tw"))
      .as[(String, Long)].collect().toMap
    val thrTotal = thr.agg(sum($"thr")).as[Long].head()
    val got = bounds.as[(String, Long, Long)].collect()
    got.foreach { case (t, lb, ub) =>
      lb should be <= exact(t)
      exact(t) should be <= ub
    }
    val cands = got.map(_._1).toSet
    exact.foreach { case (t, c) =>
      if (c > thrTotal) cands should contain(t)
    }
    exact.values.count(_ > thrTotal) should be > 0 // guarantee exercised
  }

  test("heavy hitters: complete shard lists give thr 0 and lb == ub == exact") {
    val toks = Seq.tabulate(30)(i => (s"s${i % 2}", s"w${i % 3}")).toDF("shard", "term")
    val m = 10 // vocabulary (3) fits: every shard list is complete
    val summ = Sketches.hhShardSummaries(toks, $"shard", $"term", m)
    val thr = Sketches.hhThresholds(summ, m)
    thr.as[(String, Long)].collect().foreach(_._2 shouldBe 0L)
    val exact = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    Sketches.hhMergedBounds(summ, thr).as[(String, Long, Long)].collect()
      .foreach { case (t, lb, ub) =>
        lb shouldBe exact(t)
        ub shouldBe exact(t)
      }
  }

  test("register-wise window MAX equals the sketch of the unioned days") {
    import spark.implicits._
    import graft.ops.{Sketches, TextOps}
    // Two days of keys with overlap; merging day sketches by per-bucket
    // MAX must equal the sketch built from the union of the raw keys —
    // the temporal analogue of the k3/k5 spatial merge gates, and the
    // property q_k9's sliding window rests on.
    val p = 6
    val d1 = (1 to 200).map(i => ("d1", s"u$i"))
    val d2 = (150 to 400).map(i => ("d2", s"u$i"))
    val src = (d1 ++ d2).toDF("day", "k")
      .select($"day", TextOps.hash60($"k").as("h"))
    val perDay = Sketches.hllRegisters(src, Seq("day"), $"h", p)
    val mergedMax = perDay.groupBy($"bucket").agg(max($"r").as("r"))
      .as[(Long, Long)].collect().toMap
    val union = Sketches.hllRegisters(
        src.withColumn("day", lit("all")), Seq("day"), $"h", p)
      .select($"bucket", $"r").as[(Long, Long)].collect().toMap
    mergedMax shouldBe union
  }

  test("KMV intersection estimate: exact when sketches lossless, 4-sigma when full") {
    import spark.implicits._
    import graft.ops.{Sketches, TextOps}
    val k = 64
    val kmv = Sketches.kmvSketch(k)
    // Two overlapping key sets, both ≫ k so the sketches are full:
    // |A| = 600, |B| = 600, |A∩B| = 200.
    def sketchOf(keys: Seq[Int]): Seq[Long] = keys.toDF("k")
      .select(TextOps.hash60($"k".cast("string")).as("h"))
      .agg(kmv($"h")).collect().head.getSeq[Long](0)
    val sa = sketchOf(1 to 600)
    val sb = sketchOf(401 to 1000)
    val merged = (sa ++ sb).distinct.sorted.take(k)
    val theta = merged.last
    val nMatch = merged.count(h => sa.contains(h) && sb.contains(h))
    val estInter = nMatch.toDouble * (k - 1) * Sketches.Exp60 / k / theta
    // σ ≈ |A∪B|/√k on the union estimate; the intersection inherits it.
    val sigma = 1000.0 / math.sqrt(k)
    math.abs(estInter - 200.0) should be <= 4 * sigma
    // Small sets: sketches hold everything; the intersection is exact.
    val ta = sketchOf(1 to 30); val tb = sketchOf(21 to 50)
    val tMerged = (ta ++ tb).distinct.sorted.take(k)
    tMerged.length should be < k
    tMerged.count(h => ta.contains(h) && tb.contains(h)) shouldBe 10
  }
}
