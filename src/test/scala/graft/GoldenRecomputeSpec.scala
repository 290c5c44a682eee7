package graft

import scala.collection.mutable

/** Independent driver-side recomputations of the round-4 query batch
  * (q_e9 / q_t14 / q_g7) over the sf0.001 tables: each test re-derives
  * the full expected result in plain Scala — separate code path from
  * both the Spark plan and the DuckDB oracle — and asserts row-for-row
  * equality. Complements the driver gate with a third formulation.
  */
class GoldenRecomputeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Shared PQ machinery for the e9/e10 recomputes: int8 codes, per-
    * subspace distances, the vid-0 ADC table, and the approximate
    * (ADC) distance for every corpus vector — all in plain Scala.
    */
  private lazy val pq = new {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    val dims = vecs.values.head.length
    // Per-dim lo/hi over ALL vectors (quantizeCodes semantics).
    val lo = Array.tabulate(dims)(p => vecs.values.map(_(p)).min)
    val hi = Array.tabulate(dims)(p => vecs.values.map(_(p)).max)
    def codesOf(v: Array[Double]): Array[Long] = Array.tabulate(dims) { p =>
      if (hi(p) == lo(p)) 0L
      else math.floor((v(p) - lo(p)) * 255.0 / (hi(p) - lo(p)) + 0.5).toLong
    }
    val coded = vecs.map { case (id, v) => id -> codesOf(v) }
    def subD2(a: Array[Long], b: Array[Long], s: Int): Long =
      (s * 16 until (s + 1) * 16).map(p => (a(p) - b(p)) * (a(p) - b(p))).sum
    def fullD2(a: Array[Long], b: Array[Long]): Long =
      (0 until dims).map(p => (a(p) - b(p)) * (a(p) - b(p))).sum
    // ADC table from query vec 0; corpus = vids > 16 assigned per subspace.
    val q = coded(0L)
    val adc = Array.tabulate(4, 17)((s, cid) =>
      if (cid == 0) Long.MaxValue else subD2(q, coded(cid.toLong), s))
    val adcDist: Map[Long, Long] = coded.keys.filter(_ > 16L).map { id =>
      id -> (0 until 4).map { s =>
        // argmin over codebook, ties to smallest cid (pqAssign's order)
        val cid = (1 to 16).minBy(c => (subD2(coded(id), coded(c.toLong), s), c))
        adc(s)(cid)
      }.sum
    }.toMap
  }

  test("q_e9_pq_search equals a brute-force ADC recompute (quantize → assign → lookup)") {
    val expected = pq.adcDist.toSeq.sortBy { case (id, d) => (d, id) }.take(10)
      .map { case (id, d) => (id, d) }
    val got = PipelineQueries.e9PqSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe expected
  }

  test("q_e10_rerank equals ADC-shortlist-then-exact recompute") {
    val shortlist = pq.adcDist.toSeq.sortBy { case (id, d) => (d, id) }.take(100)
    val expected = shortlist
      .map { case (id, ad) => (id, ad, pq.fullD2(pq.coded(id), pq.q)) }
      .sortBy { case (id, _, ed) => (ed, id) }.take(10)
    val got = PipelineQueries.e10Rerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  test("q_t14_bigram_lm equals a plain-Scala bigram count recompute") {
    val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val pairCounts = mutable.Map.empty[(String, String), Long]
    for (t <- texts) {
      // ShingleGenerator semantics: split(\s+, limit -1), sliding pairs.
      val toks = t.toLowerCase.split("\\s+", -1)
      if (toks.length >= 2)
        toks.sliding(2).foreach { case Array(w1, w2) =>
          if (w1.length >= 2 && w2.length >= 2)
            pairCounts((w1, w2)) = pairCounts.getOrElse((w1, w2), 0L) + 1L
        }
    }
    val w1Totals = pairCounts.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val expected = pairCounts.toSeq
      .map { case ((w1, w2), n) =>
        (w1, w2, n, w1Totals(w1), n * 1000000L / w1Totals(w1))
      }
      .filter(_._3 >= 5L)
      .sortBy(r => (r._1, r._2))

    val got = PipelineQueries.t14BigramLm(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    got shouldBe expected
  }

  test("q_t15_lm_score equals a plain-Scala LM-scoring recompute") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def bigrams(t: String): Seq[(String, String)] = {
      val toks = t.toLowerCase.split("\\s+", -1)
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).collect {
        case Array(w1, w2) if w1.length >= 2 && w2.length >= 2 => (w1, w2)
      }.toSeq
    }
    val pairCounts = mutable.Map.empty[(String, String), Long]
    texts.foreach { case (_, t) =>
      bigrams(t).foreach(p => pairCounts(p) = pairCounts.getOrElse(p, 0L) + 1L)
    }
    val w1Totals = pairCounts.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val lm = pairCounts.collect {
      case (p, n) if n >= 5L => p -> (n * 1000000L / w1Totals(p._1))
    }.toMap
    val expected = texts.flatMap { case (id, t) =>
      val bg = bigrams(t)
      if (bg.isEmpty) None
      else {
        val sumP = bg.map(p => lm.getOrElse(p, 0L)).sum
        Some((id, bg.size.toLong, sumP, sumP / bg.size))
      }
    }.sortBy(_._1).toSeq

    val got = PipelineQueries.t15LmScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected
  }

  test("q_t16_bpe_merges equals a plain-Scala greedy BPE recompute") {
    val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val wordCounts = mutable.Map.empty[String, Long]
    texts.foreach(_.toLowerCase.split("\\s+", -1).filter(_.nonEmpty)
      .foreach(w => wordCounts(w) = wordCounts.getOrElse(w, 0L) + 1L))
    var words: Seq[(Long, Vector[String])] =
      wordCounts.toSeq.map { case (w, c) => c -> w.map(_.toString).toVector }
    def mergeGreedy(seq: Vector[String], a: String, b: String): Vector[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == a && seq(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += seq(i); i += 1 }
      }
      out.toVector
    }
    val expected = (1 to 3).map { r =>
      val pc = mutable.Map.empty[(String, String), Long]
      words.foreach { case (c, seq) =>
        seq.iterator.sliding(2).withPartial(false).foreach { p =>
          pc((p.head, p(1))) = pc.getOrElse((p.head, p(1)), 0L) + c
        }
      }
      val ((a, b), n) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      words = words.map { case (c, seq) => c -> mergeGreedy(seq, a, b) }
      (r.toLong, a, b, n)
    }
    val got = PipelineQueries.t16BpeMerges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    got shouldBe expected
  }

  test("q_t17_bpe_encode equals a plain-Scala greedy encode (third formulation)") {
    // Learn 3 merges and apply them with the same driver-side greedy
    // machinery as the t16 golden, then compare the full (word →
    // pieces) table against the Spark fold AND (via the gate) DuckDB's
    // run-parity algebra — three independent formulations of greedy
    // non-overlapping merge application.
    val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val wordCounts = mutable.Map.empty[String, Long]
    texts.foreach(_.toLowerCase.split("\\s+", -1).filter(_.nonEmpty)
      .foreach(w => wordCounts(w) = wordCounts.getOrElse(w, 0L) + 1L))
    var words: Map[String, (Long, Vector[String])] =
      wordCounts.toMap.map { case (w, c) => w -> (c, w.map(_.toString).toVector) }
    def mergeGreedy(seq: Vector[String], a: String, b: String): Vector[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == a && seq(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += seq(i); i += 1 }
      }
      out.toVector
    }
    (1 to 3).foreach { _ =>
      val pc = mutable.Map.empty[(String, String), Long]
      words.valuesIterator.foreach { case (c, seq) =>
        seq.iterator.sliding(2).withPartial(false).foreach { p =>
          pc((p.head, p(1))) = pc.getOrElse((p.head, p(1)), 0L) + c
        }
      }
      val ((a, b), _) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      words = words.map { case (w, (c, seq)) => w -> (c, mergeGreedy(seq, a, b)) }
    }
    val expected = words.map { case (w, (c, seq)) =>
      (w, seq.mkString(" "), seq.length.toLong, c)
    }.toSeq.sortBy(_._1)
    val got = PipelineQueries.t17BpeEncode(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected
  }

  test("q_g7_transitions equals a plain-Scala Markov matrix recompute") {
    val events = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = mutable.Map.empty[(String, String), Long]
    events.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2)).map(_._3)
      ordered.iterator.sliding(2).withPartial(false).foreach { w =>
        trans((w.head, w(1))) = trans.getOrElse((w.head, w(1)), 0L) + 1L
      }
    }
    val rowTotals = trans.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val expected = trans.toSeq
      .map { case ((f, t), n) => (f, t, n, rowTotals(f), n * 1000000L / rowTotals(f)) }
      .sortBy(r => (r._1, r._2))

    val got = TemporalQueries.g7Transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    got shouldBe expected
  }
}
