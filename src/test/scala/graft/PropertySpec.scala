package graft

import java.time.LocalDate
import org.scalacheck.{Gen, Prop, Properties}
import graft.ingest.Ingest
import graft.ops.Dedup

/** ScalaCheck properties for the pure (driver-side) kernels. */
object PropertySpec extends Properties("graft") {

  property("percentEncode is reversible via URLDecoder") =
    Prop.forAll(Gen.asciiPrintableStr, Gen.listOf(Gen.oneOf("币", "🚀", "é", "日"))) {
      (ascii, uni) =>
        val s = ascii + uni.mkString
        java.net.URLDecoder.decode(Ingest.percentEncode(s), "UTF-8") == s
    }

  property("percentEncode output is pure unreserved/percent-hex ASCII") =
    Prop.forAll { (s: String) =>
      Ingest.percentEncode(s).forall(c =>
        c.isLetterOrDigit && c < 128 || "-._~%".contains(c))
    }

  // Mirrors TextOps.redact at the JVM-string level: Spark's
  // regexp_replace compiles the same Java regex, so idempotence here is
  // idempotence of the Column expression.
  private def redactStr(s: String): String = {
    import graft.ops.TextOps._
    s.replaceAll(EmailPattern, "<EMAIL>")
      .replaceAll(Ipv4Pattern, "<IP>")
      .replaceAll(LongNumPattern, "<NUM>")
  }

  private val piiFragment: Gen[String] = Gen.oneOf(
    Gen.const("a.user+tag@mail.example.org"),
    Gen.const("10.0.0.1"), Gen.const("1.2.3.4.5.6.7.8"),
    Gen.const("12345678901.2.3.4"), Gen.const("9876543210"),
    Gen.const("not.an.ip.here"), Gen.const("x@y"),
    Gen.asciiPrintableStr)

  property("redact is idempotent, even around adjacent PII fragments") =
    Prop.forAll(Gen.listOfN(4, piiFragment)) { frags =>
      val s = frags.mkString(" ")
      val once = redactStr(s)
      redactStr(once) == once
    }

  property("redact replacement tokens never themselves match a pattern") =
    Prop.forAll(Gen.oneOf("<EMAIL>", "<IP>", "<NUM>")) { tok =>
      redactStr(tok) == tok
    }

  property("lookbackWindow spans exactly n days ending yesterday") =
    Prop.forAll(Gen.choose(1, 400), Gen.choose(0L, 20000L)) { (n, epochDay) =>
      val today = LocalDate.ofEpochDay(epochDay)
      val (start, end) = Ingest.lookbackWindow(today, n)
      end == today.minusDays(1) &&
        java.time.temporal.ChronoUnit.DAYS.between(start, end) == n - 1
    }

  property("SimHashAgg merge is commutative and associative (shuffle-order independent)") =
    Prop.forAll(Gen.listOfN(30, Gen.long), Gen.listOfN(30, Gen.long), Gen.listOfN(30, Gen.long)) {
      (xs, ys, zs) =>
        val agg = new Dedup.SimHashAgg
        def fold(ls: List[Long]) = ls.foldLeft(agg.zero.clone)(agg.reduce)
        def m(a: Array[Int], b: Array[Int]) = agg.merge(a.clone, b.clone)
        val ab_c = agg.finish(m(m(fold(xs), fold(ys)), fold(zs)))
        val a_bc = agg.finish(m(fold(xs), m(fold(ys), fold(zs))))
        val cba = agg.finish(m(m(fold(zs), fold(ys)), fold(xs)))
        ab_c == a_bc && ab_c == cba
    }

  property("SimHashAgg equals single-pass fold (partitioning invariance)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.long), Gen.choose(1, 10)) { (hs, k) =>
      val agg = new Dedup.SimHashAgg
      val whole = agg.finish(hs.foldLeft(agg.zero.clone)(agg.reduce))
      val chunked = agg.finish(
        hs.grouped(k).map(_.foldLeft(agg.zero.clone)(agg.reduce))
          .reduce((a, b) => agg.merge(a, b)))
      whole == chunked
    }

  property("MinHashSigAgg is input-order invariant and merge-partitionable") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.long), Gen.choose(1, 8)) { (hs, k) =>
      val agg = new Dedup.MinHashSigAgg(16)
      def fold(ls: Seq[Long]) = ls.foldLeft(agg.zero.clone)(agg.reduce)
      val whole = fold(hs).toSeq
      val shuffled = fold(scala.util.Random.shuffle(hs)).toSeq
      val chunked = hs.grouped(k).map(c => fold(c))
        .reduce((a, b) => agg.merge(a, b)).toSeq
      whole == shuffled && whole == chunked
    }

  property("classify/decode stub determinism: same bytes, same meta") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val b = bytes.toArray
      val (m1, f1) = graft.ops.Multimodal.decodeStub(b)
      val (m2, f2) = graft.ops.Multimodal.decodeStub(b)
      m1 == m2 && f1.toSeq == f2.toSeq && m1.n_bytes == b.length.toLong
    }

  property("KmvAgg sketch = k smallest distinct values under any partitioning") =
    Prop.forAll(Gen.listOf(Gen.long), Gen.choose(1, 20)) { (xs, cut) =>
      val agg = new graft.ops.Sketches.KmvAgg(8)
      def fold(ls: Seq[Long]) = ls.foldLeft(agg.zero)(agg.reduce)
      val serial = fold(xs).toSeq
      val chunked = xs.grouped(cut).map(fold)
        .foldLeft(agg.zero)((a, b) => agg.merge(a, b)).toSeq
      val expected = xs.distinct.sorted.take(8)
      serial == expected && chunked == expected
    }

  property("KmvAgg merge is commutative and idempotent") =
    Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      val agg = new graft.ops.Sketches.KmvAgg(8)
      def fold(ls: Seq[Long]) = ls.foldLeft(agg.zero)(agg.reduce)
      val (a, b) = (fold(xs), fold(ys))
      agg.merge(a, b).toSeq == agg.merge(b, a).toSeq &&
        agg.merge(a, a).toSeq == a.toSeq
    }
}
