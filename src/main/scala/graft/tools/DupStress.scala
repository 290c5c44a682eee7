package graft.tools

import org.apache.spark.sql.functions._

/** Reproduction behind the r11 exact-duplicate collapse in the dedup
  * family (`Dedup.lshCandidatesFromSigs` / `nearDupPairs` /
  * `simhashPairs`, `Vectors.cosineDupPairs`, and the
  * `Multimodal.bandedHammingPairs` fix the sf1.0 decade run forced):
  * real crawls are exact-dup-heavy, and identical content shares EVERY
  * LSH band bucket, so naive in-bucket all-pairs enumeration is
  * quadratic in copy-family occupancy — amplified ×nBands, again by
  * the pair `distinct`, and (worst) the naive flatten materializes a
  * family's m²/2 pair array inside a single row before the generator
  * ever streams it.
  *
  * Builds an exact-dup-heavy corpus by unioning K byte-identical
  * copies of the sf documents table (disjoint id universes), then
  * times the production `nearDupPairs` against the naive formulation
  * it replaced — exploded banding + per-member-pair shingle-join
  * verify, both still in-tree as the DedupSpec equivalence reference.
  * Both paths produce the identical pair relation (the row counts are
  * printed and compared); only the execution shape differs. Findings
  * land in PLANS.md; this main stays as the reproduction.
  *
  * Usage: DupStress [sfDir] [K] [--skip-naive]
  */
object DupStress {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.01")
    val k = pos.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.local("graft-dupstress")

    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text"))
    val nBase = base.count()
    // K byte-identical replicas on disjoint id ranges: every base doc
    // becomes a copy family of size K.
    val corpus = (0 until k)
      .map(r => base.select((col("id") + lit(r.toLong * 10000000L)).as("id"), col("text")))
      .reduce(_ unionByName _)
      .localCheckpoint(true)
    System.err.println(s"[dupstress] base=$nBase docs, K=$k => ${nBase * k} rows")

    def time[T](label: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[dupstress] $label%s: $dt%.2f s")
      (r, dt)
    }

    import graft.ops.Dedup
    // Untimed warmup of BOTH plan shapes on the unreplicated base:
    // JIT + codegen + parquet footers land outside the comparison.
    Dedup.nearDupPairs(base, "id", "text", threshold = 0.5).count()
    locally {
      val sh0 = Dedup.shingleHashSet(base, "id", "text", 3)
      Dedup.jaccardVerify(
        Dedup.lshCandidates(Dedup.minhashFromHashes(sh0, 16), rowsPerBand = 4),
        sh0, setCol = "h").filter(col("jac") >= 0.5).count()
    }

    val (nFixed, tFixed) = time("nearDupPairs (collapsed)") {
      Dedup.nearDupPairs(corpus, "id", "text", threshold = 0.5).count()
    }

    var tNaive = -1.0
    var nNaive = -1L
    if (!flags.contains("--skip-naive")) {
      val (n, t) = time("naive (exploded banding + member-pair verify)") {
        val sh = Dedup.shingleHashSet(corpus, "id", "text", 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sh.count()
        val cand = Dedup.lshCandidates(Dedup.minhashFromHashes(sh, 16), rowsPerBand = 4)
        val out = Dedup.jaccardVerify(cand, sh, setCol = "h")
          .filter(col("jac") >= 0.5).count()
        sh.unpersist()
        out
      }
      nNaive = n; tNaive = t
      require(nNaive == nFixed, s"relation mismatch: naive=$nNaive fixed=$nFixed")
    }

    println(s"""{"tool":"dupstress","sf":"$sfDir","k":$k,"pairs":$nFixed,""" +
      s""""fixed_sec":$tFixed,"naive_sec":$tNaive}""")
    spark.stop()
  }
}
