package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Timing methodology:
  *  - a warmup pass (one light query per table family) pays the JIT /
  *    codegen / parquet-footer costs once, outside the timed region;
  *  - each query materializes through the `noop` datasource sink, which
  *    forces full evaluation of every output column — `count()` would
  *    let Catalyst prune projections and drop sorts.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      } finally {
        // Pipelines persist intermediates (shingle sets, band signatures);
        // drop them — ALSO on failure — so later queries aren't squeezed
        // by leaked cache blocks.
        spark.catalog.clearCache()
      }
    }

    // min of two runs: this host shows multi-second vCPU stalls under
    // external load; the min is the workload's actual cost. If the two
    // samples disagree by >2x on a non-trivial query, one of them was a
    // stall — buy a third sample and keep the min.
    def exec(name: String): Double = {
      val a = once(name)
      if (a < 0) return a
      val b = once(name)
      if (b < 0) return a
      val m = math.min(a, b)
      if (math.max(a, b) > 2 * m && m > 0.5) {
        val c = once(name)
        if (c < 0) m else math.min(m, c)
      } else m
    }

    // Warmup: touch each table family + the window/codegen paths once.
    Seq("q_a5_multiagg", "q_w1_rank_topn", "q_t3_tokens", "q_e1_knn_brute",
      "q_s1_latest_by_key").foreach(once)

    // Optional args: restrict to the named queries (local profiling).
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> exec(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The full JSON is one long line; a tail-capture of stdout can
    // truncate it (it did in round 4). Persist it to a stable file so
    // the artifact is lossless, and print compact per-family lines the
    // tail can't mangle.
    val out = new java.io.File("target/bench.json")
    Option(out.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(json) finally w.close()
    def family(n: String): String = {
      val f = n.stripPrefix("q_").takeWhile(_.isLetter)
      if (f.isEmpty) "other" else f
    }
    results.groupBy(r => family(r._1)).toSeq.sortBy(_._1).foreach {
      case (f, rs) =>
        val ok = rs.filter(_._2 >= 0)
        val slow = if (ok.isEmpty) "" else {
          val (sn, sv) = ok.maxBy(_._2)
          f" slowest=$sn:$sv%.2f"
        }
        System.err.println(
          f"[bench] family $f%-9s n=${rs.size}%3d sum=${ok.map(_._2).sum}%8.2f s$slow")
    }
    println(json)
    // The driver's bounded stdout-tail capture truncates the 272-entry
    // line above mid-dict (PERF_r16/r17 landed per_query:{} two rounds
    // running), silently degrading its round-over-round and scaling
    // comparisons to totals. Emit SHORT survivable lines just before the
    // final total: the top-40 slowest queries (the only ones whose
    // deltas are above the sf0.1 noise floor) and the per-family sums.
    // Additions only — the full map stays one line above and in
    // target/bench.json; the compact total stays LAST and unchanged.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(40)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"slowest","queries":$slowest}""")
    val famSums = results.groupBy(r => family(r._1)).toSeq.sortBy(_._1)
      .map { case (f, rs) =>
        "\"" + f + "\":" + f"${rs.filter(_._2 >= 0).map(_._2).sum}%.3f"
      }.mkString("{", ",", "}")
    println(s"""{"metric":"families","sums":$famSums}""")
    // The driver captures only a bounded TAIL of stdout, which has cut
    // the full per-query line mid-dict three rounds running (BENCH_r07–
    // r09 landed parsed:null). Emit a COMPACT summary as the FINAL
    // stdout line — short enough to survive any tail window — so the
    // driver's parse always lands; the full per-query map stays one
    // line above and in target/bench.json.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${
      results.count(_._2 >= 0)},"failed":${results.count(_._2 < 0)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
