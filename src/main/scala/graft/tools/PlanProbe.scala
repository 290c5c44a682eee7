package graft.tools

import org.apache.spark.sql.functions._

/** Prints the physical plans of the collapse paths for the PLANS
  * plan-audit notes (exchanges, broadcasts, generator placement).
  * Usage: PlanProbe [sfDir]
  *   [collapse|recall|keepbest|chooser|kbindex|kbstore|simchooser|
  *    ivfstore|hamchooser|coschooser]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val what = args.drop(1).headOption.getOrElse("collapse")
    val spark = graft.Sessions.local("graft-planprobe")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text"))
    what match {
      case "recall" =>
        // lshRecall's internals collect per-config scalars, so the
        // probe rebuilds its two data-bearing frames with the same
        // code shape: the inverted-index TRUTH join and the tagged
        // multi-config banding.
        import graft.ops.Dedup
        val sample = docs.filter(
          pmod(graft.ops.TextOps.hash60(col("id").cast("string")), lit(2L)) === 0)
        val groups = Dedup.contentGroups(sample, "id", "text", 3)
        val repSh = groups.select(col("rep").as("id"), explode(col("hs")).as("h"))
        val sizes = groups.select(col("rep").as("id"),
          size(col("hs")).cast("long").as("n"))
        val truth = repSh.select(col("h"), col("id").as("ia"))
          .join(repSh.select(col("h"), col("id").as("ib")), Seq("h"))
          .where(col("ia") < col("ib"))
          .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("id").as("ia"), col("n").as("na")), Seq("ia"))
          .join(sizes.select(col("id").as("ib"), col("n").as("nb")), Seq("ib"))
          .where(col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")) >= 0.5)
        System.err.println("=== lshRecall TRUTH frame (inverted-index exact Jaccard) ===")
        truth.explain("formatted")
      case "chooser" =>
        // chooseLshConfig's result frame is |configs| driver rows; the
        // plan of interest is the survivors path it would drive — probe
        // nearDupPairsAuto end to end (the chooser phase executes, the
        // pairs phase's plan prints).
        val auto = graft.ops.Dedup.nearDupPairsAuto(docs, "id", "text",
          truthDfCap = None, sampleMod = 2)
        System.err.println("=== nearDupPairsAuto pairs at the chosen config ===")
        auto.explain("formatted")
        System.err.println(s"pairs: ${auto.count()}")
      case "kbindex" =>
        // the streaming survivor resolution: accumulated pairs ->
        // clusters -> the shared keep-best window -> anti-join
        val idx = new graft.ops.KeepBestIndex(spark)
        idx.ingest(docs.filter(col("id") % 2 === 0), "id", "text",
          pmod(graft.ops.TextOps.hash60(col("id").cast("string")), lit(1000L)))
        idx.ingest(docs.filter(col("id") % 2 === 1), "id", "text",
          pmod(graft.ops.TextOps.hash60(col("id").cast("string")), lit(1000L)))
        val surv = idx.survivors
        System.err.println("=== KeepBestIndex.survivors (two ingested batches) ===")
        surv.explain("formatted")
        System.err.println(s"survivors: ${surv.count()}")
      case "kbstore" =>
        // the store-backed index: per-batch delta writes, read-time
        // shadowing view (b == latest(id)), survivors off committed
        // parquet — the plans of interest are the effective-state
        // assembly and the survivor resolution over it
        graft.ops.TempFiles.withTempDir("planprobe-kbstore") { root =>
          val dir = new java.io.File(root, "s").getAbsolutePath
          val idx = graft.ops.KeepBestIndexStore.open(spark, dir)
          val score = pmod(graft.ops.TextOps.hash60(col("id").cast("string")), lit(1000L))
          idx.ingest(docs.filter(col("id") % 2 === 0), "id", "text", score)
          idx.ingest(docs.filter(col("id") % 2 === 1), "id", "text", score)
          val surv = idx.survivors
          System.err.println("=== KeepBestIndexStore.survivors (two committed batches, " +
            "read-time shadowing view) ===")
          surv.explain("formatted")
          System.err.println(s"survivors: ${surv.count()}")
          ()
        }
      case "simchooser" =>
        // chooseSimhashBands' result is |configs| driver rows; the
        // data-bearing frames are the tagged multi-config banding
        // (Hamming verified IN-bucket — no verify join) and the
        // pigeonhole-complete truth banding. Rebuilt with the same
        // code shape for the plan audit.
        import graft.ops.Dedup
        val groups = Dedup.simhash(docs, "id", "text")
          .groupBy(col("simhash"))
          .agg(count(lit(1)).cast("long").as("m"), min(col("id")).as("rep"))
        val cand = groups
          .withColumn("b", explode(sequence(lit(0), lit(3))))
          .withColumn("chunk", expr("(simhash >> (15 * b)) & 32767"))
          .groupBy(col("b"), col("chunk"))
          .agg(collect_list(struct(col("rep"), col("m"), col("simhash"))).as("ms"))
          .where(size(col("ms")) > 1)
          .select(explode(col("ms")).as("x"), col("ms"))
          .select(col("x"), explode(col("ms")).as("y"))
          .where(col("x.rep") < col("y.rep"))
          .select(col("x.rep").as("ia"), col("y.rep").as("ib"),
            (col("x.m") * col("y.m")).as("w"),
            expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
          .distinct()
        System.err.println("=== chooseSimhashBands candidate frame (in-bucket Hamming, " +
          "one banding config shown) ===")
        cand.explain("formatted")
        System.err.println(s"cand rows: ${cand.count()}")
      case "ivfstore" =>
        // the store-backed IVF index: per-batch delta assignment, the
        // read-time shadowing view (b == latest(vid)), and the search
        // over it — the plans of interest are the effective-state
        // assembly and ivfSearch's probe
        import spark.implicits._
        graft.ops.TempFiles.withTempDir("planprobe-ivfstore") { root =>
          val dir = new java.io.File(root, "s").getAbsolutePath
          val vecs = graft.Tables.embeddings(spark, sfDir)
            .select(col("vec_id").as("vid"),
              col("embedding").cast("array<double>").as("e"))
          val centroids = vecs.filter(col("vid") < 8)
            .select(col("vid").as("cid"), col("e").as("ce"))
          val idx = graft.ops.IvfIndexStore.open(spark, dir, centroids)
          idx.ingest(vecs.filter(col("vid") =!= 5 && col("vid") % 2 === 0))
          idx.ingest(vecs.filter(col("vid") =!= 5 && col("vid") % 2 === 1))
          val res = idx.search(vecs.filter(col("vid") === 5).select(col("e")),
            nProbe = 2, k = 8)
          System.err.println("=== IvfIndexStore.search (two committed batches, " +
            "read-time shadowing view) ===")
          res.explain("formatted")
          System.err.println(s"hits: ${res.count()}")
          ()
        }
      case "hamchooser" =>
        // chooseHammingBands' result is |configs| driver rows; the
        // data-bearing frame is the tagged multi-config banding over
        // the hi/lo halves (Hamming verified IN-bucket). Rebuilt with
        // the same code shape for the plan audit.
        val hashes = graft.ops.Multimodal.imageDHash(
          graft.PipelineQueries.imageRecords(spark, sfDir)).toDF()
        val groups = hashes
          .groupBy(col("dh_hi"), col("dh_lo"))
          .agg(count(lit(1)).cast("long").as("m"), min(col("media_id")).as("rep"))
        val hcand = groups
          .withColumn("b", explode(sequence(lit(0), lit(3))))
          .withColumn("chunk", expr(
            """CASE WHEN b < 2 THEN (dh_lo >> (16 * b)) & 65535
              |     ELSE (dh_hi >> (16 * (b - 2))) & 65535 END""".stripMargin))
          .groupBy(col("b"), col("chunk"))
          .agg(collect_list(struct(col("rep"), col("m"),
            col("dh_hi"), col("dh_lo"))).as("ms"))
          .where(size(col("ms")) > 1)
          .select(explode(col("ms")).as("x"), col("ms"))
          .select(col("x"), explode(col("ms")).as("y"))
          .where(col("x.rep") < col("y.rep"))
          .select(col("x.rep").as("ia"), col("y.rep").as("ib"),
            (col("x.m") * col("y.m")).as("w"),
            (expr("bit_count(x.dh_hi ^ y.dh_hi)") +
              expr("bit_count(x.dh_lo ^ y.dh_lo)")).as("hamming"))
          .distinct()
        System.err.println("=== chooseHammingBands candidate frame (in-bucket " +
          "Hamming over the hi/lo halves, one banding config shown) ===")
        hcand.explain("formatted")
        System.err.println(s"cand rows: ${hcand.count()}")
      case "coschooser" =>
        // chooseCosinePlanes: ONE bucket pass at max(planes) serves all
        // configs — pairs enumerate in the coarsest buckets, candidacy
        // per config is a mask test on the signature XOR, cosine rides
        // in the bucket. Plus the cap-bounded brute-force truth frame.
        import graft.ops.Vectors
        val vecs = graft.Tables.embeddings(spark, sfDir)
          .select(col("vec_id").as("vid"),
            col("embedding").cast("array<double>").as("e"))
        val groups = vecs
          .groupBy(col("e"))
          .agg(count(lit(1)).cast("long").as("m"), min(col("vid")).as("rep"))
          .withColumn("bucket", Vectors.bucketExpr("e", 6, 64))
        val paired = groups
          .withColumn("bmin", col("bucket").bitwiseAND(lit(3L)))
          .groupBy(col("bmin"))
          .agg(collect_list(struct(col("rep"), col("m"), col("e"),
            col("bucket"))).as("ms"))
          .where(size(col("ms")) > 1)
          .select(explode(col("ms")).as("x"), col("ms"))
          .select(col("x"), explode(col("ms")).as("y"))
          .where(col("x.rep") < col("y.rep"))
          .select((col("x.m") * col("y.m")).as("w"),
            col("x.bucket").bitwiseXOR(col("y.bucket")).as("sx"),
            Vectors.rankCosine(col("x.e"), col("y.e")).as("cos"))
        System.err.println("=== chooseCosinePlanes pair frame (one signature " +
          "pass at max planes, coarsest-bucket enumeration, mask candidacy) ===")
        paired.explain("formatted")
        System.err.println(s"pair rows: ${paired.count()}")
      case "keepbest" =>
        val surv = graft.ops.Dedup.purgeKeepBest(docs, "id", "text",
          pmod(graft.ops.TextOps.hash60(col("id").cast("string")), lit(1000L)))
        System.err.println("=== purgeKeepBest survivors ===")
        surv.explain("formatted")
        System.err.println(s"survivors: ${surv.count()}")
      case _ =>
        val pairs = graft.ops.Dedup.nearDupPairs(docs, "id", "text")
        System.err.println("=== nearDupPairs (post-collapse, checkpointed output) lineage is truncated; showing the CROSS-GROUP expansion plan instead ===")
        val sh = graft.ops.Dedup.shingleHashSet(docs, "id", "text", 3)
        val sigs = graft.ops.Dedup.minhashSigs(sh, 16)
        val cand = graft.ops.Dedup.lshCandidatesFromSigs(sigs, 4, 16)
        cand.explain("formatted")
        System.err.println(s"pairs rows: ${pairs.count()}")
    }
    spark.stop()
  }
}
