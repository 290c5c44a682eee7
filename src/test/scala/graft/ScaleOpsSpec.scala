package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bucketed, Skew}

/** Scale-pattern specs: salted skew join equivalence and bucketed
  * shuffle-free joins.
  */
class ScaleOpsSpec extends SparkSpec {

  test("spread fans out under-partitioned file sources and leaves shuffled frames alone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spread").toString + "/t"
    spark.range(100).toDF("id").coalesce(1).write.parquet(dir)
    val fileDf = spark.read.parquet(dir)
    val out = graft.ops.Partitioning.spread(fileDf)
    out.rdd.getNumPartitions shouldBe spark.sparkContext.defaultParallelism
    // The decision reads the file listing, never df.rdd — the returned
    // plan is still a parquet scan, not an ExistingRDD round-trip.
    out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple")) should
      not include "ExistingRDD"
    // A frame with no file source (post-shuffle partitioning) is returned as-is.
    val mem = Seq(1, 2, 3).toDF("id").repartition(4)
    graft.ops.Partitioning.spread(mem) should be theSameInstanceAs mem
  }

  test("LocalRelation inputs already parallelize without spread's help") {
    import spark.implicits._
    // spread() deliberately leaves non-file frames alone; that contract
    // relies on LocalTableScanExec slicing local data to
    // leafNodeDefaultParallelism (= defaultParallelism). Assert it so a
    // Spark upgrade that broke the assumption fails here, not in prod.
    val local = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    local.rdd.getNumPartitions shouldBe spark.sparkContext.defaultParallelism
  }

  test("saltedJoin is row-identical to the plain join on a skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail.
    val large = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "name")

    val plain = large.join(small, Seq("k"))
    val salted = Skew.saltedJoin(large, small, Seq("k"), saltBuckets = 8)

    salted.count() shouldBe plain.count()
    // Exact multiset equality via sorted canonical projection.
    val a = plain.select("k", "v", "name").collect()
      .map(_.toSeq.mkString("|")).sorted
    val b = salted.select("k", "v", "name").collect()
      .map(_.toSeq.mkString("|")).sorted
    a.toSeq shouldBe b.toSeq
  }

  test("salt actually spreads the hot key across buckets") {
    import spark.implicits._
    val large = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val n = Skew.saltLeft(large, 8).select("__salt").distinct().count()
    n should be > 4L
  }

  test("bucketed-by-key tables join with zero exchanges") {
    import spark.implicits._
    val facts = (1 to 2000).map(i => (i.toLong % 97, s"f$i", i * 1.0))
      .toDF("key", "payload", "amt")
    val dims = (0L until 97L).map(k => (k, s"dim$k")).toDF("key", "name")
    Bucketed.writeBucketed(facts, "facts_b", "key", 8)
    Bucketed.writeBucketed(dims, "dims_b", "key", 8)
    // Disable broadcast so the join would normally need a shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.bucketedJoin(spark, "facts_b", "dims_b", Seq("key"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe 2000
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("AQE splits a skewed join partition when it exceeds the skew threshold") {
    import spark.implicits._
    // 20k rows of one hot key joined against a long uniform tail. With
    // the skew thresholds lowered to test scale, AQE must mark the
    // sort-merge join skew-handled (isSkew=true splits the hot
    // partition into parallel sub-reads) — the runtime guard that keeps
    // one executor from absorbing a hot key's entire partition at 100 TB.
    // Distinct md5 payloads keep the hot partition incompressible, so
    // its shuffle-write size actually crosses the (lowered) threshold.
    val left = spark.range(50000)
      .select(when($"id" < 49000L, 1L).otherwise($"id").as("key"),
        md5($"id".cast("string")).as("pay"))
    val right = (1L to 200L).toDF("key").withColumn("name", lit("y"))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = left.join(right, "key")
      // Materialize THIS frame's own QueryExecution: AQE only rewrites
      // the plan (isFinalPlan=true) once it actually runs, and count()
      // would plan a different query.
      joined.collect().length shouldBe 49000 // only the hot key matches the dim
      joined.queryExecution.executedPlan.toString should include("skew=true")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partitioned store scans prune statically on the partition column") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-prune").toString + "/t"
    val rows = (1 to 300).map(i => (i.toLong, s"d${i % 3}", i * 1.0))
      .toDF("id", "day", "v")
    graft.ops.Store.writePartitioned(rows, path, "day")
    val q = spark.read.parquet(path).filter($"day" === "d1")
    // The predicate must land in PartitionFilters (directory pruning at
    // the source listing — at 100 TB this is the difference between
    // reading one day and reading the table), not in the data filters.
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    scan.partitionFilters.map(_.sql).mkString should include("day")
    q.count() shouldBe 100
  }

  test("joining on the partition column inserts a dynamic partition pruning filter") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/t"
    val facts = (1 to 3000).map(i => (i.toLong, s"d${i % 10}", i * 1.0))
      .toDF("id", "day", "v")
    graft.ops.Store.writePartitioned(facts, path, "day")
    // A selective dimension: only 2 of 10 days survive its filter. DPP
    // should push the dim's day set into the fact scan as a runtime
    // partition filter (reusing the join's broadcast), so the fact side
    // reads 2 directories, not 10 — the canonical star-join scan cut.
    // The dim must be file-backed: a LocalRelation constant-folds its
    // filter away and the planner no longer sees a selective predicate.
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString + "/d"
    (0 until 10).map(i => (s"d$i", i)).toDF("day", "attr").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"attr" < 2)
    val joined = spark.read.parquet(path).join(dim, "day")
    joined.queryExecution.executedPlan.toString should include("dynamicpruning")
    joined.count() shouldBe 600
  }
}
