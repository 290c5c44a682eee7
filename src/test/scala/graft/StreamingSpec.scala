package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.Incremental

class StreamingSpec extends SparkSpec {

  test("appendAvailableNow processes each input file exactly once across runs") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stream").toString
    val src = s"$root/src"; val chk = s"$root/chk"; val sink = s"$root/sink"

    val batch1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "v")
    batch1.write.parquet(s"$src/f1")
    // File-source streams need a flat dir of files; write per-batch subdirs
    // then point the stream at a glob.
    val schema = batch1.schema

    Incremental.appendAvailableNow(spark, s"$src/*", schema, chk, sink)(
      _.withColumn("doubled", col("v") * 2))
    spark.read.parquet(sink).count() shouldBe 2

    Seq((3L, "c", 30.0)).toDF("id", "k", "v").write.parquet(s"$src/f2")
    Incremental.appendAvailableNow(spark, s"$src/*", schema, chk, sink)(
      _.withColumn("doubled", col("v") * 2))

    val out = spark.read.parquet(sink)
    out.count() shouldBe 3 // f1 not reprocessed (checkpoint cursor)
    out.filter(col("id") === 3L).select("doubled").collect().head.getDouble(0) shouldBe 60.0
  }

  test("windowedCounts groups into tumbling windows with a watermark") {
    import spark.implicits._
    // Batch-mode execution of the same plan validates the window/agg shape.
    val ev = Seq(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "x"),
      (Timestamp.valueOf("2024-01-01 00:02:00"), "y"),
      (Timestamp.valueOf("2024-01-01 01:01:00"), "z")).toDF("ts", "k")
    val out = Incremental.windowedCounts(ev, "ts", "10 minutes", "1 hour")
      .orderBy("window_start").collect()
    out.length shouldBe 2
    out(0).getLong(1) shouldBe 2L
    out(1).getLong(1) shouldBe 1L
  }
}
