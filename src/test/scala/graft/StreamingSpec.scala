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

  test("sessionize: gap closes sessions, watermark timeout flushes the open one") {
    import spark.implicits._
    import graft.streaming.{SessionEvent, Sessionize}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessions(input.toDS(), gapMs = 60000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // User 1: two bursts separated by > 1 minute → two sessions.
      input.addData(
        SessionEvent(1L, t("2024-01-01 10:00:00"), "view"),
        SessionEvent(1L, t("2024-01-01 10:00:30"), "click"),
        SessionEvent(1L, t("2024-01-01 10:05:00"), "view"),
        SessionEvent(2L, t("2024-01-01 10:00:10"), "view"))
      q.processAllAvailable()
      // First burst closed by the in-batch gap; user 2's lone session is
      // flushed by timeout once the watermark (max event time) passes
      // its end + gap — both visible after the drain.
      var rows = spark.table("sessions_out").as[graft.streaming.Session].collect()
      rows.map(s => (s.user_id, s.n_events)).toSet shouldBe Set((1L, 2), (2L, 1))

      // Advance the watermark far past everything → timeouts flush opens.
      input.addData(SessionEvent(99L, t("2024-01-01 11:00:00"), "view"))
      q.processAllAvailable()
      input.addData(SessionEvent(99L, t("2024-01-01 12:00:00"), "view"))
      q.processAllAvailable()

      rows = spark.table("sessions_out").as[graft.streaming.Session].collect()
      val byUser = rows.groupBy(_.user_id)
      byUser(1L).map(_.n_events).sorted.toSeq shouldBe Seq(1, 2)
      byUser(2L).head.n_events shouldBe 1
      val s1 = byUser(1L).minBy(_.session_start.getTime)
      s1.session_start shouldBe t("2024-01-01 10:00:00")
      s1.session_end shouldBe t("2024-01-01 10:00:30")
    } finally q.stop()
  }

  test("sessionize: a cross-batch late event extends the session start backwards") {
    import spark.implicits._
    import graft.streaming.{SessionEvent, Sessionize}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[SessionEvent]
    // Generous watermark delay so the out-of-order event is delivered.
    val q = Sessionize.sessions(input.toDS(), gapMs = 60000L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sessions_late2")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(SessionEvent(1L, t("2024-01-01 10:00:30"), "view"))
      q.processAllAvailable()
      // Late event 5 s BEFORE the open session's start, within the gap.
      input.addData(SessionEvent(1L, t("2024-01-01 10:00:25"), "click"))
      q.processAllAvailable()
      // Push the watermark far past end + gap to flush the session.
      input.addData(SessionEvent(99L, t("2024-01-01 11:00:00"), "view"))
      q.processAllAvailable()
      input.addData(SessionEvent(99L, t("2024-01-01 12:00:00"), "view"))
      q.processAllAvailable()
      val s1 = spark.table("sessions_late2").as[graft.streaming.Session]
        .collect().filter(_.user_id == 1L).head
      s1.n_events shouldBe 2
      s1.session_start shouldBe t("2024-01-01 10:00:25") // extended backwards
      s1.session_end shouldBe t("2024-01-01 10:00:30")
    } finally q.stop()
  }

  test("sessionize merges consecutive early stragglers into one session") {
    import spark.implicits._
    import graft.streaming.{SessionEvent, Sessionize}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[SessionEvent]
    // Wide watermark so the stragglers are delivered, not late-filtered.
    val q = Sessionize.sessions(input.toDS(), gapMs = 60000L,
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("sessions_early")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(SessionEvent(1L, t("2024-01-01 10:20:00"), "view"))
      q.processAllAvailable()
      // Two stragglers, both > gap before the open session's start but
      // within the gap of each other → ONE closed 2-event session, not
      // two singletons.
      input.addData(
        SessionEvent(1L, t("2024-01-01 10:00:00"), "view"),
        SessionEvent(1L, t("2024-01-01 10:00:30"), "click"))
      q.processAllAvailable()
      val rows = spark.table("sessions_early").as[graft.streaming.Session]
        .collect().filter(_.user_id == 1L)
      rows.length shouldBe 1
      rows.head.n_events shouldBe 2
      rows.head.session_start shouldBe t("2024-01-01 10:00:00")
      rows.head.session_end shouldBe t("2024-01-01 10:00:30")
    } finally q.stop()
  }

  test("streaming document curation: quality gate + content dedup + redaction in one stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDS()
      .toDF("ts", "doc_id", "text")
      // the batch operators compose unchanged onto an unbounded frame:
      .withColumn("text", graft.ops.TextOps.redact(col("text")))
      // (qualified: ScalaTest Matchers shadows functions.size)
      .withColumn("n_tok",
        org.apache.spark.sql.functions.size(graft.ops.TextOps.tokens(col("text"))))
      .filter(col("n_tok") >= 3)
      .withColumn("content_hash", md5(col("text")))
    val curated = graft.streaming.Incremental.dedupedStream(
      docs, "ts", "10 minutes", Seq("content_hash"))
    val q = curated.writeStream.format("memory").queryName("curated_docs")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(
        (t("2024-01-01 10:00:00"), 1L, "alpha beta gamma delta"),
        (t("2024-01-01 10:00:10"), 2L, "alpha beta gamma delta"), // exact dup → dropped
        (t("2024-01-01 10:00:20"), 3L, "mail bob@x.org alpha beta"),
        (t("2024-01-01 10:00:30"), 4L, "too short"))               // quality gate
      q.processAllAvailable()
      val rows = spark.table("curated_docs")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      rows.keySet shouldBe Set(1L, 3L)
      rows(3L) shouldBe "mail <EMAIL> alpha beta" // redacted BEFORE hashing
    } finally q.stop()
  }

  test("dedupedStream drops within-horizon duplicates with bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = Incremental.dedupedStream(
        input.toDF().toDF("doc_hash", "ts", "txt"), "ts", "10 seconds", Seq("doc_hash"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData(
        (1L, t("2024-01-01 10:00:00"), "a"),
        (1L, t("2024-01-01 10:00:01"), "a-dup"),
        (2L, t("2024-01-01 10:00:02"), "b"))
      q.processAllAvailable()
      // Duplicate of key 1 in a later batch, still within the horizon.
      input.addData((1L, t("2024-01-01 10:00:03"), "a-dup2"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      rows.length shouldBe 2
      rows.map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L)
    } finally q.stop()
  }

  test("sessionize survives a group whose timeout would land at/below the watermark") {
    import spark.implicits._
    import graft.streaming.{SessionEvent, Sessionize}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessions(input.toDS(), gapMs = 60000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // Batch 1 pushes the watermark to 12:00.
      input.addData(SessionEvent(50L, t("2024-01-01 12:00:00"), "view"))
      q.processAllAvailable()
      // Batch 2 carries a group whose end + gap (10:01) is far below the
      // 12:00 watermark: an unclamped setTimeoutTimestamp throws
      // IllegalArgumentException and fails the whole batch.
      input.addData(SessionEvent(7L, t("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      // Advance again so any surviving open session times out and flushes.
      input.addData(SessionEvent(50L, t("2024-01-01 13:00:00"), "view"))
      q.processAllAvailable()
      q.exception shouldBe empty
    } finally q.stop()
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

  test("intervalJoinStream pairs within the window and evicts old state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val errors = MemoryStream[(Long, Timestamp, Long)]
    val joined = Incremental.intervalJoinStream(
      clicks.toDF().toDF("user", "ts", "click_id"),
      errors.toDF().toDF("user", "ts", "error_id"),
      key = "user", watermark = "10 seconds", window = "5 minutes")
    val q = joined.select("user", "l_click_id", "r_error_id")
      .writeStream.format("memory").queryName("ij_out").outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      clicks.addData((1L, t("2024-01-01 10:00:00"), 100L),
                     (2L, t("2024-01-01 10:00:00"), 101L))
      errors.addData(
        (1L, t("2024-01-01 10:02:00"), 900L), // in window → joins
        (1L, t("2024-01-01 10:06:00"), 901L), // beyond 5 min → no join
        (2L, t("2024-01-01 09:59:00"), 902L)) // before the click → no join
      q.processAllAvailable()
      // push watermarks forward so results emit
      clicks.addData((9L, t("2024-01-01 11:00:00"), 999L))
      errors.addData((9L, t("2024-01-01 11:00:00"), 998L))
      q.processAllAvailable()
      val rows = spark.table("ij_out").as[(Long, Long, Long)].collect().toSet
      rows should contain ((1L, 100L, 900L))
      rows.map(_._3) should not contain 901L
      rows.map(_._3) should not contain 902L
      q.exception shouldBe empty
      // two-sided time bound ⇒ the physical join reports watermark-based
      // state eviction (both sides carry a removal condition)
      q.lastProgress.stateOperators should not be empty
    } finally q.stop()
  }

  test("stream-static broadcast join enriches micro-batches statelessly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // The enrichment shape: a stream joined to a broadcast dimension.
    // Unlike stream-stream joins this buffers NOTHING — each batch probes
    // the static side and moves on, so there's no watermark to manage.
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val input = MemoryStream[(Long, Double)]
    val q = input.toDF().toDF("user", "v")
      .join(broadcast(dim), Seq("user"), "left")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (3L, 5.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .as[(Long, Double, Option[String])].collect().toSet
      rows shouldBe Set((1L, 10.0, Some("gold")), (3L, 5.0, None))
      q.exception shouldBe empty
      q.lastProgress.stateOperators shouldBe empty // stateless enrichment
    } finally q.stop()
  }

  test("upsertStream merges micro-batches into the store with latest-per-key wins") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val root = Files.createTempDirectory("graft-upstream").toString
    val store = s"$root/store"; val chk = s"$root/chk"
    // Seed: day d1 has key A@t1; day d2 has key C@t1.
    graft.ops.Store.writePartitioned(
      Seq(("A", "d1", 1L, 10.0), ("C", "d2", 1L, 30.0))
        .toDF("k", "day", "ts", "v"),
      store, "day")

    val input = MemoryStream[(String, String, Long, Double)]
    val q = Incremental.upsertStream(
      input.toDF().toDF("k", "day", "ts", "v"),
      store, chk, partCol = "day", keys = Seq("k"), tsCol = "ts", tieBreak = "ts")
    try {
      // Batch 1: newer A on d1 (should win) + new key B on d1.
      input.addData(("A", "d1", 2L, 11.0), ("B", "d1", 1L, 20.0))
      q.processAllAvailable()
      // Batch 2: stale A (older ts — must NOT win). d2 untouched throughout.
      input.addData(("A", "d1", 1L, 99.0))
      q.processAllAvailable()
      q.exception shouldBe empty
      val state = spark.read.parquet(store)
        .select("k", "day", "ts", "v").as[(String, String, Long, Double)]
        .collect().toSet
      state shouldBe Set(
        ("A", "d1", 2L, 11.0), // batch-1 update won; batch-2 stale row lost
        ("B", "d1", 1L, 20.0),
        ("C", "d2", 1L, 30.0)) // untouched partition survives every upsert
    } finally q.stop()
  }

  test("streaming KMV sketch converges to the batch sketch under ANY micro-batching") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val K = 16
    val kmv = graft.ops.Sketches.kmvSketch(K)
    val rows = (1 to 300).map(i => (s"g${i % 2}", s"user${i % 57}"))
    val batchState = rows.toDF("g", "u")
      .select($"g", graft.ops.TextOps.hash60($"u").as("h"))
      .groupBy("g").agg(kmv($"h").as("sk"))
      .as[(String, Seq[Long])].collect().toMap

    // deliver the same rows in three different batchings
    for (splits <- Seq(Seq(300), Seq(100, 200), Seq(7, 150, 143))) {
      val input = MemoryStream[(String, String)]
      val sink = "st6spec_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = input.toDF().toDF("g", "u")
        .select($"g", graft.ops.TextOps.hash60($"u").as("h"))
        .groupBy("g").agg(kmv($"h").as("sk"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try {
        var off = 0
        splits.foreach { n =>
          input.addData(rows.slice(off, off + n): _*)
          off += n
          q.processAllAvailable()
        }
        val streamed = spark.table(sink)
          .as[(String, Seq[Long])].collect().toMap
        withClue(s"batching $splits: ") { streamed shouldBe batchState }
      } finally {
        q.stop()
        spark.sql(s"DROP TABLE IF EXISTS $sink")
      }
    }
  }

  test("st4 boundary: a window whose end EQUALS the final watermark emits (<= semantics)") {
    // Pins the q_st4 oracle's `window_end <= max(ts)` emission rule at
    // the exact edge the sf data never hits: max event time precisely
    // on a day boundary, so the last closed window's end == the final
    // watermark. Spark's append-mode state eviction predicate is
    // `window.end <= watermark`, so that window DOES emit; if a Spark
    // upgrade ever flips the comparator this test fails before the
    // oracle gate can silently drift.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-st4edge").toString
    val src = s"$root/ev"
    def t(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      (1L, t("2024-01-01 03:00:00")), (2L, t("2024-01-01 17:30:00")),
      (3L, t("2024-01-02 08:00:00")),
      // max ts EXACTLY at midnight: watermark = 2024-01-03 00:00:00,
      // window [Jan2, Jan3) has end == watermark — the boundary case.
      (4L, t("2024-01-03 00:00:00.000")))
    val df = rows.toDF("event_id", "ts")
    df.write.parquet(src)
    val sink = "st4edge_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.schema(df.schema).parquet(src)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"), col("n"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(sink).as[(String, Long)].collect().toSet
    spark.sql(s"DROP TABLE IF EXISTS $sink")
    // [Jan1, Jan2): end Jan2 < wm → emits. [Jan2, Jan3): end == wm →
    // emits under <=. [Jan3, Jan4): end > wm → held back (the midnight
    // event itself never materializes). Matches the oracle's
    // `window_end <= max(ts)` exactly.
    got shouldBe Set(("2024-01-01", 2L), ("2024-01-02", 1L))
  }

  test("left-outer interval join: null-emission boundary vs the final global watermark") {
    // Pins q_st8's oracle rule. Global watermark = min(max left ts,
    // max right ts) = 11:00. An unmatched click emits nulls iff its
    // join window can provably never match — we assert exactly which
    // side of the boundary (window end == watermark) Spark puts it on.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-st8edge").toString
    def t(s: String) = Timestamp.valueOf(s)
    val clicks = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L), // matched
      (2L, t("2024-01-01 10:00:00"), 101L), // unmatched, end 10:30 < wm -> null row
      (4L, t("2024-01-01 10:30:00"), 103L), // unmatched, end 11:00 == wm -> boundary
      (3L, t("2024-01-01 11:00:00"), 102L)) // unmatched, end 11:30 > wm -> held
      .toDF("user_id", "ts", "click_id")
    val buys = Seq(
      (1L, t("2024-01-01 10:10:00"), 900L),
      (9L, t("2024-01-01 11:30:00"), 901L)) // max right ts; wm = min side = 11:00
      .toDF("user_id", "ts", "purchase_id")
    clicks.write.parquet(s"$root/l"); buys.write.parquet(s"$root/r")
    val l = spark.readStream.schema(clicks.schema).parquet(s"$root/l")
    val r = spark.readStream.schema(buys.schema).parquet(s"$root/r")
    val sink = "st8edge_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Incremental.intervalJoinStream(l, r, "user_id", "0 seconds",
        "30 minutes", joinType = "left_outer")
      .select(col("user_id"), col("l_click_id"),
        col("r_purchase_id"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table(sink)
      .as[(Long, Long, Option[Long])].collect().toSet
    spark.sql(s"DROP TABLE IF EXISTS $sink")
    rows should contain ((1L, 100L, Some(900L)))
    rows should contain ((2L, 101L, None))
    rows.map(_._2) should not contain 102L // window still open at wm
    // THE BOUNDARY: window end == final watermark. Assert the observed
    // side so the oracle cannot drift from the engine:
    withClue(s"rows=$rows") {
      rows.map(_._2) should not contain 103L
    }
  }

  test("full-outer interval join: BOTH null-emission boundaries vs the final watermark") {
    // Pins q_st9's oracle. Window 30 min; wm = min(max left, max right)
    // = 12:00. Left side: unmatched click emits iff l_ts+30m < wm (the
    // st8 rule). Right side: an unmatched purchase can match clicks in
    // [b_ts-30m, b_ts), so it emits once no such left can arrive —
    // the observed predicate is b_ts < max(right) AND b_ts <= max(left)
    // (assertions below pin all the edges we probed).
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-st9edge").toString
    def t(s: String) = Timestamp.valueOf(s)
    val clicks = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L), // matched
      (2L, t("2024-01-01 10:00:00"), 101L), // unmatched, end 10:30 < wm -> nulls
      (8L, t("2024-01-01 12:00:00"), 102L)) // max left ts; end > wm -> held
      .toDF("user_id", "ts", "click_id")
    val buys = Seq(
      (1L, t("2024-01-01 10:10:00"), 900L), // match
      (5L, t("2024-01-01 10:30:00"), 901L), // unmatched, b_ts < wm
      (6L, t("2024-01-01 12:00:00"), 902L), // unmatched, b_ts == wm (boundary)
      (10L, t("2024-01-01 12:15:00"), 904L), // unmatched, wm < b_ts < own max
      (7L, t("2024-01-01 12:30:00"), 903L)) // unmatched, b_ts > wm -> held
      .toDF("user_id", "ts", "purchase_id")
    clicks.write.parquet(s"$root/l"); buys.write.parquet(s"$root/r")
    val l = spark.readStream.schema(clicks.schema).parquet(s"$root/l")
    val r = spark.readStream.schema(buys.schema).parquet(s"$root/r")
    val sink = "st9edge_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Incremental.intervalJoinStream(l, r, "user_id", "0 seconds",
        "30 minutes", joinType = "full_outer")
      .select(col("user_id"), col("l_click_id"), col("r_purchase_id"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table(sink)
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    spark.sql(s"DROP TABLE IF EXISTS $sink")
    withClue(s"rows=$rows") {
      rows should contain ((1L, Some(100L), Some(900L)))
      rows should contain ((2L, Some(101L), None))    // left-null rule (st8)
      rows.flatMap(_._2) should not contain 102L      // left window open
      rows should contain ((5L, None, Some(901L)))    // below both maxima: emits
      // OBSERVED right-side rule (all four probes + the sf corpus):
      // an unmatched right emits iff b_ts < max(right events) AND
      // b_ts <= max(left events) — NOT a single-global-watermark
      // comparison: 902 sits AT the left max (emits), 904 sits between
      // the left max and the right max (held), and a right row that IS
      // its side's maximum never emits even though it equals the
      // global min watermark. q_st9's oracle states exactly this.
      rows should contain ((6L, None, Some(902L)))    // == left max: emits
      rows.flatMap(_._3) should not contain 904L      // > left max: held
      rows.flatMap(_._3) should not contain 903L      // == right max: held
    }
  }

  test("full-outer emission under a two-file split: batch structure shifts ONLY the held-back tail") {
    // q_st9's oracle pins the emission rules for a SINGLE AvailableNow
    // microbatch (the driver writes events.parquet as one file — see the
    // SINGLE-BATCH ASSUMPTION note beside st9StreamFullOuterJoinSql).
    // This probe feeds the SAME fixture as the single-batch test above,
    // split across two files per side with maxFilesPerTrigger=1, so the
    // watermark advances BETWEEN microbatches. It pins (a) what is
    // batch-structure-INVARIANT — the matched rows and every row the
    // single-batch rules emit — and (b) the exact delta, so a future
    // gate break diagnoses as batch-structure drift, not a code bug.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-st9split").toString
    def t(s: String) = Timestamp.valueOf(s)
    def writeSplit(dir: String, schema: org.apache.spark.sql.types.StructType,
                   early: org.apache.spark.sql.DataFrame,
                   late: org.apache.spark.sql.DataFrame): Unit = {
      // One parquet file per microbatch, mtimes ordered so the file
      // source (sorted by modification time) replays early THEN late.
      val d = new java.io.File(dir); d.mkdirs()
      def one(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
        val tmp = Files.createTempDirectory("graft-st9part").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
        val dst = new java.io.File(d, name)
        Files.copy(part.toPath, dst.toPath)
        dst.setLastModified(mtime)
      }
      one(early, "b0.parquet", 1700000000000L)
      one(late, "b1.parquet", 1700000100000L)
    }
    val clicks = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (2L, t("2024-01-01 10:00:00"), 101L),
      (8L, t("2024-01-01 12:00:00"), 102L))
      .toDF("user_id", "ts", "click_id")
    val buys = Seq(
      (1L, t("2024-01-01 10:10:00"), 900L),
      (5L, t("2024-01-01 10:30:00"), 901L),
      (6L, t("2024-01-01 12:00:00"), 902L),
      (10L, t("2024-01-01 12:15:00"), 904L),
      (7L, t("2024-01-01 12:30:00"), 903L))
      .toDF("user_id", "ts", "purchase_id")
    writeSplit(s"$root/l", clicks.schema,
      clicks.filter($"ts" < t("2024-01-01 11:00:00")),
      clicks.filter($"ts" >= t("2024-01-01 11:00:00")))
    writeSplit(s"$root/r", buys.schema,
      buys.filter($"ts" < t("2024-01-01 11:00:00")),
      buys.filter($"ts" >= t("2024-01-01 11:00:00")))
    val l = spark.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/l")
    val r = spark.readStream.schema(buys.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/r")
    val sink = "st9split_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Incremental.intervalJoinStream(l, r, "user_id", "0 seconds",
        "30 minutes", joinType = "full_outer")
      .select(col("user_id"), col("l_click_id"), col("r_purchase_id"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table(sink)
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    spark.sql(s"DROP TABLE IF EXISTS $sink")
    withClue(s"rows=$rows") {
      // Invariant under batch structure: the match and every row the
      // single-batch rules emit.
      rows should contain ((1L, Some(100L), Some(900L)))
      rows should contain ((2L, Some(101L), None))
      rows should contain ((5L, None, Some(901L)))
      rows should contain ((6L, None, Some(902L)))
      // Tails held in the single-batch run stay held here too — the
      // intermediate watermark (10:30, from the early files) is LOWER
      // than the final one, so splitting can only delay, never add,
      // emissions for this early-then-late arrival order.
      rows.flatMap(_._2) should not contain 102L
      rows.flatMap(_._3) should not contain 904L
      rows.flatMap(_._3) should not contain 903L
    }
  }

  test("q_st14: stream-accumulated incremental near-dup pairs equal the batch rebuild (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val streamed = StreamQueries.st14StreamNearDup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jac"))).toSet
    val batch = PipelineQueries.d2MinHashLsh(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jac"))).toSet
    streamed shouldBe batch
    streamed should not be empty
  }

  test("q_st15: stream-maintained IVF index search equals the from-scratch build (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val streamed = StreamQueries.st15StreamIvf(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cos_sim"))).toSeq
    val batch = PipelineQueries.e13IncrIvf(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cos_sim"))).toSeq
    streamed.toSet shouldBe batch.toSet
    streamed should not be empty
  }
}
