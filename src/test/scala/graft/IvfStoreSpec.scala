package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{IvfIndexStore, TempFiles}

/** The KeepBestStoreSpec-style durability suite for [[graft.ops
  * .IvfIndexStore]]: kill-at-each-boundary resume, mid-batch partial
  * sweep, keyed-upsert re-delivery over append-only storage,
  * delta-bounded per-batch writes, compaction equivalence, and the
  * centroid-layout fingerprint refusal.
  */
class IvfStoreSpec extends SparkSpec {

  // two orthogonal cells; every vector has an unambiguous nearest centroid
  private def centroids: DataFrame = {
    import spark.implicits._
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "ce")
  }
  private val vecs = Map(
    1L -> Seq(0.9, 0.1), 2L -> Seq(0.8, 0.2), 5L -> Seq(0.6, 0.4), // cell 0
    3L -> Seq(0.1, 0.9), 4L -> Seq(0.2, 0.8))                      // cell 1
  private def batch(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, vecs(i))).toDF("vid", "e")
  }
  private val feed: Seq[Seq[Long]] =
    Seq(Seq(1L, 3L), Seq(2L), Seq(4L, 5L), Seq(1L))
  // batch 4 re-delivers vid 1 (at-least-once): the view must be as if
  // each vid arrived once
  private val expected = Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L)

  private def cellOf(idx: IvfIndexStore): Map[Long, Long] =
    idx.assigned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  private def top(idx: IvfIndexStore): Seq[Long] = {
    import spark.implicits._
    val q = Seq(Tuple1(Seq(1.0, 0.0))).toDF("e")
    idx.search(q, nProbe = 1, k = 2).collect().map(_.getLong(0)).toSeq
  }

  test("kill-at-each-boundary: resuming from the committed store after a kill " +
    "(plus a poisoned uncommitted mid-batch partial) reproduces the " +
    "straight-through index at every boundary") {
    TempFiles.withTempDir("ivfstore-boundary") { root =>
      val ref = IvfIndexStore.open(spark,
        new java.io.File(root, "ref").getAbsolutePath, centroids)
      feed.foreach(ids => ref.ingest(batch(ids: _*)))
      cellOf(ref) shouldBe expected
      top(ref) shouldBe Seq(1L, 2L) // cell-0 vectors by cosine to (1,0)
      (1 until feed.size).foreach { cut =>
        val dir = new java.io.File(root, s"cut$cut").getAbsolutePath
        val a = IvfIndexStore.open(spark, dir, centroids)
        feed.take(cut).foreach(ids => a.ingest(batch(ids: _*)))
        // the kill: instance a is dropped. Plant a mid-batch crash
        // artifact — a partial next-batch dir whose rows would flip the
        // search if ever read (a fake vid at cosine 1.0 in the probed
        // cell), with no _COMMIT. open() must NOT touch it (a pure
        // reader opening mid-ingest must never destroy a writer's
        // in-flight batch); it stays invisible until the resumed
        // writer's ingest claims the number.
        import spark.implicits._
        val partial = new java.io.File(dir, s"b=$cut")
        Seq((999L, 0L, Seq(1.0, 0.0), cut)).toDF("vid", "cid", "e", "b")
          .write.parquet(new java.io.File(partial, "assigned").getAbsolutePath)
        val b = IvfIndexStore.open(spark, dir, centroids)
        assert(partial.exists(), "open() must not mutate the root")
        cellOf(b).keySet should not contain 999L
        feed.drop(cut).foreach(ids => b.ingest(batch(ids: _*)))
        assert(new java.io.File(partial, "_COMMIT").exists(),
          "the resumed ingest claims the partial's number and commits over it")
        cellOf(b) shouldBe expected
        top(b) shouldBe Seq(1L, 2L)
      }
    }
  }

  test("re-delivery REPLACES logically over append-only storage: a moved " +
    "vector's stale assignment is shadowed, never merged") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-redeliver") { root =>
      val idx = IvfIndexStore.open(spark,
        new java.io.File(root, "s").getAbsolutePath, centroids)
      idx.ingest(Seq((1L, Seq(0.9, 0.1))).toDF("vid", "e"))
      idx.ingest(Seq((1L, Seq(0.9, 0.1))).toDF("vid", "e")) // exact re-delivery
      cellOf(idx) shouldBe Map(1L -> 0L)
      // content update: vid 1 moves across the plane — the view must
      // show ONLY the new cell
      idx.ingest(Seq((1L, Seq(0.05, 0.95))).toDF("vid", "e"))
      cellOf(idx) shouldBe Map(1L -> 1L)
      idx.assigned.count() shouldBe 1L // shadowed, not duplicated
    }
  }

  test("within-batch duplicate vids REFUSE before anything is written") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-dup") { root =>
      val idx = IvfIndexStore.open(spark,
        new java.io.File(root, "s").getAbsolutePath, centroids)
      val bad = Seq((1L, Seq(0.9, 0.1)), (1L, Seq(0.1, 0.9))).toDF("vid", "e")
      val boom = intercept[IllegalArgumentException](idx.ingest(bad))
      boom.getMessage should include("WITHIN the batch")
      cellOf(idx) shouldBe Map.empty // nothing committed
      idx.ingest(batch(1L, 3L)) // still usable
      cellOf(idx) shouldBe Map(1L -> 0L, 3L -> 1L)
    }
  }

  test("per-batch writes are DELTA-bounded: each committed batch stores its " +
    "own assignment rows only, never a rewrite of the accumulated state") {
    TempFiles.withTempDir("ivfstore-growth") { root =>
      val dir = new java.io.File(root, "s").getAbsolutePath
      val idx = IvfIndexStore.open(spark, dir, centroids)
      feed.zipWithIndex.foreach { case (ids, n) =>
        idx.ingest(batch(ids: _*))
        spark.read.parquet(s"$dir/b=$n/assigned").count() shouldBe ids.size.toLong
      }
    }
  }

  test("compact() folds the view into one batch without changing it, " +
    "reclaims the shadowed history, and later batches keep folding in; " +
    "compactEvery auto-folds on cadence and is not fingerprinted") {
    TempFiles.withTempDir("ivfstore-compact") { root =>
      val dir = new java.io.File(root, "s").getAbsolutePath
      val idx = IvfIndexStore.open(spark, dir, centroids)
      feed.take(3).foreach(ids => idx.ingest(batch(ids: _*)))
      val before = cellOf(idx)
      idx.compact()
      cellOf(idx) shouldBe before
      new java.io.File(dir).listFiles().map(_.getName)
        .count(_.startsWith("b=")) shouldBe 1
      val again = IvfIndexStore.open(spark, dir, centroids)
      feed.drop(3).foreach(ids => again.ingest(batch(ids: _*)))
      cellOf(again) shouldBe expected

      val dir2 = new java.io.File(root, "auto").getAbsolutePath
      val auto = IvfIndexStore.open(spark, dir2, centroids, compactEvery = Some(2))
      feed.foreach(ids => auto.ingest(batch(ids: _*)))
      cellOf(auto) shouldBe expected
      new java.io.File(dir2).listFiles().map(_.getName)
        .count(_.startsWith("b=")) should be <= 2
      // a cadence-less instance opens the same store (no fingerprint drift)
      cellOf(IvfIndexStore.open(spark, dir2, centroids)) shouldBe expected
      intercept[IllegalArgumentException](
        IvfIndexStore.open(spark, dir2, centroids, compactEvery = Some(1)))
    }
  }

  test("centroid-layout fingerprint: reopening under different centroids " +
    "refuses; the same layout reopens cleanly") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-fp") { root =>
      val dir = new java.io.File(root, "s").getAbsolutePath
      val idx = IvfIndexStore.open(spark, dir, centroids)
      idx.ingest(batch(1L, 3L))
      cellOf(IvfIndexStore.open(spark, dir, centroids)) shouldBe
        Map(1L -> 0L, 3L -> 1L)
      val moved = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.5, 0.5))).toDF("cid", "ce")
      val boom = intercept[IllegalArgumentException](
        IvfIndexStore.open(spark, dir, moved))
      boom.getMessage should include("fingerprint")
    }
  }

  test("searchAuto: certified width serves with provenance off the committed " +
    "view; an unreachable floor refuses; re-certifies against CURRENT state") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-searchauto") { root =>
      val idx = IvfIndexStore.open(spark,
        new java.io.File(root, "s").getAbsolutePath, centroids)
      // cell-0 members + one 45-degree vector living in cell 1: the
      // anchor's brute top-3 spans both cells, so nprobe=1 recall=2/3
      // and only nprobe=2 meets a 0.9 floor (the e24 fixture, durable)
      idx.ingest(Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
        (3L, Seq(0.7, 0.714)), (4L, Seq(0.0, 1.0))).toDF("vid", "e"))
      val tune = Seq(Tuple1(Seq(1.0, 0.0))).toDF("e")
      val serve = Seq(Tuple1(Seq(0.0, 1.0))).toDF("e")
      val out = idx.searchAuto(tune, serve, k = 3, nprobes = Seq(1, 2),
        recallFloorPpm = 900000L).collect()
      out.map(_.getInt(3)).distinct.toSeq shouldBe Seq(2)
      out.map(_.getLong(0)).toSeq shouldBe Seq(4L, 3L, 2L)
      val boom = intercept[IllegalArgumentException](
        idx.searchAuto(tune, serve, k = 3, nprobes = Seq(1),
          recallFloorPpm = 900000L))
      boom.getMessage should include("recall")
      // re-delivery moves vid 3 fully into cell 0: the anchor's top-3
      // now lives in one cell, so the SAME call re-certifies nprobe=1 —
      // the read-time decision tracks current state, not history
      idx.ingest(Seq((3L, Seq(1.0, 0.05))).toDF("vid", "e"))
      idx.searchAuto(tune, serve, k = 3, nprobes = Seq(1, 2),
          recallFloorPpm = 900000L)
        .collect().map(_.getInt(3)).distinct.toSeq shouldBe Seq(1)
    }
  }

  test("searchAuto memoizes the certification per committed state: N serves " +
    "between ingests pay ONE anchor-truth pass, and ingest/compact/new-anchor " +
    "re-certify") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-memo") { root =>
      val idx = IvfIndexStore.open(spark,
        new java.io.File(root, "s").getAbsolutePath, centroids)
      idx.ingest(batch(1L, 3L))
      val tune = Seq(Tuple1(Seq(1.0, 0.0))).toDF("e")
      val serveA = Seq(Tuple1(Seq(0.9, 0.1))).toDF("e")
      val serveB = Seq(Tuple1(Seq(0.2, 0.8))).toDF("e")
      def serve(q: DataFrame) = idx.searchAuto(tune, q, k = 1,
        nprobes = Seq(1, 2), recallFloorPpm = 1000000L).collect()
      idx.certifications shouldBe 0
      serve(serveA).map(_.getLong(0)).toSeq shouldBe Seq(1L)
      idx.certifications shouldBe 1
      // three more serves on the same state + anchor: zero new passes,
      // and the answers still come off the certified view
      serve(serveB).map(_.getLong(0)).toSeq shouldBe Seq(3L)
      serve(serveA).map(_.getLong(0)).toSeq shouldBe Seq(1L)
      serve(serveB).map(_.getLong(0)).toSeq shouldBe Seq(3L)
      idx.certifications shouldBe 1
      // state moved: the stale certification is dropped and ONE new
      // pass covers the next run of serves
      idx.ingest(batch(2L))
      serve(serveA).map(_.getLong(0)).toSeq shouldBe Seq(1L)
      serve(serveB).map(_.getLong(0)).toSeq shouldBe Seq(3L)
      idx.certifications shouldBe 2
      // compaction moves the version too — same rule
      idx.compact()
      serve(serveA).map(_.getLong(0)).toSeq shouldBe Seq(1L)
      idx.certifications shouldBe 3
      // a DIFFERENT anchor frame is a different certification question
      val tune2 = Seq(Tuple1(Seq(0.0, 1.0))).toDF("e")
      idx.searchAuto(tune2, serveA, k = 1, nprobes = Seq(1, 2),
        recallFloorPpm = 1000000L).collect()
      idx.certifications shouldBe 4
    }
  }

  test("the certification PERSISTS beside the store: a reopened instance on " +
    "unchanged state pays ZERO re-certification, a content-identical " +
    "re-created anchor frame hits the memo, and compact reclaims the files") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-certpersist") { root =>
      val dir = new java.io.File(root, "s").getAbsolutePath
      val idx = IvfIndexStore.open(spark, dir, centroids)
      idx.ingest(batch(1L, 3L))
      idx.ingest(batch(2L, 4L))
      val tune = Seq(Tuple1(Seq(1.0, 0.0))).toDF("e")
      val serveQ = Seq(Tuple1(Seq(0.9, 0.1))).toDF("e")
      val r1 = idx.searchAuto(tune, serveQ, k = 2, nprobes = Seq(1, 2),
        recallFloorPpm = 1000000L).collect()
      idx.certifications shouldBe 1
      // content-identical but RE-CREATED anchor frame (same rows, new
      // object): content keying hits the memo — the pre-r16 reference
      // keying re-certified here, spuriously
      val tuneAgain = Seq(Tuple1(Seq(1.0, 0.0))).toDF("e")
      idx.searchAuto(tuneAgain, serveQ, k = 2, nprobes = Seq(1, 2),
        recallFloorPpm = 1000000L).collect()
      idx.certifications shouldBe 1
      // THE RESTART: a fresh instance on the same dir reads the
      // persisted decision — zero re-certification, identical serves
      val re = IvfIndexStore.open(spark, dir, centroids)
      val r2 = re.searchAuto(tuneAgain, serveQ, k = 2, nprobes = Seq(1, 2),
        recallFloorPpm = 1000000L).collect()
      re.certifications shouldBe 0
      r2.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
        r1.map(r => (r.getLong(0), r.getLong(1))).toSeq
      // a DIFFERENT config is a different persisted question
      re.searchAuto(tuneAgain, serveQ, k = 2, nprobes = Seq(2),
        recallFloorPpm = 1000000L).collect()
      re.certifications shouldBe 1
      // compact moves the version and sweeps every stale _certified
      // file; the next serve re-certifies against the new version
      re.compact()
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(new org.apache.hadoop.fs.Path(dir, "_certified")) shouldBe false
      re.searchAuto(tuneAgain, serveQ, k = 2, nprobes = Seq(1, 2),
        recallFloorPpm = 1000000L).collect()
      re.certifications shouldBe 2
    }
  }

  test("maintainedIngest composes ingest -> health -> conditional retrain: a " +
    "quiet tick keeps the version, a crossing tick flips it mid-sequence, " +
    "and the superseded version stays readable") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-maintained") { root =>
      val vroot = new java.io.File(root, "live").getAbsolutePath
      IvfIndexStore.createLive(spark, vroot, centroids)
      // tick 1: one vector per cell — imb 1.0x (10000), quiet
      val (v1, i1) = IvfIndexStore.maintainedIngest(spark, vroot,
        batch(1L, 3L), maxImbalance1e4 = 12000L, kNew = 2, iters = 2)
      (v1, i1) shouldBe ((0, Some(10000L)))
      // tick 2: both new vectors land in cell 0 — cells {1,2,5}/{3},
      // imb = 3 * 2 * 1e4 / 4 = 15000 > 12000: the lifecycle fires
      val (v2, i2) = IvfIndexStore.maintainedIngest(spark, vroot,
        batch(2L, 5L), maxImbalance1e4 = 12000L, kNew = 2, iters = 2)
      (v2, i2) shouldBe ((1, Some(15000L)))
      IvfIndexStore.liveVersion(spark, vroot) shouldBe Some(1)
      // the retrained live version holds the full state; the superseded
      // v=0 is untouched and still serves its pre-flip snapshot
      IvfIndexStore.openLive(spark, vroot).assigned.count() shouldBe 4L
      val old = IvfIndexStore.openPinned(spark,
        new java.io.File(vroot, "v=0").getAbsolutePath)
      cellOf(old) shouldBe Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 5L -> 0L)
    }
  }

  test("maintainedIngest checkEvery amortizes the health check: a cadence-" +
    "skipped tick pays no imbalance pass and can never fire, even when the " +
    "state would cross the policy") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-cadence") { root =>
      val vroot = new java.io.File(root, "live").getAbsolutePath
      IvfIndexStore.createLive(spark, vroot, centroids)
      // tick 1 (batch number 0): skipped at cadence 2 — the state is
      // maximally imbalanced (both vectors in cell 0) yet nothing fires
      val (v1, i1) = IvfIndexStore.maintainedIngest(spark, vroot,
        batch(1L, 2L), maxImbalance1e4 = 11000L, kNew = 2, iters = 2,
        checkEvery = 2)
      (v1, i1) shouldBe ((0, None))
      // tick 2 (batch number 1): the cadence fires the check, the
      // accumulated imbalance crosses, the lifecycle retrains
      val (v2, i2) = IvfIndexStore.maintainedIngest(spark, vroot,
        batch(5L, 3L), maxImbalance1e4 = 11000L, kNew = 2, iters = 2,
        checkEvery = 2)
      v2 shouldBe 1
      i2 shouldBe Some(15000L) // cells {1,2,5}/{3}: 3 * 2 * 1e4 / 4
      IvfIndexStore.openLive(spark, vroot).assigned.count() shouldBe 4L
    }
  }

  test("the maintenance cadence survives compaction consuming batch numbers: " +
    "with compactEvery=2 every tick folds (batch numbers advance by two and " +
    "keep one parity), yet checkEvery=2 still fires every second tick — the " +
    "r16 batch-number derivation suppressed it permanently") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-tick-cadence") { root =>
      val vroot = new java.io.File(root, "live").getAbsolutePath
      IvfIndexStore.createLive(spark, vroot, centroids,
        compactEvery = Some(2))
      def tick(ids: Long*): Option[Long] =
        IvfIndexStore.maintainedIngest(spark, vroot, batch(ids: _*),
          maxImbalance1e4 = 100000L, kNew = 2, iters = 2,
          compactEvery = Some(2), checkEvery = 2)._2
      tick(1L) shouldBe None          // tick 1: cadence-skipped
      tick(2L) shouldBe Some(20000L)  // tick 2: MUST check ({1,2} in cell 0)
      tick(5L) shouldBe None          // tick 3: skipped
      tick(3L) shouldBe Some(15000L)  // tick 4: checks ({1,2,5}/{3})
    }
  }

  test("a torn or out-of-grid _certified file re-certifies instead of " +
    "serving at an uncertified width") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-torncert") { root =>
      val dir = new java.io.File(root, "s").getAbsolutePath
      val idx = IvfIndexStore.open(spark, dir, centroids)
      idx.ingest(batch(1L, 3L))
      val tune = Seq(Tuple1(Seq(1.0, 0.0))).toDF("e")
      val serveQ = Seq(Tuple1(Seq(0.9, 0.1))).toDF("e")
      def serve(st: IvfIndexStore) =
        st.searchAuto(tune, serveQ, k = 1, nprobes = Seq(2),
          recallFloorPpm = 1000000L).collect()
      serve(idx)
      idx.certifications shouldBe 1
      // tear the persisted decision down to a numeric prefix that
      // PARSES but sits outside the grid — the exact r16 ADVICE
      // scenario (a '1' torn from a wider width)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val certs = fs.globStatus(
        new org.apache.hadoop.fs.Path(dir, "_certified/*"))
      certs.length shouldBe 1
      val out = fs.create(certs.head.getPath, true)
      out.write("1".getBytes("UTF-8")); out.close()
      val re = IvfIndexStore.open(spark, dir, centroids)
      val rows = serve(re)
      re.certifications shouldBe 1 // re-certified, did NOT trust the file
      rows.map(_.getAs[Int]("nprobe")).toSeq shouldBe Seq(2)
    }
  }

  test("the concurrent-writer trip-wire catches the stale-cache compaction " +
    "race: a second writer's committed batch is never deleted — the " +
    "compacting writer aborts loudly instead") {
    TempFiles.withTempDir("ivfstore-tripwire") { root =>
      val dir = new java.io.File(root, "s").getAbsolutePath
      val a = IvfIndexStore.open(spark, dir, centroids)
      a.ingest(batch(1L))
      a.ingest(batch(3L))
      // a SECOND writer on the same root (the contract violation):
      // its ingest commits b=2, invisible to A's cached committed set
      val b = IvfIndexStore.open(spark, dir, centroids)
      b.ingest(batch(4L))
      // A's compact folds its cached {0,1} into n = 2 — the number B
      // just committed. Pre-trip-wire this DELETED B's committed batch;
      // now the claim refuses and B's data survives
      an[java.util.ConcurrentModificationException] should be thrownBy
        a.compact()
      val fresh = IvfIndexStore.open(spark, dir, centroids)
      cellOf(fresh) shouldBe Map(1L -> 0L, 3L -> 1L, 4L -> 1L)
    }
  }

  test("relayout publishes the live effective view under a caller-supplied " +
    "layout: fresh version, one bulk assign, pointer flipped, old version " +
    "untouched") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-relayout") { root =>
      val bad = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(-1.0, 0.0))).toDF("cid", "ce")
      val vroot = root.getAbsolutePath
      IvfIndexStore.createLive(spark, vroot, bad).ingest(batch(1L, 2L, 3L, 4L, 5L))
      // the externally-trained path: promote the orthogonal layout
      val st1 = IvfIndexStore.relayout(spark, vroot, centroids)
      IvfIndexStore.liveVersion(spark, vroot) shouldBe Some(1)
      cellOf(st1) shouldBe expected
      st1.imbalance1e4 shouldBe 12000L // cells {1,2,5}/{3,4}: 3*2*1e4/5
      // the superseded version still serves its own layout
      IvfIndexStore.openPinned(spark,
          new java.io.File(vroot, "v=0").getAbsolutePath)
        .assigned.collect().map(_.getLong(1)).distinct.toSeq shouldBe Seq(0L)
    }
  }

  test("vacuum deletes superseded versions per the stated retention, never " +
    "the live one; the retained superseded version stays readable and the " +
    "live serve is unchanged; a second sweep is a no-op") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-vacuum") { root =>
      val bad = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(-1.0, 0.0))).toDF("cid", "ce")
      val mid = Seq((0L, Seq(1.0, 1.0)), (1L, Seq(1.0, -1.0))).toDF("cid", "ce")
      val vroot = root.getAbsolutePath
      IvfIndexStore.createLive(spark, vroot, bad).ingest(batch(1L, 2L, 3L, 4L, 5L))
      IvfIndexStore.relayout(spark, vroot, mid)       // v=1
      IvfIndexStore.relayout(spark, vroot, centroids) // v=2 live
      val before = top(IvfIndexStore.openLive(spark, vroot))
      IvfIndexStore.vacuum(spark, vroot, keepSuperseded = 1) shouldBe Seq(0)
      assert(!new java.io.File(vroot, "v=0").exists())
      // the retained superseded version still serves; the live serve is
      // byte-identical pre/post sweep; the pointer never moved
      IvfIndexStore.openPinned(spark,
        new java.io.File(vroot, "v=1").getAbsolutePath).assigned.count() shouldBe 5L
      top(IvfIndexStore.openLive(spark, vroot)) shouldBe before
      IvfIndexStore.liveVersion(spark, vroot) shouldBe Some(2)
      IvfIndexStore.vacuum(spark, vroot, keepSuperseded = 1) shouldBe Seq.empty
      IvfIndexStore.vacuum(spark, vroot, keepSuperseded = 0) shouldBe Seq(1)
    }
  }

  test("maintainedIngest retainSuperseded sweeps exactly when the lifecycle " +
    "fires: quiet ticks never vacuum, the fired tick leaves only the stated " +
    "retention behind") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-tick-retain") { root =>
      val vroot = new java.io.File(root, "live").getAbsolutePath
      IvfIndexStore.createLive(spark, vroot, centroids)
      val (v1, _) = IvfIndexStore.maintainedIngest(spark, vroot,
        batch(1L, 3L), maxImbalance1e4 = 12000L, kNew = 2, iters = 2,
        retainSuperseded = Some(0))
      v1 shouldBe 0 // quiet: nothing superseded, nothing swept
      assert(new java.io.File(vroot, "v=0").exists())
      val (v2, _) = IvfIndexStore.maintainedIngest(spark, vroot,
        batch(2L, 5L), maxImbalance1e4 = 12000L, kNew = 2, iters = 2,
        retainSuperseded = Some(0))
      v2 shouldBe 1 // fired: the flip's retention sweep reclaims v=0
      assert(!new java.io.File(vroot, "v=0").exists())
      IvfIndexStore.openLive(spark, vroot).assigned.count() shouldBe 4L
    }
  }

  test("a pure reader pays exactly ONE LIST at open across N reads — the " +
    "pinned snapshot — and refresh() re-pins to observe the writer's later " +
    "commits") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-readerpin") { root =>
      val dir = new java.io.File(root, "s").getAbsolutePath
      val w = IvfIndexStore.open(spark, dir, centroids)
      w.ingest(batch(1L, 3L))
      val r = IvfIndexStore.open(spark, dir, centroids)
      r.listCalls shouldBe 1L // the at-open pin, nothing else
      cellOf(r) shouldBe Map(1L -> 0L, 3L -> 1L)
      top(r)
      r.assigned.count()
      r.listCalls shouldBe 1L // N reads, zero new LISTs
      // snapshot semantics: the single writer's later commit is
      // invisible until the reader explicitly re-pins
      w.ingest(batch(2L))
      cellOf(r).keySet should not contain 2L
      r.refresh()
      r.listCalls shouldBe 2L
      cellOf(r) shouldBe Map(1L -> 0L, 2L -> 0L, 3L -> 1L)
    }
  }

  test("openPinned resumes a store from its own persisted centroid layout, " +
    "bit-identical to reopening with the original centroids") {
    TempFiles.withTempDir("ivfstore-pinned") { root =>
      val dir = new java.io.File(root, "s").getAbsolutePath
      val a = IvfIndexStore.open(spark, dir, centroids)
      a.ingest(batch(1L, 3L, 4L))
      val b = IvfIndexStore.openPinned(spark, dir)
      cellOf(b) shouldBe cellOf(a)
      top(b) shouldBe top(a)
      // the fingerprint still guards: a layout-less dir refuses
      val boom = intercept[IllegalArgumentException](
        IvfIndexStore.openPinned(spark,
          new java.io.File(root, "empty").getAbsolutePath))
      boom.getMessage should include("_centroids")
    }
  }

  test("retrain lifecycle: above-threshold imbalance retrains into a new " +
    "fingerprinted version and flips the pointer; the old version stays " +
    "readable; below-threshold is a no-op") {
    import spark.implicits._
    TempFiles.withTempDir("ivfstore-retrain") { root =>
      // a degenerate layout: every vector points into cell 0's halfspace,
      // cell 1 (-x) catches nothing -> imbalance = k x max/total = 2.0
      val bad = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(-1.0, 0.0))).toDF("cid", "ce")
      val vroot = root.getAbsolutePath
      val st0 = IvfIndexStore.createLive(spark, vroot, bad)
      st0.ingest(batch(1L, 2L, 3L, 4L, 5L))
      st0.imbalance1e4 shouldBe 20000L
      IvfIndexStore.liveVersion(spark, vroot) shouldBe Some(0)
      // below threshold: no-op, pointer unmoved
      IvfIndexStore.retrainIfImbalanced(spark, vroot,
        maxImbalance1e4 = 30000L, kNew = 2, iters = 2) shouldBe None
      IvfIndexStore.liveVersion(spark, vroot) shouldBe Some(0)
      // above threshold: retrain on the effective vectors, publish v=1
      val st1 = IvfIndexStore.retrainIfImbalanced(spark, vroot,
        maxImbalance1e4 = 15000L, kNew = 2, iters = 3).get
      IvfIndexStore.liveVersion(spark, vroot) shouldBe Some(1)
      // the trained layout separates the two natural clusters: the
      // x-cluster {1,2,5} and the y-cluster {3,4} land in different
      // cells, and the imbalance drops under the threshold
      val cells = st1.assigned.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      cells.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L)
      cells(1L) shouldBe cells(2L)
      cells(1L) shouldBe cells(5L)
      cells(3L) shouldBe cells(4L)
      cells(1L) should not be cells(3L)
      st1.imbalance1e4 should be <= 15000L
      // the OLD version is untouched and still readable by a reader
      // that resolved it before the flip
      val old = IvfIndexStore.openPinned(spark,
        new java.io.File(root, "v=0").getAbsolutePath)
      old.assigned.collect().map(_.getLong(1)).distinct.toSeq shouldBe Seq(0L)
      // the new live store serves through openLive
      val live = IvfIndexStore.openLive(spark, vroot)
      live.assigned.count() shouldBe 5
      // re-creating an already-published root refuses
      val boom = intercept[IllegalArgumentException](
        IvfIndexStore.createLive(spark, vroot, bad))
      boom.getMessage should include("live version")
    }
  }
}
