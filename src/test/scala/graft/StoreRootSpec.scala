package graft

import org.apache.hadoop.fs.Path
import graft.ops.{StoreRoot, TempFiles}

/** The pointer-root publish protocol shared by the retrain/reband
  * lifecycles: the pointer flip must be ATOMIC — at every instant a
  * concurrent reader (or a crash-then-reopen) sees either the previous
  * version or the new one, never a root with no `_latest`. The
  * pre-r16 delete-then-rename shape had exactly that window; this
  * suite races a polling reader against a publish loop to pin the
  * overwriting-rename contract.
  */
class StoreRootSpec extends SparkSpec {

  test("flipPointer is atomic: a concurrent reader polling pointerOf never " +
    "observes a missing pointer while publishes race past it") {
    TempFiles.withTempDir("graft-storeroot") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      StoreRoot.flipPointer(fs, root, 0)
      @volatile var failure: Option[String] = None
      @volatile var stop = false
      var reads = 0L
      val reader = new Thread(() => {
        while (!stop && failure.isEmpty) {
          if (StoreRoot.pointerOf(fs, root).isEmpty)
            failure = Some(s"read $reads observed a root with NO pointer " +
              "mid-publish — the flip is not atomic")
          reads += 1
        }
      })
      reader.start()
      try (1 to 200).foreach(v => StoreRoot.flipPointer(fs, root, v))
      finally { stop = true; reader.join(30000) }
      failure shouldBe None
      assert(reads > 0, "the reader thread never got a read in")
      StoreRoot.pointerOf(fs, root) shouldBe Some(200)
    }
  }

  test("gcSuperseded: the retention budget counts only PUBLISHED versions — " +
    "orphans never displace a real snapshot; live and above-live untouched; " +
    "idempotent; no-op on an unpublished root") {
    TempFiles.withTempDir("graft-storeroot-gc") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      def mkv(v: Int): Unit = fs.mkdirs(StoreRoot.versionDir(root, v))
      // unpublished root: version dirs belong to an in-flight first
      // publish — the sweep must refuse to touch them
      mkv(0)
      StoreRoot.gcSuperseded(fs, root, 0) shouldBe Seq.empty
      assert(fs.exists(StoreRoot.versionDir(root, 0)))
      // publish 0, 1, 3 through the real protocol; v=2 is a crash
      // orphan (built, never flipped); v=5 is in-flight above live
      StoreRoot.flipPointer(fs, root, 0)
      mkv(1); StoreRoot.flipPointer(fs, root, 1)
      mkv(2)
      mkv(3); StoreRoot.flipPointer(fs, root, 3)
      mkv(5)
      // keep=1 must retain v=1 (the newest REAL snapshot a reader can
      // be pinned to), not the younger orphan v=2 — and the orphan
      // goes unconditionally
      StoreRoot.gcSuperseded(fs, root, 1) shouldBe Seq(0, 2)
      assert(!fs.exists(StoreRoot.versionDir(root, 0)))
      assert(!fs.exists(StoreRoot.versionDir(root, 2)))
      assert(fs.exists(StoreRoot.versionDir(root, 1)), "newest published retained")
      assert(fs.exists(StoreRoot.versionDir(root, 3)), "live untouched")
      assert(fs.exists(StoreRoot.versionDir(root, 5)), "in-flight untouched")
      assert(!fs.exists(new Path(root, "_published.v=0")),
        "a deleted version's publish record goes with it")
      assert(fs.exists(new Path(root, "_published.v=1")))
      StoreRoot.pointerOf(fs, root) shouldBe Some(3)
      // idempotent at the same policy; keep=0 then takes the last one
      StoreRoot.gcSuperseded(fs, root, 1) shouldBe Seq.empty
      StoreRoot.gcSuperseded(fs, root, 0) shouldBe Seq(1)
      an[IllegalArgumentException] should be thrownBy
        StoreRoot.gcSuperseded(fs, root, -1)
    }
  }

  test("claimVersionDir refuses an existing version directory — another " +
    "maintainer's rebuild is never silently destroyed") {
    TempFiles.withTempDir("graft-storeroot-vclaim") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      val v = StoreRoot.versionDir(root, 1)
      StoreRoot.claimVersionDir(fs, v) // free: fine, claims by creation
      fs.mkdirs(v)
      an[java.util.ConcurrentModificationException] should be thrownBy
        StoreRoot.claimVersionDir(fs, v)
      assert(fs.exists(v), "the refusal must not touch the other build")
    }
  }

  test("the batch trip-wire: claimBatchDir refuses a concurrently-committed " +
    "directory (never deletes committed data) and reclaims a commit-less " +
    "partial; commitBatch is exclusive — a raced-in marker aborts loudly") {
    TempFiles.withTempDir("graft-storeroot-claim") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      val bdir = new Path(root, "b=0")
      // fresh claim + exclusive commit
      StoreRoot.claimBatchDir(fs, bdir)
      fs.mkdirs(bdir)
      StoreRoot.commitBatch(fs, bdir)
      // another writer committed this number: the claim must refuse,
      // and the committed directory must survive the refusal
      an[java.util.ConcurrentModificationException] should be thrownBy
        StoreRoot.claimBatchDir(fs, bdir)
      assert(fs.exists(new Path(bdir, "_COMMIT")))
      // a second commit of the same number is the race's loser
      an[java.util.ConcurrentModificationException] should be thrownBy
        StoreRoot.commitBatch(fs, bdir)
      // a commit-less partial is a crashed attempt: reclaimed
      val partial = new Path(root, "b=1")
      fs.mkdirs(new Path(partial, "frame"))
      StoreRoot.claimBatchDir(fs, partial)
      assert(!fs.exists(partial))
    }
  }

  test("legacy single-file pointer: a pre-marker root resolves to its real " +
    "live version, requireCreatable refuses it, and the first marker flip " +
    "migrates — publish records for the legacy dirs, legacy file retired") {
    TempFiles.withTempDir("graft-storeroot-legacy") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      (0 to 2).foreach(v => fs.mkdirs(StoreRoot.versionDir(root, v)))
      val out = fs.create(new Path(root, "_latest"), true)
      out.write("2".getBytes("UTF-8")); out.close()
      // the r16 regression: a marker-less root resolved to None, which
      // steered the operator to createLive and a silent rollback to v=0
      StoreRoot.pointerOf(fs, root) shouldBe Some(2)
      an[IllegalArgumentException] should be thrownBy
        StoreRoot.requireCreatable(fs, root, "t")
      // the next lifecycle publish migrates the root to the marker
      // protocol: legacy dirs get their publish records (they were
      // genuinely live once — the budget must be able to retain them),
      // the single-file pointer is retired
      fs.mkdirs(StoreRoot.versionDir(root, 3))
      StoreRoot.flipPointer(fs, root, 3)
      StoreRoot.pointerOf(fs, root) shouldBe Some(3)
      assert(!fs.exists(new Path(root, "_latest")))
      (0 to 3).foreach(v =>
        assert(fs.exists(new Path(root, s"_published.v=$v")),
          s"v=$v must carry a publish record after migration"))
      // keep=1 retains the newest REAL snapshot (v=2, the legacy live)
      StoreRoot.gcSuperseded(fs, root, 1) shouldBe Seq(0, 1)
      assert(fs.exists(StoreRoot.versionDir(root, 2)))
    }
  }

  test("a flip that crashed between its publish record and its marker is " +
    "healed by the next flip: the never-live record goes, its dir is an " +
    "orphan, and retention keeps the real snapshot it would have displaced") {
    TempFiles.withTempDir("graft-storeroot-crashflip") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      def mkv(v: Int): Unit = fs.mkdirs(StoreRoot.versionDir(root, v))
      mkv(0); StoreRoot.flipPointer(fs, root, 0)
      mkv(1); StoreRoot.flipPointer(fs, root, 1)
      // the crashed flip to v=2: publish record created, marker never —
      // v=2 never served a single reader
      mkv(2)
      fs.create(new Path(root, "_published.v=2"), true).close()
      StoreRoot.pointerOf(fs, root) shouldBe Some(1)
      // the next real publish heals: the never-live record is deleted
      mkv(3); StoreRoot.flipPointer(fs, root, 3)
      assert(!fs.exists(new Path(root, "_published.v=2")),
        "the crashed flip's publish record must be healed away")
      // keep=1 must keep v=1 — the newest snapshot a reader can
      // actually be pinned to; pre-heal, the v=2 record displaced it
      StoreRoot.gcSuperseded(fs, root, 1) shouldBe Seq(0, 2)
      assert(fs.exists(StoreRoot.versionDir(root, 1)))
    }
  }

  test("the durable tick counter: zero on a fresh root, bump is max-wins " +
    "marker algebra (a crash mid-sweep never double-counts), and the sweep " +
    "keeps exactly one marker") {
    TempFiles.withTempDir("graft-storeroot-tick") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      StoreRoot.tickCount(fs, root) shouldBe 0
      StoreRoot.bumpTick(fs, root) shouldBe 1
      StoreRoot.bumpTick(fs, root) shouldBe 2
      StoreRoot.tickCount(fs, root) shouldBe 2
      // a crash mid-sweep leaves an older marker behind: max wins
      fs.create(new Path(root, "_tick.n=1"), true).close()
      StoreRoot.tickCount(fs, root) shouldBe 2
      StoreRoot.bumpTick(fs, root) shouldBe 3
      fs.globStatus(new Path(root, "_tick.n=*")).length shouldBe 1
    }
  }

  test("requireCreatable: a virgin root and a crashed first publish (only " +
    "v=0) pass; a live pointer or pointer-lost history refuses") {
    TempFiles.withTempDir("graft-storeroot-creatable") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      StoreRoot.requireCreatable(fs, root, "t") // virgin
      fs.mkdirs(StoreRoot.versionDir(root, 0))
      StoreRoot.requireCreatable(fs, root, "t") // crashed first publish
      StoreRoot.flipPointer(fs, root, 0)
      an[IllegalArgumentException] should be thrownBy
        StoreRoot.requireCreatable(fs, root, "t") // live
      // pointer lost but history present: adopting v=0 would roll back
      fs.globStatus(new Path(root, "_latest.v=*"))
        .foreach(s => fs.delete(s.getPath, false))
      fs.mkdirs(StoreRoot.versionDir(root, 1))
      an[IllegalArgumentException] should be thrownBy
        StoreRoot.requireCreatable(fs, root, "t")
    }
  }

  test("a crash mid-sweep (two markers on disk) still resolves to the newest " +
    "version, and the next publish reclaims the leftovers") {
    TempFiles.withTempDir("graft-storeroot-stale") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      StoreRoot.flipPointer(fs, root, 3)
      // simulate a publish that crashed between the marker create and
      // the old-marker sweep: both markers present — max wins
      fs.create(new Path(root, "_latest.v=4"), true).close()
      StoreRoot.pointerOf(fs, root) shouldBe Some(4)
      StoreRoot.flipPointer(fs, root, 5)
      StoreRoot.pointerOf(fs, root) shouldBe Some(5)
      // the sweep reclaimed every older marker
      fs.globStatus(new Path(root, "_latest.v=*")).length shouldBe 1
    }
  }
}
