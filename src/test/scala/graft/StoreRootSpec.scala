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

  test("gcSuperseded deletes exactly the oldest superseded versions: live and " +
    "above-live (in-flight) untouched, newest keepSuperseded retained, " +
    "idempotent, no-op on an unpublished root") {
    TempFiles.withTempDir("graft-storeroot-gc") { dir =>
      val root = new Path(dir.getAbsolutePath)
      val fs = StoreRoot.fsOf(spark, root)
      def mkv(v: Int): Unit = fs.mkdirs(StoreRoot.versionDir(root, v))
      // unpublished root: version dirs belong to an in-flight first
      // publish — the sweep must refuse to touch them
      mkv(0)
      StoreRoot.gcSuperseded(fs, root, 0) shouldBe Seq.empty
      assert(fs.exists(StoreRoot.versionDir(root, 0)))
      // live = 3; v=0..2 superseded (v=1 a crash orphan is
      // indistinguishable and equally doomed), v=4 in-flight above live
      (1 to 4).foreach(mkv)
      StoreRoot.flipPointer(fs, root, 3)
      StoreRoot.gcSuperseded(fs, root, 1) shouldBe Seq(0, 1)
      assert(!fs.exists(StoreRoot.versionDir(root, 0)))
      assert(!fs.exists(StoreRoot.versionDir(root, 1)))
      assert(fs.exists(StoreRoot.versionDir(root, 2)), "newest superseded retained")
      assert(fs.exists(StoreRoot.versionDir(root, 3)), "live untouched")
      assert(fs.exists(StoreRoot.versionDir(root, 4)), "in-flight untouched")
      StoreRoot.pointerOf(fs, root) shouldBe Some(3)
      // idempotent at the same policy; keep=0 then takes the last one
      StoreRoot.gcSuperseded(fs, root, 1) shouldBe Seq.empty
      StoreRoot.gcSuperseded(fs, root, 0) shouldBe Seq(2)
      an[IllegalArgumentException] should be thrownBy
        StoreRoot.gcSuperseded(fs, root, -1)
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
