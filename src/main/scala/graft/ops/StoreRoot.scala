package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The pointer-managed versioned-root protocol SHARED by the durable
  * index stores ([[IvfIndexStore]]'s retrain lifecycle,
  * [[KeepBestIndexStore]]'s reband lifecycle): immutable `v=N` store
  * directories under one root, a tiny pointer MARKER naming the live
  * one, and a create-marker publish (the `_COMMIT` rule — a crash
  * mid-publish leaves the previous version live, an orphaned
  * unpublished directory is rebuilt by the next lifecycle attempt and
  * never adopted). Readers get snapshot isolation at directory
  * granularity: a reader that resolved `v=N` keeps reading a
  * consistent, untouched index while a maintainer publishes `v=N+1`.
  *
  * PUBLISH IS ATOMIC BY CONSTRUCTION, not by rename: the pointer is a
  * zero-length marker file whose NAME carries the version
  * (`_latest.v=N`), created in one namespace operation — the exact
  * `_COMMIT` pattern the batch protocol already trusts. [[pointerOf]]
  * takes the max over one glob listing, so at every instant a
  * concurrent reader (or a crash-then-reopen) resolves either the
  * previous version or the new one — never a root with NO pointer.
  * (The earlier single-file delete-then-rename had exactly that
  * window, and Hadoop's overwriting `FileContext.rename` is itself
  * delete-then-rename on local/checksum filesystems — renames cannot
  * carry this contract portably; atomic creates can, on HDFS and on
  * object stores alike.) Older markers are swept best-effort AFTER the
  * new one lands; lifecycle versions are monotone (`nextVersion` =
  * max + 1), so max-wins is exact even when a crash leaves two.
  */
private[graft] object StoreRoot {

  private val Marker = "_latest.v=(\\d+)".r
  private val Published = "_published.v=(\\d+)".r
  private val VersionDir = "v=(\\d+)".r
  private val TickMarker = "_tick.n=(\\d+)".r

  /** A version dir's reference manifest (`v=N/_refs`): each line names
    * a batch directory of a PRIOR version (`v=K/b=M`) whose data this
    * version reads instead of copying — the reband lifecycle publishes
    * by reference, so a rebuild writes only its banding-dependent
    * artifact, never a corpus copy. The GC contract that makes this
    * safe lives in [[gcSuperseded]]: a referenced version is
    * load-bearing data of the referencing snapshot and is never
    * reclaimable while that snapshot is retained.
    */
  private[ops] val RefsFile = "_refs"
  private val RefLine = "v=(\\d+)/b=\\d+".r

  /** The versions `v`'s manifest references (empty when it has none —
    * every pre-manifest store, and every compacted version).
    */
  private[ops] def referencedVersions(fs: FileSystem, root: Path,
                                      v: Int): Set[Int] = {
    val p = new Path(versionDir(root, v), RefsFile)
    if (!fs.exists(p)) Set.empty
    else KeepBestIndexStore.readText(fs, p).split("\n").toSeq.map(_.trim)
      .collect { case RefLine(k) => k.toInt }.toSet
  }

  def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The pre-marker protocol's single `_latest` FILE (content = the
    * version number) — readable forever: a root last published by the
    * old protocol must resolve to its real live version, not to None
    * (which would steer the operator to createLive and silently roll
    * serving back to v=0). The first marker-based [[flipPointer]]
    * migrates and retires it.
    */
  private def legacyPointer(fs: FileSystem, root: Path): Option[Int] = {
    val legacy = new Path(root, "_latest")
    if (!fs.exists(legacy) || !fs.getFileStatus(legacy).isFile) None
    else scala.util.Try(
      KeepBestIndexStore.readText(fs, legacy).trim.toInt).toOption
  }

  /** The live version: max over the pointer markers, one glob listing;
    * a marker-less root falls back to the legacy single-file pointer.
    */
  def pointerOf(fs: FileSystem, root: Path): Option[Int] = {
    val ms = Option(fs.globStatus(new Path(root, "_latest.v=*"))).toSeq.flatten
      .map(_.getPath.getName)
      .collect { case Marker(n) => n.toInt }
    if (ms.nonEmpty) Some(ms.max) else legacyPointer(fs, root)
  }

  /** Atomic pointer publish — ONE marker create, then a best-effort
    * sweep of the older markers (a crash mid-sweep leaves extras;
    * max-wins keeps the answer exact and the next publish re-sweeps).
    */
  def flipPointer(fs: FileSystem, root: Path, v: Int): Unit = {
    val liveBefore = pointerOf(fs, root)
    // HEAL CRASHED FLIPS before adding our own records: a publish
    // record ABOVE the current live pointer (and not the version being
    // published now) is a flip that crashed between its `_published`
    // create and its `_latest` create — that version never served, so
    // letting the record stand would make [[gcSuperseded]] count a
    // never-live orphan toward the retention budget, displacing a real
    // snapshot a reader could actually be pinned to (UNDER-retention).
    // Markers are only swept when a newer one exists, so live >= M for
    // every M that ever had a marker — "record above live" is exact.
    Option(fs.globStatus(new Path(root, "_published.v=*"))).toSeq.flatten
      .map(_.getPath).foreach { p =>
        p.getName match {
          case Published(n)
            if n.toInt > liveBefore.getOrElse(-1) && n.toInt != v =>
            fs.delete(p, false)
          case _ => ()
        }
      }
    // legacy-protocol versions were genuinely published but predate
    // the records — give every legacy dir at-or-below the legacy live
    // one before they go below the new live, or [[gcSuperseded]] would
    // treat them as unconditional orphans and under-retain. Dirs below
    // a legacy live COULD be crash orphans, but that is unknowable
    // post hoc; recording them all errs toward OVER-retention, the
    // protocol's stated failure direction.
    legacyPointer(fs, root).foreach { lv =>
      fs.listStatus(root).toSeq.map(_.getPath.getName)
        .collect { case VersionDir(n) => n.toInt }
        .filter(n => n <= lv && n != v)
        .foreach(n =>
          fs.create(new Path(root, s"_published.v=$n"), true).close())
    }
    // a PERMANENT publish record first (never swept while its dir
    // lives): [[gcSuperseded]] uses it to tell genuinely superseded
    // snapshots — the only dirs a reader can be pinned to — from crash
    // orphans, so orphans can never consume retention slots. Marker
    // before pointer: a crash between the two leaves a published-
    // looking orphan which the NEXT flip's heal above deletes; the
    // reverse order would under-retain a real snapshot.
    fs.create(new Path(root, s"_published.v=$v"), true).close()
    fs.create(new Path(root, s"_latest.v=$v"), true).close()
    Option(fs.globStatus(new Path(root, "_latest.v=*"))).toSeq.flatten
      .map(_.getPath).foreach { p =>
        p.getName match {
          case Marker(n) if n.toInt < v => fs.delete(p, false)
          case _ => ()
        }
      }
    // retire the legacy single-file pointer AFTER the markers landed —
    // max-wins already ignores it, this is just migration hygiene
    fs.delete(new Path(root, "_latest"), false)
  }

  def liveVersion(spark: SparkSession, root: String): Option[Int] = {
    val r = new Path(root)
    val fs = fsOf(spark, r)
    if (!fs.exists(r)) None else pointerOf(fs, r)
  }

  /** The next version number: max existing `v=N` (published or
    * orphaned) + 1 — orphans are overwritten-by-number only when a
    * later attempt lands on the same number after a crash, never
    * adopted as live.
    */
  def nextVersion(fs: FileSystem, root: Path): Int =
    fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case VersionDir(n) => n.toInt }
      .foldLeft(-1)(math.max) + 1

  def versionDir(root: Path, v: Int): Path = new Path(root, s"v=$v")

  /** Claim a batch directory for writing — the front half of the
    * batch protocol's concurrent-writer trip-wire. The stores are
    * SINGLE-WRITER by contract; these guards turn an accidental
    * violation (two maintenance jobs pointed at one root — a real ops
    * event at fleet scale) from silent corruption into a loud failure:
    * a directory already carrying `_COMMIT` here means another writer
    * committed this batch number between our listing and now — the old
    * unconditional delete would have DESTROYED COMMITTED DATA in that
    * race. A commit-less directory is a crashed prior attempt (or, in
    * a narrow simultaneous-write window the trip-wire cannot close
    * without unique data paths, an in-flight concurrent writer) and is
    * reclaimed as before.
    */
  def claimBatchDir(fs: FileSystem, bdir: Path): Unit = {
    if (fs.exists(new Path(bdir, "_COMMIT")))
      throw new java.util.ConcurrentModificationException(
        s"$bdir was committed by ANOTHER WRITER between this writer's " +
          "listing and its claim — the store is single-writer by contract; " +
          "stop one of the jobs sharing this root")
    if (fs.exists(bdir)) fs.delete(bdir, true) // crashed prior attempt
  }

  /** The back half of the trip-wire: publish a claimed batch with an
    * EXCLUSIVE marker create (overwrite = false — the atomic primitive
    * the pointer markers already trust). [[claimBatchDir]] removed any
    * stale marker, so an existing one here was raced in by a
    * concurrent writer; the loser aborts loudly and must NOT touch the
    * directory (it now holds the winner's committed state).
    */
  def commitBatch(fs: FileSystem, bdir: Path): Unit =
    try fs.create(new Path(bdir, "_COMMIT"), false).close()
    catch {
      // exactly the already-exists signal — a transient I/O failure
      // (quota, safe-mode, network) must surface as itself, not send
      // the operator hunting for a nonexistent second job
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"$bdir was committed by ANOTHER WRITER while this writer was " +
            "filling it — the store is single-writer by contract; stop one " +
            s"of the jobs sharing this root").initCause(e)
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"$bdir was committed by ANOTHER WRITER while this writer was " +
            "filling it — the store is single-writer by contract; stop one " +
            s"of the jobs sharing this root").initCause(e)
    }

  /** RETENTION SWEEP — the protocol's VACUUM analogue: delete version
    * directories the live pointer has SUPERSEDED, keeping the newest
    * `keepSuperseded` of them for still-pinned readers (the explicit
    * cleanup [[flipPointer]]'s snapshot isolation defers — superseded
    * versions are full-size rebuild copies, so an unswept root grows
    * by one corpus per lifecycle event forever). Deliberately NOT part
    * of publish: retention is a POLICY (how long a pinned reader may
    * hold a superseded snapshot), so it runs only when the maintainer
    * states one — a reader pinned below the horizon loses its
    * directory, exactly the snapshot-retention contract.
    *
    * Scope is exact, not best-effort: the live version is never
    * touched, nor is anything ABOVE it (an in-flight publish under the
    * single-writer contract), nor the pointer markers. The retention
    * budget counts only GENUINELY PUBLISHED versions (the permanent
    * `_published.v=N` record [[flipPointer]] leaves) — the only dirs a
    * reader can be pinned to; crash-orphaned unpublished dirs below
    * live are junk no reader ever resolved, deleted unconditionally so
    * they can never displace a real snapshot from the budget. An
    * unpublished root (no pointer) is a no-op: its dirs belong to an
    * in-flight first publish. Idempotent; returns the versions
    * actually deleted.
    */
  def gcSuperseded(fs: FileSystem, root: Path, keepSuperseded: Int): Seq[Int] = {
    require(keepSuperseded >= 0,
      s"gcSuperseded: keepSuperseded must be >= 0, got $keepSuperseded")
    pointerOf(fs, root) match {
      case None => Seq.empty
      case Some(live) =>
        val published = Option(fs.globStatus(new Path(root, "_published.v=*")))
          .toSeq.flatten.map(_.getPath.getName)
          .collect { case Published(n) => n.toInt }.toSet
        val below = fs.listStatus(root).toSeq.map(_.getPath.getName)
          .collect { case VersionDir(n) => n.toInt }
          .filter(_ < live).sorted
        val (superseded, orphans) = below.partition(published)
        var doomed = (orphans ++ superseded.dropRight(keepSuperseded)).toSet
        // MANIFEST-AWARE: a version referenced by any SURVIVING version
        // (live, above-live in-flight, retained — or itself rescued by
        // this rule) holds that snapshot's per-id data; deleting it
        // would break a version the sweep promised to keep. Rescue
        // transitively until a fixpoint; the budget deliberately does
        // NOT re-expand (rescued versions err toward over-retention,
        // the protocol's stated failure direction). They become
        // reclaimable the moment the referencing version compacts
        // (folding retires its manifest) or is itself swept.
        val allDirs = fs.listStatus(root).toSeq.map(_.getPath.getName)
          .collect { case VersionDir(n) => n.toInt }.toSet
        var kept = allDirs -- doomed
        var rescued = kept.flatMap(referencedVersions(fs, root, _)) & doomed
        while (rescued.nonEmpty) {
          doomed --= rescued
          kept ++= rescued
          rescued = rescued.flatMap(referencedVersions(fs, root, _)) & doomed
        }
        val order = doomed.toSeq.sorted
        order.foreach { v =>
          fs.delete(versionDir(root, v), true)
          fs.delete(new Path(root, s"_published.v=$v"), false)
        }
        order
    }
  }

  /** The durable maintenance-tick count: max over the `_tick.n=N`
    * markers (zero on a fresh root) — the SAME max-wins marker algebra
    * as the pointer. The counter exists because the r16 cadence was
    * derived from the latest committed BATCH number, and compaction
    * also consumes batch numbers: with `compactEvery` set so a fold
    * fires every tick, the batch number advances by two per tick and
    * keeps one parity forever, so an even `checkEvery` was NEVER hit —
    * the health check (and with it the whole retrain/reband lifecycle)
    * was permanently and silently suppressed. Ticks count MAINTENANCE
    * CALLS, which nothing else advances.
    */
  def tickCount(fs: FileSystem, root: Path): Int =
    Option(fs.globStatus(new Path(root, "_tick.n=*"))).toSeq.flatten
      .map(_.getPath.getName)
      .collect { case TickMarker(n) => n.toInt }
      .foldLeft(0)(math.max)

  /** Durably advance the tick counter by one: create the next marker,
    * then best-effort sweep the older ones (max-wins absorbs a crash
    * mid-sweep). A kill between a tick's ingest commit and this bump
    * re-delivers the batch under at-least-once, so the counter drifts
    * by at most the crash count — it never RESETS, which is the
    * property the cadence needs (an in-memory counter restarts at 0
    * and can skew the rhythm arbitrarily).
    */
  def bumpTick(fs: FileSystem, root: Path): Int = {
    val t = tickCount(fs, root) + 1
    fs.create(new Path(root, s"_tick.n=$t"), true).close()
    Option(fs.globStatus(new Path(root, "_tick.n=*"))).toSeq.flatten
      .map(_.getPath).foreach { p =>
        p.getName match {
          case TickMarker(n) if n.toInt < t => fs.delete(p, false)
          case _ => ()
        }
      }
    t
  }

  /** THE SHARED MAINTENANCE-TICK DRIVER — the one contract both
    * stores' `maintainedIngest` twins instantiate (ingest → durable
    * cadence check → health/lifecycle thunk → retention-rides-the-flip
    * → pointer-loss error), extracted so the invariants are pinned
    * ONCE for any future store:
    *
    *  - `ingest` folds the batch into the live version (the store's
    *    own crash-safe batch protocol).
    *  - the tick counter then advances DURABLY ([[bumpTick]] — marker
    *    create, kill/resume-safe, and immune to compaction consuming
    *    batch numbers), and the health check runs only when the count
    *    is a multiple of `checkEvery` — a skipped tick can never fire
    *    the lifecycle.
    *  - `checkAndMaybeFire` reads the store's health metric and fires
    *    its lifecycle rebuild when policy says so, returning whether it
    *    fired; a fired tick is the only event that creates a
    *    superseded version, so the retention sweep runs exactly then.
    *
    * Returns the live version after the tick, erroring loudly if the
    * root lost its pointer mid-tick.
    */
  def maintainedTick(spark: SparkSession, root: String, checkEvery: Int,
                     retainSuperseded: Option[Int])(ingest: () => Unit)(
                     checkAndMaybeFire: () => Boolean): Int = {
    require(checkEvery >= 1, s"checkEvery must be >= 1, got $checkEvery")
    val r = new Path(root)
    val fs = fsOf(spark, r)
    ingest()
    val t = bumpTick(fs, r)
    if (t % checkEvery == 0 && checkAndMaybeFire())
      retainSuperseded.foreach(keep => gcSuperseded(fs, r, keep))
    liveVersion(spark, root).getOrElse(
      sys.error(s"maintainedIngest: $root lost its pointer mid-tick"))
  }

  /** The createLive guard: refuse to mint `v=0` over a root that
    * already has history. A resolvable pointer (marker OR legacy
    * single-file) refuses toward openLive; version directories with NO
    * resolvable pointer refuse too — re-creating would adopt `v=0` and
    * silently roll serving back from whatever version the lost pointer
    * named. The one exception is a root whose ONLY version directory
    * is `v=0` itself: that is a first publish that crashed before its
    * flip, and re-running createLive is exactly its recovery.
    */
  def requireCreatable(fs: FileSystem, root: Path, who: String): Unit = {
    require(pointerOf(fs, root).isEmpty,
      s"$who: $root already has a live version — open it with openLive " +
        "(or run its lifecycle) instead of re-creating")
    val vs = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case VersionDir(n) => n.toInt }
    require(vs.forall(_ == 0),
      s"$who: $root holds version directories " +
        s"(${vs.sorted.map(v => s"v=$v").mkString(", ")}) but NO resolvable " +
        "pointer — re-creating would adopt v=0 and silently roll serving " +
        "back from whatever version the lost pointer named; restore the " +
        "pointer marker (or clear the root) instead")
  }

  /** Claim a lifecycle version directory for building — the version-
    * level analogue of [[claimBatchDir]]. In single-writer operation
    * this branch is unreachable: [[nextVersion]] counts past every
    * existing dir (crash orphans included), so a dir already at the
    * chosen number can only mean ANOTHER MAINTAINER's in-flight or
    * just-published rebuild — the old unconditional delete destroyed
    * it silently (a pointer-referenced live version, if the other
    * maintainer had already flipped). Refuse loudly instead.
    */
  def claimVersionDir(fs: FileSystem, dir: Path): Unit =
    if (fs.exists(dir))
      throw new java.util.ConcurrentModificationException(
        s"$dir appeared between this maintainer's version listing and its " +
          "build — versions are claimed by directory creation and " +
          "nextVersion counts past crash orphans, so an existing directory " +
          "here is another maintainer's rebuild; the lifecycle is " +
          "single-maintainer by contract — stop one of the jobs sharing " +
          "this root")
}
