package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The pointer-managed versioned-root protocol SHARED by the durable
  * index stores ([[IvfIndexStore]]'s retrain lifecycle,
  * [[KeepBestIndexStore]]'s reband lifecycle): immutable `v=N` store
  * directories under one root, a tiny `_latest` file naming the live
  * one, and a temp-write + rename publish (the [[Versioned]] rule — a
  * crash mid-publish leaves the previous version live, an orphaned
  * unpublished directory is rebuilt by the next lifecycle attempt and
  * never adopted). Readers get snapshot isolation at directory
  * granularity: a reader that resolved `v=N` keeps reading a
  * consistent, untouched index while a maintainer publishes `v=N+1`.
  */
private[ops] object StoreRoot {

  private val Pointer = "_latest"
  private val VersionDir = "v=(\\d+)".r

  def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def pointerOf(fs: FileSystem, root: Path): Option[Int] = {
    val p = new Path(root, Pointer)
    if (!fs.exists(p)) None
    else Some(KeepBestIndexStore.readText(fs, p).trim.toInt)
  }

  /** Atomic pointer publish — temp write + rename. */
  def flipPointer(fs: FileSystem, root: Path, v: Int): Unit = {
    val tmp = new Path(root, s"$Pointer.tmp")
    KeepBestIndexStore.writeText(fs, tmp, v.toString)
    val dst = new Path(root, Pointer)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      sys.error(s"StoreRoot: pointer publish failed under $root")
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
}
