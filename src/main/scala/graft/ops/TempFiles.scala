package graft.ops

/** The ONE best-effort recursive-delete helper for the driver-local
  * temp directories the gate queries materialize (seeded stores,
  * stream checkpoints, file-source feeds). Previously four private
  * copies had grown across the registry files; a gate that needs a
  * scratch dir should use [[withTempDir]] so the delete is structural
  * (in `finally`) instead of remembered.
  *
  * Best-effort by design: `File.delete` failures are ignored — these
  * are JVM-local scratch trees under `java.io.tmpdir`, and a failed
  * delete must never fail the query that already computed its result.
  */
object TempFiles {

  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
  }

  /** Create a fresh temp dir under `java.io.tmpdir`, run `body` with
    * it, and ALWAYS delete the tree afterwards. Anything `body`
    * returns must therefore be fully materialized (collected rows, an
    * eager `localCheckpoint`) — a lazy DataFrame still reading from
    * inside the dir would fail at its first action.
    */
  def withTempDir[A](prefix: String)(body: java.io.File => A): A = {
    val root = java.nio.file.Files.createTempDirectory(prefix).toFile
    try body(root) finally rmTree(root)
  }
}
