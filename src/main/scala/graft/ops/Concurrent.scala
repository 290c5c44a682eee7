package graft.ops

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT Spark actions from the driver (guide §2.6): a
  * stage's tail leaves most cores idle while its last tasks finish, and
  * a store tick that writes six delta frames sequentially pays six such
  * tails. Submitting independent jobs from a small driver-side pool
  * lets the next job's tasks back-fill the executors the current job's
  * tail has freed — FIFO scheduling gives exactly the back-fill
  * behaviour, no FAIR pools needed.
  *
  * ONLY for actions that are independent and commute: writes to
  * DISTINCT paths, materializations of frames with no shared mutable
  * state. The batch protocol's crash-safety is unchanged — all tasks
  * are awaited before the caller's `_COMMIT` marker, so a failure in
  * any one leaves a marker-less partial exactly like the sequential
  * code.
  */
private[graft] object Concurrent {

  /** Small and bounded: 2-4 jobs in flight is enough to fill stage
    * tails (guide §2.6); more just makes them fight for cores. Daemon
    * threads — the pool must never hold the JVM open.
    */
  private lazy val pool: ExecutionContext = ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(
      4,
      (r: Runnable) => {
        val t = new Thread(r, "graft-parallel-actions")
        t.setDaemon(true)
        t
      }))

  /** Run every task, wait for all, rethrow the FIRST failure (after all
    * have settled — a failed sibling must not leave another task still
    * writing while the caller begins cleanup).
    */
  def runAll(tasks: Seq[() => Unit]): Unit = {
    if (tasks.isEmpty) return
    if (tasks.size == 1) { tasks.head(); return }
    implicit val ec: ExecutionContext = pool
    val fs = tasks.map(t => Future(t()))
    val settled = fs.map(f => Await.ready(f, Duration.Inf).value.get)
    settled.collectFirst { case scala.util.Failure(e) => throw e }
  }

  /** [[runAll]] with per-task job descriptions (guide §1.5 — label your
    * jobs): descriptions are thread-local, so each task labels its own
    * pool thread for exactly its own actions.
    */
  def runLabeled(spark: org.apache.spark.sql.SparkSession,
                 tasks: Seq[(String, () => Unit)]): Unit =
    runAll(tasks.map { case (label, t) =>
      () => {
        spark.sparkContext.setJobDescription(label)
        try t() finally spark.sparkContext.setJobDescription(null)
      }
    })

  /** Label the CURRENT thread's jobs for the duration of `body`. */
  def labeled[A](spark: org.apache.spark.sql.SparkSession, label: String)(
      body: => A): A = {
    spark.sparkContext.setJobDescription(label)
    try body finally spark.sparkContext.setJobDescription(null)
  }
}
