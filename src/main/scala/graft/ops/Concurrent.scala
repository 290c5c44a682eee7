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

  private val PoolThreadName = "graft-parallel-actions"

  /** Small and bounded: 2-4 jobs in flight is enough to fill stage
    * tails (guide §2.6); more just makes them fight for cores. Daemon
    * threads — the pool must never hold the JVM open.
    */
  private lazy val pool: ExecutionContext = ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(
      4,
      (r: Runnable) => {
        val t = new Thread(r, PoolThreadName)
        t.setDaemon(true)
        t
      }))

  /** Run every task, wait for all, rethrow the FIRST failure (after all
    * have settled — a failed sibling must not leave another task still
    * writing while the caller begins cleanup).
    *
    * REENTRANCY: a task that itself calls runAll (a chooser invoked
    * from inside a store-tick task, say) must not be scheduled back
    * onto this same fixed pool — with all 4 threads blocked in Await
    * waiting on futures queued BEHIND them, the nest would deadlock
    * silently and forever. Detected by thread name: a nested call runs
    * its tasks inline (sequentially) on the pool thread it already
    * owns, degrading to the pre-overlap sequential behaviour instead of
    * hanging.
    */
  def runAll(tasks: Seq[() => Unit]): Unit = {
    if (tasks.isEmpty) return
    if (tasks.size == 1 ||
        Thread.currentThread().getName == PoolThreadName) {
      tasks.foreach(_())
      return
    }
    implicit val ec: ExecutionContext = pool
    // Spark local properties are InheritableThreadLocal: the 4 pool
    // threads are created lazily ONCE and permanently inherit whatever
    // job description / job group the creating thread carried at that
    // moment — every later unlabeled task would then run (and be
    // profiled, and be cancellable) under that stale identity. Capture
    // the SUBMITTING thread's properties here and stamp them onto the
    // pool thread per task, so attribution follows the caller.
    val sc = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext)
    val props = Seq("spark.job.description", "spark.jobGroup.id",
      "spark.scheduler.pool")
    val callerProps = sc.map(c => props.map(p => p -> c.getLocalProperty(p)))
    val fs = tasks.map(t => Future {
      for (c <- sc; ps <- callerProps; (k, v) <- ps) c.setLocalProperty(k, v)
      t()
    })
    val settled = fs.map(f => Await.ready(f, Duration.Inf).value.get)
    settled.collectFirst { case scala.util.Failure(e) => throw e }
  }

  /** [[runAll]] with per-task job descriptions (guide §1.5 — label your
    * jobs): descriptions are thread-local, so each task labels its own
    * pool thread for exactly its own actions — and restores the
    * thread's PRIOR description afterwards (pool threads are reused;
    * setting null would clobber an outer label when the nested-runAll
    * inline path runs a labeled task on the caller's own thread).
    */
  def runLabeled(spark: org.apache.spark.sql.SparkSession,
                 tasks: Seq[(String, () => Unit)]): Unit =
    runAll(tasks.map { case (label, t) =>
      () => labeled(spark, label)(t())
    })

  /** Label the CURRENT thread's jobs for the duration of `body`,
    * restoring the previous label (not null) on exit.
    */
  def labeled[A](spark: org.apache.spark.sql.SparkSession, label: String)(
      body: => A): A = {
    val prev = spark.sparkContext.getLocalProperty("spark.job.description")
    spark.sparkContext.setJobDescription(label)
    try body finally spark.sparkContext.setJobDescription(prev)
  }
}
