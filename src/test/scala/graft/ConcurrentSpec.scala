package graft

import graft.ops.Concurrent

/** The driver-side action-overlap pool (guide §2.6). Two hazards pinned
  * here, both latent until a refactor trips them:
  *  - NESTED runAll: a task that itself calls runAll (e.g. a chooser
  *    invoked from inside a store-tick task) must degrade to inline
  *    sequential execution, not occupy all 4 pool threads in Await
  *    waiting on futures queued behind them (silent deadlock).
  *  - LABEL RESTORATION: labeled/runLabeled must restore the thread's
  *    PRIOR job description, not clobber an outer label with null.
  */
class ConcurrentSpec extends SparkSpec {

  test("nested runAll degrades to inline execution instead of deadlocking " +
    "the fixed pool") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var finished = false
    val t = new Thread(() => {
      // 4 outer tasks saturate the 4-thread pool; each nests a 3-task
      // runAll — pre-guard, the inner Await could never be served.
      Concurrent.runAll((1 to 4).map(_ => () => {
        Concurrent.runAll((1 to 3).map(_ => () => {
          hits.incrementAndGet(); ()
        }))
      }))
      finished = true
    })
    t.setDaemon(true)
    t.start()
    t.join(60000)
    assert(finished, "nested runAll deadlocked the pool (join timed out)")
    hits.get() shouldBe 12
  }

  test("nested runAll still rethrows the first failure after all tasks settle") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Concurrent.runAll(Seq(
        () => { ran.incrementAndGet(); () },
        () => {
          Concurrent.runAll(Seq(
            () => { ran.incrementAndGet(); () },
            () => throw new IllegalStateException("inner boom"),
            // the inline nested path is sequential, so the task after a
            // failure does NOT run — same all-settled contract as the
            // pooled path only across SIBLING pooled tasks
          ))
        },
        () => { ran.incrementAndGet(); () },
        () => { ran.incrementAndGet(); () }))
    }
    e.getMessage shouldBe "inner boom"
    ran.get() shouldBe 4
  }

  test("labeled and runLabeled restore the PRIOR job description, not null") {
    val sc = spark.sparkContext
    sc.setJobDescription("outer-label")
    try {
      Concurrent.labeled(spark, "inner") {
        sc.getLocalProperty("spark.job.description") shouldBe "inner"
      }
      sc.getLocalProperty("spark.job.description") shouldBe "outer-label"
      // the nested/inline path runs labeled tasks on THIS thread — the
      // outer label must survive that too
      Concurrent.runLabeled(spark, Seq(
        "task-a" -> (() => ()),
        "task-b" -> (() => ())))
      sc.getLocalProperty("spark.job.description") shouldBe "outer-label"
    } finally sc.setJobDescription(null)
  }
}
