package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement tool (optimization guide §1): run ONE registered query
  * and print every Spark job it launched — wall-clock, call site —
  * plus gaps, so multi-action gates (the store lifecycles) can be
  * attributed operator by operator without the UI.
  *
  * Usage: runMain graft.tools.JobProfile q_name [q_name2 ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("graft-profile")
    final case class J(id: Int, t0: Long, t1: Long, site: String)
    val live = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = java.util.Collections.synchronizedList(
      new java.util.ArrayList[J]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        live.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(live.remove(je.jobId)).foreach { case (t0, site) =>
          done.add(J(je.jobId, t0, System.nanoTime(), site))
        }
      }
    })
    // one warmup query to pay JIT/codegen once, as Bench does
    graft.SparkEntry.queries("q_a5_multiagg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // the listener bus is ASYNC: give late onJobEnd events a beat to
    // drain before clearing/snapshotting, or a previous query's jobs
    // get attributed to the next one (the exact skew this tool exists
    // to avoid)
    def drain(): Unit = Thread.sleep(500)
    drain()
    args.foreach { name =>
      done.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      val js = {
        import scala.jdk.CollectionConverters._
        done.asScala.toSeq.sortBy(_.t0)
      }
      val busy = js.map(j => (j.t1 - j.t0) / 1e9).sum
      System.err.println(
        f"== $name: wall $wall%.2f s, ${js.size} jobs, sum(job) $busy%.2f s," +
          f" driver-gap ${wall - busy}%.2f s (gaps can be negative when jobs overlap)")
      // per-site rollup, then the timeline
      js.groupBy(_.site).toSeq
        .map { case (s, g) => (g.map(j => (j.t1 - j.t0) / 1e9).sum, g.size, s) }
        .sortBy(-_._1).take(30).foreach { case (sec, n, s) =>
          System.err.println(f"  $sec%8.2f s  n=$n%-4d $s")
        }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
