package graft.tools

import graft.{Sessions, SparkEntry}

/** Per-iteration wall-clock profiler for a single registered query —
  * the drift-triage tool the bench protocol calls for: run the query N
  * times in ONE JVM and print every sample, so JIT-warmup effects
  * (falling curve) separate from structural cost changes (flat curve).
  *
  * Usage: runMain graft.tools.ProfileQuery <query> [iters=8]
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.1)
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <query> [iters]")
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-profile")
    val fn = SparkEntry.queries(name)
    val samples = (1 to iters).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[profile] $name iter $i%2d  $s%.3f s")
      s
    }
    println(f"[profile] $name min=${samples.min}%.3f" +
      f" last3min=${samples.takeRight(3).min}%.3f first=${samples.head}%.3f")
    spark.stop()
  }
}
