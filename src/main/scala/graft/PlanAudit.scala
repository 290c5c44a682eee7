package graft

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of every registered query and
  * flags scale anti-patterns. Part of the engineering loop, not the
  * driver contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-audit")
    val flags = List(
      "CartesianProduct" -> "cartesian product",
      "BroadcastNestedLoopJoin" -> "nested-loop join",
      "rangepartitioning(" -> "", // global sort: fine for presentation ORDER BY only
      "SortMergeJoin" -> "sort-merge join (check if broadcast was possible)")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val hits = flags.collect {
          case (pat, label) if label.nonEmpty && plan.contains(pat) => label
        }
        val scans = plan.linesIterator.count(_.contains("Scan parquet"))
        println(s"[audit] $name scans=$scans" +
          (if (hits.nonEmpty) " FLAGS: " + hits.mkString("; ") else ""))
        if (args.contains("--dump")) println(plan)
      } catch {
        case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
