package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Post-execution plan metrics: the numbers behind every scale claim.
  *
  * "This operator shuffles less" is testable — Spark attaches SQL
  * metrics (rows, bytes) to every physical node. This helper executes a
  * frame through the `noop` sink (full evaluation, no output cost) and
  * aggregates the metrics that matter for a 100 TB plan review:
  *
  *   - `scanRows`      — rows leaving every file scan (pushdown check)
  *   - `shuffleRows` / `shuffleBytes` — total exchange traffic (THE
  *     number that dominates distributed cost)
  *   - `broadcastBytes` — total broadcast build size (must stay
  *     driver/executor-memory-bounded)
  *
  * Used by specs to LOCK relative claims (e.g. the Bloom pre-gate
  * shuffles fewer fact rows than the plain join) so a refactor that
  * silently regresses the traffic profile fails CI, same as a wrong
  * result would.
  */
object Metrics {

  final case class PlanMetrics(scanRows: Long, shuffleRows: Long,
                               shuffleBytes: Long, broadcastBytes: Long)

  /** Fully materialize `df` and aggregate executed-plan metrics,
    * including reused/adaptive subtrees. Executes the frame's OWN
    * physical plan instance (a `df.write` to a noop sink would plan a
    * fresh QueryExecution and leave this one's metrics untouched).
    */
  def measure(df: DataFrame): PlanMetrics = {
    val plan = df.queryExecution.executedPlan
    plan.execute().count() // consume every row so all operators run
    val nodes = collectFinal(plan)
    def metric(p: SparkPlan, key: String): Long =
      p.metrics.get(key).map(_.value).filter(_ > 0).getOrElse(0L)
    var scan, shRows, shBytes, bcBytes = 0L
    nodes.foreach { p =>
      val name = p.getClass.getSimpleName
      if (name.contains("FileSourceScan") || name.contains("BatchScan"))
        scan += metric(p, "numOutputRows")
      p match {
        case s: ShuffleExchangeLike =>
          shRows += metric(s, "shuffleRecordsWritten")
          shBytes += metric(s, "shuffleBytesWritten")
        case b: BroadcastExchangeLike =>
          bcBytes += metric(b, "dataSize")
        case _ =>
      }
    }
    PlanMetrics(scan, shRows, shBytes, bcBytes)
  }

  /** Flatten the executed plan, descending into AQE's final plans and
    * query stages (the top-level tree only holds stubs after adaptive
    * execution).
    */
  private def collectFinal(plan: SparkPlan): Seq[SparkPlan] = {
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    resolved.collect { case p => p }.flatMap {
      case a: AdaptiveSparkPlanExec => collectFinal(a)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: collectFinal(q.plan)
      case p => Seq(p)
    }
  }
}
