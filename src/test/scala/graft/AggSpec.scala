package graft

import org.apache.spark.sql.functions._

/** Plan + scale-path checks for the grouping-sets / pivot / percentile
  * family (values are oracle-checked by q_a12/q_a13/q_a14).
  */
class AggSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("rollup is one pass: Expand before a partial aggregate, one agg exchange") {
    val p = Queries.all("q_a12_rollup")(spark, sf)
      .queryExecution.executedPlan.toString
    p should include("Expand")
    p should include("partial_count")
    // one hash exchange for the aggregate (the other exchange is the
    // presentation range sort)
    p.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
  }

  test("pivot with explicit values needs no distinct-values pre-job") {
    // A blind pivot runs collect(distinct pivot col) eagerly; with the
    // value list given, building the frame must launch zero Spark jobs.
    // (The parquet read happens OUTSIDE the counted window — loading a
    // table can legitimately launch a schema/listing job.)
    val li = Tables.lineitem(spark, sf)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = li.groupBy($"l_returnflag").pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    after shouldBe before
    df.columns.toSeq shouldBe Seq("l_returnflag", "F", "O")
  }

  test("approx_percentile tracks the exact percentile within its accuracy bound") {
    // The 100 TB path: percentile() sort-buffers each group; the
    // mergeable sketch is what survives a billion-row group. Pin the
    // two paths together so swapping them stays safe.
    val rows = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", lit(0.5)).as("exact"),
        approx_percentile($"l_quantity", lit(0.5), lit(10000)).as("approx"))
      .select($"exact", $"approx").as[(Double, Double)].collect()
    rows should not be empty
    rows.foreach { case (e, a) => math.abs(e - a) should be <= 1.0 }
  }
}
