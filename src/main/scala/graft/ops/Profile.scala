package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Column-level data profiling: per-column null counts, distinct
  * cardinality, and min/max — the data-quality report every large-scale
  * ingest runs before training.
  *
  * ONE aggregation job produces every metric: the per-column stats are
  * all aggregates of the same scan, and the long-format output unpivots
  * the single wide result row with `explode(array(struct...))` — no
  * per-column jobs, no second scan. min/max render through a string
  * cast so one schema fits every column type; pre-format columns whose
  * string cast isn't engine-portable (timestamps) before calling.
  *
  * `exact = false` swaps COUNT(DISTINCT) for HyperLogLog
  * `approx_count_distinct`: exact distinct over k columns makes Spark
  * EXPAND the input k+1 ways (one duplicate stream per distinct
  * aggregate), which at 100 TB is k extra shuffles of the table —
  * approx keeps the single-pass shape with one sketch per column.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col("__total").as("n_total"),
        (col("__total") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
