package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-independent, engine-portable numeric aggregation helpers.
  *
  * Floating-point SUM/AVG are associativity-sensitive: Spark's partial
  * aggregation over 32 shuffle partitions adds doubles in a different
  * order than a single-threaded engine, so the last ulp of a plain
  * `sum(double)` is nondeterministic and will not hash-match an oracle.
  *
  * Fix: aggregate in exact decimal arithmetic (the testdata money-like
  * columns carry 2 decimal digits), then cast the exact decimal result
  * back to double. Every engine converts the same exact decimal to the
  * same nearest double, so results are bit-identical and
  * partitioning-independent — which is exactly what a 1000-executor
  * cluster needs for reproducible results too.
  *
  * DuckDB oracle equivalent: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  */
object Exact {
  private val Dec = DecimalType(18, 2)

  /** Exact sum of a 2-decimal-digit double column, returned as double. */
  def sum2(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact average: exact decimal sum divided by non-null count, in
    * IEEE double (deterministic given identical operands).
    */
  def avg2(c: Column): Column = sum2(c) / count(c)

  /** SQL fragments for the DuckDB oracle side. */
  def sum2Sql(col: String): String = s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def avg2Sql(col: String): String = s"${sum2Sql(col)} / COUNT($col)"
}
