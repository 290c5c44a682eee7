package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ idea, minimal core):
  * a constraint set over one table evaluates in a SINGLE aggregation
  * pass — every row-level predicate becomes one conditional-count
  * aggregate, so checking 20 constraints costs one scan, not 20.
  * Cross-table referential checks run as anti-join counts (one keyed
  * shuffle each, dimension side broadcast when small).
  *
  * Output contract: one row per constraint — (constraint, n_violations,
  * ok) — the shape a pipeline gate consumes ("fail ingest if any row
  * where ok = false").
  */
object Constraints {

  /** A named row-level predicate: rows where `holds` is false (or NULL —
    * a null predicate result is a violation, not a free pass) count as
    * violations.
    */
  final case class Check(name: String, holds: Column)

  def notNull(c: String): Check = Check(s"not_null($c)", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range($c,$lo,$hi)", col(c) >= lo && col(c) <= hi)
  def matches(c: String, pattern: String): Check =
    Check(s"matches($c)", col(c).rlike(pattern))

  /** Evaluate row-level checks in one aggregation pass. Uniqueness
    * constraints (`uniqueKeys`) are structural — n_violations = total
    * rows − distinct key combinations — and union their tiny aggregate
    * results onto the melted row-level report.
    */
  def validate(df: DataFrame, checks: Seq[Check],
               uniqueKeys: Seq[Seq[String]] = Seq.empty): DataFrame = {
    val rowLevel = df.agg(
      count(lit(1)).as("__n"),
      checks.map(ch =>
        sum(when(coalesce(ch.holds, lit(false)), 0L).otherwise(1L)).as(ch.name)): _*)
    val melted = rowLevel.selectExpr(
      s"stack(${checks.length}, " +
        checks.map(ch => s"'${ch.name}', `${ch.name}`").mkString(", ") +
        ") as (`constraint`, `n_violations`)")
    val uniques = uniqueKeys.map { keys =>
      df.agg((count(lit(1)) - count_distinct(struct(keys.map(col): _*)))
          .as("n_violations"))
        .select(lit(s"unique(${keys.mkString(",")})").as("constraint"),
          col("n_violations"))
    }
    uniques.foldLeft(melted)(_ unionByName _)
      .withColumn("ok", col("n_violations") === 0L)
  }

  /** Referential-integrity check: count of `df` rows whose `fk` value
    * has no match in `dim(pk)` (NULL fks are orphans too — they
    * reference nothing). Returns the same (constraint, n_violations,
    * ok) row shape for unioning with [[validate]] output.
    */
  def references(df: DataFrame, fk: String, dim: DataFrame, pk: String): DataFrame =
    df.select(col(fk))
      .join(dim.select(col(pk)).distinct(), col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"references($fk->$pk)").as("constraint"), col("n_violations"))
      .withColumn("ok", col("n_violations") === 0L)
}
