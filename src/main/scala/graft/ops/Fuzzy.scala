package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) matching at scale via deletion-neighborhood
  * blocking — the SymSpell idea (Garbe, 2012), relationally:
  *
  * two strings are within Levenshtein distance 1 iff they share a
  * member of each other's {self} ∪ {all 1-deletion variants} set. So
  * instead of the O(n²) all-pairs distance matrix, each term explodes
  * to len+1 variants map-side, candidates come from a hash self-join
  * on the variant key, and the exact Levenshtein filter runs only on
  * candidates (a vanishing fraction of the cross product). The explode
  * factor is bounded by max term length — constant, not data-sized.
  */
object Fuzzy {

  /** {t} ∪ every string obtained by deleting one character of t
    * (deduplicated — repeated characters yield equal deletions).
    */
  def deletionNeighborhood(t: Column): Column =
    array_union(
      array(t),
      transform(sequence(lit(1), length(t)),
        i => concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t)))))

  /** All distinct unordered pairs of `terms(termCol)` values within
    * Levenshtein distance 1. Exact (deletion-neighborhood blocking has
    * no false negatives at distance 1); candidates sharing several
    * variants are deduplicated before the distance check.
    */
  def editDistance1Pairs(terms: DataFrame, termCol: String): DataFrame = {
    val t = terms.select(col(termCol).cast("string").as("t")).distinct()
    val vars = t.select(col("t"), explode(deletionNeighborhood(col("t"))).as("v"))
    vars.select(col("t").as("ta"), col("v"))
      .join(vars.select(col("t").as("tb"), col("v")), "v")
      .where(col("ta") < col("tb"))
      .select("ta", "tb").distinct()
      .filter(levenshtein(col("ta"), col("tb")) <= 1)
  }
}
