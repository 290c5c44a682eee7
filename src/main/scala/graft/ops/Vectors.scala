package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH bucketed variant as the
  * 100 TB scale path (bucket first, brute-force only within the bucket).
  *
  * All arithmetic is double-precision sequential folds over the array in
  * index order (`zip_with` + `aggregate`), which makes results
  * bit-identical across engines computing the same formula — no UDFs,
  * everything codegen'd.
  */
object Vectors {

  /** Sequential left-fold sum of an array<double> column. */
  private def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  def norm(a: Column): Column = sqrt(arraySum(transform(a, x => x * x)))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random ±1.0 hyperplane weights for plane `p`
    * over `dim` dimensions, derived from the portable hash — any engine
    * regenerates the identical planes (no RNG, no state).
    */
  def hyperplane(p: Column, dim: Int): Column =
    transform(sequence(lit(1), lit(dim)), j =>
      when(TextOps.hash60(concat(p.cast(StringType), lit("_"), j.cast(StringType))) % 2 === 1,
        lit(1.0)).otherwise(lit(-1.0)))

  /** LSH bucket id for each vector: `nPlanes` sign bits packed into a
    * long. One explode(nPlanes) + keyed groupBy — map-side combined.
    */
  def lshBuckets(vecs: DataFrame, vecCol: String, idCol: String, nPlanes: Int, dim: Int): DataFrame =
    Partitioning.spread(vecs).select(col(idCol).as("vid"), col(vecCol).as("e"))
      .withColumn("p", explode(sequence(lit(0), lit(nPlanes - 1))))
      .withColumn("s", dot(col("e"), hyperplane(col("p"), dim)))
      .groupBy("vid")
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(0L)).as("bucket"))

  /** Exact brute-force top-k cosine neighbors of one query vector.
    * The single-row query side is broadcast; the scan side streams —
    * no shuffle until the final top-k (TakeOrdered, no global sort).
    */
  def knnBruteForce(vecs: DataFrame, query: DataFrame, k: Int): DataFrame =
    Partitioning.spread(vecs).crossJoin(broadcast(query.select(col("e").as("qe"))))
      .withColumn("cos_sim", cosine(col("e"), col("qe")))
      .drop("e", "qe")
      .orderBy(col("cos_sim").desc, col("vid"))
      .limit(k)
}
