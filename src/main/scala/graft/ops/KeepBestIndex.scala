package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** INCREMENTAL keep-best survivor index — the last hop of the
  * ingest-guard column: q_st14 keeps the near-dup PAIR index live as
  * batches arrive (delta-only hashing, the base is never re-shingled),
  * but the purge decision — WHICH copy of each duplicated content
  * survives — stayed batch-only ([[Dedup.purgeKeepBest]], q_d20).
  * This class maintains both: [[ingest]] grows the pair index
  * incrementally, and [[survivors]] resolves the CURRENT keep-best
  * winner per duplicate cluster (best score, ties to the smaller id).
  *
  * The tricky case is DEMOTION: a batch-k survivor loses its crown
  * when a better-scoring duplicate lands in batch k+n. It falls out
  * naturally here because the survivor resolution is a function of the
  * accumulated (pairs, scores) state, not of earlier resolutions — a
  * previously-published winner is simply outranked by the new
  * cluster member on the next [[survivors]] call (DedupSpec pins the
  * demotion, the no-demotion-on-worse-arrival case, and that the
  * final state is invariant under how the feed was batched).
  *
  * Scale shape: per batch, ONLY the delta is shingled/signed — the
  * incremental contract q_st14 locks ([[Dedup
  * .incrementalNearDupPairsFromSets]], base×base never regenerated).
  * The accumulated state frames are checkpoint-cut every batch so
  * lineage never towers. [[survivors]] re-resolves clusters from the
  * accumulated PAIR relation — bounded by the duplicate count, not
  * the corpus — plus one window over cluster members and one
  * anti-join, the q_d20 layout.
  *
  * Contract: `idCol` must be integral (stored as Long) and `score`
  * integral per the q_d20 exactness rule (Long scores make the
  * keep-best window deterministic on every engine).
  */
final class KeepBestIndex(spark: SparkSession, shingleN: Int = 3, k: Int = 16,
                          rowsPerBand: Int = 4, threshold: Double = 0.5) {

  private def empty(st: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), st)

  private var baseSh = empty(StructType(Seq(
    StructField("id", LongType), StructField("h", LongType))))
  private var baseSigs = empty(StructType(Seq(
    StructField("id", LongType), StructField("sig", ArrayType(LongType)))))
  private var baseSizes = empty(StructType(Seq(
    StructField("id", LongType), StructField("n", LongType))))
  private var scored = empty(StructType(Seq(
    StructField("id", LongType), StructField("score", LongType))))
  private var pairs = empty(StructType(Seq(
    StructField("ia", LongType), StructField("ib", LongType))))

  /** Fold one arriving batch into the index: delta-only shingling,
    * new near-dup pairs (delta×base plus delta×delta) appended, the
    * stored shingle/signature/size state extended, and the batch's
    * (id, score) rows recorded for survivor resolution.
    */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             score: Column): Unit = {
    val dSh = Dedup.shingleHashSet(batch, idCol, textCol, shingleN)
      .select(col("id").cast(LongType).as("id"), col("h"))
      .localCheckpoint(eager = true)
    pairs = pairs.unionByName(
        Dedup.incrementalNearDupPairsFromSets(baseSh, baseSigs, dSh,
            k, rowsPerBand, threshold, baseSizes = Some(baseSizes))
          .select(col("ia"), col("ib")))
      .localCheckpoint(eager = true)
    baseSh = baseSh.unionByName(dSh).localCheckpoint(eager = true)
    baseSigs = baseSigs.unionByName(Dedup.minhashSigs(dSh, k))
      .localCheckpoint(eager = true)
    baseSizes = baseSizes
      .unionByName(dSh.groupBy(col("id")).agg(count(lit(1)).as("n")))
      .localCheckpoint(eager = true)
    scored = scored.unionByName(batch.select(
        col(idCol).cast(LongType).as("id"), score.cast(LongType).as("score")))
      .localCheckpoint(eager = true)
  }

  /** The CURRENT surviving (id, score) rows: every ingested document
    * except each duplicate cluster's outranked members. Resolved fresh
    * from the accumulated state — which is what makes demotion
    * automatic and the result independent of batch structure.
    */
  def survivors: DataFrame = {
    val clusters = Dedup.dupClusters(pairs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("id").asc)
    val losers = scored.join(clusters, Seq("id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .select(col("id"))
    scored.join(losers, Seq("id"), "left_anti")
  }
}
