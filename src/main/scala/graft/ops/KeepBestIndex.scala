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
  * keep-best window deterministic on every engine); ids must be
  * unique WITHIN a batch (the usual keyed-upsert contract — an id
  * re-delivered in a LATER batch replaces its stored state, see
  * [[ingest]]).
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
    *
    * RE-INGESTED ids REPLACE their stored state — the same contract as
    * the wrapped [[Dedup.incrementalNearDupPairsFromSets]]: an id
    * re-delivered by an at-least-once source (or a CDC-style content
    * update) drops its old shingles/signature/size/score AND every
    * accumulated pair computed against the old content before the
    * batch folds in. A plain union would blend old+new shingle rows
    * (deflating true-pair Jaccard) and, worse, leave the id with TWO
    * scored rows — the keep-best window would rank the id against
    * itself, put its rk=2 row in the loser set, and the anti-join
    * would drop the document entirely even as its cluster's best copy
    * (DedupSpec pins the replace case). Delta ids are batch-bounded,
    * so each drop is a broadcast anti-join — map-side filters, no
    * extra exchange.
    */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             score: Column): Unit = {
    val dSh = Dedup.shingleHashSet(batch, idCol, textCol, shingleN)
      .select(col("id").cast(LongType).as("id"), col("h"))
      .localCheckpoint(eager = true)
    val deltaIds = batch.select(col(idCol).cast(LongType).as("id")).distinct()
      .localCheckpoint(eager = true)
    def dropDelta(df: DataFrame): DataFrame =
      df.join(broadcast(deltaIds), Seq("id"), "left_anti")
    baseSh = dropDelta(baseSh)
    baseSigs = dropDelta(baseSigs)
    baseSizes = dropDelta(baseSizes)
    scored = dropDelta(scored)
    pairs = pairs
      .join(broadcast(deltaIds.select(col("id").as("ia"))), Seq("ia"), "left_anti")
      .join(broadcast(deltaIds.select(col("id").as("ib"))), Seq("ib"), "left_anti")
      .select(col("ia"), col("ib"))
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
    // the ONE keep-best window (Dedup.keepBestLosersFromClusters) —
    // shared with the batch purge so the q_st17 ≡ q_d20 equivalence
    // can never drift on the rule itself
    val losers = Dedup.keepBestLosersFromClusters(scored,
      Dedup.dupClusters(pairs))
    scored.join(losers, Seq("id"), "left_anti")
  }
}
