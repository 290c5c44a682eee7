package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}

/** STORE-BACKED incremental keep-best survivor index — the
  * production-durable form of [[KeepBestIndex]]. The in-memory class
  * holds its five accumulated frames as eager `localCheckpoint`s:
  * executor-pinned, non-replicated blocks (lose one executor
  * mid-stream and the index is gone), re-materialized IN FULL every
  * batch — O(batches × state) total work, the wrong cost shape for a
  * long-lived 100 TB ingest guard. Here every batch persists ONLY its
  * delta as parquet under a run directory, commits it atomically with
  * a trailing `_COMMIT` marker (the `Curate.pipelineStaged` /
  * `_SUCCESS` pattern — a marker-less directory is a mid-write crash,
  * invisible to every read and reclaimed when the writer next claims
  * its batch number), and the ACCUMULATED state is a
  * read-time view over the committed deltas. A killed stream resumes
  * by reopening the directory: state is whatever was committed, the
  * next batch folds in exactly as if the crash never happened
  * (q_st18 gates kill-between-batches + a planted mid-batch partial;
  * DedupSpec runs the kill-at-each-boundary sim).
  *
  * Cost shape per batch: WRITE is delta-bounded (the batch's shingle
  * rows, signature, sizes, scores, ids) plus the batch's NEW pairs
  * (output-bounded); nothing stored is ever rewritten. READ is the
  * probe's inherent cost — the delta's bands join the accumulated
  * band side, which any incremental index pays. Contrast the
  * in-memory class: its per-batch `localCheckpoint` of `baseSh`
  * REWRITES the full corpus-scale state every tick.
  *
  * RE-DELIVERY (the at-least-once contract, same semantics as
  * [[KeepBestIndex.ingest]]) is LOGICAL here — append-only storage
  * never deletes: every batch stores its id set, and the read-time
  * view keeps a state row written at batch i only while its id was
  * not re-delivered by a LATER committed batch (`b == latest(id)`);
  * a pair row survives while NEITHER endpoint was re-delivered after
  * it (`latest(ia) ≤ b ∧ latest(ib) ≤ b` — the pair was computed
  * against content that is still current). Re-delivery writes the new
  * content's rows and pairs in its own batch; the stale rows are
  * shadowed, not rewritten. [[compact]] folds the view into one fresh
  * batch and reclaims the shadowed space — amortize it every C
  * batches and total work is O(batches × delta + state·batches/C),
  * not O(batches × state).
  *
  * Single-writer contract (the reference pipeline's own posture: one
  * scheduled updater per table — update-database.yml:282-397 runs one
  * workflow instance); readers are safe any time — they only see
  * committed batches.
  */
final class KeepBestIndexStore private (spark: SparkSession, dir: String,
                                        shingleN: Int, k: Int,
                                        initialRpb: Option[Int],
                                        threshold: Double,
                                        compactEvery: Option[Int],
                                        tuning: Option[KeepBestIndex.AutoTune]) {
  import KeepBestIndexStore._

  private val root = new Path(dir)
  private def fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private var tunedRpb: Option[Int] = initialRpb

  /** The banding the store runs at: fixed at [[KeepBestIndexStore.open]],
    * or the first batch's certified choice for an [[KeepBestIndexStore
    * .openAuto]] store (None before birth — provenance for "which
    * operating point is this guard actually running?").
    */
  def chosenRowsPerBand: Option[Int] = tunedRpb

  private def effectiveRpb: Int =
    tunedRpb.getOrElse(throw new IllegalStateException(
      "KeepBestIndexStore: banding not tuned yet — ingest the first batch first"))

  private def empty(st: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), st)

  /** Committed-set SNAPSHOT, pinned at open and maintained by this
    * instance's own mutations (the single-writer contract makes the
    * writer's view authoritative — nothing else appends or compacts):
    * every read serves the at-open state, and a long-lived PURE READER
    * pays exactly ONE object-store LIST at open instead of one per
    * view assembly (the pre-r16 reader re-listed every call).
    * [[refresh]] re-pins explicitly when a reader wants to observe the
    * single writer's later commits. [[ingest]] still lists fresh at
    * the start of its tick — a pinned snapshot can never make the
    * writer stale — and maintains the set itself afterwards (O(1)
    * round-trips per tick in history length).
    */
  private var committedCache: Option[Seq[Int]] = None

  /** Re-pin the committed-set snapshot to the store's CURRENT on-disk
    * state — the reader's explicit "observe the writer's new commits"
    * hook. One LIST.
    */
  def refresh(): Unit = {
    committedCache = Some(listCommitted)
    refsCache = None
  }

  /** REFERENCED batch directories from PRIOR lifecycle versions — the
    * reband manifest (`_refs`, one `v=K/b=N` line per referenced dir,
    * resolved against the pointer root this version dir lives under).
    * The per-id frames (sh/sigs/sizes/scored/ids) in these dirs are
    * part of this store's committed view exactly as if they were its
    * own batches; their `pairs` are NOT (pairs are banding-dependent —
    * the reband batch rewrote the pair relation at the new banding).
    * The manifest is immutable once the version is built; [[compact]]
    * folds the referenced rows into an owned batch and retires it.
    * Cached: one metadata read per open/refresh, like the committed
    * set.
    */
  private var refsCache: Option[Seq[Path]] = None
  private def refs: Seq[Path] = refsCache.getOrElse {
    val p = new Path(root, RefsFile)
    val r =
      if (!fs.exists(p)) Seq.empty
      else readText(fs, p).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .map(line => new Path(root.getParent, line))
    refsCache = Some(r)
    r
  }

  /** Committed batch numbers, ascending — a batch exists iff its
    * `_COMMIT` marker does (the write order makes the marker the
    * commit point).
    */
  private def committed: Seq[Int] = committedCache.getOrElse(listCommitted)

  /** The latest committed batch number (None on an empty store) — the
    * maintenance tick's durable cadence counter (derived from state,
    * so a kill/resume never resets it).
    */
  private[ops] def lastCommittedBatch: Option[Int] = committed.lastOption

  /** LIST calls actually paid — observability for the one-LIST-per-
    * reader-open contract (KeepBestStoreSpec counts them).
    */
  private[graft] var listCalls: Long = 0L

  /** One glob listing collects every marker — a single namenode/LIST
    * round trip, never a per-directory `exists` cascade.
    */
  private def listCommitted: Seq[Int] = {
    listCalls += 1
    if (!fs.exists(root)) return Seq.empty
    Option(fs.globStatus(new Path(root, "b=*/_COMMIT"))).toSeq.flatten
      .map(_.getPath.getParent.getName)
      .collect { case BatchDir(n) => n.toInt }
      .sorted
  }

  /** One stored frame across the committed batches (each row carries
    * the `b` it was written in), PLUS — for the banding-independent
    * per-id frames — the batches the reband manifest references from
    * prior versions. Reading by explicit committed paths — never a
    * glob — is what makes uncommitted partials invisible. The schema
    * is declared, not footer-inferred: the reband batch's per-id
    * frames are EMPTY directories (the manifest replaces their data),
    * which an inference pass cannot type.
    */
  private def readFrame(name: String, schema: StructType): DataFrame = {
    val own = committed.map(n => s"$dir/b=$n/$name")
    val paths =
      if (name == "pairs") own
      else refs.map(r => new Path(r, name).toString) ++ own
    if (paths.isEmpty) empty(schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** (id, lb): the LATEST committed batch that delivered each id — the
    * shadowing rule's pivot.
    */
  private def idsLatest: DataFrame =
    readFrame("ids", idsSchema).groupBy(col("id")).agg(max(col("b")).as("lb"))

  /** Current rows of a per-id frame: written in the batch that last
    * delivered the id.
    */
  private def effective(name: String, schema: StructType): DataFrame =
    effectiveFrom(idsLatest, name, schema)

  /** [[effective]] against a CALLER-SUPPLIED shadowing pivot — the
    * multi-action assemblies (compact, the reband rebuild) persist
    * [[idsLatest]] once and feed it to every frame view, instead of
    * re-deriving the pivot inside each write action (within ONE action
    * duplicate pivot subtrees already share an exchange via
    * ReuseExchange; across the six write ACTIONS nothing is shared
    * without the persist).
    */
  private def effectiveFrom(latest: DataFrame, name: String,
                            schema: StructType): DataFrame =
    readFrame(name, schema).join(latest, Seq("id"))
      .filter(col("b") === col("lb")).drop("b", "lb")

  /** Current pair rows: neither endpoint re-delivered after the pair
    * was computed (a later delivery replaced the content the pair was
    * verified against — its replacement batch re-probed and re-wrote
    * every still-true pair).
    */
  private def effectivePairs: DataFrame = effectivePairsFrom(idsLatest)

  private def effectivePairsFrom(latest: DataFrame): DataFrame = {
    readFrame("pairs", pairsSchema)
      .join(latest.select(col("id").as("ia"), col("lb").as("la")), Seq("ia"))
      .join(latest.select(col("id").as("ib"), col("lb").as("lbb")), Seq("ib"))
      .filter(col("la") <= col("b") && col("lbb") <= col("b"))
      .select(col("ia"), col("ib"))
  }

  /** Fold one batch into the store: REFUSE on within-batch duplicate
    * ids (the [[KeepBestIndex.ingest]] contract), probe the delta
    * against the committed view (delta-only shingling — the q_st14
    * incremental contract; re-delivered ids' stale base rows are
    * dropped inside the probe and shadowed in the store), write the
    * six delta frames under the next batch directory, then commit
    * with the trailing marker. A crash anywhere before the marker
    * leaves a partial directory that stays invisible (reads use
    * explicit committed paths) until the next ingest claims the same
    * batch number and reclaims it; the batch re-ingests cleanly.
    */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             score: Column): Unit = {
    val dupId = Concurrent.labeled(spark, "kbs:ingest dup-check")(
      batch.groupBy(col(idCol)).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).limit(1).collect())
    require(dupId.isEmpty,
      s"KeepBestIndexStore.ingest: id ${dupId.headOption.map(_.get(0)).orNull} " +
        "appears more than once WITHIN the batch — the keyed-upsert contract " +
        "requires within-batch-unique ids")
    // Tune at BIRTH, before anything is written: an infeasible first
    // batch refuses with the directory still empty (the KeepBestIndex
    // refuse-before-state rule, store-backed). The choice is persisted
    // as `_tuned_rpb` FIRST, then the standard params fingerprint —
    // that order makes a crash between the two writes recoverable
    // (openAuto heals a missing fingerprint from the stored choice;
    // the reverse order would strand a fingerprint whose rpb is
    // unrecoverable from its hash).
    tuning.foreach { t =>
      if (tunedRpb.isEmpty) {
        val (mod, cap) = t.gateFor(batch.count())
        val choice = Concurrent.labeled(spark, "kbs:birth tuning")(
          Dedup.chooseLshConfig(batch, idCol, textCol, shingleN, k,
            t.rowsPerBandConfigs, threshold, mod,
            t.precisionFloorPpm, t.recallFloorPpm, t.truthDfCap, cap)
          .filter(col("chosen")).select(col("rows_per_band")).collect())
        require(choice.nonEmpty,
          "KeepBestIndexStore: no banding configuration meets the precision/" +
            "recall floors on the first batch's sample — refusing BEFORE " +
            "anything is written (a silent default banding would run the " +
            "store at an operating point the floors just rejected); loosen a " +
            "floor or extend rowsPerBandConfigs")
        val rpb = choice.head.getInt(0)
        writeTextAtomic(fs, new Path(root, "_tuned_rpb"), rpb.toString)
        writeTextAtomic(fs, new Path(root, "_params.sha256"),
          fingerprint(shingleN, k, rpb, threshold))
        tunedRpb = Some(rpb)
      }
    }
    // ONE listing per tick: the writer owns the committed set for the
    // rest of this ingest (and beyond — single-writer contract), so the
    // probe's view assembly and the cadence check below re-read the
    // cache, not the object store.
    val before = listCommitted
    committedCache = Some(before)
    val n = before.lastOption.fold(0)(_ + 1)
    val bdir = new Path(root, s"b=$n")
    StoreRoot.claimBatchDir(fs, bdir)
    val dSh = Concurrent.labeled(spark, "kbs:ingest delta shingles")(
      Dedup.shingleHashSet(batch, idCol, textCol, shingleN)
        .select(col("id").cast(LongType).as("id"), col("h"))
        .localCheckpoint(eager = true))
    def put(name: String, df: DataFrame): Unit =
      df.withColumn("b", lit(n))
        .write.parquet(new Path(bdir, name).toString)
    // The six delta-frame jobs are INDEPENDENT once dSh is
    // materialized: five are map/one-exchange derivations of the
    // checkpointed delta (or of the batch itself), the sixth — the
    // incremental probe — reads only the COMMITTED view (the new batch
    // dir is not in `committed`, so the concurrent writes are invisible
    // to it). Overlap them (guide §2.6): sequentially each job's stage
    // tail idled most cores; concurrently the delta writes back-fill
    // the probe's tails. A failure in any job leaves a marker-less
    // partial — the same crash shape as the sequential code — because
    // runAll rethrows before the `_COMMIT` below.
    // The delta's signature / sizes / ids frames feed BOTH their own
    // frame writes and the probe — materialize each ONCE (the probe
    // used to re-run the signature groupBy and sizes aggregation the
    // writes had just paid), then overlap the six independent writes.
    var dSigs: DataFrame = null
    var dSizes: DataFrame = null
    var dIds: DataFrame = null
    Concurrent.runLabeled(spark, Seq(
      "kbs:ingest delta sigs" -> (() =>
        dSigs = Dedup.minhashSigs(dSh, k).localCheckpoint(eager = true)),
      "kbs:ingest delta sizes" -> (() =>
        dSizes = dSh.groupBy(col("id")).agg(count(lit(1)).as("n"))
          .localCheckpoint(eager = true)),
      "kbs:ingest delta ids" -> (() =>
        dIds = dSh.select(col("id")).distinct()
          .localCheckpoint(eager = true))))
    Concurrent.runLabeled(spark, Seq(
      "kbs:ingest probe+pairs" -> (() =>
        put("pairs", Dedup.incrementalNearDupPairsFromSets(
            effective("sh", shSchema), effective("sigs", sigsSchema), dSh,
            k, effectiveRpb, threshold,
            baseSizes = Some(effective("sizes", sizesSchema)),
            dSigs = Some(dSigs), dSizes = Some(dSizes), dIds = Some(dIds))
          .select(col("ia"), col("ib")))),
      "kbs:ingest write sh" -> (() => put("sh", dSh)),
      "kbs:ingest write sigs" -> (() => put("sigs", dSigs)),
      "kbs:ingest write sizes" -> (() => put("sizes", dSizes)),
      "kbs:ingest write scored" -> (() =>
        put("scored", batch.select(col(idCol).cast(LongType).as("id"),
          score.cast(LongType).as("score")))),
      "kbs:ingest write ids" -> (() => put("ids", dIds))))
    StoreRoot.commitBatch(fs, bdir)
    committedCache = Some(before :+ n)
    // the amortization cadence: fold every C committed batches, so the
    // shadowed history is bounded at C deltas and total maintenance
    // work is O(batches × delta + state · batches/C), never
    // O(batches × state). The compaction itself is crash-safe (see
    // [[compact]]) — a kill between the ingest commit above and this
    // fold just defers the fold to a later tick.
    compactEvery.foreach(c => if (committed.size >= c) compact())
  }

  /** The CURRENT surviving (id, score) rows off the committed view —
    * the ONE keep-best window ([[Dedup.keepBestLosersFromClusters]],
    * shared with the batch purge and the in-memory index), so the
    * q_st18 ≡ q_d20 equivalence can never drift on the rule itself.
    */
  def survivors: DataFrame = {
    val scored = effective("scored", scoredSchema)
    val losers = Dedup.keepBestLosersFromClusters(scored,
      Dedup.dupClusters(effectivePairs))
    scored.join(losers, Seq("id"), "left_anti")
  }

  /** [[Dedup.contentGroups]] of the CURRENT effective state, rebuilt
    * from STORED hashes — no text needed: the hs key is the sorted
    * hashed shingle set the store already holds per id, so the
    * reband chooser runs off state alone (the corpus may be long
    * gone — at 100 TB you re-certify an index from the index).
    */
  private[graft] def effectiveGroups: DataFrame =
    effective("sh", shSchema)
      .groupBy(col("id")).agg(sort_array(collect_set(col("h"))).as("hs"))
      .groupBy(col("hs"))
      .agg(sort_array(collect_list(col("id"))).as("members"))
      .withColumn("rep", element_at(col("members"), 1))

  /** [[effectiveGroups]] of the hash-gated SAMPLE, with the gate
    * applied to the id BEFORE every shuffle in the assembly — the
    * [[Dedup.sampleGroupsOf]] equivalence run in the cheap direction
    * (restricting ids can never merge or split content groups — the hs
    * key is a pure function of the content — so gate-then-group ≡
    * group-then-filter-members; KeepBestStoreSpec pins it on stored
    * state). The gate sits STRUCTURALLY on both inputs of the
    * shadowing join (the stored sh rows AND the ids frame feeding the
    * latest-batch pivot — an inner join on id keeps the restriction
    * exact), not merely above it waiting for the optimizer to push a
    * custom-expression predicate. This is what makes a PER-TICK
    * re-certification ([[KeepBestIndexStore.maintainedIngest]])
    * affordable: the state is scanned once map-side, but only the
    * sample's rows ever cross a shuffle — grouping the full state
    * first would make every maintenance tick a corpus-scale shuffle
    * job.
    */
  private[graft] def effectiveSampleGroups(sampleMod: Long): DataFrame = {
    def gated(df: DataFrame): DataFrame = df.filter(
      pmod(TextOps.hash60(col("id").cast("string")), lit(sampleMod)) === 0)
    val latest = gated(readFrame("ids", idsSchema))
      .groupBy(col("id")).agg(max(col("b")).as("lb"))
    gated(readFrame("sh", shSchema))
      .join(latest, Seq("id"))
      .filter(col("b") === col("lb")).drop("b", "lb")
      .groupBy(col("id")).agg(sort_array(collect_set(col("h"))).as("hs"))
      .groupBy(col("hs"))
      .agg(sort_array(collect_list(col("id"))).as("members"))
      .withColumn("rep", element_at(col("members"), 1))
  }

  /** RE-CERTIFY the banding on the CURRENT state — the birth chooser's
    * exact algebra ([[Dedup.chooseLshConfigFromGroups]]) off the
    * stored hashes: the operating point that certified on the birth
    * batch can go stale as the corpus grows (the d25/d26 finding — the
    * feasible region MOVES with scale), and this is the measurement
    * that says so. Returns the config the CURRENT state certifies
    * (None when nothing meets the floors — the caller decides whether
    * that refuses or alarms).
    */
  def rebandChoice(tune: KeepBestIndex.AutoTune): Option[Int] = {
    val (mod, cap) = tune.gateFor(idsLatest.count())
    Dedup.chooseLshConfigFromGroups(effectiveSampleGroups(mod), k,
        tune.rowsPerBandConfigs, threshold,
        tune.precisionFloorPpm, tune.recallFloorPpm, tune.truthDfCap, cap)
      .filter(col("chosen")).select(col("rows_per_band")).collect()
      .headOption.map(_.getInt(0))
  }

  /** Build the reband payload for a NEW version at `newDir` — BY
    * REFERENCE, not by copy (guide §6: don't rewrite data you didn't
    * change). The per-id frames (sh/sigs/sizes/scored/ids) are
    * banding-INDEPENDENT (k minhashes; `rowsPerBand` only slices
    * them), so the new version's `_refs` manifest simply names this
    * store's committed batch dirs (plus whatever ITS manifest already
    * referenced — flattened here, so reads never chase chains) and the
    * only data written is the one banding-DEPENDENT artifact: the pair
    * relation, re-banded from the STORED sigs and re-verified against
    * the STORED shingle postings — zero text, zero re-shingling, and
    * zero corpus-scale copy. The pre-r18 form rewrote all five per-id
    * frames: O(corpus) per reband, the one full-state copy left in the
    * lifecycle.
    *
    * The pairs write is ONE action, so the three shadowing-pivot
    * subtrees inside it share their exchange (ReuseExchange) without
    * any persist. Its batch number continues this store's sequence
    * (own committed batches are always numbered ABOVE every referenced
    * batch, so the read-time shadowing rule — `latest(id) <= pair.b`
    * for still-current pairs — holds across the version boundary), and
    * the new batch's per-id frames are written EMPTY to keep the
    * uniform per-batch layout ([[readFrame]] declares schemas, so an
    * empty directory reads as zero rows).
    *
    * Returns the batch dir for the caller to commit — everything
    * before that marker is invisible; a crash leaves an orphaned
    * version dir the lifecycle never adopts.
    */
  private[graft] def writeRebandInto(rpb: Int, newDir: Path): Path = {
    val sources = refs ++ committed.map(n => new Path(root, s"b=$n"))
    writeTextAtomic(fs, new Path(newDir, RefsFile),
      sources.map(p => s"${p.getParent.getName}/${p.getName}").mkString("\n"))
    val n = lastCommittedBatch.fold(0)(_ + 1)
    val bdir = new Path(newDir, s"b=$n")
    StoreRoot.claimBatchDir(fs, bdir)
    def put(name: String, df: DataFrame): Unit =
      df.withColumn("b", lit(n))
        .write.parquet(new Path(bdir, name).toString)
    val latest = idsLatest
    val cand = Dedup.lshCandidatesFromSigs(
      effectiveFrom(latest, "sigs", sigsSchema), rpb, k)
    val pairs = Dedup.jaccardVerifySized(cand,
        effectiveFrom(latest, "sh", shSchema),
        effectiveFrom(latest, "sizes", sizesSchema), setCol = "h")
      .filter(col("jac") >= threshold)
      .select(col("ia"), col("ib"))
    Concurrent.labeled(spark, "kbs:reband pairs")(put("pairs", pairs))
    Seq("sh" -> shSchema, "sigs" -> sigsSchema, "sizes" -> sizesSchema,
      "scored" -> scoredSchema, "ids" -> idsSchema).foreach {
      case (name, st) =>
        // repartition(1): one footer-bearing (empty) part file, so the
        // directory stays schema-readable even without a declared schema
        put(name, empty(StructType(st.filterNot(_.name == "b")))
          .repartition(1))
    }
    bdir
  }

  /** Fold the committed view into one fresh batch and drop the
    * shadowed history — space reclamation, not semantics: the view
    * before and after is identical. Crash-safe at every point: once
    * the compacted batch's `_COMMIT` lands, every older row is
    * shadowed by the read-time rule (all ids re-delivered at the
    * compaction batch), so a crash during the trailing deletes leaves
    * a larger-but-correct store and the next compact() reclaims it.
    */
  def compact(): Unit = {
    val bs = committed
    // a 1-batch store with a reband manifest still folds: the fold is
    // what makes the version self-contained (references retired), so
    // the referenced prior version becomes reclaimable by [[vacuum]]
    if (bs.size <= 1 && refs.isEmpty) return
    val n = bs.last + 1
    val bdir = new Path(root, s"b=$n")
    StoreRoot.claimBatchDir(fs, bdir)
    def put(name: String, df: DataFrame): Unit =
      df.withColumn("b", lit(n))
        .write.parquet(new Path(bdir, name).toString)
    // Six write ACTIONS over the effective view: persist the shadowing
    // pivot once (each action re-derived idsLatest — six scans + six
    // pivot shuffles for one tiny relation), materialize it, then
    // overlap the independent writes (guide §2.6). MEMORY_AND_DISK, not
    // localCheckpoint: an executor loss recomputes the pivot from the
    // committed parquet instead of failing the fold.
    val latest = idsLatest
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    latest.count()
    try Concurrent.runAll(Seq(
      () => put("sh", effectiveFrom(latest, "sh", shSchema)),
      () => put("sigs", effectiveFrom(latest, "sigs", sigsSchema)),
      () => put("sizes", effectiveFrom(latest, "sizes", sizesSchema)),
      () => put("scored", effectiveFrom(latest, "scored", scoredSchema)),
      () => put("ids", readFrame("ids", idsSchema).select(col("id")).distinct()),
      () => put("pairs", effectivePairsFrom(latest))))
    finally latest.unpersist()
    StoreRoot.commitBatch(fs, bdir)
    bs.foreach(o => fs.delete(new Path(root, s"b=$o"), true))
    // the fold re-delivered every id at batch n, so every referenced
    // row is shadowed — retire the manifest (referenced dirs belong to
    // the PRIOR version and are vacuum's business, never deleted here).
    // A crash between the commit above and this delete leaves a stale
    // manifest over fully-shadowed rows: correct, just unreclaimed
    // until the next fold.
    fs.delete(new Path(root, RefsFile), false)
    refsCache = Some(Seq.empty)
    committedCache = Some(Seq(n))
  }
}

object KeepBestIndexStore {

  private val BatchDir = "b=(\\d+)".r

  /** The reband manifest's file name — the name is owned by
    * [[StoreRoot]] (its GC must honor references); the CONTENT (which
    * frames are reference-safe) is this store's algebra.
    */
  private[ops] val RefsFile: String = StoreRoot.RefsFile

  private val idsSchema = StructType(Seq(
    StructField("id", LongType), StructField("b", IntegerType)))
  private val shSchema = StructType(Seq(
    StructField("id", LongType), StructField("h", LongType),
    StructField("b", IntegerType)))
  private val sigsSchema = StructType(Seq(
    StructField("id", LongType), StructField("sig", ArrayType(LongType)),
    StructField("b", IntegerType)))
  private val sizesSchema = StructType(Seq(
    StructField("id", LongType), StructField("n", LongType),
    StructField("b", IntegerType)))
  private val scoredSchema = StructType(Seq(
    StructField("id", LongType), StructField("score", LongType),
    StructField("b", IntegerType)))
  private val pairsSchema = StructType(Seq(
    StructField("ia", LongType), StructField("ib", LongType),
    StructField("b", IntegerType)))

  /** Open (or create) a store at `dir`. The parameters are FINGERPRINTED
    * (`_params.sha256`, the `Curate.pipelineStaged` rule): reopening an
    * existing store under different shingling/banding/threshold — or
    * under a different state ALGEBRA version — is refused, because the
    * stored deltas were computed under the old configuration and
    * folding new-configuration batches into them would silently mix
    * two indexes. open() NEVER mutates committed state or batch
    * directories — a pure reader can open concurrently with a writer
    * mid-ingest; crashed partials stay invisible until the writer's
    * next claim of their batch number reclaims them
    * ([[StoreRoot.claimBatchDir]]).
    *
    * `compactEvery`: auto-fold the committed view whenever that many
    * batch deltas have accumulated (after the triggering ingest
    * commits). NOT fingerprinted — it is a maintenance cadence, not
    * state algebra: any instance may change it freely, the view is
    * identical either way.
    */
  def open(spark: SparkSession, dir: String, shingleN: Int = 3, k: Int = 16,
           rowsPerBand: Int = 4, threshold: Double = 0.5,
           compactEvery: Option[Int] = None): KeepBestIndexStore = {
    requireCadence(compactEvery)
    val (root, fs) = rootFs(spark, dir)
    val fp = fingerprint(shingleN, k, rowsPerBand, threshold)
    val fpPath = new Path(root, "_params.sha256")
    if (fs.exists(fpPath)) {
      require(readText(fs, fpPath) == fp,
        s"KeepBestIndexStore: $dir holds state computed under a DIFFERENT " +
          "configuration or algebra version (params fingerprint mismatch) — " +
          "resuming would silently mix two indexes; pass a fresh dir (or " +
          "delete this one) to run with the new parameters")
    } else writeTextAtomic(fs, fpPath, fp)
    val st = new KeepBestIndexStore(spark, dir, shingleN, k, Some(rowsPerBand),
      threshold, compactEvery, tuning = None)
    st.refresh() // pin the at-open snapshot: a pure reader LISTs once
    st
  }

  /** Open a store whose banding is CHOSEN AT BIRTH — the
    * [[KeepBestIndex.AutoTune]] contract, store-backed: on a fresh
    * directory the first [[KeepBestIndexStore.ingest]] prices the
    * tuning grid on that batch's sample and REFUSES (nothing written)
    * when no config meets the floors; the certified choice persists as
    * `_tuned_rpb` plus the STANDARD params fingerprint, so a resumed
    * store — by this method OR by [[open]] with the matching
    * rowsPerBand — is indistinguishable from a fixed-banding store.
    * The tuning parameters are birth-time only: a resume never
    * re-chooses (the stored deltas were banded at the birth choice —
    * re-choosing would mix two indexes, exactly what the fingerprint
    * exists to refuse).
    */
  def openAuto(spark: SparkSession, dir: String,
               tune: KeepBestIndex.AutoTune,
               shingleN: Int = 3, k: Int = 16, threshold: Double = 0.5,
               compactEvery: Option[Int] = None): KeepBestIndexStore = {
    requireCadence(compactEvery)
    val (root, fs) = rootFs(spark, dir)
    val rpbPath = new Path(root, "_tuned_rpb")
    val fpPath = new Path(root, "_params.sha256")
    val stored: Option[Int] =
      if (fs.exists(rpbPath)) {
        val rpb = readText(fs, rpbPath).trim.toInt
        // the stored choice must be a member of the grid that could
        // have certified it — the cheap tripwire against a torn write
        // that parses (a '1' torn from '12') or a hand-edited file:
        // running at an uncertified banding silently is the exact
        // failure the floors exist to refuse
        require(tune.rowsPerBandConfigs.contains(rpb),
          s"KeepBestIndexStore: $dir's persisted banding choice ($rpb) is " +
            s"not in the tuning grid ${tune.rowsPerBandConfigs} — the file " +
            "is torn or the grid changed; restore _tuned_rpb (or rebuild) " +
            "rather than serving at an uncertified operating point")
        val fp = fingerprint(shingleN, k, rpb, threshold)
        if (fs.exists(fpPath)) {
          require(readText(fs, fpPath) == fp,
            s"KeepBestIndexStore: $dir was tuned under DIFFERENT non-banding " +
              "parameters or algebra version (params fingerprint mismatch) — " +
              "resuming would silently mix two indexes")
        } else writeTextAtomic(fs, fpPath, fp) // heal a crash between the two
        Some(rpb)
      } else {
        require(!fs.exists(fpPath),
          s"KeepBestIndexStore: $dir holds a FIXED-banding store (params " +
            "fingerprint present, no _tuned_rpb) — its rowsPerBand is not " +
            "recoverable from the hash; reopen it with open() and the " +
            "original banding instead of openAuto")
        None
      }
    val st = new KeepBestIndexStore(spark, dir, shingleN, k, stored, threshold,
      compactEvery, tuning = Some(tune))
    st.refresh() // pin the at-open snapshot: a pure reader LISTs once
    st
  }

  // ---- Pointer-managed serving root (the reband lifecycle) ------------
  // [[StoreRoot]] protocol, shared with [[IvfIndexStore.retrainIfImbalanced]].

  /** The live version number under a pointer-managed root, if any. */
  def liveVersion(spark: SparkSession, root: String): Option[Int] =
    StoreRoot.liveVersion(spark, root)

  /** Create version 0 of a pointer-managed keep-best root: an
    * [[openAuto]] store under `<root>/v=0` (banding chosen at the
    * first ingest), published by `_latest`.
    */
  def createLive(spark: SparkSession, root: String,
                 tune: KeepBestIndex.AutoTune,
                 shingleN: Int = 3, k: Int = 16, threshold: Double = 0.5,
                 compactEvery: Option[Int] = None): KeepBestIndexStore = {
    val r = new Path(root)
    val fs = StoreRoot.fsOf(spark, r)
    if (!fs.exists(r)) fs.mkdirs(r)
    StoreRoot.requireCreatable(fs, r, "KeepBestIndexStore.createLive")
    val st = openAuto(spark, StoreRoot.versionDir(r, 0).toString, tune,
      shingleN, k, threshold, compactEvery)
    StoreRoot.flipPointer(fs, r, 0)
    st
  }

  /** Open whatever version the pointer currently names — snapshot
    * isolation at directory granularity, exactly the
    * [[IvfIndexStore.openLive]] contract.
    */
  def openLive(spark: SparkSession, root: String,
               tune: KeepBestIndex.AutoTune,
               shingleN: Int = 3, k: Int = 16, threshold: Double = 0.5,
               compactEvery: Option[Int] = None): KeepBestIndexStore = {
    val v = liveVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"KeepBestIndexStore.openLive: $root has no published version — " +
          "createLive it first"))
    openAuto(spark, StoreRoot.versionDir(new Path(root), v).toString, tune,
      shingleN, k, threshold, compactEvery)
  }

  /** THE REBAND LIFECYCLE STEP — [[IvfIndexStore.retrainIfImbalanced]]'s
    * analogue on the banding axis: the birth choice is STATE ALGEBRA
    * (fingerprinted — an existing directory can never switch banding
    * in place), but the operating point that certified on the birth
    * batch goes stale as the corpus grows (the d25/d26 finding: the
    * feasible region moves with scale). This step re-runs the chooser
    * on the CURRENT effective state — from STORED hashes, no text, no
    * re-shingling — and, when the certified config differs from the
    * live one, rebuilds into a fresh fingerprinted `v=N+1`: signatures
    * re-band directly (they are banding-independent), the pair
    * relation re-verifies candidates against the stored postings, the
    * per-id frames are REFERENCED from the live version's committed
    * batches via the `_refs` manifest (never copied — the reband
    * writes only the banding-dependent pairs artifact), and the root
    * pointer flips
    * atomically. Returns None when the live banding is still the
    * certified choice; REFUSES when the current state certifies
    * nothing (floors unreachable — serving at the stale point silently
    * would be the exact failure the floors exist to prevent).
    *
    * Crash-safety: everything before the flip is invisible to readers;
    * a crashed rebuild leaves an orphaned version dir the next attempt
    * rebuilds by number (never adopted). The old version's directory
    * is untouched and stays readable.
    *
    * Scale shape: one chooser pass over the budget-gated sample of the
    * state, one banding + candidate-bounded verify join, ZERO copy of
    * the effective frames (manifest reference). Never quadratic, never
    * a corpus re-scan, never a corpus-scale write.
    */
  def rebandIfStale(spark: SparkSession, root: String,
                    tune: KeepBestIndex.AutoTune,
                    shingleN: Int = 3, k: Int = 16, threshold: Double = 0.5,
                    compactEvery: Option[Int] = None): Option[KeepBestIndexStore] = {
    val cur = openLive(spark, root, tune, shingleN, k, threshold, compactEvery)
    val born = cur.chosenRowsPerBand.getOrElse(
      return None) // pre-birth store: nothing to reband yet
    val choice = cur.rebandChoice(tune)
    require(choice.nonEmpty,
      "KeepBestIndexStore.rebandIfStale: NO banding configuration meets the " +
        "floors on the CURRENT state — the live operating point is stale and " +
        "nothing certifies; loosen a floor or extend rowsPerBandConfigs " +
        "(continuing to serve the stale banding silently is the failure the " +
        "floors exist to surface)")
    if (choice.contains(born)) None
    else {
      val rpbNew = choice.get
      val r = new Path(root)
      val fs = StoreRoot.fsOf(spark, r)
      val next = StoreRoot.nextVersion(fs, r)
      val dir = StoreRoot.versionDir(r, next)
      StoreRoot.claimVersionDir(fs, dir)
      fs.mkdirs(dir)
      // the birth persistence order (choice first, fingerprint second —
      // a crash between the two heals on reopen)
      writeTextAtomic(fs, new Path(dir, "_tuned_rpb"), rpbNew.toString)
      writeTextAtomic(fs, new Path(dir, "_params.sha256"),
        fingerprint(shingleN, k, rpbNew, threshold))
      val bdir = cur.writeRebandInto(rpbNew, dir)
      StoreRoot.commitBatch(fs, bdir)
      StoreRoot.flipPointer(fs, r, next)
      Some(openAuto(spark, dir.toString, tune, shingleN, k, threshold,
        compactEvery))
    }
  }

  /** THE MAINTENANCE TICK on the banding axis —
    * [[IvfIndexStore.maintainedIngest]]'s analogue, the one step a
    * streaming guard runs per micro-batch over a pointer-managed root:
    * fold the batch into the LIVE version (the first tick is birth —
    * the banding certifies on that batch or refuses with nothing
    * written), then re-certify the banding on the CURRENT state from
    * STORED hashes and fire the reband rebuild when the certified
    * config moved ([[rebandIfStale]] — fresh fingerprinted `v=N+1`,
    * atomic marker flip, readers pinned to `v=N` untouched). A kill
    * between ticks resumes exactly: every sub-step is the store's
    * already-crash-safe protocol (q_st29 gates the mid-stream flip +
    * kill/resume end to end).
    *
    * Returns (live version after the tick, the live banding after the
    * tick) — the version sequence is the lifecycle's provenance.
    *
    * `checkEvery` amortizes the re-certification the way
    * `compactEvery` amortizes folds: the chooser pass runs only every
    * `checkEvery`-th tick of the root's DURABLE tick counter
    * ([[StoreRoot.bumpTick]] — kill/resume never resets the rhythm,
    * and compaction consuming batch numbers can never skew it). 1 (the
    * default, and the gates' setting) re-certifies every tick; a
    * skipped tick can never fire the lifecycle.
    *
    * Per-tick cost: the ingest's delta-bounded write + incremental
    * probe; on checked ticks one chooser pass whose SHUFFLES carry
    * only the hash-gated sample ([[effectiveSampleGroups]] — the state
    * is scanned map-side, never re-grouped in full) and whose truth is
    * budget-bounded when the tune states a `sampleBudget`; and — only
    * on a fired tick — the signature re-banding + one copy of the
    * effective frames. Never a corpus re-scan, never text.
    */
  def maintainedIngest(spark: SparkSession, root: String,
                       tune: KeepBestIndex.AutoTune,
                       batch: DataFrame, idCol: String, textCol: String,
                       score: Column,
                       shingleN: Int = 3, k: Int = 16, threshold: Double = 0.5,
                       compactEvery: Option[Int] = None,
                       checkEvery: Int = 1,
                       retainSuperseded: Option[Int] = None): (Int, Int) = {
    val cur = openLive(spark, root, tune, shingleN, k, threshold, compactEvery)
    var live: KeepBestIndexStore = cur
    val v = StoreRoot.maintainedTick(spark, root, checkEvery,
      retainSuperseded)(() => cur.ingest(batch, idCol, textCol, score)) { () =>
      val rebanded =
        rebandIfStale(spark, root, tune, shingleN, k, threshold, compactEvery)
      rebanded.foreach(live = _)
      rebanded.nonEmpty
    }
    (v, live.chosenRowsPerBand.getOrElse(
      sys.error("maintainedIngest: the live store has no banding after " +
        "an ingest — birth tuning should have set it or refused")))
  }

  /** [[StoreRoot.gcSuperseded]] on this root — the retention sweep for
    * versions the reband lifecycle has superseded: keep the newest
    * `keepSuperseded` for pinned readers, delete the rest — EXCEPT a
    * version whose frames a surviving version still references via its
    * reband manifest (deleting it would gut the live index; it becomes
    * reclaimable once the referencing version compacts). Returns the
    * versions deleted.
    */
  def vacuum(spark: SparkSession, root: String, keepSuperseded: Int): Seq[Int] = {
    val r = new Path(root)
    StoreRoot.gcSuperseded(StoreRoot.fsOf(spark, r), r, keepSuperseded)
  }

  private def requireCadence(compactEvery: Option[Int]): Unit =
    require(compactEvery.forall(_ >= 2),
      s"compactEvery must be >= 2 (a 1-cadence would fold after every " +
        s"batch — the O(batches × state) shape this store exists to avoid), " +
        s"got $compactEvery")

  private def rootFs(spark: SparkSession, dir: String): (Path, FileSystem) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) fs.mkdirs(root)
    (root, fs)
  }

  private[ops] def fingerprint(shingleN: Int, k: Int, rowsPerBand: Int,
                               threshold: Double): String = {
    val repr = Seq("kbi-alg=1", shingleN.toString, k.toString,
      rowsPerBand.toString, threshold.toString).mkString(" ")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(repr.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private[ops] def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private[ops] def writeText(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Temp-write + rename for the tiny metadata files whose CONTENT is
    * a decision (`_tuned_rpb`, the `_certified` files,
    * `_params.sha256`): a
    * plain create can tear mid-write, and a torn NUMERIC prefix (a
    * lone '1' torn from '12') parses fine — a restarted process would
    * then run at a banding/width the floors never certified, silently.
    * The rename makes the content all-or-nothing; the brief
    * delete-before-rename gap only ever loses the FILE, which every
    * reader treats as "decide again" (safe), never as a wrong value.
    */
  private[ops] def writeTextAtomic(fs: FileSystem, p: Path, s: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    writeText(fs, tmp, s)
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      sys.error(s"KeepBestIndexStore: atomic metadata publish failed for $p")
  }

}
