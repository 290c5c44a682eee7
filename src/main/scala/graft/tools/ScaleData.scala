package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-decade data generator: replicate an sf directory K× into a
  * larger one (5 × sf0.1 ≈ sf0.5) for the PLANS.md scale-trend table.
  * BENCH-ONLY data — the correctness gates run exclusively on the
  * driver's own testdata; this exists to measure how the top-cost
  * queries grow across a data decade, which the per-round sf0.001→0.1
  * ratios cannot show.
  *
  * Scaling is TPC-H-shaped: each replica gets a DISJOINT key universe
  * (id offsets per table), so per-key degree distributions — join
  * fan-outs, graph degrees, stream state per user — match a bigger
  * generated instance instead of densifying pathologically.
  *
  *  - documents: doc_id stride 10 000 (stays below the 100 000/200 000
  *    twin offsets the curation gates plant); replica text is
  *    deterministically WORD-SHUFFLED (sort by xxhash64(word, pos,
  *    doc_id)) so cross-replica docs share no 3-shingles (near-dup and
  *    decontamination work scales with data, not with replica count)
  *    while every word-multiset statistic the quality gates read —
  *    stopword hits, word lengths, alpha ratio, unigram NB features —
  *    is preserved exactly.
  *  - lineitem: orderkey/partkey/suppkey offsets → disjoint
  *    co-purchase graph replicas with the original degree law.
  *  - events: event_id/user_id offsets, timestamps kept → same time
  *    range at K× density, K× stream-join state keys.
  *  - embeddings: vec_id stride 100 000, replica vectors rotated by
  *    rep positions (orthogonal ⇒ within-replica cosines exact; needs
  *    K ≤ dim) — the vector gates scale with data, not densified copy
  *    families.
  *  - remaining tables copy through unchanged (dimension sides).
  *
  * Each table lands as a SINGLE parquet file named like the source
  * (`<out>/events.parquet` is a file, not a dir) — the streaming gates
  * glob exact file names and pin one-file-one-microbatch semantics.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = graft.Sessions.local("graft-scaledata")
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def writeSingle(df: DataFrame, name: String): Unit = {
      val tmp = new Path(out, name + ".tmpdir")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      val dest = new Path(out, name)
      fs.delete(dest, true)
      fs.rename(part, dest)
      fs.delete(tmp, true)
      System.err.println(s"[scale] wrote $dest")
    }

    val reps = spark.range(k).toDF("rep")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    writeSingle(
      docs.crossJoin(reps)
        .withColumn("doc_id", col("doc_id") + col("rep") * 10000L)
        .withColumn("text",
          when(col("rep") === 0, col("text")).otherwise(array_join(expr(
            """transform(
              |  array_sort(
              |    transform(split(text, ' '),
              |      (w, i) -> struct(xxhash64(w, i, doc_id) AS h, w AS w)),
              |    (a, b) -> CASE WHEN a.h < b.h THEN -1
              |                   WHEN a.h > b.h THEN 1
              |                   WHEN a.w < b.w THEN -1
              |                   WHEN a.w > b.w THEN 1 ELSE 0 END),
              |  s -> s.w)""".stripMargin), " ")))
        .drop("rep")
        .select(docs.columns.map(col).toIndexedSeq: _*),
      "documents.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    writeSingle(
      li.crossJoin(reps)
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * 10000000L)
        .withColumn("l_partkey", col("l_partkey") + col("rep") * 1000000L)
        .withColumn("l_suppkey", col("l_suppkey") + col("rep") * 100000L)
        .drop("rep")
        .select(li.columns.map(col).toIndexedSeq: _*),
      "lineitem.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    writeSingle(
      ev.crossJoin(reps)
        .withColumn("event_id", col("event_id") + col("rep") * 10000000L)
        .withColumn("user_id", col("user_id") + col("rep") * 1000000L)
        .drop("rep")
        .select(ev.columns.map(col).toIndexedSeq: _*),
      "events.parquet")

    // embeddings: vec_id stride 100000 (preserves the %10 delta split
    // and keeps the vid<8 centroid/query config rows unique to replica
    // 0), replica vectors ROTATED by rep positions — rotation is an
    // orthogonal map, so every within-replica cosine (and therefore
    // each replica's near-dup structure, cell geometry, and bucket
    // occupancy law) is preserved exactly while cross-replica ids
    // stay a disjoint universe; cross-replica cosines are incidental,
    // which is fine for BENCH-only data.
    val em = spark.read.parquet(s"$src/embeddings.parquet")
    val emDim = em.select(size(col("embedding"))).head().getInt(0)
    require(k <= emDim,
      s"embedding rotation needs K <= dim (slice(e, rep+1, …) with rep >= dim " +
        s"would silently emit a wrong-length vector): K=$k, dim=$emDim")
    writeSingle(
      em.crossJoin(reps)
        .withColumn("vec_id", col("vec_id") + col("rep") * 100000L)
        .withColumn("embedding", expr(
          """CASE WHEN rep = 0 THEN embedding ELSE
            |  concat(slice(embedding, CAST(rep AS INT) + 1,
            |               size(embedding) - CAST(rep AS INT)),
            |         slice(embedding, 1, CAST(rep AS INT)))
            |END""".stripMargin))
        .drop("rep")
        .select(em.columns.map(col).toIndexedSeq: _*),
      "embeddings.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders")) {
      writeSingle(spark.read.parquet(s"$src/$t.parquet"), s"$t.parquet")
    }
    spark.stop()
  }
}
