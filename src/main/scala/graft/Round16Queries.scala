package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.IvfIndexStore

/** Round-16 additions — the serving-tier durability items the r15
  * verdict ranked: the searchAuto certification PERSISTED beside the
  * store (q_st27 — a restarted serving process on unchanged state pays
  * ZERO re-certification: the decision file, keyed by committed
  * version + anchor CONTENT fingerprint + config, is the `_tuned_rpb`
  * birth-choice pattern applied to the read tier), and the maintenance
  * tick composing ingest → health metric → conditional lifecycle
  * inside a streaming job (q_st28).
  *
  * Session-scoped file (the Round15Queries pattern) so the older
  * registries stay stable.
  */
object Round16Queries {

  type Q = (SparkSession, String) => DataFrame

  // ---- ST27: the persisted certification survives a process restart -----

  /** ST27: [[IvfIndexStore.searchAuto]]'s decision DURABILITY — q_st24
    * proves N serves between ingests share one certification inside a
    * process; this gate proves the certification survives the process:
    * the full corpus is ingested (three batches), serve 1 certifies
    * (engine-`require`d == 1) and persists the decision under
    * `_certified/`, then the instance is DISCARDED and the store
    * reopened from disk ([[IvfIndexStore.openPinned]] — the restart),
    * and serves 2 and 3 run with a RE-CREATED anchor frame (same rows,
    * new object — the content fingerprint must hit where the pre-r16
    * reference keying would have re-certified). The reopened instance
    * engine-`require`s `certifications == 0`: the restart re-paid the
    * shadowing assembly the state inherently costs, but NO anchor-truth
    * pass. The oracle replays the one committed state, the tuning
    * grid's cheapest floor-adequate width, and all three serves at it —
    * the same answers whether the decision was computed or re-read.
    * Columns: serve_id, vec_id, cid, cos_sim, nprobe.
    */
  val st27StoreCertPersist: Q = (s, d) => {
    import s.implicits._
    graft.ops.TempFiles.withTempDir("graft-st27") { root =>
      val vecs = Tables.embeddings(s, d)
        .select($"vec_id".as("vid"), $"embedding".cast("array<double>").as("e"))
      val centroids = vecs.filter($"vid" < 8)
        .select($"vid".as("cid"), $"e".as("ce")).localCheckpoint(true)
      val trafficA = vecs.filter($"vid" === 5).select($"e").localCheckpoint(true)
      val trafficB = vecs.filter($"vid" === 3).select($"e").localCheckpoint(true)
      val corpus = vecs.filter(!$"vid".isin(0L, 5L))
      val dir = new java.io.File(root, "store").getAbsolutePath
      val idx = IvfIndexStore.open(s, dir, centroids)
      idx.ingest(corpus.filter(pmod($"vid", lit(3L)) === 1))
      idx.ingest(corpus.filter(pmod($"vid", lit(3L)) === 2))
      idx.ingest(corpus.filter(pmod($"vid", lit(3L)) === 0))
      def serve(st: IvfIndexStore, id: Int, tune: DataFrame,
                q: DataFrame): DataFrame =
        st.searchAuto(tune, q, k = 10, nprobes = Seq(1, 2, 4),
            recallFloorPpm = Round14Queries.e24RecallFloorPpm)
          .select(lit(id).as("serve_id"), col("vid").as("vec_id"), col("cid"),
            col("cos_sim"), col("nprobe"))
      val tune1 = vecs.filter($"vid" === 0).select($"e").localCheckpoint(true)
      val s1 = serve(idx, 1, tune1, trafficA)
      require(idx.certifications == 1,
        s"st27: the first serve must pay the one certification, " +
          s"paid ${idx.certifications}")
      // THE RESTART: a fresh instance from disk, and a re-created
      // anchor frame — same rows, different object
      val re = IvfIndexStore.openPinned(s, dir)
      val tune2 = vecs.filter($"vid" === 0).select($"e").localCheckpoint(true)
      val s2 = serve(re, 2, tune2, trafficB)
      val s3 = serve(re, 3, tune2, trafficA)
      require(re.certifications == 0,
        "st27: the reopened instance must read the persisted decision and " +
          s"pay ZERO re-certification, paid ${re.certifications}")
      s1.unionByName(s2).unionByName(s3)
        .orderBy(col("serve_id"), col("cos_sim").desc, col("vec_id"))
        .localCheckpoint(eager = true)
    }
  }

  /** One state (the full corpus), one tuning decision, three serves at
    * the chosen width — serves 1/3 for traffic A, serve 2 for B. CTE
    * builders shared with the q_st24 oracle (tag B = every corpus
    * row).
    */
  val st27StoreCertPersistSql: String = {
    import Round14Queries.cosSql
    s"""WITH v AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cent AS (SELECT vid AS cid, e AS ce FROM v WHERE vid < 8),
       |corpus AS (SELECT vid, e FROM v WHERE vid NOT IN (0, 5)),
       |tq AS (SELECT e AS tqe FROM v WHERE vid = 0),
       |qA AS (SELECT e AS qqA FROM v WHERE vid = 5),
       |qB AS (SELECT e AS qqB FROM v WHERE vid = 3),
       |${Round15Queries.st24StateCtes("B", "TRUE")},
       |tc1 AS (SELECT cid FROM cent, tq ORDER BY ${cosSql("ce", "tqe")} DESC, cid LIMIT 1),
       |tc2 AS (SELECT cid FROM cent, tq ORDER BY ${cosSql("ce", "tqe")} DESC, cid LIMIT 2),
       |tc4 AS (SELECT cid FROM cent, tq ORDER BY ${cosSql("ce", "tqe")} DESC, cid LIMIT 4),
       |${Round15Queries.st24TuneBlock("B", 1)},
       |${Round15Queries.st24TuneBlock("B", 2)},
       |${Round15Queries.st24TuneBlock("B", 4)},
       |trowsB AS (SELECT * FROM trowB1 UNION ALL SELECT * FROM trowB2
       |           UNION ALL SELECT * FROM trowB4),
       |selB AS (SELECT nprobe FROM trowsB
       |         WHERE recall_ppm >= ${Round14Queries.e24RecallFloorPpm}
       |         ORDER BY n_scanned, nprobe LIMIT 1),
       |scA1 AS (SELECT cid FROM cent, qA ORDER BY ${cosSql("ce", "qqA")} DESC, cid LIMIT 1),
       |scA2 AS (SELECT cid FROM cent, qA ORDER BY ${cosSql("ce", "qqA")} DESC, cid LIMIT 2),
       |scA4 AS (SELECT cid FROM cent, qA ORDER BY ${cosSql("ce", "qqA")} DESC, cid LIMIT 4),
       |scB1 AS (SELECT cid FROM cent, qB ORDER BY ${cosSql("ce", "qqB")} DESC, cid LIMIT 1),
       |scB2 AS (SELECT cid FROM cent, qB ORDER BY ${cosSql("ce", "qqB")} DESC, cid LIMIT 2),
       |scB4 AS (SELECT cid FROM cent, qB ORDER BY ${cosSql("ce", "qqB")} DESC, cid LIMIT 4),
       |${Round15Queries.st24ServeBlock("B", "A", 1)},
       |${Round15Queries.st24ServeBlock("B", "A", 2)},
       |${Round15Queries.st24ServeBlock("B", "A", 4)},
       |${Round15Queries.st24ServeBlock("B", "B", 1)},
       |${Round15Queries.st24ServeBlock("B", "B", 2)},
       |${Round15Queries.st24ServeBlock("B", "B", 4)}
       |SELECT serve_id, vec_id, cid, cos_sim, nprobe FROM (
       |${Round15Queries.st24ServePick(1, "B", "A")}
       |  UNION ALL
       |${Round15Queries.st24ServePick(2, "B", "B")}
       |  UNION ALL
       |${Round15Queries.st24ServePick(3, "B", "A")})
       |ORDER BY serve_id, cos_sim DESC, vec_id""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q_st27_store_cert_persist" -> st27StoreCertPersist
  )

  val oracles: Map[String, String] = Map(
    "q_st27_store_cert_persist" -> st27StoreCertPersistSql
  )
}
