package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Partitioning}

/** Round-9 additions to the oracle-gated registry: the sniff-dispatched
  * real-codec decode gate (q_m14) and the cross-codec image dedup gate
  * (q_m13) — the two multimodal closures the r8 review called for —
  * plus the composed end-to-end curation pipeline (q_t33).
  *
  * Session-scoped file (the CurationQueries pattern) so the older
  * registries stay stable.
  */
object RoundNineQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- M14: sniff-dispatched decode over a mixed-modality corpus ------

  /** One record per document id, routed to a REAL container by id mod
    * 4: PNG / WAV / GVI1 video / raw unknown bytes — the corpus the
    * dispatched decode ([[Multimodal.decodeDispatch]]) exists for.
    */
  private def mixedRecords(s: SparkSession, d: String) = {
    import s.implicits._
    Partitioning.spread(Tables.documents(s, d))
      .select($"doc_id".as("media_id")).as[Long]
      .map { id =>
        (id % 4) match {
          case 0 => graft.ops.MediaRecord(id, "image", Multimodal.synthPng(id))
          case 1 => graft.ops.MediaRecord(id, "audio", Multimodal.synthWav(id))
          case 2 => graft.ops.MediaRecord(id, "video", Multimodal.synthVideo(id))
          case _ => graft.ops.MediaRecord(id, "blob", s"doc-$id".getBytes("UTF-8"))
        }
      }
  }

  /** M14: the generic decode path routed through the REAL codecs — one
    * mixed png/wav/gvi1/unknown corpus through
    * [[Multimodal.decodeFeatures]], metadata plus the first two feature
    * values. Every branch of the dispatch is oracle-replayed:
    *
    *   - png  → ImageIO decode; f0/f1 = gray-thumbnail cells (0,0)/(1,0)
    *     scaled by one float32 /255 (integer-exact operands — PNG is
    *     lossless, so a match proves the decode preserved every pixel);
    *   - wav  → AudioSystem decode; f0/f1 = Σ|sample| of 4-sample
    *     windows 0/1 scaled by /131072 (PCM lossless — same proof);
    *   - gvi1 → demux + frame-0 ImageIO decode (the frame-id algebra of
    *     q_m8 replayed for frame 0);
    *   - unknown → the deterministic stub (q_m2's HUGEINT fold replay,
    *     extended to the pseudo width/height and feature 1).
    *
    * `n_bytes` is deliberately absent: real container sizes are
    * codec-internal, not SQL-replayable — everything emitted here is.
    */
  val m14Dispatch: Q = (s, d) => {
    import s.implicits._
    Multimodal.decodeFeatures(mixedRecords(s, d), batchSize = 64).toDF()
      .select($"media_id", $"meta.format".as("format"),
        $"meta.width".as("width"), $"meta.height".as("height"),
        $"meta.valid".as("valid"),
        element_at($"features", 1).as("f0"),
        element_at($"features", 2).as("f1"))
      .orderBy("media_id")
  }

  val m14DispatchSql: String = {
    val base = (m: String) => s"($m % 41)"
    val sample =
      s"""((((31153 + 2 * ${base("a.m")}) * t.t + 40503 * ${base("a.m")}
         |   + CASE WHEN t.t // 4 = a.m % 64 THEN 500 ELSE 0 END) % 65536) - 32768)""".stripMargin
    s"""WITH ${PipelineQueries.thumbCteFrom(
          """SELECT doc_id AS m FROM documents WHERE doc_id % 4 = 0
            |  UNION
            |  SELECT CASE WHEN doc_id % 6 = 0 THEN 100000 + doc_id
            |              ELSE (doc_id % 29) * 1000 END
            |  FROM documents WHERE doc_id % 4 = 2""".stripMargin)},
       |img AS (
       |  SELECT d.doc_id AS media_id, 'png' AS format, 18 AS width, 16 AS height,
       |    t0.tv AS v0, t1.tv AS v1
       |  FROM documents d
       |  JOIN th t0 ON t0.m = d.doc_id AND t0.tx = 0 AND t0.ty = 0
       |  JOIN th t1 ON t1.m = d.doc_id AND t1.tx = 1 AND t1.ty = 0
       |  WHERE d.doc_id % 4 = 0),
       |vid AS (
       |  SELECT d.doc_id AS media_id, 'gvi1' AS format, 18 AS width, 16 AS height,
       |    t0.tv AS v0, t1.tv AS v1
       |  FROM (SELECT doc_id, CASE WHEN doc_id % 6 = 0 THEN 100000 + doc_id
       |                            ELSE (doc_id % 29) * 1000 END AS f0id
       |        FROM documents WHERE doc_id % 4 = 2) d
       |  JOIN th t0 ON t0.m = d.f0id AND t0.tx = 0 AND t0.ty = 0
       |  JOIN th t1 ON t1.m = d.f0id AND t1.tx = 1 AND t1.ty = 0),
       |auds AS (
       |  SELECT a.m, t.t // 4 AS w, $sample AS sv
       |  FROM (SELECT doc_id AS m FROM documents WHERE doc_id % 4 = 1) a,
       |       (SELECT unnest(generate_series(0, 7)) AS t) t),
       |audw AS (SELECT m, w, CAST(SUM(ABS(sv)) AS BIGINT) AS sa FROM auds GROUP BY 1, 2),
       |aud AS (
       |  SELECT w0.m AS media_id, 'wav' AS format, 0 AS width, 0 AS height,
       |    w0.sa AS a0, w1.sa AS a1
       |  FROM audw w0 JOIN audw w1 ON w1.m = w0.m AND w1.w = 1
       |  WHERE w0.w = 0),
       |blob AS (
       |  SELECT doc_id AS m, hex(CAST('doc-' || CAST(doc_id AS VARCHAR) AS BLOB)) AS hx,
       |    octet_length(CAST('doc-' || CAST(doc_id AS VARCHAR) AS BLOB)) AS n
       |  FROM documents WHERE doc_id % 4 = 3),
       |bhh AS (
       |  SELECT m, list_reduce(
       |    list_prepend(CAST(1125899906842597 AS HUGEINT),
       |      list_transform(range(1, n + 1),
       |        i -> CAST(CASE WHEN ${PipelineQueries.m2Byte} >= 128
       |                       THEN ${PipelineQueries.m2Byte} - 256
       |                       ELSE ${PipelineQueries.m2Byte} END AS HUGEINT))),
       |    (acc, x) -> ((31 * acc + x) % ${PipelineQueries.m2Pow64}
       |                 + ${PipelineQueries.m2Pow64}) % ${PipelineQueries.m2Pow64}) AS hu
       |  FROM blob),
       |bh AS (
       |  SELECT m, CASE WHEN hu >= CAST(9223372036854775808 AS HUGEINT)
       |                 THEN hu - ${PipelineQueries.m2Pow64} ELSE hu END AS h
       |  FROM bhh),
       |stub AS (
       |  -- Java's arithmetic >> FLOORS; guard the negative branch with
       |  -- non-negative operands so the replay is floor on any engine
       |  SELECT m AS media_id, 'unknown' AS format,
       |    64 + abs(h % 1024) AS width,
       |    64 + abs((CASE WHEN h >= 0 THEN h // 1024
       |                   ELSE -((-h + 1023) // 1024) END) % 1024) AS height,
       |    abs(h % 1000) AS s0,
       |    abs((CASE WHEN h >= 0 THEN h // 2
       |              ELSE -((-h + 1) // 2) END) % 1000) AS s1
       |  FROM bh),
       |allrows AS (
       |  SELECT media_id, format, width, height, TRUE AS valid,
       |    CAST(v0 AS REAL) / CAST(255.0 AS REAL) AS f0,
       |    CAST(v1 AS REAL) / CAST(255.0 AS REAL) AS f1
       |  FROM (SELECT * FROM img UNION ALL SELECT * FROM vid)
       |  UNION ALL
       |  SELECT media_id, format, width, height, TRUE AS valid,
       |    CAST(a0 AS REAL) / CAST(131072.0 AS REAL) AS f0,
       |    CAST(a1 AS REAL) / CAST(131072.0 AS REAL) AS f1
       |  FROM aud
       |  UNION ALL
       |  SELECT media_id, format, width, height, FALSE AS valid,
       |    CAST(s0 AS REAL) / CAST(1000.0 AS REAL) AS f0,
       |    CAST(s1 AS REAL) / CAST(1000.0 AS REAL) AS f1
       |  FROM stub)
       |SELECT media_id, format, CAST(width AS INTEGER) AS width,
       |  CAST(height AS INTEGER) AS height, valid, f0, f1
       |FROM allrows ORDER BY media_id""".stripMargin
  }

  // ---- M13: cross-codec image near-dup (PNG vs JPEG re-encode) --------

  /** M13: "same image, different container" — the canonical multimodal
    * re-encode case. Every 5th document id becomes a PNG and a REAL
    * JPEG re-encode of it ([[Multimodal.encodeJpeg]], quality 0.9);
    * both go through the full dedup chain — ImageIO decode (JPEG inflate
    * included), gray thumbnail, dHash, 4×16-bit banding, exact-Hamming
    * verify at the q_m5 threshold — and every (png, jpeg) twin pair
    * must come back. The recovery is DETERMINISTIC, not probabilistic:
    * MultimodalSpec pins the measured twin distance at ≤ 3 bits, and 3
    * flipped bits cannot touch all 4 bands (pigeonhole), so a shared
    * band — hence the candidate, hence the verified pair — is
    * guaranteed. The oracle is the twin relation itself; hamming values
    * are codec-internal and deliberately not emitted.
    */
  val m13CrossCodec: Q = (s, d) => {
    import s.implicits._
    val recs = Partitioning.spread(Tables.documents(s, d))
      .select($"doc_id".as("m")).as[Long]
      .filter((id: Long) => id % 5 == 0)
      .flatMap { id =>
        val png = Multimodal.synthPng(id)
        Iterator(
          graft.ops.MediaRecord(id, "png", png),
          graft.ops.MediaRecord(1000000L + id, "jpeg",
            Multimodal.encodeJpeg(png, 0.9f).get))
      }
    Multimodal.imageNearDupPairs(Multimodal.imageDHash(recs).toDF(), maxDist = 4)
      .filter($"ib" === $"ia" + 1000000L)
      .select($"ia", $"ib")
      .orderBy("ia")
  }
  val m13CrossCodecSql: String =
    """SELECT doc_id AS ia, doc_id + 1000000 AS ib
      |FROM documents WHERE doc_id % 5 = 0 ORDER BY ia""".stripMargin

  val all: Map[String, Q] = Map(
    "q_m14_dispatch" -> m14Dispatch,
    "q_m13_cross_codec" -> m13CrossCodec
  )

  val oracles: Map[String, String] = Map(
    "q_m14_dispatch" -> m14DispatchSql,
    "q_m13_cross_codec" -> m13CrossCodecSql
  )
}
