package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted by the decode stage. */
case class MediaMeta(format: String, width: Int, height: Int, n_bytes: Long, valid: Boolean)

/** An opaque media row: binary payload + routing info. */
case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

/** Decode output: metadata + a fixed-width feature vector. */
case class DecodedMedia(media_id: Long, kind: String, meta: MediaMeta, features: Array[Float])

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, decoded / feature-
  * extracted in size-bounded batches via `mapPartitions`.
  *
  * The Spark-side plumbing — schema, Dataset encoders, partition
  * balancing, batch shape — is real and tested. The pixel/sample decode
  * itself is a clearly-marked deterministic STUB (`decodeStub`): this
  * container has no image/audio codecs, and in production that single
  * function is replaced by a JNI/library call without touching the
  * pipeline around it.
  */
object Multimodal {

  /** Magic-byte sniffing on the binary header (real logic, not stubbed —
    * operates on raw bytes like any container-format detector).
    */
  def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') "mp4"
    // RIFF is a container family (AVI, WEBP, ...): only the WAVE form type
    // at bytes 8-11 is audio.
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else "unknown"

  /** STUB decode — deterministic fake standing in for the real codec.
    * Derives stable pseudo-dimensions and a 16-float feature vector from
    * the content bytes so tests are reproducible. Replace the body with
    * the real decoder (e.g. ImageIO / ffmpeg JNI) in deployment.
    */
  def decodeStub(b: Array[Byte]): (MediaMeta, Array[Float]) = {
    val fmt = sniffFormat(b)
    var h = 1125899906842597L // deterministic FNV-ish fold over content
    var i = 0
    while (i < b.length) { h = 31 * h + b(i); i += 1 }
    val width = 64 + math.abs(h % 1024).toInt
    val height = 64 + math.abs((h >> 10) % 1024).toInt
    val features = Array.tabulate(16)(k =>
      (math.abs((h >> k) % 1000) / 1000.0f))
    (MediaMeta(fmt, width, height, b.length.toLong, fmt != "unknown"), features)
  }

  /** Balance partitions by payload size so one partition doesn't hold
    * all the 4K videos while another holds thumbnails. Note this must
    * NOT range-partition ON the size column — that would cluster the
    * largest payloads together (equal row counts × largest bytes = the
    * exact skew we're avoiding). Hash-spreading on a size-independent
    * key gives every partition the same expected byte load without a
    * global sort.
    *
    * The spread key is a hash of the payload itself: deterministic
    * under task retry (unlike `monotonically_increasing_id`, whose
    * position-dependent ids change when a lost shuffle block is
    * recomputed — rows would move buckets and the replay could
    * duplicate or drop them, the SPARK-23207 hazard). Byte-identical
    * payloads co-locating is fine: hash values are independent of
    * payload SIZE, so expected byte load per partition stays uniform.
    */
  def balanceBySize(df: DataFrame, contentCol: String, partitions: Int): DataFrame =
    df.repartition(partitions, hash(col(contentCol)))

  /** Decode + feature-extract in size-bounded batches. The batch shape
    * (`batchSize` records per decode call) mirrors how a vectorized
    * decode API would be fed; with a scalar stub it still exercises the
    * grouping, ordering and memory profile of the real thing.
    */
  def decodeFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // Real deployment: one vectorized decode call per batch here.
        batch.iterator.map { r =>
          val (meta, feats) = decodeStub(r.content)
          DecodedMedia(r.media_id, r.kind, meta, feats)
        }
      }
    }
  }

  /** Resize stage: cap each media's pseudo-dimensions to fit inside
    * `maxSide` preserving aspect ratio — the thumbnail/normalize step
    * between decode and feature extraction. The GEOMETRY (integer
    * floor-scaling, no-upscale, aspect preservation) is real and
    * engine-portable; only the pixel resample itself would be the
    * library call, exactly like `decodeStub`. Runs as a typed map over
    * the decoded Dataset — no shuffle, stays in the decode stage's
    * partitioning.
    */
  def resizeMeta(ds: Dataset[DecodedMedia], maxSide: Int): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.map { m =>
      val w = m.meta.width; val h = m.meta.height
      val side = math.max(w, h)
      if (side <= maxSide || side == 0) m
      else {
        // Floor both dims by the same rational factor; never below 1px.
        val nw = math.max(1, w * maxSide / side)
        val nh = math.max(1, h * maxSide / side)
        m.copy(meta = m.meta.copy(width = nw, height = nh))
      }
    }
  }

  /** Frame-sampling plumbing for video-like payloads: split the payload
    * into `nFrames` evenly-spaced slices (the real implementation seeks
    * keyframes; the slicing/fan-out shape is identical).
    */
  def sampleFrames(ds: Dataset[MediaRecord], nFrames: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val n = math.max(1, math.min(nFrames, r.content.length))
      val step = math.max(1, r.content.length / n)
      (0 until n).map { f =>
        val start = f * step
        val end = math.min(r.content.length, start + step)
        (r.media_id, f, java.util.Arrays.copyOfRange(r.content, start, end))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
