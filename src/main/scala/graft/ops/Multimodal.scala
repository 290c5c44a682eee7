package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Output of the REAL image decode + perceptual-hash stage: decoded
  * dimensions plus the 64-bit dHash split into two non-negative 32-bit
  * halves (hi = bits 32..63, lo = bits 0..31) so the value survives
  * BIGINT arithmetic in any engine without sign traps at bit 63.
  */
case class ImageHash(media_id: Long, width: Int, height: Int,
                     dh_hi: Long, dh_lo: Long)

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
  * balancing, batch shape — is real and tested. IMAGES have a REAL
  * codec path: `decodeImage`/`imageDHash` run `javax.imageio` PNG
  * decode + integer gray/thumbnail/dHash (oracle-proven round-trip —
  * q_m4/q_m5). The generic multi-format feature extractor
  * (`decodeFeatures`) still uses a clearly-marked deterministic STUB
  * (`decodeStub`) for audio/video: this container has none of those codecs,
  * and in production that single function is replaced by a JNI/library
  * call without touching the pipeline around it.
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

  // ---- REAL image decode + perceptual hashing -------------------------
  //
  // Unlike `decodeStub`, everything below runs a genuine codec:
  // `javax.imageio.ImageIO` (JDK-public) encodes and decodes actual PNG
  // bytes. The fixtures are deterministic synthesized images whose pixel
  // values are pure integer functions of (media_id, x, y) — so an oracle
  // can replay the gray/thumbnail/dHash INTEGER math from the id alone,
  // and a hash match proves the PNG encode→decode round-trip preserved
  // every pixel (PNG is lossless; a broken decoder cannot match).

  /** Synth image geometry: 18×16 source, box-averaged to a 9×8 gray
    * thumbnail (exact 2×2 blocks), dHash over the 8×8 adjacent-column
    * comparisons. Small enough that the oracle's per-pixel replay stays
    * cheap at any gate SF.
    */
  val SynthW = 18
  val SynthH = 16
  val ThumbW = 9
  val ThumbH = 8

  /** Deterministic RGB for fixture pixel (x, y) of media `m`. Members of
    * the same base group (m mod 37) share every pixel EXCEPT one
    * per-media perturbed position (x = m mod 18, y = 7·m mod 16) where
    * the red channel shifts by +128 — so same-base images are perceptual
    * near-duplicates (dHash differs in at most a few bits; each
    * perturbation touches one thumb cell = at most 2 adjacent
    * comparisons) while different bases differ everywhere. All integer
    * arithmetic on non-negative values — replayed verbatim in SQL.
    */
  def synthRgb(m: Long, x: Int, y: Int): (Int, Int, Int) = {
    val base = (m % 37).toInt
    val r0 = (31 * base + 7 * x + 13 * y) % 256
    val r = if (x == (m % SynthW) && y == ((m * 7) % SynthH)) (r0 + 128) % 256 else r0
    val g = (17 * base + 11 * x + 5 * y) % 256
    val b = (23 * base + 3 * x + 19 * y) % 256
    (r, g, b)
  }

  /** Encode the synthetic image for `m` as REAL PNG bytes via ImageIO. */
  def synthPng(m: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      SynthW, SynthH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < SynthH) {
      var x = 0
      while (x < SynthW) {
        val (r, g, b) = synthRgb(m, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: ImageIO sniffs the container and inflates the
    * pixels. Returns (width, height, packed RGB row-major) or None for
    * undecodable bytes (callers route those to a quarantine side, never
    * throw — one corrupt blob must not kill a 100 TB scan task).
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      .map { img =>
        val w = img.getWidth; val h = img.getHeight
        (w, h, img.getRGB(0, 0, w, h, null, 0, w))
      }

  /** Integer luma: (299·r + 587·g + 114·b) div 1000 — the fixed-point
    * BT.601 weights, floor division, no floats anywhere.
    */
  private def gray(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Box-average gray thumbnail: target cell (tx, ty) covers source
    * x ∈ [tx·w/tw, (tx+1)·w/tw) (integer floor boundaries — exact 2×2
    * blocks at the synth geometry), value = floor(mean gray). The real
    * resample of an image pipeline, in engine-exact integer form.
    */
  def grayThumb(w: Int, h: Int, rgbRowMajor: Array[Int],
                tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th; val y1 = (ty + 1) * h / th
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw; val x1 = (tx + 1) * w / tw
        var sum = 0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(rgbRowMajor(y * w + x)); n += 1; x += 1 }
          y += 1
        }
        out(ty * tw + tx) = if (n == 0) 0 else sum / n
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** 64-bit dHash over a 9×8 gray thumbnail: bit (ty·8+tx) set iff
    * thumb(tx+1, ty) > thumb(tx, ty) — brightness-gradient signs, the
    * standard perceptual hash that survives re-encoding and small edits.
    * Returned as (hi, lo) 32-bit halves (both non-negative).
    */
  def dHashHalves(thumb: Array[Int]): (Long, Long) = {
    var lo = 0L; var hi = 0L
    var ty = 0
    while (ty < 8) {
      var tx = 0
      while (tx < 8) {
        if (thumb(ty * ThumbW + tx + 1) > thumb(ty * ThumbW + tx)) {
          val idx = ty * 8 + tx
          if (idx < 32) lo |= (1L << idx) else hi |= (1L << (idx - 32))
        }
        tx += 1
      }
      ty += 1
    }
    (hi, lo)
  }

  /** Decode + perceptual-hash pipeline over opaque image payloads: REAL
    * ImageIO decode per record, gray box thumbnail, dHash. Runs as a
    * typed mapPartitions in the scan's partitioning — no shuffle;
    * undecodable payloads are dropped (quarantine them upstream via
    * `sniffFormat` if an audit trail is needed).
    */
  def imageDHash(ds: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        decodeImage(r.content).map { case (w, h, rgb) =>
          val (dhHi, dhLo) = dHashHalves(grayThumb(w, h, rgb, ThumbW, ThumbH))
          ImageHash(r.media_id, w, h, dhHi, dhLo)
        }
      }
    }
  }

  /** Image near-duplicate pairs: band the 64-bit dHash into 4×16-bit
    * chunks, bucket on (band, chunk), enumerate pairs INSIDE the bucket
    * aggregation (the `Dedup.simhashPairs` shape — one keyed shuffle,
    * each hash travels once, quadratic only within a bucket), then
    * verify by exact Hamming distance ≤ maxDist over both halves. A
    * pair sharing several bands is deduped AFTER the cheap in-bucket
    * enumeration (`distinct` on ids+hamming, a few-column frame).
    */
  def imageNearDupPairs(hashes: DataFrame, maxDist: Int): DataFrame =
    hashes
      .withColumn("b", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk", expr(
        """CASE b WHEN 0 THEN dh_lo % 65536 WHEN 1 THEN dh_lo div 65536
          |       WHEN 2 THEN dh_hi % 65536 ELSE dh_hi div 65536 END""".stripMargin))
      .groupBy(col("b"), col("chunk"))
      .agg(sort_array(collect_list(
        struct(col("media_id"), col("dh_hi"), col("dh_lo")))).as("ms"))
      .where(size(col("ms")) > 1)
      .select(explode(expr(
        """flatten(transform(ms,
          |  (x, i) -> transform(slice(ms, i + 2, size(ms)),
          |            y -> named_struct('ia', x.media_id, 'ib', y.media_id,
          |                              'hamming', bit_count(x.dh_lo ^ y.dh_lo)
          |                                       + bit_count(x.dh_hi ^ y.dh_hi)))))"""
          .stripMargin)).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"),
        col("p.hamming").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)

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
