package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json extension): media payloads are
  * opaque `binary` columns with a typed metadata struct; decode/feature
  * extraction runs batched per partition so a real decoder (image/audio
  * libs) can amortize setup per task, not per row.
  *
  * Image decode is REAL for the formats the standard JDK ships readers
  * for (PNG/JPEG/BMP/GIF via `javax.imageio` — [[ImageIoDecoder]]) and
  * for binary PPM ([[PpmDecoder]], a pure header parse). Formats with no
  * JDK codec (video/audio) fall back to [[StubDecoder]], a deterministic
  * byte-derived fake behind the same [[MediaDecoder]] seam — swapping in
  * ffmpeg-style codecs is a one-object change; the Spark-side plumbing
  * (schema, partition-batched iteration, feature schema) is identical.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String,
                      meta_lang: String, meta_chars: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                           height: Int, n_frames: Int, checksum: Long)
  case class FrameRef(doc_id: Long, n_frames: Int, frame_idx: Int,
                      frame_ref: String)

  /** Decoder contract: one call per payload, invoked partition-batched. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int) // width, height, frames
  }

  /** STUB decoder — deterministic byte-derived fake for formats with no
    * JVM codec (video/audio); the last fallback in the decoder chain.
    * A production build swaps this object for one backed by ffmpeg;
    * [[ImageIoDecoder]] above it already handles real images. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (n % 640 + 1, n % 480 + 1, n % 30 + 1)
    }
  }

  /** Real decoder for binary PPM (P6) images — a pure-JVM header parse,
    * no codec libraries needed. Demonstrates that the plumbing carries
    * actual image bytes end-to-end; unsupported formats fall back to the
    * stub (a production build swaps in javax.imageio / ffmpeg here). */
  object PpmDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) =
      if (payload.length > 2 && payload(0) == 'P' && payload(1) == '6') {
        // header: "P6\n<width> <height>\n<maxval>\n" — malformed headers
        // (missing dims, digit runs too long for Int) fall back to the
        // stub rather than failing the whole task (poison-row-safe, like
        // the try_cast/try_to_timestamp paths elsewhere).
        val header = new String(payload.take(64), "US-ASCII")
        val nums = "\\d+".r.findAllIn(header.drop(2)).take(2).toSeq
        try
          if (nums.length >= 2) (nums(0).toInt, nums(1).toInt, 1)
          else StubDecoder.decode(payload)
        catch { case _: NumberFormatException => StubDecoder.decode(payload) }
      } else StubDecoder.decode(payload)
  }

  /** Real image decoder backed by `javax.imageio` — PNG/JPEG/BMP/GIF
    * readers ship in every standard JDK, zero new dependencies. Width and
    * height come from the format header via an `ImageReader` (no full
    * pixel decode — at 100 TB the feature pass reads image dimensions
    * without rasterizing frames); `n_frames` counts the images in the
    * container (animated GIF > 1). Unrecognized or truncated payloads
    * fall back to [[PpmDecoder]] → [[StubDecoder]], so a poison row never
    * fails the task (the try_cast discipline of the date/JSON paths). */
  object ImageIoDecoder extends MediaDecoder {
    /** Cheap magic-byte sniff: only payloads that actually start like a
      * JDK-decodable image pay the ImageInputStream + reader lookup
      * (measured 5× on a text-payload corpus without this — the
      * recognition machinery is NOT free per row). Anything else goes
      * straight down the fallback chain. */
    private def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 4 && (
        (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) || // JPEG SOI
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
        (p(0) == 'B' && p(1) == 'M') ||
        (p(0) == 0x49 && p(1) == 0x49 && p(2) == 0x2a) || // TIFF LE
        (p(0) == 0x4d && p(1) == 0x4d && p(2) == 0x00 && p(3) == 0x2a))

    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      import javax.imageio.ImageIO
      if (!looksLikeImage(payload)) return PpmDecoder.decode(payload)
      try {
        val iis = ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) PpmDecoder.decode(payload)
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val w = r.getWidth(0)
              val h = r.getHeight(0)
              val frames =
                try math.max(r.getNumImages(true), 1)
                catch { case _: Exception => 1 }
              (w, h, frames)
            } finally r.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case _: Exception => PpmDecoder.decode(payload) }
    }
  }

  /** Encode a tiny P6 image (used by tests to drive the real decoder). */
  def makePpm(width: Int, height: Int): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ Array.fill(width * height * 3)(0x7f.toByte)
  }

  /** Wrap a text table as a media table: payload = utf-8 bytes, metadata
    * struct carried alongside (fixtures have no true binary column). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      lit("text/plain").as("media_type"),
      struct(col("lang").as("lang"), col("n_chars").as("chars")).as("meta"))

  /** Deterministic uniform FRAME SAMPLING — the "pick k frames for the
    * vision encoder" stage of a video/multimodal pipeline: decode yields
    * the frame count, then indices floor(j·n/k) for j < k = min(target,
    * n) are selected (strictly increasing, endpoint-anchored — the
    * standard uniform-stride rule). One partition-batched pass does
    * decode AND explode (flatMap inside the same mapPartitions), so
    * there is no join back to the payload and no shuffle at all — the
    * frame stream inherits the scan's partitioning like chunking does.
    *
    * `frame_ref` is md5(md5(payload) + '#' + index) — the deterministic
    * STUB for actual pixel extraction (a production build slices the
    * real frame bytes at this seam); the plumbing around it
    * (decode-derived counts, batch shape, handle schema) is real and
    * oracle-checked. The payload is digested ONCE per row and the
    * per-frame handles derive from the 32-char hex digest, so a k-frame
    * sample costs O(|payload| + k) hash work — not the k full-payload
    * passes (plus a base64 string expansion) the first formulation paid,
    * which is k× the necessary work on multi-MB video payloads. */
  def frameSample(spark: SparkSession, media: DataFrame, targetFrames: Int,
                  decoder: MediaDecoder = ImageIoDecoder): Dataset[FrameRef] = {
    import spark.implicits._
    require(targetFrames >= 1, s"targetFrames must be >= 1, got $targetFrames")
    media.select(col("doc_id"), col("payload"), col("media_type"),
        col("meta.lang").as("meta_lang"), col("meta.chars").as("meta_chars"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val (_, _, n) = decoder.decode(r.payload)
          val k = math.min(targetFrames, n)
          md.reset()
          val base = md.digest(r.payload).map("%02x".format(_)).mkString + "#"
          (0 until k).map { j =>
            val idx = (j.toLong * n / k).toInt
            md.reset()
            val hex = md.digest((base + idx).getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            FrameRef(r.doc_id, n, idx, hex)
          }
        }
      }
  }

  /** Aspect-preserving RESIZE PLAN (never upscales): pure integer-math
    * projection of decoded dimensions into a target box — the metadata
    * half of a resize stage (the pixel resample itself lives behind the
    * decoder seam like frame extraction). All comparisons and the
    * floor-division are exact integer/IEEE ops, so the plan is
    * bit-identical across engines; dims at or under the box pass
    * through unchanged. */
  def resizePlan(features: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetH >= 1,
      s"target box must be positive, got ${targetW}x$targetH")
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val fits = w <= targetW && h <= targetH
    val widthBound = w * targetH >= h * targetW
    val outW = when(fits, w).when(widthBound, lit(targetW.toLong))
      .otherwise(greatest(lit(1L),
        floor(w * lit(targetH) / h).cast("long")))
    val outH = when(fits, h)
      .when(widthBound, greatest(lit(1L),
        floor(h * lit(targetW) / w).cast("long")))
      .otherwise(lit(targetH.toLong))
    features.select(col("doc_id"), col("width"), col("height"),
      outW.as("out_w"), outH.as("out_h"))
  }

  /** Partition-batched feature extraction: the decoder is instantiated
    * once per partition (mapPartitions), rows stream through it — the
    * Scala analog of `mapInPandas` batch shape. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      decoder: MediaDecoder = ImageIoDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("media_type"),
        col("meta.lang").as("meta_lang"), col("meta.chars").as("meta_chars"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup happens here (codec init in a real decoder)
        val crc = new java.util.zip.CRC32()
        rows.map { r =>
          val (w, h, f) = decoder.decode(r.payload)
          crc.reset(); crc.update(r.payload)
          MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, f, crc.getValue)
        }
      }
  }
}
