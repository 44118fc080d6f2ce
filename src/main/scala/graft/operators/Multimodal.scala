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

  /** Decoder contract: one call per payload, invoked partition-batched.
    * `decode` is the header-only metadata pass (dims + frame count — no
    * rasterization, the 100 TB feature-scan shape); `decodeGray` is the
    * OPTIONAL pixel pass for content operators ([[ImageDedup]]'s
    * perceptual hash): grayscale rasterize, or None when this decoder
    * cannot produce pixels (the caller falls back to a deterministic
    * byte-derived stub grid, keeping the operator total). */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int) // width, height, frames
    /** (width, height, row-major grayscale 0..255), or None. */
    def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = None
    /** Content handles for the sampled frame indices `idxs` of this
      * payload. Default = the deterministic STUB derivation
      * md5(md5(payload) + '#' + idx) — one payload digest, handles
      * derived from the 32-char hex, O(|payload| + k) — for formats
      * whose individual frames can't be rasterized on the JVM (video/
      * audio). Decoders that CAN read per-frame rasters override with
      * real pixel digests ([[ImageIoDecoder]]: animated GIF). */
    def frameHandles(payload: Array[Byte], idxs: Seq[Int]): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val base = md.digest(payload).map("%02x".format(_)).mkString + "#"
      idxs.map { idx =>
        md.reset()
        md.digest((base + idx).getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
    }
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

    /** REAL pixel decode for binary PPM: a full netpbm P6 parse — header
      * ints with `#`-comment support per the spec, then w*h*3 raw sample
      * bytes; gray = (r+g+b)/3. Returns None (never throws) for
      * malformed, truncated or 2-byte-sample payloads — poison-row-safe
      * like the metadata pass. */
    override def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
        return None
      var pos = 2
      def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
      def nextInt(): Int = { // -1 on parse failure
        var inComment = false
        while (pos < payload.length &&
               (inComment || isWs(payload(pos)) || payload(pos) == '#')) {
          if (payload(pos) == '#') inComment = true
          else if (payload(pos) == '\n') inComment = false
          pos += 1
        }
        val start = pos
        var v = 0L
        while (pos < payload.length && payload(pos) >= '0' &&
               payload(pos) <= '9' && v <= Int.MaxValue) {
          v = v * 10 + (payload(pos) - '0'); pos += 1
        }
        if (pos == start || v > Int.MaxValue) -1 else v.toInt
      }
      val w = nextInt(); val h = nextInt(); val maxv = nextInt()
      // exactly ONE whitespace byte separates maxval from the samples
      if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255 ||
          pos >= payload.length || !isWs(payload(pos))) return None
      val px = pos + 1
      if (payload.length - px < w.toLong * h * 3) return None
      val gray = new Array[Int](w * h)
      var i = 0
      while (i < gray.length) {
        val o = px + i * 3
        gray(i) = ((payload(o) & 0xff) + (payload(o + 1) & 0xff) +
          (payload(o + 2) & 0xff)) / 3
        i += 1
      }
      Some((w, h, gray))
    }
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

    /** REAL pixel decode via `ImageIO.read` for the JDK formats
      * (PNG/JPEG/BMP/GIF); non-image payloads fall through to
      * [[PpmDecoder.decodeGray]] (→ None if not P6 either). */
    override def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
      if (!looksLikeImage(payload)) PpmDecoder.decodeGray(payload)
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) PpmDecoder.decodeGray(payload)
        else {
          val w = img.getWidth; val h = img.getHeight
          val gray = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              gray(y * w + x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          Some((w, h, gray))
        }
      } catch { case _: Exception => PpmDecoder.decodeGray(payload) }

    /** REAL per-frame handles for multi-image containers (animated GIF —
      * the one JDK-readable multi-frame format): each sampled frame is
      * rasterized with `reader.read(i)` and its (dims + ARGB rows)
      * digested — two payloads with the same frame pixels get the same
      * handle regardless of container bytes, the content-address
      * property the stub derivation cannot give. Single-frame images and
      * anything unreadable keep the stub derivation (so the x57 stub leg
      * and this real leg agree on schema and determinism, differing only
      * in what the handle is a digest OF). */
    override def frameHandles(payload: Array[Byte], idxs: Seq[Int]): Seq[String] = {
      import javax.imageio.ImageIO
      if (!looksLikeImage(payload)) return super.frameHandles(payload, idxs)
      try {
        val iis = ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) super.frameHandles(payload, idxs)
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val frames =
                try math.max(r.getNumImages(true), 1)
                catch { case _: Exception => 1 }
              if (frames <= 1) super.frameHandles(payload, idxs)
              else {
                val md = java.security.MessageDigest.getInstance("MD5")
                idxs.map { i =>
                  val img = r.read(math.min(i, frames - 1))
                  md.reset()
                  val w = img.getWidth; val h = img.getHeight
                  val bb = java.nio.ByteBuffer.allocate(math.max(w * 4, 8))
                  bb.putInt(w).putInt(h)
                  md.update(bb.array(), 0, 8)
                  val row = new Array[Int](w)
                  var y = 0
                  while (y < h) {
                    img.getRGB(0, y, w, 1, row, 0, w)
                    bb.clear()
                    var x = 0
                    while (x < w) { bb.putInt(row(x)); x += 1 }
                    md.update(bb.array(), 0, w * 4)
                    y += 1
                  }
                  md.digest().map("%02x".format(_)).mkString
                }
              }
            } finally r.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case _: Exception => super.frameHandles(payload, idxs) }
    }
  }

  /** REAL video leg for MOTION-JPEG streams — the one video container
    * parseable with zero codec libraries: an MJPEG stream is
    * back-to-back JPEG images, and JPEG byte-stuffing guarantees 0xFFD8
    * (SOI) / 0xFFD9 (EOI) never occur inside entropy-coded data, so the
    * frame boundaries are recoverable by a byte scan. Each frame slice
    * is then a plain JPEG for `ImageIO`: `decode` reports the first
    * frame's dims and the real frame count; [[frameHandles]] digests
    * each sampled frame's decoded raster (the same content-address law
    * as the animated-GIF leg). Payloads with fewer than two frames fall
    * through to [[ImageIoDecoder]] (a single JPEG is just an image);
    * true codec video (H.264…) still takes the stub. Known limit of the
    * naive scan: an APP-segment-embedded thumbnail (EXIF) would be seen
    * as a frame of its own — a production build walks the marker-length
    * chain instead; camera-style MJPEG streams don't carry them. */
  object MjpegDecoder extends MediaDecoder {
    private[operators] def frameSlices(p: Array[Byte]): IndexedSeq[(Int, Int)] = {
      val out = IndexedSeq.newBuilder[(Int, Int)]
      var i = 0
      var start = -1
      while (i + 1 < p.length) {
        if ((p(i) & 0xff) == 0xff) {
          val m = p(i + 1) & 0xff
          if (m == 0xd8 && start < 0) start = i
          else if (m == 0xd9 && start >= 0) {
            out += ((start, i + 2 - start)); start = -1
          }
        }
        i += 1
      }
      out.result()
    }

    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val fs = frameSlices(payload)
      if (fs.length < 2) ImageIoDecoder.decode(payload)
      else {
        val (off, len) = fs.head
        val (w, h, _) = ImageIoDecoder.decode(
          java.util.Arrays.copyOfRange(payload, off, off + len))
        (w, h, fs.length)
      }
    }

    override def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      val fs = frameSlices(payload)
      if (fs.length < 2) ImageIoDecoder.decodeGray(payload)
      else {
        val (off, len) = fs.head
        ImageIoDecoder.decodeGray(
          java.util.Arrays.copyOfRange(payload, off, off + len))
      }
    }

    override def frameHandles(payload: Array[Byte], idxs: Seq[Int]): Seq[String] = {
      val fs = frameSlices(payload)
      if (fs.length < 2) ImageIoDecoder.frameHandles(payload, idxs)
      else try {
        val md = java.security.MessageDigest.getInstance("MD5")
        idxs.map { i =>
          val (off, len) = fs(math.min(i, fs.length - 1))
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(payload, off, off + len)))
          if (img == null) throw new java.io.IOException("undecodable frame")
          md.reset()
          val w = img.getWidth; val h = img.getHeight
          val bb = java.nio.ByteBuffer.allocate(math.max(w * 4, 8))
          bb.putInt(w).putInt(h)
          md.update(bb.array(), 0, 8)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            bb.clear()
            var x = 0
            while (x < w) { bb.putInt(row(x)); x += 1 }
            md.update(bb.array(), 0, w * 4)
            y += 1
          }
          md.digest().map("%02x".format(_)).mkString
        }
      } catch {
        case _: Exception => super.frameHandles(payload, idxs)
      }
    }
  }

  /** Encode a tiny P6 image (used by tests to drive the real decoder). */
  def makePpm(width: Int, height: Int): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ Array.fill(width * height * 3)(0x7f.toByte)
  }

  /** Encode a grayscale P6 image (r=g=b per pixel). `spacedHeader`
    * produces the equally-legal single-line `P6 w h 255\n` header — a
    * byte-level RE-ENCODING of the same pixels, used to prove content
    * hashes survive re-encoding while byte hashes do not. */
  def makePpmGray(width: Int, height: Int, gray: Array[Int],
                  spacedHeader: Boolean = false): Array[Byte] = {
    require(gray.length == width * height,
      s"gray has ${gray.length} pixels, expected ${width * height}")
    val header = (if (spacedHeader) s"P6 $width $height 255\n"
                  else s"P6\n$width $height\n255\n").getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < gray.length) {
      val v = (gray(i) & 0xff).toByte
      val o = header.length + i * 3
      out(o) = v; out(o + 1) = v; out(o + 2) = v
      i += 1
    }
    out
  }

  /** Deterministic synthetic P6 media table derived from a text corpus —
    * the fixture adapter behind the x59 image-dedup oracle (the driver
    * fixtures carry no true image column; this derives one from
    * `documents` rather than synthesizing foreign data). Two rows per
    * document:
    *
    *  - `doc_id`: a canonical-header [[ImageDedup.GridW]]×[[ImageDedup.GridH]]
    *    grayscale P6 whose pixel i is `17 * hexdigit_i` of
    *    md5(text‖":0") ‖ md5(text‖":1") ‖ md5(text‖":2") — a SQL engine
    *    reproduces every pixel from the text with its own md5, no PPM
    *    parser needed;
    *  - `doc_id + copyOffset`: a RE-ENCODED near-duplicate — single-space
    *    header (different bytes, same image) with pixel 0 inverted, so
    *    its dHash differs from the original's in at most ONE gradient
    *    bit while sharing no payload bytes.
    */
  def syntheticPpmPairs(spark: SparkSession, docs: DataFrame, idCol: String,
                        textCol: String, copyOffset: Long): DataFrame = {
    import spark.implicits._
    val gw = ImageDedup.GridW; val gh = ImageDedup.GridH
    require(gw * gh <= 96, "pixel grid exceeds the 3-block md5 chain")
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(s: String): String = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
        rows.flatMap { case (id, text) =>
          val hx = hex(text + ":0") + hex(text + ":1") + hex(text + ":2")
          val gray = Array.tabulate(gw * gh)(
            i => 17 * Character.digit(hx.charAt(i), 16))
          val pert = gray.clone(); pert(0) = 255 - pert(0)
          Seq((id, makePpmGray(gw, gh, gray)),
            (id + copyOffset, makePpmGray(gw, gh, pert, spacedHeader = true)))
        }
      }
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/x-portable-pixmap"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
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
    * `frame_ref` comes from the decoder's [[MediaDecoder.frameHandles]]
    * seam: REAL per-frame pixel digests where the JVM can rasterize
    * individual frames (animated GIF via [[ImageIoDecoder]]), else the
    * deterministic stub derivation md5(md5(payload) + '#' + index) —
    * one payload digest per row with handles derived from the 32-char
    * hex, so a k-frame sample costs O(|payload| + k) hash work, not k
    * full-payload passes. The x57 registration pins [[StubDecoder]]
    * (pure stub leg) so its oracle stays closed-form; the GIF real leg
    * is spec-checked. */
  def frameSample(spark: SparkSession, media: DataFrame, targetFrames: Int,
                  decoder: MediaDecoder = ImageIoDecoder): Dataset[FrameRef] = {
    import spark.implicits._
    require(targetFrames >= 1, s"targetFrames must be >= 1, got $targetFrames")
    media.select(col("doc_id"), col("payload"), col("media_type"),
        col("meta.lang").as("meta_lang"), col("meta.chars").as("meta_chars"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (_, _, n) = decoder.decode(r.payload)
          val k = math.min(targetFrames, n)
          val idxs = (0 until k).map(j => (j.toLong * n / k).toInt)
          idxs.zip(decoder.frameHandles(r.payload, idxs)).map {
            case (idx, hex) => FrameRef(r.doc_id, n, idx, hex)
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

  case class ImageStats(doc_id: Long, width: Int, height: Int,
                        brightness: Double, contrast: Double, aspect: Double)

  /** Image QUALITY SIGNALS from real decoded pixels — the multimodal
    * analog of the text quality score (x12): per image, mean gray
    * (`brightness`, 0-255 scale), population standard deviation
    * (`contrast` — near-zero flags blank/flat frames the way repetition
    * flags spam text), and `aspect` = w/h. A filter stage drops
    * blank / extreme-aspect images before they cost dedup or training
    * budget.
    *
    * Cross-engine float law: sum and sum-of-squares accumulate as exact
    * integers, so for images up to ~12 MP (where n·Σg² and (Σg)² stay
    * inside a signed 64-bit long) `contrast` = sqrt(n·Σg² − (Σg)²)/n
    * touches floating point only at the final sqrt and divide — both
    * correctly-rounded IEEE ops — then rounds on the 1e-4 grid like
    * every exported ratio. Past 12 MP the variance numerator switches
    * to double accumulation (relative error ~1e-16 — far inside the
    * grid — but no longer bit-provable; documented, not silent).
    * Undecodable payloads take the [[ImageDedup.stubGray]] grid,
    * keeping the operator total. */
  /** Exact-integer (Σg, Σg²) of the first n gray values. */
  private[graft] def grayMoments(gray: Array[Int], n: Int): (Long, Long) = {
    var sum = 0L; var sumSq = 0L
    var i = 0
    while (i < n) { val g = gray(i).toLong; sum += g; sumSq += g * g; i += 1 }
    (sum, sumSq)
  }

  /** The ONE definition of the contrast law (gridded population std) —
    * shared by [[imageStats]] and the streaming
    * [[graft.streaming.Streams.imageGate]], so the gate can never
    * silently diverge from the stat it thresholds (the splitLabel
    * lesson). See [[imageStats]] for the exactness argument. */
  private[graft] def contrastLaw(n: Long, sum: Long, sumSq: Long): Double = {
    val varNum =
      if (n <= 12000000L) (n * sumSq - sum * sum).toDouble
      else n.toDouble * sumSq - sum.toDouble * sum
    math.floor(math.sqrt(varNum) / n * 10000 + 0.5) / 10000.0
  }

  def imageStats(spark: SparkSession, media: DataFrame,
                 decoder: MediaDecoder = ImageIoDecoder): Dataset[ImageStats] = {
    import spark.implicits._
    def grid4(v: Double): Double = math.floor(v * 10000 + 0.5) / 10000.0
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h, gray) = decoder.decodeGray(payload)
            .getOrElse((ImageDedup.GridW, ImageDedup.GridH,
              ImageDedup.stubGray(payload)))
          val n = w.toLong * h
          val (sum, sumSq) = grayMoments(gray, w * h)
          ImageStats(id, w, h,
            grid4(sum.toDouble / n),
            contrastLaw(n, sum, sumSq),
            grid4(w.toDouble / h))
        }
      }
  }

  case class AudioMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       nSamples: Long)
  case class AudioStats(doc_id: Long, channels: Int, sample_rate: Int,
                        bits_per_sample: Int, n_samples: Long,
                        duration_ms: Long)

  /** REAL audio container parse for RIFF/WAVE — like [[PpmDecoder]], a
    * pure-JVM byte-level parse, no codec libraries: walks the chunk list
    * (RIFF size header, `fmt ` for channels/rate/bits, `data` for the
    * sample payload length), returns None — never throws — for
    * malformed/truncated/non-PCM payloads. Compressed formats (MP3,
    * AAC…) have no JVM decoder and take the stub leg, exactly the
    * image family's split between PPM/ImageIO and the stub. */
  object WavParser extends Serializable {
    def parse(payload: Array[Byte]): Option[AudioMeta] = {
      def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
      def u32(o: Int): Long =
        (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
          ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
      def tag(o: Int): String =
        if (o + 4 <= payload.length)
          new String(payload, o, 4, "US-ASCII")
        else ""
      if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return None
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
      var dataBytes = -1L
      while (pos + 8 <= payload.length && (fmt.isEmpty || dataBytes < 0)) {
        val id = tag(pos)
        val sz = u32(pos + 4)
        if (id == "fmt " && pos + 24 <= payload.length) {
          val audioFormat = u16(pos + 8)
          if (audioFormat != 1) return None // PCM only
          fmt = Some((u16(pos + 10), u32(pos + 12).toInt, u16(pos + 22)))
        } else if (id == "data") {
          // truncated payloads cap at the bytes actually present
          dataBytes = math.min(sz, (payload.length - pos - 8).toLong)
        }
        // clamp the declared size to the bytes present BEFORE the int
        // narrowing — a hostile 4 GB chunk size must not wrap negative
        // and stall the walk
        val step = math.min(sz, (payload.length - pos - 8).toLong).toInt
        pos += 8 + step + (step & 1) // chunks are word-aligned
      }
      fmt.collect { case (ch, rate, bits)
          if ch >= 1 && rate >= 1 && bits >= 8 && dataBytes >= 0 =>
        AudioMeta(ch, rate, bits, dataBytes / (ch.toLong * (bits / 8)))
      }
    }

    /** Locate the `data` chunk's sample bytes: (offset, length) into the
      * payload, length capped at the bytes actually present. The seam
      * behind [[Multimodal.audioFingerprints]] — content addressing must
      * hash the SAMPLES, not the container (a re-tagged file with an
      * extra LIST chunk is the same audio). */
    def dataChunk(payload: Array[Byte]): Option[(Int, Int)] = {
      def u32(o: Int): Long =
        (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
          ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
      def tag(o: Int): String =
        if (o + 4 <= payload.length)
          new String(payload, o, 4, "US-ASCII")
        else ""
      if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return None
      var pos = 12
      while (pos + 8 <= payload.length) {
        val sz = u32(pos + 4)
        val avail = math.min(sz, (payload.length - pos - 8).toLong).toInt
        if (tag(pos) == "data") return Some((pos + 8, avail))
        pos += 8 + avail + (avail & 1)
      }
      None
    }
  }

  /** Encode a PCM RIFF/WAVE payload with silent samples (used by tests
    * and the x66 registration to drive the real parser). */
  def makeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
              nSamples: Long): Array[Byte] = {
    val dataBytes = (nSamples * channels * (bitsPerSample / 8)).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * (bitsPerSample / 8))
      .putShort((channels * (bitsPerSample / 8)).toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  /** Encode a PCM RIFF/WAVE payload carrying the GIVEN sample bytes;
    * `withListChunk` injects a metadata LIST chunk before `data` — a
    * byte-level RE-ENCODING of the same audio (different container,
    * identical samples), the WAV analog of [[makePpmGray]]'s spaced
    * header. */
  def makeWavWithSamples(channels: Int, sampleRate: Int, bitsPerSample: Int,
                         samples: Array[Byte],
                         withListChunk: Boolean = false): Array[Byte] = {
    val list =
      if (withListChunk)
        "LIST".getBytes("US-ASCII") ++
          Array[Byte](6, 0, 0, 0) ++ "INFOta".getBytes("US-ASCII")
      else Array.emptyByteArray
    val bb = java.nio.ByteBuffer
      .allocate(36 + list.length + 8 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(28 + list.length + 8 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * (bitsPerSample / 8))
      .putShort((channels * (bitsPerSample / 8)).toShort)
      .putShort(bitsPerSample.toShort)
      .put(list)
      .put("data".getBytes("US-ASCII")).putInt(samples.length)
      .put(samples)
    bb.array()
  }

  /** Audio CONTENT fingerprints — the audio half of the dedup brief's
    * content addressing (the image half is [[ImageDedup.dHashes]]):
    * md5 over the `data` chunk's SAMPLE BYTES, located by the real
    * container walk, so two encodings of the same audio — different
    * metadata chunks, different header layouts — share a fingerprint
    * while a byte hash (x1's sha256) sees different payloads.
    * Non-WAV payloads degrade to md5 of the whole payload (without a
    * parser, content address = byte address), keeping the operator
    * total. One decode scan; only (doc_id, 32-char hex) ever leaves
    * the task. */
  def audioFingerprints(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, payload) =>
          md.reset()
          WavParser.dataChunk(payload) match {
            case Some((off, len)) => md.update(payload, off, len)
            case None             => md.update(payload)
          }
          (id, md.digest().map("%02x".format(_)).mkString)
        }
      }
      .toDF("doc_id", "audio_hash")
  }

  /** Audio stream properties from the REAL container parse — the audio
    * analog of [[extractFeatures]]/[[imageStats]]: per payload,
    * channels / sample rate / sample width / sample count and the
    * derived duration (exact integer math: floor(n·1000/rate) — no
    * floating point anywhere, so the oracle mirrors it closed-form).
    * Non-WAV payloads take a deterministic byte-derived stub (rate 8000
    * mono 8-bit, one "sample" per payload byte), keeping the operator
    * total. */
  def audioStats(spark: SparkSession, media: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val m = WavParser.parse(payload)
            .getOrElse(AudioMeta(1, 8000, 8, payload.length.toLong))
          AudioStats(id, m.channels, m.sampleRate, m.bitsPerSample,
            m.nSamples, m.nSamples * 1000L / m.sampleRate)
        }
      }
  }

  /** Synthetic WAV NEAR-DUP pair table — the x67 fixture adapter,
    * mirroring [[syntheticPpmPairs]]: per document, a canonical mono
    * 8 kHz WAV whose samples are the ascii bytes of
    * md5(text‖":0") ‖ md5(text‖":1") (so a SQL engine reproduces the
    * content hash as md5 of that very string), and (id + copyOffset) a
    * RE-ENCODED copy — stereo 16 kHz header plus an injected LIST
    * metadata chunk, sharing not one container byte with the original
    * but carrying identical samples. */
  def syntheticWavPairs(spark: SparkSession, docs: DataFrame, idCol: String,
                        textCol: String, copyOffset: Long): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(s: String): String = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
        rows.flatMap { case (id, text) =>
          val smp = (hex(text + ":0") + hex(text + ":1")).getBytes("US-ASCII")
          Seq((id, makeWavWithSamples(1, 8000, 8, smp)),
            (id + copyOffset,
              makeWavWithSamples(2, 16000, 8, smp, withListChunk = true)))
        }
      }
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("audio/wav"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
  }

  /** Deterministic synthetic WAV media table derived from a text corpus
    * — the x66 fixture adapter (the driver fixtures carry no audio
    * column), mirroring [[syntheticPpmPairs]]: every field is a
    * closed-form function of driver columns, so a SQL engine reproduces
    * the expected stats without a RIFF parser while the Spark side must
    * actually parse the bytes it built. */
  def syntheticWavTable(spark: SparkSession, docs: DataFrame, idCol: String,
                        charsCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(charsCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val channels = 1 + (id % 2).toInt
          val rate = 8000 * (1 + (id % 3).toInt)
          val bits = if (id % 4 < 2) 8 else 16
          (id, makeWav(channels, rate, bits, nChars + 50L))
        }
      }
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("audio/wav"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
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
