package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  // a deterministic non-uniform 7x10 gray raster (distinct gradients)
  private def grid(f: Int => Int): Array[Int] =
    Array.tabulate(ImageDedup.GridW * ImageDedup.GridH)(i => f(i) & 0xff)
  private val baseGray = grid(i => (i * 37 + 11) % 256)

  private def media(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/*"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))

  private def encodeImage(fmt: String, gray: Array[Int], scale: Int = 1): Array[Byte] = {
    val (w, h) = (ImageDedup.GridW * scale, ImageDedup.GridH * scale)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = gray((y / scale) * ImageDedup.GridW + (x / scale))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("PpmDecoder.decodeGray parses pixels under header variants and comments") {
    val canonical = Multimodal.makePpmGray(7, 10, baseGray)
    val spaced = Multimodal.makePpmGray(7, 10, baseGray, spacedHeader = true)
    val commented = ("P6\n# a comment with digits 123\n7 10\n255\n"
      .getBytes("US-ASCII")) ++ canonical.drop("P6\n7 10\n255\n".length)
    for (p <- Seq(canonical, spaced, commented)) {
      val Some((w, h, g)) = Multimodal.PpmDecoder.decodeGray(p)
      assert((w, h) == (7, 10) && g.toSeq == baseGray.toSeq)
    }
    // malformed payloads are None, never a throw
    assert(Multimodal.PpmDecoder.decodeGray("P6\n7 10\n255\n".getBytes).isEmpty)
    assert(Multimodal.PpmDecoder.decodeGray("not an image".getBytes).isEmpty)
    assert(Multimodal.PpmDecoder.decodeGray(Array[Byte]()).isEmpty)
  }

  test("dHash is invariant under re-encoding: PPM, spaced PPM, PNG, BMP agree") {
    val fps = Seq(
      Multimodal.makePpmGray(7, 10, baseGray),
      Multimodal.makePpmGray(7, 10, baseGray, spacedHeader = true),
      encodeImage("png", baseGray),
      encodeImage("bmp", baseGray)
    ).map { p =>
      val Some((w, h, g)) = Multimodal.ImageIoDecoder.decodeGray(p)
      ImageDedup.dHash60(w, h, g)
    }
    assert(fps.distinct.size == 1)
    // ...while the byte-level hash (x1's notion of identity) sees four
    // entirely different payloads — the property that makes perceptual
    // dedup a DIFFERENT capability, not exact dedup restated
    assert(fps.head != 0L)
  }

  test("dHash is invariant under integer upscaling (nearest-neighbor sampling)") {
    val Some((w1, h1, g1)) = Multimodal.ImageIoDecoder.decodeGray(
      Multimodal.makePpmGray(7, 10, baseGray))
    val Some((w3, h3, g3)) = Multimodal.ImageIoDecoder.decodeGray(
      encodeImage("png", baseGray, scale = 3)) // 21x30 pixel-tripled
    assert((w3, h3) == (21, 30))
    assert(ImageDedup.dHash60(w1, h1, g1) == ImageDedup.dHash60(w3, h3, g3))
  }

  test("one-pixel perturbation flips at most one gradient bit") {
    val pert = baseGray.clone(); pert(0) = 255 - pert(0)
    val a = ImageDedup.dHash60(7, 10, baseGray)
    val b = ImageDedup.dHash60(7, 10, pert)
    assert(java.lang.Long.bitCount(a ^ b) <= 1)
  }

  test("dHash is invariant under uniform brightness shifts") {
    // gradient SIGNS don't move when every pixel shifts equally (no
    // clipping) — the robustness byte hashes lack
    val dim = baseGray.map(v => math.min(v, 215))
    val brightened = dim.map(_ + 40)
    assert(ImageDedup.dHash60(7, 10, dim) ==
      ImageDedup.dHash60(7, 10, brightened))
  }

  test("dedupedImages keeps one representative per cluster (x63 shape)") {
    val unrelated = grid(i => (i * 101 + 7) % 256)
    val m = media(Seq(
      1L -> Multimodal.makePpmGray(7, 10, baseGray),
      2L -> encodeImage("png", baseGray),      // re-encode of 1 -> drops
      3L -> encodeImage("bmp", baseGray),      // another re-encode -> drops
      4L -> encodeImage("png", unrelated)))    // singleton -> survives
    val out = ImageDedup.dedupedImages(spark, m)
      .collect().map(r => r.getAs[Long]("doc_id")).sorted
    assert(out.toSeq == Seq(1L, 4L))
  }

  test("imageStats: brightness/contrast/aspect from real decoded pixels (x64)") {
    val flat = Array.fill(70)(100)
    val split = Array.tabulate(8)(i => if (i % 2 == 0) 0 else 255) // 4x2
    val m = Seq(
      1L -> Multimodal.makePpmGray(7, 10, flat),
      2L -> encodeImage4x2(split))
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/*"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val out = Multimodal.imageStats(spark, m)
      .collect().map(s => s.doc_id -> s).toMap
    assert(out(1L).brightness == 100.0 && out(1L).contrast == 0.0)
    assert(out(1L).aspect == 0.7)
    assert(out(2L).width == 4 && out(2L).height == 2)
    assert(out(2L).brightness == 127.5 && out(2L).contrast == 127.5)
    assert(out(2L).aspect == 2.0)
  }

  private def encodeImage4x2(gray: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) {
      val v = gray(y * 4 + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("nearDupPairs surfaces a re-encoded image and its original (x59 shape)") {
    val unrelated = grid(i => (i * 101 + 7) % 256)
    val m = media(Seq(
      1L -> Multimodal.makePpmGray(7, 10, baseGray),
      2L -> encodeImage("png", baseGray),     // same picture, other codec
      3L -> encodeImage("png", unrelated)))   // different picture
    val pairs = ImageDedup.nearDupPairs(spark, m)
      .collect().map(r => (r.getAs[Long]("doc1"), r.getAs[Long]("doc2"),
        r.getAs[Long]("hamming")))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("undecodable payloads take the deterministic stub grid (total operator)") {
    val m = media(Seq(
      1L -> "definitely not an image payload".getBytes("UTF-8"),
      2L -> "definitely not an image payload".getBytes("UTF-8"),
      3L -> Array[Byte]()))
    val fps = ImageDedup.dHashes(spark, m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    assert(fps(1L) == fps(2L)) // deterministic
    assert(fps(3L) == 0L)      // empty payload -> flat grid -> no gradients
  }

  test("dHash60 validates raster dimensions") {
    assertThrows[IllegalArgumentException] {
      ImageDedup.dHash60(7, 10, new Array[Int](3))
    }
  }
}
