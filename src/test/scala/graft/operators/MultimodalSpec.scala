package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table wraps text as binary payload with typed metadata") {
    val docs = Seq((1L, "hello world", "en", 11L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val media = Multimodal.asMediaTable(docs)
    val r = media.head()
    assert(r.getAs[Array[Byte]]("payload").length == 11)
    assert(r.getAs[String]("media_type") == "text/plain")
    assert(r.getStruct(r.fieldIndex("meta")).getAs[String]("lang") == "en")
  }

  test("partition-batched extraction with the stub decoder (x15 shape)") {
    val docs = Seq((1L, "abcd", "en", 4L), (2L, "x" * 100, "de", 100L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(docs)).collect()
    val f1 = feats.find(_.doc_id == 1L).get
    assert(f1.n_bytes == 4L && f1.width == 5 && f1.height == 5 && f1.n_frames == 5)
    // crc is a real checksum of the payload, stable across runs
    val again = Multimodal.extractFeatures(spark,
      Multimodal.asMediaTable(docs)).collect().find(_.doc_id == 1L).get
    assert(f1.checksum == again.checksum && f1.checksum != 0L)
  }

  private def encodeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("ImageIoDecoder reads real PNG/JPEG/BMP/GIF bytes via javax.imageio") {
    for (fmt <- Seq("png", "jpg", "bmp", "gif")) {
      val (w, h) = (37, 23)
      val (dw, dh, df) = Multimodal.ImageIoDecoder.decode(encodeImage(fmt, w, h))
      assert((dw, dh) == (w, h), s"$fmt dims: got ${(dw, dh)}")
      assert(df == 1, s"$fmt frames")
    }
  }

  test("ImageIoDecoder runs through the full extraction plumbing") {
    val rows = Seq(
      (1L, encodeImage("png", 64, 48)),
      (2L, Multimodal.makePpm(32, 16)),          // falls through to PPM leg
      (3L, "not an image".getBytes("UTF-8")))     // falls through to stub leg
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/*"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val byId = Multimodal.extractFeatures(spark, rows) // default decoder
      .collect().map(f => f.doc_id -> f).toMap
    assert(byId(1L).width == 64 && byId(1L).height == 48)
    assert(byId(2L).width == 32 && byId(2L).height == 16)
    assert(byId(3L).width == 12 % 640 + 1) // stub math, poison-row-safe
  }

  test("PpmDecoder parses real P6 image bytes end-to-end") {
    val rows = Seq(
      (1L, Multimodal.makePpm(640, 480)),
      (2L, Multimodal.makePpm(32, 16)),
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/x-portable-pixmap"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val feats = Multimodal.extractFeatures(spark, rows,
      decoder = Multimodal.PpmDecoder).collect()
    val byId = feats.map(f => f.doc_id -> f).toMap
    assert(byId(1L).width == 640 && byId(1L).height == 480)
    assert(byId(2L).width == 32 && byId(2L).height == 16)
    assert(byId(3L).width == 12 % 640 + 1) // non-image falls back to stub
  }
}
