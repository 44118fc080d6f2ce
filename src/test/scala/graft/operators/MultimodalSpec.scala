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

  test("frameSample picks floor(j*n/k) indices with deterministic handles (x57)") {
    // payload "abcd" -> 4 bytes -> stub n_frames = 4 % 30 + 1 = 5; k = 4
    val docs = Seq((1L, "abcd", "en", 4L)).toDF("doc_id", "text", "lang", "n_chars")
    val out = Multimodal.frameSample(spark,
        Multimodal.asMediaTable(docs), targetFrames = 4)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3)) // floor(j*5/4)
    assert(out.forall(_.n_frames == 5))
    // the handle is exactly md5(md5(payload) + '#' + idx) — one payload
    // digest per row, handles derived from the 32-char hex
    val md = java.security.MessageDigest.getInstance("MD5")
    val phex = md.digest("abcd".getBytes("UTF-8")).map("%02x".format(_)).mkString
    md.reset()
    val expected = md.digest((phex + "#0").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.head.frame_ref == expected)
    // k caps at n: a 1-frame payload yields exactly one sample
    val one = Seq((2L, "", "en", 0L)).toDF("doc_id", "text", "lang", "n_chars")
    assert(Multimodal.frameSample(spark,
      Multimodal.asMediaTable(one), targetFrames = 4).collect().length == 1)
  }

  private def encodeAnimatedGif(nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until nFrames) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((x * 31 + y * 7 + f * 97) % 255) * 0x010101)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("frameSample emits real distinct per-frame pixel handles for animated GIFs") {
    val gif = encodeAnimatedGif(3, 8, 8)
    assert(Multimodal.ImageIoDecoder.decode(gif)._3 == 3) // real frame count
    val media = Seq((1L, gif)).toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/gif"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val out = Multimodal.frameSample(spark, media, targetFrames = 3)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    // each frame digests its OWN raster: three distinct handles...
    assert(out.map(_.frame_ref).distinct.length == 3)
    // ...none of which is the stub (payload-digest) derivation
    val md = java.security.MessageDigest.getInstance("MD5")
    val stubBase = md.digest(gif).map("%02x".format(_)).mkString + "#"
    val stubs = (0 until 3).map { i =>
      md.reset()
      md.digest((stubBase + i).getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out.map(_.frame_ref).toSet.intersect(stubs.toSet).isEmpty)
    // deterministic across runs
    val again = Multimodal.frameSample(spark, media, targetFrames = 3)
      .collect().sortBy(_.frame_idx)
    assert(again.map(_.frame_ref).toSeq == out.map(_.frame_ref).toSeq)
    // content-addressing: the same frames re-encoded (fresh writer run)
    // produce the same handles
    val media2 = Seq((2L, encodeAnimatedGif(3, 8, 8))).toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/gif"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val enc2 = Multimodal.frameSample(spark, media2, targetFrames = 3)
      .collect().sortBy(_.frame_idx)
    assert(enc2.map(_.frame_ref).toSeq == out.map(_.frame_ref).toSeq)
  }

  private def encodeJpegFrame(seed: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 31 + y * 7 + seed * 83) % 255) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  test("MjpegDecoder: real frame count, dims and per-frame raster handles") {
    val frames = (0 until 3).map(encodeJpegFrame(_))
    val stream = frames.reduce(_ ++ _)
    assert(Multimodal.MjpegDecoder.decode(stream) == ((16, 12, 3)))
    val media = Seq((1L, stream)).toDF("doc_id", "payload")
      .withColumn("media_type", lit("video/x-motion-jpeg"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val out = Multimodal.frameSample(spark, media, targetFrames = 3,
        decoder = Multimodal.MjpegDecoder)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(out.map(_.frame_ref).distinct.length == 3) // real raster digests
    // container invariance: inter-frame padding changes every offset but
    // no frame content — handles must not move
    val padded = frames.map(f => f ++ Array.fill(7)(0.toByte)).reduce(_ ++ _)
    val media2 = Seq((2L, padded)).toDF("doc_id", "payload")
      .withColumn("media_type", lit("video/x-motion-jpeg"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val out2 = Multimodal.frameSample(spark, media2, targetFrames = 3,
        decoder = Multimodal.MjpegDecoder)
      .collect().sortBy(_.frame_idx)
    assert(out2.map(_.frame_ref).toSeq == out.map(_.frame_ref).toSeq)
    // a single JPEG is just an image: the image-decoder path applies
    assert(Multimodal.MjpegDecoder.decode(frames.head) == ((16, 12, 1)))
  }

  test("single-frame images keep the stub handle derivation") {
    val png = encodeImage("png", 16, 12)
    val media = Seq((1L, png)).toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/png"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val out = Multimodal.frameSample(spark, media, targetFrames = 4)
      .collect()
    assert(out.length == 1) // k caps at n_frames = 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val base = md.digest(png).map("%02x".format(_)).mkString + "#0"
    md.reset()
    val expected = md.digest(base.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.head.frame_ref == expected)
  }

  test("WavParser round-trips real RIFF/WAVE headers; rejects malformed (x66)") {
    assert(Multimodal.WavParser.parse(Multimodal.makeWav(2, 44100, 16, 1234))
      .contains(Multimodal.AudioMeta(2, 44100, 16, 1234L)))
    assert(Multimodal.WavParser.parse(Multimodal.makeWav(1, 8000, 8, 0))
      .contains(Multimodal.AudioMeta(1, 8000, 8, 0L)))
    // an odd-sized chunk before data exercises the word-alignment walk
    val base = Multimodal.makeWav(1, 8000, 8, 10)
    val withList = base.take(12) ++
      ("LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)) ++
      base.drop(12)
    assert(Multimodal.WavParser.parse(withList)
      .contains(Multimodal.AudioMeta(1, 8000, 8, 10L)))
    // truncated data chunk caps at the bytes present
    assert(Multimodal.WavParser.parse(
        Multimodal.makeWav(1, 8000, 8, 100).dropRight(40))
      .contains(Multimodal.AudioMeta(1, 8000, 8, 60L)))
    // malformed payloads are None, never a throw
    assert(Multimodal.WavParser.parse("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.WavParser.parse(Array[Byte]()).isEmpty)
    // non-PCM (IEEE float format tag) is out of parser scope
    val floatFmt = Multimodal.makeWav(1, 8000, 8, 4)
    floatFmt(20) = 3 // audioFormat = 3
    assert(Multimodal.WavParser.parse(floatFmt).isEmpty)
  }

  test("audioStats parses real WAV bytes end-to-end; stub leg for non-audio (x66)") {
    val media = Seq(
      (1L, Multimodal.makeWav(2, 16000, 16, 16000)),
      (2L, "definitely not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("audio/wav"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val out = Multimodal.audioStats(spark, media)
      .collect().map(s => s.doc_id -> s).toMap
    assert(out(1L).channels == 2 && out(1L).sample_rate == 16000)
    assert(out(1L).n_samples == 16000L && out(1L).duration_ms == 1000L)
    assert(out(2L).sample_rate == 8000 && out(2L).n_samples == 20L)
  }

  test("audioFingerprints hash the samples, not the container (x67)") {
    val smp = "deterministic sample payload bytes".getBytes("US-ASCII")
    val other = "different audio content entirely!!".getBytes("US-ASCII")
    val media = Seq(
      (1L, Multimodal.makeWavWithSamples(1, 8000, 8, smp)),
      // same samples, different container: stereo 16 kHz + LIST chunk
      (2L, Multimodal.makeWavWithSamples(2, 16000, 8, smp,
        withListChunk = true)),
      (3L, Multimodal.makeWavWithSamples(1, 8000, 8, other)),
      (4L, "not audio".getBytes("UTF-8"))) // degrades to payload md5
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("audio/wav"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val fps = Multimodal.audioFingerprints(spark, media)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("audio_hash")).toMap
    assert(fps(1L) == fps(2L)) // re-encode invariance
    assert(fps(1L) != fps(3L))
    // the byte-level payloads of 1 and 2 share no container bytes, so a
    // byte hash could never group them — the content-address property
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(smp).map("%02x".format(_)).mkString
    assert(fps(1L) == expected) // hash of exactly the sample bytes
    md.reset()
    assert(fps(4L) == md.digest("not audio".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("resizePlan fits the box, preserves aspect, never upscales (x58)") {
    val feats = Seq(
      (1L, 100, 100),  // fits -> unchanged
      (2L, 640, 240),  // width-bound -> 320 x 120
      (3L, 320, 480),  // height-bound -> 160 x 240
      (4L, 6400, 2),   // extreme aspect -> height floors at 1
      (5L, 320, 240)   // exactly the box -> unchanged
    ).toDF("doc_id", "width", "height")
    val out = Multimodal.resizePlan(feats, 320, 240)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("out_w"), r.getAs[Long]("out_h")))).toMap
    assert(out(1L) == ((100L, 100L)))
    assert(out(2L) == ((320L, 120L)))
    assert(out(3L) == ((160L, 240L)))
    assert(out(4L) == ((320L, 1L)))
    assert(out(5L) == ((320L, 240L)))
  }
}
