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
