package graft.operators

import graft.SparkSpec

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  // 2-token passages: "a b" occurs in docs 1, 2, 4 and 5 (normalized);
  // every other passage is unique to its document.
  private lazy val docs = Seq(
    (1L, "a b c d e f"),
    (2L, "a b x y"),
    (3L, "p q r"),
    (4L, "A B"), // boilerplate-only after normalization
    (5L, "a b")
  ).toDF("doc_id", "text")

  private lazy val out = Cleaning
    .stripBoilerplate(docs, "doc_id", "text", passageTokens = 2, maxDf = 1)
    .collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_dropped")))).toMap

  test("stripBoilerplate drops cross-document passages, keeps order") {
    assert(out(1L) == (("c d e f", 2L, 1L)))
    assert(out(2L) == (("x y", 1L, 1L)))
  }

  test("stripBoilerplate leaves unique documents untouched") {
    // odd token count: trailing short passage "r" survives too
    assert(out(3L) == (("p q r", 2L, 0L)))
  }

  test("stripBoilerplate keeps fully-boilerplate documents as empty rows") {
    assert(out(4L) == (("", 0L, 1L)))
    assert(out(5L) == (("", 0L, 1L)))
    assert(out.size == 5)
  }

  test("stripBoilerplate maxDf raises the document-frequency bar") {
    // df("a b") = 4 <= maxDf 4 ⇒ nothing is boilerplate
    val loose = Cleaning
      .stripBoilerplate(docs, "doc_id", "text", passageTokens = 2, maxDf = 4)
      .collect()
    assert(loose.forall(_.getAs[Long]("n_dropped") == 0L))
  }

  test("stripBoilerplate validates parameters") {
    assertThrows[IllegalArgumentException] {
      Cleaning.stripBoilerplate(docs, "doc_id", "text", passageTokens = 0)
    }
    assertThrows[IllegalArgumentException] {
      Cleaning.stripBoilerplate(docs, "doc_id", "text", maxDf = 0)
    }
  }

  test("boilerplateSketch from a prebuilt hash frame matches the direct build") {
    val direct = Cleaning.boilerplateSketch(docs, "doc_id", "text",
      passageTokens = 2, maxDf = 1)
    val hashes = Cleaning.boilerplateHashes(docs, "doc_id", "text",
      passageTokens = 2, maxDf = 1)
    assert(hashes.collect().length == 1) // exactly the "a b" passage
    // the overload consumes the persisted artifact (parquet round-trip —
    // the build-once/reuse-bytes contract) and yields identical bytes
    val dir = java.nio.file.Files.createTempDirectory("bhash").toString
    hashes.write.mode("overwrite").parquet(dir)
    val fromArtifact = Cleaning.boilerplateSketch(spark.read.parquet(dir))
    assert(direct != null && java.util.Arrays.equals(direct, fromArtifact))
    // and an empty artifact frame serializes to the null pass-through
    assert(Cleaning.boilerplateSketch(hashes.limit(0)) == null)
  }
}
