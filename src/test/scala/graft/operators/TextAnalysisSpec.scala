package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat and the dog is in the house", "en"),
    (2L, "der hund und die katze ist ein tier und das haus", "de"),
    (3L, "xyzzy qwerty zzz", "en")
  ).toDF("doc_id", "text", "lang")

  test("langId votes by stopword dictionary; no hits -> und (x11)") {
    val out = TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("predicted_lang")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("qualityScore components are bounded and deterministic (x12)") {
    val r = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .filter("doc_id = 1").head()
    assert(r.getAs[Double]("punct_ratio") == 0.0)
    assert(r.getAs[Double]("stopword_ratio") > 0.3) // 'the' x4, 'and', 'is', 'in', 'on'...
    val score = r.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
  }

  test("tokenCounts: ws vs BPE-ish tokens (x13)") {
    val r = TextAnalysis.tokenCounts(
      Seq((1L, "hello, world! it's 42")).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(r.getAs[Int]("ws_tokens") == 4)
    // hello , world ! it ' s 42  -> 8
    assert(r.getAs[Int]("bpe_tokens") == 8)
  }

  test("statsByLang aggregates per language (X4)") {
    val withChars = docs.selectExpr("doc_id", "text", "lang",
      "length(text) as n_chars")
    val out = TextAnalysis.statsByLang(withChars, "text")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map("en" -> 2L, "de" -> 1L))
  }
}
