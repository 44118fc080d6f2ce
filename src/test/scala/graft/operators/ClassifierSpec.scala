package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the the the"),
    (3L, "zzz")
  ).toDF("doc_id", "text")

  /** Independent re-derivation of the surrogate weight (MessageDigest,
    * not Catalyst) — pins the md5-prefix rule the oracle relies on. */
  private def refWeight(token: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(token.getBytes(StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 21 - 10
  }

  private def refScore(text: String): Double = {
    val toks = text.trim.toLowerCase.split("\\s+")
    val s = toks.map(refWeight).sum.toDouble / toks.length
    math.floor(s * 10000 + 0.5) / 10000
  }

  test("score matches the independent md5-weight re-derivation") {
    val out = Classifier.score(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("score"))).toMap
    assert(out(1L) == (4L, refScore("the quick brown fox")))
    assert(out(2L) == (3L, refScore("the the the")))
    assert(out(3L) == (1L, refScore("zzz")))
    // a single-token doc's score IS its token weight (mean of one)
    assert(out(3L)._2 == refWeight("zzz").toDouble)
  }

  test("gate reports every doc; keep filters to exactly the kept set") {
    val thr = refScore("the quick brown fox") // doc 1 sits ON the threshold
    val gated = Classifier.gate(docs, "doc_id", "text", thr)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Int]("kept")).toMap
    assert(gated.size == 3)
    assert(gated(1L) == 1) // >= is inclusive
    val kept = Classifier.keep(docs, "text", thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == gated.filter(_._2 == 1).keySet)
    // input schema preserved by the filtering form
    assert(Classifier.keep(docs, "text", thr).schema == docs.schema)
    // NULL text: kept is 0 (never NULL) and keep() drops the row — the
    // gate and the filter agree on its fate
    val withNull = docs.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val g9 = Classifier.gate(withNull, "doc_id", "text", -100.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("kept"))
      .toMap
    assert(g9(9L) == 0)
    assert(!Classifier.keep(withNull, "text", -100.0)
      .collect().map(_.getAs[Long]("doc_id")).contains(9L))
  }

  test("the weight seam accepts an injected (learned) weight table") {
    // "model": weight = token length => score = mean token length
    val out = Classifier.score(docs, "doc_id", "text",
        weight = t => length(t).cast("long"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("score")).toMap
    assert(out(1L) == (3 + 5 + 5 + 3).toDouble / 4)
    assert(out(2L) == 3.0)
  }

  test("scoreWithTable ≡ score when the table covers the vocabulary " +
      "(the large-model join path)") {
    import org.apache.spark.sql.functions.{col => c, explode}
    // weight table = the corpus's own vocabulary with the surrogate
    // weights, computed through the SAME Catalyst expression
    val vocab = docs
      .select(explode(graft.functions.Text.tokens(c("text"))).as("term"))
      .distinct()
      .withColumn("weight", Classifier.hashedWeight(c("term")))
    val viaTable = Classifier
      .scoreWithTable(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("score")))).toMap
    val viaColumn = Classifier.score(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("score")))).toMap
    assert(viaTable == viaColumn) // bit-identical, not approximately
    // out-of-vocabulary tokens take the default weight
    val partial = vocab.filter(c("term") =!= "the")
    val oov = Classifier
      .scoreWithTable(docs, "doc_id", "text", partial, defaultWeight = 0L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("score")).toMap
    // doc 2 is "the the the": all tokens OOV => mean of defaults = 0
    assert(oov(2L) == 0.0)
  }

  test("scoreWithTable is immune to duplicate weight-table rows") {
    import org.apache.spark.sql.functions.{col => c, explode}
    val vocab = docs
      .select(explode(graft.functions.Text.tokens(c("text"))).as("term"))
      .distinct()
      .withColumn("weight", Classifier.hashedWeight(c("term")))
    // duplicate every row: without the per-term pre-aggregate this
    // would double each (doc_id, token) pair through the join,
    // inflating n_tokens and corrupting score for every document
    val duped = vocab.unionByName(vocab)
    val clean = Classifier.scoreWithTable(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("score")))).toMap
    val viaDuped = Classifier.scoreWithTable(docs, "doc_id", "text", duped)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("score")))).toMap
    assert(viaDuped == clean)
  }
}
