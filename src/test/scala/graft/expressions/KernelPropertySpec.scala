package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextExpressions
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property invariants of the per-row text kernels over generated text —
  * structural laws the parity specs (which pin bit-equality on fixture
  * data) don't state directly. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] = {
    val out = (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(30), Seed(271L + i)))
    assert(out.nonEmpty, "generator produced no cases — vacuous test")
    out
  }

  // texts over a tiny vocabulary with odd spacing, so duplicates/overlaps
  // actually occur; always at least one token
  private val genText: Gen[String] = for {
    words <- Gen.nonEmptyListOf(Gen.oneOf("ab", "cd", "ef", "gh", "IJ", "k"))
    sep <- Gen.oneOf(" ", "  ", "\t")
  } yield words.mkString(sep)

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("chunkTokens covers every token exactly; overlap = size - stride") {
    val texts = samples(genText, 8)
    val size = 4; val stride = 3
    val rows = docsOf(texts)
      .select(col("doc_id"),
        posexplode(TextExpressions.chunkTokens(col("text"), size, stride))
          .as(Seq("idx", "chunk")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      val chunks = rows.filter(_._1 == i.toLong).sortBy(_._2).map(_._3)
      // chunk j must be EXACTLY tokens[j*stride, j*stride+size) (clamped)
      chunks.zipWithIndex.foreach { case (c, j) =>
        val expect = toks.slice(j * stride,
          math.min(j * stride + size, toks.length)).mkString(" ")
        assert(c == expect, s"chunk $j of '$t': got '$c' want '$expect'")
      }
      // and the chunk count is the closed-form window count
      val expectN = if (toks.length <= size) 1
        else (toks.length - size + stride - 1) / stride + 1
      assert(chunks.length == expectN)
    }
  }

  test("termCounts: counts sum to token count; terms are distinct") {
    val texts = samples(genText, 8)
    val rows = docsOf(texts)
      .select(col("doc_id"),
        explode(TextExpressions.termCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      val mine = rows.filter(_._1 == i.toLong)
      assert(mine.map(_._3).sum == toks.length)
      assert(mine.map(_._2).distinct.length == mine.length)
      assert(mine.map(_._2).toSet == toks.toSet)
    }
  }

  test("shingleHashSet size law: |set| <= max(0, n_tokens - k + 1)") {
    val texts = samples(genText, 8)
    val k = 3
    val rows = docsOf(texts)
      .select(col("doc_id"),
        size(TextExpressions.shingleHashSet(col("text"), k)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    texts.zipWithIndex.foreach { case (t, i) =>
      val n = t.trim.toLowerCase.split("\\s+").length
      val expectMax = math.max(0, n - k + 1)
      val got = rows.find(_._1 == i.toLong).get._2
      assert(got <= expectMax && (expectMax == 0 || got >= 1))
    }
  }

  test("repetitionStats laws: totals match closed forms; bounds hold") {
    val texts = samples(genText, 10)
    val rows = docsOf(texts)
      .select(col("doc_id"),
        TextExpressions.repetitionStats(col("text")).as("st"))
      .select(col("doc_id"), element_at(col("st"), 1).as("nb"),
        element_at(col("st"), 2).as("tb"), element_at(col("st"), 3).as("nt"),
        element_at(col("st"), 4).as("dt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    texts.zipWithIndex.foreach { case (t, i) =>
      val n = t.trim.toLowerCase.split("\\s+").length
      val (_, nb, tb, nt, dt) = rows.find(_._1 == i.toLong).get
      assert(nb == math.max(n - 1, 0)) // total bigrams is exact
      assert(nt == math.max(n - 2, 0))
      assert(tb <= nb && (nb == 0 || tb >= 1)) // max count within totals
      assert(dt <= nt && dt != 1) // dup occurrences can't be exactly 1
    }
  }

  test("simhashMd5 fits in 60 bits; normalization-identical texts collide") {
    val texts = samples(genText, 10)
    val fps = docsOf(texts)
      .select(col("doc_id"), TextExpressions.simhashMd5(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.values.forall(fp => fp >= 0L && fp < (1L << 60)))
    texts.zipWithIndex.foreach { case (t, i) =>
      // re-spacing/casing the same tokens never changes the fingerprint
      val mangled = t.trim.toLowerCase.split("\\s+").mkString("\t ")
        .toUpperCase
      val fp2 = docsOf(Seq(mangled))
        .select(TextExpressions.simhashMd5(col("text")))
        .head().getLong(0)
      assert(fp2 == fps(i.toLong), s"'$t' vs '$mangled'")
    }
  }

  test("simhash64 is permutation-sensitive but duplication-stable in sign") {
    // identical texts (any spacing/case) get identical fingerprints
    val df = Seq((1L, "Alpha Beta  Gamma"), (2L, "alpha beta\tgamma"))
      .toDF("doc_id", "text")
      .select(TextExpressions.simhash64(col("text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
  }
}
