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

  test("redactPii replaces emails, phones, IPs with counts (x60)") {
    val rows = Seq(
      (1L, "write to alice.smith+work@corp.example.org today"),
      (2L, "call 555-123-4567 or +1 555.987.6543 at 192.168.0.1"),
      (3L, "server 10.0.3.17 and 172.16.254.1 are down"),
      (4L, "no pii in this perfectly ordinary sentence"),
      (5L, "bob@ex.io wrote from 8.8.8.8 dial 800 555 1234")
    ).toDF("doc_id", "text")
    val out = Cleaning.redactPii(rows, "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_pii_emails"),
          r.getAs[Long]("n_pii_phones"), r.getAs[Long]("n_pii_ips")))).toMap
    assert(out(1L) == (("write to <EMAIL> today", 1L, 0L, 0L)))
    assert(out(2L) == (("call <PHONE> or +1 <PHONE> at <IP>", 0L, 2L, 1L)))
    assert(out(3L) == (("server <IP> and <IP> are down", 0L, 0L, 2L)))
    assert(out(4L) == (("no pii in this perfectly ordinary sentence",
      0L, 0L, 0L)))
    assert(out(5L) == (("<EMAIL> wrote from <IP> dial <PHONE>", 1L, 1L, 1L)))
  }

  test("redactPii is idempotent and sequences email before phone") {
    // the email's local part is all digits — without the email-first
    // order the phone pass would eat it
    val rows = Seq((1L, "mail 555.123.4567x@ex.org then 555.123.4567"))
      .toDF("doc_id", "text")
    val once = Cleaning.redactPii(rows, "text")
    val r1 = once.collect().head
    assert(r1.getAs[String]("text") == "mail <EMAIL> then <PHONE>")
    assert(r1.getAs[Long]("n_pii_emails") == 1L &&
      r1.getAs[Long]("n_pii_phones") == 1L)
    // second pass: nothing left to redact, text unchanged
    val twice = Cleaning.redactPii(
      once.select("doc_id", "text"), "text").collect().head
    assert(twice.getAs[String]("text") == r1.getAs[String]("text"))
    assert(twice.getAs[Long]("n_pii_emails") == 0L &&
      twice.getAs[Long]("n_pii_phones") == 0L &&
      twice.getAs[Long]("n_pii_ips") == 0L)
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

  test("collapseRuns truncates runs to maxRun and is idempotent (x78)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam end"),
      (2L, "a b a b"),            // alternation is not a run
      (3L, "x X x stop"),         // case-normalized => a 3-run of "x"
      (4L, "solo")
    ).toDF("doc_id", "text")
    val out = Cleaning.collapseRuns(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    assert(out(1L) == (("spam end", 3L)))
    assert(out(2L) == (("a b a b", 0L)))
    assert(out(3L) == (("x stop", 2L)))
    assert(out(4L) == (("solo", 0L)))
    // maxRun = 2 keeps doubled tokens, truncates beyond
    val two = Cleaning.collapseRuns(docs, "doc_id", "text", maxRun = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    assert(two(1L) == "spam spam end")
    assert(two(3L) == "x x stop")
    // idempotence: collapsing the cleaned text removes nothing
    val again = Cleaning.collapseRuns(
        Cleaning.collapseRuns(docs, "doc_id", "text")
          .selectExpr("doc_id", "clean_text AS text"),
        "doc_id", "text")
      .collect()
    assert(again.forall(_.getAs[Long]("n_removed") == 0L))
    intercept[IllegalArgumentException] {
      Cleaning.collapseRuns(docs, "doc_id", "text", maxRun = 0)
    }
  }

  test("nfcClean composes decomposed sequences, strips C0 controls, " +
      "keeps \\n/\\t, and is idempotent (x105)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "café time"),         // e + combining acute -> é
      (2L, "a\u0007b\u0000c"),         // BEL + NUL stripped
      (3L, "line1\nline2\tend\r"),     // structural whitespace kept
      (4L, "café already")        // composed already: unchanged
    ).toDF("doc_id", "text")
    val out = Cleaning.nfcClean(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Int]("changed")))).toMap
    assert(out(1L) == (("café time", 1)))
    assert(out(2L) == (("abc", 1)))
    assert(out(3L) == (("line1\nline2\tend\r", 0)))
    assert(out(4L) == (("café already", 0)))
    // idempotent: a second pass changes nothing
    val again = Cleaning.nfcClean(
        Cleaning.nfcClean(docs, "doc_id", "text")
          .selectExpr("doc_id", "clean_text AS text"),
        "doc_id", "text").collect()
    assert(again.forall(_.getAs[Int]("changed") == 0))
  }

  test("nfcClean on NULL text: clean_text NULL, changed 0 (the oracle's " +
      "ELSE branch, not NULL)") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, "plain")).toDF("doc_id", "text")
    val out = Cleaning.nfcClean(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[String]("clean_text")), r.getAs[Int]("changed"))))
      .toMap
    assert(out(1L) === ((None, 0)))
    assert(out(2L) === ((Some("plain"), 0)))
  }

  test("piiRate (x118): per-source counts under x60's pass order; " +
      "docs_with_pii counts documents, not matches") {
    val corpus = Seq(
      (1L, "contact a@b.com and c@d.org please", "web"),   // 2 emails
      (2L, "call 555-123-4567 today", "web"),              // 1 phone
      (3L, "perfectly clean text", "forum"),               // nothing
      (4L, "from 10.0.0.1 then 1.2.3.4", "forum")          // 2 IPs
    ).toDF("doc_id", "text", "source")
    val out = Cleaning.piiRate(corpus, "text", "source")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("docs_with_pii"),
          r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getAs[Double]("pii_doc_rate"))))
      .toMap
    assert(out("web") === ((2L, 2L, 2L, 1L, 0L, 1.0)))
    assert(out("forum") === ((2L, 1L, 0L, 0L, 2L, 0.5)))
  }
}
