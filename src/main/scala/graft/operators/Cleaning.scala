package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.TextExpressions

import graft.functions.{Par, Text}

/** Corpus cleaning for training-data preparation: passage-level
  * boilerplate removal (the RefinedWeb / C4 "line dedup" stage, adapted
  * to whitespace-token passages since the fixture corpus is single-line
  * text).
  *
  * A document is split into non-overlapping `passageTokens`-token
  * passages; any passage whose exact normalized text occurs in more than
  * `maxDf` DISTINCT documents is boilerplate (navigation chrome, license
  * headers, templated spam) and is removed from EVERY document containing
  * it; the survivors are re-joined in original order.
  */
object Cleaning {

  /** Strip cross-document boilerplate passages and reassemble each
    * document. Output: one row per input document —
    * `(doc_id, clean_text, n_kept, n_dropped)` — including documents
    * whose every passage was boilerplate (`clean_text = ''`).
    *
    * Plan shape / 100 TB design:
    *  - passage split is the per-row [[TextExpressions.chunkTokens]]
    *    kernel (stride = size ⇒ non-overlapping) — a narrow explode, no
    *    shuffle;
    *  - the document-frequency count groups on `md5(passage)` so only
    *    32-byte digests shuffle, never passage text. Both this operator
    *    and its oracle key on the digest, so the (negligible,
    *    deterministic) collision behavior is identical by construction;
    *  - the boilerplate set is removed with a LEFT ANTI join on the
    *    digest — no assumption that it fits in a broadcast (on a spammy
    *    corpus it can be huge); a hot boilerplate digest makes a hot
    *    anti-join key, which AQE skew-splits safely (anti join, no
    *    result blowup);
    *  - reassembly groups by doc id — `collect_list` buffers one
    *    document's passages in one task, the same memory class as the
    *    document itself, so it scales wherever the corpus does.
    *
    * Determinism requirement: `docs` must be deterministic across scans
    * (it is scanned for passages and again for per-document totals) —
    * same contract as [[Packing.concatOffsets]].
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       passageTokens: Int = 8, maxDf: Int = 1): DataFrame = {
    require(passageTokens >= 1,
      s"passageTokens must be >= 1, got $passageTokens")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val spread = Par.spread(docs)
    val passages = spread
      .select(col(idCol).as("doc_id"),
        posexplode(TextExpressions.chunkTokens(
          col(textCol), passageTokens, passageTokens))
          .as(Seq("_cid", "_p")))
      .withColumn("_h", md5(col("_p")))
    // digest -> distinct-document frequency; > maxDf ⇒ boilerplate.
    val boiler = passages.groupBy(col("_h"))
      .agg(countDistinct(col("doc_id")).as("_df"))
      .filter(col("_df") > lit(maxDf))
      .select(col("_h"))
    val rebuilt = passages.join(boiler, Seq("_h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("_n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("_cid"), col("_p")))),
            x => x.getField("_p")), " ").as("_clean"))
    val totals = Par.spread(docs).select(col(idCol).as("doc_id"),
      size(TextExpressions.chunkTokens(
        col(textCol), passageTokens, passageTokens)).cast("long")
        .as("_n_total"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_clean"), lit("")).as("clean_text"),
        coalesce(col("_n_kept"), lit(0L)).as("n_kept"),
        (col("_n_total") - coalesce(col("_n_kept"), lit(0L)))
          .as("n_dropped"))
  }

  /** PII redaction patterns — emails, `555-123-4567`-style phone
    * numbers (3-3-4 digit groups with `-`/`.`/space separators, optional
    * `+CC` prefix), dotted-quad IPv4. Portable by construction: plain
    * character classes and bounded quantifiers only, which behave
    * identically under Java regex (Spark codegen) and RE2 (DuckDB /
    * Trino-style engines) — no lookarounds, no word boundaries, no
    * engine-specific escapes, so the oracle runs the same pattern text
    * verbatim. Phone requires explicit separators (a bare 10-digit run
    * is NOT matched — too collision-prone with ids/quantities, and a
    * dotted-quad's 1-3-digit groups can never satisfy the 3-3-4 shape,
    * so the passes are order-independent against each other; emails are
    * redacted FIRST so digits inside a local-part never feed the phone
    * pass). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII REDACTION — the standard cleaning stage of production corpus
    * pipelines: replace emails / phone numbers / IPv4 addresses with
    * `<EMAIL>` / `<PHONE>` / `<IP>` placeholder tokens, counting each
    * category. Schema-preserving like [[TextAnalysis.hashSplit]]: the
    * text column is rewritten in place and `n_pii_emails` /
    * `n_pii_phones` / `n_pii_ips` are appended, so it composes into
    * [[CorpusPipeline.curate]] as a free projection.
    *
    * A pure per-row projection — three codegen'd regexp passes, zero
    * shuffles, embarrassingly scan-parallel at 100 TB. Each category is
    * counted on its INPUT text then replaced before the next pass
    * (sequential semantics, mirrored verbatim in the oracle), and the
    * placeholders contain no digits or `@`, so the operator is
    * idempotent: a second pass counts zero and changes nothing. */
  def redactPii(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_pii_emails",
        size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
          .cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), EmailPattern, "<EMAIL>"))
      .withColumn("n_pii_phones",
        size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0)))
          .cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), PhonePattern, "<PHONE>"))
      .withColumn("n_pii_ips",
        size(regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(0)))
          .cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), Ipv4Pattern, "<IP>"))

  /** Per-source PII INCIDENCE audit (x118) — the data-card row behind
    * [[redactPii]]: before a release decides to scrub, the steward
    * asks WHERE the PII lives — which crawl sources carry it and how
    * dense it is. Per source: document count, documents carrying any
    * PII, total email/phone/IPv4 match counts (x60's exact patterns
    * under x60's sequential-pass semantics, so the audit's counts are
    * exactly what the redaction pass would replace), and the
    * PII-document rate. Read next to x108/x115: those price dedup per
    * source, this prices the cleaning stage.
    *
    * Scale shape: the same pure per-row projection as x60 (three
    * codegen'd regexp passes, zero shuffles) followed by a
    * #sources-row rollup — nothing corpus-shaped ever moves; text is
    * counted scan-side and only per-row counts reach the exchange. */
  def piiRate(docs: DataFrame, textCol: String,
              sourceCol: String): DataFrame = {
    val nEmails =
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .cast("long")
    // mirror redactPii's pass order: phones count on the email-redacted
    // text, IPs on the phone-redacted text
    val afterEmail = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    val nPhones =
      size(regexp_extract_all(afterEmail, lit(PhonePattern), lit(0)))
        .cast("long")
    val afterPhone = regexp_replace(afterEmail, PhonePattern, "<PHONE>")
    val nIps =
      size(regexp_extract_all(afterPhone, lit(Ipv4Pattern), lit(0)))
        .cast("long")
    Par.spread(docs)
      .select(col(sourceCol).as("source"), nEmails.as("_e"),
        nPhones.as("_p"), nIps.as("_i"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(((col("_e") + col("_p") + col("_i")) > 0).cast("long"))
          .as("docs_with_pii"),
        sum(col("_e")).as("n_emails"),
        sum(col("_p")).as("n_phones"),
        sum(col("_i")).as("n_ips"))
      .withColumn("pii_doc_rate",
        graft.functions.Num.fpRound(
          col("docs_with_pii").cast("double") / col("n_docs").cast("double"),
          4))
  }

  /** Unicode CANONICALIZATION (x105) — NFC normalization + C0-control
    * strip (newline/tab/CR kept), the pass a crawl corpus needs BEFORE
    * any hash-based stage: a decomposed "é" (e + U+0301) and its
    * composed form are different bytes — they defeat exact dedup (x1),
    * split vocabularies (x33), and double-count shingles (x2/x8) while
    * rendering identically. Returns `(doc_id, clean_text, changed)`.
    *
    * A single codegen'd per-row kernel ([[TextExpressions.nfcClean]] —
    * `java.text.Normalizer` NFC, mirroring DuckDB's `nfc_normalize`;
    * both implement UAX #15), zero shuffles, idempotent (NFC is a
    * normal form; the control class contains no NFC output). */
  def nfcClean(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.spread(docs).select(col(idCol).as("doc_id"),
        TextExpressions.nfcClean(col(textCol)).as("clean_text"),
        col(textCol).as("_orig"))
      .withColumn("changed",
        // null-safe: the kernel is null-intolerant (NULL text -> NULL
        // clean_text), and NULL <> NULL is NULL — but the oracle's CASE
        // WHEN ... THEN 1 ELSE 0 lands in the ELSE branch, so a NULL
        // row must report changed = 0, not NULL
        coalesce((col("clean_text") =!= col("_orig")).cast("int"), lit(0)))
      .drop("_orig")

  /** The serialized Bloom sketch of the corpus's boilerplate passage
    * hashes (xxhash64 of each passage whose distinct-document frequency
    * exceeds `maxDf`) — the shareable artifact behind the streaming
    * [[graft.streaming.Streams.boilerplateScrub]]: build once per corpus
    * snapshot batch-side, then scrub arriving documents statelessly.
    * Driver-held but boilerplate-set-bounded (the sketch is MB-scale
    * regardless of corpus size — same contract as
    * [[TextAnalysis.benchmarkSketch]]). Returns null when the corpus has
    * no boilerplate at the given bar (the scrub treats null as
    * pass-through). */
  def boilerplateSketch(docs: DataFrame, idCol: String, textCol: String,
                        passageTokens: Int = 8, maxDf: Int = 1): Array[Byte] =
    boilerplateSketch(
      boilerplateHashes(docs, idCol, textCol, passageTokens, maxDf))

  /** The corpus's boilerplate passage-hash frame — one `_h` (xxhash64 of
    * the passage text) row per passage whose distinct-document frequency
    * exceeds `maxDf`. This is the PERSISTABLE per-corpus-snapshot
    * artifact (boilerplate-set-sized, tiny next to the corpus): a
    * production pipeline writes it once per snapshot, then derives the
    * streaming sketch from it via the [[boilerplateSketch]] overload
    * below instead of re-aggregating the corpus on every sketch (re)build
    * — the same build-once/reuse contract as
    * [[TextAnalysis.benchmarkSketch]] / decontaminateBloom's prebuilt
    * form. */
  def boilerplateHashes(docs: DataFrame, idCol: String, textCol: String,
                        passageTokens: Int = 8, maxDf: Int = 1): DataFrame = {
    require(passageTokens >= 1,
      s"passageTokens must be >= 1, got $passageTokens")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    Par.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(TextExpressions.chunkTokens(
          col(textCol), passageTokens, passageTokens)).as("_p"))
      .select(col("doc_id"), xxhash64(col("_p")).as("_h"))
      .groupBy(col("_h"))
      .agg(countDistinct(col("doc_id")).as("_df"))
      .filter(col("_df") > lit(maxDf))
      .select(col("_h"))
  }

  /** Serialize a PREBUILT [[boilerplateHashes]] frame (or a re-read of
    * its persisted parquet) into the Bloom sketch the streaming scrub
    * consumes — no corpus scan, just an aggregate over the small hash
    * frame. Null when the frame is empty (scrub treats null as
    * pass-through). */
  def boilerplateSketch(boilerHashes: DataFrame): Array[Byte] = {
    val boiler = boilerHashes.select(col("_h")).cache()
    try {
      val n = boiler.count()
      // floor the size estimate: BloomFilterAggregate sizes bits for ~3%
      // fp at the ESTIMATE, so a handful of boilerplate items would get a
      // handful of bits and scrub ~3% of clean passages; 4096 costs ~4 KB
      // and makes the small-set fp rate effectively zero
      if (n == 0L) null
      else boiler.agg(TextExpressions.bloomAgg(col("_h"),
          math.max(n, 4096L)).as("bf"))
        .head().getAs[Array[Byte]](0)
    } finally boiler.unpersist()
  }

  /** Run-collapse DE-REPETITION (x78) — the removal counterpart of
    * x35's repetition SIGNALS (the Gopher-rule family measures; this
    * cleans): any run of the same token longer than `maxRun` is
    * truncated to its first `maxRun` occurrences, and the document is
    * reassembled in order. Output is schema-like [[stripBoilerplate]]:
    * `(doc_id, clean_text, n_tokens, n_removed)`.
    *
    * Pure per-row projection: the keep-decision for position p only
    * looks at the `maxRun` tokens before p, so the whole operator is
    * one codegen'd array `filter` with an index lambda — zero shuffles,
    * scan-parallel at any scale. Deterministic and idempotent (a
    * collapsed document contains no run longer than `maxRun`, so a
    * second pass removes nothing). */
  def collapseRuns(docs: DataFrame, idCol: String, textCol: String,
                   maxRun: Int = 1): DataFrame = {
    require(maxRun >= 1 && maxRun <= 100,
      s"maxRun must be in [1,100], got $maxRun")
    val toks = Text.tokens(col(textCol))
    // keep position i (0-based) unless the maxRun tokens before it all
    // equal it; greatest() keeps the probe index >= 1 because Spark's
    // boolean operators do not short-circuit element_at's ANSI bounds
    // check on the i < maxRun rows
    val kept = filter(toks, (t, i) => {
      val allPrevSame = (1 to maxRun)
        .map(j => element_at(toks,
          greatest(i + lit(1 - j), lit(1))) === t)
        .reduce(_ && _)
      (i < maxRun) || !allPrevSame
    })
    Par.spread(docs).select(
      col(idCol).as("doc_id"),
      array_join(kept, " ").as("clean_text"),
      size(toks).cast("long").as("n_tokens"),
      (size(toks) - size(kept)).cast("long").as("n_removed"))
  }
}
