package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Num, Par, Text}

/** Model-based quality classification for training-data curation — the
  * "fastText-style quality classifier" stage every large corpus pipeline
  * runs between heuristic cleaning and dedup (CCNet / LLaMA-style
  * wikiref classifiers, GPT-3's WebText logistic regression): score each
  * document with a linear bag-of-words model and gate on the score.
  *
  * The SCORING PLUMBING here is the real thing: a per-row, zero-shuffle
  * projection of `mean(weight(token))`, embarrassingly parallel with
  * input splits, with the weight function injected as a `Column =>
  * Column` seam. A production deployment plugs a learned weight table
  * into that seam (a broadcast map-literal or a static join against a
  * vocabulary-sized weight table); this container has no trained model,
  * so the DEFAULT weights are a deterministic hash surrogate —
  * `md5`-derived integers in [-10, 10] — which keeps every downstream
  * gate decision oracle-checkable cross-engine (the same seam pattern as
  * [[Multimodal]]'s StubDecoder: fake model, real dataflow).
  */
object Classifier {

  /** Deterministic surrogate weight for one (lower-cased) token: the
    * first 15 hex chars of its md5, read as a 60-bit integer, mapped to
    * [-10, 10] via `% 21 - 10`. Uniform-ish, mean ~0, so per-document
    * mean scores spread either side of 0 like a real classifier's
    * logit. Portable verbatim to any SQL engine with md5(). */
  def hashedWeight(token: Column): Column =
    conv(substring(md5(token), 1, 15), 16, 10).cast("long") % 21 - 10

  /** The ONE scoring expression behind [[score]], [[gate]] and
    * [[keep]] — a single definition so the reporting and filtering
    * forms can never diverge (the splitLabel/hashSplit convention).
    * NULL text scores NULL. */
  private def scoreCol(textCol: String,
                       weight: Column => Column): Column = {
    val toks = Text.tokens(col(textCol))
    val wsum = aggregate(toks, lit(0L), (acc, t) => acc + weight(t))
    Num.fpRound(wsum.cast("double") / size(toks), 4)
  }

  /** Per-document linear score: `round(sum(weight(token)) / n_tokens,
    * 4)` over the whitespace tokens — output
    * `(doc_id, n_tokens, score)`. Pure narrow projection: the token
    * array, the weight fold and the division all happen per row inside
    * the scan stage; nothing shuffles, nothing collects. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weight: Column => Column = hashedWeight): DataFrame =
    Par.spread(docs).select(
      col(idCol).as("doc_id"),
      size(Text.tokens(col(textCol))).cast("long").as("n_tokens"),
      scoreCol(textCol, weight).as("score"))

  /** Classifier gate: [[score]] plus the keep/drop decision at
    * `threshold` (keep when score >= threshold) — the auditable form
    * that reports every document's score and fate, like
    * [[TextAnalysis.qualityReport]]. `kept` is 0/1 for EVERY row — a
    * NULL-text document scores NULL and is kept=0 (dropped), exactly
    * as [[keep]]'s filter treats it. */
  def gate(docs: DataFrame, idCol: String, textCol: String,
           threshold: Double,
           weight: Column => Column = hashedWeight): DataFrame =
    score(docs, idCol, textCol, weight)
      .withColumn("kept",
        coalesce((col("score") >= threshold).cast("int"), lit(0)))

  /** Filtering form of [[gate]]: input schema preserved, only documents
    * at or above `threshold` survive — composable inside a curation
    * pipeline (and reused verbatim as the streaming classifier gate:
    * the predicate is stateless and per-row). */
  def keep(docs: DataFrame, textCol: String, threshold: Double,
           weight: Column => Column = hashedWeight): DataFrame =
    docs.filter(scoreCol(textCol, weight) >= threshold)

  /** Weight-TABLE scoring — the 100 TB form of the seam: when the
    * learned model's vocabulary is too large to inline as a `Column`
    * expression (a fastText-scale model carries millions of terms), the
    * weights live in a `(term, weight)` table and scoring becomes a
    * token-explode + join + per-document mean. Same output schema and
    * — when the table covers every token — bit-identical scores to
    * [[score]] (ClassifierSpec pins the parity on a table derived from
    * the corpus's own vocabulary); unseen tokens take `defaultWeight`.
    *
    * Movement: only (doc_id, token) pairs move — never documents; the
    * planner broadcasts the weight table while it fits (vocabularies
    * usually do) and falls back to a shuffled join keyed on the token
    * beyond that, where a persisted weight table bucketed by term makes
    * the join co-located. The mean is one high-reduction hash
    * aggregate. Weights are integers (quantized model weights) so the
    * sum stays exact — only the final division is IEEE, exactly as in
    * [[score]]. */
  def scoreWithTable(docs: DataFrame, idCol: String, textCol: String,
                     weights: DataFrame, termCol: String = "term",
                     weightCol: String = "weight",
                     defaultWeight: Long = 0L): DataFrame = {
    val perToken = Par.spread(docs).select(col(idCol).as("doc_id"),
      explode(Text.tokens(col(textCol))).as("_t"))
    // one row per term, enforced: a duplicated term in the weight table
    // would multiply its (doc_id, token) pairs through the join,
    // silently inflating n_tokens and skewing every containing doc's
    // score. max() keeps the dedup deterministic; the aggregate is
    // map-side-combinable over the vocabulary-sized table — noise next
    // to the corpus-sized explode it guards.
    val w = weights.select(col(termCol).as("_t"),
      col(weightCol).cast("long").as("_w"))
      .groupBy(col("_t")).agg(max(col("_w")).as("_w"))
    perToken.join(w, Seq("_t"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        Num.fpRound(
          sum(coalesce(col("_w"), lit(defaultWeight))).cast("double") /
            count(lit(1)), 4).as("score"))
  }
}
