package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.TextExpressions

import graft.functions.{Guards, Num, Par, Skew, Text}

/** Text analysis suite for training-data pipelines (BASELINE.json
  * extensions; SURVEY §2.4 X4): language ID, quality scoring, token
  * counting, all as per-row codegen'd projections — zero shuffles, so the
  * operators scale embarrassingly with input splits.
  */
object TextAnalysis {

  /** Small stopword dictionaries for the n-gram/stopword-vote language
    * heuristic. Deliberately tiny and deterministic — this is the
    * SQL-oracle-checkable heuristic, not a learned model. */
  val LangDicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  /** Per-dict stopword occurrence counts (union of all dicts in the last
    * slot), via the [[TextExpressions.stopHits]] kernel: one tokenize +
    * hash probes per row, inside whole-stage codegen — replaces the
    * interpreted higher-order `filter(toks, _.isInCollection(dict))`
    * which Spark evaluates outside codegen, once per dictionary. */
  private def hitsArr(textCol: String): Column =
    TextExpressions.stopHits(col(textCol), LangDicts.map(_._2))

  /** Language ID: per-lang stopword hit counts; argmax with the dict order
    * as tie-break (first listed wins). Unmatched docs fall back to "und".
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spread = Par.spread(docs)
    val ha = hitsArr(textCol)
    val scored = LangDicts.zipWithIndex.map { case ((l, _), i) =>
      (l, element_at(ha, i + 1)) }
    // argmax by (count, reverse priority): fold keeps strictly-greater
    val best = scored.tail.foldLeft(
      (lit(LangDicts.head._1), scored.head._2)) {
      case ((bl, bc), (l, c)) => (when(c > bc, lit(l)).otherwise(bl),
        when(c > bc, c).otherwise(bc))
    }
    spread.select(col(idCol).as("doc_id"), col("lang").as("labeled_lang"),
      when(best._2 > 0, best._1).otherwise(lit("und")).as("predicted_lang"))
      .withColumn("agree", (col("predicted_lang") === col("labeled_lang")).cast("int"))
  }

  /** The x12 quality score as a single per-row column expression
    * (1e-4-rounded) — the shared body under [[qualityScore]] and the
    * streaming [[graft.streaming.Streams.scoreGate]]: a pure
    * projection (stopHits kernel + regexps), so it runs unchanged
    * inside a streaming plan. */
  def scoreColumn(textCol: String): org.apache.spark.sql.Column = {
    val t = trim(col(textCol))
    val nChars = length(t)
    val nTokens = size(Text.tokens(col(textCol)))
    val nAlnumSpace = length(regexp_replace(lower(t), "[^a-z0-9 ]", ""))
    val punctRatio = (nChars - nAlnumSpace).cast("double") / nChars.cast("double")
    val stopRatio = element_at(hitsArr(textCol), LangDicts.size + 1)
      .cast("double") / nTokens.cast("double")
    val lengthOk = (nChars >= 100 && nChars <= 20000).cast("int")
    Num.fpRound(
      lit(0.4) * lengthOk +
      lit(0.3) * greatest(lit(0.0), lit(1.0) - punctRatio * 5) +
      lit(0.3) * least(lit(1.0), stopRatio * 5), 4)
  }

  /** Quality scoring: length/punctuation/stopword ratios combined into a
    * bounded [0,1] score. All components are deterministic integer or
    * rational arithmetic rounded at 4. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = trim(col(textCol))
    val toks = Text.tokens(col(textCol))
    val nChars = length(t)
    val nTokens = size(toks)
    val nAlnumSpace = length(regexp_replace(lower(t), "[^a-z0-9 ]", ""))
    val punctRatio = (nChars - nAlnumSpace).cast("double") / nChars.cast("double")
    // union-dict occurrence count = last slot of the stopHits kernel
    val stopRatio = element_at(hitsArr(textCol), LangDicts.size + 1)
      .cast("double") / nTokens.cast("double")
    val avgTokLen = (length(regexp_replace(t, "\\s+", "")).cast("double") /
      nTokens.cast("double"))
    val spread = Par.spread(docs)
    spread.select(col(idCol).as("doc_id"),
      nChars.as("n_chars"), nTokens.as("n_tokens"),
      Num.fpRound(punctRatio, 4).as("punct_ratio"),
      Num.fpRound(stopRatio, 4).as("stopword_ratio"),
      Num.fpRound(avgTokLen, 4).as("avg_token_len"),
      scoreColumn(textCol).as("quality_score"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenization
    * (alnum runs and single non-alnum marks, the pre-tokenizer shape used
    * by byte-pair encoders). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lowered = lower(trim(col(textCol)))
    Par.spread(docs).select(col(idCol).as("doc_id"),
      size(Text.tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(lowered, lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
        .as("bpe_tokens"),
      length(trim(col(textCol))).as("n_chars"))
  }

  /** Corpus data card: the per-(source, lang) composition report every
    * training-data release ships — document and token counts, average
    * document length, exact-duplicate rate (1 - distinct normalized
    * texts / docs), and each cell's share of corpus tokens.
    *
    * Plan shape / 100 TB design: one per-row projection computes token
    * count and the normalized-text digest, then a single (source, lang)
    * hash aggregate — partial map-side aggregation collapses the corpus
    * to O(#cells × #distinct texts per cell) before any shuffle, and the
    * corpus-total token count is a 1-row frame broadcast back over the
    * tiny cell table. Ratios divide exact longs as IEEE doubles and
    * round on the fpRound grid, so they cross engines bit-identically. */
  def dataCard(docs: DataFrame, idCol: String, textCol: String,
               sourceCol: String, langCol: String): DataFrame = {
    val base = Par.spread(docs).select(
      col(sourceCol).as("source"), col(langCol).as("lang"),
      size(Text.tokens(col(textCol))).cast("long").as("_tok"),
      md5(lower(trim(col(textCol)))).as("_th"))
    val grp = base.groupBy(col("source"), col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_tok")).as("n_tokens"),
      countDistinct(col("_th")).as("n_distinct_texts"))
    val tot = grp.agg(sum(col("n_tokens")).as("_total"))
    grp.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        Num.fpRound(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 4).as("avg_doc_tokens"),
        col("n_distinct_texts"),
        Num.fpRound((col("n_docs") - col("n_distinct_texts")).cast("double") /
          col("n_docs").cast("double"), 4).as("dup_rate"),
        Num.fpRound(col("n_tokens").cast("double") /
          col("_total").cast("double"), 4).as("token_share"))
  }

  /** TF-IDF top-`topK` terms per document (whitespace tokens, duplicate-
    * preserving term frequency, smooth idf = ln((N+1)/(df+1))).
    *
    * Plan shape: one shuffle of (doc, term) pairs for tf, one tiny
    * aggregate for df (one row per distinct term), the corpus count
    * broadcast as a 1-row dim, then a per-doc ranking window. At 100 TB
    * the (doc, term) shuffle is the dominant movement and is
    * irreducible for exact tf; df and N are high-reduction aggregates.
    *
    * idf is pre-rounded at 1e-4 before multiplying by tf: ln() is not
    * correctly-rounded IEEE and differs across libm implementations by
    * 1 ulp on ~0.1% of inputs, so downstream comparisons must not see
    * raw ln output (see x25 registration note). */
  /** Per-row term-frequency stage shared by tfidf and vocabulary: one
    * (doc_id, term, tf) row per distinct term of each document row, via
    * the [[TextExpressions.termCounts]] kernel — NO shuffle (the explode
    * + groupBy(doc, term) formulation shuffled every token). */
  private def termFrequencies(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    Par.spread(docs).select(col(idCol).as("doc_id"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))

  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = termFrequencies(docs, idCol, textCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", Num.fpRound(
        log((col("n_docs").cast("double") + lit(1.0)) /
          (col("df").cast("double") + lit(1.0))), 4))
      .withColumn("score", Num.fpRound(col("tf") * col("idf"), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic train/val/test split from the first hex digit of
    * md5(id): '0'-'9' → train (10/16), 'a'-'b' → val (2/16), 'c'-'f' →
    * test (4/16). Pure per-row projection — no RNG, reproducible across
    * engines, runs and partitionings, and stable under corpus growth
    * (a document's split never changes as others are added).
    * Schema-preserving: appends `split` to the input columns, so it
    * composes into a pipeline (x42) as a free projection instead of a
    * corpus-to-corpus join. */
  def hashSplit(docs: DataFrame, idCol: String): DataFrame =
    docs.withColumn("split", splitLabel(col(idCol)))

  /** The split-label Column expression behind [[hashSplit]] — the ONE
    * definition of the md5 bucket boundaries, shared with
    * [[splitLeakage]] so the leakage audit can never silently diverge
    * from the split it audits. */
  def splitLabel(id: Column): Column = {
    val h = substring(md5(id.cast("string")), 1, 1)
    when(h <= "9", lit("train"))
      .when(h <= "b", lit("val"))
      .otherwise(lit("test"))
  }

  /** Per-source DISTRIBUTION DRIFT (x106) — KL(source ‖ corpus) over
    * the corpus's top-`vocabSize` unigram vocabulary: the data-card
    * companion that quantifies how far each source's language deviates
    * from the mix (a drifting crawl source shows up here long before
    * it shows up in loss curves). Both distributions are normalized
    * over the SAME top-V term set, so the divergence is well-defined
    * and bounded; terms a source never uses contribute 0 (the p→0
    * limit). Returns `(source, n_terms, kl_divergence)`; a source with
    * zero top-V occurrences reports NULL divergence.
    *
    * Scale shape: one kernel term-count pass; the top-V vocabulary is
    * a V-row broadcast (x33's TakeOrdered cut), so only top-V term
    * rows survive the scan — the exchange after it is bounded by
    * #sources × V however large the corpus vocabulary is. Numeric
    * law: p and q are exact long/long divisions; ln(p/q) is rounded
    * at 1e-4 (the x25 libm shim); each p·ln-term is rounded and the
    * per-source sum runs as exact DECIMAL — order-free. */
  def sourceDrift(docs: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val tf = Par.spread(docs)
      .select(col(sourceCol).as("source"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("source"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))
    // corpus top-V vocabulary with its counts: TakeOrdered cut,
    // (count desc, term asc) total order — V rows, broadcast
    val vocab = tf.groupBy(col("term"))
      .agg(sum(col("tf")).as("corpus_tf"))
      .orderBy(col("corpus_tf").desc, col("term"))
      .limit(vocabSize)
    val corpusTotal = vocab.agg(sum(col("corpus_tf")).as("corpus_total"))
    val srcTf = tf.join(broadcast(vocab), "term")
      .groupBy(col("source"), col("term"))
      .agg(sum(col("tf")).as("src_tf"),
        first(col("corpus_tf")).as("corpus_tf"))
    val srcTotals = srcTf.groupBy(col("source"))
      .agg(sum(col("src_tf")).as("src_total"))
    val p = col("src_tf").cast("double") / col("src_total").cast("double")
    val q = col("corpus_tf").cast("double") /
      col("corpus_total").cast("double")
    val contrib = Num.fpRound(p * Num.fpRound(log(p / q), 4), 4)
    val drift = srcTf
      .join(srcTotals, "source")
      .crossJoin(broadcast(corpusTotal))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        Num.dsum(contrib).as("kl_divergence"))
    docs.select(col(sourceCol).as("source")).distinct()
      .join(drift, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        col("kl_divergence"))
  }

  /** Zipf power-law AUDIT (x111) — the one-row corpus health report on
    * the token frequency distribution: least-squares fit of
    * ln(freq) = intercept + slope·ln(rank) over the corpus's
    * top-`vocabSize` terms, plus the fit's r². Natural text sits near
    * slope ≈ −1 with high r²; a corpus dominated by templated or
    * machine-generated mass bends the curve (flat head = boilerplate
    * flooding, collapsed tail = vocabulary starvation) long before any
    * per-document signal fires. Returns
    * `(n_terms, slope, intercept, r2)`; r2 is NULL when degenerate
    * (all-equal frequencies or a single term — zero variance).
    *
    * Scale shape: one kernel term-count pass and a TakeOrdered top-V
    * cut (x106's movement budget); ranks and the regression run on a
    * V-row frame, so the only single-partition work is V rows. Numeric
    * law: ln(rank)/ln(freq) rounded at 1e-4 (the x25 shim), each
    * product term rounded, the five regression sums in exact DECIMAL
    * (order-free), and the closed-form slope/intercept/r² are IEEE
    * ops on those identical sums, rounded at 1e-4 — mirrored term by
    * term in the oracle. */
  def zipfAudit(docs: DataFrame, textCol: String,
                vocabSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val tf = Par.spread(docs)
      .select(explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("tc.term").as("term"), col("tc.tf").cast("long").as("tf"))
      .groupBy(col("term")).agg(sum(col("tf")).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(vocabSize)
    // rank within the V-row cut: the window is single-partition but
    // V-bounded (the x103 caveat does not apply — V is a knob, not the
    // corpus)
    val ranked = tf.withColumn("r", row_number()
      .over(Window.orderBy(col("freq").desc, col("term"))).cast("long"))
    val pts = ranked.select(
      Num.fpRound(log(col("r").cast("double")), 4).as("x"),
      Num.fpRound(log(col("freq").cast("double")), 4).as("y"))
    val s = pts.agg(
      count(lit(1)).cast("double").as("n"),
      Num.dsum(col("x")).as("sx"),
      Num.dsum(col("y")).as("sy"),
      Num.dsum(Num.fpRound(col("x") * col("x"), 4)).as("sxx"),
      Num.dsum(Num.fpRound(col("x") * col("y"), 4)).as("sxy"),
      Num.dsum(Num.fpRound(col("y") * col("y"), 4)).as("syy"))
    val dx = s("n") * col("sxx") - col("sx") * col("sx")
    val dy = s("n") * col("syy") - col("sy") * col("sy")
    val cov = s("n") * col("sxy") - col("sx") * col("sy")
    s.select(
      col("n").cast("long").as("n_terms"),
      when(dx > 0, Num.fpRound(cov / dx, 4)).as("slope"),
      when(dx > 0, Num.fpRound(
        (col("sy") * col("sxx") - col("sx") * col("sxy")) / dx, 4))
        .as("intercept"),
      when(dx > 0 && dy > 0,
        Num.fpRound(cov * cov / (dx * dy), 4)).as("r2"))
  }

  /** Per-source sequence-LENGTH histogram (x112) — the packing-planner
    * data card: document counts and token mass per (source, power-of-2
    * length bucket). Context-window budgeting (x46/x61) needs the
    * length DISTRIBUTION, not the mean — a source whose mass sits in
    * the 4096+ buckets packs completely differently from one at 128 —
    * and per source because mixes are budgeted per source. Bucket =
    * number of binary digits of the token count (1→1, 2-3→2, 4-7→3,
    * …): an exact INTEGER law (base-2 digit string length — no
    * floating log2 whose libm rounding could flip a power-of-2
    * boundary cross-engine). Empty docs land in bucket 0.
    *
    * Scale shape: a zero-shuffle per-row kernel projection + one
    * (#sources × ~40)-row aggregate — the x13 class. */
  def lengthHistogram(docs: DataFrame, idCol: String, textCol: String,
                      sourceCol: String): DataFrame =
    Par.spread(docs)
      .select(col(sourceCol).as("source"),
        size(Text.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("len_bucket",
        when(col("n_tokens") > 0, length(conv(col("n_tokens"), 10, 2)))
          .otherwise(lit(0)).cast("long"))
      .groupBy(col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))

  /** Mixture token-share ENTROPY (x113) — the one-row diversity number
    * for a training mix: Shannon entropy (nats) of the per-source
    * token-mass distribution, plus its normalized form
    * H/ln(#sources) ∈ [0,1] (1 = perfectly balanced mix, → 0 = one
    * source dominates). The scalar complement of x51's composition
    * table and x106's per-source drift: mix rebalancing work (x45/x47
    * quotas) moves THIS number. Returns
    * `(n_sources, total_tokens, entropy, balance)`; balance is NULL
    * for a single-source corpus (ln 1 = 0).
    *
    * Scale shape: one zero-shuffle token-count kernel pass, a
    * #sources-row aggregate, and a 1-row fold. Numeric law: shares
    * are exact long/long divisions; each −p·ln(p) term is rounded at
    * 1e-4 (ln via the x25 shim) and the sum runs in exact DECIMAL —
    * order-free; sources with zero tokens contribute 0 (the p→0
    * limit). */
  def mixEntropy(docs: DataFrame, idCol: String, textCol: String,
                 sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // total via an unbounded window over the #sources-row aggregate —
    // the x103 rollup idiom — so the corpus is scanned ONCE (a second
    // aggregate branch would re-evaluate the whole lineage; the window
    // is single-partition but #sources-bounded). Plan-pinned.
    val perSource = Par.spread(docs)
      .select(col(sourceCol).as("source"),
        size(Text.tokens(col(textCol))).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("total_tokens", sum(col("src_tokens")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val p = col("src_tokens").cast("double") /
      col("total_tokens").cast("double")
    val term = when(col("src_tokens") > 0,
      Num.fpRound(-p * Num.fpRound(log(p), 4), 4)).otherwise(lit(0.0d))
    perSource
      .agg(count(lit(1)).as("n_sources"),
        first(col("total_tokens")).as("total_tokens"),
        Num.dsum(term).as("entropy"))
      .select(col("n_sources"), col("total_tokens"), col("entropy"),
        when(col("n_sources") > 1, Num.fpRound(
          col("entropy") / Num.fpRound(
            log(col("n_sources").cast("double")), 4), 4)).as("balance"))
  }

  /** Quality-score HISTOGRAM (x125) — the distribution the gate
    * thresholds (x35's fixed bar, x119's quantile bar) cut through,
    * as a data-card table: `(score_bucket, n_docs, sum_tokens)` with
    * bucket = floor(score · buckets). Read next to x114: the
    * quantiles give exact cut points, this shows the mass between
    * them — a score distribution collapsing into one bucket is the
    * signal to retune the score, not the threshold. One scoring scan,
    * one ≤(buckets+1)-row aggregate (x112's shape on the score
    * axis). */
  def scoreHistogram(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int = 20): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    qualityScore(docs, idCol, textCol)
      .select(floor(col("quality_score") * lit(buckets.toDouble))
          .cast("int").as("score_bucket"),
        col("n_tokens").cast("long").as("_nt"))
      .groupBy(col("score_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("sum_tokens"))
  }

  /** Curriculum PHASE × SOURCE matrix (x126) — what each x103 phase is
    * MADE OF: `(phase, source, n_docs, sum_tokens)`. The composition
    * audit behind quality-ordered training: if phase 0 is one source
    * wall-to-wall, the curriculum is a source filter in disguise and
    * the mixture (x117) fights the ordering. Returns one row per
    * (phase, source) cell.
    *
    * Scale shape: the x103 bucketed-rank pass (no global sort) plus
    * one source/token projection scan, joined id-to-id — ids, a
    * source string and a count cross the wire, never text — then a
    * ≤ nPhases·#sources-row aggregate. */
  def phaseSourceMatrix(docs: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, nPhases: Int,
                        bucketBits: Int = 8): DataFrame = {
    require(nPhases >= 1, s"nPhases must be >= 1, got $nPhases")
    val ranked = bucketedScoreRank(docs, idCol, textCol, bucketBits,
        bestFirst = true)
      .select(col("doc_id"),
        floor((col("rank") - 1).cast("double") * lit(nPhases.toDouble) /
          col("_total").cast("double")).cast("int").as("phase"))
    val src = Par.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        size(Text.tokens(col(textCol))).cast("long").as("_nt"))
    ranked.join(src, Seq("doc_id"))
      .groupBy(col("phase"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("sum_tokens"))
  }

  /** Token-budget MIXTURE PLAN (x117) — the sampling-rate solver a
    * training run consumes: given the corpus's per-source token mass
    * and a total token budget, allocate the budget by temperature-
    * smoothed mass (weight ∝ √mass, the α=0.5 exponent smoothing the
    * multilingual-pretraining literature uses to up-weight small
    * sources without letting a giant crawl drown them) and report,
    * per source, the achievable plan: `(source, src_tokens, weight,
    * target_tokens, planned_tokens, sample_rate, deficit_tokens)`.
    * `planned = min(target, mass)` — a source can't supply more than
    * it has (without repetition); `deficit` is the shortfall the run
    * either re-epochs (x49's repeat machinery) or redistributes.
    *
    * Scale shape: one corpus scan → a #sources-row aggregate; the
    * weight normalization is an unbounded window over that
    * #sources-row frame (the x103 rollup idiom — single-partition but
    * #sources-bounded, never corpus-shaped). Float laws: √mass and
    * every ratio round at 1e-4; the weight total sums the rounded
    * addends as DECIMAL (order-free), so the plan is bit-stable
    * cross-engine. */
  def mixturePlan(docs: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val perSource = Par.spread(docs)
      .select(col(sourceCol).as("source"),
        size(Text.tokens(col(textCol))).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("_w", Num.fpRound(sqrt(col("src_tokens").cast("double")), 4))
      .withColumn("_wtot", sum(col("_w").cast("decimal(38,6)")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).cast("double"))
    // _wtot = 0 is unreachable on any non-empty source (√mass ≥ 1 when
    // a source has ≥ 1 doc), but guard the division so a degenerate
    // frame yields a defined 0-weight row, not NaN (the
    // ivfBalanceReport convention)
    val weight = when(col("_wtot") > 0,
      Num.fpRound(col("_w") / col("_wtot"), 4)).otherwise(lit(0.0d))
    val target = floor(lit(budgetTokens.toDouble) * col("weight") + lit(0.5))
      .cast("long")
    perSource
      .withColumn("weight", weight)
      .withColumn("target_tokens", target)
      .withColumn("planned_tokens", least(col("target_tokens"),
        col("src_tokens")))
      .select(col("source"), col("src_tokens"), col("weight"),
        col("target_tokens"), col("planned_tokens"),
        when(col("src_tokens") > 0, Num.fpRound(
          col("planned_tokens").cast("double") /
            col("src_tokens").cast("double"), 4))
          .otherwise(lit(0.0d)).as("sample_rate"),
        (col("target_tokens") - col("planned_tokens")).as("deficit_tokens"))
  }

  /** Quantile-CALIBRATED quality gate (x119) — the closed loop between
    * the distribution summary and the filter: instead of a hand-picked
    * quality bar (x35's fixed 0.5), the threshold IS the corpus's own
    * exact q-quantile score ("drop the worst quarter"), so the gate
    * self-calibrates as the corpus shifts. Returns the kept documents
    * `(doc_id, quality_score, threshold)` — every document whose score
    * is ≥ the score at ascending rank ceil(q·N) under (score asc, id).
    * Ties at the threshold score are all kept (the gate is on SCORE,
    * not rank — a document is never dropped while an equal-scored one
    * survives).
    *
    * Scale shape: two passes of the x103 bucketed-rank machinery's
    * cost — one [[scoreQuantiles]] call for the 1-row threshold (no
    * global sort) and one scoring scan for the gate itself; the
    * threshold joins in as a broadcast 1-row frame, so the gate is a
    * zero-shuffle kernel filter exactly like x35. */
  def calibratedGate(docs: DataFrame, idCol: String, textCol: String,
                     q: Double): DataFrame = {
    require(q > 0.0 && q <= 1.0, s"q must lie in (0, 1], got $q")
    val thr = scoreQuantiles(docs, idCol, textCol, Seq(q))
      .select(col("quality_score").as("threshold"))
    qualityScore(docs, idCol, textCol)
      .select(col("doc_id"), col("quality_score"))
      .crossJoin(broadcast(thr))
      .filter(col("quality_score") >= col("threshold"))
  }

  /** Per-document n-gram NOVELTY (x104) — the diversity-contribution
    * signal: what fraction of a document's distinct k-shingles appears
    * NOWHERE else in the corpus (df = 1). High novelty marks documents
    * that add unique content to the mix; near-zero novelty marks
    * templated/boilerplate mass even when no single document is a
    * near-duplicate — the corpus-level complement of the pairwise
    * dedup family. Returns `(doc_id, n_shingles, n_unique, novelty)`;
    * docs shorter than k tokens have no shingles and report (0, 0,
    * NULL).
    *
    * Scale shape: one scan-side shingle-kernel pass, one (hash)
    * df-aggregate over 8-byte hashed shingles, one hash-equi join back
    * — the same movement budget as x25's df stage; text never
    * shuffles. novelty = exact long/long division (bit-identical
    * cross-engine, no rounding shim needed — but rounded at 1e-4
    * anyway to keep the surface uniform with the other ratios). */
  def noveltyScores(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    // PERSISTED AT DISK_ONLY (the TextDedup CACHE CONTRACT applies:
    // caller-owned — clearCache() between queries, as Bench/Verify do):
    // the gram stream feeds both the df aggregate and the join back, so
    // without pinning it the shingle kernel scans the corpus text twice
    // per run. The pin is DISK_ONLY, not MEMORY: the frame is
    // token-stream-sized (one 8-byte hash per shingle occurrence) —
    // smaller than the text but still corpus-SCALE, and a memory pin of
    // a corpus-scale frame is exactly the thing that evicts working
    // memory at 100 TB. Serialized-on-local-disk is the shuffle-file
    // cost model, which this stage already pays anyway. A repeated-
    // novelty user (score every incoming batch) should instead persist
    // the df-aggregate as a table (the x80/x91 index convention) — that
    // artifact is vocabulary-sized, not corpus-sized.
    val grams = Par.spread(docs).select(col(idCol).as("doc_id"),
        explode(TextExpressions.shingleHashSet(col(textCol), k)).as("_h"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val dfh = grams.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    noveltyTail(docs, idCol, grams.join(dfh, "_h"))
  }

  /** The shared novelty tail: fold a per-gram `(doc_id, _df)` stream to
    * per-document `(n_shingles, n_unique, novelty)`, short docs entering
    * as (0, 0, NULL). [[noveltyScores]] (self-contained, df from a
    * same-run aggregate) and [[noveltyScoresIndexed]] (df from the
    * persisted index) both end here — parity by construction. */
  private def noveltyTail(docs: DataFrame, idCol: String,
                          gramsWithDf: DataFrame): DataFrame = {
    val perDoc = gramsWithDf
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_df") === 1, 1L).otherwise(0L)).as("n_unique"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        when(col("n_shingles") > 0, Num.fpRound(
          col("n_unique").cast("double") /
            col("n_shingles").cast("double"), 4)).as("novelty"))
  }

  /** Persist the novelty GRAM-DF index (the x80/x91/x107 convention):
    * the corpus's `(_h, _df)` shingle-hash document frequencies as a
    * catalog table bucketed by hash — vocabulary-scale (one row per
    * DISTINCT gram, 16 bytes each), not corpus-scale, and built in one
    * text scan. After it, novelty scoring never re-aggregates the
    * corpus — and never needs [[noveltyScores]]' corpus-scale DISK_ONLY
    * gram pin at all. */
  def writeNoveltyIndex(corpus: DataFrame, idCol: String, textCol: String,
                        k: Int, dfTable: String,
                        numBuckets: Int = 8): Unit =
    graft.sinks.Sinks.writeBucketed(
      Par.spread(corpus)
        .select(explode(TextExpressions.shingleHashSet(col(textCol), k))
          .as("_h"))
        .groupBy(col("_h")).agg(count(lit(1)).as("_df")),
      dfTable, Seq("_h"), numBuckets)

  /** Incremental novelty-index MAINTENANCE: append a batch's gram
    * document frequencies into the existing bucket layout (one file
    * per bucket per ingest). Appended ingests can duplicate a hash
    * across files — PRESENCE queries (the streaming
    * [[graft.streaming.Streams.noveltyIngest]] gate, which joins
    * anti/semi) are unaffected, but exact-df serving
    * ([[noveltyScoresIndexed]]) requires one row per hash — run
    * [[compactNoveltyIndex]] before serving, the usual
    * append-then-compact lifecycle of an LSM-shaped index. */
  def appendNoveltyIndex(batch: DataFrame, idCol: String, textCol: String,
                         k: Int, dfTable: String,
                         numBuckets: Int = 8): Unit =
    graft.sinks.Sinks.writeBucketed(
      Par.spread(batch)
        .select(explode(TextExpressions.shingleHashSet(col(textCol), k))
          .as("_h"))
        .groupBy(col("_h")).agg(count(lit(1)).as("_df")),
      dfTable, Seq("_h"), numBuckets, append = true)

  /** Fold an appended novelty index back to one row per hash (sum of
    * per-ingest counts — gram SETS are disjoint per document, so the
    * sum IS the union df). The aggregate groups on the bucketing
    * column — shuffle-free — and stages through a side table because
    * Spark cannot overwrite a table from a plan that reads it. */
  def compactNoveltyIndex(spark: org.apache.spark.sql.SparkSession,
                          dfTable: String, numBuckets: Int = 8): Unit = {
    val tmp = dfTable + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    graft.sinks.Sinks.writeBucketed(
      spark.table(dfTable).groupBy(col("_h"))
        .agg(sum(col("_df")).as("_df")),
      tmp, Seq("_h"), numBuckets)
    graft.sinks.Sinks.writeBucketed(spark.table(tmp), dfTable,
      Seq("_h"), numBuckets)
    spark.sql(s"DROP TABLE $tmp")
  }

  /** [[noveltyScores]] through its PERSISTED gram-df index — the
    * incremental serving form: score a batch's novelty against the
    * index's document frequencies with ONE batch text scan and zero
    * corpus work (the index side is a pre-bucketed table scan). The
    * batch's gram stream is consumed exactly once (the join), so the
    * self-contained form's DISK_ONLY persist disappears entirely —
    * nothing is pinned anywhere. Run over the index's own corpus it
    * returns [[noveltyScores]]' rows identically (shared
    * [[noveltyTail]]; x110 reuses x104's oracle); grams absent from
    * the index don't join and drop from both counts, so a DISJOINT
    * batch scores (0, 0, NULL) — novelty here is "new relative to the
    * INDEXED corpus", which is the incremental-ingest question. */
  def noveltyScoresIndexed(spark: org.apache.spark.sql.SparkSession,
                           batch: DataFrame, idCol: String,
                           textCol: String, k: Int,
                           dfTable: String): DataFrame = {
    val grams = Par.spread(batch).select(col(idCol).as("doc_id"),
      explode(TextExpressions.shingleHashSet(col(textCol), k)).as("_h"))
    noveltyTail(batch, idCol, grams.join(spark.table(dfTable), "_h"))
  }

  /** Quality-ordered CURRICULUM phases (x103): every document's EXACT
    * global rank under (quality_score desc, doc_id asc) and its phase
    * `floor((rank-1)·nPhases/N)` — the curriculum-learning assignment
    * (train on the cleanest quantile first, widen per phase), which
    * needs a corpus-wide total order that naive `row_number()` over an
    * unpartitioned window computes in ONE task.
    *
    * Scale shape — exact distributed rank with NO global sort and NO
    * sampling: the x12 score is bounded in [0,1], so documents land in
    * deterministic STATIC range buckets (`floor(score·2^bucketBits)` —
    * the score-domain twin of the md5-hash buckets under
    * [[graft.operators.Packing.groupedOffsets]]); each bucket ranks
    * locally (windows partition by bucket — ≤2^bucketBits parallel
    * groups), a ≤2^bucketBits-row rollup of bucket counts broadcasts
    * higher-bucket offsets back, and rank = offset + local rank.
    * Deterministic under any partitioning (no RNG, no sampled range
    * boundaries — the `repartitionByRange` alternative samples). The
    * documented caveat matches groupedOffsets': a bucket's window is
    * single-task for that bucket, so a score distribution collapsed
    * into one 2^-bucketBits-wide band degrades to a single sort —
    * widen bucketBits for spiky score distributions. */
  def curriculumPhases(docs: DataFrame, idCol: String, textCol: String,
                       nPhases: Int, bucketBits: Int = 8): DataFrame = {
    require(nPhases >= 1, s"nPhases must be >= 1, got $nPhases")
    bucketedScoreRank(docs, idCol, textCol, bucketBits, bestFirst = true)
      .select(col("doc_id"), col("quality_score"), col("rank"),
        floor((col("rank") - 1).cast("double") * lit(nPhases.toDouble) /
          col("_total").cast("double")).cast("int").as("phase"))
  }

  /** The shared exact-distributed-rank core under [[curriculumPhases]]
    * and [[scoreQuantiles]]: every document's global rank under the
    * x12 quality score via deterministic static score-range buckets —
    * no global sort, no sampled boundaries. `bestFirst` ranks
    * (score desc, id asc) — x103's curriculum order; `!bestFirst`
    * ranks (score asc, id asc) — the quantile order. Returns
    * `(doc_id, quality_score, rank, _total)`. */
  private def bucketedScoreRank(docs: DataFrame, idCol: String,
                                textCol: String, bucketBits: Int,
                                bestFirst: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = 1 << bucketBits
    val scored = qualityScore(docs, idCol, textCol)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("_b", least(lit(b - 1),
        floor(col("quality_score") * lit(b.toDouble)).cast("int")))
    // local rank within each score-range bucket
    val wLocal = Window.partitionBy(col("_b"))
      .orderBy(if (bestFirst) col("quality_score").desc
               else col("quality_score").asc, col("doc_id"))
    val local = scored.withColumn("_lrn", row_number().over(wLocal))
    // bucket totals: ≤ 2^bucketBits rows; offsets accumulate from the
    // first-ranked end (highest bucket down for bestFirst, lowest up
    // otherwise)
    val counts = local.groupBy(col("_b")).agg(count(lit(1)).as("_n"))
    val wOff = Window
      .orderBy(if (bestFirst) col("_b").desc else col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(wOff), lit(0L)))
      .withColumn("_total", sum(col("_n")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("_b"), col("_off"), col("_total"))
    local.join(broadcast(offsets), Seq("_b"))
      .withColumn("rank", col("_off") + col("_lrn").cast("long"))
      .select(col("doc_id"), col("quality_score"), col("rank"),
        col("_total"))
  }

  /** EXACT score quantiles (x114) — the distribution summary behind
    * every gate-threshold decision ("where IS the p25 of quality?"),
    * computed exactly, with no global sort and no approximation: for
    * each requested quantile q, the document at ascending rank
    * ceil(q·N) under (quality_score asc, doc_id asc). Exactness
    * matters at the tails (p99 of a skewed score is exactly where
    * `percentile_approx`'s error concentrates) and determinism
    * matters for the oracle — both engines compute the same IEEE
    * q·N before ceil. Returns `(quantile, rank, doc_id,
    * quality_score)`, one row per quantile.
    *
    * Scale shape: the x103 bucketed-rank machinery ([[
    * bucketedScoreRank]] — static range buckets, per-bucket local
    * windows, a ≤2^bucketBits-row offset rollup), then a |quantiles|-
    * row broadcast joined on the computed target rank — the join is a
    * per-row predicate against a handful of constants, and only
    * |quantiles| rows survive. */
  def scoreQuantiles(docs: DataFrame, idCol: String, textCol: String,
                     quantiles: Seq[Double],
                     bucketBits: Int = 8): DataFrame = {
    require(quantiles.nonEmpty, "quantiles must be non-empty")
    require(quantiles.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $quantiles")
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = bucketedScoreRank(docs, idCol, textCol, bucketBits,
      bestFirst = false)
    val qdf = quantiles.toDF("quantile")
    ranked.join(broadcast(qdf),
        col("rank") === ceil(col("quantile") * col("_total")).cast("long"))
      .select(col("quantile"), col("rank"), col("doc_id"),
        col("quality_score"))
  }

  /** PER-GROUP exact rank without a per-group global sort — the
    * grouped generalization of [[bucketedScoreRank]] (x114/x119's
    * machinery), over an arbitrary already-scored frame: score-range
    * buckets are derived from each group's own (min, max) — one
    * group-count-sized aggregate, broadcast — local ranks window by
    * (group, bucket), and per-(group, bucket) offsets (≤ groups·2^bits
    * rows, broadcast) roll local ranks up to exact per-group ranks.
    * No partition in the plan ever holds more than one (group, bucket)
    * slice; a range-partitioned sort per group (what a naive
    * `row_number() OVER (PARTITION BY group ORDER BY score)` plans)
    * would put each whole GROUP in one partition — the skew this
    * machinery exists to avoid (one giant language is the common
    * case). Bucket assignment is weakly monotone in score (subtract /
    * divide-by-positive / floor all preserve order), so ties stay
    * inside one bucket and cross-bucket order is consistent — ranks
    * are EXACT, bucketBits only shapes parallelism. Degenerate
    * constant-score groups collapse to one bucket (documented, same as
    * the global form). Group cardinality must be modest (languages,
    * sources — the grouped-data-card regime): offsets broadcast at
    * groups·2^bits rows.
    *
    * Returns the scored frame + `rank` (1-based within group,
    * bestFirst ⇒ rank 1 = highest score) and `n_group` (group size),
    * tie law (score, id asc). */
  private def groupedBucketedRank(scored: DataFrame, idCol: String,
                                  groupCol: String, scoreCol: String,
                                  bucketBits: Int,
                                  bestFirst: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = 1 << bucketBits
    val ext = scored.groupBy(col(groupCol))
      .agg(min(col(scoreCol)).as("_mn"), max(col(scoreCol)).as("_mx"))
    val withB = scored.join(broadcast(ext), Seq(groupCol))
      .withColumn("_b", when(col("_mx") === col("_mn"), lit(0))
        .otherwise(least(lit(b - 1),
          floor((col(scoreCol) - col("_mn")) /
            (col("_mx") - col("_mn")) * lit(b.toDouble)).cast("int"))))
    val wLocal = Window.partitionBy(col(groupCol), col("_b"))
      .orderBy(if (bestFirst) col(scoreCol).desc else col(scoreCol).asc,
        col(idCol))
    val local = withB.withColumn("_lrn", row_number().over(wLocal))
    val counts = local.groupBy(col(groupCol), col("_b"))
      .agg(count(lit(1)).as("_n"))
    val wOff = Window.partitionBy(col(groupCol))
      .orderBy(if (bestFirst) col("_b").desc else col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(wOff), lit(0L)))
      .withColumn("_ntot", sum(col("_n")).over(wTot))
      .select(col(groupCol), col("_b"), col("_off"), col("_ntot"))
    local.join(broadcast(offsets), Seq(groupCol, "_b"))
      .withColumn("rank", col("_off") + col("_lrn").cast("long"))
      .withColumn("n_group", col("_ntot"))
      .drop("_b", "_mn", "_mx", "_lrn", "_off", "_ntot")
  }

  /** Public face of [[groupedBucketedRank]] for callers outside this
    * file (x165's Gini rank-weighted sums): per-group EXACT ascending
    * ranks (ties by id) with `n_group`, no per-group sort — the same
    * core x146/x147/x154/x156 cut their buckets from. */
  def groupedRanks(scored: DataFrame, idCol: String, groupCol: String,
                   scoreCol: String, bucketBits: Int = 8,
                   bestFirst: Boolean = false): DataFrame =
    groupedBucketedRank(scored, idCol, groupCol, scoreCol, bucketBits,
      bestFirst)

  /** PER-GROUP equal-frequency bucket labels (grouped exact n-tiles)
    * over an arbitrary scored frame: within each group, rank by score
    * ([[groupedBucketedRank]] — exact, no per-group sort) and cut at
    * `ceil(n_group·i / nb)` for i = 1..nb — integer arithmetic, so the
    * boundaries are bit-exact in any engine. Closed form per row:
    * bucket = (nb·(rank−1)) div n_group + 1. NOTE this is NOT SQL
    * NTILE (which packs the n mod nb remainder rows into the FIRST
    * buckets); the two coincide exactly when nb | n_group. `labels`
    * names the buckets first-to-last (bestFirst ⇒ labels.head = the
    * top fraction).
    *
    * Output: the scored frame's (id, group, score) + `rank`, `n_group`,
    * `bucket`. */
  def groupedNtileBuckets(scored: DataFrame, idCol: String,
                          groupCol: String, scoreCol: String,
                          labels: Seq[String], bucketBits: Int = 8,
                          bestFirst: Boolean = true): DataFrame = {
    require(labels.nonEmpty, "labels must be non-empty")
    val nb = labels.size
    val ranked = groupedBucketedRank(scored, idCol, groupCol, scoreCol,
      bucketBits, bestFirst)
    val bucket = labels.zipWithIndex.init.foldRight(
      lit(labels.last): Column) { case ((lbl, i), rest) =>
      // boundary_i = ceil(n_group·(i+1) / nb) = (n·(i+1) + nb−1) div nb.
      // Computed as floor of a double quotient: numerator and nb are
      // integer-exact doubles and the quotient's distance from any
      // integer it isn't is ≥ 1/nb — far above double rounding error —
      // so this IS integer division for n_group·nb < 2^52 (the DuckDB
      // mirror uses `//` on BIGINTs; identical values by this argument)
      when(col("rank") <= floor(
        (col("n_group") * (i + 1) + (nb - 1)) / lit(nb.toDouble))
        .cast("long"), lbl).otherwise(rest)
    }
    ranked.select(col(idCol), col(groupCol), col(scoreCol),
      col("rank"), col("n_group"), bucket.as("bucket"))
  }

  /** PER-GROUP exact quantile VALUES over an arbitrary scored frame —
    * [[scoreQuantiles]]' grouped twin on the [[groupedBucketedRank]]
    * core: for each group and each q, the score at ascending rank
    * `ceil(q·n_group)` (the same double-ceil law as x114/x119/x147).
    * Output `(group, quantile, rank, id, score)` — the id shows WHICH
    * row sits at the cut, the same report shape as the global form.
    * No per-group sort anywhere; the quantile frame broadcasts. */
  def groupedQuantiles(scored: DataFrame, idCol: String,
                       groupCol: String, scoreCol: String,
                       quantiles: Seq[Double],
                       bucketBits: Int = 8): DataFrame = {
    require(quantiles.nonEmpty, "quantiles must be non-empty")
    require(quantiles.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $quantiles")
    val spark = scored.sparkSession
    import spark.implicits._
    val ranked = groupedBucketedRank(scored, idCol, groupCol, scoreCol,
      bucketBits, bestFirst = false)
    val qdf = quantiles.toDF("quantile")
    ranked.join(broadcast(qdf),
        col("rank") === ceil(col("quantile") * col("n_group"))
          .cast("long"))
      .select(col(groupCol), col("quantile"), col("rank"), col(idCol),
        col(scoreCol))
  }

  /** CCNet-style PER-LANGUAGE fluency buckets (x146) — Wenzek et al.'s
    * head/middle/tail cut, the curation stage CCNet runs after dedup:
    * every document is scored by the corpus-trained bigram LM
    * ([[bigramLmScores]], x86's add-one-smoothed avg log-prob — the
    * oracle-checkable stand-in for CCNet's wiki-trained KenLM), then
    * each LANGUAGE ranks its own documents and cuts exact terciles —
    * head = most fluent third OF THAT LANGUAGE. The per-group cut is
    * the whole point (and the reason x114's global quantiles don't
    * compose here): a global cut would grade low-resource languages
    * against the dominant one's fluency distribution and gut them.
    * Documents with < 2 tokens have no bigrams and drop out (x86's
    * law).
    *
    * Scale shape: x86's vocabulary-bounded count tables dominate; the
    * grouped rank adds (group, bucket)-partitioned windows and two
    * broadcast-sized side tables — no per-language sort, no
    * range-partitioning, text never reaches the ranking exchange
    * (scores are (id, lang, double) rows). */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   groupCol: String, labels: Seq[String],
                   bucketBits: Int = 8): DataFrame = {
    val scores = bigramLmScores(docs, idCol, textCol)
      .select(col("doc_id"), col("avg_logprob"))
    val grouped = docs.select(col(idCol).cast("long").as("doc_id"),
      col(groupCol))
    groupedNtileBuckets(scores.join(grouped, Seq("doc_id")), "doc_id",
        groupCol, "avg_logprob", labels, bucketBits, bestFirst = true)
      .withColumnRenamed("rank", "lm_rank")
      .withColumnRenamed("n_group", "n_lang")
  }

  /** PER-GROUP calibrated quality gate (x147) — [[calibratedGate]]'s
    * grouped twin: each group's threshold is ITS OWN exact q-quantile
    * quality score (ascending — q = 0.25 drops each group's worst
    * quarter), and the gate keeps `score >= threshold`, so ties at the
    * bar all survive (gate on score, not rank — x119's law, per
    * group). The per-group calibration is the point: one global bar
    * (x119) gates low-scoring LANGUAGES, not low-scoring documents —
    * a 25% global cut can silently delete a whole low-resource
    * language whose honest scores sit below the dominant language's
    * median.
    *
    * Scale shape: two scoring passes (threshold + gate), as x119; the
    * grouped rank is [[groupedBucketedRank]] (no per-group sort), the
    * threshold table is group-count-sized and broadcast, and the gate
    * itself is a zero-shuffle filter of the scored stream. */
  def groupedCalibratedGate(docs: DataFrame, idCol: String,
                            textCol: String, groupCol: String, q: Double,
                            bucketBits: Int = 8): DataFrame = {
    require(q > 0.0 && q <= 1.0, s"q must lie in (0, 1], got $q")
    val grouped = docs.select(col(idCol).cast("long").as("doc_id"),
      col(groupCol))
    val scored = qualityScore(docs, idCol, textCol)
      .select(col("doc_id"), col("quality_score"))
      .join(grouped, Seq("doc_id"))
    val thr = groupedBucketedRank(scored, "doc_id", groupCol,
        "quality_score", bucketBits, bestFirst = false)
      .filter(col("rank") ===
        ceil(lit(q) * col("n_group")).cast("long"))
      .select(col(groupCol), col("quality_score").as("threshold"))
    scored.join(broadcast(thr), Seq(groupCol))
      .filter(col("quality_score") >= col("threshold"))
      .select(col("doc_id"), col(groupCol), col("quality_score"),
        col("threshold"))
  }

  /** Train/val/test LEAKAGE audit: near-duplicate pairs (exact n-gram
    * Jaccard >= threshold, the x8 machinery) whose two documents land in
    * DIFFERENT [[hashSplit]] splits — the contamination a random
    * per-document split always produces on an un-deduplicated corpus,
    * reported as (split1, split2, n_leaky_pairs, avg_jaccard).
    *
    * Scale shape: the expensive stage is [[TextDedup.jaccardPairs]]
    * (prefix-filtered inverted index — no all-pairs); the split labels
    * are then derived directly from the pair's ids (`split` is a pure
    * md5 function of the id), so labeling adds ZERO joins and zero
    * shuffles on top of the pair stream — the corpus-sized split frame
    * never materializes into this plan. avg_jaccard sums the 1e-4-grid
    * jaccards as DECIMAL(38,6) (order-independent) per the float laws. */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, threshold: Double): DataFrame = {
    TextDedup.jaccardPairs(docs, idCol, textCol, k, threshold)
      .withColumn("_s1", splitLabel(col("doc1")))
      .withColumn("_s2", splitLabel(col("doc2")))
      .filter(col("_s1") =!= col("_s2"))
      .groupBy(least(col("_s1"), col("_s2")).as("split1"),
        greatest(col("_s1"), col("_s2")).as("split2"))
      .agg(count(lit(1)).as("n_leaky_pairs"),
        Num.davg(col("jaccard"), 4).as("avg_jaccard"))
  }

  /** Source lexical-similarity matrix: vocabulary Jaccard for every
    * source pair — |V_a ∩ V_b| / |V_a ∪ V_b| over distinct whitespace
    * terms — the "how close are these domains" report that drives
    * mixture and curriculum decisions.
    *
    * Scale shape: distinct (source, term) pairs come from the per-row
    * [[TextExpressions.termCounts]] kernel (a document's repeats
    * collapse before any shuffle), and the term equi-join's group for
    * one term is bounded by the SOURCE COUNT — a hot term appears in
    * every source, producing #sources rows, never a corpus-sized group.
    * Output is one row per source pair sharing at least one term. The
    * (source, term) frame is cached: the size aggregate and both join
    * sides read it.
    *
    * That per-term bound is the right one for source-level strata (tens
    * to hundreds of values) but the OUTPUT matrix itself is quadratic in
    * the stratum count: a domain-granular column (10⁵-10⁶ strata) makes
    * the pairwise matrix — not any one join group — the explosion.
    * `maxSources` fails fast past the bound (one cheap distinct-count
    * job at construction time, per the module CACHE CONTRACT) with the
    * error naming the scale alternative; raise it deliberately if a
    * quadratic-in-strata matrix is truly intended. */
  def sourceSimilarity(docs: DataFrame, textCol: String,
                       sourceCol: String, maxSources: Long = 1000L): DataFrame = {
    val v = Par.spread(docs).select(col(sourceCol).as("source"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("source"), col("tc.term").as("_term"))
      .distinct()
      .cache()
    Guards.requireSmall(v.select(col("source")).distinct(), maxSources,
      "sourceSimilarity's pairwise stratum matrix (quadratic in #strata)",
      "TextAnalysis.sourceNeighbors (LSH-banded, linear in strata), or " +
        "a coarser stratum column")
    val sizes = v.groupBy(col("source")).agg(count(lit(1)).as("_n"))
    v.as("a").join(v.as("b"),
        col("a._term") === col("b._term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source1"), col("b.source").as("source2"))
      .agg(count(lit(1)).as("n_shared_terms"))
      .join(broadcast(sizes.select(col("source").as("source1"),
        col("_n").as("_n1"))), Seq("source1"))
      .join(broadcast(sizes.select(col("source").as("source2"),
        col("_n").as("_n2"))), Seq("source2"))
      .select(col("source1"), col("source2"), col("n_shared_terms"),
        Num.fpRound(col("n_shared_terms").cast("double") /
          (col("_n1") + col("_n2") - col("n_shared_terms")).cast("double"), 4)
          .as("vocab_jaccard"))
  }

  /** Source similarity at DOMAIN granularity — the scale path
    * [[sourceSimilarity]]'s guard names: vocabulary-overlapping stratum
    * pairs at jaccard >= `threshold` WITHOUT the quadratic pair matrix.
    *
    *  1. per-stratum MinHash signatures built by AGGREGATION — numPerms
    *     codegen'd `min(xxhash64(i, term_hash))` aggregates over the
    *     distinct (stratum, term-hash) stream: one output row per
    *     stratum and map-side partial mins, never a buffered vocabulary
    *     (the `collect_set` formulation would hold a 10⁶-term domain's
    *     vocab in one aggregation buffer);
    *  2. LSH banding over the signature (b bands × r rows, the x2
    *     calibration): candidates are strata agreeing on any band —
    *     group size per band key is collision-bounded, so candidate
    *     count is near-linear in #strata for a fixed similarity
    *     structure;
    *  3. exact vocab-jaccard verify on the CANDIDATE pairs only: each
    *     pair's term sets meet through an equi-join keyed on
    *     (candidate, term), so verify cost is Σ|V| over candidate
    *     pairs — the honest cost of the answer, not of the matrix.
    *
    * Banding at the x2 calibration (20×4) has negligible false-negative
    * mass at the threshold (P(miss at j=0.95) ≈ 4e-15), and the exact
    * verify removes every false positive — which is why the x53 SQL
    * plus a threshold filter serves as the oracle, the x2 convention.
    * Output shape matches [[sourceSimilarity]] filtered to >= threshold. */
  def sourceNeighbors(docs: DataFrame, textCol: String, sourceCol: String,
                      threshold: Double, numBands: Int = 20,
                      rowsPerBand: Int = 4): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(numBands >= 1 && rowsPerBand >= 1,
      s"bad banding: $numBands x $rowsPerBand")
    val v = Par.spread(docs).select(col(sourceCol).as("source"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("source"), col("tc.term").as("_term"))
      .distinct()
      .cache() // read by the signature build, both verify sides, sizes
    val withH = v.select(col("source"), xxhash64(col("_term")).as("_h"))
    val numPerms = numBands * rowsPerBand
    val perms = (0 until numPerms).map(i =>
      min(xxhash64(lit(i), col("_h"))).as(s"_p$i"))
    val sig = withH.groupBy(col("source")).agg(perms.head, perms.tail: _*)
    val bands = sig.select(col("source"),
      posexplode(array((0 until numBands).map(b =>
        xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"_p$i")): _*)): _*))
        .as(Seq("band_idx", "band_key")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.source") < col("y.source"))
      .select(col("x.source").as("source1"), col("y.source").as("source2"))
      .distinct()
    val sizes = v.groupBy(col("source")).agg(count(lit(1)).as("_n"))
    val inter = cand
      .join(v.as("a"), col("source1") === col("a.source"))
      .join(v.as("b"),
        col("source2") === col("b.source") && col("a._term") === col("b._term"))
      .groupBy(col("source1"), col("source2"))
      .agg(count(lit(1)).as("n_shared_terms"))
    inter
      .join(sizes.select(col("source").as("source1"), col("_n").as("_n1")),
        Seq("source1"))
      .join(sizes.select(col("source").as("source2"), col("_n").as("_n2")),
        Seq("source2"))
      .select(col("source1"), col("source2"), col("n_shared_terms"),
        Num.fpRound(col("n_shared_terms").cast("double") /
          (col("_n1") + col("_n2") - col("n_shared_terms")).cast("double"), 4)
          .as("vocab_jaccard"))
      .filter(col("vocab_jaccard") >= lit(threshold))
  }

  /** Token-window chunking for training-data preparation: each document
    * becomes ceil((n-size)/stride)+1 overlapping windows of `size` tokens
    * advancing by `stride` (one chunk when n <= size). A pure per-row
    * kernel projection + narrow explode — zero shuffles, and the chunk
    * stream inherits the scan's partitioning, so at 100 TB chunking is
    * free data movement (the downstream tokenize/pack stage reads chunks
    * where the documents already live). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame =
    Par.spread(docs).select(col(idCol).as("doc_id"),
        posexplode(TextExpressions.chunkTokens(col(textCol), size, stride))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"))

  /** Vocabulary construction (tokenizer-training input): the `topK` most
    * frequent corpus terms with occurrence and DISTINCT-document counts.
    * Term frequencies come from the per-row kernel (no shuffle); the
    * per-(doc, term) pre-aggregate makes n_docs count documents — not
    * rows — so a re-ingested document id isn't double-counted; the
    * global top-K plans TakeOrderedAndProject (per-partition partial
    * top-K, single K-row merge — no global sort). Boundary ties break by
    * term, so the selected set is deterministic. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
                 topK: Int): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy(col("doc_id"), col("term"))
      .agg(sum(col("tf")).as("tf"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("n_occurrences"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term"))
      .limit(topK)

  /** Tokenizer-coverage / OOV-rate report: per document, how many token
    * occurrences fall outside the corpus's top-`vocabSize` vocabulary —
    * the coverage metric that sizes a tokenizer's vocab (and flags
    * out-of-domain documents) before training.
    *
    * Scale shape: the vocabulary is the [[vocabulary]] aggregate
    * (kernel tf → TakeOrderedAndProject), whose result is
    * vocabSize-BOUNDED — collecting it to the driver is the same
    * k-bounded collect as IVF centroids, not a corpus collect. The
    * per-document pass is then the [[TextExpressions.stopHits]] kernel
    * with the vocab as its dictionary: one tokenize + O(1) hash probes
    * per token inside whole-stage codegen, zero shuffles (the
    * broadcast-join formulation would shuffle every (doc, term) pair
    * for the same answer). */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val vocab = vocabulary(docs, idCol, textCol, vocabSize)
      .select("term").collect().map(_.getString(0)).toSeq
    val hits = element_at(
      TextExpressions.stopHits(col(textCol), Seq(vocab)), 1)
    Par.spread(docs).select(col(idCol).as("doc_id"),
        size(Text.tokens(col(textCol))).cast("long").as("n_tokens"),
        hits.cast("long").as("_hits"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("_hits")).as("n_oov"),
        when(col("n_tokens") > 0, Num.fpRound(
          (col("n_tokens") - col("_hits")).cast("double") /
            col("n_tokens").cast("double"), 4)).as("oov_rate"))
  }

  /** Repetition quality signals (the Gopher-rule family): top-bigram
    * fraction (occurrences of the most frequent bigram over all bigram
    * occurrences) and duplicate-trigram fraction (occurrences of
    * trigrams seen more than once, over all trigram occurrences) — the
    * standard "drop boilerplate/spam" filters of a pretraining pipeline.
    * One per-row kernel pass ([[TextExpressions.repetitionStats]]), zero
    * shuffles; the fractions are exact long/long double divisions, so
    * they cross engines bit-identically (no rounding needed). Documents
    * too short for an n-gram order get NULL fractions. */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = TextExpressions.repetitionStats(col(textCol))
    Par.spread(docs).select(col(idCol).as("doc_id"), st.as("st"))
      .select(col("doc_id"),
        element_at(col("st"), 1).as("n_bigrams"),
        element_at(col("st"), 2).as("top_bigram_count"),
        element_at(col("st"), 3).as("n_trigrams"),
        element_at(col("st"), 4).as("dup_trigram_count"))
      .withColumn("top_bigram_frac",
        when(col("n_bigrams") > 0, col("top_bigram_count").cast("double") /
          col("n_bigrams").cast("double")))
      .withColumn("dup_trigram_frac",
        when(col("n_trigrams") > 0, col("dup_trigram_count").cast("double") /
          col("n_trigrams").cast("double")))
  }

  /** Deterministic stratified sampling for corpus mixing: keep a
    * per-group percentage of documents, chosen by hash — md5(id) mod 100
    * against the group's rate — so the sample is reproducible across
    * engines, runs and partitionings, and monotone under rate increases
    * (raising a group's rate only ADDS documents). A pure per-row
    * projection plus one broadcast of the tiny rate dim; no RNG, no
    * shuffle. `defaultPct` applies to groups not listed. */
  def stratifiedSample(docs: DataFrame, idCol: String, groupCol: String,
                       pctByGroup: Map[String, Int],
                       defaultPct: Int): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(100L))
    val rate = pctByGroup.foldLeft(lit(defaultPct)) { case (acc, (g, p)) =>
      when(col(groupCol) === g, lit(p)).otherwise(acc)
    }
    // underscore-prefixed working column (the _salt/_r1 convention):
    // withColumn would silently replace a user column named "bucket"
    docs.withColumn("_bucket", bucket)
      .filter(col("_bucket") < rate)
      .drop("_bucket")
  }

  /** Deterministic EXACT-QUOTA mixture sampling: keep exactly
    * min(quota, |stratum|) documents per stratum, chosen as the quota
    * smallest md5(id) hashes — the "rebalance the corpus to a target
    * data mixture" step ([[stratifiedSample]] hits a target *rate*; this
    * hits a target *count*, which is what a token-budgeted mixture spec
    * gives you). Hash order makes the pick reproducible across engines
    * and partitionings, and monotone under quota increases (raising a
    * stratum's quota only ADDS documents — the kept set is always a
    * prefix of the same global hash order).
    *
    * Scale path: per-stratum selection is grouped top-k, which is the
    * skew problem (a hot stratum = one giant sort group), so it runs on
    * [[graft.functions.Skew.saltedTopK]] — a salted partial top-k per
    * (stratum, salt) shard first, then the exact rank over the
    * numSalts·k survivors. No stratum ever sorts more than its shard. */
  def quotaSample(docs: DataFrame, idCol: String, stratumCol: String,
                  quotaByStratum: Map[String, Int],
                  defaultQuota: Int): DataFrame = {
    val maxK = (quotaByStratum.values.toSeq :+ defaultQuota).max
    // negated: saltedTopK ranks descending; the pick is ASCENDING hash
    val negHash = -conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long")
    val quota = quotaByStratum.foldLeft(lit(defaultQuota)) {
      case (acc, (g, q)) => when(col(stratumCol) === g, lit(q)).otherwise(acc)
    }
    Skew.saltedTopK(docs.withColumn("_neg_hk", negHash),
        Seq(stratumCol), "_neg_hk", maxK, tieCols = Seq(idCol))
      .filter(col("rank") <= quota)
      .drop("_neg_hk")
  }

  /** TOKEN-WEIGHTED SAMPLE (x201) — deterministic weighted sampling
    * WITHOUT replacement (Efraimidis & Spirakis 2006, algorithm
    * A-ES): each document draws the key `ln(u) / w` with
    * `u ∈ (0, 1]` derived from md5(id) (the x26 no-RNG law) and
    * weight `w = n_tokens + 1`, and the k LARGEST keys are the
    * sample — provably equivalent to sequential weighted draws
    * without replacement. Weighting by token count makes document
    * sampling approximate UNIFORM TOKEN sampling — the right grain
    * for token-budgeted corpus work ([[quotaSample]] buys exact
    * per-stratum COUNTS; this buys proportional-to-size inclusion),
    * while hash-derived `u` keeps re-runs and engines bit-identical
    * where an RNG never is.
    *
    * Exactness: `u = (h + 1) / 2^60` and `ln(u) / w` are mirrored
    * IEEE expressions of exact integers — both engines order the
    * very same doubles (ties, measure-zero in theory, break by id);
    * the reported key is grid-9 rounded AFTER selection.
    *
    * Scale shape: key computation is scan-side per-row kernels
    * (md5 + ln); the global top-k is [[Skew.saltedTopK]] — no
    * single-task global sort at any corpus size. */
  def weightedSample(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long")
    val w = (size(Text.tokens(col(textCol))) + lit(1)).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(1152921504606846976.0)
    val key = log(u) / w.cast("double")
    Skew.saltedTopK(
        docs.select(col(idCol), w.as("n_tokens_w"), key.as("_key")),
        Seq.empty, "_key", k, tieCols = Seq(idCol))
      .select(col(idCol), col("n_tokens_w"),
        col("rank").cast("long").as("rank"),
        Num.fpRound(col("_key"), 9).as("key"))
  }

  /** STRATIFIED TRAIN/VAL/TEST SPLIT (x180) — assign every document a
    * split label, deterministically and with EXACT per-stratum
    * proportions: within each stratum, rank by the md5 hash of the id
    * (the x26/x45 no-RNG law — re-runs and engines agree bit-for-bit)
    * and cut at `ceil(cum·n)` per cumulative boundary (the double-ceil
    * law, same as [[groupedQuantiles]]). `splits` carries CUMULATIVE
    * upper boundaries (e.g. train→0.8, val→0.9, test→1.0) — passing
    * cumulative values avoids re-summing fractions in IEEE doubles
    * (0.8 + 0.1 ≠ 0.9 exactly), so the Spark cut and any SQL mirror
    * use the very same literals.
    *
    * Output: `(id, stratum, rank, n_group, split)` — the manifest a
    * training pipeline joins back to shard its corpus.
    *
    * Scale shape: [[groupedRanks]]' bucketed-rank core — per-stratum
    * EXACT ranks with no per-stratum sort — then a row-local label
    * expression. One exchange pair, hash ranks never leave the scan
    * stage. */
  def stratifiedSplit(docs: DataFrame, idCol: String, stratumCol: String,
                      splits: Seq[(String, Double)] =
                        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0),
                      bucketBits: Int = 8): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.map(_._2) == splits.map(_._2).sorted,
      s"split boundaries must be cumulative (ascending), got $splits")
    require(math.abs(splits.last._2 - 1.0) < 1e-12,
      s"last cumulative boundary must be 1.0, got ${splits.last._2}")
    val hk = conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long")
    val ranked = groupedRanks(
      docs.select(col(idCol), col(stratumCol)).withColumn("_hk", hk),
      idCol, stratumCol, "_hk", bucketBits, bestFirst = false)
    val label = splits.init.foldRight(lit(splits.last._1): Column) {
      case ((lbl, cum), rest) =>
        when(col("rank") <=
          ceil(col("n_group") * lit(cum)).cast("long"), lbl)
          .otherwise(rest)
    }
    ranked.select(col(idCol), col(stratumCol), col("rank"),
      col("n_group"), label.as("split"))
  }

  /** [[quotaSample]] with DATA-DRIVEN quotas: `quotas` is a
    * (stratum, quota) frame — typically the output of
    * [[temperatureQuotas]] — instead of a driver-side Map, so the
    * stratum universe can itself be corpus-derived (domains, not a
    * hand-written source list). Same salted top-k engine and the same
    * determinism/monotonicity guarantees. The one eager step is a 1-row
    * aggregate for the global max quota (saltedTopK's k) — bounded by
    * definition. Strata absent from `quotas` are dropped (inner join):
    * an unlisted source has no budget in the mixture. */
  def quotaSampleBy(docs: DataFrame, idCol: String, stratumCol: String,
                    quotas: DataFrame): DataFrame = {
    val maxK = quotas.agg(max(col("quota")).cast("long")).head().getLong(0)
    require(maxK <= Int.MaxValue, s"max quota $maxK exceeds Int range")
    val negHash = -conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long")
    Skew.saltedTopK(docs.withColumn("_neg_hk", negHash),
        Seq(stratumCol), "_neg_hk", maxK.toInt, tieCols = Seq(idCol))
      .join(broadcast(quotas), stratumCol)
      .filter(col("rank") <= col("quota"))
      .drop("_neg_hk", "quota")
  }

  /** Temperature-based mixture quotas: per-source document budgets
    * proportional to (source token count)^alpha — the standard
    * "temperature" reweighting that upsamples small/rare sources
    * relative to their natural share (alpha=1 is natural sampling,
    * alpha=0 is uniform; pretraining mixtures typically use
    * alpha in [0.3, 0.7]). Returns (group, quota) with
    * quota = max(1, floor(totalDocs · w_g / Σ w_g)), w_g = tok_g^alpha —
    * every source keeps at least one document, and Σ quota <= totalDocs
    * + #groups (floor slack).
    *
    * Cross-engine float laws (the x25/x5 discipline): pow is not
    * correctly-rounded IEEE, so w_g is pre-rounded to the 1e-4 grid;
    * the grid points are summed as exact DECIMAL(38,6) (order-
    * independent under any partitioning); the remaining ratio/floor
    * arithmetic is correctly-rounded IEEE ops on identical inputs,
    * hence engine-stable. Token totals are exact long sums. */
  def temperatureQuotas(docs: DataFrame, idCol: String, textCol: String,
                        groupCol: String, alpha: Double,
                        totalDocs: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    require(totalDocs > 0, s"totalDocs must be positive, got $totalDocs")
    val toks = Par.spread(docs).select(col(groupCol),
      size(split(lower(trim(col(textCol))), "\\s+")).cast("long").as("_n"))
    // Σ w over a global window on the GROUP-BOUNDED quota frame (one row
    // per source — a single-task frame by construction, like x46's
    // bucket totals), avoiding a self-referential crossJoin
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // "_wsum", not "_W": Spark resolves column names case-insensitively
    // by default, so a "_W" would silently REPLACE "_w" in withColumn
    toks.groupBy(col(groupCol))
      .agg(sum(col("_n")).as("_tok"))
      .withColumn("_w", Num.fpRound(pow(col("_tok").cast("double"), alpha), 4))
      .withColumn("_wsum",
        sum(col("_w").cast("decimal(38,6)")).over(wAll).cast("double"))
      .withColumn("quota", greatest(lit(1L),
        floor(col("_w") / col("_wsum") * lit(totalDocs.toDouble)).cast("long")))
      .select(col(groupCol), col("quota"))
  }

  /** Temperature-based mixture sampling: [[temperatureQuotas]] feeding
    * [[quotaSampleBy]] — rebalance the corpus to ~`totalDocs` documents
    * with per-source shares ∝ tokens^alpha, picked deterministically by
    * md5 rank. The whole pipeline is two shuffles of (group, long)
    * pairs plus the salted top-k; document text never moves. */
  def temperatureSample(docs: DataFrame, idCol: String, textCol: String,
                        groupCol: String, alpha: Double,
                        totalDocs: Long): DataFrame =
    quotaSampleBy(docs,
      idCol, groupCol,
      temperatureQuotas(docs, idCol, textCol, groupCol, alpha, totalDocs))

  /** Per-source token-budget cap: keep each source's documents — in the
    * deterministic md5-hash order — while the source's RUNNING token
    * total stays within its budget (the "fill each mixture slot up to
    * its token budget" step; [[quotaSample]] budgets documents, this
    * budgets TOKENS, which is what a pretraining mixture spec
    * actually allocates). Emits (doc_id, group, n_tokens, cum_tokens)
    * for the kept prefix of each source, cum_tokens inclusive.
    *
    * Scale path: the running total comes from
    * [[Packing.groupedOffsets]] — the grouped two-phase distributed
    * prefix sum — so a hot source is spread over 2^bucketBits
    * parallel bucket runs instead of sorting in one task, and only
    * (id, n_tokens) pairs ever shuffle. */
  def tokenBudgetMix(docs: DataFrame, idCol: String, textCol: String,
                     groupCol: String, budgetByGroup: Map[String, Long],
                     defaultBudget: Long): DataFrame = {
    require(defaultBudget >= 0 && budgetByGroup.values.forall(_ >= 0),
      "budgets must be non-negative")
    val budget = budgetByGroup.foldLeft(lit(defaultBudget)) {
      case (acc, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    Packing.groupedOffsets(docs, idCol, textCol, groupCol)
      .withColumn("cum_tokens", col("start_offset") + col("n_tokens"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col(groupCol), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Deterministic epoch upsampling: emit each document `floor(w)` or
    * `ceil(w)` times for its source's weight w, the fractional part
    * admitted by md5 hash — the "repeat rare high-quality sources for
    * multiple epochs" step of mixture construction (w=2.25 ⇒ every doc
    * appears twice, a deterministic 25% of docs a third time; w<1
    * downsamples). Output (doc_id, group, epoch), epoch in
    * [0, copies): stable across engines, runs, and partitionings —
    * no RNG, and a doc's copies only grow as w grows (monotone).
    *
    * Scan-side narrow op: the weight is a literal when-chain, the
    * repeat an explode of a per-row sequence — zero shuffles, which is
    * the only acceptable cost for an operator whose OUTPUT is larger
    * than its input. */
  def epochRepeat(docs: DataFrame, idCol: String, groupCol: String,
                  weightByGroup: Map[String, Double],
                  defaultWeight: Double = 1.0): DataFrame = {
    require(defaultWeight >= 0 && weightByGroup.values.forall(_ >= 0),
      "weights must be non-negative")
    require(defaultWeight <= 100 && weightByGroup.values.forall(_ <= 100),
      "weights above 100 epochs are almost certainly a bug")
    // fractional admission compares 15-hex-char md5 prefixes as STRINGS
    // (fixed-length lowercase hex: lexicographic == numeric), so the
    // same literal threshold works verbatim in any SQL engine
    def hexThreshold(w: Double): String =
      f"${math.min(math.max(w - math.floor(w), 0.0) * math.pow(16, 15), math.pow(16, 15) - 1).toLong}%015x"
    val hex15 = substring(md5(col(idCol).cast("string")), 1, 15)
    def copiesFor(w: Double): Column =
      lit(math.floor(w).toLong) +
        when(hex15 < lit(hexThreshold(w)), lit(1L)).otherwise(lit(0L))
    val copies = weightByGroup.foldLeft(copiesFor(defaultWeight)) {
      case (acc, (g, w)) => when(col(groupCol) === g, copiesFor(w))
        .otherwise(acc)
    }
    docs.select(col(idCol).as("doc_id"), col(groupCol), copies.as("_copies"))
      .filter(col("_copies") > 0)
      .select(col("doc_id"), col(groupCol),
        explode(sequence(lit(0L), col("_copies") - 1)).as("epoch"))
  }

  /** Benchmark decontamination: count each corpus document's k-shingle
    * overlap with a (small) benchmark/eval set and flag documents at or
    * above `threshold` — the standard "remove eval-set leakage before
    * training" step. The benchmark's distinct shingle hashes are a
    * benchmark-sized table (broadcast by the planner); corpus shingles
    * are per-row kernel output, so only matching (doc, shingle) rows
    * ever reach the counting aggregate — the corpus text never shuffles. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, k: Int, threshold: Int): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextExpressions.shingleHashSet(col(textCol), k)).as("h"))
      .distinct()
    val overlaps = Par.spread(corpus)
      .select(col(idCol).as("doc_id"),
        explode(TextExpressions.shingleHashSet(col(textCol), k)).as("h"))
      .join(benchShingles, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol).as("doc_id"))
      .join(overlaps, Seq("doc_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated",
        (col("n_overlap") >= threshold).cast("int"))
  }

  /** The serialized Bloom sketch of a benchmark's distinct k-shingle
    * hashes — the shareable artifact behind [[decontaminateBloom]] and
    * the streaming [[graft.streaming.Streams.decontaminationGate]]:
    * build once per benchmark release, reuse across batch runs and
    * stream restarts. Driver-held but benchmark-bounded (MB-scale). */
  def benchmarkSketch(benchmark: DataFrame, textCol: String,
                      k: Int): Array[Byte] = {
    val benchShingles = benchmark
      .select(explode(TextExpressions.shingleHashSet(col(textCol), k)).as("h"))
      .distinct()
      .cache()
    try {
      val nItems = math.max(benchShingles.count(), 1L)
      benchShingles
        .agg(TextExpressions.bloomAgg(col("h"), nItems).as("bf"))
        .head().getAs[Array[Byte]](0)
    } finally benchShingles.unpersist()
  }

  /** Bloom-prefiltered benchmark decontamination — [[decontaminate]]'s
    * 100 TB path, same EXACT result. [[decontaminate]] joins every
    * corpus (doc, shingle) row against the benchmark set; at real scale
    * the corpus side of that join is corpus-sized even though ~all rows
    * miss. Here the [[benchmarkSketch]] Bloom filter (built distributed
    * by Spark's own BloomFilterAggregate — the runtime-join-filter
    * machinery — then held as an MB-scale literal) prefilters the
    * exploded corpus shingles as a codegen'd scan-side predicate, so only
    * true overlaps plus the fpp tail ever enter the join. The exact
    * verify join then removes Bloom false positives: output is
    * bit-identical to [[decontaminate]] (false negatives are impossible),
    * which is why one oracle serves both. The benchmark's shingle set is
    * computed twice (sketch build + verify join) — benchmark-bounded and
    * cheaper than pinning a cached copy for the session lifetime. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, k: Int,
                         threshold: Int): DataFrame =
    decontaminateBloom(corpus, benchmark, idCol, textCol, k, threshold,
      benchmarkSketch(benchmark, textCol, k))

  /** [[decontaminateBloom]] with a PREBUILT [[benchmarkSketch]] — the
    * shared-artifact form: build the sketch once per benchmark release,
    * then reuse the same bytes across batch runs and the streaming
    * [[graft.streaming.Streams.decontaminationGate]] instead of
    * re-aggregating the benchmark per call. The exact verify join still
    * reads `benchmark` directly, so a stale sketch can only over-admit
    * into the join (false negatives remain impossible as long as the
    * sketch covers the benchmark's current shingles). */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, k: Int,
                         threshold: Int, bloomBytes: Array[Byte]): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextExpressions.shingleHashSet(col(textCol), k)).as("h"))
      .distinct()
    val overlaps = Par.spread(corpus)
      .select(col(idCol).as("doc_id"),
        explode(TextExpressions.shingleHashSet(col(textCol), k)).as("h"))
      .filter(TextExpressions.bloomMightContain(bloomBytes, col("h")))
      .join(benchShingles, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol).as("doc_id"))
      .join(overlaps, Seq("doc_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated",
        (col("n_overlap") >= threshold).cast("int"))
  }

  /** Token-entropy quality signal (lexical-diversity / perplexity
    * proxy): H = -Σ p·ln(p) over the document's term distribution, in
    * nats. Three cross-engine float laws compose here: ln is pre-rounded
    * at 1e-4 (ln is not correctly-rounded IEEE — the x25 law); each
    * term's p·ln̂(p) contribution is ALSO rounded to the 1e-4 grid
    * before the decimal cast (a double→DECIMAL(38,6) cast is only
    * engine-stable when the value's exact decimal form has <= 6 digits —
    * grid points, not near-ties; measured 7/5000 docs flip otherwise);
    * and the grid-point contributions are summed as exact DECIMAL(38,6)
    * (double sums are order-dependent and shuffle order is not — the x5
    * law). Result: bit-stable across engines and partitionings, with
    * |error| <= 5e-5·n_terms — noise for a quality signal. Term
    * frequencies come from the per-row kernel (no token shuffle). */
  def tokenEntropy(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val n = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_terms"))
    tf.join(n, "doc_id")
      .withColumn("p",
        col("tf").cast("double") / col("n_tokens").cast("double"))
      .withColumn("contrib",
        Num.fpRound(col("p") * Num.fpRound(log(col("p")), 4), 4))
      .groupBy(col("doc_id"), col("n_tokens"), col("n_terms"))
      .agg(Num.fpRound(-Num.dsum(col("contrib")), 4).as("entropy"))
      .select(col("doc_id"), col("n_tokens"), col("n_terms"), col("entropy"))
  }

  /** Multi-signal quality decision (x43): the x12 quality score, the x35
    * top-bigram fraction and the x41 token entropy joined into one
    * keep/drop table with the FIRST failing reason — the human-auditable
    * form of a filter pipeline's gate ("why did this doc get dropped").
    * All three signals are per-row kernels or high-reduction aggregates;
    * the joins are id-equi (co-located once the corpus is bucketed by
    * id). Every threshold compares engine-stable values (fpRound grid
    * points / exact divisions), so the decision is bit-reproducible. */
  def qualityReport(docs: DataFrame, idCol: String, textCol: String,
                    minQuality: Double, maxTopBigramFrac: Double,
                    minEntropy: Double): DataFrame = {
    val q = qualityScore(docs, idCol, textCol)
      .select(col("doc_id"), col("quality_score"))
    val r = repetition(docs, idCol, textCol)
      .select(col("doc_id"), col("top_bigram_frac"))
    val e = tokenEntropy(docs, idCol, textCol)
      .select(col("doc_id"), col("entropy"))
    q.join(r, "doc_id").join(e, "doc_id")
      .withColumn("reason",
        when(col("quality_score") < minQuality, lit("low_quality"))
          .when(col("top_bigram_frac").isNotNull &&
            col("top_bigram_frac") > maxTopBigramFrac, lit("repetitive"))
          .when(col("entropy") < minEntropy, lit("low_entropy"))
          .otherwise(lit("keep")))
      .withColumn("keep", (col("reason") === "keep").cast("int"))
  }

  /** Corpus-level stats per language (SURVEY §2.4 X4): doc counts, exact
    * char totals, mean token counts. */
  def statsByLang(docs: DataFrame, textCol: String): DataFrame =
    Par.spread(docs).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        Num.fpRound(sum(size(Text.tokens(col(textCol)))).cast("double") /
          count(lit(1)), 4).as("avg_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Tokenizer-training prep: corpus-wide adjacent token-pair (bigram)
    * frequencies — the statistic a BPE/unigram trainer's first merge
    * iteration ranks ("which adjacent pair is most frequent"), plus the
    * pair's document frequency (merges that concentrate in one document
    * are usually noise, so a trainer wants both counts).
    *
    * Scale shape: the pair stream is a narrow per-row explode (no text
    * shuffle — only the pair strings move), the count is ONE hash
    * aggregate with map-side partial combining, and the top-K cut plans
    * as TakeOrderedAndProject (per-partition top-k, k-row driver merge —
    * never a global sort). The distinct-doc count rides Spark's standard
    * two-phase count-distinct expansion over the same aggregate keys.
    * Ties at the K boundary are cut deterministically by pair text. */
  def bigramCounts(docs: DataFrame, idCol: String, textCol: String,
                   topK: Int): DataFrame = {
    require(topK >= 1 && topK <= 100000,
      s"topK must be in [1, 100000], got $topK (the result is collected " +
        "to one node by design — a merge table is vocabulary-sized)")
    val toks = Text.tokens(col(textCol))
    val pairs = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - lit(2)),
        i => concat(element_at(toks, i + 1), lit(" "),
          element_at(toks, i + 2)))).otherwise(array())
    Par.spread(docs)
      .select(col(idCol).as("doc_id"), explode(pairs).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(topK)
  }

  /** PMI COLLOCATION mining (x150) — the top-`topK` adjacent-token
    * pairs by pointwise mutual information,
    * `ln(p(w1,w2) / (p(w1)·p(w2)))` = ln(cb·N² / (B·cu1·cu2)) — the
    * classic collocation detector (Church & Hanks '90): high-PMI pairs
    * are multiword units ("los angeles"), low-PMI pairs are chance
    * adjacency; `minCount` (cb ≥) is the standard guard against the
    * hapax-pair explosion (a pair seen once between two rare words
    * maxes PMI by construction — noise, not signal).
    *
    * Numeric law: counts are exact longs; PMI is ONE mirrored double
    * expression (left-assoc products, one divide, ln on the 1e-4 grid
    * — the x25/x33 ln-parity convention); ties (pmi, w1, w2).
    *
    * Scale shape: the minCount filter prunes the pair table BEFORE the
    * two unigram joins (both sides vocabulary-bounded); totals are
    * 1-row broadcasts; top-K plans TakeOrderedAndProject. Tokens
    * leave their scan only as (pair/term, count) rows. */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1 && topK <= 100000,
      s"topK must be in [1, 100000], got $topK")
    val toks = Text.tokens(col(textCol))
    val pairs = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - lit(2)),
        i => struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2")))).otherwise(array())
    val p = Par.spread(docs).select(explode(pairs).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val bi = p.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val uni = Par.spread(docs)
      .select(explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("tc.term").as("w"), col("tc.tf").cast("long").as("tf"))
      .groupBy(col("w")).agg(sum(col("tf")).as("cu"))
    val tot = uni.agg(sum(col("cu")).as("n_tokens"))
    val nb = bi.agg(sum(col("n_pair")).as("n_bigrams"))
    bi.filter(col("n_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("cu").as("n_w1")),
        Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("n_w2")),
        Seq("w2"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(nb))
      .withColumn("pmi", Num.fpRound(log(
        (col("n_pair").cast("double") * col("n_tokens") *
          col("n_tokens")) /
        (col("n_bigrams").cast("double") * col("n_w1") * col("n_w2"))),
        4))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"),
        col("n_w2"), col("pmi"))
  }

  /** VOCABULARY COVERAGE CURVE (x151) — for each rank r ≤ topK of the
    * frequency-ranked vocabulary, the cumulative share of all token
    * occurrences the top-r terms cover — the tokenizer-sizing data
    * card ([[oovRate]] gives ONE point of this curve per document;
    * this is the whole corpus-level curve the vocab-size knob is read
    * off). Complements [[zipfAudit]] (which fits the distribution's
    * slope; this integrates it).
    *
    * Scale shape: the term aggregate is [[vocabulary]]'s; top-K plans
    * TakeOrderedAndProject, and the running sum is a K-BOUNDED
    * single-partition window (the x55 convention — K is a knob, not
    * the corpus); the denominator is a 1-row broadcast counting ALL
    * occurrences, including those outside the top-K cut. */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1 && topK <= 100000,
      s"topK must be in [1, 100000], got $topK")
    val tf = Par.spread(docs)
      .select(explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("tc.term").as("term"), col("tc.tf").cast("long").as("tf"))
      .groupBy(col("term")).agg(sum(col("tf")).as("n_occurrences"))
    val tot = tf.agg(sum(col("n_occurrences")).as("n_total"))
    val w = Window.orderBy(col("n_occurrences").desc, col("term"))
    tf.orderBy(col("n_occurrences").desc, col("term")).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_occurrences", sum(col("n_occurrences")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("term"), col("n_occurrences"),
        col("cum_occurrences"),
        Num.fpRound(col("cum_occurrences").cast("double") /
          col("n_total").cast("double"), 6).as("coverage"))
  }

  /** Bigram language-model quality score (the KenLM-perplexity signal
    * of the CCNet pipeline, add-one smoothed): each document is scored
    * by the mean log-probability of its adjacent token pairs under the
    * corpus's own bigram model,
    * `ln((c(w1,w2) + 1) / (c(w1) + V))` — low scores flag documents
    * whose token transitions are unlike the corpus (gibberish,
    * boilerplate soup), the standard LM-based quality filter.
    *
    * Plan shape / 100 TB design: three hash aggregates over the pair
    * stream (per-doc-pair multiplicities, corpus bigram counts, corpus
    * unigram counts — all map-side combined, all vocabulary-bounded
    * outputs), then the DISTINCT per-doc pair stream (not the token
    * stream — multiplicities were folded first, so a repeated pair
    * crosses the wire once per document) equi-joins the two count
    * tables and folds per document. V rides a 1-row broadcast
    * (cross-join of an aggregate, the x51 totals idiom). Nothing
    * driver-side; no UDFs.
    *
    * Cross-engine determinism: ln() is not correctly-rounded and JVM vs
    * DuckDB may disagree by an ulp, so each pair's log-probability is
    * pre-rounded on the 1e-4 grid BEFORE the multiplicity multiply
    * (the x25/x33 convention); the weighted mean is an exact
    * DECIMAL(38,6) sum over deterministic addends ([[Num.davg]] recipe).
    * Documents with fewer than two tokens have no bigrams and are
    * absent from the output. */
  def bigramLmScores(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val pairs = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - lit(2)),
        i => struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2")))).otherwise(array())
    val p = Par.spread(docs)
      .select(col(idCol).as("doc_id"), explode(pairs).as("pr"))
      .select(col("doc_id"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val docPairs = p.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    val bi = p.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val uni = Par.spread(docs)
      .select(explode(Text.tokens(col(textCol))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val lp = Num.fpRound(
      log((col("cb") + lit(1)).cast("double") /
        (col("cu") + col("v")).cast("double")), 4)
    docPairs.join(bi, Seq("w1", "w2")).join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("_add", (col("m") * lp).cast("decimal(38,6)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        Num.fpRound(sum(col("_add")).cast("double") / sum(col("m")), 4)
          .as("avg_logprob"))
  }

  /** DATA SELECTION VIA IMPORTANCE RESAMPLING — the DSIR recipe (Xie
    * et al. 2023, arXiv:2302.03169) on hashed bigram features: every
    * document is scored by how much more likely its n-grams are under
    * a TARGET distribution (the `isTarget` slice — e.g. the
    * high-quality or in-domain subset) than under the raw corpus, and
    * the top-`topN` are selected. The paper's feature space is kept
    * exactly — word bigrams hashed into `numBuckets` buckets (this
    * repo's md5-fold law, so a SQL oracle recomputes the buckets
    * bit-for-bit) with add-one smoothing on both distributions; the
    * importance weight of bucket b is
    * `ln( (p_b+1)(Q+B) / ((q_b+1)(P+B)) )` (p/q = target/raw
    * occurrence counts, P/Q their totals), pre-rounded at 1e-4 per
    * bucket (the x25/x86 transcendental-rounding law) so document
    * scores are exact integer sums of bucket weights. Documents with
    * no bigrams score 0 (vacuously neutral), ranked by (score DESC,
    * id) — fully deterministic.
    *
    * 100 TB shape: two gram-occurrence passes (one aggregation each,
    * keyed by the B-bounded bucket id), a B-row weight table joined
    * back broadcast-sized, and a TakeOrdered top-N — no global sort
    * materializes the corpus, no driver-side loop; the only collects
    * are the 1-row totals. */
  /** The DSIR feature stream: one `(doc_id, tgt, b)` row per bigram
    * OCCURRENCE, bucketed by the md5-fold law — shared by the one-shot
    * selection, the index writer and the indexed scorer so all three
    * agree bit-for-bit. */
  private def dsirGrams(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, numBuckets: Int): DataFrame =
    Par.spread(docs).select(col(idCol).cast("long").as("doc_id"),
        isTarget.as("tgt"),
        explode(Text.shingles(col(textCol), 2)).as("g"))
      .select(col("doc_id"), col("tgt"),
        pmod(conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"),
          lit(numBuckets.toLong)).as("b"))

  /** The per-bucket DSIR weight in 1e-4 units over a `(b, q_n, p_n)`
    * counts frame carrying `(qt, pt)` totals: smoothed log likelihood
    * ratio, rounded BEFORE any per-document sum so scores are
    * integer-exact. */
  private def dsirWeight(numBuckets: Int): Column = {
    val bD = lit(numBuckets.toDouble)
    floor(log(((col("p_n") + lit(1.0)) * (col("qt") + bD))
        / ((col("q_n") + lit(1.0)) * (col("pt") + bD)))
      * lit(10000) + lit(0.5)).cast("long")
  }

  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, numBuckets: Int = 256,
                 topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numBuckets > 0, s"numBuckets must be > 0, got $numBuckets")
    require(topN > 0, s"topN must be > 0, got $topN")
    val spread = Par.spread(docs)
    val grams = dsirGrams(docs, idCol, textCol, isTarget, numBuckets)
    // ONE pass learns both distributions (raw + target counts per
    // bucket in the same aggregation) — DSIR's two-pass reality: one
    // gram pass to fit the weights, one to score the documents
    val qp = grams.groupBy(col("b")).agg(count(lit(1)).as("q_n"),
      coalesce(sum(when(col("tgt"), lit(1L))), lit(0L)).as("p_n"))
    val tot = qp.agg(sum(col("q_n")).as("qt"), sum(col("p_n")).as("pt"))
    val bw = qp.crossJoin(broadcast(tot))
      .select(col("b"), dsirWeight(numBuckets).as("w"))
    val ds = grams.join(broadcast(bw), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("si"))
    val alld = spread.select(col(idCol).cast("long").as("doc_id"))
      .join(ds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("si"), lit(0L)).as("si"))
    // TakeOrdered to the N survivors, then rank the tiny frame
    alld.orderBy(col("si").desc, col("doc_id")).limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("si").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("n_grams"),
        (col("si").cast("double") / lit(10000.0)).as("score"),
        col("rank"))
  }

  /** Persist the DSIR weight table — [[dsirSelect]]'s train/serve
    * split (the x119 batch-frozen-threshold pattern applied to data
    * selection): the corpus pays its gram pass ONCE, and every later
    * batch scores against the frozen `(b, w)` table. The table is
    * COMPLETE over all `numBuckets` buckets — a bucket unseen in the
    * corpus still gets its smoothed weight `ln((Q+B)/(P+B))` (the
    * q_n = p_n = 0 case of the same formula), so serving is a pure
    * join with no default-weight special case and new-batch grams the
    * corpus never saw score lawfully. B rows, one file. */
  def writeDsirIndex(corpus: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, numBuckets: Int,
                     table: String): Unit = {
    require(numBuckets > 0, s"numBuckets must be > 0, got $numBuckets")
    val spark = corpus.sparkSession
    val grams = dsirGrams(corpus, idCol, textCol, isTarget, numBuckets)
    val qp = grams.groupBy(col("b")).agg(count(lit(1)).as("q_n"),
      coalesce(sum(when(col("tgt"), lit(1L))), lit(0L)).as("p_n"))
    val tot = qp.agg(coalesce(sum(col("q_n")), lit(0L)).as("qt"),
      coalesce(sum(col("p_n")), lit(0L)).as("pt"))
    val full = spark.range(numBuckets).select(col("id").as("b"))
      .join(qp, Seq("b"), "left")
      .select(col("b"), coalesce(col("q_n"), lit(0L)).as("q_n"),
        coalesce(col("p_n"), lit(0L)).as("p_n"))
    full.crossJoin(broadcast(tot))
      .select(col("b"), dsirWeight(numBuckets).as("w"))
      .coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(table)
  }

  /** Score a batch against a frozen [[writeDsirIndex]] table: one gram
    * pass over the BATCH only, one broadcast join of the B-row weight
    * table — the corpus is never touched (x222's serving form; the
    * x220 one-shot recomputes weights every call). Returns one row per
    * batch document `(doc_id, n_grams, score)`; no-bigram documents
    * score a neutral 0. */
  def dsirScoreIndexed(spark: org.apache.spark.sql.SparkSession,
                       batch: DataFrame, idCol: String, textCol: String,
                       weightsTable: String): DataFrame = {
    val wt = spark.table(weightsTable)
    // the writer materializes every bucket 0..B-1, so B = max(b)+1 —
    // and the row count must AGREE with it: a weight table that is not
    // complete over its buckets (partial/crashed write, filtered copy)
    // would silently shift every gram's bucket id and corrupt every
    // score, so an incomplete table fails loudly here instead
    val hdr = wt.agg(max(col("b")), count(lit(1))).head()
    require(!hdr.isNullAt(0), s"$weightsTable is empty")
    val numBuckets = (hdr.getLong(0) + 1).toInt
    require(hdr.getLong(1) == numBuckets.toLong,
      s"$weightsTable is not complete over its buckets: max(b)+1=" +
        s"$numBuckets but ${hdr.getLong(1)} rows — refusing to " +
        "mis-bucket (rebuild via writeDsirIndex)")
    val grams = dsirGrams(batch, idCol, textCol, lit(false), numBuckets)
    val ds = grams.join(broadcast(wt.select(col("b"), col("w"))), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("si"))
    Par.spread(batch).select(col(idCol).cast("long").as("doc_id"))
      .join(ds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        (coalesce(col("si"), lit(0L)).cast("double") / lit(10000.0))
          .as("score"))
  }
}
