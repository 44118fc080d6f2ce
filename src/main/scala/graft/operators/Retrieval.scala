package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.TextExpressions

import graft.functions.{Num, Par, Skew, Text}

/** Sparse lexical retrieval (x98) — BM25 scoring and top-k search over
  * the corpus, the inverted-index complement of the dense-embedding ANN
  * family (`Similarity`): given a bag of query terms, rank documents by
  * Okapi BM25 and return the best k. This is the retrieval shape used
  * both for RAG serving and for targeted corpus curation ("find the
  * training documents most relevant to this probe").
  *
  * Scale shape: the ONLY corpus-sized work is two scan-side kernel
  * passes (corpus length stats; per-doc term counts) — the term-count
  * explode is filtered to the query's terms IN THE SCAN STAGE, so the
  * exchange after it carries at most |query| rows per matching document,
  * never the corpus vocabulary. Document frequencies aggregate over that
  * same filtered stream (a |query|-row table), corpus length stats are a
  * 1-row broadcast, and the final top-k plans as TakeOrderedAndProject
  * (per-partition heaps + one k-row driver merge — no global sort). At
  * 100 TB the length stats and per-term postings come from the
  * persisted corpus-metadata tables a production index maintains
  * ([[graft.sinks.Sinks.writeBucketed]] artifacts, the x80/x91
  * convention): [[writeBm25Index]] builds them in one text scan and
  * [[bm25TopKIndexed]] serves from them with zero text-kernel work —
  * the self-contained [[bm25TopK]] bootstrap form pays the two text
  * scans instead.
  *
  * Numeric law: idf = ln(1 + (N - df + ½)/(df + ½)) is rounded at 1e-4
  * BEFORE use (the x25 libm-divergence shim); the tf normalization
  * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) is pure IEEE-exact-rounded
  * arithmetic on identical inputs, rounded at 1e-4; the per-document sum
  * of per-term contributions runs as an exact DECIMAL sum
  * ([[Num.dsum]]) so the score is independent of term order and
  * partitioning — the same laws the oracle SQL mirrors term by term.
  */
object Retrieval {

  /** BM25 top-k: `(doc_id, n_terms, score)` for the `topK` highest-
    * scoring documents, ties broken by ascending doc id. Documents
    * matching no query term score 0 and are not returned.
    *
    * @param queryTerms bag of query terms (deduplicated; matching is on
    *                   the whitespace-token convention, lowercased)
    * @param k1 term-frequency saturation (Okapi default 1.2)
    * @param b  length-normalization strength (Okapi default 0.75)
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct

    // corpus length statistics: one kernel scan, 1-row broadcast. avgdl
    // = exact long sum / exact count, one IEEE division — bit-identical
    // cross-engine (no float accumulation order anywhere).
    val stats = docs
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col(textCol))).cast("long")).as("sum_dl"))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .select(col("n_docs"), col("avgdl"))

    // (doc, term, tf, dl) for query terms only: the isin filter runs in
    // the scan stage, before any exchange — non-query terms never move.
    val tf = Par.spread(docs)
      .select(col(idCol).as("doc_id"),
        size(Text.tokens(col(textCol))).cast("long").as("dl"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("doc_id"), col("dl"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))
      .filter(col("term").isin(terms: _*))

    scoreTopK(tf, stats, topK, k1, b)
  }

  /** The shared BM25 scoring tail: rank a `(doc_id, dl, term, tf)`
    * postings stream (already restricted to query terms) against a
    * 1-row `(n_docs, avgdl)` stats frame. [[bm25TopK]] (bootstrap text
    * scans) and [[bm25TopKIndexed]] (persisted index scans) both end
    * here, so the scoring LAW — idf/tf-norm rounding, DECIMAL sum,
    * (score desc, doc_id) top-k — cannot diverge between the forms. */
  /** The idf law, shared by every scoring form so it cannot diverge:
    * ln(1 + (N − df + ½)/(df + ½)), rounded at 1e-4 BEFORE use (the
    * x25 libm-divergence shim). Reads `n_docs` and `df` columns. */
  private def idfExpr: Column = Num.fpRound(
    log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))), 4)

  /** The tf-normalization law, shared by every scoring form:
    * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)), pure IEEE-exact ops on
    * identical inputs, rounded at 1e-4. Reads `tf`, `dl`, `avgdl`. */
  private def tfNormExpr(k1: Double, b: Double): Column = Num.fpRound(
    col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") / col("avgdl"))), 4)

  private def scoreTopK(tf: DataFrame, stats: DataFrame, topK: Int,
                        k1: Double, b: Double): DataFrame = {
    // document frequency per query term: aggregates the filtered stream
    // — the result is at most |query| rows, broadcast back.
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    tf.join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", Num.fpRound(idfExpr * tfNormExpr(k1, b), 4))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), Num.dsum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Persist the BM25 corpus-metadata artifact (the x80/x91 index
    * convention): the FULL postings table `(term, doc_id, tf, dl)` —
    * one row per distinct term per document — bucketed BY TERM so a
    * query's `term IN (...)` scan prunes to the query terms' buckets,
    * plus a 1-row `(n_docs, sum_dl)` length-stats table. Built in one
    * corpus text scan; after it, retrieval never touches text again.
    *
    * At 100 TB the postings table is token-stream-sized (the classic
    * inverted-index trade: index ≈ corpus, queries ≈ free); bucket
    * count is sized so a term bucket is a healthy file, and incremental
    * ingest appends per-batch postings files into the same bucket
    * layout ([[graft.sinks.Sinks.writeBucketed]] `append`). */
  def writeBm25Index(corpus: DataFrame, idCol: String, textCol: String,
                     postingsTable: String, statsTable: String,
                     numBuckets: Int = 8): Unit = {
    val post = Par.spread(corpus)
      .select(col(idCol).as("doc_id"),
        size(Text.tokens(col(textCol))).cast("long").as("dl"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("tc.term").as("term"), col("doc_id"),
        col("tc.tf").cast("long").as("tf"), col("dl"))
    graft.sinks.Sinks.writeBucketed(post, postingsTable, Seq("term"),
      numBuckets, sortCols = Seq("term"))
    corpus
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col(textCol))).cast("long")).as("sum_dl"))
      .write.mode("overwrite").format("parquet").saveAsTable(statsTable)
  }

  /** Incremental BM25 index MAINTENANCE: append a new batch's postings
    * into the existing bucket layout (one file per bucket per ingest —
    * [[graft.sinks.Sinks.writeBucketed]] `append`, which validates the
    * bucket spec matches) and fold the batch's length counts into the
    * 1-row stats table. After the append, [[bm25TopKIndexed]] serves
    * the UNION corpus identically to a one-shot rebuild (spec-pinned) —
    * the x74/x75/x80 continuous-ingestion contract on the retrieval
    * side. The stats update is driver-side arithmetic on two 1-row
    * reads — the cheap half; the batch postings scan is the only
    * corpus-class work, and it touches batch text only. */
  def appendBm25Index(spark: org.apache.spark.sql.SparkSession,
                      batch: DataFrame, idCol: String, textCol: String,
                      postingsTable: String, statsTable: String,
                      numBuckets: Int = 8): Unit = {
    val post = Par.spread(batch)
      .select(col(idCol).as("doc_id"),
        size(Text.tokens(col(textCol))).cast("long").as("dl"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("tc.term").as("term"), col("doc_id"),
        col("tc.tf").cast("long").as("tf"), col("dl"))
    graft.sinks.Sinks.writeBucketed(post, postingsTable, Seq("term"),
      numBuckets, sortCols = Seq("term"), append = true)
    // stats: two 1-row reads summed on the driver, then overwrite —
    // reading and overwriting the same table in one plan is illegal,
    // and both sides are single rows anyway
    val old = spark.table(statsTable).head()
    val add = batch
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col(textCol))).cast("long")).as("sum_dl"))
      .head()
    val addDl = if (add.isNullAt(1)) 0L else add.getLong(1)
    // the stored side needs the same guard: writeBm25Index over an
    // empty or all-NULL-text corpus stores sum_dl = NULL (SUM skips
    // nulls), so the first append into a bootstrap-empty index would
    // NPE on a primitive getLong
    val oldDl = if (old.isNullAt(1)) 0L else old.getLong(1)
    import spark.implicits._
    Seq((old.getLong(0) + add.getLong(0), oldDl + addDl))
      .toDF("n_docs", "sum_dl")
      .write.mode("overwrite").format("parquet").saveAsTable(statsTable)
  }

  /** DELETE documents from the BM25 index — the takedown/retention
    * path: the postings rows ARE per-document, so one
    * [[graft.operators.Warehouse.deleteFromIndex]] anti-join rewrite
    * on `doc_id` removes them through the bucket layout (crash-safe
    * swap, file counts back to ≤ buckets), and the 1-row stats table
    * folds the deleted batch's length counts OUT — the exact negation
    * of [[appendBm25Index]]'s driver-side arithmetic, so after the
    * delete [[bm25TopKIndexed]] serves rows bit-identical to a
    * from-scratch rebuild of the reduced corpus (spec-pinned; both
    * n_docs and sum_dl feed the IDF/length normalization, which is
    * why stale stats would skew every score, not just the deleted
    * docs'). PRECONDITIONS: the deleted docs are currently indexed
    * and each is deleted at most once (the [[appendBm25Index]] replay
    * caveat, mirrored). The deleted docs' text is the input — scoring
    * stats must subtract exactly what the original index/append run
    * added for them.
    *
    * PRODUCTION NOTE: this bootstrap form is non-atomic across its two
    * artifacts (postings swap, then a plain stats overwrite) and
    * fenced only by the documented replay precondition.
    * [[deleteFromBm25IndexVersioned]] is the hardened form — staged
    * next-snapshot writes for BOTH tables, single-append commit,
    * applied-batch ledger. Use it anywhere crashes or replays are
    * reachable. */
  def deleteFromBm25Index(spark: org.apache.spark.sql.SparkSession,
                          deleted: DataFrame, idCol: String,
                          textCol: String, postingsTable: String,
                          statsTable: String): Unit = {
    graft.operators.Warehouse.recoverIndex(spark, statsTable)
    graft.operators.Warehouse.deleteFromIndex(spark, postingsTable,
      "doc_id", deleted.select(col(idCol)))
    val old = spark.table(statsTable).head()
    val del = deleted
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col(textCol))).cast("long")).as("sum_dl"))
      .head()
    val oldDl = if (old.isNullAt(1)) 0L else old.getLong(1)
    val delDl = if (del.isNullAt(1)) 0L else del.getLong(1)
    import spark.implicits._
    Seq((old.getLong(0) - del.getLong(0), oldDl - delDl))
      .toDF("n_docs", "sum_dl")
      .write.mode("overwrite").format("parquet").saveAsTable(statsTable)
  }

  /** THE VERSIONED BM25 INDEX PROTOCOL
    * ([[graft.operators.Snapshots]]) — bootstrap build at version 1,
    * commit by ledger append. The family's two artifacts (postings +
    * 1-row stats) always flip TOGETHER: the unversioned
    * [[deleteFromBm25Index]]'s documented hazard is a crash between
    * its postings swap and stats overwrite, which leaves stats
    * including the deleted docs' n_docs/sum_dl — skewing IDF/length
    * normalization for EVERY query with no error — and a retry then
    * double-subtracts. Here both tables stage as the next snapshot and
    * one ledger row commits them atomically. */
  def writeBm25IndexVersioned(spark: org.apache.spark.sql.SparkSession,
                              corpus: DataFrame, idCol: String,
                              textCol: String, ledgerTable: String,
                              indexName: String, postingsBase: String,
                              statsBase: String,
                              numBuckets: Int = 8): Boolean = {
    val bid = "bootstrap"
    if (graft.operators.Snapshots.isApplied(spark, ledgerTable,
        indexName, bid)) false
    else {
      val next = graft.operators.Snapshots.currentVersion(spark,
        ledgerTable, indexName) + 1
      val post = graft.operators.Snapshots.tableAt(postingsBase, next)
      val stats = graft.operators.Snapshots.tableAt(statsBase, next)
      Seq(post, stats).foreach(graft.sinks.Sinks.dropManaged(spark, _))
      writeBm25Index(corpus, idCol, textCol, post, stats, numBuckets)
      graft.operators.Snapshots.publish(spark, ledgerTable, indexName,
        next, bid, "build")
      true
    }
  }

  /** Current-version physical names of a versioned BM25 index —
    * `(postings, stats)`. */
  def resolveBm25Index(spark: org.apache.spark.sql.SparkSession,
                       ledgerTable: String, indexName: String,
                       postingsBase: String, statsBase: String)
      : (String, String) = {
    val Seq(post, stats) = graft.operators.Snapshots.resolve(spark,
      ledgerTable, indexName, Seq(postingsBase, statsBase))
    (post, stats)
  }

  /** [[bm25TopKIndexed]] through the snapshot pointer — the versioned
    * serving read: resolves once per query build, so a publish mid-
    * flight leaves this reader on its complete old snapshot. */
  def bm25TopKIndexedVersioned(spark: org.apache.spark.sql.SparkSession,
                               ledgerTable: String, indexName: String,
                               postingsBase: String, statsBase: String,
                               queryTerms: Seq[String], topK: Int,
                               k1: Double = 1.2,
                               b: Double = 0.75): DataFrame = {
    val (post, stats) = resolveBm25Index(spark, ledgerTable, indexName,
      postingsBase, statsBase)
    bm25TopKIndexed(spark, post, stats, queryTerms, topK, k1, b)
  }

  /** CRASH-ATOMIC, IDEMPOTENT BM25 delete — the versioned form of
    * [[deleteFromBm25Index]]: the surviving postings and the exactly-
    * negated stats stage as the NEXT snapshot (overwrite-idempotent on
    * rerun), one ledger append commits both, and the applied-batch id
    * makes a replay a logged no-op instead of a second stats
    * subtraction. `crashAfterStep` ∈ {postings, stats, publish} is the
    * kill-injection hook for RetrievalSpec's step-boundary spec.
    * Returns false when the batch was already applied. */
  def deleteFromBm25IndexVersioned(
      spark: org.apache.spark.sql.SparkSession, deleted: DataFrame,
      idCol: String, textCol: String, ledgerTable: String,
      indexName: String, postingsBase: String, statsBase: String,
      batchId: Option[String] = None,
      crashAfterStep: Option[String] = None): Boolean = {
    import graft.operators.Snapshots
    def step(s: String): Unit =
      if (crashAfterStep.contains(s))
        throw new IllegalStateException(s"injected crash after step $s")
    val bid = batchId.getOrElse(
      Snapshots.batchIdFor(deleted.select(col(idCol))))
    if (Snapshots.isApplied(spark, ledgerTable, indexName, bid)) {
      // alias guard, the edge-family law
      // ([[graft.operators.Graph.deleteFromEdgeIndexVersioned]]):
      // a recomputed id that hits the ledger while its keys are still
      // served is undecidable (repeat delete vs replay) — raise
      if (batchId.isEmpty) {
        val (postC, _) = resolveBm25Index(spark, ledgerTable, indexName,
          postingsBase, statsBase)
        val present = !spark.table(postC).join(
          deleted.select(col(idCol).as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi").isEmpty
        if (present) throw Snapshots.AliasedBatchId(indexName, bid)
      }
      false
    } else {
      val cur = Snapshots.currentVersion(spark, ledgerTable, indexName)
      val next = cur + 1
      val (postC, statsC) = resolveBm25Index(spark, ledgerTable,
        indexName, postingsBase, statsBase)
      val k = deleted.select(col(idCol).as("_del_key")).distinct()
      val remaining = spark.table(postC)
        .join(k, col("doc_id") === col("_del_key"), "left_anti")
      graft.operators.Warehouse.writeLike(spark, postC, remaining,
        Snapshots.tableAt(postingsBase, next))
      step("postings")
      val old = spark.table(statsC).head()
      val del = deleted
        .agg(count(lit(1)).as("n_docs"),
          sum(size(Text.tokens(col(textCol))).cast("long")).as("sum_dl"))
        .head()
      val oldDl = if (old.isNullAt(1)) 0L else old.getLong(1)
      val delDl = if (del.isNullAt(1)) 0L else del.getLong(1)
      import spark.implicits._
      val statsN = Snapshots.tableAt(statsBase, next)
      graft.sinks.Sinks.dropManaged(spark, statsN)
      Seq((old.getLong(0) - del.getLong(0), oldDl - delDl))
        .toDF("n_docs", "sum_dl")
        .write.format("parquet").saveAsTable(statsN)
      step("stats")
      Snapshots.publish(spark, ledgerTable, indexName, next, bid,
        "delete")
      step("publish")
      true
    }
  }

  /** [[bm25TopK]] through its PERSISTED index — the production serving
    * shape the bootstrap form's Scaladoc promises: zero text-kernel
    * work, zero corpus text scans. The postings scan carries the
    * `term IN (...)` filter on the BUCKETING column (bucket pruning:
    * only the query terms' buckets are read), document frequencies
    * aggregate that pruned stream, and length stats read a 1-row
    * table. Same rows as [[bm25TopK]] by construction — both forms
    * share [[scoreTopK]], and the index stores exactly the frame the
    * bootstrap form computes. */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession,
                      postingsTable: String, statsTable: String,
                      queryTerms: Seq[String], topK: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tf = spark.table(postingsTable)
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    val stats = spark.table(statsTable)
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .select(col("n_docs"), col("avgdl"))
    scoreTopK(tf, stats, topK, k1, b)
  }

  /** PER-QUERY BM25 over the persisted index (x135's lexical leg) —
    * the multi-query serving form retrieval-training workloads need
    * (RAG batch serving, hard-negative mining, contrastive-pair
    * construction): each query row brings its own text, its DISTINCT
    * tokens are that query's term bag, and the result ranks the corpus
    * per query as `(query_id, doc_id, n_terms, rank, score)` with the
    * query's own document excluded (a query trivially retrieves
    * itself). Scoring laws are [[scoreTopK]]'s verbatim — idf/tf-norm
    * rounded at 1e-4, per-(query, doc) DECIMAL sum — with document
    * frequencies computed per TERM over the corpus (df is a corpus
    * property; queries share it).
    *
    * Scale shape: the union term set is collected first (ONE eager job,
    * bounded by the query set's vocabulary — the degenerate-input-guard
    * tier, same as [[graft.operators.Similarity.ivfTopKIndexed]]'s
    * probed-centroid collect) and pushed as an IN predicate on the
    * postings table's BUCKETING column, so the scan reads only the
    * query terms' buckets (`SelectedBucketsCount`, spec-pinned). The
    * (query, term) bag is query-set-sized and broadcasts; the heavy
    * side — postings rows for matching terms — never moves except into
    * the per-(query_id, doc_id) partial-aggregated sum. `maxDf` is the
    * stopword guard a 100 TB deployment needs: a query term present in
    * half the corpus drags a corpus-sized candidate set through the
    * per-query ranking (the classic lexical-retrieval blowup that
    * impact-ordered/WAND engines exist to dodge); dropping query terms
    * with df > maxDf bounds each query's candidate set by
    * |terms| · maxDf rows. Default keeps every term (the fixture
    * contract the oracle mirrors). */
  def bm25TopKPerQueryIndexed(spark: org.apache.spark.sql.SparkSession,
                              postingsTable: String, statsTable: String,
                              queries: DataFrame, idCol: String,
                              textCol: String, topK: Int,
                              k1: Double = 1.2, b: Double = 0.75,
                              maxDf: Option[Long] = None): DataFrame =
    bm25ForTermBags(spark, postingsTable, statsTable,
      tokenizedBags(queries, idCol, textCol), topK, k1, b, maxDf)

  /** Each query row's DISTINCT tokens as its `(query_id, term)` bag —
    * the input grain [[bm25ForTermBags]] serves. */
  private def tokenizedBags(queries: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    queries
      .select(col(idCol).cast("long").as("query_id"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("query_id"), col("tc.term").as("term"))
      .distinct()

  /** [[bm25TopKPerQueryIndexed]]'s scoring tail over EXPLICIT
    * `(query_id, term)` bags — the seam query-expansion forms
    * ([[bm25TopKExpandedIndexed]]) plug modified bags into while
    * sharing every law: collected-IN bucket pruning, corpus df on the
    * pruned stream, idf/tf-norm rounding, per-(query, doc) DECIMAL
    * sum, self-exclusion, (score desc, doc_id) per-query top-k. */
  def bm25ForTermBags(spark: org.apache.spark.sql.SparkSession,
                      postingsTable: String, statsTable: String,
                      qterms: DataFrame, topK: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      maxDf: Option[Long] = None): DataFrame = {
    val terms = qterms.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    // a bag-less query set retrieves nothing — an empty RESULT, not an
    // error: the streaming serving twin must survive an all-null-text
    // micro-batch (the single-query bm25TopKIndexed keeps its require:
    // explicit empty queryTerms there is a caller bug)
    if (terms.isEmpty) {
      val sp = spark
      import sp.implicits._
      return Seq.empty[(Long, Long, Long, Long, Double)]
        .toDF("query_id", "doc_id", "n_terms", "rank", "score")
    }
    val post = spark.table(postingsTable)
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    // df per term over the PRUNED stream — restricting postings to the
    // union term set keeps every document containing each kept term, so
    // this is the corpus df, shared across queries. The stopword cut
    // (maxDf) applies AFTER df is measured: df is what defines a
    // stopword.
    val dfqAll = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dfq = maxDf.fold(dfqAll)(m => dfqAll.filter(col("df") <= m))
    val stats = spark.table(statsTable)
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .select(col("n_docs"), col("avgdl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    post.join(broadcast(dfq), "term")
      .join(broadcast(qterms), "term")
      .filter(col("query_id") =!= col("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", Num.fpRound(idfExpr * tfNormExpr(k1, b), 4))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), Num.dsum(col("contrib")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** Pseudo-relevance-feedback expansion terms (x139) — RM3-style
    * query expansion (Lavrenko & Croft's relevance-model family, the
    * standard PRF recipe): run the query's own terms through the
    * index, treat the top `fbK` documents as pseudo-relevant, and
    * rank the NEW terms they contain (terms the query didn't already
    * have) by idf · total-feedback-tf — rare-in-corpus but
    * frequent-in-feedback is what expansion wants. Output per query:
    * the top `expandM` candidates as
    * `(query_id, term, fb_df, fb_tf, rank, score)` (fb_df = feedback
    * docs containing the term, fb_tf = its total count in them).
    *
    * Scale shape: round 1 is [[bm25ForTermBags]] (bucket-pruned index
    * scans); its top-k result is COLLECTED and re-broadcast as a
    * local frame (|queries|·fbK rows — the degenerate-input-guard
    * tier), so the feedback fetch is one corpus scan with the
    * feedback ids pushed as an IN predicate (row-group skipping on
    * the id column) — fbK·|queries| documents' text is all that is
    * ever tokenized. Candidate dfs come from the postings table with
    * the candidate term set pushed as the bucket-pruning IN. `corpus`
    * must be the frame the index was built from (feedback docs are
    * fetched by id).
    *
    * Numeric law: idf is the shared [[idfExpr]] (1e-4-rounded); the
    * candidate score idf·fb_tf multiplies it by an exact integer and
    * rounds at 1e-4; rank ties break by ascending term. */
  def expansionTerms(spark: org.apache.spark.sql.SparkSession,
                     postingsTable: String, statsTable: String,
                     queries: DataFrame, idCol: String, textCol: String,
                     corpus: DataFrame, fbK: Int, expandM: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val sp = spark
    import sp.implicits._
    val qterms = tokenizedBags(queries, idCol, textCol)
    // ONE eager round-1 job; the result is query-set-sized and comes
    // back as a local frame so nothing downstream re-runs round 1
    val r1Rows = bm25ForTermBags(spark, postingsTable, statsTable,
        qterms, fbK, k1, b)
      .select(col("query_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    if (r1Rows.isEmpty)
      return Seq.empty[(Long, String, Long, Long, Long, Double)]
        .toDF("query_id", "term", "fb_df", "fb_tf", "rank", "score")
    val r1 = r1Rows.toDF("query_id", "doc_id")
    val fbIds = r1Rows.map(_._2).distinct
    // feedback text fetch: the only text tokenized is the fbK·|queries|
    // pseudo-relevant documents', reached via an id IN pushdown
    val fbTerms = Par.spread(corpus)
      .filter(col(idCol).isin(fbIds: _*))
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))
    val cand = fbTerms.join(broadcast(r1), "doc_id")
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("fb_df"), sum(col("tf")).as("fb_tf"))
      .join(qterms, Seq("query_id", "term"), "left_anti")
    // candidate term set: eager, bounded by the feedback docs' vocab
    val candTerms = cand.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (candTerms.isEmpty)
      return Seq.empty[(Long, String, Long, Long, Long, Double)]
        .toDF("query_id", "term", "fb_df", "fb_tf", "rank", "score")
    val dfq = spark.table(postingsTable)
      .filter(col("term").isin(candTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = spark.table(statsTable).select(col("n_docs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("term"))
    cand.join(broadcast(dfq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        Num.fpRound(idfExpr * col("fb_tf").cast("double"), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= expandM)
      .select(col("query_id"), col("term"), col("fb_df"), col("fb_tf"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** PRF-expanded retrieval (x140) — the loop closed: the query's own
    * terms plus its [[expansionTerms]] re-enter [[bm25ForTermBags]]
    * as one bag per query. Everything heavy is the two bucket-pruned
    * index rounds plus one id-pruned feedback fetch; a query whose
    * round 1 found nothing simply retrieves with its original bag. */
  def bm25TopKExpandedIndexed(spark: org.apache.spark.sql.SparkSession,
                              postingsTable: String, statsTable: String,
                              queries: DataFrame, idCol: String,
                              textCol: String, corpus: DataFrame,
                              fbK: Int, expandM: Int, topK: Int,
                              k1: Double = 1.2,
                              b: Double = 0.75): DataFrame = {
    val qterms = tokenizedBags(queries, idCol, textCol)
    val exp = expansionTerms(spark, postingsTable, statsTable, queries,
        idCol, textCol, corpus, fbK, expandM, k1, b)
      .select(col("query_id"), col("term"))
    bm25ForTermBags(spark, postingsTable, statsTable,
      qterms.union(exp).distinct(), topK, k1, b)
  }

  /** Reciprocal-rank fusion (x135) — the standard hybrid-retrieval
    * combiner (Cormack/Clarke/Buettcher, SIGIR'09): fuse a lexical and
    * a dense ranking of the same corpus for the same query set by
    * rrf(d) = Σ_legs 1/(k0 + rank_leg(d)), summing only over legs that
    * retrieved d. Rank positions, not scores, enter the sum, so the
    * legs need no score calibration — exactly why RRF is the default
    * fuser in production hybrid search. Inputs are the legs' top-k
    * frames: `lex` as `(query_id, doc_id, rank, …)` (the
    * [[bm25TopKPerQueryIndexed]] shape) and `vec` as
    * `(query_id, neighbor_id, rank, …)` (the
    * [[graft.operators.Similarity.ivfTopKIndexed]] shape). Output:
    * `(query_id, doc_id, lex_rank, vec_rank, fused_rank, rrf_score)`
    * with per-leg ranks NULL where a leg missed the document.
    *
    * Scale shape: both inputs are top-k-sized (|queries| · k rows) —
    * the fusion full-outer join, the reciprocal arithmetic, and the
    * per-query re-rank window all run on frames thousands of times
    * smaller than the corpus; the corpus-scale work happened inside
    * the legs, each serving from its persisted index.
    *
    * Numeric law: each reciprocal 1/(k0 + rank) is rounded at 1e-6,
    * the two-term sum is rounded at 1e-6 again (both engines perform
    * the identical IEEE additions — no accumulation order exists in a
    * two-term sum), and the fused rank breaks score ties by ascending
    * doc id. */
  def rrfFuse(lex: DataFrame, vec: DataFrame, topK: Int,
              k0: Int = 60): DataFrame = {
    require(k0 > 0, "rrfFuse: k0 must be positive (Okapi convention 60)")
    val l = lex.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("lex_rank"))
    val v = vec.select(col("query_id"),
      col("neighbor_id").as("doc_id"), col("rank").cast("long").as("vec_rank"))
    def recip(rank: Column): Column =
      when(rank.isNotNull,
        Num.fpRound(lit(1.0) / (lit(k0.toDouble) + rank.cast("double")), 6))
        .otherwise(lit(0.0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    l.join(v, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        Num.fpRound(recip(col("lex_rank")) + recip(col("vec_rank")), 6))
      .withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"),
        col("vec_rank"), col("fused_rank").cast("long").as("fused_rank"),
        col("rrf_score"))
  }

  /** Hard-negative mining (x136) — the contrastive-training data op:
    * for each query, the documents its DENSE leg retrieves that its
    * LEXICAL leg does not. Semantically close but lexically unmatched
    * is the textbook definition of a hard negative (DPR, Karpukhin et
    * al. 2020 mine exactly this way, with roles swapped); emitting
    * `(query_id, neighbor_id, neg_rank, similarity)` re-ranked by
    * descending similarity gives the curriculum the hardest negatives
    * first. Inputs are the same two leg frames [[rrfFuse]] takes; the
    * anti-join and re-rank run on top-k-sized frames — at 100 TB this
    * stage is free, the legs' persisted indexes did the work. */
  def hardNegatives(vec: DataFrame, lex: DataFrame, topK: Int): DataFrame = {
    val l = lex.select(col("query_id"), col("doc_id").as("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("neighbor_id"))
    vec.select(col("query_id"), col("neighbor_id"), col("similarity"))
      .join(broadcast(l), Seq("query_id", "neighbor_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        col("neg_rank").cast("long").as("neg_rank"), col("similarity"))
  }

  /** Contrastive-triplet construction (x137) — the training artifact
    * the retrieval ops exist to produce: per query, (anchor, positive,
    * negative) with the positive = the lexical leg's top-1 document
    * (the strongest term-overlap match — the weak-supervision label
    * BM25-mined training sets use) and the negatives = [[hardNegatives]]'
    * output, hardest first. Queries whose lexical leg retrieved nothing
    * form no triplet (no positive exists — emitting one would be
    * label noise). All inputs are top-k-sized; the join is
    * query-count-sized and broadcasts. */
  def contrastiveTriplets(vec: DataFrame, lex: DataFrame,
                          negK: Int): DataFrame = {
    val pos = lex.filter(col("rank") === 1)
      .select(col("query_id"), col("doc_id").as("pos_id"))
    hardNegatives(vec, lex, negK)
      .join(broadcast(pos), Seq("query_id"))
      .select(col("query_id"), col("pos_id"),
        col("neighbor_id").as("neg_id"), col("neg_rank"), col("similarity"))
  }

  /** Fusion-leg complementarity audit (x138) — the acceptance metric
    * for RUNNING a hybrid stack at all: per query, how many documents
    * each leg retrieved and how many they agree on, plus the Jaccard
    * overlap. Overlap near 1 means the dense tier duplicates the
    * lexical one (turn it off and save the index); overlap near 0
    * with good end recall is the regime RRF exists for. Counts are
    * exact integers; the one division is performed identically in
    * both engines and rounded at 1e-6. Both inputs are top-k-sized —
    * the audit is corpus-free. */
  def legOverlap(lex: DataFrame, vec: DataFrame): DataFrame = {
    val l = lex.select(col("query_id"), col("doc_id"))
      .withColumn("in_lex", lit(1))
    val v = vec.select(col("query_id"), col("neighbor_id").as("doc_id"))
      .withColumn("in_vec", lit(1))
    l.join(v, Seq("query_id", "doc_id"), "full_outer")
      .groupBy(col("query_id"))
      .agg(count(col("in_lex")).as("n_lex"),
        count(col("in_vec")).as("n_vec"),
        count(when(col("in_lex").isNotNull && col("in_vec").isNotNull,
          lit(1))).as("n_both"))
      .withColumn("jaccard", Num.fpRound(
        col("n_both").cast("double") /
          (col("n_lex") + col("n_vec") - col("n_both")).cast("double"), 6))
      .select(col("query_id"), col("n_lex"), col("n_vec"),
        col("n_both"), col("jaccard"))
  }

  /** Frozen BM25 corpus statistics for a query — the driver-held,
    * query-sized artifact behind [[scoreAgainst]] and the streaming
    * relevance gate (the [[graft.operators.TextDedup.bandSketch]]
    * convention: build once per corpus snapshot, reuse across batch
    * runs and stream restarts). */
  final case class Bm25Stats(termDf: Map[String, Long], nDocs: Long,
                             avgdl: Double)

  /** Snapshot [[Bm25Stats]] from a corpus: one stats scan + one
    * filtered-postings aggregate (the [[bm25TopK]] plan's first half),
    * collected — the result is |query|-sized, never corpus-sized. */
  def bm25Stats(corpus: DataFrame, textCol: String,
                queryTerms: Seq[String]): Bm25Stats = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    val s = corpus
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col(textCol))).cast("long")).as("sum_dl"))
      .head()
    val n = s.getLong(0)
    require(n > 0,
      "bm25Stats: empty corpus — frozen retrieval stats need >= 1 document")
    // sum(dl) is NULL (not 0) when every text is NULL — size(tokens(NULL))
    // is NULL and SUM skips nulls; a primitive getLong would NPE here
    require(!s.isNullAt(1),
      "bm25Stats: corpus has no tokenizable text (every text NULL) — " +
        "frozen retrieval stats need >= 1 non-null document")
    val avgdl = s.getLong(1).toDouble / n.toDouble
    val df = Par.spread(corpus)
      .select(explode(TextExpressions.termCounts(col(textCol))).as("tc"))
      .select(col("tc.term").as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Bm25Stats(terms.map(t => t -> df.getOrElse(t, 0L)).toMap, n, avgdl)
  }

  /** Per-row BM25 relevance against FROZEN stats — the stateless form
    * of [[bm25TopK]]'s scoring: every idf is a driver-side constant
    * (same 1e-4-rounded law), the per-term fold runs inside a
    * higher-order `aggregate` over the row's own term counts with an
    * exact DECIMAL accumulator (same order-free sum as the batch
    * form — parity is by construction, pinned by StreamsSpec), and no
    * shuffle or state exists anywhere — so the SAME operator body runs
    * unchanged in a streaming plan. Terms absent from the stats (df=0
    * never observed) score idf at df=0 — a term the corpus has never
    * seen is maximally informative. Appends `relevance` (double). */
  def scoreAgainst(docs: DataFrame, textCol: String, stats: Bm25Stats,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(stats.termDf.nonEmpty, "stats must cover >= 1 query term")
    require(stats.nDocs > 0, "stats must describe a non-empty corpus")
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val idf = stats.termDf.map { case (t, df) =>
      t -> r4(math.log(1.0 + (stats.nDocs - df + 0.5) / (df + 0.5)))
    }
    val idfMap = map_from_arrays(
      array(idf.keys.toSeq.map(lit): _*),
      array(idf.values.toSeq.map(lit): _*))
    val dl = size(Text.tokens(col(textCol))).cast("double")
    val score = aggregate(
      filter(TextExpressions.termCounts(col(textCol)),
        tc => element_at(idfMap, tc.getField("term")).isNotNull),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
      (acc, tc) => {
        val tf = tc.getField("tf").cast("double")
        val tfn = Num.fpRound(tf * lit(k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(stats.avgdl))),
          4)
        val contrib = Num.fpRound(
          element_at(idfMap, tc.getField("term")) * tfn, 4)
        acc + contrib.cast("decimal(38,6)")
      },
      acc => acc.cast("double"))
    docs.withColumn("relevance", score)
  }

  /** Per-source QUALITY cap (x99) — "keep each source's best n" by the
    * x12 quality score: the Gopher-style per-domain budget that stops
    * one crawl domain from flooding the mix, ranking by MERIT (score
    * desc, doc id asc) where x45's quota sampler ranks by hash. Returns
    * `(doc_id, source, quality_score, rank)` for survivors.
    *
    * Scale shape: the score is a zero-shuffle per-row kernel projection
    * (x12), and the per-source top-n rides the salted two-phase grouped
    * top-k ([[Skew.saltedTopK]]) — a hot source (half the crawl is one
    * domain) heaps in parallel across salt shards before the per-source
    * merge, so no single task ever sorts a whole domain. */
  def sourceQualityCap(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, maxPerSource: Int): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs, idCol, textCol)
      .select(col("doc_id"), col("quality_score"))
    val withSrc = docs.select(col(idCol).as("doc_id"),
        col(sourceCol).as("source"))
      .join(scored, "doc_id")
    Skew.saltedTopK(withSrc, Seq("source"), "quality_score", maxPerSource,
        tieCols = Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("rank").cast("long").as("rank"))
  }

  /** Contamination ATTRIBUTION (x100) — the pair-level audit behind
    * x38's per-document verdict: WHICH corpus documents leak WHICH
    * benchmark items, as `(bench_id, doc_id, n_overlap)` for every pair
    * sharing at least `threshold` distinct k-shingles. x38 answers "is
    * this training doc contaminated"; this emits the evidence a
    * benchmark steward needs to fix the leak at its source.
    *
    * Scale shape: identical to x38 — the benchmark side's distinct
    * shingle hashes are benchmark-sized and broadcast; corpus shingles
    * stream through the join scan-side and only MATCHING (bench, doc,
    * shingle) rows reach the pair-count aggregate. The corpus text
    * never shuffles; the output is leak-pair-sized. */
  def contaminationPairs(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         k: Int, threshold: Int): DataFrame = {
    def shingled(df: DataFrame, as: String): DataFrame =
      Par.spread(df).select(col(idCol).as(as),
          explode(TextExpressions.shingleHashSet(col(textCol), k)).as("sh"))
    shingled(corpus, "doc_id")
      .join(broadcast(shingled(benchmark, "bench_id")), "sh")
      .groupBy(col("bench_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= threshold)
  }
}
