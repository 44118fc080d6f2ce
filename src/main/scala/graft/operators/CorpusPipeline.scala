package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Par

/** The composed training-corpus preparation pipeline (x42) — the product
  * claim of the extension suite as ONE operator: quality gate → exact
  * dedup → near-dup dedup → benchmark decontamination → stratified
  * sampling → token-window chunking → train/val/test split. Every stage
  * is the SAME operator the individually-registered queries (x35/x34/
  * x36/x38/x37/x31/x26) run — this is their composition, where dedup
  * semantics and float laws interact, not a re-implementation.
  *
  * Scale shape of the whole chain: the gate is a zero-shuffle kernel
  * filter (it runs FIRST so no later stage pays state or shuffle for
  * spam); both dedup stages shuffle ids/signatures but never move text
  * except the one id-equi join back to the corpus; decontamination drops
  * via a left-anti join on the (small) contaminated set; sampling is a
  * pure projection filter; chunking is a kernel + narrow explode that
  * inherits the scan partitioning; the split label is a pure projection
  * of doc_id. Split assignment commutes with chunking (it is a function
  * of doc_id only), so it is stamped after the explode — same
  * assignment, and the corpus-sized stages never carry the extra column.
  */
object CorpusPipeline {

  /** Run the full pipeline; returns the final chunk table
    * (doc_id, chunk_idx, chunk, split).
    *
    * `corpus`/`benchmark`: the training candidates and the held-out eval
    * set to decontaminate against. Threshold parameters mirror the
    * individually-registered stage queries.
    *
    * `stageTable`: the PRODUCTION phase boundary. The default (None)
    * pins the gated+digested+shingled frame in executor memory — right
    * for a single-run fixture or a corpus that fits the cluster's
    * storage fraction. At warehouse scale that pin is eviction churn:
    * pass a catalog table name instead and the stage frame is
    * MATERIALIZED between phases ([[graft.sinks.Sinks.writeBucketed]],
    * bucketed by `idCol` so the downstream id-equi anti-joins read
    * co-located buckets), the rest of the pipeline runs from that scan,
    * and NOTHING corpus-text-sized lives in memory — the x80/x104
    * precedent applied to the composed pipeline. Output is identical
    * by construction (same frame, different storage), spec-pinned. */
  def prepare(corpus: DataFrame, benchmark: DataFrame,
              idCol: String, textCol: String,
              maxTopBigramFrac: Double, minChars: Int,
              shingleK: Int, neardupThreshold: Double,
              decontamThreshold: Int,
              groupCol: String, pctByGroup: Map[String, Int],
              defaultPct: Int,
              chunkSize: Int, chunkStride: Int,
              stageTable: Option[String] = None,
              stageBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.graft.TextExpressions
    // FUSED SCAN: gate signals (x35 kernel), the exact-dedup digest and
    // the hashed shingle sets are all computed in ONE pass over the
    // corpus text and cached TOGETHER — the gate filter runs scan-side
    // so rejected docs never enter the cache. The per-stage operators
    // each pay their own text scan when run standalone (correct for
    // single queries); composed, those scans fuse: text kernels run
    // once here + once in the chunker, instead of once per stage. At
    // 100 TB this cached frame is the materialized stage table a
    // production run writes (Sinks.writeBucketed) between phases.
    // Gate predicate == Streams.qualityGate (same kernel, same nulls
    // law); digest == TextDedup.exactGroups; sets == TextDedup
    // .shingleSets — equivalences pinned by the x42 oracle and
    // CorpusPipelineSpec.
    val base = fusedBase(corpus, textCol, maxTopBigramFrac, minChars,
      shingleK)
    // exact dedup applied (x34 semantics): representative = min id per
    // digest; one (digest, id) shuffle — the text never moves. The
    // CACHE sits HERE, not on `base`: every later stage consumes
    // `exact`, so pinning it stops each reference re-running the
    // digest shuffle + semi join, while Catalyst prunes the (pricey)
    // shingle kernel out of the reps branch below — so per run the
    // text pays one gate+digest scan (reps) + one gate+digest+shingle
    // scan (this cache's fill) + the chunker, and nothing else.
    val reps = base.groupBy(col("_digest")).agg(min(col(idCol)).as(idCol))
    val exactDeduped = base.join(reps, Seq("_digest", idCol), "left_semi")
    val exact = stageTable match {
      case Some(tbl) =>
        // phase boundary: write once, read for every later stage —
        // no corpus-text-sized frame stays MEMORY-resident
        graft.sinks.Sinks.writeBucketed(exactDeduped, tbl, Seq(idCol),
          stageBuckets)
        corpus.sparkSession.table(tbl)
      case None => exactDeduped.cache()
    }
    // near-dup applied (x36): LSH → verify → components → drop, over
    // the CACHED sets column — no second text pass
    val survivors = exact.join(neardupDrops(exact, idCol,
      neardupThreshold), Seq(idCol), "left_anti")
    // decontaminate (x38): benchmark shingles are eval-suite-sized; the
    // corpus side explodes the cached sets column
    val clean = survivors.join(contaminatedIds(survivors, benchmark,
        idCol, textCol, shingleK, decontamThreshold),
        Seq(idCol), "left_anti")
      .drop("_digest", "_sh")
    // stratified sample (x37): deterministic md5-bucket corpus mixing
    val sampled = TextAnalysis.stratifiedSample(clean, idCol, groupCol,
      pctByGroup, defaultPct)
    // chunk (x31) then stamp the split label (x26) — commuting
    // projections, see the object note
    TextAnalysis.hashSplit(
      TextAnalysis.chunk(sampled, idCol, textCol, chunkSize, chunkStride),
      "doc_id")
  }

  /** The FUSED SCAN shared by [[prepare]]/[[prepareV2]]: gate signals
    * (x35 kernel), the exact-dedup digest (`_digest`) and the hashed
    * shingle sets (`_sh`) in ONE pass over the corpus text, gate
    * filter scan-side. */
  private def fusedBase(corpus: DataFrame, textCol: String,
                        maxTopBigramFrac: Double, minChars: Int,
                        shingleK: Int): DataFrame = {
    import org.apache.spark.sql.graft.TextExpressions
    val st = TextExpressions.repetitionStats(col(textCol))
    val tbf = when(element_at(col("_st"), 1) > 0,
      element_at(col("_st"), 2).cast("double") /
        element_at(col("_st"), 1).cast("double"))
    Par.spread(corpus)
      .withColumn("_st", st)
      .filter(length(trim(col(textCol))) >= minChars &&
        (tbf.isNull || tbf <= maxTopBigramFrac))
      .drop("_st")
      .withColumn("_digest", sha2(lower(trim(col(textCol))), 256))
      .withColumn("_sh", TextExpressions.shingleHashSet(col(textCol), shingleK))
  }

  /** Near-dup drop set (x36 semantics) over a frame carrying the
    * cached `_sh` shingle column: LSH → verify → components →
    * non-representatives. Shared by [[prepare]]/[[prepareV2]]. */
  private def neardupDrops(exact: DataFrame, idCol: String,
                           threshold: Double): DataFrame = {
    val sets = exact.select(col(idCol).as("doc_id"), col("_sh").as("sh"))
      .withColumn("n", size(col("sh"))).filter(col("n") > 0)
    val pairs = TextDedup.minhashLshPairsFromSets(sets, threshold)
    Components.connectedComponents(pairs, "doc1", "doc2")
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
  }

  /** Contaminated ids (x38 semantics) over a frame carrying `_sh`:
    * ≥ `decontamThreshold` shingles shared with the benchmark. Shared
    * by [[prepare]]/[[prepareV2]]. */
  private def contaminatedIds(survivors: DataFrame, benchmark: DataFrame,
                              idCol: String, textCol: String,
                              shingleK: Int,
                              decontamThreshold: Int): DataFrame = {
    import org.apache.spark.sql.graft.TextExpressions
    val benchShingles = benchmark
      .select(explode(TextExpressions.shingleHashSet(col(textCol),
        shingleK)).as("_h"))
      .distinct()
    survivors
      .select(col(idCol), explode(col("_sh")).as("_h"))
      .join(benchShingles, "_h")
      .groupBy(col(idCol)).agg(count(lit(1)).as("_n_overlap"))
      .filter(col("_n_overlap") >= decontamThreshold)
      .select(col(idCol))
  }

  /** The MODERN curation chain (x226) — [[prepare]] with the SEMANTIC
    * tier composed in where production pipelines put it (between the
    * lexical dedup stages and decontamination): quality gate → exact
    * dedup → MinHash near-dup → SemDeDup (x219, over the survivors'
    * embeddings) → DSIR selection (x220, target-likeness top-N) →
    * benchmark decontamination → stratified sample → chunk →
    * train/val/test split. Every stage is the SAME operator its
    * individually-registered query runs; what this composition checks
    * is the stage INTERACTIONS — SemDeDup clusters train on the
    * lexically-deduped survivor set (not the raw corpus), DSIR's
    * target/raw distributions are fit on the semantic survivors, and
    * decontamination prunes the SELECTED set.
    *
    * `embeddings` joins the corpus by `vecIdCol` = document id (docs
    * without an embedding pass the semantic stage untouched — partial
    * embedding coverage is the production norm). SemDeDup seeds are
    * the full embedding table's `semSeeds` smallest ids (constant
    * init vectors — they need not survive the lexical stages).
    *
    * Scale shape on top of [[prepare]]'s: the semantic stage adds
    * x219's cost model (per-cluster pair blocks, k ∝ n) over an
    * embedding frame RESTRICTED to survivors (one semi join); DSIR
    * adds two bucket-bounded gram aggregations + a broadcast B-row
    * join + TakeOrdered; both emit id-sized drop/keep sets that
    * broadcast back. Text still moves only into the chunker. */
  def prepareV2(corpus: DataFrame, embeddings: DataFrame,
                benchmark: DataFrame,
                idCol: String, textCol: String,
                vecIdCol: String, vecCol: String,
                maxTopBigramFrac: Double, minChars: Int,
                shingleK: Int, neardupThreshold: Double,
                semSeeds: Int, semRounds: Int, semThreshold: Double,
                dsirTarget: org.apache.spark.sql.Column,
                dsirBuckets: Int, dsirTopN: Int,
                decontamThreshold: Int,
                groupCol: String, pctByGroup: Map[String, Int],
                defaultPct: Int,
                chunkSize: Int, chunkStride: Int): DataFrame = {
    val base = fusedBase(corpus, textCol, maxTopBigramFrac, minChars,
      shingleK)
    val reps = base.groupBy(col("_digest")).agg(min(col(idCol)).as(idCol))
    val exact = base.join(reps, Seq("_digest", idCol), "left_semi").cache()
    // the id-sized DROP/KEEP sets each phase emits are CACHED (the
    // composed pipelines' materialized-phase-boundary convention):
    // every later stage that re-derives its input re-reads them
    // instead of re-running the pair walk / the Lloyd rounds / the
    // weight fit — uncached, the semantic tier's multiple passes over
    // `survivors` re-ran LSH + components per pass (measured 2.5x the
    // whole pipeline). Caller-owned caches, cleared by Bench/Verify.
    val drops = neardupDrops(exact, idCol, neardupThreshold).cache()
    val survivors = exact.join(drops, Seq(idCol), "left_anti")
    // SEMANTIC tier (x219): cluster the SURVIVORS' embeddings (semi
    // join restricts the vector frame to the lexically-deduped set),
    // seeds = the full table's smallest ids, drop non-representatives
    val restricted = embeddings.join(
      survivors.select(col(idCol).as(vecIdCol)), Seq(vecIdCol),
      "left_semi")
    val semDrops = Similarity.semDedup(restricted,
        embeddings.filter(col(vecIdCol) < semSeeds), vecIdCol, vecCol,
        semRounds, semThreshold)
      .filter(col("status") === "dropped")
      .select(col("vec_id").as(idCol))
      .cache()
    val semantic = survivors.join(broadcast(semDrops), Seq(idCol),
      "left_anti")
    // DSIR selection (x220): distributions fit ON the semantic
    // survivors; keep the top-N most target-like documents
    val selected = TextAnalysis.dsirSelect(semantic, idCol, textCol,
        dsirTarget, dsirBuckets, dsirTopN)
      .select(col("doc_id").as(idCol))
      .cache()
    val picked = semantic.join(broadcast(selected), Seq(idCol),
      "left_semi")
    val clean = picked.join(contaminatedIds(picked, benchmark, idCol,
        textCol, shingleK, decontamThreshold), Seq(idCol), "left_anti")
      .drop("_digest", "_sh")
    val sampled = TextAnalysis.stratifiedSample(clean, idCol, groupCol,
      pctByGroup, defaultPct)
    TextAnalysis.hashSplit(
      TextAnalysis.chunk(sampled, idCol, textCol, chunkSize, chunkStride),
      "doc_id")
  }

  /** Cleaning-first curation pipeline (x56): passage-level boilerplate
    * strip (x50) → drop fully-boilerplate documents → PII redaction
    * (x60) → exact dedup ON THE REDACTED TEXT (x34 semantics) →
    * train/val/test split (x26). The interesting interactions are the
    * stages BEFORE dedup: stripping shared chrome — and equally,
    * replacing per-user contact lines with placeholder tokens — can make
    * documents that differed only in boilerplate or PII EXACTLY
    * identical, so dedup after cleaning collapses groups dedup before
    * cleaning would miss — the reason production pipelines order these
    * stages this way.
    *
    * Scale shape: the strip stage's digest shuffles and anti-join
    * (Cleaning.stripBoilerplate's notes apply), then a zero-shuffle
    * regexp projection for redaction, then a (hash, id) aggregate and an
    * id-equi join for dedup, then a pure projection for the split — the
    * cleaned text moves once into the dedup join and nothing else moves
    * it again. Returns (doc_id, clean_text, n_dropped, split) for the
    * surviving corpus. */
  def curate(corpus: DataFrame, idCol: String, textCol: String,
             passageTokens: Int, maxDf: Int): DataFrame = {
    val stripped = Cleaning.stripBoilerplate(corpus, idCol, textCol,
        passageTokens, maxDf)
      .filter(col("n_kept") > 0)
    val redacted = Cleaning.redactPii(stripped, "clean_text")
    val deduped = TextDedup.dedupedCorpus(redacted, "doc_id", "clean_text")
    TextAnalysis.hashSplit(deduped, "doc_id")
      .select(col("doc_id"), col("clean_text"), col("n_dropped"),
        col("split"))
  }

  /** IMAGE curation pipeline (x65) — the multimodal twin of [[curate]]:
    * quality gate on decoded-pixel contrast ([[Multimodal.imageStats]] —
    * blank/flat frames dropped before they cost dedup state, the same
    * gate-first ordering as the text pipelines) → perceptual dedup
    * applied ([[ImageDedup.dedupedImages]]) → train/val/test split
    * (x26). Returns (doc_id, fp, split) for the surviving images.
    *
    * The gate can break a near-dup cluster asymmetrically (one encoding
    * of a picture passes the bar, another misses it) — dedup therefore
    * runs on the GATED survivors, exactly as text dedup runs on the
    * quality-gated corpus; the oracle mirrors this composition.
    *
    * Scale shape: the gate is one decode scan feeding a left-semi join
    * on ids (only ids move); dedup shuffles 16-byte fingerprints through
    * the banded pigeonhole join; the split is a pure projection. Payload
    * bytes never move past the two decode scans. */
  def curateImages(spark: SparkSession, media: DataFrame, minContrast: Double,
                   maxHamming: Int = 3,
                   decoder: Multimodal.MediaDecoder = Multimodal.ImageIoDecoder): DataFrame = {
    val good = media.join(
      Multimodal.imageStats(spark, media, decoder)
        .filter(col("contrast") >= minContrast)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    TextAnalysis.hashSplit(
      ImageDedup.dedupedImages(spark, good, maxHamming, decoder), "doc_id")
  }

  /** Export pipeline (x73): model-scored classifier gate (x69) → exact
    * dedup applied (x34) → deterministic shard manifest (x71) — the
    * tail of a curation run, where the corpus that survives filtering
    * is cut into the fixed-size, reproducibly-shuffled shards a trainer
    * consumes. The composition is what's under test: the gate and the
    * dedup change WHICH documents exist, so every downstream rank —
    * and therefore every shard boundary and key range — moves; a bug
    * that reorders or double-counts survivors shifts whole shards.
    *
    * Scale shape: zero-shuffle score filter, (hash, id)-only dedup
    * shuffles, then the two-phase bucket prefix rank — the only
    * text-bearing exchange in the whole chain is dedup's id-equi join
    * back to the corpus. */
  def exportShards(corpus: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shardSize: Long): DataFrame = {
    val kept = Classifier.keep(corpus, textCol, threshold)
    val deduped = TextDedup.dedupedCorpus(kept, idCol, textCol)
      .drop("n_dups")
    Packing.shardManifest(deduped, idCol, textCol, shardSize)
  }

  /** LM-curation pipeline (x89): paragraph dedup (x85) → bigram LM
    * scoring (x86) trained on the DEDUPED text → quality gate. The
    * ORDER is the point and the hazard under test: the LM must be
    * trained after dedup (duplicated paragraphs would otherwise inflate
    * their own transition probabilities and score themselves fluent —
    * the circularity the CCNet pipeline avoids the same way), so the
    * score stage consumes x85's reassembled `clean_text`, not the raw
    * corpus, and a document's score can CHANGE when someone else's
    * duplicate of its paragraphs is removed. Survivors =
    * `(doc_id, n_bigrams, avg_logprob)` at `avg_logprob >= minLogprob`;
    * documents deduped to < 2 tokens have no transitions and drop out
    * (the empty-doc limit of an LM gate).
    *
    * Scale shape: x85's digest aggregate + per-doc reassembly, then
    * x86's vocabulary-bounded count tables — the only text-bearing
    * exchanges are x85's own; the gate itself is a projection. */
  def lmCurate(corpus: DataFrame, idCol: String, textCol: String,
               chunk: Int, minLogprob: Double): DataFrame = {
    val deduped = TextDedup.dedupParagraphs(corpus, idCol, textCol, chunk)
      .select(col("doc_id"), col("clean_text"))
    TextAnalysis.bigramLmScores(deduped, "doc_id", "clean_text")
      .filter(col("avg_logprob") >= minLogprob)
  }

  /** Dedup-AWARE train/val/test split: split assignment by near-dup
    * CLUSTER, not by document — the fix for the leakage x54 audits. A
    * per-document hash split on an un-deduplicated corpus always
    * leaks (near-identical docs straddle the boundary and the eval
    * split scores memorization); assigning every document its
    * cluster's split makes straddling impossible BY CONSTRUCTION:
    * near-dup pairs (exact n-gram Jaccard ≥ threshold, the x8
    * machinery) feed connected components, each document inherits the
    * split of its component representative (min id; a singleton is its
    * own rep), via the same [[TextAnalysis.splitLabel]] boundaries the
    * per-document split uses. Output `(doc_id, cluster_rep, split)`;
    * running [[TextAnalysis.splitLeakage]]'s pair audit against this
    * split finds zero cross-split pairs (spec-pinned).
    *
    * Scale shape: the expensive stage is [[TextDedup.jaccardPairs]]
    * (prefix-filtered inverted index, no all-pairs) and the O(log d)
    * components loop; the component table is near-dup-sized — tiny
    * against the corpus — so the final rep join broadcasts (x34's
    * anti-join shape), and the split label is a pure projection of the
    * rep. */
  def clusterSplit(corpus: DataFrame, idCol: String, textCol: String,
                   k: Int, threshold: Double): DataFrame =
    clusterReps(corpus, idCol, textCol, k, threshold)
      .select(col("doc_id"), col("cluster_rep"),
        TextAnalysis.splitLabel(col("cluster_rep")).as("split"))

  /** Every document's near-dup component representative (min id;
    * singletons are their own rep) — the shared core under
    * [[clusterSplit]] and [[dedupClusterStats]]: x8 pairs → connected
    * components → broadcast rep join (the component table is
    * near-dup-sized). */
  def clusterReps(corpus: DataFrame, idCol: String, textCol: String,
                  k: Int, threshold: Double): DataFrame =
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(broadcast(componentTable(corpus, idCol, textCol, k, threshold)),
        Seq("doc_id"), "left")
      .withColumn("cluster_rep", coalesce(col("component"), col("doc_id")))
      .select(col("doc_id"), col("cluster_rep"))

  /** QUALITY-keep near-dup cluster representatives (x116) — the
    * keep-rule variant every production dedup actually wants: instead
    * of [[clusterReps]]' arbitrary min-id survivor, each near-dup
    * component keeps its HIGHEST-QUALITY member (x12's quality score,
    * ties broken by min doc_id — fully deterministic). Deduplicating
    * with `doc_id === cluster_rep` then drops the low-quality copies
    * of each template instead of whichever copy crawled first.
    * Returns `(doc_id, cluster_rep)` — same shape as x93, different
    * keep rule.
    *
    * Scale shape: the x8 pair machinery dominates as in [[clusterReps]].
    * Member quality is resolved by joining the corpus-sized score
    * projection against the BROADCAST component table (near-dup-sized),
    * so only component members reach the argmax aggregate, and the
    * aggregate output is component-count-sized — broadcast again for
    * the final stamp. The argmax is a `max(struct(quality, -id))` —
    * one pass, no per-component sort. Text never moves: the score
    * kernel runs scan-side. */
  def qualityReps(corpus: DataFrame, idCol: String, textCol: String,
                  k: Int, threshold: Double): DataFrame = {
    val comp = componentTable(corpus, idCol, textCol, k, threshold)
    val scores = TextAnalysis.qualityScore(corpus, idCol, textCol)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("quality_score"))
    val reps = scores.join(broadcast(comp), Seq("doc_id"))
      .groupBy(col("component"))
      .agg(max(struct(col("quality_score").as("q"),
        (-col("doc_id")).as("nid"))).as("_m"))
      .select(col("component"), (-col("_m.nid")).as("rep"))
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(broadcast(comp), Seq("doc_id"), "left")
      .join(broadcast(reps), Seq("component"), "left")
      .select(col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
  }

  /** The `(doc_id, component)` table of the x8 near-dup graph —
    * near-dup-sized (only documents WITH a near-dup appear), so
    * downstream joins broadcast it. Shared by [[clusterReps]] and
    * [[sourceDuplication]]. */
  private def componentTable(corpus: DataFrame, idCol: String,
                             textCol: String, k: Int,
                             threshold: Double): DataFrame = {
    val pairs = TextDedup.jaccardPairs(corpus, idCol, textCol, k, threshold)
      .select(col("doc1"), col("doc2"))
    Components.connectedComponents(pairs, "doc1", "doc2")
      .withColumnRenamed("node", "doc_id")
  }

  /** Persist the near-dup component table — the train/serve split for
    * the cluster-keep family (the frozen-books convention): the
    * shingle→pair→connected-components walk (the expensive, iterative
    * part) runs ONCE here, and every keep-rule variant downstream
    * ([[qualityRepsIndexed]], a min-id rep, a recency rep) is then one
    * scan + two broadcast joins against the frozen `(doc_id,
    * component)` rows. Near-dup-sized, one file. */
  def writeComponentIndex(corpus: DataFrame, idCol: String,
                          textCol: String, k: Int, threshold: Double,
                          table: String): Unit =
    componentTable(corpus, idCol, textCol, k, threshold)
      .coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(table)

  /** [[qualityReps]] SERVED from a persisted [[writeComponentIndex]]
    * table — same result, same oracle, none of the pair machinery at
    * serve time: one corpus scan for the quality kernel, the frozen
    * near-dup-sized component table broadcast twice (member argmax,
    * final stamp). The x123 frozen-books pattern applied to the
    * cluster-keep family. */
  def qualityRepsIndexed(corpus: DataFrame, idCol: String,
                         textCol: String, comp: DataFrame): DataFrame = {
    val scores = TextAnalysis.qualityScore(corpus, idCol, textCol)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("quality_score"))
    val reps = scores.join(broadcast(comp), Seq("doc_id"))
      .groupBy(col("component"))
      .agg(max(struct(col("quality_score").as("q"),
        (-col("doc_id")).as("nid"))).as("_m"))
      .select(col("component"), (-col("_m.nid")).as("rep"))
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(broadcast(comp), Seq("doc_id"), "left")
      .join(broadcast(reps), Seq("component"), "left")
      .select(col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
  }

  /** Near-dup cluster SIZE HISTOGRAM — the data-card companion for the
    * dedup family (x51 reports corpus composition; this reports its
    * REDUNDANCY): `(cluster_size, n_clusters)` over the x8 near-dup
    * graph, singletons included as size-1 clusters, so duplicated
    * mass = 1 − n_clusters·size>1-weighted … readable directly:
    * sum(size·n) = corpus size, sum(n) = cluster count, and the
    * duplicated fraction is 1 − sum(n)/sum(size·n). Two tiny
    * aggregates over the rep frame — nothing here is corpus-shaped
    * except the pair generation it shares with x93. */
  def dedupClusterStats(corpus: DataFrame, idCol: String, textCol: String,
                        k: Int, threshold: Double): DataFrame =
    clusterReps(corpus, idCol, textCol, k, threshold)
      .groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** Per-source EXACT-dup savings (x115) — x108's data-card row for the
    * exact tier: how many documents and tokens each source would shed
    * under exact dedup alone (x1's keep rule: the minimum doc id of
    * each sha256(lower(trim(text))) group survives, every other member
    * is removable mass). Read next to x108: the gap between the exact
    * and near-dup rows is the mass only fuzzy matching can find —
    * which prices the MinHash stage for this corpus. Same shape as
    * x108: `(source, n_docs, n_dup_docs, total_tokens, dup_tokens,
    * dup_frac)`.
    *
    * Scale shape: one scan projecting `(digest, source, n_tokens)` —
    * text is hashed scan-side and never moves — then a digest-
    * partitioned window picks each group's keeper (groups are
    * duplicate-family-sized) and a #sources-row rollup follows. One
    * corpus-sized exchange total, carrying 32-byte digests + counts. */
  def exactDupSavings(corpus: DataFrame, idCol: String, textCol: String,
                      sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Par.spread(corpus)
      .select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        size(graft.functions.Text.tokens(col(textCol))).cast("long")
          .as("n_tokens"),
        sha2(lower(trim(col(textCol))), 256).as("_h"))
      .withColumn("_keep",
        min(col("doc_id")).over(Window.partitionBy(col("_h"))))
      .withColumn("_dup", (col("doc_id") =!= col("_keep")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_dup")).as("n_dup_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("_dup") * col("n_tokens")).as("dup_tokens"))
      .withColumn("dup_frac",
        when(col("total_tokens") > 0,
          graft.functions.Num.fpRound(
            col("dup_tokens").cast("double") /
              col("total_tokens").cast("double"), 4))
          .otherwise(lit(0.0d)))
  }

  /** Cross-SOURCE near-duplication matrix (x109) — WHERE the duplicated
    * mass travels: for every unordered source pair (a ≤ b), how many
    * near-dup pairs (exact n-gram Jaccard ≥ threshold, the x8 graph)
    * have one member in a and the other in b. The syndication audit:
    * a hot off-diagonal cell means two crawl sources republish each
    * other (dedup one against the other BEFORE mixing); the diagonal
    * is within-source redundancy (x108's mass, at pair grain). x53
    * measures source VOCABULARY overlap; this measures actual
    * document-level duplication between sources.
    *
    * Scale shape: the x8 pair machinery dominates (prefix-filtered
    * inverted index — no all-pairs); the source stamping is two
    * id-equi joins of the near-dup-PAIR-sized frame against a
    * `(doc_id, source)` projection (ids + a source string move, never
    * text), and the matrix aggregate is ≤ #sources² rows. */
  def crossSourceDuplication(corpus: DataFrame, idCol: String,
                             textCol: String, sourceCol: String, k: Int,
                             threshold: Double): DataFrame = {
    val pairs = TextDedup.jaccardPairs(corpus, idCol, textCol, k, threshold)
      .select(col("doc1"), col("doc2"))
    val src = corpus.select(col(idCol).cast("long").as("_id"),
      col(sourceCol).as("_src"))
    pairs
      .join(src.select(col("_id").as("doc1"), col("_src").as("s1")), "doc1")
      .join(src.select(col("_id").as("doc2"), col("_src").as("s2")), "doc2")
      .groupBy(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Per-SOURCE duplication mass (x108) — the data-card row x97's
    * corpus-level histogram can't answer: how much of EACH source is
    * duplicated mass, in documents and in tokens. A document is
    * "duplicated mass" when it is a non-representative member of a
    * near-dup cluster (the mass dedup would remove; the rep carries the
    * cluster's one kept copy — x93's keep rule), so for every source:
    * `(n_docs, n_dup_docs, total_tokens, dup_tokens, dup_frac)` with
    * dup_frac = dup_tokens/total_tokens (the token-weighted fraction a
    * steward budgets by, not the doc count — a source whose duplicates
    * are its longest documents is worse than its doc count suggests).
    *
    * Scale shape: pure COMPOSITION of bounded pieces — the x8 pair
    * machinery + O(log d) components produce the near-dup-sized
    * component table (broadcast), the corpus contributes ONE scan
    * projecting `(doc_id, source, n_tokens)` (the x13 whitespace-token
    * kernel; text never moves), and the per-source rollup is a
    * #sources-row aggregate. No corpus-sized shuffle beyond what x93
    * already pays. */
  def sourceDuplication(corpus: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, k: Int,
                        threshold: Double): DataFrame = {
    val comp = componentTable(corpus, idCol, textCol, k, threshold)
    Par.spread(corpus)
      .select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        size(graft.functions.Text.tokens(col(textCol))).cast("long")
          .as("n_tokens"))
      .join(broadcast(comp), Seq("doc_id"), "left")
      .withColumn("_dup",
        when(coalesce(col("component"), col("doc_id")) =!= col("doc_id"), 1L)
          .otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_dup")).as("n_dup_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("_dup") * col("n_tokens")).as("dup_tokens"))
      .withColumn("dup_frac",
        when(col("total_tokens") > 0,
          graft.functions.Num.fpRound(
            col("dup_tokens").cast("double") /
              col("total_tokens").cast("double"), 4))
          .otherwise(lit(0.0d)))
  }
}
