package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num
import graft.operators.{Analytics, Bpe, Classifier, Cleaning, Components, CorpusPipeline, Graph, ImageDedup, Multimodal, Olap, Packing, Project, Resolution, Retrieval, Similarity, Sketches, Snapshots, Temporal, TextAnalysis, TextDedup, Warehouse}
import graft.runner.{Maintenance, MaintainedIndex, TombstoneFeed}

/** Extension + capability-proof query inventory (SURVEY §2.4 X1-X6 plus the
  * LLM-training-data operators: dedup family, similarity search, text
  * analysis, multimodal plumbing). Every registered query carries a DuckDB
  * oracle — including x7 (SimHash), whose fingerprint is md5-derived
  * precisely so a SQL engine can re-compute it bit-for-bit.
  */
object ExtensionQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** 2^60 — [[graft.operators.Snapshots]]' batch-id fold, spelled for
    * the DuckDB oracles. */
  private val BatchFold = "1152921504606846976"

  /** DuckDB cosine over the first `n` components of float lists, double
    * math, array accumulation order — the mirror of
    * graft.functions.Vectors.cosine over a `slice(vec, 1, n)`. */
  private def duckCosN(a: String, b: String, n: Int): String =
    s"""(list_sum(list_transform(generate_series(1, $n),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, $n),
             i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, $n),
             i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))"""

  /** Full-width (64-dim fixture) cosine. */
  private[queries] def duckCos(a: String, b: String): String = duckCosN(a, b, 64)

  /** DuckDB distinct 3-token shingles of documents (mirror of
    * Text.shingleSet(_, 3)). */
  private val duckShingles =
    """toks AS (SELECT doc_id,
         string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i))"""

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](
    // X1 — exact dedup on normalized-text digest: one shuffle of
    // (hash, id) pairs only.
    "x1_exact_dedup" -> ((s, dir) =>
      TextDedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")),

    // X2 — MinHash+LSH near-dup (scale path): banded signatures ->
    // candidates -> exact-verify >= 0.8.
    "x2_minhash_lsh" -> ((s, dir) =>
      TextDedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.8)),

    // X3 — brute-force top-k cosine neighbors (broadcast query set).
    "x3_topk_similarity" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
    }),

    // X4 — corpus text stats per language.
    "x4_text_stats" -> ((s, dir) =>
      TextAnalysis.statsByLang(t(s, dir, "documents"), "text")),

    // X5 — TPC-H Q1-style pricing summary: map-side partial hash agg into
    // a 32-way shuffle of 4-row partials.
    "x5_tpch_q1" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("timestamp") <=
          lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Num.dsum(col("l_quantity")).as("sum_qty"),
          Num.dsum(col("l_extendedprice")).as("sum_base_price"),
          Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          Num.davg(col("l_quantity"), 4).as("avg_qty"),
          Num.davg(col("l_extendedprice"), 4).as("avg_price"),
          Num.davg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // X6 — star join rollup: dims broadcast, fact never re-shuffled until
    // the final 2-key aggregate.
    "x6_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          Num.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"))
    }),

    // x7 — SimHash near-dup: 60-bit md5-derived fingerprints (bit votes
    // from the first 15 hex chars of md5(token) — DuckDB-mirrorable, so
    // the oracle hash-checks the full pipeline), exact hamming<=3
    // retrieval via 4x15-bit pigeonhole banding. The xxhash64 64-bit
    // variant stays available as TextDedup.simhashPairs.
    "x7_simhash_dedup" -> ((s, dir) =>
      TextDedup.simhashMd5Pairs(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("hamming", col("hamming").cast("long"))),

    // x8 — exact n-gram Jaccard near-dup via inverted shingle index
    // (shuffles (shingle,id), never O(n^2) documents).
    "x8_ngram_jaccard" -> ((s, dir) =>
      TextDedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.5)),

    // x9 — embedding-cosine near-dup pairs above threshold.
    "x9_embedding_neardup" -> ((s, dir) =>
      Similarity.cosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.45)),

    // x10 — IVF-bucketed approximate nearest neighbors (deterministic
    // centroids = first 16 vectors; nprobe=2, k=3).
    "x10_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e.filter(col("vec_id") < 10), e,
        e.filter(col("vec_id") < 16), "vec_id", "embedding",
        k = 3, nprobe = 2)
    }),

    // x22 — IVF-blocked embedding near-dup: only same-bucket pairs are
    // scored (the O(n²)-free dedup path; the oracle mirrors the blocking).
    "x22_neardup_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfCosinePairs(e, e.filter(col("vec_id") < 16),
        "vec_id", "embedding", threshold = 0.4)
    }),

    // x11 — language ID: stopword-vote heuristic, first-dict-wins ties.
    "x11_langid" -> ((s, dir) =>
      TextAnalysis.langId(t(s, dir, "documents"), "doc_id", "text")),

    // x12 — quality scoring: length/punct/stopword components.
    "x12_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")),

    // x13 — token counting: whitespace + BPE-ish pre-tokenizer regex.
    "x13_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "doc_id", "text")),

    // x14 — winnowing-style fingerprint: 4 smallest shingle digests.
    "x14_fingerprint" -> ((s, dir) =>
      TextDedup.fingerprints(t(s, dir, "documents"), "doc_id", "text")),

    // x15 — multimodal plumbing: binary payload + metadata struct through
    // the partition-batched decoder chain (javax.imageio → PPM → stub);
    // the text/plain payloads land on the deterministic stub leg, which
    // the oracle mirrors. checksum dropped from the oracle surface (no
    // CRC32 in DuckDB).
    "x15_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(s,
          Multimodal.asMediaTable(t(s, dir, "documents")))
        .toDF()
        .select("doc_id", "n_bytes", "width", "height", "n_frames")),

    // x25 — TF-IDF top-3 terms per document. idf is rounded at 1e-4
    // BEFORE the tf multiply: ln() is not IEEE-correctly-rounded and JVM
    // vs DuckDB libm disagree by 1 ulp on ~0.1% of inputs (measured), so
    // comparing raw ln output would break hash-match; after a 1e-4
    // pre-round a boundary flip needs the true value within ~1 ulp of a
    // grid edge (~1e-11 per value). Division and multiplication are
    // IEEE-exact-rounded, hence bit-identical cross-engine.
    "x25_tfidf" -> ((s, dir) => TextAnalysis.tfidfTopTerms(
      t(s, dir, "documents"), "doc_id", "text", topK = 3)),

    // x26 — deterministic hash split: reproducible train/val/test corpus
    // assignment from md5(doc_id) — no RNG, so the split is stable across
    // engines, runs, and partitionings (the property a training pipeline
    // needs for held-out sets).
    "x26_hash_split" -> ((s, dir) => TextAnalysis.hashSplit(
      t(s, dir, "documents"), "doc_id").select("doc_id", "split")),

    // x31 — token-window chunking (64-token windows, stride 48): the
    // standard context-window preparation step of an LLM pretraining
    // pipeline, as a zero-shuffle per-row kernel + narrow explode.
    "x31_chunk_tokens" -> ((s, dir) => TextAnalysis.chunk(
      t(s, dir, "documents"), "doc_id", "text", size = 64, stride = 48)),

    // x33 — vocabulary construction: top-500 corpus terms by occurrence
    // count (tokenizer-training input); kernel term counts -> one
    // per-term aggregate -> TakeOrderedAndProject.
    "x33_vocab" -> ((s, dir) => TextAnalysis.vocabulary(
      t(s, dir, "documents"), "doc_id", "text", topK = 500)),

    // x34 — exact dedup APPLIED: the surviving corpus (min-id per
    // normalized-text hash) with group sizes — "dedup the corpus" as a
    // one-call operator, not just the group report (x1).
    "x34_dedup_apply" -> ((s, dir) =>
      TextDedup.dedupedCorpus(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "lang", "n_chars", "n_dups")),

    // x35 — repetition quality signals (Gopher-rule family): top-bigram
    // fraction + duplicate-trigram fraction per document, from one
    // per-row kernel pass (zero shuffles).
    "x35_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(t(s, dir, "documents"), "doc_id", "text")),

    // x36 — near-dup dedup APPLIED end-to-end: MinHash+LSH pairs ->
    // exact verify -> connected components -> drop non-representatives;
    // the surviving corpus is the result. Every stage is the banded /
    // bucketed scale path.
    "x36_neardup_apply" -> ((s, dir) =>
      TextDedup.neardupSurvivors(t(s, dir, "documents"), "doc_id", "text",
          k = 3, threshold = 0.8)
        .select("doc_id", "lang", "n_chars")),

    // x37 — deterministic stratified sampling (corpus mixing): keep 50%
    // of en, 20% of zh, 10% of everything else, chosen by md5(id) mod
    // 100 — reproducible, partition-independent, monotone in the rate.
    "x37_stratified_sample" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(t(s, dir, "documents"), "doc_id",
          "lang", Map("en" -> 50, "zh" -> 20), defaultPct = 10)
        .select("doc_id", "lang", "n_chars")),

    // x38 — benchmark decontamination: flag corpus docs whose 3-shingle
    // overlap with the held-out set (doc_id < 20 stands in for an eval
    // benchmark) reaches 3 shingles — the eval-leakage filter every
    // pretraining pipeline runs before training.
    "x38_decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextAnalysis.decontaminate(
        d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
        "doc_id", "text", k = 3, threshold = 3)
    }),

    // x40 — ensemble dedup: cluster on the UNION of near-dup signals
    // (text LSH pairs at jaccard>=0.8 plus embedding IVF pairs at
    // cos>=0.4, treating vec_id as the document's embedding id) — the
    // multi-signal clustering a production dedup pass runs, with every
    // edge generator the banded/bucketed scale path.
    "x40_ensemble_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents"); val e = t(s, dir, "embeddings")
      val textPairs = TextDedup
        .minhashLshPairs(d, "doc_id", "text", k = 3, threshold = 0.8)
        .select(col("doc1").as("a"), col("doc2").as("b"))
      val vecPairs = Similarity
        .ivfCosinePairs(e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", threshold = 0.4)
        .select(col("id1").as("a"), col("id2").as("b"))
      Components.connectedComponents(
          textPairs.union(vecPairs).distinct(), "a", "b")
        .select(col("node").as("doc_id"), col("component").as("cluster_rep"))
    }),

    // x41 — token entropy: lexical-diversity quality signal in nats
    // (composition of the ln-preround and decimal-sum float laws).
    "x41_token_entropy" -> ((s, dir) =>
      TextAnalysis.tokenEntropy(t(s, dir, "documents"), "doc_id", "text")),

    // x39 — embedding dedup APPLIED: the vector twin of x36 — IVF
    // near-dup pairs -> components -> drop non-representatives; the
    // surviving vector corpus is the result.
    "x39_embedding_dedup_apply" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.dedupedVectors(e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", threshold = 0.4)
        .select(col("vec_id"), size(col("embedding")).as("dim"))
    }),

    // x32 — near-dup pairs -> canonical dedup clusters, end-to-end on the
    // SCALE path: IVF-blocked edge generation (same-centroid-bucket pairs
    // only, as in x22 — no all-pairs join anywhere in the plan) feeding
    // connected components (min-label propagation); cluster_rep = min id
    // of the component ("keep rep, drop the rest" becomes one filter).
    // The all-pairs edge list remains available as x9 (the small-corpus /
    // oracle-exact variant).
    "x32_dedup_clusters" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val pairs = Similarity.ivfCosinePairs(e, e.filter(col("vec_id") < 16),
        "vec_id", "embedding", threshold = 0.4)
      Components.connectedComponents(pairs, "id1", "id2")
        .select(col("node").as("vec_id"), col("component").as("cluster_rep"))
    }),

    // x43 — directional containment dedup: |A∩B|/|A| >= 0.8 flags A as
    // (near-)contained in B — catches small-doc-inside-big-doc pairs
    // that symmetric Jaccard (x8) misses; asymmetric prefix filter, no
    // all-pairs join.
    "x43_containment_dedup" -> ((s, dir) =>
      TextDedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.8)),

    // x44 — Bloom-prefiltered decontamination (the 100 TB path of x38):
    // Spark's BloomFilterAggregate sketch of the benchmark 4-shingles
    // prunes the corpus shingle stream scan-side; the exact join then
    // kills Bloom false positives, so the result is bit-identical to the
    // unfiltered formulation and shares its exact oracle.
    "x44_bloom_decontam" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextAnalysis.decontaminateBloom(
        d.filter(col("doc_id") >= 30), d.filter(col("doc_id") < 30),
        "doc_id", "text", k = 4, threshold = 2)
    }),

    // x45 — exact-quota mixture sampling: rebalance the corpus to a
    // per-language document budget (en 60 / zh 25 / default 10),
    // deterministically (quota smallest md5 hashes per stratum) via the
    // salted grouped top-k.
    "x45_quota_sample" -> ((s, dir) =>
      TextAnalysis.quotaSample(t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 60, "zh" -> 25), defaultQuota = 10)
        .select(col("doc_id"), col("lang"), col("rank").cast("long")
          .as("rank"))),

    // x46 — concat-then-chunk offset index: every doc's token offset in
    // the deterministic hash-order concatenation of the corpus, via the
    // two-phase distributed prefix sum (static hash-bucket partitioning
    // + local windows + tiny bucket-offset broadcast — never Spark's
    // single-task global window).
    "x46_concat_offsets" -> ((s, dir) =>
      Packing.concatOffsets(t(s, dir, "documents"), "doc_id", "text")),

    // x47 — per-source TOKEN-budget cap: keep each source's md5-order
    // document prefix while the running token total fits the source's
    // budget. Rides the grouped two-phase prefix sum (groupedOffsets):
    // no source ever sorts in a single task.
    "x47_token_budget_mix" -> ((s, dir) =>
      TextAnalysis.tokenBudgetMix(t(s, dir, "documents"), "doc_id", "text",
        "source", Map("src0" -> 900L, "src1" -> 400L), defaultBudget = 700L)),

    // x48 — temperature mixture sampling: per-source quotas ∝ tokens^0.5
    // (the pretraining "temperature" reweighting that upsamples rare
    // sources), data-driven quotas feeding the salted grouped top-k.
    "x48_temperature_mix" -> ((s, dir) =>
      TextAnalysis.temperatureSample(t(s, dir, "documents"), "doc_id",
          "text", "source", alpha = 0.5, totalDocs = 120)
        .select(col("doc_id"), col("source"),
          col("rank").cast("long").as("rank"))),

    // x49 — deterministic epoch upsampling: src0 docs appear 2-3 times
    // (w=2.25: all twice, a deterministic md5-picked 25% a third time),
    // src1 is halved (w=0.5), the rest pass through once. Zero-shuffle
    // narrow explode.
    "x49_epoch_repeat" -> ((s, dir) =>
      TextAnalysis.epochRepeat(t(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 2.25, "src1" -> 0.5), defaultWeight = 1.0)),

    // x50 — passage-level boilerplate removal (the RefinedWeb/C4 "line
    // dedup" stage): 8-token passages occurring in >1 distinct document
    // are stripped from every document; survivors re-join in order.
    "x50_boilerplate_strip" -> ((s, dir) =>
      Cleaning.stripBoilerplate(t(s, dir, "documents"), "doc_id", "text",
        passageTokens = 8, maxDf = 1)),

    // x51 — corpus data card: per-(source, lang) docs/tokens/avg-length/
    // exact-dup-rate/token-share — the composition report of a training
    // mixture, one corpus aggregate + a 1-row broadcast total.
    "x51_data_card" -> ((s, dir) =>
      TextAnalysis.dataCard(t(s, dir, "documents"), "doc_id", "text",
        "source", "lang")),

    // x52 — positional winnowing (MOSS): window-min over the positional
    // 3-gram digest stream; pairs sharing >= 2 selected digests.
    // Guarantees shared runs of >= 6 tokens produce a shared
    // fingerprint — locality x14's global bottom-k sketch lacks.
    "x52_winnow_pairs" -> ((s, dir) =>
      TextDedup.winnowPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleK = 3, window = 4, minShared = 2)),

    // x53 — source lexical-similarity matrix: vocabulary Jaccard per
    // source pair (kernel-distinct terms; per-term join groups bounded
    // by the source count).
    "x53_source_similarity" -> ((s, dir) =>
      TextAnalysis.sourceSimilarity(t(s, dir, "documents"), "text",
        "source")),

    // x54 — train/test LEAKAGE audit: cross-split near-dup pairs
    // (jaccard >= 0.5 over 3-shingles) under the x26 md5 split, counted
    // per split pair — zero extra shuffles over the x8 pair stream.
    "x54_split_leakage" -> ((s, dir) =>
      TextAnalysis.splitLeakage(t(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.5)),

    // x55 — tokenizer-coverage / OOV rate vs the top-20 corpus vocab
    // (the fixture corpus has ~31 distinct terms, so a 20-term vocab
    // leaves a real OOV tail); vocab = x33 aggregate (K-bounded
    // collect), then one zero-shuffle hash-probe kernel pass.
    "x55_oov_rate" -> ((s, dir) =>
      TextAnalysis.oovRate(t(s, dir, "documents"), "doc_id", "text",
        vocabSize = 20)),

    // x57 — uniform frame sampling: decode + explode fused in ONE
    // partition-batched pass (no join back to the payload, no shuffle);
    // handles = md5(md5(payload) + '#' + idx). StubDecoder is passed
    // EXPLICITLY: the oracle hard-codes the stub byte formulas, so the
    // registration must not ride the ImageIoDecoder→Ppm→Stub chain — a
    // fixture text that happened to start like a P6 header would
    // silently take the real-decode leg and diverge from the oracle.
    "x57_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(s,
          Multimodal.asMediaTable(t(s, dir, "documents")), targetFrames = 4,
          decoder = Multimodal.StubDecoder)
        .toDF()),

    // x58 — aspect-preserving resize plan (no upscale) into a 320x240
    // box: pure integer/IEEE projection over the decoded dims.
    // StubDecoder explicit for the same oracle-coupling reason as x57.
    "x58_resize_plan" -> ((s, dir) =>
      Multimodal.resizePlan(
        Multimodal.extractFeatures(s,
          Multimodal.asMediaTable(t(s, dir, "documents")),
          decoder = Multimodal.StubDecoder).toDF(),
        targetW = 320, targetH = 240)),

    // x59 — perceptual-hash IMAGE near-dup (the multimodal half of the
    // dedup brief): deterministic 7x10 P6 images derived from the text
    // corpus drive the REAL PPM byte parse — each document paired with a
    // re-encoded copy (different header bytes, pixel 0 inverted) that
    // shares no payload bytes yet differs in <= 1 dHash gradient bit —
    // then 60-bit dHash fingerprints pair via the x7 pigeonhole at
    // hamming <= 3. The DEFAULT decoder chain runs here (unlike x57/x58
    // there is no stub formula to protect: the oracle recomputes pixels
    // from the text, so a wrong parse leg diverges and fails the check).
    "x59_image_neardup" -> ((s, dir) =>
      ImageDedup.nearDupPairs(s,
        Multimodal.syntheticPpmPairs(s, t(s, dir, "documents"), "doc_id",
          "text", copyOffset = 1000000L))),

    // x60 — PII redaction (cleaning family): emails / phones / IPv4 →
    // placeholder tokens with per-category counts. The fixture corpus
    // carries no PII (verified at every SF), so each document is
    // augmented with a deterministic doc_id-derived contact line —
    // every row does real redaction work (email always; phone on even
    // ids; IP on ids not divisible by 3), reproduced verbatim
    // oracle-side. The email embeds the doc id's digits, checking the
    // email-before-phone sequencing.
    "x60_pii_redaction" -> ((s, dir) =>
      Cleaning.redactPii(
        t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" reach doc"), col("doc_id").cast("string"),
            lit("@mail.example.com"),
            when(pmod(col("doc_id"), lit(2)) === 0,
              concat(lit(" tel 555-123-"),
                lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(3)) =!= 0,
              concat(lit(" from 10."),
                pmod(col("doc_id"), lit(200)).cast("string"),
                lit(".0."), pmod(col("doc_id"), lit(250)).cast("string")))
              .otherwise(lit(""))).as("text")),
        "text")
      .select(col("doc_id"), col("text").as("clean_text"),
        col("n_pii_emails"), col("n_pii_phones"), col("n_pii_ips"))),

    // x63 — image dedup APPLIED: the multimodal twin of x36/x39's apply
    // forms — dHash pairs -> connected components -> keep min-id
    // representative per cluster + singletons, on the same synthetic
    // PPM corpus as x59 (each doc + its re-encoded copy collapse to the
    // original). Survivors as (doc_id, fp) — the fingerprint is the
    // cross-engine-comparable content artifact.
    "x63_image_dedup_apply" -> ((s, dir) =>
      ImageDedup.dedupedImages(s,
        Multimodal.syntheticPpmPairs(s, t(s, dir, "documents"), "doc_id",
          "text", copyOffset = 1000000L))),

    // x64 — image quality signals from REAL decoded pixels (the x12
    // analog for the image half): brightness mean / contrast std /
    // aspect per image over the synthetic PPM corpus; exact-integer
    // sums -> one IEEE sqrt+divide -> 1e-4 grid.
    "x64_image_stats" -> ((s, dir) =>
      Multimodal.imageStats(s,
        Multimodal.syntheticPpmPairs(s, t(s, dir, "documents"), "doc_id",
          "text", copyOffset = 1000000L)).toDF()),

    // x66 — audio stream properties via the REAL RIFF/WAVE byte parse
    // (the audio analog of the PPM leg): synthetic PCM WAVs whose
    // header fields are closed-form functions of driver columns — the
    // Spark side must parse the bytes it built; the oracle recomputes
    // the stats from the formulas with no RIFF parser. Exact integer
    // math throughout (duration = floor(n*1000/rate)).
    "x66_audio_stats" -> ((s, dir) =>
      Multimodal.audioStats(s,
        Multimodal.syntheticWavTable(s, t(s, dir, "documents"), "doc_id",
          "n_chars")).toDF()),

    // x67 — audio CONTENT dedup (the audio half of the multimodal dedup
    // brief, image half = x59/x63): md5 over the data chunk's sample
    // bytes located by the real RIFF walk — each document's canonical
    // mono-8kHz encoding groups with its re-encoded copy (stereo-16kHz
    // header + injected LIST chunk; zero shared container bytes,
    // identical samples), the x1 exact-dedup output shape.
    "x67_audio_dedup" -> ((s, dir) =>
      Multimodal.audioFingerprints(s,
          Multimodal.syntheticWavPairs(s, t(s, dir, "documents"), "doc_id",
            "text", copyOffset = 1000000L))
        .groupBy(col("audio_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))),

    // x62 — DOMAIN-granular source neighbors: the LSH-banded scale path
    // sourceSimilarity's maxSources guard names, run on 140 derived
    // strata (source × doc_id%7 — per-stratum vocab subsampling gives a
    // real 0.80-1.0 jaccard spread, unlike the full corpus where every
    // source sees the whole vocab). Aggregated minhash signatures ->
    // banded candidates -> exact verify at >= 0.95; the oracle is the
    // x53 matrix on the same strata plus the threshold filter (x2's
    // no-false-negatives-at-calibration convention).
    "x62_source_neighbors" -> ((s, dir) =>
      TextAnalysis.sourceNeighbors(
        t(s, dir, "documents").withColumn("stratum",
          concat(col("source"), lit("_"),
            pmod(col("doc_id"), lit(7)).cast("string"))),
        "text", "stratum", threshold = 0.95)),

    // x61 — sequence packing, registered: the deterministic md5-bucketed
    // next-fit form over the x31 chunk stream (64-token windows, stride
    // 48; 200-token packs). Shares packChunks' placement core, but the
    // hash-order-within-bucket rule makes the assignment a pure function
    // of the data, so the oracle can simulate it with a recursive
    // per-bucket scan — the packing family's first driver-checked row.
    "x61_pack_chunks" -> ((s, dir) =>
      Packing.packDeterministic(s,
        TextAnalysis.chunk(t(s, dir, "documents"), "doc_id", "text",
            size = 64, stride = 48)
          .withColumn("n_tokens", size(split(col("chunk"), " "))),
        budget = 200).toDF()),

    // x68 — tokenizer-training prep: corpus-wide adjacent-token-pair
    // (bigram) frequencies — the statistic a BPE trainer's first merge
    // iteration ranks — plus document frequency; top-50 cut with
    // deterministic pair tie-break. One hash aggregate with map-side
    // combine; the cut plans as TakeOrderedAndProject, never a global
    // sort.
    "x68_bigram_stats" -> ((s, dir) =>
      TextAnalysis.bigramCounts(t(s, dir, "documents"), "doc_id", "text",
        topK = 50)),

    // x69 — model-scored classifier gate: linear bag-of-words score
    // with the deterministic md5-surrogate weights (a learned weight
    // table plugs the same seam — fake model, real dataflow, as the
    // multimodal StubDecoder), keep at score >= 0. Zero-shuffle
    // per-row projection.
    "x69_classifier_gate" -> ((s, dir) =>
      Classifier.gate(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.0)),

    // x70 — kNN label propagation: vec_id % 5 == 0 plays the unlabeled
    // query set, the rest the labeled seed corpus; k=5 neighbors inside
    // nprobe=2 IVF buckets (fixed vec_id<16 codebook, as x10/x22);
    // majority vote, ties to the smallest label.
    "x70_knn_label" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.knnLabel(
        e.filter(pmod(col("vec_id"), lit(5)) === 0),
        e.filter(pmod(col("vec_id"), lit(5)) =!= 0),
        e.filter(col("vec_id") < 16),
        "vec_id", "embedding", "label", k = 5, nprobe = 2)
    }),

    // x71 — shard manifest: deterministic md5-order global shuffle cut
    // into 64-doc shards, one manifest row per shard (doc count, token
    // total, key range). The global rank is the two-phase bucket
    // prefix pattern — no global sort, no corpus-sized window.
    "x71_shard_manifest" -> ((s, dir) =>
      Packing.shardManifest(t(s, dir, "documents"), "doc_id", "text",
        shardSize = 64)),

    // x72 — int8 scalar quantization report per embedding: symmetric
    // scale max|v|/127; the quantized grid uses an explicit half-up
    // floor so it is engine-identical; RMSE on the 1e-6 grid; the
    // q_max <= 127 invariant exposed as a column.
    "x72_quantize_embeddings" -> ((s, dir) =>
      Similarity.quantizeReport(t(s, dir, "embeddings"), "vec_id",
        "embedding")),

    // x74 — incremental EXACT dedup (the continuous-ingestion shape):
    // existing corpus = even ids; the new batch is every doc_id%3==0
    // text twice (offsets 1M/2M — the synthetic-pairs convention), so
    // intra-batch collapse picks the 1M rep and the cross anti-join
    // then drops every text the even half already has.
    "x74_incremental_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val third = d.filter(pmod(col("doc_id"), lit(3)) === 0)
      val batch = third
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(third
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      TextDedup.incrementalExactDedup(batch,
        d.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
    }),

    // x75 — incremental NEAR-dup dedup: odd ids (re-keyed +1M) play the
    // new batch, even ids the existing corpus; cross-banded MinHash
    // candidates, exact Jaccard verify at >= 0.8 (the fixture has a
    // real cross-parity near-dup population), survivors = batch minus
    // matches. Oracle = exact cross pairs (x2's no-false-negatives-at-
    // calibration convention).
    "x75_incremental_neardup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextDedup.crossNeardupSurvivors(
        d.filter(pmod(col("doc_id"), lit(2)) === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
        d.filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", k = 3, threshold = 0.8)
    }),

    // x76 — malformed-record quarantine over the events JSON payloads,
    // with injected corruption (the synthetic-fixture convention) so
    // every verdict class has a real population: id%7==1 not JSON,
    // ==2 missing the required key, ==3 wrong type. Both engines use
    // try_cast's null-on-miscast to express the verdict as data.
    "x76_quarantine" -> ((s, dir) => {
      val corrupted = t(s, dir, "events").select(col("event_id"),
        when(pmod(col("event_id"), lit(7)) === 1, lit("oops{"))
          .when(pmod(col("event_id"), lit(7)) === 2, lit("""{"other": 1}"""))
          .when(pmod(col("event_id"), lit(7)) === 3, lit("""{"k": "bad"}"""))
          .otherwise(col("props")).as("props"))
      // keepParsedAs: k_value extracts from the SAME parse the verdict
      // used — the whole query parses each payload exactly once
      Project.quarantineJson(corrupted, "props",
          Seq("k" -> org.apache.spark.sql.types.LongType),
          keepParsedAs = Some("_parsed"))
        .select(col("event_id"), col("verdict"),
          try_variant_get(col("_parsed"), "$.k", "string").try_cast("long")
            .as("k_value"))
    }),

    // x77 — split-aware shard export: hash split (x26) then an
    // INDEPENDENT md5-order shard layout per split (rank and shard
    // numbering restart per group; 32-doc shards) — the export index a
    // trainer reads per split. Every window partitions by (split,
    // bucket); offsets roll up per split — nothing global anywhere.
    "x77_split_shards" -> ((s, dir) =>
      Packing.groupedShardManifest(
        TextAnalysis.hashSplit(t(s, dir, "documents"), "doc_id"),
        "doc_id", "text", "split", shardSize = 32)),

    // x78 — run-collapse de-repetition (the removal counterpart of
    // x35's signals): runs of the same token longer than 1 truncate to
    // their first occurrence; the fixture corpus has real runs
    // ("batch batch batch"), so n_removed has a live population.
    "x78_collapse_runs" -> ((s, dir) =>
      Cleaning.collapseRuns(t(s, dir, "documents"), "doc_id", "text")),

    // x79 — classifier scoring through the WEIGHT-TABLE join path (the
    // large-model form of the x69 seam): the weight table is the
    // corpus's own vocabulary with the surrogate weights, so the scores
    // equal x69's bit-for-bit while the PLAN under test is the
    // token-explode + join + mean aggregate.
    "x79_classifier_join" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val vocab = d
        .select(explode(graft.functions.Text.tokens(col("text")))
          .as("term"))
        .distinct()
        .withColumn("weight", Classifier.hashedWeight(col("term")))
      Classifier.scoreWithTable(d, "doc_id", "text", vocab)
    }),

    // x80 — x75 through its PERSISTED band-index artifact: the existing
    // (even-id) corpus's shingle sets + LSH band hashes are built ONCE
    // per fixture as bucketed catalog tables (the prior ingest run's
    // output), and the query proper joins the batch against them with
    // zero recompute — and zero text scan — on the existing side. Same
    // rows as x75 (same oracle); the PLAN is the production shape.
    // Build-if-missing keys the table names to the fixture dir, so
    // sf0.01 and sf0.1 never collide.
    "x80_neardup_indexed" -> ((s, dir) => {
      val (sets, bands) = neardupIndexFor(s, dir)
      val d = t(s, dir, "documents")
      TextDedup.crossNeardupSurvivorsIndexed(
        d.filter(pmod(col("doc_id"), lit(2)) === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
        "doc_id", "text", k = 3, threshold = 0.8, sets, bands)
    }),

    // x81 — x74 through its persisted digest index (same pairing): the
    // existing corpus contributes one bucketed digest table; the batch
    // dedups within itself and anti-joins the index. Same oracle as
    // x74.
    "x81_dedup_indexed" -> ((s, dir) => {
      val digests = digestIndexFor(s, dir)
      val d = t(s, dir, "documents")
      val third = d.filter(pmod(col("doc_id"), lit(3)) === 0)
      val batch = third
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionByName(third
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      TextDedup.incrementalExactDedupIndexed(batch, "doc_id", "text",
        digests)
    }),

    // x82 — BPE merge TRAINING (the iterative loop x68's one-round
    // bigram statistic feeds): 6 rounds of pair-count → argmax →
    // merge-apply over the frequency-weighted vocabulary. The corpus is
    // read once (word counts); the oracle unrolls the same 6 rounds as
    // chained CTEs with DuckDB's replace() — both engines' replace scan
    // left-to-right non-overlapping, which IS the BPE merge rule.
    "x82_bpe_merges" -> ((s, dir) =>
      Bpe.merges(t(s, dir, "documents"), "text", rounds = 6)),

    // x83 — substring-SPAN exact dedup (the suffix-array family):
    // every maximal >= 8-token span that occurs elsewhere in the
    // corpus, emitted as (doc, span_start, span_len) removal decisions
    // for all but the globally-first occurrence. The exact duplicate
    // population of the fixture (x1's groups) plus its long shared
    // prefixes give every stage a live population.
    "x83_span_dedup" -> ((s, dir) =>
      TextDedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        spanTokens = 8)),

    // x84 — BPE ENCODE: x82's trained merge table applied back to the
    // corpus as a zero-shuffle per-row projection (train on the vocab,
    // encode the corpus — the tokenizer-prep pair). Per-doc subtoken
    // counts are what packing budgets (x46/x61) consume.
    "x84_bpe_encode" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Bpe.encodeStats(d, "doc_id", "text",
        Bpe.mergeList(d, "text", rounds = 6))
    }),

    // x85 — paragraph-level dedup (the CCNet recipe): repeated
    // 12-token chunks are dropped everywhere but their globally-first
    // occurrence and each document is REASSEMBLED from its survivors —
    // the document keeps its unique material (vs x1 dropping whole
    // docs, vs x83 emitting span verdicts without the rewrite). The
    // fixture's exact-duplicate groups make whole documents collapse
    // (n_kept = 0) while shared prefixes shed only their head chunks.
    "x85_paragraph_dedup" -> ((s, dir) =>
      TextDedup.dedupParagraphs(t(s, dir, "documents"), "doc_id", "text",
        chunk = 12)),

    // x86 — bigram LM quality score (CCNet's KenLM-perplexity signal,
    // add-one smoothed, trained on the corpus itself): mean
    // log-probability of each document's token transitions. ln()
    // pre-rounded on the 1e-4 grid before the multiplicity multiply
    // (x25/x33 convention) so both engines fold identical addends.
    "x86_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLmScores(t(s, dir, "documents"), "doc_id",
        "text")),

    // x87 — span SURGERY: x83's (doc, span) removal decisions applied
    // back to the corpus (the decisions/apply pairing of x1/x34) — a
    // per-row positional cut after one doc-id join; exact-duplicate
    // docs come out empty, partial overlaps keep their unique material.
    "x87_span_apply" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextDedup.applySpanRemovals(d, "doc_id", "text",
        TextDedup.duplicateSpans(d, "doc_id", "text", spanTokens = 8))
    }),

    // x88 — ANN over the int8-quantized grid (the search half of the
    // x-series quantize report): scales cancel in the quantized cosine,
    // so ranking derives from exact integer sums — same query set and
    // window shape as x3, 4x less data on the scan side at scale.
    "x88_quantized_ann" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.quantizedTopK(e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
    }),

    // x89 — LM-curation composition: paragraph dedup, THEN the bigram
    // LM trained on the deduped text, then the quality gate — the
    // stage order (dedup before LM training) is what the oracle checks;
    // a pipeline that trains on raw text lets duplicated paragraphs
    // score themselves fluent.
    "x89_lm_curate" -> ((s, dir) =>
      CorpusPipeline.lmCurate(t(s, dir, "documents"), "doc_id", "text",
        chunk = 12, minLogprob = -3.4)),

    // x90 — k-means codebook TRAINING (Lloyd rounds over the 1e-6
    // integer grid): the IVF family's missing front — x10/x22/x70
    // consume a centroid table, this trains one. Seeds = the 8 smallest
    // vec_ids; 3 assignment→mean rounds; output is the final
    // per-vector assignment. The grid makes every mean an exact
    // integer sum, so both engines fold identical doubles (see
    // Similarity.kmeansCodebook's determinism note).
    "x90_kmeans_codebook" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.kmeansCodebook(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", rounds = 3)
    }),

    // x91 — x10 through its PERSISTED IVF index (the x80/x81 pairing on
    // the embedding side): the codebook + the centroid-bucketed
    // assignment table (vectors WITH pre-computed norms) are catalog
    // artifacts built once per snapshot; the query probes buckets and
    // recomputes nothing about the corpus. Same rows as x10 — shared
    // oracle.
    "x91_ann_indexed" -> ((s, dir) => {
      val (assignT, centT) = annIndexFor(s, dir)
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopKIndexed(e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nprobe = 2, assignT, centT)
    }),

    // x92 — incremental EMBEDDING near-dup over the persisted index:
    // the x74/x75/x80 continuous-ingestion pairing on the vector side.
    // Existing corpus = even vec_ids (indexed, 16 even centroids);
    // batch = odd vec_ids; a batch vector probing 2 buckets drops when
    // any indexed vector there reaches cosine 0.4. The oracle mirrors
    // the probe list exactly (blocking is approximate BY CONSTRUCTION,
    // as in x22).
    "x92_embedding_dedup_indexed" -> ((s, dir) => {
      val (assignT, centT) = annDedupIndexFor(s, dir)
      val e = t(s, dir, "embeddings")
      Similarity.embeddingSurvivorsIndexed(
        e.filter(pmod(col("vec_id"), lit(2)) === 1),
        "vec_id", "embedding", threshold = 0.4, nprobe = 2,
        assignT, centT)
        .select(col("vec_id"))
    }),

    // x93 — dedup-aware split: split by near-dup CLUSTER (x8 pairs →
    // components → rep's split label), the constructive fix for the
    // leakage x54 audits — near-dups cannot straddle splits because
    // they share a rep. Same k/threshold as x54 so the two queries
    // describe the same near-dup graph.
    "x93_cluster_split" -> ((s, dir) =>
      CorpusPipeline.clusterSplit(t(s, dir, "documents"), "doc_id",
        "text", k = 3, threshold = 0.5)),

    // x94 — the SELF-TRAINED ANN stack end-to-end: x90 trains the
    // codebook (8 seeds, 3 Lloyd rounds), the index is built under the
    // LEARNED centroids, x91's indexed query runs against it. The
    // oracle chains the x90 CTEs into the x10 query shape — the one
    // statement checks training AND search agree across engines.
    "x94_selftrained_ann" -> ((s, dir) => {
      val (assignT, centT) = annKmeansIndexFor(s, dir)
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopKIndexed(e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nprobe = 2, assignT, centT)
    }),

    // x95 — span-level DECONTAMINATION (the surgery form of x38/x44's
    // verdicts, x83's machinery vs a benchmark): maximal ≥8-token
    // corpus spans appearing verbatim in the benchmark (doc_id < 30,
    // x44's split), as removal decisions x87 can apply. ANY benchmark
    // hit is contamination — no first-occurrence exemption.
    "x95_contaminated_spans" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextDedup.contaminatedSpans(d.filter(col("doc_id") >= 30),
        d.filter(col("doc_id") < 30), "doc_id", "text", spanTokens = 8)
    }),

    // x96 — TOKENIZER-AWARE packing offsets: x84's BPE subtoken counts
    // drive x46's concat-offset index, so packing budgets measure what
    // the trainer consumes (subtokens), not the whitespace proxy. The
    // x82→x84→x46 chain is the full tokenizer-prep story in one query.
    "x96_bpe_offsets" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Packing.concatOffsetsBy(
        Bpe.encodeStats(d, "doc_id", "text",
          Bpe.mergeList(d, "text", rounds = 6)),
        "doc_id", "n_subtokens")
    }),

    // x97 — near-dup cluster size histogram: the data-card companion
    // for the dedup family (how redundant IS the corpus) — x93's rep
    // frame folded to (cluster_size, n_clusters), singletons included
    // as size-1 clusters.
    "x97_dedup_stats" -> ((s, dir) =>
      CorpusPipeline.dedupClusterStats(t(s, dir, "documents"), "doc_id",
        "text", k = 3, threshold = 0.5)),

    // x98 — BM25 top-k lexical retrieval: the sparse complement of the
    // ANN family — rank the corpus against a bag of query terms, only
    // query-term postings ever shuffle, top-k as TakeOrderedAndProject.
    "x98_bm25_topk" -> ((s, dir) =>
      Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("join", "hash", "window", "spark"), topK = 50)),

    // x99 — per-source quality cap (the Gopher-style domain budget):
    // keep each source's 10 BEST documents by the x12 quality score —
    // merit-ranked where x45's quota sampler is hash-ranked.
    "x99_source_cap" -> ((s, dir) =>
      Retrieval.sourceQualityCap(t(s, dir, "documents"), "doc_id", "text",
        "source", maxPerSource = 10)),

    // x100 — contamination attribution: the pair-level evidence behind
    // x38's verdicts — WHICH corpus docs share ≥3 distinct 3-shingles
    // with WHICH benchmark items (doc_id < 20 = the benchmark, the x38
    // split).
    "x100_contam_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Retrieval.contaminationPairs(d.filter(col("doc_id") >= 20),
        d.filter(col("doc_id") < 20), "doc_id", "text", k = 3,
        threshold = 3)
    }),

    // x101 — IVF index balance audit: per-centroid bucket sizes + load
    // factors over the x10/x22 codebook (vec_id < 16) — the health
    // report that surfaces hot buckets (probe slowdown multiples) and
    // dead codebook entries.
    "x101_ivf_balance" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfBalanceReport(e, e.filter(col("vec_id") < 16),
        "vec_id", "embedding")
    }),

    // x102 — tokenizer compression ratio by language: subtokens/word of
    // the x82-trained merge list (6 rounds, the x84 convention) per
    // lang — the acceptance metric for a tokenizer on a multilingual
    // mix, and the words→tokens conversion factor the packing budgets
    // (x46/x47/x61) consume.
    "x102_bpe_compression" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Bpe.compressionByGroup(d, "doc_id", "text", "lang",
        Bpe.mergeList(d, "text", rounds = 6))
    }),

    // x103 — quality-ordered curriculum phases: exact global rank under
    // (x12 score desc, id) via deterministic static score-range buckets
    // (no global sort, no sampled boundaries), phase = quartile of rank.
    "x103_curriculum" -> ((s, dir) =>
      TextAnalysis.curriculumPhases(t(s, dir, "documents"), "doc_id",
        "text", nPhases = 4)),

    // x104 — n-gram novelty: fraction of each doc's distinct 3-shingles
    // unique to it corpus-wide (df=1) — the diversity-contribution
    // signal complementing the pairwise dedup family.
    "x104_novelty" -> ((s, dir) =>
      TextAnalysis.noveltyScores(t(s, dir, "documents"), "doc_id",
        "text", k = 3)),

    // x105 — Unicode NFC canonicalization + control strip. The ASCII
    // fixture would make the op an identity, so every row is augmented
    // with a decomposed "é" (e + U+0301) and a BEL control char —
    // mirrored in the oracle — making the normalize+strip observable on
    // every row (changed = 1 corpus-wide).
    "x105_nfc_clean" -> ((s, dir) =>
      Cleaning.nfcClean(
        t(s, dir, "documents").withColumn("text",
          concat(col("text"), lit(" caf"), lit("e\u0301"), lit("\u0007"))),
        "doc_id", "text")),

    // x106 — per-source distribution drift: KL(source ‖ corpus) over
    // the corpus top-200 unigram vocabulary — the mixture-monitoring
    // audit (a drifting source surfaces here before loss curves).
    "x106_source_drift" -> ((s, dir) =>
      TextAnalysis.sourceDrift(t(s, dir, "documents"), "doc_id", "text",
        "source", vocabSize = 200)),

    // x107 — x98 through its PERSISTED BM25 index (the x80/x91 pairing
    // on the retrieval side): postings bucketed by term + a 1-row
    // length-stats table are built once per fixture; the query proper
    // scans only the query terms' buckets — zero text-kernel work, zero
    // corpus text scans. Same rows as x98 (same oracle).
    "x107_bm25_indexed" -> ((s, dir) => {
      val (post, stats) = bm25IndexFor(s, dir)
      Retrieval.bm25TopKIndexed(s, post, stats,
        queryTerms = Seq("join", "hash", "window", "spark"), topK = 50)
    }),

    // x108 — per-source duplication mass: the data-card composition of
    // x97's cluster machinery with source + token counts — how much of
    // each SOURCE is near-dup mass, in docs and tokens (same k=3,
    // threshold=0.5 graph as x93/x97).
    "x108_source_duplication" -> ((s, dir) =>
      CorpusPipeline.sourceDuplication(t(s, dir, "documents"), "doc_id",
        "text", "source", k = 3, threshold = 0.5)),

    // x109 — cross-source near-dup matrix: WHERE the duplicated mass
    // travels — near-dup pair counts per unordered source pair over
    // the same x8 graph (syndication audit; x53 is vocabulary overlap,
    // this is document-level duplication).
    "x109_cross_source_dups" -> ((s, dir) =>
      CorpusPipeline.crossSourceDuplication(t(s, dir, "documents"),
        "doc_id", "text", "source", k = 3, threshold = 0.5)),

    // x110 — x104 through its PERSISTED gram-df index (the x107
    // pairing on the novelty side): document frequencies come from a
    // hash-bucketed vocabulary-scale table built once per fixture; the
    // query pays one batch text scan, no df aggregate, no DISK_ONLY
    // gram pin. Same rows as x104 (same oracle).
    "x110_novelty_indexed" -> ((s, dir) =>
      TextAnalysis.noveltyScoresIndexed(s, t(s, dir, "documents"),
        "doc_id", "text", k = 3, noveltyIndexFor(s, dir))),

    // x111 — Zipf power-law audit: least-squares ln(freq)~ln(rank) fit
    // over the top-200 vocabulary — the one-row corpus-health number
    // (natural text ≈ slope −1, high r²; templated mass bends it).
    "x111_zipf_audit" -> ((s, dir) =>
      TextAnalysis.zipfAudit(t(s, dir, "documents"), "text",
        vocabSize = 200)),

    // x112 — per-source sequence-length histogram: doc counts + token
    // mass per (source, power-of-2 length bucket) — what the packing
    // budgets (x46/x61) plan against; bucket = exact integer binary
    // digit count, no floating log2.
    "x112_length_histogram" -> ((s, dir) =>
      TextAnalysis.lengthHistogram(t(s, dir, "documents"), "doc_id",
        "text", "source")),

    // x113 — mixture token-share entropy: Shannon entropy of per-source
    // token mass + its ln(#sources)-normalized balance — the scalar the
    // quota samplers (x45/x47) move.
    "x113_mix_entropy" -> ((s, dir) =>
      TextAnalysis.mixEntropy(t(s, dir, "documents"), "doc_id", "text",
        "source")),

    // x114 — exact score quantiles via the x103 bucketed-rank
    // machinery: the document at ascending rank ceil(q·N) for each
    // q — gate-threshold calibration with NO global sort and NO
    // percentile_approx error at the tails.
    "x114_score_quantiles" -> ((s, dir) =>
      TextAnalysis.scoreQuantiles(t(s, dir, "documents"), "doc_id",
        "text", quantiles = Seq(0.1, 0.25, 0.5, 0.75, 0.9))),

    // x115 — per-source EXACT-dup savings (x108's exact-tier row):
    // docs/tokens each source sheds under x1's keep rule alone; the
    // gap to x108 prices the fuzzy-matching stage.
    "x115_exact_dup_savings" -> ((s, dir) =>
      CorpusPipeline.exactDupSavings(t(s, dir, "documents"), "doc_id",
        "text", "source")),

    // x116 — quality-keep cluster representatives: x93's component
    // machinery with the keep rule production dedup wants — each
    // near-dup cluster keeps its highest-quality member (x12 score,
    // min-id tie-break), not whichever copy crawled first. SERVED
    // from the persisted component table (built once per fixture —
    // the x123 frozen-books pattern): the shingle→pair→components
    // walk never runs at query time, same oracle.
    "x116_quality_reps" -> ((s, dir) =>
      CorpusPipeline.qualityRepsIndexed(t(s, dir, "documents"), "doc_id",
        "text", s.table(neardupComponentsFor(s, dir)))),

    // x117 — token-budget mixture plan: √mass temperature weights
    // (α=0.5) allocate a 500k-token budget across sources; planned =
    // min(target, mass), deficit prices re-epoching.
    "x117_mixture_plan" -> ((s, dir) =>
      TextAnalysis.mixturePlan(t(s, dir, "documents"), "doc_id", "text",
        "source", budgetTokens = 500000L)),

    // x118 — per-source PII incidence audit: x60's exact patterns and
    // pass order, rolled up to the data-card row that prices the
    // cleaning stage per source. The fixture carries no natural PII,
    // so x60's deterministic augmentation line is applied first (same
    // expression, oracle-mirrored) — every source shows real counts.
    "x118_pii_rate" -> ((s, dir) =>
      Cleaning.piiRate(piiAugment(t(s, dir, "documents")), "text",
        "source")),

    // x119 — quantile-calibrated quality gate: the threshold is the
    // corpus's own exact p25 score (x114's machinery), so the gate
    // self-calibrates; ties at the bar all survive.
    "x119_calibrated_gate" -> ((s, dir) =>
      TextAnalysis.calibratedGate(t(s, dir, "documents"), "doc_id",
        "text", q = 0.25)),

    // x120 — product-quantization codes: 4 per-subspace 8-codeword
    // codebooks (2 Lloyd rounds, integer-exact L2 on the 1e-6 grid)
    // compress each 64-float vector to 4 codes — the RAM-resident
    // billion-vector layout (Jégou et al. 2011 / FAISS IVF-PQ).
    "x120_pq_codes" -> ((s, dir) =>
      Similarity.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding",
        m = 4, k = 8, rounds = 2)),

    // x121 — asymmetric-distance (ADC) top-k over those codes: each
    // query scores the whole corpus via m table lookups + integer adds
    // per vector, never a 64-float walk. Serves under the FIXTURE's
    // trained books (pqIndexFor — x120's exact knobs, deterministic
    // pqFit => identical rows to inline training, same oracle): the
    // suite trains the m=4/k=8/rounds=2 model ONCE; x120/x129 remain
    // the training exhibits. Unlike x124 the corpus is still encoded
    // inline — this is the frozen-books scoring path, not the
    // persisted-codes one.
    "x121_pq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqTopKWithBooks(s, e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", pqIndexFor(s, dir)._2, topK = 5)
    }),

    // x122 — PQ distortion report: per-subspace quantization error
    // (each vector's exact L2 to its own codeword) — the codebook
    // acceptance metric; x101's role for PQ. Audits the FIXTURE's
    // trained books without retraining (the production drift-watch
    // form — an audit must not recompute the model it is auditing;
    // x128's convention): identical rows to the inline-training form,
    // same oracle.
    "x122_pq_distortion" -> ((s, dir) =>
      Similarity.pqDistortionWithBooks(s, t(s, dir, "embeddings"),
        "vec_id", "embedding", pqIndexFor(s, dir)._2)),

    // x123 — IVF-PQ: the composed FAISS layout — x10's bucket pruning
    // picks WHICH vectors a query touches, x121's ADC prices WHAT each
    // one costs; one corpus scan emits (bucket, codes). Serves under
    // the FIXTURE's trained books (ivfPqIndexFor — the same knobs, so
    // identical rows and the same oracle; the x121/x122/x130
    // train-once convention): x120/x129 remain the training exhibits,
    // and unlike x127 the (bucket, codes) scan is still inline — this
    // is the frozen-books fresh-snapshot path, not the persisted-codes
    // one.
    "x123_ivf_pq_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqTopKWithBooks(s, e.filter(col("vec_id") < 10), e,
        e.filter(col("vec_id") < 16), "vec_id", "embedding",
        ivfPqIndexFor(s, dir)._2, topK = 5, nprobe = 2)
    }),

    // x124 — x121 through its PERSISTED index (the x91/x107/x110
    // pairing on the PQ side): codebooks + codes built once per
    // fixture; the query pays zero training and never touches a
    // corpus embedding. Same rows as x121 (same oracle).
    "x124_pq_indexed" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val (codes, books) = pqIndexFor(s, dir)
      Similarity.pqTopKIndexed(s, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", codes, books, topK = 5)
    }),

    // x125 — quality-score histogram: the mass between x114's exact
    // cut points; a distribution collapsing into one bucket means
    // retune the score, not the threshold.
    "x125_score_histogram" -> ((s, dir) =>
      TextAnalysis.scoreHistogram(t(s, dir, "documents"), "doc_id",
        "text", buckets = 20)),

    // x126 — curriculum phase × source matrix: what each x103 phase
    // is made of — if phase 0 is one source wall-to-wall, the
    // curriculum is a source filter in disguise.
    "x126_phase_source_matrix" -> ((s, dir) =>
      TextAnalysis.phaseSourceMatrix(t(s, dir, "documents"), "doc_id",
        "text", "source", nPhases = 4)),

    // x127 — x123 through its PERSISTED index (the x91+x124 pins
    // COMPOSED): coarse codebook + PQ books + bucketed codes built once
    // per fixture; the query pays zero training, reads no embedding,
    // and bucket-prunes to its probed centroids. Same rows as x123
    // (same oracle).
    "x127_ivf_pq_indexed" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val (codes, books, cent) = ivfPqIndexFor(s, dir)
      Similarity.ivfPqTopKIndexed(s, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", codes, books, cent, topK = 5, nprobe = 2)
    }),

    // x128 — ANN recall@k audit: fraction of the EXACT top-k each
    // approximate method (x10 IVF, x121 PQ-ADC, x123 IVF-PQ) recovers
    // on the fixture query set — the acceptance metric nprobe/m/k are
    // tuned against; micro-averaged so the whole report is
    // integer-exact up to one final division. ALL approximate legs
    // serve from the PERSISTED indexes (identical rows by the
    // x91/x124/x127 guarantees, zero training / zero corpus
    // re-assignment) — a continuous audit must not recompute the
    // model it is auditing.
    "x128_ann_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val (annAssign, annCent) = annIndexFor(s, dir)
      val (pqCodes, pqBooks) = pqIndexFor(s, dir)
      val (ipCodes, ipBooks, ipCent) = ivfPqIndexFor(s, dir)
      Similarity.recallReport(Seq(
        ("ivf", Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 3),
          Similarity.ivfTopKIndexed(q, "vec_id", "embedding",
            k = 3, nprobe = 2, annAssign, annCent), 3),
        ("pq", Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5),
          Similarity.pqTopKIndexed(s, q, "vec_id", "embedding",
            pqCodes, pqBooks, topK = 5), 5),
        ("ivfpq", Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5),
          Similarity.ivfPqTopKIndexed(s, q, "vec_id", "embedding",
            ipCodes, ipBooks, ipCent, topK = 5, nprobe = 2), 5)))
    }),

    // x129 — SAMPLE-TRAINED PQ distortion: codebooks trained on the
    // deterministic 50% md5-bucket cut (pqFit's trainPct — the 100 TB
    // practice: train on a sample, encode everything), distortion still
    // reported over the WHOLE corpus — "what did sampling cost us",
    // answered next to x122's full-train report.
    "x129_pq_sample_distortion" -> ((s, dir) =>
      Similarity.pqDistortion(t(s, dir, "embeddings"), "vec_id",
        "embedding", m = 4, k = 8, rounds = 2, trainPct = 50)),

    // x130 — ADC short-list + EXACT re-rank: the two-stage serving
    // pattern the x128 audit points at when PQ recall reads low — the
    // corpus pays the integer ADC scan, exact cosine touches only
    // shortlist vectors per query. Short-lists under the FIXTURE's
    // trained books (zero retraining — identical rows, same oracle);
    // x134 is the persisted-codes twin.
    "x130_pq_rerank_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqRerankTopKWithBooks(s, e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", pqIndexFor(s, dir)._2, topK = 5,
        shortlist = 50)
    }),

    // x132 — dimension-truncated (matryoshka) cosine top-k: rank by
    // the first 16 of 64 components — the cheap prefix tier MRL-style
    // embeddings are trained for (4× dot-product cut), orthogonal to
    // PQ's codebook compression; spec sizes `dims` via recallReport.
    "x132_truncated_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.truncatedTopK(e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5, dims = 16)
    }),

    // x133 — snapshot diff: dataset versioning's crawl-over-crawl
    // audit — per-id added/removed/changed/unchanged between two
    // corpus snapshots, on x1's normalized digest (so "changed" means
    // the dedup-relevant text changed). Fixture snapshots: v1 = ids
    // not divisible by 3, v2 = odd ids with every 5th text revised.
    "x133_snapshot_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val v1 = d.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val v2 = d.filter(pmod(col("doc_id"), lit(2)) =!= 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      TextDedup.snapshotDiff(v1, v2, "doc_id", "text")
    }),

    // x131 — the tuning loop CLOSED: x128 measures ADC-only recall@5,
    // this audits the re-ranked form next to it — same exact baseline,
    // same micro-averaged metric; the delta is what the second stage
    // buys (0.24 → 0.68 on the fixture; re-rank fixes RANKING error,
    // the residual is short-list MEMBERSHIP — see SCALING.md's sweep).
    // Both legs serve from the persisted index (identical rows, zero
    // training — x128's convention).
    "x131_rerank_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val (pqCodes, pqBooks) = pqIndexFor(s, dir)
      val ex5 = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      Similarity.recallReport(Seq(
        ("pq_adc", ex5,
          Similarity.pqTopKIndexed(s, q, "vec_id", "embedding",
            pqCodes, pqBooks, topK = 5), 5),
        ("pq_rerank", ex5,
          Similarity.pqRerankTopKIndexed(s, q, e, "vec_id", "embedding",
            pqCodes, pqBooks, topK = 5, shortlist = 50), 5)))
    }),

    // x134 — x130 through the PERSISTED index: the production
    // two-stage path (codes-table ADC short-list through frozen
    // books, exact re-rank fetches only shortlist vectors per query);
    // zero training in the serving path. Same rows as x130 (same
    // oracle), the x124/x127 pairing on the re-rank tier.
    "x134_pq_rerank_indexed" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val (pqCodes, pqBooks) = pqIndexFor(s, dir)
      Similarity.pqRerankTopKIndexed(s, e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", pqCodes, pqBooks, topK = 5, shortlist = 50)
    }),

    // x135 — hybrid retrieval with reciprocal-rank fusion: the
    // production RAG serving shape — a lexical leg (PER-QUERY BM25
    // over the x107 postings index, each query doc's own tokens as
    // its term bag) and a dense leg (IVF top-k over the x91 ANN
    // index) fused by rrf = Σ 1/(60 + rank). Both legs serve from
    // persisted indexes (zero text kernels, zero assignment); the
    // fusion join + re-rank are top-k-sized.
    "x135_hybrid_rrf" -> ((s, dir) => {
      val (post, stats) = bm25IndexFor(s, dir)
      val (annAssign, annCent) = annIndexFor(s, dir)
      val lex = Retrieval.bm25TopKPerQueryIndexed(s, post, stats,
        t(s, dir, "documents").filter(col("doc_id") < 10),
        "doc_id", "text", topK = 10)
      val vec = Similarity.ivfTopKIndexed(
        t(s, dir, "embeddings").filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 10, nprobe = 2, annAssign, annCent)
      Retrieval.rrfFuse(lex, vec, topK = 10)
    }),

    // x136 — hard-negative mining: per query, the documents the DENSE
    // leg retrieves that the LEXICAL leg does not — semantically close
    // but lexically unmatched, re-ranked hardest (most similar) first.
    // The contrastive-training data op (DPR-style), built from the
    // same two persisted-index legs as x135.
    "x136_hard_negatives" -> ((s, dir) => {
      val (post, stats) = bm25IndexFor(s, dir)
      val (annAssign, annCent) = annIndexFor(s, dir)
      val lex = Retrieval.bm25TopKPerQueryIndexed(s, post, stats,
        t(s, dir, "documents").filter(col("doc_id") < 10),
        "doc_id", "text", topK = 10)
      val vec = Similarity.ivfTopKIndexed(
        t(s, dir, "embeddings").filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 10, nprobe = 2, annAssign, annCent)
      Retrieval.hardNegatives(vec, lex, topK = 5)
    }),

    // x137 — contrastive triplets: the training artifact itself —
    // (anchor, positive = lexical top-1, negative = x136's mined
    // hard negatives), hardest first; queries whose lexical leg
    // retrieved nothing form no triplet. Same persisted-index legs.
    "x137_contrastive_triplets" -> ((s, dir) => {
      val (post, stats) = bm25IndexFor(s, dir)
      val (annAssign, annCent) = annIndexFor(s, dir)
      val lex = Retrieval.bm25TopKPerQueryIndexed(s, post, stats,
        t(s, dir, "documents").filter(col("doc_id") < 10),
        "doc_id", "text", topK = 10)
      val vec = Similarity.ivfTopKIndexed(
        t(s, dir, "embeddings").filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 10, nprobe = 2, annAssign, annCent)
      Retrieval.contrastiveTriplets(vec, lex, negK = 5)
    }),

    // x138 — fusion-leg complementarity audit: per query, each leg's
    // hit count and their agreement (n_both + Jaccard) — the
    // acceptance metric for running a hybrid stack at all (overlap
    // ≈ 1 means the dense tier duplicates the lexical one).
    "x138_fusion_overlap" -> ((s, dir) => {
      val (post, stats) = bm25IndexFor(s, dir)
      val (annAssign, annCent) = annIndexFor(s, dir)
      val lex = Retrieval.bm25TopKPerQueryIndexed(s, post, stats,
        t(s, dir, "documents").filter(col("doc_id") < 10),
        "doc_id", "text", topK = 10)
      val vec = Similarity.ivfTopKIndexed(
        t(s, dir, "embeddings").filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 10, nprobe = 2, annAssign, annCent)
      Retrieval.legOverlap(lex, vec)
    }),

    // x139 — pseudo-relevance-feedback expansion terms (RM3-style):
    // run each query's own terms through the postings index, treat
    // its top-5 docs as pseudo-relevant, rank the NEW terms they
    // contain by idf·feedback-tf. Round 1 collects to a local
    // query-set-sized frame; the only text touched is the feedback
    // docs', via an id-IN pushdown.
    "x139_expansion_terms" -> ((s, dir) => {
      val (post, stats) = bm25IndexFor(s, dir)
      Retrieval.expansionTerms(s, post, stats,
        t(s, dir, "documents").filter(col("doc_id") < 10),
        "doc_id", "text", t(s, dir, "documents"), fbK = 5, expandM = 5)
    }),

    // x140 — PRF-EXPANDED retrieval: the expansion loop closed —
    // original + x139 terms re-enter the per-query scorer as one bag
    // per query (two bucket-pruned index rounds + one id-pruned
    // feedback fetch; zero corpus text kernels).
    "x140_prf_retrieval" -> ((s, dir) => {
      val (post, stats) = bm25IndexFor(s, dir)
      Retrieval.bm25TopKExpandedIndexed(s, post, stats,
        t(s, dir, "documents").filter(col("doc_id") < 10),
        "doc_id", "text", t(s, dir, "documents"),
        fbK = 5, expandM = 5, topK = 10)
    }),

    // x141 — RANKING-quality audit (MRR + nDCG@5): x128/x131 measure
    // recall — membership only — and x131's sweep showed the re-rank's
    // residual is membership; this measures the ORDER repair that is
    // the second stage's actual contribution, on the same two
    // persisted-index legs (ADC-only vs re-ranked) against the same
    // exact baseline. Zero training in the audited path.
    "x141_ranking_quality" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val (pqCodes, pqBooks) = pqIndexFor(s, dir)
      val ex5 = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      Similarity.rankingReport(Seq(
        ("pq_adc", ex5,
          Similarity.pqTopKIndexed(s, q, "vec_id", "embedding",
            pqCodes, pqBooks, topK = 5), 5),
        ("pq_rerank", ex5,
          Similarity.pqRerankTopKIndexed(s, q, e, "vec_id", "embedding",
            pqCodes, pqBooks, topK = 5, shortlist = 50), 5)))
    }),

    // x142 — cluster-capped DIVERSIFIED top-k over the persisted IVF
    // index: at most 3 results per (query, IVF cell), survivors
    // re-ranked into the top-5 with the cell id exposed — serving-page
    // diversity (a paraphrase pile-up can't fill the page) at zero
    // extra distance computations, because the index already carries
    // every candidate's cell.
    "x142_diversified_topk" -> ((s, dir) => {
      val (annAssign, annCent) = annIndexFor(s, dir)
      Similarity.diversifiedTopKIndexed(
        t(s, dir, "embeddings").filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nprobe = 2, perCluster = 3,
        annAssign, annCent)
    }),

    // x143 — AS-OF JOIN, last-touch attribution shape: each purchase
    // event joined to the same user's most recent click at or before
    // it (ties on the timestamp broken by the larger click id),
    // unattributed purchases kept with NULLs. The merge-scan form: one
    // shuffle on user_id, a running last(ignoreNulls) window, no pair
    // join anywhere in the plan.
    "x143_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val out = Temporal.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "click"),
        "user_id", "ts", "ts", "event_id", Seq("value"))
      out.withColumn("gap_ms",
        when(col("prior_ts").isNotNull,
          graft.functions.Dates.toEpochMillis(col("ts")) -
            graft.functions.Dates.toEpochMillis(col("prior_ts"))))
    }),

    // x144 — ε-banded INTERVAL JOIN: per purchase, how many clicks
    // (any user) landed within ±1 hour, and their exact-decimal value
    // sum. The band trick turns a pure time-proximity predicate into
    // an equality join on floor(ms/radius) with the |Δt| filter as a
    // residual — no cartesian however dense the hour.
    "x144_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Temporal.proximityAgg(
        ev.filter(col("event_type") === "purchase"), "event_id", "ts",
        ev.filter(col("event_type") === "click"), "ts",
        "value", radiusMs = 3600000L)
    }),

    // x145 — TRUE MMR re-rank over the persisted IVF index: greedy
    // λ·rel − (1−λ)·max-sim-to-selected over the top-20 candidates,
    // k = 5 picks — the exact-penalty sibling of x142's cluster cap
    // (which bounds redundancy by quantized cell; this pays
    // |q|·candK² pair cosines on query-set-sized frames for the real
    // thing). Candidate vectors ride along from the index — one
    // bucket-pruned corpus touch total.
    "x145_mmr_rerank" -> ((s, dir) => {
      val (annAssign, annCent) = annIndexFor(s, dir)
      Similarity.mmrTopKIndexed(
        t(s, dir, "embeddings").filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, candK = 20, nprobe = 2,
        lambda = 0.7, annAssign, annCent)
    }),

    // x146 — CCNet-style per-LANGUAGE fluency terciles: x86's bigram-LM
    // score, ranked WITHIN each language (grouped bucketed rank — no
    // per-language sort) and cut at exact integer tercile boundaries.
    // head = that language's most fluent third; a global cut would
    // grade low-resource languages against the dominant language's
    // fluency distribution.
    "x146_ccnet_buckets" -> ((s, dir) => TextAnalysis.ccnetBuckets(
      t(s, dir, "documents"), "doc_id", "text", "lang",
      Seq("head", "middle", "tail"))),

    // x147 — x119's calibrated gate PER LANGUAGE: each language's
    // threshold is its own exact p25 quality score; a single global
    // bar gates low-scoring LANGUAGES, not low-scoring documents.
    "x147_lang_calibrated_gate" -> ((s, dir) =>
      TextAnalysis.groupedCalibratedGate(
        t(s, dir, "documents"), "doc_id", "text", "lang", q = 0.25)),

    // x148 — SCD TYPE-2 dimension build: each user's event_type
    // history collapsed into validity intervals (consecutive repeats
    // extend the interval, reverts open a new version) — the classic
    // warehouse dimension table, one key exchange + linear window
    // scans, no join.
    "x148_scd2_dimension" -> ((s, dir) => Temporal.scd2(
      t(s, dir, "events"), "user_id", "ts", "event_id", "event_type")),

    // x149 — U-shaped multi-touch attribution: each purchase splits
    // credit 0.4/0.2/0.4 (first/middle/last) over the user's clicks in
    // a 2 h lookback; the one-sided banded (user, band) equi-join
    // bounds per-key pair volume where a theta join plans a nested
    // loop.
    "x149_multitouch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Temporal.multiTouchAttribution(
        ev.filter(col("event_type") === "purchase"), "event_id", "ts",
        "value",
        ev.filter(col("event_type") === "click"), "event_id", "ts",
        "user_id", windowMs = 7200000L)
    }),

    // x150 — PMI collocation mining (Church & Hanks): top-50 adjacent
    // pairs by pointwise mutual information at min pair count 5 — the
    // multiword-unit detector; the minCount guard kills the hapax-pair
    // PMI explosion.
    "x150_pmi_collocations" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(t(s, dir, "documents"), "doc_id",
        "text", minCount = 5, topK = 50)),

    // x151 — vocabulary coverage curve: cumulative token-occurrence
    // share of the top-r terms, r <= 100 — the corpus-level curve the
    // tokenizer vocab-size knob is read off (x55 is one per-doc point
    // of it; x55's vocabSize came from eyeballing exactly this).
    "x151_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(t(s, dir, "documents"), "doc_id",
        "text", topK = 100)),

    // x152 — cohort retention triangle: users bucketed by
    // first-activity epoch-week, counted per return-week offset; one
    // user-key exchange, (#weeks)²-bounded output.
    "x152_cohort_retention" -> ((s, dir) =>
      Analytics.cohortRetention(t(s, dir, "events"), "user_id", "ts")),

    // x153 — ordered conversion funnel view → click → purchase: each
    // stage's first event must be at-or-after the previous stage's —
    // order is the point (unordered per-type counts overstate
    // conversion).
    "x153_funnel" -> ((s, dir) => Analytics.funnel(
      t(s, dir, "events"), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))),

    // x154 — RFM segmentation: recency/frequency/monetary quintiles
    // per purchasing user ("555" = champion), each axis scored by the
    // grouped bucketed rank (no global sort) whose label law IS SQL
    // NTILE's — the oracle mirrors with plain ntile().
    "x154_rfm_segments" -> ((s, dir) => Analytics.rfmSegments(
      t(s, dir, "events"), "user_id", "ts", "event_type", "value",
      purchaseType = "purchase")),

    // x155 — point-in-time dimension enrichment: each purchase joined
    // to the x148 SCD2 version current AT ITS OWN TIMESTAMP (the
    // as-of merge scan on version starts — no interval predicate);
    // joining the current version instead is the classic time-travel
    // bug.
    "x155_dim_enrich" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = Temporal.scd2(ev, "user_id", "ts", "event_id",
        "event_type")
      Temporal.enrichAsOf(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        dim, "user_id", "ts", Seq("event_type"))
    }),

    // x156 — daily purchase-value percentiles (p50/p90/p99): exact
    // per-day quantile VALUES via the grouped bucketed rank — the
    // telemetry report shape, no per-day sort.
    "x156_daily_value_quantiles" -> ((s, dir) => {
      val ms = graft.functions.Dates.toEpochMillis(col("ts"))
      val scored = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
            .cast("long").as("day"),
          graft.functions.Num.fpRound(col("value"), 4).as("value"))
      TextAnalysis.groupedQuantiles(scored, "event_id", "day", "value",
        Seq(0.5, 0.9, 0.99))
    }),

    // x157 — ROLLUP revenue cube: detail + per-nation subtotals +
    // grand total in ONE Expand-fed aggregate pass; grp_level via
    // engine-independent grouping() sums, not grouping_id()'s
    // bit-order convention.
    "x157_rollup_revenue" -> ((s, dir) => Olap.rollupRevenue(
      t(s, dir, "orders"), t(s, dir, "customer"), t(s, dir, "nation"))),

    // x158 — cross-tab pivot: revenue by year × market segment, one
    // column per declared segment (explicit domain — no value-discovery
    // pre-pass, schema not data-dependent).
    "x158_segment_pivot" -> ((s, dir) => Olap.segmentPivot(
      t(s, dir, "orders"), t(s, dir, "customer"),
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY"))),

    // x159 — column profile card over lineitem: null/distinct/min/max
    // per column in ONE scan (multi-distinct Expand plan), the first
    // screen of any ingestion audit.
    "x159_profile_card" -> ((s, dir) => Olap.profileCard(
      t(s, dir, "lineitem"),
      numCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax"),
      strCols = Seq("l_returnflag", "l_linestatus"),
      tsCols = Seq("l_shipdate"))),

    // x160 — Pareto frontier (skyline) of parts under (min size, max
    // retail price): running max over the dictionary-sized per-size
    // best table — no all-pairs dominance join.
    "x160_pareto_front" -> ((s, dir) => Olap.paretoFront(
      t(s, dir, "part"))),

    // x161 — per-nation daily revenue + trailing 7-day rolling sum:
    // RANGE frame over the integer day key (gaps shorten the window —
    // a ROWS frame would stretch over missing days).
    "x161_rolling_revenue" -> ((s, dir) => Analytics.rollingRevenue(
      t(s, dir, "lineitem"), t(s, dir, "supplier"),
      t(s, dir, "nation"))),

    // x162 — year-over-year revenue growth per nation: LAG over the
    // yearly aggregate, growth on the 1e-6 grid, NULL (not 0) on each
    // nation's first year.
    "x162_yoy_growth" -> ((s, dir) => Analytics.yoyGrowth(
      t(s, dir, "orders"), t(s, dir, "customer"), t(s, dir, "nation"))),

    // x163 — daily anomaly flags: days > 2σ from their event type's
    // mean, decided in EXACT integer arithmetic ((d·x−Σx)² >
    // s²(d·Σx²−(Σx)²)) — no sqrt, no float law.
    "x163_anomaly_days" -> ((s, dir) => Analytics.anomalyDays(
      t(s, dir, "events"), "ts", "event_type", sigmas = 2)),

    // x164 — market-basket brand affinity: support/confidence/lift
    // over order baskets; pair fanout bounded by the brand DICTIONARY,
    // minCount kills hapax pairs (x150's law).
    "x164_brand_affinity" -> ((s, dir) => Analytics.basketAffinity(
      t(s, dir, "lineitem"), t(s, dir, "part"), minCount = 5)),

    // x165 — Gini concentration of order revenue across each nation's
    // customers: exact integer rank-weighted sums on the grouped
    // bucketed rank (no per-nation sort).
    "x165_gini" -> ((s, dir) => Analytics.giniConcentration(
      t(s, dir, "orders"), t(s, dir, "customer"), t(s, dir, "nation"))),

    // x166 — KMV distinct-count sketch per return flag (k=64 minima of
    // the 60-bit md5 grid) WITH its exact twin and relative error in
    // the same row — the oracle-checkable sibling of the HLL sketch.
    "x166_kmv_distinct" -> ((s, dir) => Sketches.kmvDistinct(
      t(s, dir, "lineitem"), "l_returnflag", "l_partkey", k = 64)),

    // x167 — per-nation OLS revenue trend: slope + r² from EXACT
    // integer moment sums (closed form, no regr_slope float chain);
    // only the two final divisions touch doubles, mirrored.
    "x167_revenue_trend" -> ((s, dir) => Analytics.revenueTrend(
      t(s, dir, "lineitem"), t(s, dir, "supplier"),
      t(s, dir, "nation"))),

    // x168 — A/B conversion test: md5-grid 50/50 user split (x26's
    // deterministic assignment), conversion = ≥14 purchases (the
    // fixture's per-user median — a universal ≥1 bar saturates both
    // arms), two-proportion z² from exact counts.
    "x168_ab_test" -> ((s, dir) => Analytics.abConversion(
      t(s, dir, "events"), "user_id", "event_type", "purchase",
      minCount = 14)),

    // x169 — funnel stage latency: exact p50/p90 of per-user
    // transition times through x153's at-or-after chain, cut by the
    // grouped quantile law.
    "x169_funnel_latency" -> ((s, dir) => Analytics.funnelLatency(
      t(s, dir, "events"), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))),

    // x170 — chi-square independence of market segment × order
    // priority: exact integer contingency counts, term-by-term
    // grid-rounded χ² (x158 shows the cells; this says whether the
    // pattern is real).
    "x170_chi_square" -> ((s, dir) => Olap.chiSquare(
      t(s, dir, "orders").join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey")),
      "c_mktsegment", "o_orderpriority")),

    // x171 — weekday seasonality: per-nation day-of-week revenue +
    // share of the nation's total; dow = exact (epoch_day+3) mod 7
    // (0 = Monday), not an engine week convention.
    "x171_weekday_seasonality" -> ((s, dir) =>
      Analytics.weekdaySeasonality(t(s, dir, "lineitem"),
        t(s, dir, "supplier"), t(s, dir, "nation"))),

    // x172 — Lorenz curve: x165's Gini unrolled into per-decile
    // cumulative revenue shares (ceil-boundary deciles, ties by
    // customer).
    "x172_lorenz_curve" -> ((s, dir) => Analytics.lorenzCurve(
      t(s, dir, "orders"), t(s, dir, "customer"), t(s, dir, "nation"))),

    // x173 — Tukey IQR outliers: per-customer total revenue outside
    // [Q1−1.5·IQR, Q3+1.5·IQR] within the customer's nation, quartiles
    // by the exact grouped double-ceil law. The measure is the exact
    // unit-sum of order totals (right-tailed — heavy buyers ARE
    // flagged; a uniform column like acctbal has NO Tukey tail and
    // reads zero rows at every SF, which is why the registered form
    // audits revenue, not balances).
    "x173_iqr_outliers" -> ((s, dir) => {
      val units = floor(col("o_totalprice") * 1e4 + lit(0.5)).cast("long")
      val perCust = t(s, dir, "orders")
        .select(col("o_custkey"), units.as("_u"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("_u").cast("decimal(38,0)")).as("_du"))
        .join(t(s, dir, "customer").select(col("c_custkey"),
          col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name").as("nation"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("o_custkey").as("custkey"), col("nation"),
          (col("_du").cast("double") / 1e4).as("revenue"))
      Analytics.iqrOutliers(perCust, "custkey", "nation", "revenue")
    }),

    // x174 — per-language length↔quality correlation: Pearson r² from
    // exact integer moments of (n_chars, score·10⁴) — does longer
    // mean better, per language (the curation-bias audit).
    "x174_quality_length_corr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val qs = TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_chars"),
          floor(col("quality_score") * 1e4 + lit(0.5)).cast("long")
            .as("_su"))
      Analytics.groupedCorrelation(
        qs.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
        "lang", "n_chars", "_su")
    }),

    // x175 — MAD robust anomaly days: x163's robust twin — median/MAD
    // instead of mean/σ, all-integer, 50% breakdown point.
    "x175_mad_anomaly_days" -> ((s, dir) => Analytics.madAnomalyDays(
      t(s, dir, "events"), "ts", "event_type", k = 3L)),

    // x176 — referential-integrity audit: every FK edge of the star
    // schema — row/null/orphan counts + orphan rate. Child collapses
    // to distinct keys with counts BEFORE the anti-join; one 1-row
    // frame per edge, unioned.
    "x176_ri_audit" -> ((s, dir) => Warehouse.riAudit(Seq(
      Warehouse.RiEdge("lineitem.orderkey", t(s, dir, "lineitem"),
        "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
      Warehouse.RiEdge("lineitem.partkey", t(s, dir, "lineitem"),
        "l_partkey", t(s, dir, "part"), "p_partkey"),
      Warehouse.RiEdge("lineitem.suppkey", t(s, dir, "lineitem"),
        "l_suppkey", t(s, dir, "supplier"), "s_suppkey"),
      Warehouse.RiEdge("orders.custkey", t(s, dir, "orders"),
        "o_custkey", t(s, dir, "customer"), "c_custkey"),
      Warehouse.RiEdge("customer.nationkey", t(s, dir, "customer"),
        "c_nationkey", t(s, dir, "nation"), "n_nationkey"),
      Warehouse.RiEdge("supplier.nationkey", t(s, dir, "supplier"),
        "s_nationkey", t(s, dir, "nation"), "n_nationkey"),
      Warehouse.RiEdge("nation.regionkey", t(s, dir, "nation"),
        "n_regionkey", t(s, dir, "region"), "r_regionkey")))),

    // x177 — CDC batch apply (MERGE): a deterministic change batch
    // derived from orders itself — inserts (keys ≡ 9 mod 10, held out
    // of the base), two GENERATIONS of updates (seq 1: +1000 on keys ≡
    // 0 mod 10; seq 2: +2000 on keys ≡ 0 mod 20 — latest-wins must
    // pick seq 2 or the hash breaks), deletes (keys ≡ 1 mod 10) —
    // merged onto the base snapshot.
    "x177_cdc_apply" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val k = col("o_orderkey")
      val base = o.filter(pmod(k, lit(10L)) =!= 9)
      def stamp(df: DataFrame, op: String, seq: Long) = df
        .withColumn("op", lit(op)).withColumn("seq", lit(seq))
      val changes = stamp(o.filter(pmod(k, lit(10L)) === 9), "I", 1L)
        .unionByName(stamp(o.filter(pmod(k, lit(10L)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0)),
          "U", 1L))
        .unionByName(stamp(o.filter(pmod(k, lit(20L)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(2000.0)),
          "U", 2L))
        .unionByName(stamp(o.filter(pmod(k, lit(10L)) === 1), "D", 1L))
      Warehouse.cdcApply(base, changes, "o_orderkey", "op", "seq")
    }),

    // x178 — incremental rollup merge: the (priority × year) revenue
    // cube maintained as two rollupPartial shards split mid-1997 (so
    // year-1997 keys live in BOTH shards and the merge actually
    // combines states), merged — the oracle recomputes from scratch,
    // so the check IS merged-equals-full-recompute.
    "x178_rollup_merge" -> ((s, dir) => {
      val units = floor(col("o_totalprice") * 1e4 + lit(0.5)).cast("long")
      val o = t(s, dir, "orders").filter(col("o_orderdate").isNotNull)
        .select(col("o_orderpriority").as("priority"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          col("o_orderdate"), units.as("_u"), col("o_totalprice"))
      val cutoff = lit("1997-07-01").cast("timestamp")
      val shards = Seq(o.filter(col("o_orderdate") < cutoff),
        o.filter(col("o_orderdate") >= cutoff)).map(part =>
        Warehouse.rollupPartial(part, Seq("priority", "order_year"),
          "_u", "o_totalprice"))
      Warehouse.mergeRollup(shards, Seq("priority", "order_year"))
        .select(col("priority"), col("order_year"),
          col("n_rows").as("n_orders"),
          (col("sum_units").cast("double") / 1e4).as("revenue"),
          col("min_v").as("min_price"), col("max_v").as("max_price"))
    }),

    // x179 — top user journeys: the 50 most common first-3 event-type
    // paths (per-user order by (ts, event_id)); path counts are
    // |event types|³-bounded, so the top-N never sees the corpus.
    "x179_user_journeys" -> ((s, dir) => Analytics.topJourneys(
      t(s, dir, "events"), "user_id", "event_type", "ts", "event_id",
      k = 3, topN = 50)),

    // x180 — stratified split manifest: per-source deterministic
    // 80/10/10 train/val/test assignment — md5-rank within stratum
    // (the x26/x45 no-RNG law), exact ceil-boundary cuts; CUMULATIVE
    // literals (0.8/0.9/1.0) so Spark and the oracle cut on identical
    // doubles.
    "x180_split_manifest" -> ((s, dir) =>
      TextAnalysis.stratifiedSplit(t(s, dir, "documents"), "doc_id",
          "source")
        .select(col("doc_id"), col("source"),
          col("rank").cast("long").as("rank"),
          col("n_group").cast("long").as("n_group"), col("split"))),

    // x181 — join-key skew audit: the 20 heaviest l_partkey values
    // with their share of lineitem — per-key counts (map-side
    // combine), then the salted two-phase global top-k; the 1-row
    // total broadcasts.
    "x181_key_skew" -> ((s, dir) => Warehouse.keySkewAudit(
        t(s, dir, "lineitem"), "l_partkey", topK = 20)
      .select(col("l_partkey"), col("n_rows"),
        col("rank").cast("long").as("rank"), col("share"))),

    // x182 — count-min-sketch heavy-hitter audit: a 3×1024 CMS over
    // l_partkey (built from the per-key count frame — identical cells,
    // key-bounded replication) read back at the exact top-20; the
    // md5-derived row hashes make the whole sketch oracle-checkable.
    "x182_cms_audit" -> ((s, dir) => Sketches.cmsHeavyHitters(
        t(s, dir, "lineitem"), "l_partkey", depth = 3, width = 1024,
        topK = 20)
      .select(col("l_partkey"), col("n_rows"),
        col("rank").cast("long").as("rank"), col("cms_estimate"))),

    // x183 — cumulative new-users growth curve: per-day first-seen
    // counts + running total over the calendar-bounded day frame.
    "x183_user_growth" -> ((s, dir) => Analytics.cumulativeNewUsers(
      t(s, dir, "events"), "user_id", "ts")),

    // x184 — fulfillment lag quantiles: exact p50/p90 of
    // ship-minus-order days per order priority (grouped double-ceil
    // law; id = orderkey·10 + linenumber makes the tie-break total —
    // linenumber < 10 by the TPC-H shape).
    "x184_fulfillment_lag" -> ((s, dir) => {
      val sd = graft.functions.Dates.toEpochMillis(col("l_shipdate"))
      val od = graft.functions.Dates.toEpochMillis(col("o_orderdate"))
      val lag = (((sd - pmod(sd, lit(86400000L))) / lit(86400000L)) -
        ((od - pmod(od, lit(86400000L))) / lit(86400000L))).cast("long")
      val scored = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .join(t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority").as("priority"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_orderkey") * 10 + col("l_linenumber"))
          .cast("long").as("line_id"), col("priority"),
          lag.as("lag_days"))
      TextAnalysis.groupedQuantiles(scored, "line_id", "priority",
        "lag_days", Seq(0.5, 0.9))
    }),

    // x185 — blocked fuzzy name match: candidate duplicate part names
    // within edit distance 2, blocked on the head noun (last token),
    // length-filtered before the banded levenshtein kernel; all pair
    // work at name-DICTIONARY cardinality, never row pairs.
    "x185_fuzzy_match" -> ((s, dir) => Resolution.fuzzyNameMatches(
      t(s, dir, "part"), "p_partkey", "p_name", maxDist = 2)),

    // x186 — calendar gap-fill + forward fill of per-nation daily
    // revenue: the x161 daily frame densified onto each nation's own
    // [min, max] day spine, gaps carried forward and flagged.
    "x186_gap_fill" -> ((s, dir) => {
      val ms = graft.functions.Dates.toEpochMillis(col("l_shipdate"))
      val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
        .cast("long")
      val daily = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name"))), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), day.as("day"),
          Num.fpRound(col("l_extendedprice") * (lit(1.0) -
            col("l_discount")), 4).as("_v"))
        .groupBy(col("nation"), col("day"))
        .agg(sum(col("_v").cast("decimal(38,6)")).cast("double")
          .as("revenue"))
      Analytics.gapFillDaily(daily, "nation", "day", "revenue")
        .select(col("nation"), col("day"), col("revenue"),
          col("filled_value").as("filled_revenue"), col("is_gap"))
    }),

    // x187 — first-order Markov transition matrix of the event
    // stream: consecutive-event (prev, next) counts per user timeline
    // + row-normalized P(next | prev) on the 1e-6 grid.
    "x187_markov_transitions" -> ((s, dir) => Analytics.markovTransitions(
      t(s, dir, "events"), "user_id", "ts", "event_type", "event_id")),

    // x188 — exact-integer PageRank (3 unrolled rounds, d = 0.85) over
    // the brand co-purchase graph; ranks are integer 1e-9 mass units
    // so the fixed point is engine-independent.
    "x188_pagerank" -> ((s, dir) => Graph.pageRank(
        Graph.coPurchaseEdges(t(s, dir, "lineitem"), t(s, dir, "part")),
        iterations = 3)
      .select(col("node").as("brand"), col("pr_units"))),

    // x189 — CUSUM drift detection over per-type daily event counts:
    // Page's cumulative-sum chart in exact integer arithmetic, the
    // sustained-drift complement of x163 (z) and x175 (MAD).
    "x189_cusum_drift" -> ((s, dir) => Analytics.cusumDrift(
      t(s, dir, "events"), "ts", "event_type", h = 3)),

    // x190 — deterministic label propagation (3 sync rounds, ties to
    // the smallest label) over the lift-filtered brand affinity
    // graph: the bought-together communities below x188's centrality.
    "x190_label_communities" -> ((s, dir) => Graph.labelPropagation(
        Graph.affinityEdges(t(s, dir, "lineitem"), t(s, dir, "part")),
        rounds = 3)
      .select(col("node").as("brand"), col("label").as("community"))),

    // x191 — inter-event gap quantiles per event type (exact
    // p50/p90/p99 via the grouped double-ceil law): the report that
    // sizes q13's session gap and the streaming state timeouts.
    "x191_event_gaps" -> ((s, dir) => {
      val gaps = Analytics.interEventGaps(t(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
      TextAnalysis.groupedQuantiles(gaps, "event_id", "event_type",
        "gap_ms", Seq(0.5, 0.9, 0.99))
    }),

    // x192 — per-brand triangle counts + clustering coefficient on
    // the affinity graph: cohesion audit for x190's communities
    // (oriented a<b<c enumeration — each triangle produced once).
    "x192_triangle_stats" -> ((s, dir) => Graph.triangleStats(
        Graph.affinityEdges(t(s, dir, "lineitem"), t(s, dir, "part")))
      .select(col("node").as("brand"), col("degree"),
        col("n_triangles"), col("clustering_coeff"))),

    // x193 — event-lateness / watermark-sizing audit over a
    // deterministic delayed-arrival augmentation (every 7th event id
    // lands one day late — the x60 augmentation precedent, mirrored
    // verbatim oracle-side): per-KEY disorder is what late data
    // costs a keyed-state streaming operator.
    "x193_watermark_audit" -> ((s, dir) => {
      val ms = graft.functions.Dates.toEpochMillis(col("ts"))
      val ev = t(s, dir, "events").select(col("user_id"),
        col("event_type"), col("event_id"), ms.as("_ms"),
        (ms + when(pmod(col("event_id"), lit(7L)) === 0,
          lit(86400000L)).otherwise(lit(0L))).as("_arr"))
      Warehouse.latenessAudit(ev, "user_id", "event_type", "_ms",
        "_arr", "event_id")
    }),

    // x194 — incremental JOIN-MV refresh: the revenue cube maintained
    // from a base shard + a delta shard, each JOINED to the dims
    // independently (the delta path never rescans base facts); the
    // oracle recomputes from scratch — merged == full-recompute is
    // the MV-refresh contract with a join in the path (x178's law).
    "x194_mv_join_delta" -> ((s, dir) => {
      val joined = (df: DataFrame) => df
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name"))), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          year(col("l_shipdate")).cast("long").as("ship_year"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 1e4 + lit(0.5)).cast("long").as("_u"),
          Num.fpRound(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")), 4).as("_v"))
      val li = t(s, dir, "lineitem")
      val base = li.filter(pmod(col("l_orderkey"), lit(10)) =!= 0)
      val delta = li.filter(pmod(col("l_orderkey"), lit(10)) === 0)
      Warehouse.mergeRollup(Seq(
          Warehouse.rollupPartial(joined(base),
            Seq("nation", "ship_year"), "_u", "_v"),
          Warehouse.rollupPartial(joined(delta),
            Seq("nation", "ship_year"), "_u", "_v")),
          Seq("nation", "ship_year"))
        .select(col("nation"), col("ship_year"),
          col("n_rows").as("n_items"),
          (col("sum_units").cast("double") / 1e4).as("revenue"),
          col("min_v").as("min_item"), col("max_v").as("max_item"))
    }),

    // x195 — anti-entropy bucket checksums: base vs a deterministic
    // mutated snapshot (drop line_id % 97 = 0, bump qty at % 89 = 0),
    // 64 buckets of (count, 60-bit order-free digest); differs flags
    // exactly the buckets x133's row-diff would then be pointed at.
    "x195_bucket_checksums" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
          .as("line_id"),
        col("l_quantity").cast("long").as("qty"))
      val snap = li.filter(pmod(col("line_id"), lit(97)) =!= 0)
        .withColumn("qty", when(pmod(col("line_id"), lit(89)) === 0,
          col("qty") + 1).otherwise(col("qty")))
      val b = Warehouse.bucketChecksums(li, "line_id", Seq("qty"), 64)
      val sn = Warehouse.bucketChecksums(snap, "line_id", Seq("qty"), 64)
      b.select(col("bucket"), col("n_rows").as("n_base"),
          col("checksum").as("base_sum"))
        .join(sn.select(col("bucket"), col("n_rows").as("n_snap"),
          col("checksum").as("snap_sum")), Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_snap"), lit(0L)).as("n_snap"),
          coalesce(col("base_sum"), lit(0L)).as("base_sum"),
          coalesce(col("snap_sum"), lit(0L)).as("snap_sum"))
        .withColumn("differs", col("n_base") =!= col("n_snap") ||
          col("base_sum") =!= col("snap_sum"))
    }),

    // x196 — Apriori level-3 frequent brand triples: top-50 by
    // co-order count with exact support; candidate pairs pruned
    // against the frequent-pair set (lossless by anti-monotonicity —
    // the oracle is the direct unpruned 3-way join).
    "x196_brand_triples" -> ((s, dir) => Analytics.frequentTriples(
      t(s, dir, "lineitem"), t(s, dir, "part"), minCount = 3,
      topK = 50)),

    // x197 — mutual information (nats) of market segment × order
    // priority + both marginal entropies: the dependence STRENGTH
    // x170's chi-square only tests the existence of; exact counts,
    // one mirrored double term per observed cell, grid-6 + dsum.
    "x197_mi_audit" -> ((s, dir) => Olap.mutualInformation(
      t(s, dir, "orders").join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey")),
      "c_mktsegment", "o_orderpriority")),

    // x198 — session duration quantiles by ENTRY event type (exact
    // p50/p90, ties by session id): q13's session law collapsed to
    // session grain, cut by the first event's type.
    "x198_session_durations" -> ((s, dir) => {
      val sess = Analytics.sessions(t(s, dir, "events"), "user_id",
        "ts", "event_id", "event_type")
      TextAnalysis.groupedQuantiles(sess, "session_id", "entry_type",
        "duration_ms", Seq(0.5, 0.9))
    }),

    // x199 — bounce report per entry type: session counts, bounces
    // (single-event sessions), bounce share and mean duration on the
    // 1e-6 grid.
    "x199_bounce_report" -> ((s, dir) => Analytics.sessions(
        t(s, dir, "events"), "user_id", "ts", "event_id", "event_type")
      .groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L))
          .as("n_bounce"),
        Num.fpRound(
          sum(when(col("n_events") === 1, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), 6)
          .as("bounce_share"),
        Num.fpRound(sum(col("duration_ms").cast("decimal(38,0)"))
          .cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_duration_ms"))),

    // x200 — DAU / trailing WAU / trailing MAU / stickiness per
    // active day: the distinct (user, day) frame explodes to the
    // <=7/<=30 report days it supports (constant fanout of a bounded
    // frame, never events).
    "x200_active_users" -> ((s, dir) => Analytics.activeUsers(
      t(s, dir, "events"), "user_id", "ts")),

    // x201 — deterministic token-weighted sample (A-ES): top-100
    // documents by ln(u)/w with md5-derived u and w = n_tokens + 1 —
    // document sampling that approximates uniform TOKEN sampling,
    // reproducible across engines and re-runs.
    "x201_weighted_sample" -> ((s, dir) => TextAnalysis.weightedSample(
      t(s, dir, "documents"), "doc_id", "text", k = 100)),

    // x202 — per-brand top-3 recommendations by lift (ties by
    // confidence then brand): x164's rules turned into the
    // "bought-together" serving table, grouped top-k via the salted
    // two-phase window.
    "x202_brand_recs" -> ((s, dir) => Analytics.brandRecommendations(
      t(s, dir, "lineitem"), t(s, dir, "part"), minCount = 5, k = 3)),

    // x203 — histogram-quantile sketch + acceptance metric: 32-bucket
    // equi-width integer histogram of order totalprice units per
    // priority, read back at p50/p90 next to the exact value and the
    // grid rel_err (the x166 convention for approximate operators).
    "x203_histogram_quantiles" -> ((s, dir) => Sketches
      .histogramQuantiles(t(s, dir, "orders")
          .select(col("o_orderkey"),
            col("o_orderpriority").as("priority"),
            floor(col("o_totalprice") * 1e4 + lit(0.5)).cast("long")
              .as("units")),
        "o_orderkey", "priority", "units", buckets = 32,
        quantiles = Seq(0.5, 0.9)))
  ) ++ indexedGraphQueries ++ maintenanceQueries

  /** x204-x209 — the graph family through its PERSISTED co-purchase
    * edge index (the x91/x107/x124/x127 indexed-serving pattern
    * applied to the family's shared stage): the basket collapse, the
    * directed edge counts and the denominator sidecars are built once
    * per fixture ([[edgeIndexFor]]); each served twin reads
    * dictionary-bounded tables with ZERO corpus scans and returns the
    * SAME rows as its self-contained form (same oracle). */
  private lazy val indexedGraphQueries
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    // x204 — x188 served from the index: PageRank's input edge list is
    // one dictionary²-bounded table read + merge-sum.
    "x204_pagerank_indexed" -> ((s, dir) => {
      val (_, edges, _, _) = edgeIndexFor(s, dir)
      Graph.pageRank(edges, iterations = 3)
        .select(col("node").as("brand"), col("pr_units"))
    }),

    // x205 — x190 served from the index: the lift cut re-derives the
    // affinity graph from persisted edges + sidecars.
    "x205_communities_indexed" -> ((s, dir) => {
      val (_, edges, totals, stats) = edgeIndexFor(s, dir)
      Graph.labelPropagation(
          Graph.affinityEdgesFrom(edges, totals, stats), rounds = 3)
        .select(col("node").as("brand"), col("label").as("community"))
    }),

    // x206 — x192 served from the index: triangle enumeration over the
    // persisted affinity edges.
    "x206_triangles_indexed" -> ((s, dir) => {
      val (_, edges, totals, stats) = edgeIndexFor(s, dir)
      Graph.triangleStats(Graph.affinityEdgesFrom(edges, totals, stats))
        .select(col("node").as("brand"), col("degree"),
          col("n_triangles"), col("clustering_coeff"))
    }),

    // x207 — x196 served from the index: the 3-way Apriori mining
    // re-joins the PERSISTED basket frame (bucketed by order key — the
    // self-joins are co-located), support base from the stats sidecar.
    "x207_triples_indexed" -> ((s, dir) => {
      val (ob, _, _, stats) = edgeIndexFor(s, dir)
      Analytics.frequentTriplesIndexed(ob, stats, minCount = 3,
        topK = 50)
    }),

    // x208 — x202 served from the index: the directed pair counts ARE
    // the edge list; confidence/lift denominators from the sidecars.
    "x208_brand_recs_indexed" -> ((s, dir) => {
      val (_, edges, totals, stats) = edgeIndexFor(s, dir)
      Analytics.brandRecommendationsIndexed(edges, totals, stats,
        minCount = 5, k = 3)
    }),

    // x209 — x164 served from the index: undirected rule pairs are the
    // src<dst cut of the persisted directed edges.
    "x209_affinity_indexed" -> ((s, dir) => {
      val (_, edges, totals, stats) = edgeIndexFor(s, dir)
      Analytics.basketAffinityIndexed(edges, totals, stats, minCount = 5)
    }),

    // x210 — index compaction + file-count audit: a dedicated edge
    // index is built in TWO disjoint complete-order ingests (even /
    // odd order keys — each append adds a file per touched bucket),
    // then compacted back to one file per bucket (sidecars to one
    // file) and audited. Row counts are data-derived (the oracle
    // recomputes them from the corpus: compaction moves bytes, never
    // rows); `compacted` pins files <= buckets — false before
    // compaction by construction (WarehouseSpec pins the before/after
    // file counts and the bit-identical serve).
    "x210_index_compaction" -> ((s, dir) =>
      Warehouse.indexFileAudit(s, compactedEdgeIndexFor(s, dir))
        .select(col("index_name"), col("n_buckets"), col("n_rows"),
          (col("n_files") <= greatest(col("n_buckets"), lit(1L)))
            .as("compacted"))),

    // x212 — PageRank convergence audit over the persisted edge index:
    // the integer L1/max deltas between rounds 2 and 3 — the
    // acceptance metric for x188's fixed round count (x128's role for
    // ANN, x122's for PQ), hash-stable because both rank vectors are.
    "x212_pagerank_convergence" -> ((s, dir) => {
      val (_, edges, _, _) = edgeIndexFor(s, dir)
      Graph.pageRankConvergence(edges, iterations = 3)
    }),

    // x211 — index freshness audit: the x81 digest index and the x92
    // ANN index (both built on the EVEN ids) audited against (a) the
    // full corpus — missing = the un-ingested odd-id keys, stale = 0 —
    // and (b) a doc_id%3 "current snapshot" cut — BOTH counters
    // nonzero: missing = %3 keys never indexed, stale = indexed keys
    // whose docs left the corpus. When to append/rebuild, next to
    // x210's when-to-compact.
    "x211_index_freshness" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val digestIdx = digestIndexFor(s, dir)
      val (assignT, _) = annDedupIndexFor(s, dir)
      val digests = (df: DataFrame) =>
        df.select(sha2(lower(trim(col("text"))), 256).as("k"))
      Warehouse.indexFreshnessAudit(Seq(
        ("digest_idx", digests(docs),
          s.table(digestIdx).select(col("digest"))),
        ("digest_idx_vs_snapshot",
          digests(docs.filter(pmod(col("doc_id"), lit(3)) === 0)),
          s.table(digestIdx).select(col("digest"))),
        ("ann_assign", t(s, dir, "embeddings").select(col("vec_id")),
          s.table(assignT).select(col("neighbor_id")))))
    })
  )

  /** x213-x215 — the index-maintenance operators the operational trio
    * grew this round: the deep-merge "when" audit (x213, the
    * rows-per-key trigger [[graft.operators.Graph.mergeEdgeIndex]] was
    * missing), the delete/takedown path (x214 — x211's `n_stale`
    * driven to ZERO by [[graft.operators.Warehouse.deleteFromIndex]]),
    * and the bucketed-checksum freshness fast path (x215 — x211's
    * counts at anti-entropy cost). */
  private lazy val maintenanceQueries
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    // x213 — partial-row audit around the deep merge: the exhibit
    // index lands in two disjoint ingests (one partial row per
    // (key, ingest)), the PRE-merge audit is persisted as the sidecar
    // that triggered the merge, and the live audit re-reads the merged
    // tables — rows_per_key falls to exactly 1.0 while row counts are
    // data-derived (the oracle recomputes the per-parity partials).
    "x213_index_partial_merge" -> ((s, dir) => {
      val (beforeT, targets) = mergedEdgeIndexFor(s, dir)
      s.table(beforeT).withColumn("phase", lit("before"))
        .unionByName(Warehouse.indexPartialAudit(s, targets)
          .withColumn("phase", lit("after")))
        .select(col("index_name"), col("phase"), col("n_rows"),
          col("n_keys"), col("rows_per_key"))
    }),

    // x214 — the takedown/retention path x211's own doc conceded was
    // missing: dedicated digest + ANN indexes built on the EVEN ids,
    // their stale keys (rows the %3 == 0 snapshot no longer contains)
    // REMOVED via the bucketed anti-join rewrite — the freshness audit
    // then reads n_stale = 0 on both legs (deleted docs can no longer
    // resurface from the serving forms; rebuild-equality is
    // spec-pinned per family).
    "x214_index_delete" -> ((s, dir) => {
      val (digT, assignT) = deletedIndexFor(s, dir)
      val snapDocs = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(sha2(lower(trim(col("text"))), 256).as("k"))
      val snapVecs = t(s, dir, "embeddings")
        .filter(pmod(col("vec_id"), lit(3)) === 0).select(col("vec_id"))
      Warehouse.indexFreshnessAudit(Seq(
        ("digest_idx_deleted", snapDocs,
          s.table(digT).select(col("digest"))),
        ("ann_assign_deleted", snapVecs,
          s.table(assignT).select(col("neighbor_id")))))
    }),

    // x215 — x211's exact counts through the bucketed-checksum fast
    // path: both sides collapse to 64 (count, order-free digest) rows
    // and only DIRTY buckets pay the key-level diff — the freshness
    // audit a 100 TB operator can run every cycle. Same legs, same
    // oracle as x211 (the fast path changes the COST, never the
    // counts).
    "x215_freshness_bucketed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val digestIdx = digestIndexFor(s, dir)
      val (assignT, _) = annDedupIndexFor(s, dir)
      val digests = (df: DataFrame) =>
        df.select(sha2(lower(trim(col("text"))), 256).as("k"))
      Warehouse.indexFreshnessAuditBucketed(Seq(
        ("digest_idx", digests(docs),
          s.table(digestIdx).select(col("digest"))),
        ("digest_idx_vs_snapshot",
          digests(docs.filter(pmod(col("doc_id"), lit(3)) === 0)),
          s.table(digestIdx).select(col("digest"))),
        ("ann_assign", t(s, dir, "embeddings").select(col("vec_id")),
          s.table(assignT).select(col("neighbor_id")))))
    }),

    // x216 — the APPLIED-BATCH LEDGER: a versioned edge-index family
    // driven through the full mutation protocol — bootstrap build of
    // the even orders (v1), guarded append of the odd orders (v1,
    // batch id = the order-free md5 fold of the key set), staged
    // takedown of the %3 orders (v2) — and then REPLAYED: both
    // guarded mutations run a second time inside the fixture build
    // and must report the ledger no-op. The ledger holding exactly
    // ONE row per batch IS the idempotency exhibit; the oracle
    // recomputes every batch id from the corpus under the
    // Snapshots.batchIdFor law (bit-for-bit, like x7's fingerprints).
    // GraphSpec's kill-at-each-step spec pins the crash story the
    // ledger closes.
    "x216_applied_batch_ledger" -> ((s, dir) =>
      Snapshots.ledger(s, versionedEdgeIndexFor(s, dir), "vedge")),

    // x217 — THE MAINTENANCE CYCLE as a registered exhibit: cycle 1
    // (run once at build time, its action log persisted as the
    // sidecar) repairs a digest index whose corpus moved under it —
    // stale keys deleted, missing keys appended, closing audit fresh
    // — next to an audit-only ANN leg; cycle 2 runs LIVE on every
    // call and is the steady state (audit rows only, nothing
    // repaired). The n= details size every repair by what CHANGED,
    // never by corpus size — the 10x probe pins that claim.
    "x217_maintenance_cycle" -> ((s, dir) => {
      import s.implicits._
      val (logT, maintained) = maintenanceCycleFor(s, dir)
      val live = Maintenance.runCycle(s, maintained)
        .map(a => (a.index, a.action, a.detail))
        .toDF("index_name", "action", "detail")
      s.table(logT).withColumn("cycle", lit(1L))
        .unionByName(live.withColumn("cycle", lit(2L)))
        .select(col("cycle"), col("index_name"), col("action"),
          col("detail"))
    }),

    // x218 — DELETE-TIME CAPTURE, end to end: a landing-table delete
    // captures the dropped rows into a tombstone feed
    // (Warehouse.deleteFromLandingWithCapture), and the next
    // maintenance cycle repairs the ADDITIVE edge index from that
    // feed through the idempotent versioned delete — the one repair
    // x211's post-hoc key audit cannot perform (the negated partials
    // need the deleted ROWS, which the landing table no longer has).
    // Cycle 1's log (persisted at build) shows the batch applied and
    // the closing audit fresh; the live cycle 2 shows the pruned feed
    // re-applying nothing. The maintained index declares the family's
    // ledger + retire bases, so every cycle also runs the
    // concurrent-writer tripwire (conflict_audit rows, conflicts=0)
    // and the grace-window retire (nothing to reclaim at 2 live
    // versions — no row). The salted batch id in the log is the
    // oracle's to recompute.
    "x218_tombstone_capture" -> ((s, dir) => {
      import s.implicits._
      val (logT, maintained) = tombstoneCycleFor(s, dir)
      val live = Maintenance.runCycle(s, maintained)
        .map(a => (a.index, a.action, a.detail))
        .toDF("index_name", "action", "detail")
      s.table(logT).withColumn("cycle", lit(1L))
        .unionByName(live.withColumn("cycle", lit(2L)))
        .select(col("cycle"), col("index_name"), col("action"),
          col("detail"))
    }),

    // x219 — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means
    // trained on the embeddings (x90's seeded Lloyd law — 8 seeds, 3
    // rounds), then the dedup decision is pairwise cosine confined to
    // SAME-CLUSTER blocks: the paper's trick for making semantic
    // dedup tractable where x9's brute pairs and x22's fixed-centroid
    // blocks don't learn the partition. One row per vector —
    // kept/dropped with the strongest smaller-id witness.
    "x219_semdedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.semDedup(e, e.filter(col("vec_id") < 8), "vec_id",
        "embedding", rounds = 3, threshold = 0.35)
    }),

    // x220 — DSIR data selection (Xie et al. 2023, arXiv:2302.03169):
    // hashed-bigram importance weights rank every document by how
    // target-like (here: English-slice-like) its n-grams are; the
    // top-100 are the selected pretraining subset. Bucket hashing is
    // the md5-fold law, weights pre-rounded at 1e-4 so scores are
    // integer sums — the oracle recomputes everything bit-for-bit.
    "x220_dsir_select" -> ((s, dir) =>
      TextAnalysis.dsirSelect(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", numBuckets = 256, topN = 100)),

    // x221 — the nprobe recall/cost SWEEP over x91's persisted IVF
    // index: recall@3 vs exact next to the scored-candidate count at
    // nprobe = 1..4 — the curve the probe width is tuned against
    // (x128 audits one point; this is the picking artifact).
    "x221_nprobe_sweep" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val (assignT, centT) = annIndexFor(s, dir)
      Similarity.nprobeSweep(e.filter(col("vec_id") < 10), e, "vec_id",
        "embedding", k = 3, nprobes = Seq(1, 2, 3, 4), assignT, centT)
    }),

    // x222 — DSIR SERVING: weights frozen once from the even-id corpus
    // slice (TextAnalysis.writeDsirIndex, complete over all 256
    // buckets so unseen grams score lawfully), then the odd-id batch
    // scores against the frozen table — one batch gram pass + one
    // broadcast join, zero corpus touches (x220's train/serve split,
    // the x119 frozen-threshold pattern applied to data selection).
    "x222_dsir_indexed" -> ((s, dir) => {
      val wt = dsirIndexFor(s, dir)
      TextAnalysis.dsirScoreIndexed(s,
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", wt)
    }),

    // x223 — SemDeDup APPLIED (the family's apply twin, x39's shape
    // on the semantic tier): the embedding corpus minus x219's
    // dropped set, id + label preserved. Serves from the PERSISTED
    // drop set (the frozen-books convention — x219 stays the
    // training exhibit; the apply pays one corpus scan + a broadcast
    // anti-join, zero retraining).
    "x223_semdedup_apply" -> ((s, dir) => {
      val drops = semdedupDropsFor(s, dir)
      t(s, dir, "embeddings")
        .join(broadcast(s.table(drops)), Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label"))
    }),

    // x224 — EXACT-SUBSTRING duplicate spans (Lee et al. 2022,
    // arXiv:2107.06499): maximal character spans covered by 24-char
    // substrings occurring more than once corpus-wide, first
    // occurrence kept — the suffix-array dedup production corpora run
    // NEXT TO MinHash, char-level where x83 is token-level. The
    // equality classes come from L-bounded suffix-rank DOUBLING (log L
    // per-doc lead() rounds over one (doc_id, pos, key) shuffle — no
    // L-byte gram strings ever materialize; the oracle groups the
    // substrings directly, same classes).
    "x224_substring_dedup" -> ((s, dir) =>
      TextDedup.substringDupSpans(t(s, dir, "documents"), "doc_id",
        "text", L = 24)),

    // x225 — x224 APPLIED (the family's surgery twin, x87's shape
    // character-exact): every duplicated span cut, the rest
    // byte-identical; no-span documents pass through, fully-duplicated
    // ones end empty (the caller's drop decision).
    "x225_substring_apply" -> ((s, dir) =>
      TextDedup.substringDedupApply(t(s, dir, "documents"), "doc_id",
        "text", L = 24)),

    // x227 — x224 through its PERSISTED gram-key index (the x74/x80
    // continuous-ingestion shape on the substring tier): the even-id
    // corpus's distinct doubling keys are a frozen bucketed table; the
    // odd-id batch pays one doubling pass over ITSELF plus a bucketed
    // semi-join — corpus text never rescanned, keys never recomputed.
    // A batch gram anywhere in the corpus is duplicated (corpus keeps);
    // batch-internal repeats keep their min (doc_id, pos).
    "x227_substring_indexed" -> ((s, dir) =>
      TextDedup.substringDupSpansIndexed(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", L = 24, substringIndexFor(s, dir))),

    // x228 — per-source SUBSTRING-duplication savings: the data-card
    // row completing the savings family (x115 exact docs, x108
    // near-dup docs, this = duplicated CHARACTER mass under x224's
    // keep rule) — prices keeping documents while cutting their
    // duplicated runs, the mass whole-document dedup cannot recover.
    "x228_substring_savings" -> ((s, dir) =>
      TextDedup.substringDupSavings(t(s, dir, "documents"), "doc_id",
        "text", "source", L = 24)),

    // x232 — CHAR-level benchmark decontamination served from the
    // frozen substring index (x95 on the substring tier): odd-id
    // corpus spans covered by 24-grams appearing ANYWHERE in the
    // even-id "benchmark" index — NO first-occurrence exemption, no
    // batch-internal leg (the dedup/decontam split the token tier
    // already draws between x83 and x95). Eval suites are stable:
    // the index builds once per release, each batch pays only its own
    // doubling pass + the bucketed semi-join.
    "x232_substring_decontam" -> ((s, dir) =>
      TextDedup.substringContaminatedSpans(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", L = 24, substringIndexFor(s, dir))),

    // x231 — EMBEDDING-level decontamination: the semantic counter to
    // x38/x44/x95's lexical family — a corpus vector cosine-close
    // (>= 0.35, raw-cosine compare per x9's law) to ANY benchmark
    // vector (vec_id < 20, x226's benchmark-slice convention) is
    // dropped: paraphrased benchmark leakage that shingle overlap and
    // verbatim span matching cannot see. The benchmark collects once
    // (eval-suite-sized, the centroid convention); the corpus pays ONE
    // scan through the bestMatch codegen kernel — a pure projection,
    // zero joins, zero shuffles.
    "x231_semantic_decontam" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.semanticDecontam(e.filter(col("vec_id") >= 20),
        e.filter(col("vec_id") < 20), "vec_id", "embedding",
        threshold = 0.35)
    }),

    // x230 — x225's SURGERY against the FROZEN gram-key index (the
    // serving form of the apply twin, and the batch-mode body of the
    // streaming ingest's per-micro-batch work): the odd-id batch is
    // span-checked against the even-id corpus index (x227's law) and
    // cut character-exact (x225's fused rewrite) in one call — what a
    // user runs to clean NEW data against an indexed corpus without
    // rescanning it.
    "x230_substring_apply_indexed" -> ((s, dir) =>
      TextDedup.substringDedupApplyIndexed(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", L = 24, substringIndexFor(s, dir))),

    // x229 — THE SUBSTRING GRAM-KEY INDEX UNDER MAINTENANCE: the x227
    // serving artifact registered as a MaintainedIndex — the bucketed
    // checksum freshness audit over gram keys (x215's shape), exact
    // repairs sized by what changed, the whole pass under the family's
    // writer lease. Cycle 1 (persisted at build) repaired the even-id
    // bootstrap against the %3 corpus; the live cycle 2 is the steady
    // state (one audit row, reusing the opening audit, so the
    // corpus-side doubling pass runs once per cycle).
    "x229_substring_maintained" -> ((s, dir) => {
      import s.implicits._
      val (logT, maintained) = substringCycleFor(s, dir)
      val live = Maintenance.runCycle(s, maintained)
        .map(a => (a.index, a.action, a.detail))
        .toDF("index_name", "action", "detail")
      s.table(logT).withColumn("cycle", lit(1L))
        .unionByName(live.withColumn("cycle", lit(2L)))
        .select(col("cycle"), col("index_name"), col("action"),
          col("detail"))
    })
  )

  /** Build-if-missing the x227 substring gram-key index: the EVEN
    * doc_ids' distinct 24-gram doubling keys, bucketed. */
  private def substringIndexFor(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_idx.ssidx_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(table)) {
      dropStaleManaged(s, table)
      TextDedup.writeSubstringIndex(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", L = 24, table)
    }
    table
  }

  /** Build-if-missing the x229 MAINTAINED substring gram-key index:
    * bootstrapped over the EVEN doc_ids (x227's slice) while its
    * maintained corpus is the `%3 == 0` snapshot — both repair
    * counters nonzero, x217's moving-corpus story on the substring
    * tier — so cycle 1 deletes the stale gram keys and appends the
    * missing ones, ending fresh. The cycle-1 action log persists as
    * the sidecar; the family's writer lease guards every cycle
    * (runCycle's round-18 adoption — acquisition is silent, denial
    * would log `lease_denied`). Returns (cycle1LogTable, the
    * maintained index). */
  private def substringCycleFor(s: SparkSession, dir: String)
      : (String, Seq[MaintainedIndex]) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val keysT = s"graft_idx.ssmc_keys_$tag"
    val logT = s"graft_idx.ssmc_log_$tag"
    val leaseT = s"graft_idx.ssmc_lease_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    val maintained = Seq(MaintainedIndex("substring_idx",
      tables = Seq(("gram_keys", keysT, Seq.empty)),
      corpusKeys = ss => TextDedup.substringGramKeys(
        t(ss, dir, "documents")
          .filter(pmod(col("doc_id"), lit(3)) === 0),
        "doc_id", "text", L = 24),
      indexKeys = ss => ss.table(keysT).select(col("gram_key")),
      appendMissing = Some((ss, keys) =>
        graft.sinks.Sinks.writeBucketed(keys.toDF("gram_key"), keysT,
          Seq("gram_key"), 16, append = true)),
      deleteStale = Some((ss, keys) =>
        Warehouse.deleteFromIndex(ss, keysT, "gram_key", keys)),
      compactFilesFactor = Double.MaxValue,
      lease = Some(leaseT)))
    if (!s.catalog.tableExists(keysT) || !s.catalog.tableExists(logT)) {
      import s.implicits._
      Seq(keysT, logT, leaseT).foreach(dropStaleManaged(s, _))
      TextDedup.writeSubstringIndex(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", L = 24, keysT)
      Maintenance.runCycle(s, maintained)
        .map(a => (a.index, a.action, a.detail))
        .toDF("index_name", "action", "detail")
        .coalesce(1).write.mode("overwrite").format("parquet")
        .saveAsTable(logT)
    }
    (logT, maintained)
  }

  /** Build-if-missing the x116 near-dup COMPONENT table: the
    * k=3 / τ=0.5 jaccard pair graph's connected components, persisted
    * once per fixture (near-dup-sized) so the cluster-keep serves
    * ([[graft.operators.CorpusPipeline.qualityRepsIndexed]]) never
    * re-run the pair walk. */
  private def neardupComponentsFor(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_idx.ndcomp_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(table)) {
      dropStaleManaged(s, table)
      CorpusPipeline.writeComponentIndex(t(s, dir, "documents"),
        "doc_id", "text", k = 3, threshold = 0.5, table)
    }
    table
  }

  /** Build-if-missing the x223 drop set: x219's dropped vec_ids
    * persisted once (8 seeds, 3 rounds, τ=0.35 — the registered
    * training knobs), duplicate-sized. */
  private def semdedupDropsFor(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_idx.semdrop_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(table)) {
      dropStaleManaged(s, table)
      val e = t(s, dir, "embeddings")
      Similarity.semDedup(e, e.filter(col("vec_id") < 8), "vec_id",
          "embedding", rounds = 3, threshold = 0.35)
        .filter(col("status") === "dropped")
        .select(col("vec_id"))
        .coalesce(1).write.mode("overwrite").format("parquet")
        .saveAsTable(table)
    }
    table
  }

  /** Build-if-missing the x222 DSIR weight table: corpus = EVEN
    * doc_ids, target = its English slice, 256 buckets. */
  private def dsirIndexFor(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_idx.dsir_w_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(table)) {
      dropStaleManaged(s, table)
      TextAnalysis.writeDsirIndex(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", col("lang") === "en", numBuckets = 256, table)
    }
    table
  }

  /** Build-if-missing the x213 deep-merge exhibit: a SEPARATE edge
    * index built in two disjoint complete-order ingests (so the
    * additive tables hold one partial row per (key, ingest)), its
    * PRE-merge [[graft.operators.Warehouse.indexPartialAudit]]
    * persisted as a 1-file sidecar (the trigger reading), then
    * deep-merged via [[graft.operators.Graph.mergeEdgeIndex]].
    * Returns (beforeAuditTable, the audit targets for the live
    * re-read). The basket table audits at 1.0 even BEFORE the merge —
    * its (order, brand) rows are unique under the disjoint-orders law
    * — pinning that only the ADDITIVE tables accrete partials. */
  private def mergedEdgeIndexFor(s: SparkSession, dir: String)
      : (String, Seq[(String, String, Seq[String])]) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tables = Seq("ob", "edges", "totals", "stats")
      .map(n => s"graft_idx.medge_${n}_$tag")
    val Seq(ob, ed, tot, st) = tables
    val before = s"graft_idx.medge_before_$tag"
    val targets = Seq(
      ("ob", ob, Seq("order_key", "brand")),
      ("edges", ed, Seq("src", "dst")),
      ("totals", tot, Seq("brand")))
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!(tables :+ before).forall(s.catalog.tableExists)) {
      (tables :+ before).foreach(dropStaleManaged(s, _))
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      Graph.writeEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 0),
        p, ob, ed, tot, st, numBuckets = 8)
      Graph.appendEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 1),
        p, ob, ed, tot, st, numBuckets = 8)
      Warehouse.indexPartialAudit(s, targets).coalesce(1)
        .write.mode("overwrite").format("parquet").saveAsTable(before)
      Graph.mergeEdgeIndex(s, ob, ed, tot, st)
    }
    (before, targets)
  }

  /** Build-if-missing the x214 takedown exhibit: digest + ANN indexes
    * on the EVEN ids, then
    * [[graft.operators.Warehouse.deleteFromIndex]] of every key the
    * `% 3 == 0` snapshot no longer contains (the stale set x211
    * counts), so the steady state serves exactly the snapshot ∩ even
    * rows. Returns (digestTable, assignTable). */
  private def deletedIndexFor(s: SparkSession, dir: String)
      : (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val dig = s"graft_idx.ddel_digests_$tag"
    val assignT = s"graft_idx.ddel_ann_assign_$tag"
    val centT = s"graft_idx.ddel_ann_cent_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(dig) || !s.catalog.tableExists(assignT) ||
        !s.catalog.tableExists(centT)) {
      Seq(dig, assignT, centT).foreach(dropStaleManaged(s, _))
      val docs = t(s, dir, "documents")
      TextDedup.writeDigestIndex(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", dig)
      val snapDocs = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(sha2(lower(trim(col("text"))), 256).as("digest"))
      Warehouse.deleteFromIndex(s, dig, "digest",
        s.table(dig).select(col("digest"))
          .join(snapDocs, Seq("digest"), "left_anti"))
      val e = t(s, dir, "embeddings")
      Similarity.writeAnnIndex(e.filter(pmod(col("vec_id"), lit(2)) === 0),
        e.filter(col("vec_id") < 16), "vec_id", "embedding",
        assignT, centT)
      Warehouse.deleteFromIndex(s, assignT, "neighbor_id",
        s.table(assignT).select(col("neighbor_id"))
          .join(e.filter(pmod(col("vec_id"), lit(3)) === 0)
            .select(col("vec_id").as("neighbor_id")),
            Seq("neighbor_id"), "left_anti"))
    }
    (dig, assignT)
  }

  /** Build-if-missing the x216 applied-batch-ledger exhibit: a
    * VERSIONED edge-index family ([[graft.operators.Snapshots]])
    * driven through bootstrap build (even orders, v1), guarded append
    * (odd orders, v1), staged versioned delete (%3 orders, v2) — and
    * then both guarded mutations REPLAYED, which must be logged
    * no-ops (enforced here: a replay that applied fails the build
    * loudly) — followed by a maintenance merge publish (v3) and a
    * [[graft.operators.Snapshots.retire]] of v1 past the grace
    * period (ledger rows stay; only physical tables go). Returns the
    * ledger table name. The steady state is a 4-row metadata read. */
  private def versionedEdgeIndexFor(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val ledger = s"graft_idx.vedge_ledger_$tag"
    val bases = Seq("ob", "edges", "totals", "stats")
      .map(n => s"graft_idx.vedge_${n}_$tag")
    val Seq(obB, edB, toB, stB) = bases
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(ledger)) {
      (ledger +: bases.flatMap(b => b +: (1 to 3).map(v => s"${b}_v$v")))
        .foreach(dropStaleManaged(s, _))
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val odd = li.filter(pmod(col("l_orderkey"), lit(2)) === 1)
      val del = li.filter(pmod(col("l_orderkey"), lit(3)) === 0)
      Graph.writeEdgeIndexVersioned(
        li.filter(pmod(col("l_orderkey"), lit(2)) === 0), p, ledger,
        "vedge", obB, edB, toB, stB, numBuckets = 8)
      Graph.appendEdgeIndexVersioned(odd, p, ledger, "vedge",
        obB, edB, toB, stB)
      Graph.deleteFromEdgeIndexVersioned(del, p, ledger, "vedge",
        obB, edB, toB, stB)
      // the idempotency law, exercised on every build: a replayed
      // mutation is a ledger no-op — no new row, no double-subtract
      require(!Graph.appendEdgeIndexVersioned(odd, p, ledger, "vedge",
        obB, edB, toB, stB), "replayed append was applied")
      require(!Graph.deleteFromEdgeIndexVersioned(del, p, ledger, "vedge",
        obB, edB, toB, stB), "replayed delete was applied")
      // maintenance publish (v3) + grace-period reclaim: retire keeps
      // the current and previous snapshots (in-flight readers) and
      // drops v1 — the ledger row stays, the physical tables go
      Graph.mergeEdgeIndexVersioned(s, ledger, "vedge",
        obB, edB, toB, stB)
      require(Snapshots.retire(s, ledger, "vedge", bases,
        keepVersions = 2) == Seq(1L), "retire did not reclaim v1")
    }
    ledger
  }

  /** Build-if-missing the x217 maintenance-cycle exhibit: a dedicated
    * digest index built on the EVEN doc ids whose maintained corpus is
    * the `%3 == 0` snapshot (both counters nonzero — x211's moving
    * corpus), next to an AUDIT-ONLY leg over the shared x92 ANN
    * assignment index (no callbacks: its gap is reported, never
    * repaired, and the shared table is never mutated). Cycle 1 — the
    * repair cycle — runs once here and its action log persists as the
    * sidecar; callers re-run the cycle live for the steady state.
    * Layout compaction is x210's exhibit, not this one's: the factor
    * is set so the log carries only freshness actions. Returns
    * (cycle1LogTable, the maintained indexes). */
  private def maintenanceCycleFor(s: SparkSession, dir: String)
      : (String, Seq[MaintainedIndex]) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val digT = s"graft_idx.mcyc_digests_$tag"
    val logT = s"graft_idx.mcyc_log_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    val (assignT, _) = annDedupIndexFor(s, dir)
    val maintained = Seq(
      MaintainedIndex("digest_idx",
        tables = Seq(("digests", digT, Seq.empty)),
        corpusKeys = ss => t(ss, dir, "documents")
          .filter(pmod(col("doc_id"), lit(3)) === 0)
          .select(sha2(lower(trim(col("text"))), 256).as("k")),
        indexKeys = ss => ss.table(digT).select(col("digest")),
        appendMissing = Some((ss, keys) =>
          graft.sinks.Sinks.writeBucketed(keys.toDF("digest"), digT,
            Seq("digest"), 16, append = true)),
        deleteStale = Some((ss, keys) =>
          Warehouse.deleteFromIndex(ss, digT, "digest", keys)),
        compactFilesFactor = Double.MaxValue),
      MaintainedIndex("ann_assign",
        tables = Seq(("assign", assignT, Seq.empty)),
        corpusKeys = ss => t(ss, dir, "embeddings").select(col("vec_id")),
        indexKeys = ss => ss.table(assignT).select(col("neighbor_id")),
        compactFilesFactor = Double.MaxValue))
    if (!s.catalog.tableExists(digT) || !s.catalog.tableExists(logT)) {
      import s.implicits._
      Seq(digT, logT).foreach(dropStaleManaged(s, _))
      TextDedup.writeDigestIndex(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 0),
        "text", digT)
      Maintenance.runCycle(s, maintained)
        .map(a => (a.index, a.action, a.detail))
        .toDF("index_name", "action", "detail")
        .coalesce(1).write.mode("overwrite").format("parquet")
        .saveAsTable(logT)
    }
    (logT, maintained)
  }

  /** Build-if-missing the x218 delete-time-capture exhibit: a managed
    * LANDING copy of lineitem feeds a versioned edge index; the `%5`
    * orders are then deleted from the landing table through
    * [[graft.operators.Warehouse.deleteFromLandingWithCapture]]
    * (captured rows land in the tombstone feed, stamped with the
    * deterministic batch id), and cycle 1 consumes the feed through
    * the idempotent versioned delete, ending fresh. The cycle-1 log
    * persists as the sidecar; callers re-run the cycle live for the
    * steady state (feed pruned, ledger no-op). Returns
    * (cycle1LogTable, the maintained index). */
  private def tombstoneCycleFor(s: SparkSession, dir: String)
      : (String, Seq[MaintainedIndex]) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val landT = s"graft_idx.vcap_lineitem_$tag"
    val tombT = s"graft_idx.vcap_tombstones_$tag"
    val ledger = s"graft_idx.vcap_ledger_$tag"
    // log3: round 17 salted the capture id (e<version>- prefix) and
    // then wired the family's ledger + retire bases into the cycle
    // (conflict_audit rows land in the log) — each rename forces stale
    // fixtures in a persisted warehouse to rebuild
    val logT = s"graft_idx.vcap_log3_$tag"
    val bases = Seq("ob", "edges", "totals", "stats")
      .map(n => s"graft_idx.vcap_${n}_$tag")
    val Seq(obB, edB, toB, stB) = bases
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    val maintained = Seq(MaintainedIndex("edges",
      tables = Seq(("ob", obB, Seq.empty)),
      resolveTables = Some(ss => {
        val (ob, ed, tot, st) = Graph.resolveEdgeIndex(ss, ledger,
          "edges", obB, edB, toB, stB)
        Seq(("ob", ob, Seq.empty), ("edges", ed, Seq.empty),
          ("totals", tot, Seq.empty), ("stats", st, Seq.empty))
      }),
      corpusKeys = ss =>
        ss.table(landT).select(col("l_orderkey")).distinct(),
      indexKeys = ss => Graph.readEdgeIndexVersioned(ss, ledger, "edges",
        obB, edB, toB, stB)._1.select(col("order_key")).distinct(),
      compactFilesFactor = Double.MaxValue,
      tombstones = Some(TombstoneFeed(tombT,
        (ss, rows, bid) => Graph.deleteFromEdgeIndexVersioned(rows,
          t(ss, dir, "part"), ledger, "edges", obB, edB, toB, stB,
          batchId = Some(bid)),
        isApplied = Some((ss, bid) =>
          Snapshots.isApplied(ss, ledger, "edges", bid)))),
      ledger = Some((ledger, "edges")),
      retireBases = Some(bases)))
    if (!s.catalog.tableExists(logT) || !s.catalog.tableExists(landT) ||
        !s.catalog.tableExists(ledger)) {
      import s.implicits._
      (Seq(landT, tombT, ledger, logT, s"graft_idx.vcap_log_$tag",
        s"graft_idx.vcap_log2_$tag") ++
        bases.flatMap(b => b +: (1 to 3).map(v => s"${b}_v$v")))
        .foreach(dropStaleManaged(s, _))
      val li = t(s, dir, "lineitem")
      li.write.format("parquet").saveAsTable(landT)
      Graph.writeEdgeIndexVersioned(s.table(landT), t(s, dir, "part"),
        ledger, "edges", obB, edB, toB, stB, numBuckets = 8)
      Warehouse.deleteFromLandingWithCapture(s, landT, "l_orderkey",
        li.filter(pmod(col("l_orderkey"), lit(5)) === 0)
          .select(col("l_orderkey")), tombT,
        ledger = Some((ledger, "edges")))
      Maintenance.runCycle(s, maintained)
        .map(a => (a.index, a.action, a.detail))
        .toDF("index_name", "action", "detail")
        .coalesce(1).write.mode("overwrite").format("parquet")
        .saveAsTable(logT)
    }
    (logT, maintained)
  }

  /** x60's deterministic PII augmentation (the fixture corpus carries
    * no natural PII): appends a doc_id-derived contact line — email
    * always, phone on even ids, IPv4 on ids not divisible by 3 —
    * reproduced verbatim oracle-side. Shared by x60 (inline) and x118. */
  private def piiAugment(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("source"),
      concat(col("text"),
        lit(" reach doc"), col("doc_id").cast("string"),
        lit("@mail.example.com"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(" tel 555-123-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) =!= 0,
          concat(lit(" from 10."),
            pmod(col("doc_id"), lit(200)).cast("string"),
            lit(".0."), pmod(col("doc_id"), lit(250)).cast("string")))
          .otherwise(lit(""))).as("text"))

  /** Build-if-missing the x80 index tables for a fixture dir; returns
    * (setsTable, bandsTable). One eager build per session+fixture — the
    * steady state (and every timed Bench pass) only reads. */
  private def neardupIndexFor(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val sets = s"graft_idx.nd_sets_$tag"
    val bands = s"graft_idx.nd_bands_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(sets) || !s.catalog.tableExists(bands)) {
      Seq(sets, bands).foreach(dropStaleManaged(s, _))
      TextDedup.writeNeardupIndex(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 0),
        "doc_id", "text", k = 3, sets, bands)
    }
    (sets, bands)
  }

  /** Build-if-missing the x107 BM25 index tables (postings bucketed by
    * term + 1-row length stats); returns (postingsTable, statsTable).
    * Same build-once-read-steady contract as [[neardupIndexFor]]. */
  private def bm25IndexFor(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val post = s"graft_idx.bm25_post_$tag"
    val stats = s"graft_idx.bm25_stats_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(post) || !s.catalog.tableExists(stats)) {
      Seq(post, stats).foreach(dropStaleManaged(s, _))
      Retrieval.writeBm25Index(t(s, dir, "documents"), "doc_id", "text",
        post, stats)
    }
    (post, stats)
  }

  /** Build-if-missing the x124 PQ index (codes + codebooks); returns
    * (codesTable, booksTable). Same build-once-read-steady contract as
    * [[bm25IndexFor]]. */
  private def pqIndexFor(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val codes = s"graft_idx.pq_codes_$tag"
    val books = s"graft_idx.pq_books_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(codes) || !s.catalog.tableExists(books)) {
      Seq(codes, books).foreach(dropStaleManaged(s, _))
      Similarity.writePqIndex(t(s, dir, "embeddings"), "vec_id",
        "embedding", codes, books, m = 4, k = 8, rounds = 2)
    }
    (codes, books)
  }

  /** Build-if-missing the x127 composed IVF-PQ index (bucketed codes +
    * PQ books + coarse centroids — x123's knobs: centroids = the 16
    * smallest vec_ids, m=4, k=8, rounds=2); returns (codesTable,
    * booksTable, centTable). Same build-once-read-steady contract as
    * [[pqIndexFor]]. */
  private def ivfPqIndexFor(s: SparkSession,
                            dir: String): (String, String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val codes = s"graft_idx.ivfpq_codes_$tag"
    val books = s"graft_idx.ivfpq_books_$tag"
    val cent = s"graft_idx.ivfpq_cent_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(codes) || !s.catalog.tableExists(books) ||
        !s.catalog.tableExists(cent)) {
      Seq(codes, books, cent).foreach(dropStaleManaged(s, _))
      val e = t(s, dir, "embeddings")
      Similarity.writeIvfPqIndex(e, e.filter(col("vec_id") < 16),
        "vec_id", "embedding", codes, books, cent, m = 4, k = 8, rounds = 2)
    }
    (codes, books, cent)
  }

  /** Build-if-missing the x204-x209 co-purchase edge index (basket
    * frame bucketed by order key, directed edges bucketed by src,
    * totals/stats sidecars); returns the SERVING frames
    * `(ob, edges, totals, stats)` via [[Graph.readEdgeIndex]]. Same
    * build-once-read-steady contract as [[bm25IndexFor]]. */
  private def edgeIndexFor(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val ob = s"graft_idx.edge_ob_$tag"
    val ed = s"graft_idx.edge_list_$tag"
    val tot = s"graft_idx.edge_totals_$tag"
    val st = s"graft_idx.edge_stats_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(ob) || !s.catalog.tableExists(ed) ||
        !s.catalog.tableExists(tot) || !s.catalog.tableExists(st)) {
      Seq(ob, ed, tot, st).foreach(dropStaleManaged(s, _))
      Graph.writeEdgeIndex(t(s, dir, "lineitem"), t(s, dir, "part"),
        ob, ed, tot, st, numBuckets = 8)
    }
    Graph.readEdgeIndex(s, ob, ed, tot, st)
  }

  /** Build-if-missing the x210 compaction exhibit: a SEPARATE edge
    * index built in two disjoint complete-order ingests (even then odd
    * order keys — the [[Graph.appendEdgeIndex]] additivity
    * preconditions) and then compacted, so the steady state audits as
    * one file per bucket while holding both ingests' partial rows.
    * Returns the (label, table) pairs for
    * [[Warehouse.indexFileAudit]]. */
  private def compactedEdgeIndexFor(s: SparkSession,
                                    dir: String): Seq[(String, String)] = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tables = Seq("ob", "edges", "totals", "stats")
      .map(n => n -> s"graft_idx.cedge_${n}_$tag")
    val Seq(ob, ed, tot, st) = tables.map(_._2)
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!tables.forall(t => s.catalog.tableExists(t._2))) {
      tables.foreach(t => dropStaleManaged(s, t._2))
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      Graph.writeEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 0),
        p, ob, ed, tot, st, numBuckets = 8)
      Graph.appendEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 1),
        p, ob, ed, tot, st, numBuckets = 8)
      tables.foreach(t => Warehouse.compactIndex(s, t._2))
    }
    tables
  }

  /** Build-if-missing the x110 novelty gram-df index; returns the
    * table name. Same build-once-read-steady contract as
    * [[neardupIndexFor]]. */
  private def noveltyIndexFor(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_idx.nov_df_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(table)) {
      dropStaleManaged(s, table)
      TextAnalysis.writeNoveltyIndex(t(s, dir, "documents"), "doc_id",
        "text", k = 3, table)
    }
    table
  }

  /** Build-if-missing the x81 digest index; returns the table name. */
  private def digestIndexFor(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_idx.digests_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(table)) {
      dropStaleManaged(s, table)
      TextDedup.writeDigestIndex(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(2)) === 0),
        "text", table)
    }
    table
  }

  /** With the in-memory catalog, table METADATA dies with the session
    * but the managed LOCATION under spark-warehouse survives — a fresh
    * JVM re-building the index would hit LOCATION_ALREADY_EXISTS. Drop
    * both (the DROP TABLE is a no-op when the catalog has no entry). */
  /** Build-if-missing the x91 IVF index tables (codebook = the 16
    * smallest vec_ids, x10's centroid set); returns (assignTable,
    * centTable). Same build-once-read-steady contract as
    * [[neardupIndexFor]]. */
  private def annIndexFor(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val assignT = s"graft_idx.ann_assign_$tag"
    val centT = s"graft_idx.ann_cent_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(assignT) || !s.catalog.tableExists(centT)) {
      Seq(assignT, centT).foreach(dropStaleManaged(s, _))
      val e = t(s, dir, "embeddings")
      Similarity.writeAnnIndex(e, e.filter(col("vec_id") < 16),
        "vec_id", "embedding", assignT, centT)
    }
    (assignT, centT)
  }

  /** Build-if-missing the x92 dedup index (existing corpus = EVEN
    * vec_ids, codebook = the 16 smallest even ids); returns
    * (assignTable, centTable). */
  private def annDedupIndexFor(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val assignT = s"graft_idx.ann2_assign_$tag"
    val centT = s"graft_idx.ann2_cent_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(assignT) || !s.catalog.tableExists(centT)) {
      Seq(assignT, centT).foreach(dropStaleManaged(s, _))
      val even = t(s, dir, "embeddings")
        .filter(pmod(col("vec_id"), lit(2)) === 0)
      Similarity.writeAnnIndex(even, even.filter(col("vec_id") < 32),
        "vec_id", "embedding", assignT, centT)
    }
    (assignT, centT)
  }

  /** Build-if-missing the x94 index: codebook TRAINED by
    * `Similarity.kmeansCentroids` (8 seeds, 3 rounds), assignment
    * table built under it; returns (assignTable, centTable). */
  private def annKmeansIndexFor(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val assignT = s"graft_idx.ann3_assign_$tag"
    val centT = s"graft_idx.ann3_cent_$tag"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_idx")
    if (!s.catalog.tableExists(assignT) || !s.catalog.tableExists(centT)) {
      Seq(assignT, centT).foreach(dropStaleManaged(s, _))
      val e = t(s, dir, "embeddings")
      val trained = Similarity.kmeansCentroids(e,
          e.filter(col("vec_id") < 8), "vec_id", "embedding", rounds = 3)
        .select(col("centroid_id").as("vec_id"), col("centv").as("embedding"))
      Similarity.writeAnnIndex(e, trained, "vec_id", "embedding",
        assignT, centT)
    }
    (assignT, centT)
  }

  private def dropStaleManaged(s: SparkSession, table: String): Unit =
    graft.sinks.Sinks.dropManaged(s, table)

  private val baseOracleSql: Map[String, String] = Map(
    "x1_exact_dedup" ->
      """SELECT sha256(lower(trim(text))) AS text_hash,
         min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1""",
    "x2_minhash_lsh" ->
      s"""WITH $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT d1 AS doc1, d2 AS doc2,
           floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0 AS jaccard
         FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0 >= 0.8""",
    "x3_topk_similarity" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 10),
         scored AS (SELECT query_id, vec_id AS neighbor_id,
             ${duckCos("qv", "embedding")} AS sim
           FROM embeddings, q WHERE vec_id <> query_id)
         SELECT query_id, neighbor_id,
           CAST(row_number() OVER w AS BIGINT) AS rank,
           floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
         FROM scored
         WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
         QUALIFY row_number() OVER w <= 5""",
    "x4_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         floor(CAST(SUM(len(string_split_regex(lower(trim(text)), '\s+')))
           AS DOUBLE) / count(*) * 10000 + 0.5) / 10000.0 AS avg_tokens,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY 1""",
    "x5_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
           AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
           AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
           AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
         floor(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
           / count(*) * 10000 + 0.5) / 10000.0 AS avg_qty,
         floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
           / count(*) * 10000 + 0.5) / 10000.0 AS avg_price,
         floor(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)
           / count(*) * 10000 + 0.5) / 10000.0 AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2""",
    "x6_star_join" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
           AS DOUBLE) AS revenue,
         count(DISTINCT o_orderkey) AS n_orders, count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1, 2""",
    // x7: the 60-bit fingerprint is re-derived in SQL from the same
    // md5-prefix token hashes, then pairs checked by all-pairs hamming
    // (the oracle may brute-force what the engine retrieves via banding —
    // pigeonhole banding is exact for hamming <= 3, so the sets agree).
    "x7_simhash_dedup" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         th AS (SELECT doc_id,
           ('0x' || substring(md5(term), 1, 15))::BIGINT AS h FROM toks),
         votes AS (SELECT doc_id, b.i AS bit,
             SUM(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM th, unnest(generate_series(0, 59)) AS b(i) GROUP BY 1, 2),
         fp AS (SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit
                  ELSE 0 END) AS BIGINT) AS fp
           FROM votes GROUP BY 1)
         SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 3""",
    "x8_ngram_jaccard" ->
      s"""WITH $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT d1 AS doc1, d2 AS doc2,
           floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0 AS jaccard
         FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0 >= 0.5""",
    "x9_embedding_neardup" ->
      s"""WITH pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
           ${duckCos("a.embedding", "b.embedding")} AS sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         SELECT id1, id2, floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
         FROM pairs WHERE sim >= 0.45""",
    "x10_ann_ivf" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id < 16),
         corp AS (SELECT vec_id AS neighbor_id, embedding AS cv
           FROM embeddings),
         assigned AS (SELECT neighbor_id, cv, centroid_id FROM (
           SELECT neighbor_id, cv, centroid_id, row_number() OVER
             (PARTITION BY neighbor_id
              ORDER BY ${duckCos("cv", "centv")} DESC, centroid_id) AS arn
           FROM corp, cent) WHERE arn = 1),
         q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 10),
         probes AS (SELECT query_id, qv, centroid_id FROM (
           SELECT query_id, qv, centroid_id, row_number() OVER
             (PARTITION BY query_id
              ORDER BY ${duckCos("qv", "centv")} DESC, centroid_id) AS prn
           FROM q, cent) WHERE prn <= 2),
         scored AS (SELECT query_id, neighbor_id,
             ${duckCos("qv", "cv")} AS sim
           FROM assigned JOIN probes USING (centroid_id)
           WHERE query_id <> neighbor_id)
         SELECT query_id, neighbor_id,
           CAST(row_number() OVER w AS BIGINT) AS rank,
           floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
         FROM scored
         WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
         QUALIFY row_number() OVER w <= 3""",
    "x22_neardup_ivf" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id < 16),
         corp AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
         assigned AS (SELECT vid, v, centroid_id FROM (
           SELECT vid, v, centroid_id, row_number() OVER
             (PARTITION BY vid
              ORDER BY ${duckCos("v", "centv")} DESC, centroid_id) AS arn
           FROM corp, cent) WHERE arn = 1),
         pairs AS (SELECT a.vid AS id1, b.vid AS id2,
             ${duckCos("a.v", "b.v")} AS sim
           FROM assigned a JOIN assigned b
             ON a.centroid_id = b.centroid_id AND a.vid < b.vid)
         SELECT id1, id2, floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
         FROM pairs WHERE sim >= 0.4""",
    "x11_langid" ->
      """WITH h AS (SELECT doc_id, lang AS labeled_lang,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> x IN ('the','a','of','and','to','in','is'))) AS h_en,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> x IN ('der','die','das','und','ist','ein','zu'))) AS h_de,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> x IN ('el','la','de','que','y','en','un'))) AS h_es,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> x IN ('le','la','et','les','des','un','une'))) AS h_fr,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> x IN ('的','是','了','在','和','有','我'))) AS h_zh
         FROM documents)
         SELECT doc_id, labeled_lang,
           CASE WHEN greatest(h_en, h_de, h_es, h_fr, h_zh) = 0 THEN 'und'
                WHEN h_en = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'de'
                WHEN h_es = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'es'
                WHEN h_fr = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           CAST(CASE WHEN (CASE WHEN greatest(h_en,h_de,h_es,h_fr,h_zh) = 0
                  THEN 'und'
                WHEN h_en = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'de'
                WHEN h_es = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'es'
                WHEN h_fr = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'fr'
                ELSE 'zh' END) = labeled_lang THEN 1 ELSE 0 END AS INTEGER)
             AS agree
         FROM h""",
    "x12_quality_score" ->
      """SELECT doc_id,
         CAST(length(trim(text)) AS INTEGER) AS n_chars,
         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INTEGER)
           AS n_tokens,
         floor((length(trim(text)) - length(regexp_replace(lower(trim(text)),
             '[^a-z0-9 ]', '', 'g'))) * 1.0 / length(trim(text))
           * 10000 + 0.5) / 10000.0 AS punct_ratio,
         floor(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             x -> x IN ('the','a','of','and','to','in','is',
                        'der','die','das','und','ist','ein','zu',
                        'el','la','de','que','y','en','un',
                        'le','et','les','des','une',
                        '的','是','了','在','和','有','我'))) * 1.0
           / len(string_split_regex(lower(trim(text)), '\s+'))
           * 10000 + 0.5) / 10000.0 AS stopword_ratio,
         floor(length(regexp_replace(trim(text), '\s+', '', 'g')) * 1.0
           / len(string_split_regex(lower(trim(text)), '\s+'))
           * 10000 + 0.5) / 10000.0 AS avg_token_len,
         floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS quality_score
         FROM documents""",
    "x13_token_count" ->
      """SELECT doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INTEGER)
           AS ws_tokens,
         CAST(len(regexp_extract_all(lower(trim(text)),
           '[a-z0-9]+|[^a-z0-9\s]')) AS INTEGER) AS bpe_tokens,
         CAST(length(trim(text)) AS INTEGER) AS n_chars
         FROM documents""",
    "x14_fingerprint" ->
      s"""WITH $duckShingles,
         d AS (SELECT DISTINCT doc_id, md5(s) AS h FROM sh),
         ranked AS (SELECT doc_id, h, row_number() OVER
           (PARTITION BY doc_id ORDER BY h) AS rn FROM d)
         SELECT doc_id, string_agg(h, '|' ORDER BY h) AS fingerprint
         FROM ranked WHERE rn <= 4 GROUP BY doc_id""",
    "x15_multimodal_features" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
         CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
         CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
         FROM documents""",
    // idf pre-rounded at 1e-4 on BOTH sides before the tf multiply (ln is
    // not correctly-rounded IEEE; see the x25 registration note).
    "x25_tfidf" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (SELECT doc_id, tf.term AS term, tf, df,
             floor(tf * (floor(ln((CAST(n_docs AS DOUBLE) + 1.0)
               / (CAST(df AS DOUBLE) + 1.0)) * 10000 + 0.5) / 10000.0)
               * 10000 + 0.5) / 10000.0 AS score
           FROM tf JOIN dfx USING (term) CROSS JOIN n)
         SELECT doc_id, term, tf, df, score,
           row_number() OVER w AS rank
         FROM scored
         WINDOW w AS (PARTITION BY doc_id ORDER BY score DESC, term)
         QUALIFY row_number() OVER w <= 3""",
    "x26_hash_split" ->
      """SELECT doc_id,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '9'
                THEN 'train'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                THEN 'val'
              ELSE 'test' END AS split
         FROM documents""",
    "x33_vocab" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2)
         SELECT term, CAST(sum(tf) AS BIGINT) AS n_occurrences,
           count(*) AS n_docs
         FROM tf GROUP BY 1
         ORDER BY n_occurrences DESC, term LIMIT 500""",
    "x37_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
             % 100
           < CASE WHEN lang = 'en' THEN 50
                  WHEN lang = 'zh' THEN 20 ELSE 10 END""",
    "x38_decontaminate" ->
      s"""WITH $duckShingles,
         bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
         ov AS (SELECT sh.doc_id, count(*) AS n_overlap
           FROM sh JOIN bench USING (s)
           WHERE sh.doc_id >= 20 GROUP BY 1)
         SELECT d.doc_id, CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(CASE WHEN coalesce(n_overlap, 0) >= 3 THEN 1 ELSE 0 END
             AS INTEGER) AS contaminated
         FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
         WHERE d.doc_id >= 20""",
    "x34_dedup_apply" ->
      """SELECT d.doc_id, d.lang, d.n_chars, g.n_dups
         FROM documents d JOIN (
           SELECT min(doc_id) AS doc_id, count(*) AS n_dups
           FROM documents GROUP BY sha256(lower(trim(text)))) g
         USING (doc_id)""",
    // fractions are exact long/long double divisions — bit-identical
    // across engines, no rounding needed (unlike ln(); see x25).
    "x35_repetition" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         bi AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
           FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)),
         bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
         bstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(max(c) AS BIGINT) AS top_bigram_count
           FROM bic GROUP BY 1),
         tri AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
           FROM toks, unnest(generate_series(1, len(t) - 2)) AS s(i)),
         tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
         tstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
               AS dup_trigram_count
           FROM tric GROUP BY 1)
         SELECT d.doc_id,
           coalesce(n_bigrams, 0) AS n_bigrams,
           coalesce(top_bigram_count, 0) AS top_bigram_count,
           coalesce(n_trigrams, 0) AS n_trigrams,
           coalesce(dup_trigram_count, 0) AS dup_trigram_count,
           CASE WHEN coalesce(n_bigrams, 0) > 0
             THEN CAST(top_bigram_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
           END AS top_bigram_frac,
           CASE WHEN coalesce(n_trigrams, 0) > 0
             THEN CAST(dup_trigram_count AS DOUBLE)
               / CAST(n_trigrams AS DOUBLE)
           END AS dup_trigram_frac
         FROM documents d
         LEFT JOIN bstat USING (doc_id) LEFT JOIN tstat USING (doc_id)""",
    // the pair set mirrors x2 (jaccard >= 0.8 on 3-shingles); components
    // via the same transitive-closure walk as x32; survivors = documents
    // that are their own component representative (or unpaired).
    "x36_neardup_apply" ->
      s"""WITH RECURSIVE $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         qp AS (SELECT d1, d2
           FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.8),
         edges AS (SELECT d1 AS a, d2 AS b FROM qp
           UNION SELECT d2, d1 FROM qp),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1)
         SELECT doc_id, lang, n_chars FROM documents
         WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> rep)""",
    // union of the x2 text-pair SQL and the x22 IVF-pair SQL, then the
    // same transitive-closure walk as x32.
    "x40_ensemble_dedup" ->
      s"""WITH RECURSIVE $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         tq AS (SELECT d1, d2
           FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.8),
         cent AS (SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id < 16),
         corp AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
         assigned AS (SELECT vid, v, centroid_id FROM (
           SELECT vid, v, centroid_id, row_number() OVER
             (PARTITION BY vid
              ORDER BY ${duckCos("v", "centv")} DESC, centroid_id) AS arn
           FROM corp, cent) WHERE arn = 1),
         vq AS (SELECT a.vid AS d1, b.vid AS d2
           FROM assigned a JOIN assigned b
             ON a.centroid_id = b.centroid_id AND a.vid < b.vid
           WHERE ${duckCos("a.v", "b.v")} >= 0.4),
         allp AS (SELECT d1, d2 FROM tq UNION SELECT d1, d2 FROM vq),
         edges AS (SELECT d1 AS a, d2 AS b FROM allp
           UNION SELECT d2, d1 FROM allp),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a)
         SELECT node AS doc_id, min(reach) AS cluster_rep
         FROM walk GROUP BY 1""",
    // ln pre-rounded at 1e-4 per term; each p*ln(p) contribution also
    // snapped to the 1e-4 grid BEFORE the decimal cast (double->decimal
    // casts are engine-stable only on <=6-digit grid points); grid
    // contributions summed as exact DECIMAL(38,6) — all three float
    // laws mirrored from the Spark side.
    "x41_token_entropy" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         n AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             count(*) AS n_terms FROM tf GROUP BY 1)
         SELECT tf.doc_id, n_tokens, n_terms,
           floor(-CAST(SUM(CAST(
               floor((tf * 1.0 / n_tokens)
                 * (floor(ln(tf * 1.0 / n_tokens) * 10000 + 0.5) / 10000.0)
                 * 10000 + 0.5) / 10000.0
             AS DECIMAL(38,6))) AS DOUBLE) * 10000 + 0.5) / 10000.0
             AS entropy
         FROM tf JOIN n USING (doc_id)
         GROUP BY 1, 2, 3""",
    // same IVF-blocked edges + closure walk as x32; survivors are the
    // vectors that are their own representative (or unpaired).
    "x39_embedding_dedup_apply" ->
      s"""WITH RECURSIVE cent AS (SELECT vec_id AS centroid_id,
             embedding AS centv
           FROM embeddings WHERE vec_id < 16),
         corp AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
         assigned AS (SELECT vid, v, centroid_id FROM (
           SELECT vid, v, centroid_id, row_number() OVER
             (PARTITION BY vid
              ORDER BY ${duckCos("v", "centv")} DESC, centroid_id) AS arn
           FROM corp, cent) WHERE arn = 1),
         pairs AS (SELECT a.vid AS d1, b.vid AS d2,
             ${duckCos("a.v", "b.v")} AS sim
           FROM assigned a JOIN assigned b
             ON a.centroid_id = b.centroid_id AND a.vid < b.vid),
         edges AS (
           SELECT d1 AS a, d2 AS b FROM pairs WHERE sim >= 0.4
           UNION SELECT d2, d1 FROM pairs WHERE sim >= 0.4),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1)
         SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim
         FROM embeddings
         WHERE vec_id NOT IN (SELECT node FROM comp WHERE node <> rep)""",
    // connected components via transitive closure (recursive CTE): reach
    // set per node, component = min reachable id — mirrors min-label
    // propagation exactly (both compute min over the reachability class).
    // The edge list mirrors the IVF blocking (same-centroid pairs only),
    // exactly as in the x22 oracle.
    "x32_dedup_clusters" ->
      s"""WITH RECURSIVE cent AS (SELECT vec_id AS centroid_id,
             embedding AS centv
           FROM embeddings WHERE vec_id < 16),
         corp AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
         assigned AS (SELECT vid, v, centroid_id FROM (
           SELECT vid, v, centroid_id, row_number() OVER
             (PARTITION BY vid
              ORDER BY ${duckCos("v", "centv")} DESC, centroid_id) AS arn
           FROM corp, cent) WHERE arn = 1),
         pairs AS (SELECT a.vid AS d1, b.vid AS d2,
             ${duckCos("a.v", "b.v")} AS sim
           FROM assigned a JOIN assigned b
             ON a.centroid_id = b.centroid_id AND a.vid < b.vid),
         edges AS (
           SELECT d1 AS a, d2 AS b FROM pairs WHERE sim >= 0.4
           UNION SELECT d2, d1 FROM pairs WHERE sim >= 0.4),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a)
         SELECT node AS vec_id, min(reach) AS cluster_rep
         FROM walk GROUP BY 1""",
    // 64-token windows, stride 48; a doc of n <= 64 tokens is one chunk,
    // else ceil((n-64)/48)+1 chunks (DuckDB list slice clamps the end).
    "x31_chunk_tokens" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         counted AS (SELECT doc_id, t,
           CASE WHEN len(t) <= 64 THEN 1
                ELSE CAST(ceil((len(t) - 64) * 1.0 / 48) AS BIGINT) + 1
           END AS n_chunks FROM toks)
         SELECT doc_id, g.i AS chunk_idx,
           array_to_string(t[(g.i * 48 + 1):(g.i * 48 + 64)], ' ') AS chunk
         FROM counted, unnest(generate_series(0, n_chunks - 1)) AS g(i)""",
    // directional: every ordered pair (inner, outer), containment =
    // intersect / |inner|, same 1e-4 round-then-compare as x8.
    "x43_containment_dedup" ->
      s"""WITH $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT d1 AS inner_id, d2 AS outer_id,
           floor(c * 1.0 / x.n * 10000 + 0.5) / 10000.0 AS containment
         FROM inter JOIN sz x ON d1 = x.doc_id
         WHERE floor(c * 1.0 / x.n * 10000 + 0.5) / 10000.0 >= 0.8""",
    // the Bloom prefilter is invisible to the result (false positives
    // die in the exact join) — the oracle is the exact 4-shingle
    // overlap count, the same shape as x38 at k=4.
    "x44_bloom_decontam" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         sh4 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS s
           FROM toks, unnest(generate_series(1, len(t) - 3)) AS g(i)),
         bench AS (SELECT DISTINCT s FROM sh4 WHERE doc_id < 30),
         ov AS (SELECT sh4.doc_id, count(*) AS n_overlap
           FROM sh4 JOIN bench USING (s)
           WHERE sh4.doc_id >= 30 GROUP BY 1)
         SELECT d.doc_id, CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(CASE WHEN coalesce(n_overlap, 0) >= 2 THEN 1 ELSE 0 END
             AS INTEGER) AS contaminated
         FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
         WHERE d.doc_id >= 30""",
    // quota smallest md5(id) per lang, doc_id tiebreak (md5 ties are
    // ~impossible at 60 bits but the order must be total on both
    // engines); rank <= per-lang quota.
    "x45_quota_sample" ->
      """WITH ranked AS (SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang ORDER BY
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
             doc_id) AS rank
           FROM documents)
         SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank FROM ranked
         WHERE rank <= CASE WHEN lang = 'en' THEN 60
                            WHEN lang = 'zh' THEN 25 ELSE 10 END""",
    // exclusive running sum of token counts over the (md5 hash, doc_id)
    // total order — the bucketed two-phase prefix sum is plan shape
    // only, invisible to the result.
    "x46_concat_offsets" ->
      """WITH tok AS (SELECT doc_id,
           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
             AS n_tokens,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             AS hk
           FROM documents)
         SELECT doc_id, n_tokens,
           CAST(coalesce(SUM(n_tokens) OVER (ORDER BY hk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_offset
         FROM tok""",
    "x47_token_budget_mix" ->
      """WITH tok AS (SELECT doc_id, source,
           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
             AS n_tokens,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             AS hk
           FROM documents),
         cum AS (SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id)
             AS BIGINT) AS cum_tokens
           FROM tok)
         SELECT doc_id, source, n_tokens, cum_tokens FROM cum
         WHERE cum_tokens <= CASE WHEN source = 'src0' THEN 900
                                  WHEN source = 'src1' THEN 400
                                  ELSE 700 END""",
    // w = fpRound(tok^0.5, 4): floor(x*1e4 + 0.5)/1e4 is the project's
    // cross-engine rounding law; the grid points sum as DECIMAL(38,6)
    // (order-independent), the rest is correctly-rounded IEEE ops.
    "x48_temperature_mix" ->
      """WITH tok AS (SELECT doc_id, source,
           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
             AS n FROM documents),
         grp AS (SELECT source, SUM(n) AS tokens FROM tok GROUP BY 1),
         wts AS (SELECT source,
           floor(pow(CAST(tokens AS DOUBLE), 0.5) * 10000 + 0.5) / 10000
             AS w FROM grp),
         tot AS (SELECT CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS wsum
           FROM wts),
         q AS (SELECT source,
           greatest(1, CAST(floor(w / wsum * 120) AS BIGINT)) AS quota
           FROM wts, tot),
         ranked AS (SELECT doc_id, source,
           row_number() OVER (PARTITION BY source ORDER BY
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
             doc_id) AS rank
           FROM documents)
         SELECT r.doc_id, r.source, CAST(r.rank AS BIGINT) AS rank
         FROM ranked r JOIN q USING (source) WHERE r.rank <= q.quota""",
    // fractional-epoch admission compares 15-hex-char md5 prefixes as
    // fixed-length strings (lexicographic == numeric): 0.25 -> 2^58 =
    // '4' || 14 zeros, 0.5 -> 2^59 = '8' || 14 zeros.
    "x49_epoch_repeat" ->
      """WITH base AS (SELECT doc_id, source,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS h
           FROM documents),
         cop AS (SELECT doc_id, source,
           CASE WHEN source = 'src0'
                  THEN 2 + CASE WHEN h < '400000000000000' THEN 1 ELSE 0 END
                WHEN source = 'src1'
                  THEN CASE WHEN h < '800000000000000' THEN 1 ELSE 0 END
                ELSE 1 END AS copies
           FROM base)
         SELECT doc_id, source, CAST(g.e AS BIGINT) AS epoch
         FROM cop, unnest(generate_series(0, copies - 1)) AS g(e)
         WHERE copies > 0""",
    // both engines key the df count on md5(passage) — identical
    // semantics by construction, even under (negligible) collisions.
    "x50_boilerplate_strip" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         counted AS (SELECT doc_id, t,
           CASE WHEN len(t) <= 8 THEN 1
                ELSE CAST(ceil((len(t) - 8) * 1.0 / 8) AS BIGINT) + 1
           END AS n_chunks FROM toks),
         ch AS (SELECT doc_id, g.i AS cid,
           md5(array_to_string(t[(g.i * 8 + 1):(g.i * 8 + 8)], ' ')) AS h,
           array_to_string(t[(g.i * 8 + 1):(g.i * 8 + 8)], ' ') AS p
           FROM counted, unnest(generate_series(0, n_chunks - 1)) AS g(i)),
         boiler AS (SELECT h FROM ch GROUP BY h
           HAVING count(DISTINCT doc_id) > 1),
         kept AS (SELECT ch.doc_id, ch.cid, ch.p FROM ch
           LEFT JOIN boiler USING (h) WHERE boiler.h IS NULL),
         agg AS (SELECT doc_id, count(*) AS n_kept,
           string_agg(p, ' ' ORDER BY cid) AS clean_text
           FROM kept GROUP BY doc_id)
         SELECT c.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(c.n_chunks - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped
         FROM counted c LEFT JOIN agg a USING (doc_id)""",
    "x51_data_card" ->
      """WITH base AS (SELECT source, lang,
           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
             AS tok,
           md5(lower(trim(text))) AS th FROM documents),
         grp AS (SELECT source, lang, count(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           count(DISTINCT th) AS n_distinct_texts FROM base GROUP BY 1, 2),
         tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total FROM grp)
         SELECT source, lang, n_docs, n_tokens,
           floor(CAST(n_tokens AS DOUBLE) / n_docs * 10000 + 0.5) / 10000
             AS avg_doc_tokens,
           n_distinct_texts,
           floor(CAST(n_docs - n_distinct_texts AS DOUBLE) / n_docs * 10000
             + 0.5) / 10000 AS dup_rate,
           floor(CAST(n_tokens AS DOUBLE) / total * 10000 + 0.5) / 10000
             AS token_share
         FROM grp, tot""",
    // positional k-grams (stride-1 windows of 3 tokens; a doc of < 3
    // tokens is its own single "gram" — same rule as the Spark kernel),
    // window-min selection over full 4-frames, value-distinct
    // fingerprints, pair counts of shared digests.
    "x52_winnow_pairs" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         sh AS (SELECT doc_id,
           CASE WHEN len(t) <= 3 THEN 1 ELSE len(t) - 2 END AS m,
           g.i AS i,
           md5(array_to_string(t[i:(i + 2)], ' ')) AS h
           FROM toks, unnest(generate_series(1,
             CASE WHEN len(t) <= 3 THEN 1 ELSE len(t) - 2 END)) AS g(i)),
         wm AS (SELECT doc_id, i, m,
           min(h) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
           FROM sh),
         fp AS (SELECT DISTINCT doc_id, mh FROM wm WHERE i <= m - 4 + 1)
         SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           count(*) AS n_shared
         FROM fp a JOIN fp b ON a.mh = b.mh AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2""",
    "x53_source_similarity" ->
      """WITH v AS (SELECT DISTINCT source,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         sz AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
         inter AS (SELECT a.source AS source1, b.source AS source2,
           count(*) AS c
           FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
           GROUP BY 1, 2)
         SELECT source1, source2, CAST(c AS BIGINT) AS n_shared_terms,
           floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             AS vocab_jaccard
         FROM inter JOIN sz x ON source1 = x.source
           JOIN sz y ON source2 = y.source""",
    // the x53 matrix over the derived strata + the threshold filter —
    // exact by the banding calibration + exact-verify argument.
    "x62_source_neighbors" ->
      """WITH v AS (SELECT DISTINCT
           source || '_' || CAST(doc_id % 7 AS VARCHAR) AS source,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         sz AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
         inter AS (SELECT a.source AS source1, b.source AS source2,
           count(*) AS c
           FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
           GROUP BY 1, 2)
         SELECT source1, source2, CAST(c AS BIGINT) AS n_shared_terms,
           floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             AS vocab_jaccard
         FROM inter JOIN sz x ON source1 = x.source
           JOIN sz y ON source2 = y.source
         WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
           >= 0.95""",
    // the x8 pair stream labeled by the x26 md5 split rule; avg over
    // the 1e-4-grid jaccards as DECIMAL(38,6) (order-independent), the
    // davg float law.
    "x54_split_leakage" ->
      s"""WITH $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT d1, d2,
           floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0 AS j
           FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.5),
         lab AS (SELECT j,
           CASE WHEN substring(md5(CAST(d1 AS VARCHAR)), 1, 1) <= '9'
                  THEN 'train'
                WHEN substring(md5(CAST(d1 AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'val'
                ELSE 'test' END AS s1,
           CASE WHEN substring(md5(CAST(d2 AS VARCHAR)), 1, 1) <= '9'
                  THEN 'train'
                WHEN substring(md5(CAST(d2 AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'val'
                ELSE 'test' END AS s2
           FROM pairs)
         SELECT least(s1, s2) AS split1, greatest(s1, s2) AS split2,
           count(*) AS n_leaky_pairs,
           floor(CAST(SUM(CAST(j AS DECIMAL(38,6))) AS DOUBLE) / count(*)
             * 10000 + 0.5) / 10000 AS avg_jaccard
         FROM lab WHERE s1 <> s2 GROUP BY 1, 2""",
    // vocab = the x33 aggregate at K=20 (same occurrences-desc, term-asc
    // tie-break), then per-occurrence membership.
    "x55_oov_rate" ->
      """WITH toks AS (SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         voc AS (SELECT term FROM (
           SELECT term, sum(tf) AS occ FROM tf GROUP BY 1
           ORDER BY occ DESC, term LIMIT 20)),
         stat AS (SELECT doc_id, count(*) AS n_tokens,
           sum(CASE WHEN term IN (SELECT term FROM voc) THEN 0 ELSE 1 END)
             AS n_oov
           FROM toks GROUP BY 1)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CASE WHEN n_tokens > 0 THEN
             floor(n_oov * 1.0 / n_tokens * 10000 + 0.5) / 10000.0
           END AS oov_rate
         FROM stat""",
    // stub-leg mirror: n = bytes % 30 + 1 frames, k = min(4, n) samples
    // at floor(j*n/k); handle = md5(md5(payload) || '#' || index) — the
    // payload digest computed once (DuckDB's md5 hashes the VARCHAR's
    // utf-8 bytes = exactly the Spark side's payload bytes).
    "x57_frame_sample" ->
      """WITH f AS (SELECT doc_id, md5(text) AS phex,
           octet_length(encode(text)) % 30 + 1 AS n FROM documents),
         kk AS (SELECT doc_id, phex, n, least(4, n) AS k FROM f)
         SELECT doc_id, CAST(n AS INTEGER) AS n_frames,
           CAST(g.j * n // k AS INTEGER) AS frame_idx,
           md5(phex || '#' || CAST(g.j * n // k AS VARCHAR))
             AS frame_ref
         FROM kk, unnest(generate_series(0, k - 1)) AS g(j)""",
    // x31 chunk stage -> 60-bit md5 bucket route -> per-bucket
    // recursive next-fit scan (seq/rem state machine = Packer with
    // maxOpen 1, transition for transition).
    "x61_pack_chunks" ->
      """WITH RECURSIVE
         toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
           AS t FROM documents),
         counted AS (SELECT doc_id, t,
           CASE WHEN len(t) <= 64 THEN 1
                ELSE CAST(ceil((len(t) - 64) * 1.0 / 48) AS BIGINT) + 1
           END AS n_chunks FROM toks),
         ch AS (SELECT doc_id, g.i AS chunk_idx,
             CAST(least(64, len(t) - g.i * 48) AS INTEGER) AS n
           FROM counted, unnest(generate_series(0, n_chunks - 1)) AS g(i)),
         hk AS (SELECT doc_id, chunk_idx, n,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
             CAST(chunk_idx AS VARCHAR)), 1, 15))::BIGINT AS h FROM ch),
         ord AS (SELECT doc_id, chunk_idx, n, h >> 57 AS bucket,
           row_number() OVER (PARTITION BY (h >> 57)
             ORDER BY h, doc_id, chunk_idx) AS pos FROM hk),
         sim AS (
           SELECT bucket, pos, doc_id, chunk_idx, n, CAST(0 AS BIGINT) AS seq,
             CAST(greatest(0, 200 - n) AS BIGINT) AS rem
           FROM ord WHERE pos = 1
           UNION ALL
           SELECT o.bucket, o.pos, o.doc_id, o.chunk_idx, o.n,
             CASE WHEN o.n <= s.rem THEN s.seq ELSE s.seq + 1 END,
             CASE WHEN o.n <= s.rem THEN s.rem - o.n
                  ELSE CAST(greatest(0, 200 - o.n) AS BIGINT) END
           FROM sim s JOIN ord o ON o.bucket = s.bucket AND o.pos = s.pos + 1)
         SELECT CAST(bucket AS VARCHAR) || '-' || CAST(seq AS VARCHAR)
             AS pack_id,
           doc_id, chunk_idx, n AS n_tokens,
           CAST(sum(n) OVER (PARTITION BY bucket, seq) AS INTEGER)
             AS pack_tokens
         FROM sim""",
    // identical augmentation, then the same sequential redact chain:
    // each category counted on its input text, then replaced ('g' =
    // global, matching Spark's regexp_replace default).
    "x60_pii_redaction" ->
      """WITH aug AS (SELECT doc_id,
           text || ' reach doc' || CAST(doc_id AS VARCHAR)
             || '@mail.example.com'
             || CASE WHEN doc_id % 2 = 0 THEN ' tel 555-123-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
             || CASE WHEN doc_id % 3 <> 0 THEN ' from 10.'
                  || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                  || CAST(doc_id % 250 AS VARCHAR)
                ELSE '' END AS t0
           FROM documents),
         e AS (SELECT doc_id,
           CAST(len(regexp_extract_all(t0,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_pii_emails,
           regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t1 FROM aug),
         p AS (SELECT doc_id, n_pii_emails,
           CAST(len(regexp_extract_all(t1,
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT)
             AS n_pii_phones,
           regexp_replace(t1, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}',
             '<PHONE>', 'g') AS t2 FROM e),
         i AS (SELECT doc_id, n_pii_emails, n_pii_phones,
           CAST(len(regexp_extract_all(t2,
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT)
             AS n_pii_ips,
           regexp_replace(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
             '<IP>', 'g') AS t3 FROM p)
         SELECT doc_id, t3 AS clean_text, n_pii_emails, n_pii_phones,
           n_pii_ips FROM i""",
    // samples are the ascii md5 chain, so the content hash is md5 of
    // that string; both encodings of a document carry the same samples.
    "x67_audio_dedup" ->
      """WITH s AS (SELECT doc_id,
           md5(text || ':0') || md5(text || ':1') AS smp FROM documents),
         u AS (SELECT doc_id, smp FROM s
           UNION ALL SELECT doc_id + 1000000, smp FROM s),
         f AS (SELECT doc_id, md5(smp) AS audio_hash FROM u)
         SELECT audio_hash, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM f GROUP BY 1""",
    // header fields re-derived from driver columns; duration is integer
    // floor division in both engines.
    "x66_audio_stats" ->
      """SELECT doc_id,
           CAST(1 + doc_id % 2 AS INTEGER) AS channels,
           CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
           CAST(CASE WHEN doc_id % 4 < 2 THEN 8 ELSE 16 END AS INTEGER)
             AS bits_per_sample,
           CAST(n_chars + 50 AS BIGINT) AS n_samples,
           CAST((n_chars + 50) * 1000 // (8000 * (1 + doc_id % 3)) AS BIGINT)
             AS duration_ms
         FROM documents""",
    // x59's fp derivation + hamming pairs + the x32-style recursive
    // walk; survivors = ids not dropped as non-representatives.
    "x63_image_dedup_apply" ->
      """WITH RECURSIVE hx AS (SELECT doc_id,
           md5(text || ':0') || md5(text || ':1') || md5(text || ':2') AS h
           FROM documents),
         g0 AS (SELECT doc_id,
           list_transform(range(70), i ->
             17 * (strpos('0123456789abcdef',
               substr(h, CAST(i + 1 AS INTEGER), 1)) - 1)) AS g
           FROM hx),
         gs AS (SELECT doc_id, g FROM g0
           UNION ALL
           SELECT doc_id + 1000000, list_concat([255 - g[1]], g[2:70])
           FROM g0),
         fp AS (SELECT doc_id,
           CAST(list_sum(list_transform(range(60), b ->
             CASE WHEN g[CAST(b // 6 * 7 + b % 6 + 2 AS INTEGER)]
                     > g[CAST(b // 6 * 7 + b % 6 + 1 AS INTEGER)]
                  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                  ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
           FROM gs),
         prs AS (SELECT a.doc_id AS d1, b.doc_id AS d2
           FROM fp a JOIN fp b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.fp, b.fp)) <= 3),
         edges AS (SELECT d1 AS a, d2 AS b FROM prs
           UNION SELECT d2, d1 FROM prs),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1)
         SELECT f.doc_id, f.fp FROM fp f
         WHERE f.doc_id NOT IN (SELECT node FROM comp WHERE node <> rep)""",
    // same pixel derivation; exact-integer sum/sumsq -> one IEEE sqrt
    // and divide -> the 1e-4 grid (the Scala side's identical law).
    "x64_image_stats" ->
      """WITH hx AS (SELECT doc_id,
           md5(text || ':0') || md5(text || ':1') || md5(text || ':2') AS h
           FROM documents),
         g0 AS (SELECT doc_id,
           list_transform(range(70), i ->
             17 * (strpos('0123456789abcdef',
               substr(h, CAST(i + 1 AS INTEGER), 1)) - 1)) AS g
           FROM hx),
         gs AS (SELECT doc_id, g FROM g0
           UNION ALL
           SELECT doc_id + 1000000, list_concat([255 - g[1]], g[2:70])
           FROM g0),
         st AS (SELECT doc_id,
           CAST(list_sum(g) AS BIGINT) AS s,
           CAST(list_sum(list_transform(g, x -> x * x)) AS BIGINT) AS sq
           FROM gs)
         SELECT doc_id, CAST(7 AS INTEGER) AS width,
           CAST(10 AS INTEGER) AS height,
           floor(s * 1.0 / 70 * 10000 + 0.5) / 10000.0 AS brightness,
           floor(sqrt(CAST(70 * sq - s * s AS DOUBLE)) / 70 * 10000 + 0.5)
             / 10000.0 AS contrast,
           CAST(0.7 AS DOUBLE) AS aspect
         FROM st""",
    // pixels re-derived from the text (17 * hexdigit of the 3-block md5
    // chain — no PPM parse oracle-side), dHash = 6x10 horizontal
    // gradient signs, pairs = all-pairs hamming <= 3 (oracle scale).
    "x59_image_neardup" ->
      """WITH hx AS (SELECT doc_id,
           md5(text || ':0') || md5(text || ':1') || md5(text || ':2') AS h
           FROM documents),
         g0 AS (SELECT doc_id,
           list_transform(range(70), i ->
             17 * (strpos('0123456789abcdef',
               substr(h, CAST(i + 1 AS INTEGER), 1)) - 1)) AS g
           FROM hx),
         gs AS (SELECT doc_id, g FROM g0
           UNION ALL
           SELECT doc_id + 1000000, list_concat([255 - g[1]], g[2:70])
           FROM g0),
         fp AS (SELECT doc_id,
           CAST(list_sum(list_transform(range(60), b ->
             CASE WHEN g[CAST(b // 6 * 7 + b % 6 + 2 AS INTEGER)]
                     > g[CAST(b // 6 * 7 + b % 6 + 1 AS INTEGER)]
                  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                  ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
           FROM gs)
         SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 3""",
    "x58_resize_plan" ->
      """WITH f AS (SELECT doc_id,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
           FROM documents)
         SELECT doc_id, width, height,
           CASE WHEN width <= 320 AND height <= 240 THEN CAST(width AS BIGINT)
                WHEN width * 240 >= height * 320 THEN 320
                ELSE greatest(1,
                  CAST(floor(width * 240.0 / height) AS BIGINT)) END AS out_w,
           CASE WHEN width <= 320 AND height <= 240 THEN CAST(height AS BIGINT)
                WHEN width * 240 >= height * 320 THEN greatest(1,
                  CAST(floor(height * 320.0 / width) AS BIGINT))
                ELSE 240 END AS out_h
         FROM f""",
    // adjacent (not distinct) token pairs; 1-token docs contribute none;
    // ties at the top-50 boundary cut by pair text on both sides.
    "x68_bigram_stats" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         p AS (SELECT doc_id, t[g.i] || ' ' || t[g.i + 1] AS pair
           FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i))
         SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         FROM p GROUP BY 1
         ORDER BY n_occurrences DESC, pair LIMIT 50""",
    // surrogate weight = 60-bit md5 prefix % 21 - 10 (the x61 hex-parse
    // idiom); score = mean weight on the 1e-4 grid, identical IEEE
    // expression both sides.
    "x69_classifier_gate" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         s AS (SELECT doc_id, len(t) AS n_tokens,
           list_sum(list_transform(t, x ->
             ('0x' || substring(md5(x), 1, 15))::BIGINT % 21 - 10)) AS wsum
           FROM toks)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           floor(CAST(wsum AS DOUBLE) / n_tokens * 10000 + 0.5) / 10000.0
             AS score,
           CAST(CASE WHEN
             floor(CAST(wsum AS DOUBLE) / n_tokens * 10000 + 0.5) / 10000.0
               >= 0.0 THEN 1 ELSE 0 END AS INTEGER) AS kept
         FROM s""",
    // x10's assigned/probes skeleton over the labeled subset, rank <= 5
    // on raw cosine (ties by neighbor id), then majority vote with ties
    // to the smallest label.
    "x70_knn_label" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id < 16),
         lab AS (SELECT vec_id AS vid, embedding AS v, label
           FROM embeddings WHERE vec_id % 5 <> 0),
         q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id % 5 = 0),
         assigned AS (SELECT vid, v, label, centroid_id FROM (
           SELECT vid, v, label, centroid_id, row_number() OVER
             (PARTITION BY vid
              ORDER BY ${duckCos("v", "centv")} DESC, centroid_id) AS arn
           FROM lab, cent) WHERE arn = 1),
         probes AS (SELECT query_id, qv, centroid_id FROM (
           SELECT query_id, qv, centroid_id, row_number() OVER
             (PARTITION BY query_id
              ORDER BY ${duckCos("qv", "centv")} DESC, centroid_id) AS prn
           FROM q, cent) WHERE prn <= 2),
         nn AS (SELECT query_id, label FROM (
           SELECT query_id, label, row_number() OVER
             (PARTITION BY query_id
              ORDER BY ${duckCos("qv", "v")} DESC, vid) AS rnk
           FROM assigned JOIN probes USING (centroid_id)
           WHERE query_id <> vid) WHERE rnk <= 5),
         votes AS (SELECT query_id, label, count(*) AS votes
           FROM nn GROUP BY 1, 2),
         tot AS (SELECT query_id, sum(votes) AS n_neighbors
           FROM votes GROUP BY 1)
         SELECT query_id, CAST(predicted_label AS BIGINT) AS predicted_label,
           CAST(votes AS BIGINT) AS votes,
           CAST(n_neighbors AS BIGINT) AS n_neighbors
         FROM (SELECT v.query_id, v.label AS predicted_label, v.votes,
             t.n_neighbors, row_number() OVER (PARTITION BY v.query_id
               ORDER BY v.votes DESC, v.label) AS wrn
           FROM votes v JOIN tot t USING (query_id)) WHERE wrn = 1""",
    // naive global window is fine oracle-side; the Spark side's bucket
    // prefix reproduces exactly the same rank because fixed-length
    // lowercase hex orders lexicographically as it does numerically.
    "x71_shard_manifest" ->
      """WITH k AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key,
           len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
           FROM documents),
         r AS (SELECT doc_id, key, n_tokens,
           row_number() OVER (ORDER BY key, doc_id) - 1 AS rnk FROM k)
         SELECT CAST(rnk // 64 AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           min(key) AS first_key, max(key) AS last_key
         FROM r GROUP BY 1""",
    // same fold order as the Spark aggregate (list order), same explicit
    // half-up grid, squared via y*y (pow() could round differently).
    "x72_quantize_embeddings" ->
      """WITH s AS (SELECT vec_id, embedding, len(embedding) AS dim,
           list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS sc
           FROM embeddings),
         d AS (SELECT vec_id, sc, dim,
           list_sum(list_transform(
             list_transform(embedding, x -> CAST(x AS DOUBLE) -
               floor(CAST(x AS DOUBLE) / sc + 0.5) * sc),
             y -> y * y)) AS sq,
           list_max(list_transform(embedding,
             x -> abs(floor(CAST(x AS DOUBLE) / sc + 0.5)))) AS qm
           FROM s)
         SELECT vec_id, floor(sc * 1000000 + 0.5) / 1000000.0 AS scale,
           CASE WHEN sc > 0 THEN
             floor(sqrt(sq / dim) * 1000000 + 0.5) / 1000000.0
             ELSE 0.0 END AS rmse,
           CAST(CASE WHEN sc > 0 THEN qm ELSE 0 END AS BIGINT) AS q_max
         FROM d""",
    // batch reps by min id per digest, then the cross anti-join on the
    // existing half's digest set. NOT EXISTS (not NOT IN): a NULL text
    // anywhere in the existing half must not three-value the whole
    // predicate — equality against a NULL digest simply never matches,
    // which is exactly the Spark anti-join's null-key behavior.
    "x74_incremental_dedup" ->
      """WITH third AS (SELECT doc_id, text FROM documents
           WHERE doc_id % 3 = 0),
         batch AS (SELECT doc_id + 1000000 AS doc_id, text FROM third
           UNION ALL SELECT doc_id + 2000000, text FROM third),
         reps AS (SELECT min(doc_id) AS doc_id FROM batch
           GROUP BY sha256(lower(trim(text))))
         SELECT b.doc_id, b.text FROM batch b JOIN reps USING (doc_id)
         WHERE NOT EXISTS (
           SELECT 1 FROM documents e WHERE e.doc_id % 2 = 0
           AND sha256(lower(trim(e.text))) = sha256(lower(trim(b.text))))""",
    // exact cross-corpus 3-shingle Jaccard pairs at >= 0.8; survivors =
    // batch docs with no qualifying existing partner (shingle-less docs
    // are never candidates on either side, matching the kernel).
    "x75_incremental_neardup" ->
      """WITH tb AS (SELECT doc_id + 1000000 AS doc_id, text
           FROM documents WHERE doc_id % 2 = 1),
         te AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
         tkb AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM tb),
         tke AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM te),
         shb AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
           FROM tkb, unnest(generate_series(1, len(t) - 2)) AS g(i)),
         she AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
           FROM tke, unnest(generate_series(1, len(t) - 2)) AS g(i)),
         szb AS (SELECT doc_id, count(*) AS n FROM shb GROUP BY 1),
         sze AS (SELECT doc_id, count(*) AS n FROM she GROUP BY 1),
         inter AS (SELECT b.doc_id AS new_id, e.doc_id AS old_id,
             count(*) AS c
           FROM shb b JOIN she e ON b.s = e.s GROUP BY 1, 2),
         drops AS (SELECT DISTINCT new_id FROM inter
           JOIN szb x ON new_id = x.doc_id
           JOIN sze y ON old_id = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.8)
         SELECT doc_id, text FROM tb
         WHERE doc_id NOT IN (SELECT new_id FROM drops)""",
    // json functions guarded through try_cast(... AS JSON) so malformed
    // payloads classify instead of erroring; verdict precedence mirrors
    // the operator (not_json > missing > wrong type > ok).
    "x76_quarantine" ->
      """WITH raw AS (SELECT event_id,
           CASE WHEN event_id % 7 = 1 THEN 'oops{'
                WHEN event_id % 7 = 2 THEN '{"other": 1}'
                WHEN event_id % 7 = 3 THEN '{"k": "bad"}'
                ELSE props END AS props
           FROM events)
         SELECT event_id,
           CASE WHEN try_cast(props AS JSON) IS NULL THEN 'not_json'
                WHEN json_extract_string(try_cast(props AS JSON), '$.k')
                  IS NULL THEN 'missing_required:k'
                WHEN try_cast(json_extract_string(try_cast(props AS JSON),
                  '$.k') AS BIGINT) IS NULL THEN 'wrong_type:k'
                ELSE 'ok' END AS verdict,
           try_cast(json_extract_string(try_cast(props AS JSON), '$.k')
             AS BIGINT) AS k_value
         FROM raw""",
    // the x26 split rule + a per-split row_number window; the Spark
    // side's grouped bucket prefix reproduces the same per-split rank.
    "x77_split_shards" ->
      """WITH k AS (SELECT doc_id,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '9'
                  THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'val'
                ELSE 'test' END AS split,
           md5(CAST(doc_id AS VARCHAR)) AS key,
           len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
           FROM documents),
         r AS (SELECT split, doc_id, key, n_tokens,
           row_number() OVER (PARTITION BY split ORDER BY key, doc_id) - 1
             AS rnk FROM k)
         SELECT split, CAST(rnk // 32 AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           min(key) AS first_key, max(key) AS last_key
         FROM r GROUP BY 1, 2""",
    // keep position i unless it equals its predecessor; string_agg
    // skips the NULLed-out drops and reassembles in position order.
    "x78_collapse_runs" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         pos AS (SELECT doc_id, g.i AS i, t[g.i] AS tok,
           CASE WHEN g.i = 1 OR t[g.i] <> t[g.i - 1] THEN 1 ELSE 0 END
             AS keep
           FROM toks, unnest(generate_series(1, len(t))) AS g(i))
         SELECT doc_id,
           coalesce(string_agg(CASE WHEN keep = 1 THEN tok END, ' '
             ORDER BY i), '') AS clean_text,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(1 - keep) AS BIGINT) AS n_removed
         FROM pos GROUP BY doc_id""",
    // the x69 weight rule routed through an explicit vocab join — the
    // left join + coalesce(default) mirrors scoreWithTable verbatim.
    "x79_classifier_join" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
         w AS (SELECT term,
           ('0x' || substring(md5(term), 1, 15))::BIGINT % 21 - 10 AS wt
           FROM (SELECT DISTINCT term FROM tok)),
         j AS (SELECT doc_id, coalesce(wt, 0) AS wt
           FROM tok LEFT JOIN w USING (term))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           floor(CAST(sum(wt) AS DOUBLE) / count(*) * 10000 + 0.5)
             / 10000.0 AS score
         FROM j GROUP BY 1"""
  )

  /** x82's oracle: the SAME `rounds` BPE iterations, unrolled as
    * chained CTEs (DuckDB has no iterative argmax loop). Each round is
    * pair-count → (count DESC, lhs, rhs) argmax → replace-apply over
    * the separator-wrapped vocabulary — `replace` in both engines
    * scans left-to-right non-overlapping, which IS the BPE merge rule,
    * and per-symbol U+001F wrapping stops adjacent matches from
    * sharing characters. */
  /** The shared WITH-chain of the BPE oracles: vocab0 (wrapped,
    * frequency-weighted) plus `rounds` unrolled pair-count / argmax /
    * replace-apply blocks. */
  private def bpeCtes(rounds: Int): String = {
    val blocks = (0 until rounds).map { k =>
      s"""pairs$k AS (
         |  SELECT s[i] AS lhs, s[i+1] AS rhs,
         |    CAST(sum(freq) AS BIGINT) AS pair_count
         |  FROM (SELECT freq,
         |          string_split(trim(wrapped, chr(31)),
         |                       chr(31) || chr(31)) AS s
         |        FROM vocab$k) v,
         |       unnest(generate_series(1, len(s) - 1)) AS g(i)
         |  GROUP BY 1, 2),
         |win$k AS (SELECT lhs, rhs, pair_count FROM pairs$k
         |  ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
         |vocab${k + 1} AS (SELECT freq,
         |  replace(wrapped, chr(31)||lhs||chr(31)||chr(31)||rhs||chr(31),
         |          chr(31)||lhs||rhs||chr(31)) AS wrapped
         |  FROM vocab$k, win$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH vocab0 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS freq,
       |    regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g')
       |      AS wrapped
       |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
       |          AS word FROM documents)
       |  WHERE len(word) > 0 GROUP BY word),
       |$blocks""".stripMargin
  }

  /** x90's oracle: the Lloyd rounds unrolled as chained CTEs. Mirrors
    * Similarity.kmeansCodebook bit-for-bit: vectors snap to the 1e-6
    * integer grid (exact in DOUBLE and in the kernel's FLOAT), each
    * round's assignment is argmax cosine (double math, dims order —
    * duckCos's shape) with ties to the smallest cluster id, and each
    * new centroid component is the exact integer SUM over members
    * divided by the count in IEEE double, rounded through REAL (the
    * kernel's float storage). */
  private[queries] def kmeansCos(q: String, c: String): String =
    s"""(list_sum(list_transform(generate_series(1, 64),
          i -> CAST($q[i] AS DOUBLE) * $c[i]))
        / (sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> CAST($q[i] AS DOUBLE) * CAST($q[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, 64),
             i -> $c[i] * $c[i])))))"""

  /** The Lloyd-round CTE chain shared by x90's and x94's oracles:
    * defines qv (the 1e-6 grid), cent0 (seeds = the k smallest
    * vec_ids) and assign1/cent1 … assign{rounds}/cent{rounds}. */
  private def kmeansCtes(k: Int, rounds: Int): String =
    kmeansCtesOver(k, rounds, "embeddings")

  /** [[kmeansCtes]] over a RESTRICTED `(vec_id, embedding)` source CTE
    * (x226's semantic tier trains on the lexically-deduped survivor
    * set): `qv` grids the restricted source, while `cent0`'s seeds
    * stay the FULL table's k smallest ids — constant init vectors, so
    * a seed that the earlier stages dropped still initializes its
    * cluster, mirroring [[graft.operators.CorpusPipeline.prepareV2]]'s
    * `init = embeddings.filter(id < k)`. */
  private[queries] def kmeansCtesOver(k: Int, rounds: Int,
                                      src: String): String = {
    def assign(r: Int): String =
      s"""assign$r AS (SELECT vec_id, qv, cid FROM (
           SELECT q.vec_id, q.qv, c.cid, row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY ${kmeansCos("q.qv", "c.cv")} DESC, c.cid) AS rn
           FROM qv q CROSS JOIN cent${r - 1} c) WHERE rn = 1)"""
    def cent(r: Int): String =
      s"""cent$r AS (SELECT cid, list(cvd ORDER BY d) AS cv FROM (
           SELECT cid, d,
             CAST(CAST(SUM(q) / COUNT(*) AS REAL) AS DOUBLE) AS cvd
           FROM (SELECT cid, unnest(qv) AS q,
                   generate_subscripts(qv, 1) AS d FROM assign$r)
           GROUP BY cid, d) GROUP BY cid)"""
    val chain = (1 to rounds).map(r => s"${assign(r)},\n${cent(r)}")
      .mkString(",\n")
    s"""qvfull AS (SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
           AS qv
         FROM embeddings),
       qv AS (SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
           AS qv
         FROM $src),
       cent0 AS (SELECT vec_id AS cid,
           list_transform(qv, q -> CAST(q AS DOUBLE)) AS cv
         FROM qvfull WHERE vec_id < $k),
       $chain"""
  }

  /** DuckDB mirror of `Similarity.pqDist`: per-dimension floor-rounded
    * integer L2 between a grid-long slice and a down-scaled centroid
    * list — exact BIGINTs, so list_sum is order-free. */
  private def pqDistSql(sl: String, cv: String, subDim: Int): String =
    s"""list_sum(list_transform(generate_series(1, $subDim), i ->
         CAST(floor(((CAST($sl[i] AS DOUBLE)/1000000.0) - $cv[i])
           * ((CAST($sl[i] AS DOUBLE)/1000000.0) - $cv[i])
           * 1000000 + 0.5) AS BIGINT)))"""

  /** The PQ training CTE chain (mirror of `Similarity.pqFit`): grid
    * vectors, m slices, per-subspace init (the k SMALLEST training
    * ids — pqFit's seeding contract) and `rounds` Lloyd rounds —
    * assignment by integer-exact L2 argmin (ties → smallest cid),
    * centroid update (CAST(SUM AS DOUBLE)/COUNT)/1e6, empty clusters
    * dropped by reconstruction from the round's assignments.
    * `trainCond` mirrors pqFit's trainPct md5-bucket cut: seeding and
    * every Lloyd pass see only rows satisfying it; the encode CTEs
    * (over sub$j) always see everything. */
  private def pqCtes(m: Int, k: Int, rounds: Int, subDim: Int,
                     trainCond: String = "TRUE"): String = {
    val qv = s"""pqv AS (SELECT vec_id, list_transform(embedding,
        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
      FROM embeddings)"""
    val subs = (0 until m).map { j =>
      s"""sub$j AS (SELECT vec_id,
           list_slice(qv, ${j * subDim + 1}, ${(j + 1) * subDim}) AS sl
         FROM pqv),
         tsub$j AS (SELECT * FROM sub$j WHERE $trainCond)"""
    }
    val chains = (0 until m).map { j =>
      val cent0 = s"""c${j}_0 AS (SELECT vec_id AS cid,
          list_transform(sl, q -> CAST(q AS DOUBLE)/1000000.0) AS cv
        FROM (SELECT * FROM tsub$j ORDER BY vec_id LIMIT $k))"""
      val rs = (1 to rounds).map { r =>
        s"""a${j}_$r AS (SELECT vec_id, sl, cid FROM (
             SELECT s.vec_id, s.sl, c.cid, row_number() OVER (
               PARTITION BY s.vec_id
               ORDER BY ${pqDistSql("s.sl", "c.cv", subDim)} ASC, c.cid)
               AS rn
             FROM tsub$j s CROSS JOIN c${j}_${r - 1} c) WHERE rn = 1),
           c${j}_$r AS (SELECT cid, list(cvd ORDER BY d) AS cv FROM (
             SELECT cid, d, (CAST(SUM(q) AS DOUBLE)/COUNT(*))/1000000.0
               AS cvd
             FROM (SELECT cid, unnest(sl) AS q,
                     generate_subscripts(sl, 1) AS d FROM a${j}_$r)
             GROUP BY cid, d) GROUP BY cid)"""
      }
      (cent0 +: rs).mkString(",\n")
    }
    (Seq(qv) ++ subs ++ chains).mkString(",\n")
  }

  /** Per-subspace encode CTEs e0..e{m-1} against the trained c{j}_R. */
  private def pqEncodeCtes(m: Int, rounds: Int, subDim: Int): String =
    (0 until m).map { j =>
      s"""e$j AS (SELECT vec_id, cid FROM (
           SELECT s.vec_id, c.cid, row_number() OVER (
             PARTITION BY s.vec_id
             ORDER BY ${pqDistSql("s.sl", "c.cv", subDim)} ASC, c.cid) AS rn
           FROM sub$j s CROSS JOIN c${j}_$rounds c) WHERE rn = 1)"""
    }.mkString(",\n")

  private def pqEncodeOracle(m: Int, k: Int, rounds: Int,
                             subDim: Int): String = {
    val cols = (0 until m).map(j => s"e$j.cid AS code_$j").mkString(", ")
    val joins = (1 until m).map(j => s"JOIN e$j USING (vec_id)").mkString(" ")
    s"""WITH ${pqCtes(m, k, rounds, subDim)},
       ${pqEncodeCtes(m, rounds, subDim)}
       SELECT e0.vec_id, $cols FROM e0 $joins"""
  }

  private def pqTopKOracle(m: Int, k: Int, rounds: Int, subDim: Int,
                           nQueries: Int, topK: Int): String = {
    val codeCols = (0 until m).map(j => s"e$j.cid AS k$j").mkString(", ")
    val joins = (1 until m).map(j => s"JOIN e$j USING (vec_id)").mkString(" ")
    val slJoins = (0 until m)
      .map(j => s"JOIN sub$j s$j ON s$j.vec_id = q.vec_id").mkString(" ")
    val cJoins = (0 until m)
      .map(j => s"JOIN c${j}_$rounds cc$j ON cc$j.cid = n.k$j").mkString(" ")
    val adc = (0 until m)
      .map(j => pqDistSql(s"s$j.sl", s"cc$j.cv", subDim)).mkString(" + ")
    s"""WITH ${pqCtes(m, k, rounds, subDim)},
       ${pqEncodeCtes(m, rounds, subDim)},
       codes AS (SELECT e0.vec_id AS neighbor_id, $codeCols FROM e0 $joins),
       scored AS (SELECT q.vec_id AS query_id, n.neighbor_id,
           $adc AS adc_int
         FROM codes n
         CROSS JOIN (SELECT vec_id FROM pqv WHERE vec_id < $nQueries) q
         $slJoins $cJoins
         WHERE q.vec_id <> n.neighbor_id)
       SELECT query_id, neighbor_id,
         CAST(row_number() OVER w AS BIGINT) AS rank,
         CAST(adc_int AS DOUBLE)/1000000.0 AS adc_dist
       FROM scored
       WINDOW w AS (PARTITION BY query_id ORDER BY adc_int, neighbor_id)
       QUALIFY row_number() OVER w <= $topK"""
  }

  /** x123's oracle: x10's cosine bucket/probe machinery + the PQ
    * training/encode chain; ADC ranking runs only inside probed
    * buckets. */
  private def ivfPqOracle(m: Int, k: Int, rounds: Int, subDim: Int,
                          numCentroids: Int, nprobe: Int, nQueries: Int,
                          topK: Int): String = {
    val codeCols = (0 until m).map(j => s"e$j.cid AS k$j").mkString(", ")
    val joins = (1 until m).map(j => s"JOIN e$j USING (vec_id)").mkString(" ")
    val slJoins = (0 until m)
      .map(j => s"JOIN sub$j s$j ON s$j.vec_id = p.query_id").mkString(" ")
    val cJoins = (0 until m)
      .map(j => s"JOIN c${j}_$rounds cc$j ON cc$j.cid = n.k$j").mkString(" ")
    val adc = (0 until m)
      .map(j => pqDistSql(s"s$j.sl", s"cc$j.cv", subDim)).mkString(" + ")
    s"""WITH ${pqCtes(m, k, rounds, subDim)},
       ${pqEncodeCtes(m, rounds, subDim)},
       cent AS (SELECT vec_id AS centroid_id, embedding AS centv
         FROM embeddings WHERE vec_id < $numCentroids),
       corp AS (SELECT vec_id AS neighbor_id, embedding AS cv
         FROM embeddings),
       assigned AS (SELECT neighbor_id, centroid_id FROM (
         SELECT neighbor_id, cv, centroid_id, row_number() OVER
           (PARTITION BY neighbor_id
            ORDER BY ${duckCos("cv", "centv")} DESC, centroid_id) AS arn
         FROM corp, cent) WHERE arn = 1),
       qx AS (SELECT vec_id AS query_id, embedding AS qv2
         FROM embeddings WHERE vec_id < $nQueries),
       probes AS (SELECT query_id, centroid_id FROM (
         SELECT query_id, centroid_id, row_number() OVER
           (PARTITION BY query_id
            ORDER BY ${duckCos("qv2", "centv")} DESC, centroid_id) AS prn
         FROM qx, cent) WHERE prn <= $nprobe),
       codes AS (SELECT e0.vec_id AS neighbor_id, $codeCols FROM e0 $joins),
       scored AS (SELECT p.query_id, a.neighbor_id, $adc AS adc_int
         FROM assigned a JOIN probes p USING (centroid_id)
         JOIN codes n ON n.neighbor_id = a.neighbor_id
         $slJoins $cJoins
         WHERE p.query_id <> a.neighbor_id)
       SELECT query_id, neighbor_id,
         CAST(row_number() OVER w AS BIGINT) AS rank,
         CAST(adc_int AS DOUBLE)/1000000.0 AS adc_dist
       FROM scored
       WINDOW w AS (PARTITION BY query_id ORDER BY adc_int, neighbor_id)
       QUALIFY row_number() OVER w <= $topK"""
  }

  private def pqDistortionOracle(m: Int, k: Int, rounds: Int, subDim: Int,
                                 trainCond: String = "TRUE"): String = {
    val ds = (0 until m).map { j =>
      s"""d$j AS (SELECT s.vec_id,
           min(${pqDistSql("s.sl", "c.cv", subDim)}) AS d
         FROM sub$j s CROSS JOIN c${j}_$rounds c GROUP BY s.vec_id)"""
    }.mkString(",\n")
    val rows = (0 until m).map { j =>
      s"""SELECT CAST($j AS INTEGER) AS sub,
           CAST(count(*) AS BIGINT) AS n_vectors,
           floor(((CAST(sum(d) AS DOUBLE)/count(*))/1000000.0)
             * 1000000 + 0.5)/1000000.0 AS avg_dist,
           CAST(max(d) AS DOUBLE)/1000000.0 AS max_dist
         FROM d$j"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${pqCtes(m, k, rounds, subDim, trainCond)},
       $ds
       $rows"""
  }

  /** x129's md5-bucket training cut (mirror of pqFit's trainPct — the
    * x37 SQL pairing of Spark's conv(substring(md5(id),1,4),16,10) mod
    * 100). */
  private def pqTrainCond(trainPct: Int): String =
    s"""('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 4))::BIGINT
        % 100 < $trainPct"""

  /** x130's oracle: the x121 ADC chain cut at `shortlist`, re-ranked
    * by exact cosine (x3's metric, rounding and tie-law). */
  private def pqRerankOracle(m: Int, rounds: Int, subDim: Int,
                             nQueries: Int, topK: Int,
                             shortlist: Int): String = {
    val codeCols = (0 until m).map(j => s"e$j.cid AS k$j").mkString(", ")
    val joins = (1 until m).map(j => s"JOIN e$j USING (vec_id)").mkString(" ")
    val slQ = (0 until m)
      .map(j => s"JOIN sub$j s$j ON s$j.vec_id = q.vec_id").mkString(" ")
    val cJoins = (0 until m)
      .map(j => s"JOIN c${j}_$rounds cc$j ON cc$j.cid = n.k$j").mkString(" ")
    val adc = (0 until m)
      .map(j => pqDistSql(s"s$j.sl", s"cc$j.cv", subDim)).mkString(" + ")
    s"""WITH ${pqCtes(m, 8, rounds, subDim)},
       ${pqEncodeCtes(m, rounds, subDim)},
       codes AS (SELECT e0.vec_id AS neighbor_id, $codeCols FROM e0 $joins),
       cand AS (SELECT query_id, neighbor_id FROM (
           SELECT q.vec_id AS query_id, n.neighbor_id, $adc AS adc_int
           FROM codes n
           CROSS JOIN (SELECT vec_id FROM pqv WHERE vec_id < $nQueries) q
           $slQ $cJoins
           WHERE q.vec_id <> n.neighbor_id)
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY adc_int, neighbor_id) <= $shortlist),
       rscored AS (SELECT c.query_id, c.neighbor_id,
           ${duckCos("q.embedding", "n.embedding")} AS sim
         FROM cand c
         JOIN embeddings q ON q.vec_id = c.query_id
         JOIN embeddings n ON n.vec_id = c.neighbor_id)
       SELECT query_id, neighbor_id,
         CAST(row_number() OVER w AS BIGINT) AS rank,
         floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
       FROM rscored
       WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
       QUALIFY row_number() OVER w <= $topK"""
  }

  /** The shared ADC + re-rank leg chain under the x131 and x141
    * oracles: one training/encode/ADC pipeline ending in `exk`
    * (exact top-`kPq`), `pqleg` and `rr` — both legs carrying their
    * `rank` (row_number under the leg's own order, the column the
    * ranking metrics read and the recall aggs ignore). */
  private def rerankLegsCtes(m: Int, rounds: Int, subDim: Int,
                             nQueries: Int, kPq: Int,
                             shortlist: Int): String = {
    val codeCols = (0 until m).map(j => s"e$j.cid AS k$j").mkString(", ")
    val joins = (1 until m).map(j => s"JOIN e$j USING (vec_id)").mkString(" ")
    val slQ = (0 until m)
      .map(j => s"JOIN sub$j s$j ON s$j.vec_id = q.vec_id").mkString(" ")
    val cJoins = (0 until m)
      .map(j => s"JOIN c${j}_$rounds cc$j ON cc$j.cid = n.k$j").mkString(" ")
    val adc = (0 until m)
      .map(j => pqDistSql(s"s$j.sl", s"cc$j.cv", subDim)).mkString(" + ")
    s"""${pqCtes(m, 8, rounds, subDim)},
       ${pqEncodeCtes(m, rounds, subDim)},
       codes AS (SELECT e0.vec_id AS neighbor_id, $codeCols FROM e0 $joins),
       qx AS (SELECT vec_id AS query_id, embedding AS qv2
         FROM embeddings WHERE vec_id < $nQueries),
       corp AS (SELECT vec_id AS neighbor_id, embedding AS cv
         FROM embeddings),
       bf AS (SELECT q.query_id, c.neighbor_id,
           ${duckCos("q.qv2", "c.cv")} AS sim
         FROM qx q JOIN corp c ON q.query_id <> c.neighbor_id),
       exk AS (SELECT query_id, neighbor_id FROM bf
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY sim DESC, neighbor_id) <= $kPq),
       adcall AS (SELECT q.vec_id AS query_id, n.neighbor_id,
           $adc AS adc_int,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY $adc, n.neighbor_id) AS arn
         FROM codes n
         CROSS JOIN (SELECT vec_id FROM pqv WHERE vec_id < $nQueries) q
         $slQ $cJoins
         WHERE q.vec_id <> n.neighbor_id),
       pqleg AS (SELECT query_id, neighbor_id, arn AS rank FROM adcall
         WHERE arn <= $kPq),
       cand AS (SELECT query_id, neighbor_id FROM adcall
         WHERE arn <= $shortlist),
       rr AS (SELECT query_id, neighbor_id, rrn AS rank FROM (
           SELECT c.query_id, c.neighbor_id,
             row_number() OVER (PARTITION BY c.query_id
               ORDER BY ${duckCos("q.qv2", "n.cv")} DESC,
                 c.neighbor_id) AS rrn
           FROM cand c JOIN qx q USING (query_id)
           JOIN corp n USING (neighbor_id))
         WHERE rrn <= $kPq)"""
  }

  /** x131's oracle: the x128 shape restricted to the PQ tier — ADC-only
    * and re-ranked legs against the same exact top-k baseline, one
    * shared training/encode/ADC chain ([[rerankLegsCtes]]). */
  private def rerankRecallOracle(m: Int, rounds: Int, subDim: Int,
                                 nQueries: Int, kPq: Int,
                                 shortlist: Int): String = {
    def agg(method: String, approx: String): String =
      s"""SELECT '$method' AS method, CAST($kPq AS INTEGER) AS k,
           CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(a.neighbor_id) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS recall
         FROM exk e LEFT JOIN $approx a
           ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"""
    s"""WITH ${rerankLegsCtes(m, rounds, subDim, nQueries, kPq, shortlist)}
       ${agg("pq_adc", "pqleg")}
       UNION ALL
       ${agg("pq_rerank", "rr")}"""
  }

  /** x145's oracle: the x10 IVF chain cut at `candK` (rel = 1e-6-rounded
    * sim), all |q|·candK² pairwise candidate cosines, then the greedy
    * MMR loop UNROLLED into k chained CTE stages — each stage joins the
    * selected-so-far union, takes max pair-sim as the redundancy
    * penalty, scores `λ·rel − (1−λ)·penalty` (one IEEE expression,
    * 1e-6-rounded — λ and 1−λ serialized from the same Scala doubles
    * the Spark side uses), and picks the per-query argmax with the
    * (mmr desc, id) tie order — every step mirrored against
    * `Similarity.mmrTopKIndexed`. */
  private def mmrOracle(numCentroids: Int, nprobe: Int, nQueries: Int,
                        candK: Int, k: Int, lambda: Double): String = {
    val om = 1.0 - lambda
    def mmrExpr(relRef: String, mpRef: String): String =
      s"floor(($lambda * $relRef - $om * $mpRef) * 1000000 + 0.5) " +
        "/ 1000000.0"
    val iters = (2 to k).map { i =>
      s"""pen$i AS (SELECT p.query_id, p.aid AS neighbor_id,
             max(p.psim) AS mp
           FROM pairs p JOIN selu${i - 1} s
             ON p.query_id = s.query_id AND p.bid = s.neighbor_id
           GROUP BY 1, 2),
         sel$i AS (SELECT query_id, neighbor_id, rel, mmr,
             CAST($i AS INTEGER) AS pick FROM (
             SELECT c.query_id, c.neighbor_id, c.rel,
               ${mmrExpr("c.rel", "n.mp")} AS mmr,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY ${mmrExpr("c.rel", "n.mp")} DESC,
                   c.neighbor_id) AS rn
             FROM cand c JOIN pen$i n
               ON c.query_id = n.query_id
                 AND c.neighbor_id = n.neighbor_id
             WHERE NOT EXISTS (SELECT 1 FROM selu${i - 1} s
               WHERE s.query_id = c.query_id
                 AND s.neighbor_id = c.neighbor_id)) WHERE rn = 1),
         selu$i AS (SELECT * FROM selu${i - 1}
           UNION ALL SELECT * FROM sel$i)"""
    }.mkString(",\n", ",\n", "")
    s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id < $numCentroids),
         corp AS (SELECT vec_id AS neighbor_id, embedding AS cv
           FROM embeddings),
         assigned AS (SELECT neighbor_id, cv, centroid_id FROM (
           SELECT neighbor_id, cv, centroid_id, row_number() OVER
             (PARTITION BY neighbor_id
              ORDER BY ${duckCos("cv", "centv")} DESC, centroid_id) AS arn
           FROM corp, cent) WHERE arn = 1),
         q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < $nQueries),
         probes AS (SELECT query_id, qv, centroid_id FROM (
           SELECT query_id, qv, centroid_id, row_number() OVER
             (PARTITION BY query_id
              ORDER BY ${duckCos("qv", "centv")} DESC, centroid_id) AS prn
           FROM q, cent) WHERE prn <= $nprobe),
         scored AS (SELECT query_id, neighbor_id,
             ${duckCos("qv", "cv")} AS sim
           FROM assigned JOIN probes USING (centroid_id)
           WHERE query_id <> neighbor_id),
         cand AS (SELECT query_id, neighbor_id,
             floor(sim * 1000000 + 0.5) / 1000000.0 AS rel FROM (
             SELECT query_id, neighbor_id, sim, row_number() OVER
               (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS crn
             FROM scored) WHERE crn <= $candK),
         pairs AS (SELECT a.query_id, a.neighbor_id AS aid,
             b.neighbor_id AS bid,
             floor(${duckCos("va.embedding", "vb.embedding")}
               * 1000000 + 0.5) / 1000000.0 AS psim
           FROM cand a JOIN cand b ON a.query_id = b.query_id
             AND a.neighbor_id <> b.neighbor_id
           JOIN embeddings va ON va.vec_id = a.neighbor_id
           JOIN embeddings vb ON vb.vec_id = b.neighbor_id),
         sel1 AS (SELECT query_id, neighbor_id, rel, mmr,
             CAST(1 AS INTEGER) AS pick FROM (
             SELECT query_id, neighbor_id, rel,
               floor($lambda * rel * 1000000 + 0.5) / 1000000.0 AS mmr,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY floor($lambda * rel * 1000000 + 0.5)
                   / 1000000.0 DESC, neighbor_id) AS rn
             FROM cand) WHERE rn = 1),
         selu1 AS (SELECT * FROM sel1)$iters
       SELECT query_id, neighbor_id, CAST(pick AS BIGINT) AS pick,
         mmr AS mmr_score, rel AS similarity FROM selu$k"""
  }

  /** x141's oracle: the [[rerankLegsCtes]] legs under the ranking
    * metrics — per query, MRR's addend is 1/first-relevant-rank
    * (1e-6-rounded) and nDCG's is the DECIMAL sum of 1e-4-rounded
    * ln(2)/ln(rank+1) discounts over relevant positions divided by the
    * constant IDCG@k (the same rounded-term sum over ranks 1..k);
    * macro means round 1e-6 after one DECIMAL sum / count each —
    * every step mirrored against `Similarity.rankingReport`. */
  private def rankingQualityOracle(m: Int, rounds: Int, subDim: Int,
                                   nQueries: Int, kPq: Int,
                                   shortlist: Int): String = {
    def disc(rank: String): String =
      s"floor(ln(2.0) / ln(CAST($rank AS DOUBLE) + 1.0) " +
        s"* 10000 + 0.5) / 10000.0"
    def perq(method: String, approx: String): String =
      s"""perq_$method AS (SELECT e.query_id,
           min(a.rank) AS fh,
           CAST(SUM(CAST(CASE WHEN a.rank IS NOT NULL
               THEN ${disc("a.rank")} ELSE 0.0 END
             AS DECIMAL(38,6))) AS DOUBLE) AS dcg
         FROM exk e LEFT JOIN $approx a
           ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         GROUP BY 1)"""
    def agg(method: String): String =
      s"""SELECT '$method' AS method, CAST($kPq AS INTEGER) AS k,
           CAST(count(*) AS BIGINT) AS n_queries,
           floor(CAST(SUM(CAST(CASE WHEN fh IS NULL THEN 0.0
               ELSE floor(1.0 / CAST(fh AS DOUBLE) * 1000000 + 0.5)
                 / 1000000.0 END AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS mrr,
           floor(CAST(SUM(CAST(floor(dcg / iv * 1000000 + 0.5) / 1000000.0
               AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS ndcg
         FROM perq_$method CROSS JOIN idcg"""
    s"""WITH ${rerankLegsCtes(m, rounds, subDim, nQueries, kPq, shortlist)},
       idcg AS (SELECT CAST(SUM(CAST(${disc("r")}
             AS DECIMAL(38,6))) AS DOUBLE) AS iv
         FROM (SELECT range AS r FROM range(1, $kPq + 1))),
       ${perq("pq_adc", "pqleg")},
       ${perq("pq_rerank", "rr")}
       ${agg("pq_adc")}
       UNION ALL
       ${agg("pq_rerank")}"""
  }

  /** Shared CTE chain for the hybrid-retrieval oracles (x135/x136),
    * ending in `lex` (per-query BM25 top-`lexK` over x98's laws —
    * query terms = each query doc's DISTINCT tokens, query's own doc
    * excluded, idf/tf-norm rounded 1e-4, per-(query, doc) DECIMAL
    * sum) and `vec` (the x10 IVF chain at k=`vecK`, rank + 1e-6
    * rounded similarity). */
  /** The lexical half alone: per-query BM25 ending in `lex`
    * `(query_id, doc_id, lex_rank)` at rank ≤ `lexK` (plus the
    * intermediate `toks`/`lens`/`stats`/`qt` CTEs downstream chains
    * reuse). Shared by the hybrid oracles (x135-x138) and the PRF
    * oracles (x139-x140, whose round 1 is exactly this at
    * lexK = fbK). */
  private def lexLegCtes(nQueries: Int, lexK: Int): String =
    s"""toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t
           FROM documents),
         lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
           FROM lens),
         qt AS (SELECT DISTINCT doc_id AS query_id, u.term AS term
           FROM toks, unnest(t) AS u(term) WHERE doc_id < $nQueries),
         tf AS (SELECT doc_id, u.term AS term,
             CAST(count(*) AS DOUBLE) AS tf
           FROM toks, unnest(t) AS u(term)
           WHERE u.term IN (SELECT term FROM qt)
           GROUP BY 1, 2),
         dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
           FROM tf GROUP BY 1),
         contrib AS (SELECT query_id, doc_id,
             floor((floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                      * 10000 + 0.5) / 10000.0)
                 * (floor(tf * (1.2 + 1.0)
                      / (tf + 1.2 * ((1.0 - 0.75)
                          + 0.75 * dl / avgdl))
                      * 10000 + 0.5) / 10000.0)
               * 10000 + 0.5) / 10000.0 AS c
           FROM tf JOIN qt USING (term) JOIN lens USING (doc_id)
             JOIN dfq USING (term) CROSS JOIN stats
           WHERE doc_id <> query_id),
         lexs AS (SELECT query_id, doc_id,
             CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS score
           FROM contrib GROUP BY 1, 2),
         lex AS (SELECT query_id, doc_id,
             CAST(row_number() OVER wl AS BIGINT) AS lex_rank
           FROM lexs
           WINDOW wl AS (PARTITION BY query_id ORDER BY score DESC, doc_id)
           QUALIFY row_number() OVER wl <= $lexK)"""

  private def hybridLegsCtes(nQueries: Int, lexK: Int, vecK: Int,
                             nprobe: Int, numCentroids: Int): String =
    s"""${lexLegCtes(nQueries, lexK)},
         cent AS (SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id < $numCentroids),
         corp AS (SELECT vec_id AS neighbor_id, embedding AS cv
           FROM embeddings),
         assigned AS (SELECT neighbor_id, cv, centroid_id FROM (
           SELECT neighbor_id, cv, centroid_id, row_number() OVER
             (PARTITION BY neighbor_id
              ORDER BY ${duckCos("cv", "centv")} DESC, centroid_id) AS arn
           FROM corp, cent) WHERE arn = 1),
         q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < $nQueries),
         probes AS (SELECT query_id, qv, centroid_id FROM (
           SELECT query_id, qv, centroid_id, row_number() OVER
             (PARTITION BY query_id
              ORDER BY ${duckCos("qv", "centv")} DESC, centroid_id) AS prn
           FROM q, cent) WHERE prn <= $nprobe),
         scoredv AS (SELECT query_id, neighbor_id,
             ${duckCos("qv", "cv")} AS sim
           FROM assigned JOIN probes USING (centroid_id)
           WHERE query_id <> neighbor_id),
         vec AS (SELECT query_id, neighbor_id,
             CAST(row_number() OVER wv AS BIGINT) AS vec_rank,
             floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
           FROM scoredv
           WINDOW wv AS (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id)
           QUALIFY row_number() OVER wv <= $vecK)"""

  /** PRF chain for x139/x140: round 1 = [[lexLegCtes]] at
    * lexK = `fbK`; `dtAll` is the corpus doc-term grid the feedback
    * fetch and round-2 scoring both read; candidate terms are the
    * feedback docs' terms the query didn't already have, scored
    * idf·fb_tf (idf 1e-4-rounded, the product re-rounded 1e-4 — an
    * exact-integer multiply), ranked (score desc, term) per query.
    * Ends with `exp` `(query_id, term, fb_df, fb_tf, rank, score)`. */
  private def prfCtes(nQueries: Int, fbK: Int, expandM: Int): String =
    s"""${lexLegCtes(nQueries, fbK)},
         dtAll AS (SELECT doc_id, u.term AS term,
             CAST(count(*) AS BIGINT) AS tf
           FROM toks, unnest(t) AS u(term) GROUP BY 1, 2),
         fb AS (SELECT lex.query_id, dtAll.term,
             CAST(count(*) AS BIGINT) AS fb_df,
             CAST(sum(dtAll.tf) AS BIGINT) AS fb_tf
           FROM lex JOIN dtAll USING (doc_id)
           GROUP BY 1, 2),
         cand AS (SELECT * FROM fb f
           WHERE NOT EXISTS (SELECT 1 FROM qt
             WHERE qt.query_id = f.query_id AND qt.term = f.term)),
         cdf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM dtAll
           WHERE term IN (SELECT DISTINCT term FROM cand) GROUP BY 1),
         expScore AS (SELECT query_id, term, fb_df, fb_tf,
             floor((floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                      * 10000 + 0.5) / 10000.0) * fb_tf
               * 10000 + 0.5) / 10000.0 AS score
           FROM cand JOIN cdf USING (term) CROSS JOIN stats),
         exp AS (SELECT query_id, term, fb_df, fb_tf,
             CAST(row_number() OVER we AS BIGINT) AS rank, score
           FROM expScore
           WINDOW we AS (PARTITION BY query_id ORDER BY score DESC, term)
           QUALIFY row_number() OVER we <= $expandM)"""

  /** x128's oracle: exact brute-force top-k (two cuts), the x10 IVF
    * leg, the x121 ADC leg and the x123 IVF-PQ leg — all sharing one
    * training/assignment CTE chain — each joined back against its
    * exact cut; recall is micro-averaged (total hits / total exact
    * rows, one exact long/long division — no float law needed). */
  private def annRecallOracle(m: Int, rounds: Int, subDim: Int,
                              numCentroids: Int, nprobe: Int,
                              nQueries: Int, kIvf: Int, kPq: Int): String = {
    val codeCols = (0 until m).map(j => s"e$j.cid AS k$j").mkString(", ")
    val joins = (1 until m).map(j => s"JOIN e$j USING (vec_id)").mkString(" ")
    val slQ = (0 until m)
      .map(j => s"JOIN sub$j s$j ON s$j.vec_id = q.vec_id").mkString(" ")
    val slP = (0 until m)
      .map(j => s"JOIN sub$j s$j ON s$j.vec_id = p.query_id").mkString(" ")
    val cJoins = (0 until m)
      .map(j => s"JOIN c${j}_$rounds cc$j ON cc$j.cid = n.k$j").mkString(" ")
    val adc = (0 until m)
      .map(j => pqDistSql(s"s$j.sl", s"cc$j.cv", subDim)).mkString(" + ")
    def agg(method: String, k: Int, exact: String, approx: String): String =
      s"""SELECT '$method' AS method, CAST($k AS INTEGER) AS k,
           CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(a.neighbor_id) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS recall
         FROM $exact e LEFT JOIN $approx a
           ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"""
    s"""WITH ${pqCtes(m, 8, rounds, subDim)},
       ${pqEncodeCtes(m, rounds, subDim)},
       codes AS (SELECT e0.vec_id AS neighbor_id, $codeCols FROM e0 $joins),
       cent AS (SELECT vec_id AS centroid_id, embedding AS centv
         FROM embeddings WHERE vec_id < $numCentroids),
       corp AS (SELECT vec_id AS neighbor_id, embedding AS cv
         FROM embeddings),
       assigned AS (SELECT neighbor_id, cv, centroid_id FROM (
         SELECT neighbor_id, cv, centroid_id, row_number() OVER
           (PARTITION BY neighbor_id
            ORDER BY ${duckCos("cv", "centv")} DESC, centroid_id) AS arn
         FROM corp, cent) WHERE arn = 1),
       qx AS (SELECT vec_id AS query_id, embedding AS qv2
         FROM embeddings WHERE vec_id < $nQueries),
       probes AS (SELECT query_id, qv2, centroid_id FROM (
         SELECT query_id, qv2, centroid_id, row_number() OVER
           (PARTITION BY query_id
            ORDER BY ${duckCos("qv2", "centv")} DESC, centroid_id) AS prn
         FROM qx, cent) WHERE prn <= $nprobe),
       bf AS (SELECT q.query_id, c.neighbor_id,
           ${duckCos("q.qv2", "c.cv")} AS sim
         FROM qx q JOIN corp c ON q.query_id <> c.neighbor_id),
       ex$kIvf AS (SELECT query_id, neighbor_id FROM bf
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY sim DESC, neighbor_id) <= $kIvf),
       ex$kPq AS (SELECT query_id, neighbor_id FROM bf
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY sim DESC, neighbor_id) <= $kPq),
       ivfleg AS (SELECT query_id, neighbor_id FROM (
           SELECT p.query_id, a.neighbor_id,
             ${duckCos("p.qv2", "a.cv")} AS sim
           FROM assigned a JOIN probes p USING (centroid_id)
           WHERE p.query_id <> a.neighbor_id)
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY sim DESC, neighbor_id) <= $kIvf),
       pqleg AS (SELECT query_id, neighbor_id FROM (
           SELECT q.vec_id AS query_id, n.neighbor_id, $adc AS adc_int
           FROM codes n
           CROSS JOIN (SELECT vec_id FROM pqv WHERE vec_id < $nQueries) q
           $slQ $cJoins
           WHERE q.vec_id <> n.neighbor_id)
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY adc_int, neighbor_id) <= $kPq),
       ipleg AS (SELECT query_id, neighbor_id FROM (
           SELECT p.query_id, a.neighbor_id, $adc AS adc_int
           FROM assigned a JOIN probes p USING (centroid_id)
           JOIN codes n ON n.neighbor_id = a.neighbor_id
           $slP $cJoins
           WHERE p.query_id <> a.neighbor_id)
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY adc_int, neighbor_id) <= $kPq)
       ${agg("ivf", kIvf, s"ex$kIvf", "ivfleg")}
       UNION ALL
       ${agg("pq", kPq, s"ex$kPq", "pqleg")}
       UNION ALL
       ${agg("ivfpq", kPq, s"ex$kPq", "ipleg")}"""
  }

  private def kmeansOracleSql(k: Int, rounds: Int): String =
    s"""WITH ${kmeansCtes(k, rounds)}
       SELECT vec_id, cid AS cluster_id FROM (
         SELECT q.vec_id, c.cid, row_number() OVER (PARTITION BY q.vec_id
           ORDER BY ${kmeansCos("q.qv", "c.cv")} DESC, c.cid) AS rn
         FROM qv q CROSS JOIN cent$rounds c) WHERE rn = 1"""

  /** x94's oracle: the x90 CTE chain trains the codebook, then the
    * x10-shaped ANN query runs against cent{rounds} — corpus assigned
    * by argmax cosine to the TRAINED (grid-scale, float-rounded)
    * centroids, queries probe their top-`nprobe`, top-k inside probed
    * buckets. Cosine is scale-invariant, so grid-scale centroids
    * assign identically to down-scaled ones (the Scaladoc note on
    * `Similarity.kmeansCentroids`). */
  private def kmeansAnnOracleSql(k: Int, rounds: Int, nprobe: Int,
                                 topK: Int): String =
    s"""WITH ${kmeansCtes(k, rounds)},
       corp AS (SELECT vec_id AS neighbor_id, embedding AS cv2
         FROM embeddings),
       assignedx AS (SELECT neighbor_id, cv2, cid FROM (
         SELECT neighbor_id, cv2, c.cid, row_number() OVER (
           PARTITION BY neighbor_id
           ORDER BY ${kmeansCos("cv2", "c.cv")} DESC, c.cid) AS arn
         FROM corp, cent$rounds c) WHERE arn = 1),
       qx AS (SELECT vec_id AS query_id, embedding AS qv2
         FROM embeddings WHERE vec_id < 10),
       probes AS (SELECT query_id, qv2, cid FROM (
         SELECT query_id, qv2, c.cid, row_number() OVER (
           PARTITION BY query_id
           ORDER BY ${kmeansCos("qv2", "c.cv")} DESC, c.cid) AS prn
         FROM qx, cent$rounds c) WHERE prn <= $nprobe),
       scored AS (SELECT query_id, neighbor_id,
           ${duckCos("qv2", "cv2")} AS sim
         FROM probes JOIN assignedx USING (cid)
         WHERE query_id <> neighbor_id)
       SELECT query_id, neighbor_id,
         CAST(row_number() OVER w AS BIGINT) AS rank,
         floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
       FROM scored
       WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
       QUALIFY row_number() OVER w <= $topK"""

  private def bpeOracleSql(rounds: Int): String = {
    val finals = (0 until rounds).map(k =>
      s"SELECT CAST($k AS INT) AS merge_round, lhs, rhs, pair_count " +
        s"FROM win$k").mkString("\nUNION ALL ")
    s"${bpeCtes(rounds)}\n$finals"
  }

  /** x84's oracle: the x82 CTE chain trains the merges, then every
    * document's words are encoded through the same `rounds` nested
    * replace calls inside a list lambda (the win CTEs cross-join in as
    * 1-row scalars). */
  private def bpeEncodeOracleSql(rounds: Int): String = {
    val wins = (0 until rounds).map(k => s"win$k").mkString(", ")
    val chain = (0 until rounds).foldLeft(
      "regexp_replace(x, '(.)', chr(31) || '\\1' || chr(31), 'g')") {
      case (acc, k) =>
        s"""replace($acc,
           |  chr(31)||win$k.lhs||chr(31)||chr(31)||win$k.rhs||chr(31),
           |  chr(31)||win$k.lhs||win$k.rhs||chr(31))""".stripMargin
    }
    s"""${bpeCtes(rounds)},
       |w AS (SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |                x -> len(x) > 0) AS wl
       |  FROM documents)
       |SELECT doc_id, CAST(len(wl) AS BIGINT) AS n_words,
       |  CASE WHEN wl IS NULL THEN NULL ELSE CAST(coalesce(list_sum(
       |    list_transform(wl, x -> len(string_split(trim(
       |      $chain,
       |      chr(31)), chr(31)||chr(31))))), 0) AS BIGINT) END
       |    AS n_subtokens
       |FROM w, $wins""".stripMargin
  }

  // x80/x81 return the same rows as x75/x74 BY CONSTRUCTION — the
  // persisted-index path changes the plan (what gets scanned), never
  // the result — so they share those oracles verbatim.
  val oracleSql: Map[String, String] = extendedOracleSql +
    // indexed forms serve the SAME rows as their self-contained twins —
    // the x80/x81/x91 shared-oracle convention
    ("x107_bm25_indexed" -> extendedOracleSql("x98_bm25_topk")) +
    ("x110_novelty_indexed" -> extendedOracleSql("x104_novelty")) +
    ("x124_pq_indexed" -> extendedOracleSql("x121_pq_topk")) +
    ("x127_ivf_pq_indexed" -> extendedOracleSql("x123_ivf_pq_topk")) +
    ("x134_pq_rerank_indexed" -> extendedOracleSql("x130_pq_rerank_topk")) +
    // the graph family's served twins (x204-x209): the edge index
    // changes what gets SCANNED, never the rows
    ("x204_pagerank_indexed" -> extendedOracleSql("x188_pagerank")) +
    ("x205_communities_indexed" ->
      extendedOracleSql("x190_label_communities")) +
    ("x206_triangles_indexed" -> extendedOracleSql("x192_triangle_stats")) +
    ("x207_triples_indexed" -> extendedOracleSql("x196_brand_triples")) +
    ("x208_brand_recs_indexed" -> extendedOracleSql("x202_brand_recs")) +
    ("x209_affinity_indexed" -> extendedOracleSql("x164_brand_affinity")) +
    // x210: bucket counts are the build's literals; row counts are
    // recomputed from the corpus under the two-ingest split (the
    // append partials: per-parity pair/brand frames union, stats one
    // row per ingest); compacted is TRUE by construction post-compact
    ("x210_index_compaction" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         e0 AS (SELECT DISTINCT x.b AS s, y.b AS d FROM ob x
           JOIN ob y ON x.o = y.o AND x.b <> y.b WHERE x.o % 2 = 0),
         e1 AS (SELECT DISTINCT x.b AS s, y.b AS d FROM ob x
           JOIN ob y ON x.o = y.o AND x.b <> y.b WHERE x.o % 2 = 1)
         SELECT 'ob' AS index_name, CAST(8 AS BIGINT) AS n_buckets,
           (SELECT CAST(count(*) AS BIGINT) FROM ob) AS n_rows,
           TRUE AS compacted
         UNION ALL
         SELECT 'edges', CAST(8 AS BIGINT),
           (SELECT CAST(count(*) AS BIGINT) FROM e0)
             + (SELECT CAST(count(*) AS BIGINT) FROM e1), TRUE
         UNION ALL
         SELECT 'totals', CAST(0 AS BIGINT),
           (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM ob
              WHERE o % 2 = 0)
             + (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM ob
                WHERE o % 2 = 1), TRUE
         UNION ALL
         SELECT 'stats', CAST(0 AS BIGINT), CAST(2 AS BIGINT), TRUE""") +
    // x212: x188's three chained integer rounds, read back as the
    // round-2-vs-round-3 delta (exact integers end to end)
    ("x212_pagerank_convergence" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         e AS (SELECT a.b AS src, c2.b AS dst,
             CAST(count(*) AS BIGINT) AS w
           FROM ob a JOIN ob c2 ON a.ok = c2.ok AND a.b <> c2.b
           GROUP BY 1, 2),
         ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY 1),
         sh AS (SELECT e.src, e.dst,
             CAST((CAST(e.w AS HUGEINT) * CAST(1000000000 AS BIGINT))
               // ow.outw AS BIGINT) AS share
           FROM e JOIN ow ON e.src = ow.src),
         n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         c AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM n),
         bs AS (SELECT n.node,
             (15 * CAST(1000000000 AS BIGINT)) // (100 * nn) AS base,
             CAST(1000000000 AS BIGINT) // nn AS pr0
           FROM n, c),
         p1 AS (SELECT bs.node, bs.base
             + (85 * COALESCE(a.acc, 0)) // 100 AS pr
           FROM bs LEFT JOIN (SELECT sh.dst AS node,
               sum((p.pr0 * sh.share)
                 // CAST(1000000000 AS BIGINT)) AS acc
             FROM sh JOIN bs p ON sh.src = p.node GROUP BY 1) a
             ON bs.node = a.node),
         p2 AS (SELECT bs.node, bs.base
             + (85 * COALESCE(a.acc, 0)) // 100 AS pr
           FROM bs LEFT JOIN (SELECT sh.dst AS node,
               sum((p.pr * sh.share)
                 // CAST(1000000000 AS BIGINT)) AS acc
             FROM sh JOIN p1 p ON sh.src = p.node GROUP BY 1) a
             ON bs.node = a.node),
         p3 AS (SELECT bs.node, bs.base
             + (85 * COALESCE(a.acc, 0)) // 100 AS pr
           FROM bs LEFT JOIN (SELECT sh.dst AS node,
               sum((p.pr * sh.share)
                 // CAST(1000000000 AS BIGINT)) AS acc
             FROM sh JOIN p2 p ON sh.src = p.node GROUP BY 1) a
             ON bs.node = a.node)
         SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(abs(p3.pr - p2.pr)) AS BIGINT) AS l1_delta_units,
           CAST(max(abs(p3.pr - p2.pr)) AS BIGINT) AS max_delta_units
         FROM p3 JOIN p2 ON p3.node = p2.node""") +
    // x213: partial-row counts recomputed from the corpus under the
    // two-ingest split (one partial row per (key, parity) on the
    // additive tables; the basket table's keys are unique throughout);
    // after the deep merge every table reads exactly one row per key
    ("x213_index_partial_merge" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         e0 AS (SELECT DISTINCT x.b AS es, y.b AS ed FROM ob x
           JOIN ob y ON x.o = y.o AND x.b <> y.b WHERE x.o % 2 = 0),
         e1 AS (SELECT DISTINCT x.b AS es, y.b AS ed FROM ob x
           JOIN ob y ON x.o = y.o AND x.b <> y.b WHERE x.o % 2 = 1),
         eu AS (SELECT es, ed FROM e0 UNION SELECT es, ed FROM e1),
         legs AS (
           SELECT 'ob' AS index_name, 'before' AS phase,
             (SELECT count(*) FROM ob) AS n_rows,
             (SELECT count(*) FROM ob) AS n_keys
           UNION ALL
           SELECT 'ob', 'after', (SELECT count(*) FROM ob),
             (SELECT count(*) FROM ob)
           UNION ALL
           SELECT 'edges', 'before',
             (SELECT count(*) FROM e0) + (SELECT count(*) FROM e1),
             (SELECT count(*) FROM eu)
           UNION ALL
           SELECT 'edges', 'after', (SELECT count(*) FROM eu),
             (SELECT count(*) FROM eu)
           UNION ALL
           SELECT 'totals', 'before',
             (SELECT count(DISTINCT b) FROM ob WHERE o % 2 = 0)
               + (SELECT count(DISTINCT b) FROM ob WHERE o % 2 = 1),
             (SELECT count(DISTINCT b) FROM ob)
           UNION ALL
           SELECT 'totals', 'after', (SELECT count(DISTINCT b) FROM ob),
             (SELECT count(DISTINCT b) FROM ob))
         SELECT index_name, phase, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_keys AS BIGINT) AS n_keys,
           floor(n_rows / CAST(n_keys AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS rows_per_key
         FROM legs""") +
    // x214: post-delete set relations — the index keeps exactly the
    // snapshot ∩ even keys, so stale is ZERO by construction and
    // missing is the snapshot complement (set semantics on digests:
    // duplicate texts collapse on both sides)
    ("x214_index_delete" ->
      """WITH d3 AS (SELECT DISTINCT lower(trim(text)) AS k
           FROM documents WHERE doc_id % 3 = 0),
         dev AS (SELECT DISTINCT lower(trim(text)) AS k FROM documents
           WHERE doc_id % 2 = 0),
         dkept AS (SELECT k FROM dev WHERE k IN (SELECT k FROM d3)),
         e3 AS (SELECT DISTINCT vec_id AS k FROM embeddings
           WHERE vec_id % 3 = 0),
         e6 AS (SELECT DISTINCT vec_id AS k FROM embeddings
           WHERE vec_id % 6 = 0),
         legs AS (
           SELECT 'digest_idx_deleted' AS index_name,
             (SELECT count(*) FROM d3) AS n_corpus,
             (SELECT count(*) FROM dkept) AS n_indexed,
             (SELECT count(*) FROM d3
                WHERE k NOT IN (SELECT k FROM dkept)) AS n_missing,
             0 AS n_stale
           UNION ALL
           SELECT 'ann_assign_deleted',
             (SELECT count(*) FROM e3), (SELECT count(*) FROM e6),
             (SELECT count(*) FROM e3
                WHERE k NOT IN (SELECT k FROM e6)), 0)
         SELECT index_name, CAST(n_corpus AS BIGINT) AS n_corpus,
           CAST(n_indexed AS BIGINT) AS n_indexed,
           CAST(n_missing AS BIGINT) AS n_missing,
           CAST(n_stale AS BIGINT) AS n_stale,
           floor((n_corpus - n_missing) / CAST(n_corpus AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS coverage
         FROM legs""") +
    // x215: the bucketed fast path changes the COST, never the counts
    // — x211's oracle verbatim
    ("x215_freshness_bucketed" -> freshnessOracle) +
    // x211: set relations recomputed on the normalized text / id
    // parities the index builds used; distinct-key joins mirror the
    // full-outer counters
    ("x211_index_freshness" -> freshnessOracle) +
    // x216: the ledger is fully derivable from the corpus — one row
    // per applied batch (the replays inside the fixture build add
    // NOTHING, which is the exhibit). Batch ids recompute under the
    // Snapshots.batchIdFor law: distinct-key count + the order-free
    // 60-bit md5 fold (x7's '0x'||substring(md5(...)) idiom).
    ("x216_applied_batch_ledger" ->
      s"""WITH ok AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
         oddb AS (SELECT CAST(count(*) AS VARCHAR) || '-' ||
             CAST(CAST(COALESCE(sum(CAST(('0x' ||
                 substring(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT
               AS HUGEINT)), 0) % $BatchFold AS BIGINT) AS VARCHAR)
             AS bid
           FROM ok WHERE k % 2 = 1),
         delb AS (SELECT CAST(count(*) AS VARCHAR) || '-' ||
             CAST(CAST(COALESCE(sum(CAST(('0x' ||
                 substring(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT
               AS HUGEINT)), 0) % $BatchFold AS BIGINT) AS VARCHAR)
             AS bid
           FROM ok WHERE k % 3 = 0)
         SELECT 'vedge' AS index_name, CAST(1 AS BIGINT) AS version,
           'bootstrap' AS batch_id, 'build' AS action
         UNION ALL
         SELECT 'vedge', CAST(1 AS BIGINT), (SELECT bid FROM oddb),
           'append'
         UNION ALL
         SELECT 'vedge', CAST(2 AS BIGINT), (SELECT bid FROM delb),
           'delete'
         UNION ALL
         SELECT 'vedge', CAST(3 AS BIGINT), 'merge-v3', 'merge'""") +
    // x217: every action row is corpus-derived — repair sizes are the
    // set differences between the even-id index and the %3 snapshot,
    // audits close at zero, and the ANN leg reports its (unrepaired)
    // odd-id gap in both cycles; cycle 2 is audit-only by
    // construction. Rows are emitted conditionally so an SF where a
    // repair set is empty stays correct.
    ("x217_maintenance_cycle" ->
      """WITH dev AS (SELECT DISTINCT lower(trim(text)) AS k
           FROM documents WHERE doc_id % 2 = 0),
         d3 AS (SELECT DISTINCT lower(trim(text)) AS k FROM documents
           WHERE doc_id % 3 = 0),
         a AS (SELECT count(*) AS n FROM dev
           WHERE k NOT IN (SELECT k FROM d3)),
         b AS (SELECT count(*) AS n FROM d3
           WHERE k NOT IN (SELECT k FROM dev)),
         m AS (SELECT count(*) AS n FROM embeddings WHERE vec_id % 2 = 1),
         r AS (
           SELECT 1 AS cycle, 'digest_idx' AS index_name,
             'delete_stale' AS action,
             'n=' || CAST((SELECT n FROM a) AS VARCHAR) AS detail
           WHERE (SELECT n FROM a) > 0
           UNION ALL
           SELECT 1, 'digest_idx', 'append_missing',
             'n=' || CAST((SELECT n FROM b) AS VARCHAR)
           WHERE (SELECT n FROM b) > 0
           UNION ALL
           SELECT 1, 'digest_idx', 'audit', 'missing=0 stale=0'
           UNION ALL
           SELECT 1, 'ann_assign', 'audit',
             'missing=' || CAST((SELECT n FROM m) AS VARCHAR)
               || ' stale=0'
           UNION ALL
           SELECT 2, 'digest_idx', 'audit', 'missing=0 stale=0'
           UNION ALL
           SELECT 2, 'ann_assign', 'audit',
             'missing=' || CAST((SELECT n FROM m) AS VARCHAR)
               || ' stale=0')
         SELECT CAST(cycle AS BIGINT) AS cycle, index_name, action,
           detail FROM r""") +
    // x218: the captured batch's id recomputes from the %5 order-key
    // set under the batchIdFor law, SALTED with the family's version
    // at capture time (v1 — the bootstrap build published, nothing
    // else had; the 'e1-' prefix is the epoch that lets a later
    // re-ingest + identical re-delete apply instead of aliasing);
    // cycle 1 applies it and audits fresh, cycle 2 (pruned feed) is
    // audit-only.
    ("x218_tombstone_capture" ->
      s"""WITH ok AS (SELECT DISTINCT l_orderkey AS k FROM lineitem
           WHERE l_orderkey % 5 = 0),
         del AS (SELECT count(*) AS n,
             'e1-' || CAST(count(*) AS VARCHAR) || '-' ||
             CAST(CAST(COALESCE(sum(CAST(('0x' ||
                 substring(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT
               AS HUGEINT)), 0) % $BatchFold AS BIGINT) AS VARCHAR)
             AS bid
           FROM ok),
         r AS (
           SELECT 1 AS cycle, 'edges' AS index_name,
             'conflict_audit' AS action, 'conflicts=0' AS detail
           UNION ALL
           SELECT 1, 'edges', 'delete_batch',
             'batch=' || (SELECT bid FROM del)
           WHERE (SELECT n FROM del) > 0
           UNION ALL
           SELECT 1, 'edges', 'audit', 'missing=0 stale=0'
           UNION ALL
           SELECT 2, 'edges', 'conflict_audit', 'conflicts=0'
           UNION ALL
           SELECT 2, 'edges', 'audit', 'missing=0 stale=0')
         SELECT CAST(cycle AS BIGINT) AS cycle, index_name, action,
           detail FROM r""") +
    // x219: the x90/x94 CTE chain trains the centroids; assignment is
    // argmax cosine against cent3 (raw vectors vs grid-scale
    // centroids — cosine is scale-invariant); the dedup witness is
    // the same-cluster pair window at 1e-6-rounded cosine.
    ("x219_semdedup" ->
      s"""WITH ${kmeansCtes(8, 3)},
         corp AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
         assignedx AS (SELECT vid, v, cid FROM (
           SELECT vid, v, c.cid, row_number() OVER (PARTITION BY vid
             ORDER BY ${kmeansCos("v", "c.cv")} DESC, c.cid) AS arn
           FROM corp, cent3 c) WHERE arn = 1),
         hits AS (SELECT b.vid AS vid, a.vid AS dup_of,
             floor(${duckCos("a.v", "b.v")} * 1000000 + 0.5)
               / 1000000.0 AS sim
           FROM assignedx a JOIN assignedx b
             ON a.cid = b.cid AND a.vid < b.vid),
         best AS (SELECT vid, dup_of, sim FROM (
           SELECT vid, dup_of, sim, row_number() OVER (PARTITION BY vid
             ORDER BY sim DESC, dup_of) AS rn
           FROM hits WHERE sim >= 0.35) WHERE rn = 1)
         SELECT s.vid AS vec_id, s.cid AS cluster_id,
           CASE WHEN h.vid IS NULL THEN 'kept' ELSE 'dropped' END
             AS status,
           h.dup_of AS dup_of, h.sim AS similarity
         FROM assignedx s LEFT JOIN best h ON s.vid = h.vid""") +
    // x220: bigram buckets via the md5 fold, add-one-smoothed
    // log-likelihood-ratio weights rounded at 1e-4 per bucket, doc
    // scores as integer sums, top-100 by (score, id).
    ("x220_dsir_select" ->
      """WITH toks AS (SELECT doc_id, (lang = 'en') AS tgt,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         gr AS (SELECT doc_id, tgt, array_to_string(t[i:i+1], ' ') AS g
           FROM toks, unnest(generate_series(1, len(t) - 1)) AS x(i)
           WHERE len(t) >= 2),
         gb AS (SELECT doc_id, tgt,
             ('0x' || substring(md5(g), 1, 15))::BIGINT % 256 AS b
           FROM gr),
         q AS (SELECT b, count(*) AS q_n FROM gb GROUP BY 1),
         p AS (SELECT b, count(*) AS p_n FROM gb WHERE tgt GROUP BY 1),
         tot AS (SELECT (SELECT sum(q_n) FROM q) AS qt,
             (SELECT COALESCE(sum(p_n), 0) FROM p) AS pt),
         bw AS (SELECT q.b,
             CAST(floor(ln(
                 ((COALESCE(p_n, 0) + 1.0) * (qt + 256.0))
                 / ((q_n + 1.0) * (pt + 256.0))) * 10000 + 0.5)
               AS BIGINT) AS w
           FROM q LEFT JOIN p ON q.b = p.b, tot),
         ds AS (SELECT gb.doc_id, count(*) AS n_grams, sum(w) AS si
           FROM gb JOIN bw ON gb.b = bw.b GROUP BY 1),
         alld AS (SELECT d.doc_id,
             CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
             CAST(COALESCE(si, 0) AS BIGINT) AS si
           FROM documents d LEFT JOIN ds ON d.doc_id = ds.doc_id)
         SELECT doc_id, n_grams, CAST(si AS DOUBLE) / 10000.0 AS score,
           CAST(row_number() OVER w AS BIGINT) AS rank
         FROM alld
         WINDOW w AS (ORDER BY si DESC, doc_id)
         QUALIFY row_number() OVER w <= 100""") +
    ("x221_nprobe_sweep" -> nprobeSweepOracle(nQueries = 10,
      numCentroids = 16, k = 3, nprobes = Seq(1, 2, 3, 4))) +
    // x222: weights learned from the even-id slice (same law as x220,
    // including the q_n = p_n = 0 smoothed weight for buckets the
    // corpus never saw), odd-id batch scored against them.
    ("x222_dsir_indexed" ->
      """WITH ctoks AS (SELECT doc_id, (lang = 'en') AS tgt,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents WHERE doc_id % 2 = 0),
         cgr AS (SELECT doc_id, tgt, array_to_string(t[i:i+1], ' ') AS g
           FROM ctoks, unnest(generate_series(1, len(t) - 1)) AS x(i)
           WHERE len(t) >= 2),
         cgb AS (SELECT doc_id, tgt,
             ('0x' || substring(md5(g), 1, 15))::BIGINT % 256 AS b
           FROM cgr),
         qp AS (SELECT b, count(*) AS q_n,
             COALESCE(sum(CASE WHEN tgt THEN 1 ELSE 0 END), 0) AS p_n
           FROM cgb GROUP BY 1),
         tot AS (SELECT COALESCE((SELECT sum(q_n) FROM qp), 0) AS qt,
             COALESCE((SELECT sum(p_n) FROM qp), 0) AS pt),
         bw AS (SELECT f.b,
             CAST(floor(ln(
                 ((COALESCE(q.p_n, 0) + 1.0) * (qt + 256.0))
                 / ((COALESCE(q.q_n, 0) + 1.0) * (pt + 256.0)))
               * 10000 + 0.5) AS BIGINT) AS w
           FROM (SELECT unnest(generate_series(0, 255)) AS b) f
           LEFT JOIN qp q ON f.b = q.b, tot),
         btoks AS (SELECT doc_id,
             string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents WHERE doc_id % 2 = 1),
         bgr AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
           FROM btoks, unnest(generate_series(1, len(t) - 1)) AS x(i)
           WHERE len(t) >= 2),
         bgb AS (SELECT doc_id,
             ('0x' || substring(md5(g), 1, 15))::BIGINT % 256 AS b
           FROM bgr),
         ds AS (SELECT doc_id, count(*) AS n_grams, sum(w) AS si
           FROM bgb JOIN bw USING (b) GROUP BY 1)
         SELECT d.doc_id,
           CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(si, 0) AS DOUBLE) / 10000.0 AS score
         FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
         LEFT JOIN ds ON d.doc_id = ds.doc_id""") +
    // x223: x219's chain, reduced to the dropped set's anti-join.
    ("x223_semdedup_apply" ->
      s"""WITH ${kmeansCtes(8, 3)},
         corp AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
         assignedx AS (SELECT vid, v, cid FROM (
           SELECT vid, v, c.cid, row_number() OVER (PARTITION BY vid
             ORDER BY ${kmeansCos("v", "c.cv")} DESC, c.cid) AS arn
           FROM corp, cent3 c) WHERE arn = 1),
         dropped AS (SELECT DISTINCT b.vid FROM assignedx a
           JOIN assignedx b ON a.cid = b.cid AND a.vid < b.vid
           WHERE floor(${duckCos("a.v", "b.v")} * 1000000 + 0.5)
             / 1000000.0 >= 0.35)
         SELECT vec_id, label FROM embeddings
         WHERE vec_id NOT IN (SELECT vid FROM dropped)""") +
    // x224: 24-char positional substrings grouped DIRECTLY (the
    // engine's doubling keys form the same equality classes);
    // keep = min struct(doc, pos), islands merge marked positions <= 24
    // apart — x83's walk in character space
    ("x224_substring_dedup" ->
      """WITH g AS (SELECT doc_id, i AS pos, substring(text, i, 24) AS gr
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE length(text) >= 24),
         agg AS (SELECT gr, count(*) AS n,
             min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM g GROUP BY gr),
         rem AS (SELECT doc_id, pos FROM g JOIN agg USING (gr)
           WHERE n >= 2 AND struct_pack(d := doc_id, p := pos) <> first_enc),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 24
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 24 AS BIGINT) AS span_len
         FROM isl GROUP BY doc_id, grp""") +
    // x225: x224's spans cut by character surgery — per doc the kept
    // pieces are [prev_end, start) segments plus the tail, reassembled
    // in order; span-free documents pass through byte-identical
    ("x225_substring_apply" ->
      """WITH g AS (SELECT doc_id, i AS pos, substring(text, i, 24) AS gr
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE length(text) >= 24),
         agg AS (SELECT gr, count(*) AS n,
             min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM g GROUP BY gr),
         rem AS (SELECT doc_id, pos FROM g JOIN agg USING (gr)
           WHERE n >= 2 AND struct_pack(d := doc_id, p := pos) <> first_enc),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 24
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg),
         spans AS (SELECT doc_id, min(pos) AS s,
             max(pos) - min(pos) + 24 AS l
           FROM isl GROUP BY doc_id, grp),
         sp AS (SELECT doc_id, s, s + l AS e FROM spans),
         mid AS (SELECT doc_id,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1)
               AS ps, s AS pe
           FROM sp),
         tails AS (SELECT doc_id, max(e) AS ps FROM sp GROUP BY doc_id),
         pieces AS (
           SELECT m.doc_id, m.ps,
             substring(d.text, CAST(m.ps AS INT),
               CAST(m.pe - m.ps AS INT)) AS piece
           FROM mid m JOIN documents d USING (doc_id)
           UNION ALL
           SELECT t.doc_id, t.ps,
             substring(d.text, CAST(t.ps AS INT),
               greatest(length(d.text) - CAST(t.ps AS INT) + 1, 0))
           FROM tails t JOIN documents d USING (doc_id)),
         agged AS (SELECT doc_id,
             string_agg(piece, '' ORDER BY ps) AS clean_text
           FROM pieces GROUP BY doc_id),
         rm AS (SELECT doc_id, sum(l) AS n FROM spans GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(rm.n, 0) AS BIGINT) AS n_chars_removed,
           coalesce(a.clean_text, d.text) AS clean_text
         FROM documents d LEFT JOIN agged a USING (doc_id)
         LEFT JOIN rm USING (doc_id)""") +
    // x227: batch (odd ids) grams marked when present in the even-id
    // corpus's gram set (corpus keeps) or repeated within the batch
    // (min struct(doc, pos) keeps); islands merge as x224
    ("x227_substring_indexed" ->
      """WITH cg AS (SELECT DISTINCT substring(text, i, 24) AS gr
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE doc_id % 2 = 0 AND length(text) >= 24),
         bg AS (SELECT doc_id, i AS pos, substring(text, i, 24) AS gr
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE doc_id % 2 = 1 AND length(text) >= 24),
         agg AS (SELECT gr, count(*) AS n,
             min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM bg GROUP BY gr),
         rem AS (
           SELECT doc_id, pos FROM bg JOIN agg USING (gr)
           WHERE n >= 2 AND struct_pack(d := doc_id, p := pos) <> first_enc
           UNION
           SELECT doc_id, pos FROM bg
           WHERE gr IN (SELECT gr FROM cg)),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 24
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 24 AS BIGINT) AS span_len
         FROM isl GROUP BY doc_id, grp""") +
    // x228: x224's span chain rolled up per source — duplicated char
    // mass under the same keep rule, x115's ratio-rounding law
    ("x228_substring_savings" ->
      """WITH g AS (SELECT doc_id, i AS pos, substring(text, i, 24) AS gr
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE length(text) >= 24),
         agg AS (SELECT gr, count(*) AS n,
             min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM g GROUP BY gr),
         rem AS (SELECT doc_id, pos FROM g JOIN agg USING (gr)
           WHERE n >= 2 AND struct_pack(d := doc_id, p := pos) <> first_enc),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 24
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg),
         spans AS (SELECT doc_id,
             max(pos) - min(pos) + 24 AS span_len
           FROM isl GROUP BY doc_id, grp),
         perdoc AS (SELECT doc_id, sum(span_len) AS dup_chars
           FROM spans GROUP BY doc_id)
         SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN p.dup_chars IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dup_docs,
           CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
           CAST(sum(coalesce(p.dup_chars, 0)) AS BIGINT) AS dup_chars,
           CASE WHEN sum(length(d.text)) > 0 THEN
             floor(CAST(sum(coalesce(p.dup_chars, 0)) AS DOUBLE)
               / CAST(sum(length(d.text)) AS DOUBLE) * 10000 + 0.5)
               / 10000.0
           ELSE 0.0 END AS dup_frac
         FROM documents d LEFT JOIN perdoc p USING (doc_id)
         GROUP BY d.source""") +
    // x232: odd-corpus grams IN the even-benchmark gram set -> islands
    // merge (x227's cross leg ALONE — no internal-dup leg, no
    // first-occurrence exemption, x95's law)
    ("x232_substring_decontam" ->
      """WITH cg AS (SELECT DISTINCT substring(text, i, 24) AS gr
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE doc_id % 2 = 0 AND length(text) >= 24),
         bg AS (SELECT doc_id, i AS pos, substring(text, i, 24) AS gr
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE doc_id % 2 = 1 AND length(text) >= 24),
         rem AS (SELECT doc_id, pos FROM bg
           WHERE gr IN (SELECT gr FROM cg)),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 24
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 24 AS BIGINT) AS span_len
         FROM isl GROUP BY doc_id, grp""") +
    // x231: brute-force argmax mirror of the bestMatch kernel — per
    // corpus vector the (sim desc, bench_id asc) rank-1 benchmark
    // witness (x3's total order), raw-cosine threshold, 1e-6 rounding
    ("x231_semantic_decontam" ->
      s"""WITH bench AS (SELECT vec_id AS bench_id, embedding AS bv
           FROM embeddings WHERE vec_id < 20),
         corp AS (SELECT vec_id, embedding AS cv FROM embeddings
           WHERE vec_id >= 20),
         scored AS (SELECT corp.vec_id, bench_id,
             ${duckCos("cv", "bv")} AS sim
           FROM corp, bench),
         best AS (SELECT vec_id, bench_id, sim,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY sim DESC, bench_id) AS rn
           FROM scored)
         SELECT vec_id,
           CASE WHEN sim >= 0.35 THEN 'dropped' ELSE 'kept' END
             AS status,
           bench_id AS best_bench_id,
           floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
         FROM best WHERE rn = 1""") +
    // x230: x227's span chain (odd batch vs the even-id corpus gram
    // set, batch-internal struct-argmin keeps) composed with x225's
    // character surgery, over the odd batch documents only
    ("x230_substring_apply_indexed" ->
      """WITH batch AS (SELECT doc_id, text FROM documents
           WHERE doc_id % 2 = 1),
         cg AS (SELECT DISTINCT substring(text, i, 24) AS gr
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE doc_id % 2 = 0 AND length(text) >= 24),
         bg AS (SELECT doc_id, i AS pos, substring(text, i, 24) AS gr
           FROM batch, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE length(text) >= 24),
         agg AS (SELECT gr, count(*) AS n,
             min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM bg GROUP BY gr),
         rem AS (
           SELECT doc_id, pos FROM bg JOIN agg USING (gr)
           WHERE n >= 2 AND
             struct_pack(d := doc_id, p := pos) <> first_enc
           UNION
           SELECT doc_id, pos FROM bg
           WHERE gr IN (SELECT gr FROM cg)),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 24
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg),
         spans AS (SELECT doc_id, min(pos) AS s,
             max(pos) - min(pos) + 24 AS l
           FROM isl GROUP BY doc_id, grp),
         sp AS (SELECT doc_id, s, s + l AS e FROM spans),
         mid AS (SELECT doc_id,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1)
               AS ps, s AS pe
           FROM sp),
         tails AS (SELECT doc_id, max(e) AS ps FROM sp GROUP BY doc_id),
         pieces AS (
           SELECT m.doc_id, m.ps,
             substring(d.text, CAST(m.ps AS INT),
               CAST(m.pe - m.ps AS INT)) AS piece
           FROM mid m JOIN batch d USING (doc_id)
           UNION ALL
           SELECT t.doc_id, t.ps,
             substring(d.text, CAST(t.ps AS INT),
               greatest(length(d.text) - CAST(t.ps AS INT) + 1, 0))
           FROM tails t JOIN batch d USING (doc_id)),
         agged AS (SELECT doc_id,
             string_agg(piece, '' ORDER BY ps) AS clean_text
           FROM pieces GROUP BY doc_id),
         rm AS (SELECT doc_id, sum(l) AS n FROM spans GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(rm.n, 0) AS BIGINT) AS n_chars_removed,
           coalesce(a.clean_text, d.text) AS clean_text
         FROM batch d LEFT JOIN agged a USING (doc_id)
         LEFT JOIN rm USING (doc_id)""") +
    // x229: repair sizes are the distinct-substring set differences
    // between the even-id bootstrap and the %3 maintained corpus (the
    // doubling keys form the same equality classes — x224's law);
    // audits close at zero, cycle 2 is audit-only by construction.
    // Rows are emitted conditionally so an SF where a repair set is
    // empty stays correct.
    ("x229_substring_maintained" ->
      """WITH ev AS (SELECT DISTINCT substring(text, i, 24) AS g
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE doc_id % 2 = 0 AND length(text) >= 24),
         d3 AS (SELECT DISTINCT substring(text, i, 24) AS g
           FROM documents, unnest(generate_series(1, length(text) - 23))
             AS s(i)
           WHERE doc_id % 3 = 0 AND length(text) >= 24),
         a AS (SELECT count(*) AS n FROM ev
           WHERE g NOT IN (SELECT g FROM d3)),
         b AS (SELECT count(*) AS n FROM d3
           WHERE g NOT IN (SELECT g FROM ev)),
         r AS (
           SELECT 1 AS cycle, 'substring_idx' AS index_name,
             'delete_stale' AS action,
             'n=' || CAST((SELECT n FROM a) AS VARCHAR) AS detail
           WHERE (SELECT n FROM a) > 0
           UNION ALL
           SELECT 1, 'substring_idx', 'append_missing',
             'n=' || CAST((SELECT n FROM b) AS VARCHAR)
           WHERE (SELECT n FROM b) > 0
           UNION ALL
           SELECT 1, 'substring_idx', 'audit', 'missing=0 stale=0'
           UNION ALL
           SELECT 2, 'substring_idx', 'audit', 'missing=0 stale=0')
         SELECT CAST(cycle AS BIGINT) AS cycle, index_name, action,
           detail FROM r""")

  /** x221's oracle: x10's IVF formulation (fixed codebook = the
    * `numCentroids` smallest vec_ids, assignment/probing by argmax
    * cosine with id tie-break) evaluated at EVERY swept width — one
    * recall@k row per nprobe, with the scored-candidate count
    * (self-pairs excluded, matching the engine's pruned scan). */
  private def nprobeSweepOracle(nQueries: Int, numCentroids: Int,
                                k: Int, nprobes: Seq[Int]): String = {
    val rows = nprobes.map { np =>
      s"""SELECT CAST($np AS INTEGER) AS nprobe, CAST($k AS INTEGER) AS k,
           (SELECT CAST(count(DISTINCT query_id) AS BIGINT) FROM exact)
             AS n_queries,
           (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
           (SELECT CAST(count(a.neighbor_id) AS BIGINT) FROM exact e
              LEFT JOIN approx$np a ON e.query_id = a.query_id
                AND e.neighbor_id = a.neighbor_id) AS n_hits,
           (SELECT CAST(count(a.neighbor_id) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) FROM exact e
              LEFT JOIN approx$np a ON e.query_id = a.query_id
                AND e.neighbor_id = a.neighbor_id) AS recall,
           (SELECT CAST(count(*) AS BIGINT) FROM cand$np)
             AS n_candidates"""
    }.mkString("\nUNION ALL\n")
    val legs = nprobes.map { np =>
      s"""cand$np AS (SELECT query_id, neighbor_id,
             ${duckCos("qv", "cv")} AS sim
           FROM assigned JOIN (SELECT query_id, qv, centroid_id
             FROM pr WHERE prn <= $np) p$np USING (centroid_id)
           WHERE query_id <> neighbor_id),
         approx$np AS (SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id, row_number() OVER (
             PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
           FROM cand$np) WHERE rn <= $k)"""
    }.mkString(",\n")
    s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv
         FROM embeddings WHERE vec_id < $numCentroids),
       corp AS (SELECT vec_id AS neighbor_id, embedding AS cv
         FROM embeddings),
       assigned AS (SELECT neighbor_id, cv, centroid_id FROM (
         SELECT neighbor_id, cv, centroid_id, row_number() OVER
           (PARTITION BY neighbor_id
            ORDER BY ${duckCos("cv", "centv")} DESC, centroid_id) AS arn
         FROM corp, cent) WHERE arn = 1),
       q AS (SELECT vec_id AS query_id, embedding AS qv
         FROM embeddings WHERE vec_id < $nQueries),
       pr AS (SELECT query_id, qv, centroid_id, row_number() OVER
           (PARTITION BY query_id
            ORDER BY ${duckCos("qv", "centv")} DESC, centroid_id) AS prn
         FROM q, cent),
       exact AS (SELECT query_id, neighbor_id FROM (
         SELECT q.query_id, c.neighbor_id, row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY ${duckCos("qv", "cv")} DESC, c.neighbor_id) AS ern
         FROM q JOIN corp c ON q.query_id <> c.neighbor_id)
         WHERE ern <= $k),
       $legs
       $rows"""
  }

  private lazy val freshnessOracle: String =
      """WITH dall AS (SELECT DISTINCT lower(trim(text)) AS k
           FROM documents),
         dev AS (SELECT DISTINCT lower(trim(text)) AS k FROM documents
           WHERE doc_id % 2 = 0),
         d3 AS (SELECT DISTINCT lower(trim(text)) AS k FROM documents
           WHERE doc_id % 3 = 0),
         eall AS (SELECT DISTINCT vec_id AS k FROM embeddings),
         eev AS (SELECT DISTINCT vec_id AS k FROM embeddings
           WHERE vec_id % 2 = 0),
         legs AS (
           SELECT 'digest_idx' AS index_name,
             (SELECT count(*) FROM dall) AS n_corpus,
             (SELECT count(*) FROM dev) AS n_indexed,
             (SELECT count(*) FROM dall
                WHERE k NOT IN (SELECT k FROM dev)) AS n_missing,
             (SELECT count(*) FROM dev
                WHERE k NOT IN (SELECT k FROM dall)) AS n_stale
           UNION ALL
           SELECT 'digest_idx_vs_snapshot',
             (SELECT count(*) FROM d3), (SELECT count(*) FROM dev),
             (SELECT count(*) FROM d3
                WHERE k NOT IN (SELECT k FROM dev)),
             (SELECT count(*) FROM dev
                WHERE k NOT IN (SELECT k FROM d3))
           UNION ALL
           SELECT 'ann_assign',
             (SELECT count(*) FROM eall), (SELECT count(*) FROM eev),
             (SELECT count(*) FROM eall
                WHERE k NOT IN (SELECT k FROM eev)),
             (SELECT count(*) FROM eev
                WHERE k NOT IN (SELECT k FROM eall)))
         SELECT index_name, CAST(n_corpus AS BIGINT) AS n_corpus,
           CAST(n_indexed AS BIGINT) AS n_indexed,
           CAST(n_missing AS BIGINT) AS n_missing,
           CAST(n_stale AS BIGINT) AS n_stale,
           floor((n_corpus - n_missing) / CAST(n_corpus AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS coverage
         FROM legs"""

  private lazy val extendedOracleSql: Map[String, String] = baseOracleSql ++ Map(
    "x80_neardup_indexed" -> baseOracleSql("x75_incremental_neardup"),
    "x81_dedup_indexed" -> baseOracleSql("x74_incremental_dedup"),
    "x82_bpe_merges" -> bpeOracleSql(6),
    "x84_bpe_encode" -> bpeEncodeOracleSql(6),
    // positional 8-gram digests -> per-gram (count, first-occurrence
    // argmin via the struct(doc, pos) argmin) -> non-first duplicated
    // positions -> gaps-and-islands merge (lag + running sum) into
    // maximal spans. hash() here vs xxhash64 in Spark is fine: digests
    // never leave their engine.
    "x83_span_dedup" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS pos,
             hash(array_to_string(t[i:i+7], ' ')) AS h
           FROM toks, unnest(generate_series(1, len(t) - 7)) AS s(i)),
         agg AS (SELECT h, count(*) AS n,
             min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM g GROUP BY h),
         rem AS (SELECT doc_id, pos FROM g JOIN agg USING (h)
           WHERE n >= 2 AND struct_pack(d := doc_id, p := pos) <> first_enc),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 8
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 8 AS BIGINT) AS span_len
         FROM isl GROUP BY doc_id, grp""",
    // non-overlapping 12-token chunks (generate_series step = size;
    // the tail chunk short, as chunkTokens'); keep = globally-first
    // occurrence via the struct(doc, chunk_idx) argmin; reassembly =
    // pos-ordered string_agg over kept chunks (string_agg skips the
    // NULLs the CASE leaves for dropped ones).
    "x85_paragraph_dedup" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         c AS (SELECT doc_id, CAST((i - 1) / 12 AS BIGINT) AS pos,
             array_to_string(t[i:i+11], ' ') AS para
           FROM toks, unnest(generate_series(1, len(t), 12)) AS s(i)),
         a AS (SELECT para, min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM c GROUP BY para),
         f AS (SELECT doc_id, pos, para,
             (struct_pack(d := doc_id, p := pos) = first_enc) AS keep
           FROM c JOIN a USING (para))
         SELECT doc_id,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped,
           string_agg(CASE WHEN keep THEN para END, ' ' ORDER BY pos)
             AS clean_text
         FROM f GROUP BY doc_id
         HAVING sum(CASE WHEN keep THEN 1 ELSE 0 END) >= 1""",
    // add-one-smoothed bigram conditional log-prob, ln on the 1e-4
    // grid BEFORE the multiplicity multiply (the x25/x33 ln-parity
    // convention); weighted mean = exact DECIMAL(38,6) sum of
    // deterministic addends / total bigrams, result on the 1e-4 grid.
    "x86_bigram_lm" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         p AS (SELECT doc_id, t[g.i] AS w1, t[g.i + 1] AS w2
           FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)),
         dp AS (SELECT doc_id, w1, w2, count(*) AS m
           FROM p GROUP BY ALL),
         bi AS (SELECT w1, w2, count(*) AS cb FROM p GROUP BY ALL),
         uni AS (SELECT w AS w1, count(*) AS cu
           FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
         v AS (SELECT count(*) AS vs FROM uni)
         SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
           floor(sum(CAST(m * (floor(ln(
                 (cb + 1.0) / (cu + vs)) * 10000 + 0.5) / 10000.0)
               AS DECIMAL(38,6)))::DOUBLE
             / sum(m) * 10000 + 0.5) / 10000 AS avg_logprob
         FROM dp JOIN bi USING (w1, w2) JOIN uni USING (w1), v
         GROUP BY doc_id""",
    // the x83 span chain, then a per-token covered test against the
    // doc's spans and a pos-ordered reassembly of the survivors; docs
    // with no spans pass through whole, fully-covered docs come out
    // with clean_text = '' (COALESCE matches Spark's concat_ws on an
    // empty survivor array).
    "x87_span_apply" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS pos,
             hash(array_to_string(t[i:i+7], ' ')) AS h
           FROM toks, unnest(generate_series(1, len(t) - 7)) AS s(i)),
         agg AS (SELECT h, count(*) AS n,
             min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM g GROUP BY h),
         rem AS (SELECT doc_id, pos FROM g JOIN agg USING (h)
           WHERE n >= 2 AND struct_pack(d := doc_id, p := pos) <> first_enc),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 8
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg),
         spans AS (SELECT doc_id, min(pos) AS s,
             max(pos) - min(pos) + 8 AS l
           FROM isl GROUP BY doc_id, grp),
         tok AS (SELECT doc_id, i - 1 AS pos, t[i] AS tk
           FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
         cov AS (SELECT tok.doc_id, tok.pos, tok.tk,
             EXISTS (SELECT 1 FROM spans sp
               WHERE sp.doc_id = tok.doc_id
                 AND tok.pos >= sp.s AND tok.pos < sp.s + sp.l)
               AS covered
           FROM tok)
         SELECT doc_id,
           CAST(count(*) FILTER (WHERE covered) AS BIGINT)
             AS n_tokens_removed,
           COALESCE(string_agg(tk, ' ' ORDER BY pos)
             FILTER (WHERE NOT covered), '') AS clean_text
         FROM cov GROUP BY doc_id""",
    // symmetric per-vector int8 grid (floor(x/(max|x|/127) + 0.5) as
    // BIGINT), then cosine over the INTEGER codes — the scales cancel,
    // so both engines rank identical exact integer ratios; one final
    // double division + the 1e-6 grid, as x3.
    "x88_quantized_ann" ->
      """WITH am AS (SELECT vec_id, embedding,
           list_max(list_transform(generate_series(1, 64),
             i -> abs(CAST(embedding[i] AS DOUBLE)))) AS m
           FROM embeddings),
         qv AS (SELECT vec_id,
             list_transform(generate_series(1, 64),
               i -> CAST(floor(CAST(embedding[i] AS DOUBLE)
                 / (m / 127.0) + 0.5) AS BIGINT)) AS q
           FROM am WHERE m > 0),
         nq AS (SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(generate_series(1, 64),
               i -> q[i] * q[i])) AS DOUBLE)) AS n
           FROM qv),
         qs AS (SELECT vec_id AS query_id, q AS qq, n AS qn
           FROM nq WHERE vec_id < 10),
         scored AS (SELECT query_id, nq.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(generate_series(1, 64),
               i -> qq[i] * q[i])) AS DOUBLE) / (qn * n) AS sim
           FROM nq, qs WHERE nq.vec_id <> query_id)
         SELECT query_id, neighbor_id,
           CAST(row_number() OVER w AS BIGINT) AS rank,
           floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
         FROM scored
         WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
         QUALIFY row_number() OVER w <= 5""",
    // x85's chunk-dedup chain reassembles clean_text, THEN x86's LM
    // chain runs over the deduped text (retokenized from clean_text),
    // then the gate. Same grids and conventions as the two parents.
    "x89_lm_curate" ->
      """WITH toks0 AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         c AS (SELECT doc_id, CAST((i - 1) / 12 AS BIGINT) AS pos,
             array_to_string(t[i:i+11], ' ') AS para
           FROM toks0, unnest(generate_series(1, len(t), 12)) AS s(i)),
         a AS (SELECT para, min(struct_pack(d := doc_id, p := pos)) AS first_enc
           FROM c GROUP BY para),
         f AS (SELECT doc_id, pos, para,
             (struct_pack(d := doc_id, p := pos) = first_enc) AS keep
           FROM c JOIN a USING (para)),
         clean AS (SELECT doc_id,
             string_agg(CASE WHEN keep THEN para END, ' ' ORDER BY pos)
               AS clean_text
           FROM f GROUP BY doc_id
           HAVING sum(CASE WHEN keep THEN 1 ELSE 0 END) >= 1),
         toks AS (SELECT doc_id,
             string_split_regex(clean_text, '\s+') AS t FROM clean),
         p AS (SELECT doc_id, t[g.i] AS w1, t[g.i + 1] AS w2
           FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)),
         dp AS (SELECT doc_id, w1, w2, count(*) AS m
           FROM p GROUP BY ALL),
         bi AS (SELECT w1, w2, count(*) AS cb FROM p GROUP BY ALL),
         uni AS (SELECT w AS w1, count(*) AS cu
           FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
         v AS (SELECT count(*) AS vs FROM uni),
         scored AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
             floor(sum(CAST(m * (floor(ln(
                   (cb + 1.0) / (cu + vs)) * 10000 + 0.5) / 10000.0)
                 AS DECIMAL(38,6)))::DOUBLE
               / sum(m) * 10000 + 0.5) / 10000 AS avg_logprob
           FROM dp JOIN bi USING (w1, w2) JOIN uni USING (w1), v
           GROUP BY doc_id)
         SELECT doc_id, n_bigrams, avg_logprob FROM scored
         WHERE avg_logprob >= -3.4""",
    "x90_kmeans_codebook" -> kmeansOracleSql(8, 3),
    // identical rows to x10 by construction: the index persists the
    // same kernel's assignment and the same norms
    "x91_ann_indexed" -> baseOracleSql("x10_ann_ivf"),
    // mirrors x92's blocking exactly: existing (even) side assigned to
    // its argmax centroid at index-build time, batch (odd) side probes
    // its top-2 centroids (cos DESC, id ASC — probeCentroids' order),
    // drop on any same-bucket cosine >= 0.4
    "x92_embedding_dedup_indexed" ->
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS centv
           FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 32),
         ex AS (SELECT vec_id AS old_id, embedding AS ev
           FROM embeddings WHERE vec_id % 2 = 0),
         exa AS (SELECT old_id, ev, cid FROM (
           SELECT old_id, ev, cid, row_number() OVER (PARTITION BY old_id
             ORDER BY ${duckCos("ev", "centv")} DESC, cid) AS rn
           FROM ex, cent) WHERE rn = 1),
         nw AS (SELECT vec_id AS new_id, embedding AS nv
           FROM embeddings WHERE vec_id % 2 = 1),
         np AS (SELECT new_id, nv, cid FROM (
           SELECT new_id, nv, cid, row_number() OVER (PARTITION BY new_id
             ORDER BY ${duckCos("nv", "centv")} DESC, cid) AS rn
           FROM nw, cent) WHERE rn <= 2),
         drops AS (SELECT DISTINCT new_id FROM np JOIN exa USING (cid)
           WHERE ${duckCos("nv", "ev")} >= 0.4)
         SELECT vec_id FROM embeddings WHERE vec_id % 2 = 1
           AND vec_id NOT IN (SELECT new_id FROM drops)""",
    // the x8 pair population at 0.5 (x54's), closed into components by
    // the recursive walk (x32's), then every doc takes its rep's split
    // label (singletons are their own rep)
    "x93_cluster_split" ->
      s"""WITH RECURSIVE $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT d1, d2 FROM inter
           JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
           UNION SELECT d2, d1 FROM pairs),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1)
         SELECT d.doc_id, coalesce(c.rep, d.doc_id) AS cluster_rep,
           CASE WHEN substring(md5(CAST(coalesce(c.rep, d.doc_id)
                  AS VARCHAR)), 1, 1) <= '9' THEN 'train'
                WHEN substring(md5(CAST(coalesce(c.rep, d.doc_id)
                  AS VARCHAR)), 1, 1) <= 'b' THEN 'val'
                ELSE 'test' END AS split
         FROM documents d LEFT JOIN comp c ON d.doc_id = c.node""",
    "x94_selftrained_ann" -> kmeansAnnOracleSql(8, 3, nprobe = 2,
      topK = 3),
    // x83's islands shape minus the (count, argmin) stage: membership
    // in the benchmark's distinct 8-gram set IS the contamination mark
    "x95_contaminated_spans" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS pos,
             array_to_string(t[i:i+7], ' ') AS gs
           FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)),
         bench AS (SELECT DISTINCT gs FROM g WHERE doc_id < 30),
         rem AS (SELECT doc_id, pos FROM g
           WHERE doc_id >= 30 AND gs IN (SELECT gs FROM bench)),
         seg AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos)
                 OVER (PARTITION BY doc_id ORDER BY pos) <= 8
               THEN 0 ELSE 1 END AS newseg
           FROM rem),
         isl AS (SELECT doc_id, pos,
             sum(newseg) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM seg)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 8 AS BIGINT) AS span_len
         FROM isl GROUP BY doc_id, grp""",
    // the x84 encode statement as a CTE, then x46's offsets logic over
    // n_subtokens — aliased to n_tokens, the offsets-schema contract
    "x96_bpe_offsets" ->
      s"""WITH enc AS (${bpeEncodeOracleSql(6)}),
         tok AS (SELECT doc_id, n_subtokens AS n_tokens,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             AS hk
           FROM enc)
         SELECT doc_id, n_tokens,
           CAST(coalesce(SUM(n_tokens) OVER (ORDER BY hk, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_offset
         FROM tok""",
    // x93's component chain folded to the size histogram; singletons
    // enter via the left join's coalesce as size-1 clusters
    "x97_dedup_stats" ->
      s"""WITH RECURSIVE $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT d1, d2 FROM inter
           JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
           UNION SELECT d2, d1 FROM pairs),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1),
         reps AS (SELECT d.doc_id, coalesce(c.rep, d.doc_id) AS rep
           FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         sizes AS (SELECT rep, CAST(count(*) AS BIGINT) AS cluster_size
           FROM reps GROUP BY 1)
         SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         FROM sizes GROUP BY 1""",
    // BM25 laws mirrored term by term: idf pre-rounded at 1e-4 (the x25
    // ln shim), tf-norm all IEEE-exact ops then rounded, per-doc sum as
    // exact DECIMAL (order-free). k1+1 is written (1.2 + 1.0) — the
    // same IEEE add the Scala side computes — NOT the literal 2.2,
    // whose nearest double differs from the sum by ~1 ulp.
    "x98_bm25_topk" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
           FROM lens),
         tf AS (SELECT doc_id, u.term AS term,
             CAST(count(*) AS DOUBLE) AS tf
           FROM toks, unnest(t) AS u(term)
           WHERE u.term IN ('join', 'hash', 'window', 'spark')
           GROUP BY 1, 2),
         dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
           FROM tf GROUP BY 1),
         contrib AS (SELECT doc_id,
             floor((floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                      * 10000 + 0.5) / 10000.0)
                 * (floor(tf * (1.2 + 1.0)
                      / (tf + 1.2 * ((1.0 - 0.75)
                          + 0.75 * dl / avgdl))
                      * 10000 + 0.5) / 10000.0)
               * 10000 + 0.5) / 10000.0 AS c
           FROM tf JOIN lens USING (doc_id) JOIN dfq USING (term)
           CROSS JOIN stats)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS score
         FROM contrib GROUP BY 1
         ORDER BY score DESC, doc_id LIMIT 50""",
    // the x12 quality_score expression verbatim, then a per-source
    // (score DESC, doc_id) row_number cap
    "x99_source_cap" ->
      """WITH qs AS (SELECT doc_id, source,
           floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS quality_score
           FROM documents),
         r AS (SELECT doc_id, source, quality_score,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rank
           FROM qs)
         SELECT doc_id, source, quality_score, rank FROM r
         WHERE rank <= 10""",
    // x38's broadcast-join shape kept at PAIR grain instead of folding
    // to a per-doc count
    "x100_contam_pairs" ->
      s"""WITH $duckShingles,
         pairs AS (SELECT b.doc_id AS bench_id, c.doc_id AS doc_id,
             CAST(count(*) AS BIGINT) AS n_overlap
           FROM sh c JOIN sh b ON c.s = b.s
           WHERE b.doc_id < 20 AND c.doc_id >= 20
           GROUP BY 1, 2)
         SELECT bench_id, doc_id, n_overlap FROM pairs
         WHERE n_overlap >= 3""",
    // the x10/x22 assignment CTE folded to bucket sizes; empty
    // centroids enter via the left join as 0-vector buckets. load
    // factor = (n·k)/N with k=16 — the same left-assoc IEEE ops as the
    // Spark side.
    "x101_ivf_balance" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id < 16),
         corp AS (SELECT vec_id AS vid, embedding AS v FROM embeddings),
         assigned AS (SELECT vid, centroid_id FROM (
           SELECT vid, centroid_id, row_number() OVER (PARTITION BY vid
             ORDER BY ${duckCos("v", "centv")} DESC, centroid_id) AS rn
           FROM corp, cent) WHERE rn = 1),
         counts AS (SELECT centroid_id, count(*) AS n
           FROM assigned GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM corp)
         SELECT c.centroid_id,
           CAST(coalesce(n, 0) AS BIGINT) AS n_vectors,
           floor(CAST(coalesce(n, 0) AS DOUBLE) * 16.0 / total
             * 10000 + 0.5) / 10000.0 AS load_factor
         FROM cent c LEFT JOIN counts USING (centroid_id) CROSS JOIN tot""",
    // the x84 encode statement as a CTE, aggregated per language; the
    // ratio divides two exact long sums (one IEEE division, no float
    // accumulation)
    "x102_bpe_compression" ->
      s"""WITH enc AS (${bpeEncodeOracleSql(6)})
         SELECT d.lang AS "group", CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(enc.n_words) AS BIGINT) AS n_words,
           CAST(sum(enc.n_subtokens) AS BIGINT) AS n_subtokens,
           CASE WHEN sum(enc.n_words) > 0 THEN
             floor(CAST(sum(enc.n_subtokens) AS DOUBLE)
               / CAST(sum(enc.n_words) AS DOUBLE) * 10000 + 0.5) / 10000.0
           END AS subtokens_per_word
         FROM enc JOIN documents d USING (doc_id)
         GROUP BY d.lang""",
    // the x12 quality_score expression, a single-window exact rank (the
    // oracle may sort globally; the Spark plan must not), and the same
    // left-assoc phase arithmetic
    "x103_curriculum" ->
      """WITH qs AS (SELECT doc_id,
           floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS quality_score
           FROM documents),
         r AS (SELECT doc_id, quality_score,
             CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
               AS BIGINT) AS rank,
             count(*) OVER () AS n
           FROM qs)
         SELECT doc_id, quality_score, rank,
           CAST(floor((rank - 1) * 4.0 / n) AS INTEGER) AS phase
         FROM r""",
    // the duckShingles distinct-gram stream with its df table joined
    // back; short docs enter via the left join as (0, 0, NULL)
    "x104_novelty" ->
      s"""WITH $duckShingles,
         dfh AS (SELECT s, count(*) AS df FROM sh GROUP BY 1),
         per AS (SELECT sh.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique
           FROM sh JOIN dfh USING (s) GROUP BY 1)
         SELECT d.doc_id,
           CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(n_unique, 0) AS BIGINT) AS n_unique,
           CASE WHEN coalesce(n_shingles, 0) > 0 THEN
             floor(CAST(n_unique AS DOUBLE) / CAST(n_shingles AS DOUBLE)
               * 10000 + 0.5) / 10000.0
           END AS novelty
         FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""",
    // nfc_normalize (UAX #15, same normal form as java.text.Normalizer)
    // + the identical RE2/Java control character class
    "x105_nfc_clean" ->
      """WITH aug AS (SELECT doc_id,
           text || ' caf' || 'e' || chr(769) || chr(7) AS t
           FROM documents),
         c AS (SELECT doc_id, t,
             regexp_replace(nfc_normalize(t),
               '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS clean_text
           FROM aug)
         SELECT doc_id, clean_text,
           CAST(CASE WHEN clean_text <> t THEN 1 ELSE 0 END AS INTEGER)
             AS changed
         FROM c""",
    // p and q are exact long/long divisions over the SAME top-200 term
    // set; ln rounded at 1e-4 (the x25 shim), each p*ln term rounded,
    // per-source sum in exact DECIMAL — order-free on both engines
    "x106_source_drift" ->
      """WITH toks AS (SELECT source,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         tf AS (SELECT source, u.term AS term,
             CAST(count(*) AS BIGINT) AS tf
           FROM toks, unnest(t) AS u(term) GROUP BY 1, 2),
         vocab AS (SELECT term, CAST(sum(tf) AS BIGINT) AS corpus_tf
           FROM tf GROUP BY 1
           ORDER BY corpus_tf DESC, term LIMIT 200),
         ct AS (SELECT CAST(sum(corpus_tf) AS DOUBLE) AS corpus_total
           FROM vocab),
         st AS (SELECT source, tf.term AS term, tf AS src_tf, corpus_tf
           FROM tf JOIN vocab USING (term)),
         tot AS (SELECT source, CAST(sum(src_tf) AS BIGINT) AS src_total
           FROM st GROUP BY 1),
         contrib AS (SELECT st.source,
             floor((CAST(src_tf AS DOUBLE) / CAST(src_total AS DOUBLE))
                 * (floor(ln((CAST(src_tf AS DOUBLE)
                       / CAST(src_total AS DOUBLE))
                     / (CAST(corpus_tf AS DOUBLE) / corpus_total))
                     * 10000 + 0.5) / 10000.0)
               * 10000 + 0.5) / 10000.0 AS c
           FROM st JOIN tot USING (source) CROSS JOIN ct),
         drift AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
             CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE)
               AS kl_divergence
           FROM contrib GROUP BY 1)
         SELECT d.source,
           CAST(coalesce(n_terms, 0) AS BIGINT) AS n_terms,
           kl_divergence
         FROM (SELECT DISTINCT source FROM documents) d
         LEFT JOIN drift USING (source)""",
    // the x97 component chain (same k=3/0.5 graph), then per-source
    // rollup of non-rep (duplicated) docs and their x13 whitespace
    // token mass; dup_frac = exact long/long division rounded at 1e-4
    "x108_source_duplication" ->
      s"""WITH RECURSIVE $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT d1, d2 FROM inter
           JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
           UNION SELECT d2, d1 FROM pairs),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1),
         reps AS (SELECT d.doc_id, d.source,
             CAST(len(string_split_regex(lower(trim(d.text)), '\\s+'))
               AS BIGINT) AS n_tokens,
             coalesce(c.rep, d.doc_id) AS rep
           FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rep <> doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN rep <> doc_id THEN n_tokens ELSE 0 END)
             AS BIGINT) AS dup_tokens,
           CASE WHEN sum(n_tokens) > 0 THEN
             floor(CAST(sum(CASE WHEN rep <> doc_id THEN n_tokens ELSE 0 END)
                 AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE) * 10000 + 0.5)
               / 10000.0
           ELSE 0.0 END AS dup_frac
         FROM reps GROUP BY 1""",
    // the x8 pair CTE (same k=3/0.5 graph as x97/x108), pair endpoints
    // stamped with their sources, folded to the unordered source matrix
    "x109_cross_source_dups" ->
      s"""WITH $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT d1, d2 FROM inter
           JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.5)
         SELECT least(s1.source, s2.source) AS source_a,
           greatest(s1.source, s2.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
         FROM pairs JOIN documents s1 ON d1 = s1.doc_id
         JOIN documents s2 ON d2 = s2.doc_id
         GROUP BY 1, 2""",
    // ln(rank)/ln(freq) rounded at 1e-4, products rounded, regression
    // sums in exact DECIMAL (order-free), closed-form fit IEEE-exact
    // on those sums, outputs rounded — mirrored term by term
    "x111_zipf_audit" ->
      """WITH toks AS (SELECT
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         tf AS (SELECT u.term AS term, CAST(count(*) AS BIGINT) AS freq
           FROM toks, unnest(t) AS u(term) GROUP BY 1),
         top AS (SELECT term, freq FROM tf
           ORDER BY freq DESC, term LIMIT 200),
         ranked AS (SELECT freq,
             CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT)
               AS r
           FROM top),
         pts AS (SELECT
             floor(ln(CAST(r AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS x,
             floor(ln(CAST(freq AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS y
           FROM ranked),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(floor(x * x * 10000 + 0.5) / 10000.0
               AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(floor(x * y * 10000 + 0.5) / 10000.0
               AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(floor(y * y * 10000 + 0.5) / 10000.0
               AS DECIMAL(38,6))) AS DOUBLE) AS syy
           FROM pts)
         SELECT CAST(n AS BIGINT) AS n_terms,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
               * 10000 + 0.5) / 10000.0 END AS slope,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             floor((sy * sxx - sx * sxy) / (n * sxx - sx * sx)
               * 10000 + 0.5) / 10000.0 END AS intercept,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             floor((n * sxy - sx * sy) * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy))
               * 10000 + 0.5) / 10000.0 END AS r2
         FROM s""",
    // bucket = exact binary digit count (bin() emits no leading
    // zeros, same as Spark's conv(n, 10, 2)) — integer law, no
    // floating log2 boundary risk
    "x112_length_histogram" ->
      """WITH t AS (SELECT source,
           CAST(len(string_split_regex(lower(trim(text)), '\s+'))
             AS BIGINT) AS nt
           FROM documents)
         SELECT source,
           CAST(CASE WHEN nt > 0 THEN length(bin(nt)) ELSE 0 END
             AS BIGINT) AS len_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS sum_tokens
         FROM t GROUP BY 1, 2""",
    // shares are exact long/long divisions; each -p*ln(p) term rounded
    // at 1e-4 with the inner ln pre-rounded; sum in exact DECIMAL;
    // balance divides by the rounded ln(#sources)
    "x113_mix_entropy" ->
      """WITH t AS (SELECT source,
           CAST(len(string_split_regex(lower(trim(text)), '\s+'))
             AS BIGINT) AS nt
           FROM documents),
         ps AS (SELECT source, CAST(sum(nt) AS BIGINT) AS src_tokens
           FROM t GROUP BY 1),
         tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens
           FROM ps),
         terms AS (SELECT src_tokens, total_tokens,
             CASE WHEN src_tokens > 0 THEN
               floor(-(CAST(src_tokens AS DOUBLE)
                   / CAST(total_tokens AS DOUBLE))
                 * (floor(ln(CAST(src_tokens AS DOUBLE)
                     / CAST(total_tokens AS DOUBLE)) * 10000 + 0.5)
                   / 10000.0)
                 * 10000 + 0.5) / 10000.0
             ELSE 0.0 END AS e
           FROM ps CROSS JOIN tot)
         SELECT CAST(count(*) AS BIGINT) AS n_sources,
           CAST(max(total_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(e AS DECIMAL(38,6))) AS DOUBLE) AS entropy,
           CASE WHEN count(*) > 1 THEN
             floor(CAST(SUM(CAST(e AS DECIMAL(38,6))) AS DOUBLE)
               / (floor(ln(CAST(count(*) AS DOUBLE)) * 10000 + 0.5)
                 / 10000.0)
               * 10000 + 0.5) / 10000.0 END AS balance
         FROM terms""",
    // the x103 quality CTE verbatim, ASCENDING rank, target rank =
    // ceil(q·N) in the same IEEE double product both engines compute
    "x114_score_quantiles" ->
      """WITH qs AS (SELECT doc_id,
           floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS quality_score
           FROM documents),
         r AS (SELECT doc_id, quality_score,
             CAST(row_number() OVER (ORDER BY quality_score, doc_id)
               AS BIGINT) AS rank,
             CAST(count(*) OVER () AS BIGINT) AS n
           FROM qs)
         SELECT CAST(q.quantile AS DOUBLE) AS quantile, r.rank,
           r.doc_id, r.quality_score
         FROM r JOIN (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.25 AS DOUBLE)),
             (CAST(0.5 AS DOUBLE)), (CAST(0.75 AS DOUBLE)),
             (CAST(0.9 AS DOUBLE))) AS q(quantile)
           ON r.rank = CAST(ceil(q.quantile * r.n) AS BIGINT)""",
    // x1's keep rule (min doc_id per sha256 group) + the x13 token
    // kernel, rolled up per source — the exact-tier twin of x108
    "x115_exact_dup_savings" ->
      """WITH t AS (SELECT doc_id, source,
           CAST(len(string_split_regex(lower(trim(text)), '\s+'))
             AS BIGINT) AS nt,
           sha256(lower(trim(text))) AS h
           FROM documents),
         k AS (SELECT doc_id, source, nt,
             min(doc_id) OVER (PARTITION BY h) AS keep
           FROM t)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id <> keep THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dup_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN doc_id <> keep THEN nt ELSE 0 END)
             AS BIGINT) AS dup_tokens,
           CASE WHEN sum(nt) > 0 THEN
             floor(CAST(sum(CASE WHEN doc_id <> keep THEN nt ELSE 0 END)
                 AS DOUBLE) / CAST(sum(nt) AS DOUBLE) * 10000 + 0.5)
               / 10000.0
           ELSE 0.0 END AS dup_frac
         FROM k GROUP BY 1""",
    // x108's component walk + the x12 quality expression; the keeper
    // is the per-component (quality desc, doc_id) argmax
    "x116_quality_reps" ->
      s"""WITH RECURSIVE $duckShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (SELECT d1, d2 FROM inter
           JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
           UNION SELECT d2, d1 FROM pairs),
         walk(node, reach) AS (
           SELECT a, a FROM edges
           UNION
           SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1),
         q AS (SELECT doc_id,
           floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS qs
           FROM documents),
         best AS (SELECT component, doc_id AS rep_doc FROM (
             SELECT c.rep AS component, q.doc_id,
               row_number() OVER (PARTITION BY c.rep
                 ORDER BY q.qs DESC, q.doc_id) AS rn
             FROM comp c JOIN q ON c.node = q.doc_id) WHERE rn = 1)
         SELECT d.doc_id, coalesce(b.rep_doc, d.doc_id) AS cluster_rep
         FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
         LEFT JOIN best b ON c.rep = b.component""",
    // √mass weights rounded at 1e-4, normalized by their exact DECIMAL
    // total, every downstream ratio re-rounded — mirrored term by term
    "x117_mixture_plan" ->
      """WITH m AS (SELECT source,
           CAST(sum(len(string_split_regex(lower(trim(text)), '\s+')))
             AS BIGINT) AS src_tokens
           FROM documents GROUP BY 1),
         w AS (SELECT source, src_tokens,
           floor(sqrt(CAST(src_tokens AS DOUBLE)) * 10000 + 0.5) / 10000.0
             AS wr FROM m),
         n AS (SELECT source, src_tokens, wr,
           CAST(sum(CAST(wr AS DECIMAL(38,6))) OVER () AS DOUBLE) AS wtot
           FROM w),
         p AS (SELECT source, src_tokens,
           floor(wr / wtot * 10000 + 0.5) / 10000.0 AS weight FROM n),
         tg AS (SELECT source, src_tokens, weight,
           CAST(floor(500000.0 * weight + 0.5) AS BIGINT) AS target_tokens
           FROM p),
         pl AS (SELECT source, src_tokens, weight, target_tokens,
           least(target_tokens, src_tokens) AS planned_tokens FROM tg)
         SELECT source, src_tokens, weight, target_tokens, planned_tokens,
           CASE WHEN src_tokens > 0 THEN
             floor(CAST(planned_tokens AS DOUBLE)
               / CAST(src_tokens AS DOUBLE) * 10000 + 0.5) / 10000.0
           ELSE 0.0 END AS sample_rate,
           target_tokens - planned_tokens AS deficit_tokens
         FROM pl""",
    // x60's augmentation + sequential count-then-redact chain, rolled
    // up per source
    "x118_pii_rate" ->
      """WITH aug AS (SELECT doc_id, source,
           text || ' reach doc' || CAST(doc_id AS VARCHAR)
             || '@mail.example.com'
             || CASE WHEN doc_id % 2 = 0 THEN ' tel 555-123-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
             || CASE WHEN doc_id % 3 <> 0 THEN ' from 10.'
                  || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                  || CAST(doc_id % 250 AS VARCHAR)
                ELSE '' END AS t0
           FROM documents),
         e AS (SELECT doc_id, source,
           CAST(len(regexp_extract_all(t0,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS ne,
           regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t1 FROM aug),
         p AS (SELECT doc_id, source, ne,
           CAST(len(regexp_extract_all(t1,
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT) AS np,
           regexp_replace(t1, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}',
             '<PHONE>', 'g') AS t2 FROM e),
         i AS (SELECT doc_id, source, ne, np,
           CAST(len(regexp_extract_all(t2,
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT)
             AS ni FROM p)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           CAST(sum(ne) AS BIGINT) AS n_emails,
           CAST(sum(np) AS BIGINT) AS n_phones,
           CAST(sum(ni) AS BIGINT) AS n_ips,
           floor(CAST(sum(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
             / 10000.0 AS pii_doc_rate
         FROM i GROUP BY 1""",
    // the x114 threshold row (rank = ceil(0.25·N) under score asc, id)
    // cross-joined back as the gate bar; ties at the bar all survive
    "x119_calibrated_gate" ->
      """WITH qs AS (SELECT doc_id,
           floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS quality_score
           FROM documents),
         r AS (SELECT doc_id, quality_score,
             CAST(row_number() OVER (ORDER BY quality_score, doc_id)
               AS BIGINT) AS rank,
             CAST(count(*) OVER () AS BIGINT) AS n
           FROM qs),
         thr AS (SELECT quality_score AS threshold FROM r
           WHERE rank = CAST(ceil(0.25 * n) AS BIGINT))
         SELECT q.doc_id, q.quality_score, t.threshold
         FROM qs q CROSS JOIN thr t
         WHERE q.quality_score >= t.threshold""",
    // the PQ training chain mirrored per subspace (integer-exact L2 on
    // the 1e-6 grid), then per-subspace argmin encode
    "x120_pq_codes" -> pqEncodeOracle(m = 4, k = 8, rounds = 2,
      subDim = 16),
    // same chain + encode, then ADC: per-pair sum of the m subspace
    // integer distances, ranked (adc asc, neighbor_id)
    "x121_pq_topk" -> pqTopKOracle(m = 4, k = 8, rounds = 2, subDim = 16,
      nQueries = 10, topK = 5),
    // per-subspace min over the candidate distances IS the assignment
    // distance; exact-long sums, op-for-op mirrored average
    "x122_pq_distortion" -> pqDistortionOracle(m = 4, k = 8, rounds = 2,
      subDim = 16),
    // x10's cosine bucket/probe CTEs + the PQ chain + ADC ranking
    // restricted to probed buckets
    "x123_ivf_pq_topk" -> ivfPqOracle(m = 4, k = 8, rounds = 2,
      subDim = 16, numCentroids = 16, nprobe = 2, nQueries = 10, topK = 5),
    // the x12 quality expression bucketed at 20 — same IEEE mul both
    // sides on the 1e-4-rounded score
    "x125_score_histogram" ->
      """WITH qs AS (SELECT doc_id,
           CAST(len(string_split_regex(lower(trim(text)), '\s+'))
             AS BIGINT) AS nt,
           floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS q
           FROM documents)
         SELECT CAST(floor(q * 20.0) AS INTEGER) AS score_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS sum_tokens
         FROM qs GROUP BY 1""",
    // x103's rank + phase arithmetic (the oracle may sort globally; the
    // Spark plan must not), joined to source + token mass
    "x126_phase_source_matrix" ->
      """WITH qs AS (SELECT doc_id,
           floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS q
           FROM documents),
         r AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY q DESC, doc_id) AS BIGINT)
               AS rank,
             count(*) OVER () AS n
           FROM qs),
         p AS (SELECT doc_id,
             CAST(floor((rank - 1) * 4.0 / n) AS INTEGER) AS phase
           FROM r),
         s AS (SELECT doc_id, source,
             CAST(len(string_split_regex(lower(trim(text)), '\s+'))
               AS BIGINT) AS nt
           FROM documents)
         SELECT p.phase, s.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS sum_tokens
         FROM p JOIN s USING (doc_id) GROUP BY 1, 2""",
    "x128_ann_recall" -> annRecallOracle(m = 4, rounds = 2, subDim = 16,
      numCentroids = 16, nprobe = 2, nQueries = 10, kIvf = 3, kPq = 5),
    "x129_pq_sample_distortion" -> pqDistortionOracle(m = 4, k = 8,
      rounds = 2, subDim = 16, trainCond = pqTrainCond(50)),
    "x130_pq_rerank_topk" -> pqRerankOracle(m = 4, rounds = 2,
      subDim = 16, nQueries = 10, topK = 5, shortlist = 50),
    "x131_rerank_recall" -> rerankRecallOracle(m = 4, rounds = 2,
      subDim = 16, nQueries = 10, kPq = 5, shortlist = 50),
    // presence via the join KEY (never the digest — NULL text digests
    // to NULL while the row is present); IS NOT DISTINCT FROM mirrors
    // Spark's null-safe <=>
    "x133_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, sha256(lower(trim(text))) AS d1
           FROM documents WHERE doc_id % 3 <> 0),
         v2 AS (SELECT doc_id, sha256(lower(trim(
             CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
                  ELSE text END))) AS d2
           FROM documents WHERE doc_id % 2 <> 0)
         SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN d1 IS NOT DISTINCT FROM d2 THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""",
    // x3's oracle over the 16-component prefix (slice is 1-based,
    // inclusive on both engines; norms over the SLICED vector)
    "x132_truncated_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 10),
         scored AS (SELECT query_id, vec_id AS neighbor_id,
             ${duckCosN("qv", "embedding", 16)} AS sim
           FROM embeddings, q WHERE vec_id <> query_id)
         SELECT query_id, neighbor_id,
           CAST(row_number() OVER w AS BIGINT) AS rank,
           floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
         FROM scored
         WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
         QUALIFY row_number() OVER w <= 5""",
    // hybrid fusion: each leg's reciprocal 1/(60 + rank) rounded 1e-6,
    // the two-term sum rounded 1e-6 (identical IEEE adds both engines —
    // no accumulation order in a two-term sum), NULL leg-rank -> 0
    "x135_hybrid_rrf" ->
      s"""WITH ${hybridLegsCtes(10, 10, 10, 2, 16)},
         fused AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
             coalesce(l.doc_id, v.neighbor_id) AS doc_id,
             l.lex_rank, v.vec_rank
           FROM lex l FULL OUTER JOIN vec v
             ON l.query_id = v.query_id AND l.doc_id = v.neighbor_id),
         rrf AS (SELECT query_id, doc_id, lex_rank, vec_rank,
             floor((coalesce(floor(1.0 / (60.0 + lex_rank)
                      * 1000000 + 0.5) / 1000000.0, 0.0)
                  + coalesce(floor(1.0 / (60.0 + vec_rank)
                      * 1000000 + 0.5) / 1000000.0, 0.0))
               * 1000000 + 0.5) / 1000000.0 AS rrf_score
           FROM fused)
         SELECT query_id, doc_id, lex_rank, vec_rank,
           CAST(row_number() OVER wf AS BIGINT) AS fused_rank, rrf_score
         FROM rrf
         WINDOW wf AS (PARTITION BY query_id
           ORDER BY rrf_score DESC, doc_id)
         QUALIFY row_number() OVER wf <= 10""",
    // dense hits absent from the lexical top-k, re-ranked by the 1e-6
    // rounded similarity (the ordering both engines share)
    "x136_hard_negatives" ->
      s"""WITH ${hybridLegsCtes(10, 10, 10, 2, 16)}
         SELECT query_id, neighbor_id,
           CAST(row_number() OVER wn AS BIGINT) AS neg_rank, similarity
         FROM vec v
         WHERE NOT EXISTS (SELECT 1 FROM lex l
           WHERE l.query_id = v.query_id AND l.doc_id = v.neighbor_id)
         WINDOW wn AS (PARTITION BY query_id
           ORDER BY similarity DESC, neighbor_id)
         QUALIFY row_number() OVER wn <= 5""",
    // x136's negatives joined to the lexical top-1 positive; queries
    // without a lexical hit produce no triplet (inner join)
    "x137_contrastive_triplets" ->
      s"""WITH ${hybridLegsCtes(10, 10, 10, 2, 16)},
         negs AS (SELECT query_id, neighbor_id,
             CAST(row_number() OVER wn AS BIGINT) AS neg_rank, similarity
           FROM vec v
           WHERE NOT EXISTS (SELECT 1 FROM lex l
             WHERE l.query_id = v.query_id AND l.doc_id = v.neighbor_id)
           WINDOW wn AS (PARTITION BY query_id
             ORDER BY similarity DESC, neighbor_id)
           QUALIFY row_number() OVER wn <= 5),
         pos AS (SELECT query_id, doc_id AS pos_id FROM lex
           WHERE lex_rank = 1)
         SELECT query_id, pos_id, neighbor_id AS neg_id, neg_rank,
           similarity
         FROM negs JOIN pos USING (query_id)""",
    // exact integer counts; the one division performed identically in
    // both engines, rounded 1e-6
    "x138_fusion_overlap" ->
      s"""WITH ${hybridLegsCtes(10, 10, 10, 2, 16)},
         m AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
             CASE WHEN l.doc_id IS NOT NULL THEN 1 END AS in_lex,
             CASE WHEN v.neighbor_id IS NOT NULL THEN 1 END AS in_vec
           FROM lex l FULL OUTER JOIN vec v
             ON l.query_id = v.query_id AND l.doc_id = v.neighbor_id)
         SELECT query_id, CAST(count(in_lex) AS BIGINT) AS n_lex,
           CAST(count(in_vec) AS BIGINT) AS n_vec,
           CAST(count(CASE WHEN in_lex IS NOT NULL
             AND in_vec IS NOT NULL THEN 1 END) AS BIGINT) AS n_both,
           floor(CAST(count(CASE WHEN in_lex IS NOT NULL
                 AND in_vec IS NOT NULL THEN 1 END) AS DOUBLE)
               / CAST(count(in_lex) + count(in_vec)
                 - count(CASE WHEN in_lex IS NOT NULL
                     AND in_vec IS NOT NULL THEN 1 END) AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS jaccard
         FROM m GROUP BY 1""",
    "x139_expansion_terms" ->
      s"""WITH ${prfCtes(10, 5, 5)}
         SELECT query_id, term, fb_df, fb_tf, rank, score FROM exp""",
    // round 2 re-scores over the UNION bag (UNION dedups; the Spark
    // side's expansion terms are anti-joined so the union is disjoint
    // anyway); df for the bag terms from the corpus doc-term grid —
    // the same value the pruned-postings df computes
    "x140_prf_retrieval" ->
      s"""WITH ${prfCtes(10, 5, 5)},
         bag AS (SELECT query_id, term FROM qt
           UNION SELECT query_id, term FROM exp),
         bdf AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM dtAll
           WHERE term IN (SELECT DISTINCT term FROM bag) GROUP BY 1),
         contrib2 AS (SELECT b.query_id, d.doc_id,
             floor((floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                      * 10000 + 0.5) / 10000.0)
                 * (floor(d.tf * (1.2 + 1.0)
                      / (d.tf + 1.2 * ((1.0 - 0.75)
                          + 0.75 * dl / avgdl))
                      * 10000 + 0.5) / 10000.0)
               * 10000 + 0.5) / 10000.0 AS c
           FROM bag b JOIN dtAll d USING (term)
             JOIN lens ON d.doc_id = lens.doc_id
             JOIN bdf USING (term) CROSS JOIN stats
           WHERE d.doc_id <> b.query_id),
         lexs2 AS (SELECT query_id, doc_id,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) AS score
           FROM contrib2 GROUP BY 1, 2)
         SELECT query_id, doc_id, n_terms,
           CAST(row_number() OVER w2 AS BIGINT) AS rank, score
         FROM lexs2
         WINDOW w2 AS (PARTITION BY query_id ORDER BY score DESC, doc_id)
         QUALIFY row_number() OVER w2 <= 10""",
    "x141_ranking_quality" -> rankingQualityOracle(m = 4, rounds = 2,
      subDim = 16, nQueries = 10, kPq = 5, shortlist = 50),
    // the x10 chain with the cell id kept on each scored row, a
    // per-(query, cell) cap window, then the usual top-k re-rank
    "x142_diversified_topk" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id < 16),
         corp AS (SELECT vec_id AS neighbor_id, embedding AS cv
           FROM embeddings),
         assigned AS (SELECT neighbor_id, cv, centroid_id FROM (
           SELECT neighbor_id, cv, centroid_id, row_number() OVER
             (PARTITION BY neighbor_id
              ORDER BY ${duckCos("cv", "centv")} DESC, centroid_id) AS arn
           FROM corp, cent) WHERE arn = 1),
         q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 10),
         probes AS (SELECT query_id, qv, centroid_id FROM (
           SELECT query_id, qv, centroid_id, row_number() OVER
             (PARTITION BY query_id
              ORDER BY ${duckCos("qv", "centv")} DESC, centroid_id) AS prn
           FROM q, cent) WHERE prn <= 2),
         scored AS (SELECT query_id, neighbor_id, centroid_id,
             ${duckCos("qv", "cv")} AS sim
           FROM assigned JOIN probes USING (centroid_id)
           WHERE query_id <> neighbor_id),
         capped AS (SELECT query_id, neighbor_id, centroid_id, sim FROM (
           SELECT query_id, neighbor_id, centroid_id, sim, row_number()
             OVER (PARTITION BY query_id, centroid_id
               ORDER BY sim DESC, neighbor_id) AS crn
           FROM scored) WHERE crn <= 3)
         SELECT query_id, neighbor_id, centroid_id,
           CAST(row_number() OVER w AS BIGINT) AS rank,
           floor(sim * 1000000 + 0.5) / 1000000.0 AS similarity
         FROM capped
         WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
         QUALIFY row_number() OVER w <= 5""",
    // the oracle states as-of declaratively (theta-join + per-left
    // argmax with the identical (ts desc, id desc) tie order); the
    // Spark side is the linear merge scan — same rows by construction
    "x143_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         r AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'click'),
         m AS (SELECT l.event_id, l.user_id, l.ts,
             r.event_id AS prior_event_id, r.ts AS prior_ts,
             r.value AS prior_value,
             row_number() OVER (PARTITION BY l.event_id
               ORDER BY r.ts DESC, r.event_id DESC) AS rn
           FROM l LEFT JOIN r
             ON l.user_id = r.user_id AND r.ts <= l.ts)
         SELECT event_id, user_id, ts, prior_event_id, prior_ts,
           prior_value,
           CASE WHEN prior_ts IS NOT NULL
             THEN epoch_ms(ts) - epoch_ms(prior_ts) END AS gap_ms
         FROM m WHERE rn = 1""",
    "x144_range_join" ->
      """WITH l AS (SELECT event_id, ts FROM events
           WHERE event_type = 'purchase'),
         r AS (SELECT ts, floor(value * 10000 + 0.5) / 10000.0 AS rv
           FROM events WHERE event_type = 'click')
         SELECT l.event_id,
           CAST(count(r.ts) AS BIGINT) AS n_near,
           CAST(SUM(CAST(r.rv AS DECIMAL(38,6))) AS DOUBLE) AS v_sum
         FROM l LEFT JOIN r
           ON abs(epoch_ms(l.ts) - epoch_ms(r.ts)) <= 3600000
         GROUP BY 1""",
    "x145_mmr_rerank" -> mmrOracle(numCentroids = 16, nprobe = 2,
      nQueries = 10, candK = 20, k = 5, lambda = 0.7),
    // x86's LM chain verbatim, then per-language rank (avg_logprob
    // DESC, doc_id — the Spark tie law) and exact integer tercile
    // boundaries ceil(n·i/3) = (n·i + 2) // 3 (remainder to the first
    // buckets, SQL NTILE's law; Spark computes the same value via an
    // exact double floor-division — see ccnetBuckets). Docs with < 2
    // tokens have no bigrams and drop out of lm, hence of the ranking.
    "x146_ccnet_buckets" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         p AS (SELECT doc_id, t[g.i] AS w1, t[g.i + 1] AS w2
           FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)),
         dp AS (SELECT doc_id, w1, w2, count(*) AS m
           FROM p GROUP BY ALL),
         bi AS (SELECT w1, w2, count(*) AS cb FROM p GROUP BY ALL),
         uni AS (SELECT w AS w1, count(*) AS cu
           FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
         v AS (SELECT count(*) AS vs FROM uni),
         lm AS (SELECT doc_id,
             floor(sum(CAST(m * (floor(ln(
                   (cb + 1.0) / (cu + vs)) * 10000 + 0.5) / 10000.0)
                 AS DECIMAL(38,6)))::DOUBLE
               / sum(m) * 10000 + 0.5) / 10000 AS avg_logprob
           FROM dp JOIN bi USING (w1, w2) JOIN uni USING (w1), v
           GROUP BY doc_id),
         j AS (SELECT d.doc_id, d.lang, l.avg_logprob
           FROM lm l JOIN documents d USING (doc_id)),
         r AS (SELECT doc_id, lang, avg_logprob,
             row_number() OVER (PARTITION BY lang
               ORDER BY avg_logprob DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n FROM j)
         SELECT doc_id, lang, avg_logprob, CAST(rk AS BIGINT) AS lm_rank,
           CAST(n AS BIGINT) AS n_lang,
           CASE WHEN rk <= (n + 2) // 3 THEN 'head'
                WHEN rk <= (n * 2 + 2) // 3 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM r""",
    // x119's quality chain + lang, per-LANGUAGE ascending rank, each
    // language's threshold at rank ceil(0.25·n_lang) (same double-ceil
    // law as x114/x119), gate on score >= that language's bar
    "x147_lang_calibrated_gate" ->
      """WITH qs AS (SELECT doc_id, lang,
           floor((0.4 * (CASE WHEN length(trim(text)) >= 100
               AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
           + 0.3 * greatest(0.0, 1.0 -
               ((length(trim(text)) - length(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                / length(trim(text))) * 5)
           + 0.3 * least(1.0,
               (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is',
                            'der','die','das','und','ist','ein','zu',
                            'el','la','de','que','y','en','un',
                            'le','et','les','des','une',
                            '的','是','了','在','和','有','我'))) * 1.0
                / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
           * 10000 + 0.5) / 10000.0 AS quality_score
           FROM documents),
         r AS (SELECT doc_id, lang, quality_score,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY quality_score, doc_id) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
           FROM qs),
         thr AS (SELECT lang, quality_score AS threshold FROM r
           WHERE rank = CAST(ceil(0.25 * n) AS BIGINT))
         SELECT q.doc_id, q.lang, q.quality_score, t.threshold
         FROM qs q JOIN thr t USING (lang)
         WHERE q.quality_score >= t.threshold""",
    // per-user (ts, event_id) order, null-safe change flags, running
    // version sum, collapse to runs, lead() for the validity end —
    // every window mirrored on Temporal.scd2's order
    "x148_scd2_dimension" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
           epoch_ms(ts) AS ms FROM events),
         f AS (SELECT user_id, event_id, event_type, ms,
             CASE WHEN event_type IS NOT DISTINCT FROM
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ms, event_id) THEN 0 ELSE 1 END AS chg
           FROM e),
         v AS (SELECT user_id, event_type, ms,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS UNBOUNDED PRECEDING) AS version
           FROM f),
         r AS (SELECT user_id, version, min(ms) AS valid_from_ms,
             min(event_type) AS event_type,
             CAST(count(*) AS BIGINT) AS n_events
           FROM v GROUP BY user_id, version),
         fin AS (SELECT user_id, version, event_type, valid_from_ms,
             lead(valid_from_ms) OVER (PARTITION BY user_id
               ORDER BY version) AS valid_to_ms, n_events
           FROM r)
         SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           valid_from_ms, valid_to_ms, valid_to_ms IS NULL AS is_current,
           n_events FROM fin""",
    // naive theta join in the oracle (semantics, not plan), the same
    // (cms, click_id) rank order, the U-shape CASE on integers, and
    // 0.2::DOUBLE/(n-2) as one IEEE divide — both engines then round
    // weight and credit on the 1e-6 grid
    "x149_multitouch" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id,
           epoch_ms(ts) AS pms,
           floor(value * 10000 + 0.5) / 10000.0 AS pv
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS click_id, user_id, epoch_ms(ts) AS cms
           FROM events WHERE event_type = 'click'),
         j AS (SELECT purchase_id, click_id, pv, cms
           FROM p JOIN c USING (user_id)
           WHERE pms - cms >= 0 AND pms - cms <= 7200000),
         r AS (SELECT purchase_id, click_id, pv,
             CAST(row_number() OVER (PARTITION BY purchase_id
               ORDER BY cms, click_id) AS BIGINT) AS touch_rank,
             CAST(count(*) OVER (PARTITION BY purchase_id)
               AS BIGINT) AS n_touches
           FROM j),
         w AS (SELECT purchase_id, click_id, touch_rank, n_touches, pv,
             floor((CASE WHEN n_touches = 1 THEN 1.0::DOUBLE
               WHEN n_touches = 2 THEN 0.5::DOUBLE
               WHEN touch_rank = 1 THEN 0.4::DOUBLE
               WHEN touch_rank = n_touches THEN 0.4::DOUBLE
               ELSE 0.2::DOUBLE / (n_touches - 2) END)
               * 1000000 + 0.5) / 1000000.0 AS weight
           FROM r)
         SELECT purchase_id, click_id, touch_rank, n_touches, weight,
           floor(pv * weight * 1000000 + 0.5) / 1000000.0 AS credit
         FROM w""",
    // x68's pair chain + unigram counts + 1-row totals; PMI is the
    // identical left-assoc double expression, ln on the 1e-4 grid
    "x150_pmi_collocations" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         p AS (SELECT t[g.i] AS w1, t[g.i + 1] AS w2
           FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)),
         bi AS (SELECT w1, w2, count(*) AS n_pair FROM p GROUP BY ALL),
         uni AS (SELECT w, count(*) AS cu
           FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
         tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM uni),
         nb AS (SELECT CAST(sum(n_pair) AS BIGINT) AS b FROM bi)
         SELECT w1, w2, n_pair,
           u1.cu AS n_w1, u2.cu AS n_w2,
           floor(ln((CAST(n_pair AS DOUBLE) * n * n)
             / (CAST(b AS DOUBLE) * u1.cu * u2.cu)) * 10000 + 0.5)
             / 10000.0 AS pmi
         FROM bi JOIN uni u1 ON bi.w1 = u1.w
           JOIN uni u2 ON bi.w2 = u2.w, tot, nb
         WHERE n_pair >= 5
         ORDER BY pmi DESC, w1, w2 LIMIT 50""",
    // frequency-ranked vocabulary, K-row running sum, coverage =
    // cum / ALL occurrences (not just the top-K cut), 1e-6
    "x151_vocab_coverage" ->
      """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         u AS (SELECT w AS term, count(*) AS n
           FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM u),
         top AS (SELECT term, n,
             CAST(row_number() OVER (ORDER BY n DESC, term)
               AS BIGINT) AS rank
           FROM u ORDER BY n DESC, term LIMIT 100),
         c AS (SELECT rank, term, n,
             CAST(sum(n) OVER (ORDER BY rank
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM top)
         SELECT rank, term, CAST(n AS BIGINT) AS n_occurrences,
           cum AS cum_occurrences,
           floor(CAST(cum AS DOUBLE) / n_total * 1000000 + 0.5)
             / 1000000.0 AS coverage
         FROM c, tot""",
    // exact integer epoch-week ((ms div 1d) div 7) — engine-neutral
    // week boundaries, no date_trunc conventions
    "x152_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
           (epoch_ms(ts) // 86400000) // 7 AS w FROM events),
         f AS (SELECT user_id, min(w) AS cw FROM a GROUP BY 1)
         SELECT cw AS cohort_week, w - cw AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM a JOIN f USING (user_id) GROUP BY 1, 2""",
    // the sequential at-or-after chain as three conditional-min CTEs;
    // stage counts are scalar subqueries
    "x153_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
           FROM events),
         s1 AS (SELECT user_id, min(ms) AS at FROM e
           WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.ms) AS at FROM e
           JOIN s1 ON e.user_id = s1.user_id AND e.ms >= s1.at
           WHERE e.event_type = 'click' GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.ms) AS at FROM e
           JOIN s2 ON e.user_id = s2.user_id AND e.ms >= s2.at
           WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT 'view' AS stage, CAST(1 AS BIGINT) AS stage_idx,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
         UNION ALL SELECT 'click', CAST(2 AS BIGINT),
           CAST((SELECT count(*) FROM s2) AS BIGINT)
         UNION ALL SELECT 'purchase', CAST(3 AS BIGINT),
           CAST((SELECT count(*) FROM s3) AS BIGINT)""",
    // per-user purchase aggregates (decimal-exact monetary), recency
    // from the stream's own latest purchase, then plain ntile() per
    // axis — the grouped bucketed rank's boundary law is exactly
    // NTILE's remainder-first law (the x146 argument), ties by user
    "x154_rfm_segments" ->
      """WITH p AS (SELECT user_id, epoch_ms(ts) AS ms,
           floor(value * 10000 + 0.5) / 10000.0 AS v
           FROM events WHERE event_type = 'purchase'),
         a AS (SELECT max(ms) AS asof_ms FROM p),
         b AS (SELECT user_id, max(ms) AS last_ms,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS monetary
           FROM p GROUP BY 1),
         m AS (SELECT user_id, asof_ms - last_ms AS recency_ms,
             frequency, monetary FROM b, a),
         s AS (SELECT user_id, recency_ms, frequency, monetary,
             CAST(6 - (ntile(5) OVER (ORDER BY recency_ms, user_id))
               AS INTEGER) AS r_score,
             CAST(6 - (ntile(5) OVER (ORDER BY frequency DESC, user_id))
               AS INTEGER) AS f_score,
             CAST(6 - (ntile(5) OVER (ORDER BY monetary DESC, user_id))
               AS INTEGER) AS m_score
           FROM m)
         SELECT user_id, recency_ms, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
         FROM s""",
    // x148's run chain, then each purchase picks the version with the
    // latest valid_from at-or-before its own timestamp (left join —
    // facts before the first version keep NULLs)
    "x155_dim_enrich" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
           epoch_ms(ts) AS ms FROM events),
         f AS (SELECT user_id, event_id, event_type, ms,
             CASE WHEN event_type IS NOT DISTINCT FROM
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ms, event_id) THEN 0 ELSE 1 END AS chg
           FROM e),
         v AS (SELECT user_id, event_type, ms,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS UNBOUNDED PRECEDING) AS version
           FROM f),
         runs AS (SELECT user_id, CAST(version AS BIGINT) AS version,
             min(ms) AS vfrom, min(event_type) AS event_type
           FROM v GROUP BY user_id, version),
         facts AS (SELECT event_id, user_id, ts, epoch_ms(ts) AS fms
           FROM events WHERE event_type = 'purchase'),
         m AS (SELECT fa.event_id, fa.user_id, fa.ts,
             r.version AS dim_version, r.event_type AS dim_event_type,
             row_number() OVER (PARTITION BY fa.event_id
               ORDER BY r.vfrom DESC) AS rn
           FROM facts fa LEFT JOIN runs r
             ON fa.user_id = r.user_id AND r.vfrom <= fa.fms)
         SELECT event_id, user_id, ts, dim_version, dim_event_type
         FROM m WHERE rn = 1""",
    // per-day ascending rank on the 1e-4-rounded value, the x114/x119
    // double-ceil cut law; quantile literals cast DOUBLE (DuckDB
    // decimal literals would diverge from Spark's binary doubles)
    "x156_daily_value_quantiles" ->
      """WITH p AS (SELECT event_id, epoch_ms(ts) // 86400000 AS day,
           floor(value * 10000 + 0.5) / 10000.0 AS value
           FROM events WHERE event_type = 'purchase'),
         r AS (SELECT event_id, day, value,
             CAST(row_number() OVER (PARTITION BY day
               ORDER BY value, event_id) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY day) AS BIGINT) AS n
           FROM p),
         q AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE,
           0.99::DOUBLE]) AS quantile)
         SELECT day, quantile, rank, event_id, value
         FROM r JOIN q ON rank = CAST(ceil(quantile * n) AS BIGINT)""",
    // GROUP BY ROLLUP with GROUPING() sums (engine-portable level
    // indicator); rolled-up dims coalesce to 'ALL' (dims never null)
    "x157_rollup_revenue" ->
      """WITH j AS (SELECT n_name AS nat,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           floor(o_totalprice * 10000 + 0.5) / 10000.0 AS v
           FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey)
         SELECT coalesce(nat, 'ALL') AS nation,
           coalesce(CAST(yr AS VARCHAR), 'ALL') AS order_year,
           CAST(GROUPING(nat) + GROUPING(yr) AS INTEGER) AS grp_level,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS revenue
         FROM j GROUP BY ROLLUP(nat, yr)""",
    // the pivot as conditional decimal sums — empty cells NULL (both
    // engines' empty-SUM law)
    "x158_segment_pivot" ->
      """WITH j AS (SELECT
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           c_mktsegment AS seg,
           floor(o_totalprice * 10000 + 0.5) / 10000.0 AS v
           FROM orders JOIN customer ON o_custkey = c_custkey)
         SELECT order_year,
           CAST(sum(CASE WHEN seg = 'AUTOMOBILE'
             THEN CAST(v AS DECIMAL(38,6)) END) AS DOUBLE)
             AS automobile_rev,
           CAST(sum(CASE WHEN seg = 'BUILDING'
             THEN CAST(v AS DECIMAL(38,6)) END) AS DOUBLE)
             AS building_rev,
           CAST(sum(CASE WHEN seg = 'FURNITURE'
             THEN CAST(v AS DECIMAL(38,6)) END) AS DOUBLE)
             AS furniture_rev,
           CAST(sum(CASE WHEN seg = 'HOUSEHOLD'
             THEN CAST(v AS DECIMAL(38,6)) END) AS DOUBLE)
             AS household_rev,
           CAST(sum(CASE WHEN seg = 'MACHINERY'
             THEN CAST(v AS DECIMAL(38,6)) END) AS DOUBLE)
             AS machinery_rev
         FROM j GROUP BY 1""",
    // one aggregate row, unpivoted per column; timestamps profile as
    // epoch-ms doubles, strings as lexicographic min/max
    "x159_profile_card" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(l_orderkey) AS BIGINT) AS nn1,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nd1,
             CAST(min(l_orderkey) AS DOUBLE) AS mn1,
             CAST(max(l_orderkey) AS DOUBLE) AS mx1,
           CAST(count(l_partkey) AS BIGINT) AS nn2,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd2,
             CAST(min(l_partkey) AS DOUBLE) AS mn2,
             CAST(max(l_partkey) AS DOUBLE) AS mx2,
           CAST(count(l_suppkey) AS BIGINT) AS nn3,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd3,
             CAST(min(l_suppkey) AS DOUBLE) AS mn3,
             CAST(max(l_suppkey) AS DOUBLE) AS mx3,
           CAST(count(l_linenumber) AS BIGINT) AS nn4,
             CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd4,
             CAST(min(l_linenumber) AS DOUBLE) AS mn4,
             CAST(max(l_linenumber) AS DOUBLE) AS mx4,
           CAST(count(l_quantity) AS BIGINT) AS nn5,
             CAST(count(DISTINCT l_quantity) AS BIGINT) AS nd5,
             CAST(min(l_quantity) AS DOUBLE) AS mn5,
             CAST(max(l_quantity) AS DOUBLE) AS mx5,
           CAST(count(l_extendedprice) AS BIGINT) AS nn6,
             CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS nd6,
             CAST(min(l_extendedprice) AS DOUBLE) AS mn6,
             CAST(max(l_extendedprice) AS DOUBLE) AS mx6,
           CAST(count(l_discount) AS BIGINT) AS nn7,
             CAST(count(DISTINCT l_discount) AS BIGINT) AS nd7,
             CAST(min(l_discount) AS DOUBLE) AS mn7,
             CAST(max(l_discount) AS DOUBLE) AS mx7,
           CAST(count(l_tax) AS BIGINT) AS nn8,
             CAST(count(DISTINCT l_tax) AS BIGINT) AS nd8,
             CAST(min(l_tax) AS DOUBLE) AS mn8,
             CAST(max(l_tax) AS DOUBLE) AS mx8,
           CAST(count(l_returnflag) AS BIGINT) AS nn9,
             CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nd9,
             min(l_returnflag) AS mns9, max(l_returnflag) AS mxs9,
           CAST(count(l_linestatus) AS BIGINT) AS nn10,
             CAST(count(DISTINCT l_linestatus) AS BIGINT) AS nd10,
             min(l_linestatus) AS mns10, max(l_linestatus) AS mxs10,
           CAST(count(l_shipdate) AS BIGINT) AS nn11,
             CAST(count(DISTINCT l_shipdate) AS BIGINT) AS nd11,
             CAST(min(epoch_ms(l_shipdate)) AS DOUBLE) AS mn11,
             CAST(max(epoch_ms(l_shipdate)) AS DOUBLE) AS mx11
           FROM lineitem)
         SELECT 'l_orderkey' AS col_name, n_rows, n_rows - nn1 AS n_nulls,
           nd1 AS n_distinct, mn1 AS min_num, mx1 AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           FROM a
         UNION ALL SELECT 'l_partkey', n_rows, n_rows - nn2, nd2, mn2, mx2,
           NULL, NULL FROM a
         UNION ALL SELECT 'l_suppkey', n_rows, n_rows - nn3, nd3, mn3, mx3,
           NULL, NULL FROM a
         UNION ALL SELECT 'l_linenumber', n_rows, n_rows - nn4, nd4, mn4,
           mx4, NULL, NULL FROM a
         UNION ALL SELECT 'l_quantity', n_rows, n_rows - nn5, nd5, mn5, mx5,
           NULL, NULL FROM a
         UNION ALL SELECT 'l_extendedprice', n_rows, n_rows - nn6, nd6, mn6,
           mx6, NULL, NULL FROM a
         UNION ALL SELECT 'l_discount', n_rows, n_rows - nn7, nd7, mn7, mx7,
           NULL, NULL FROM a
         UNION ALL SELECT 'l_tax', n_rows, n_rows - nn8, nd8, mn8, mx8,
           NULL, NULL FROM a
         UNION ALL SELECT 'l_returnflag', n_rows, n_rows - nn9, nd9, NULL,
           NULL, mns9, mxs9 FROM a
         UNION ALL SELECT 'l_linestatus', n_rows, n_rows - nn10, nd10, NULL,
           NULL, mns10, mxs10 FROM a
         UNION ALL SELECT 'l_shipdate', n_rows, n_rows - nn11, nd11, mn11,
           mx11, NULL, NULL FROM a""",
    // skyline via per-size best + running max over strictly smaller
    // sizes — same collapse as the Spark plan, no pair join
    "x160_pareto_front" ->
      """WITH best AS (SELECT p_size AS sz, max(p_retailprice) AS best
           FROM part GROUP BY 1),
         f AS (SELECT sz, best, max(best) OVER (ORDER BY sz
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
           FROM best)
         SELECT p_partkey, p_size, p_retailprice
         FROM part JOIN f ON p_size = f.sz AND p_retailprice = f.best
         WHERE prev IS NULL OR best > prev""",
    // daily decimal sums then a RANGE window over the integer day key;
    // the decimal window sum casts back to double at the end
    "x161_rolling_revenue" ->
      """WITH d AS (SELECT n_name AS nation,
           epoch_ms(l_shipdate) // 86400000 AS day,
           floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
             / 10000.0 AS v
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey),
         g AS (SELECT nation, day,
             sum(CAST(v AS DECIMAL(38,6))) AS decv,
             CAST(count(*) AS BIGINT) AS n_items
           FROM d GROUP BY 1, 2)
         SELECT nation, day, n_items, CAST(decv AS DOUBLE) AS revenue,
           CAST(sum(decv) OVER (PARTITION BY nation ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rolling_rev,
           CAST(count(*) OVER (PARTITION BY nation ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS days_in_window
         FROM g""",
    // LAG over the yearly aggregate; growth on the 1e-6 grid, NULL on
    // each nation's first year
    "x162_yoy_growth" ->
      """WITH y AS (SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           floor(o_totalprice * 10000 + 0.5) / 10000.0 AS v
           FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey),
         g AS (SELECT nation, order_year,
             CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS revenue
           FROM y GROUP BY 1, 2),
         l AS (SELECT nation, order_year, revenue,
             lag(revenue) OVER (PARTITION BY nation ORDER BY order_year)
               AS prev_rev
           FROM g)
         SELECT nation, order_year, revenue, prev_rev,
           CASE WHEN prev_rev IS NOT NULL THEN
             floor((revenue - prev_rev) / prev_rev * 1000000 + 0.5)
               / 1000000.0 END AS yoy
         FROM l""",
    // the exact-integer 2σ law: (d·x − Σx)² > 4·(d·Σx² − (Σx)²), all
    // HUGEINT — no division, no sqrt, no float anywhere
    "x163_anomaly_days" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
           CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(n_events) AS BIGINT) AS sum_n,
             sum(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT))
               AS sum_n2
           FROM d GROUP BY 1)
         SELECT d.event_type, d.day, d.n_events, s.n_days,
           s.sum_n AS total_events
         FROM d JOIN s ON d.event_type = s.event_type
         WHERE (CAST(s.n_days AS HUGEINT) * d.n_events - s.sum_n)
             * (CAST(s.n_days AS HUGEINT) * d.n_events - s.sum_n)
           > 4 * (CAST(s.n_days AS HUGEINT) * s.sum_n2
             - CAST(s.sum_n AS HUGEINT) * s.sum_n)""",
    // distinct (order, brand) self-join under brand_a < brand_b;
    // supports/confidences/lifts from exact integer counts, one
    // grid-rounded division each
    "x164_brand_affinity" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS no
           FROM lineitem),
         bc AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM ob
           GROUP BY 1),
         p AS (SELECT a.b AS brand_a, r.b AS brand_b,
             CAST(count(*) AS BIGINT) AS n_co
           FROM ob a JOIN ob r ON a.o = r.o AND a.b < r.b
           GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT brand_a, brand_b, n_co, ca.c AS n_a, cb.c AS n_b,
           floor(CAST(n_co AS DOUBLE) / no * 1000000 + 0.5) / 1000000.0
             AS support,
           floor(CAST(n_co AS DOUBLE) / ca.c * 1000000 + 0.5) / 1000000.0
             AS confidence,
           floor(CAST(n_co AS DOUBLE) * no
             / (CAST(ca.c AS DOUBLE) * cb.c) * 1000000 + 0.5) / 1000000.0
             AS lift
         FROM p JOIN bc ca ON p.brand_a = ca.b
         JOIN bc cb ON p.brand_b = cb.b CROSS JOIN n""",
    // per-customer revenue in exact 1e-4 units, per-nation ascending
    // rank (ties by customer), HUGEINT rank-weighted sums, one final
    // grid-rounded ratio
    "x165_gini" ->
      """WITH pc AS (SELECT o_custkey AS id,
           CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
             AS BIGINT) AS rev
           FROM orders GROUP BY 1),
         j AS (SELECT pc.id, n_name AS nation, rev
           FROM pc JOIN customer ON id = c_custkey
           JOIN nation ON c_nationkey = n_nationkey),
         r AS (SELECT nation, id, rev,
             CAST(row_number() OVER (PARTITION BY nation
               ORDER BY rev, id) AS BIGINT) AS rank
           FROM j)
         SELECT nation, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(rev AS HUGEINT)) AS DOUBLE) / 10000.0
             AS revenue,
           floor((2.0 * CAST(sum(CAST(rank AS HUGEINT) * rev) AS DOUBLE)
               - CAST(count(*) + 1 AS DOUBLE)
                 * CAST(sum(CAST(rev AS HUGEINT)) AS DOUBLE))
             / (CAST(count(*) AS DOUBLE)
                 * CAST(sum(CAST(rev AS HUGEINT)) AS DOUBLE))
             * 1000000 + 0.5) / 1000000.0 AS gini
         FROM r GROUP BY nation""",
    // k smallest distinct 60-bit md5 hashes per group; estimate =
    // (k−1)·2⁶⁰/h₍ₖ₎, or the exact hash count if the sketch never
    // saturated; exact twin + relative error ride the same row
    "x166_kmv_distinct" ->
      """WITH v AS (SELECT DISTINCT l_returnflag AS grp,
           ('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
             ::BIGINT AS h
           FROM lineitem),
         r AS (SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
           FROM v),
         sk AS (SELECT grp, CAST(count(*) AS BIGINT) AS nk,
             max(h) AS kth_min
           FROM r WHERE rn <= 64 GROUP BY 1),
         ex AS (SELECT l_returnflag AS grp,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
           FROM lineitem GROUP BY 1),
         e AS (SELECT sk.grp, n_exact, kth_min,
             CASE WHEN nk < 64 THEN CAST(nk AS DOUBLE)
               ELSE floor(63.0 * 1152921504606846976.0 / kth_min
                 * 10000 + 0.5) / 10000.0 END AS estimate
           FROM sk JOIN ex ON sk.grp = ex.grp)
         SELECT grp AS l_returnflag, n_exact, kth_min, estimate,
           floor(abs(estimate - n_exact) / n_exact * 1000000 + 0.5)
             / 1000000.0 AS rel_err
         FROM e""",
    // OLS closed form on HUGEINT moment sums — the only float ops are
    // the two final mirrored divisions; degenerate spreads NULL
    "x167_revenue_trend" ->
      """WITH d AS (SELECT n_name AS nation,
           epoch_ms(l_shipdate) // 86400000 AS x,
           CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
             AS BIGINT) AS u
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey),
         g AS (SELECT nation, x, CAST(sum(u) AS BIGINT) AS y
           FROM d GROUP BY 1, 2),
         m AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_days,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM g GROUP BY 1),
         k AS (SELECT nation, n_days,
             n_days * sxy - sx * sy AS num,
             n_days * sxx - sx * sx AS dx,
             n_days * syy - sy * sy AS dy
           FROM m)
         SELECT nation, n_days,
           CASE WHEN dx > 0 THEN
             floor(CAST(num AS DOUBLE) / CAST(dx AS DOUBLE) / 10000.0
               * 1000000 + 0.5) / 1000000.0 END AS slope,
           CASE WHEN dx > 0 AND dy > 0 THEN
             floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
               / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))
               * 1000000 + 0.5) / 1000000.0 END AS r2
         FROM k""",
    // md5-grid variant split, >= minCount conversion bar, pooled z²
    // from four exact integers; degenerate pooled rate NULL
    "x168_ab_test" ->
      """WITH pu AS (SELECT user_id,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS k
           FROM events GROUP BY 1),
         v AS (SELECT CASE WHEN
             substring(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
             THEN 'A' ELSE 'B' END AS vr,
             CASE WHEN k >= 14 THEN 1 ELSE 0 END AS conv
           FROM pu),
         b AS (SELECT vr, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS c
           FROM v GROUP BY 1),
         o AS (SELECT max(CASE WHEN vr = 'A' THEN n END) AS n_a,
             max(CASE WHEN vr = 'A' THEN c END) AS conv_a,
             max(CASE WHEN vr = 'B' THEN n END) AS n_b,
             max(CASE WHEN vr = 'B' THEN c END) AS conv_b
           FROM b)
         SELECT n_a, conv_a, n_b, conv_b,
           floor(CAST(conv_a AS DOUBLE) / n_a * 1000000 + 0.5)
             / 1000000.0 AS rate_a,
           floor(CAST(conv_b AS DOUBLE) / n_b * 1000000 + 0.5)
             / 1000000.0 AS rate_b,
           CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
               AND conv_a + conv_b < n_a + n_b THEN
             floor((CAST(conv_a AS DOUBLE) / n_a
                 - CAST(conv_b AS DOUBLE) / n_b)
               * (CAST(conv_a AS DOUBLE) / n_a
                 - CAST(conv_b AS DOUBLE) / n_b)
               / ((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b))
               * 10000 + 0.5) / 10000.0 END AS z2
         FROM o""",
    // x153's at-or-after chain, per-transition deltas, the grouped
    // double-ceil quantile cut (ties by user)
    "x169_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
           FROM events),
         s1 AS (SELECT user_id, min(ms) AS at FROM e
           WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.ms) AS nat, min(s1.at) AS pat
           FROM e JOIN s1 ON e.user_id = s1.user_id AND e.ms >= s1.at
           WHERE e.event_type = 'click' GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.ms) AS nat, min(s2.nat) AS pat
           FROM e JOIN s2 ON e.user_id = s2.user_id AND e.ms >= s2.nat
           WHERE e.event_type = 'purchase' GROUP BY 1),
         d AS (SELECT user_id, 'view->click' AS transition,
             nat - pat AS delta_ms FROM s2
           UNION ALL SELECT user_id, 'click->purchase', nat - pat
           FROM s3),
         r AS (SELECT transition, user_id, delta_ms,
             CAST(row_number() OVER (PARTITION BY transition
               ORDER BY delta_ms, user_id) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY transition) AS BIGINT)
               AS n
           FROM d),
         q AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS quantile)
         SELECT transition, quantile, rank, user_id, delta_ms
         FROM r JOIN q ON rank = CAST(ceil(quantile * n) AS BIGINT)""",
    // exact integer contingency cells + margins over the FULL margin
    // grid (unobserved combos contribute (0−E)²/E); each term
    // mirrored then grid-rounded and decimal-summed (shuffle-order-
    // free) — the term-by-term float recipe
    "x170_chi_square" ->
      """WITH cells AS (SELECT c_mktsegment AS a, o_orderpriority AS b,
           CAST(count(*) AS BIGINT) AS o
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells
           GROUP BY 1),
         ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells
           GROUP BY 1),
         tt AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT a) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT b) AS BIGINT) AS n_cols
           FROM cells),
         grid AS (SELECT rt.a, ct.b, rt.r, ct.c,
             coalesce(cells.o, 0) AS obs
           FROM rt CROSS JOIN ct
           LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
         t AS (SELECT n, n_rows, n_cols,
             floor((CAST(obs AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
               * (CAST(obs AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
               / (CAST(r AS DOUBLE) * c / n) * 1000000 + 0.5)
               / 1000000.0 AS term
           FROM grid CROSS JOIN tt)
         SELECT n, n_rows, n_cols,
           (n_rows - 1) * (n_cols - 1) AS dof,
           CAST(sum(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS chi2
         FROM t GROUP BY 1, 2, 3, 4""",
    // exact (epoch_day+3) mod 7 weekday buckets; shares from HUGEINT
    // unit sums through one mirrored division
    "x171_weekday_seasonality" ->
      """WITH d AS (SELECT n_name AS nation,
           (epoch_ms(l_shipdate) // 86400000 + 3) % 7 AS day_of_week,
           CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
             AS BIGINT) AS u
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey),
         g AS (SELECT nation, day_of_week,
             CAST(count(*) AS BIGINT) AS n_items,
             sum(CAST(u AS HUGEINT)) AS du
           FROM d GROUP BY 1, 2),
         t AS (SELECT nation, sum(du) AS tu FROM g GROUP BY 1)
         SELECT g.nation, g.day_of_week, g.n_items,
           CAST(du AS DOUBLE) / 10000.0 AS revenue,
           floor(CAST(du AS DOUBLE) / CAST(tu AS DOUBLE) * 1000000
             + 0.5) / 1000000.0 AS share
         FROM g JOIN t ON g.nation = t.nation""",
    // the ceil-boundary decile law ((10·(rank−1)) // n + 1 — the
    // closed form of groupedNtileBuckets' rank ≤ ceil(n·i/10) cut;
    // NOT SQL ntile(), which packs remainder rows into the FIRST
    // buckets and only coincides when 10 | n); ties by customer;
    // cumulative HUGEINT unit sums
    "x172_lorenz_curve" ->
      """WITH pc AS (SELECT o_custkey AS id,
           CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
             AS BIGINT) AS rev
           FROM orders GROUP BY 1),
         j AS (SELECT id, n_name AS nation, rev
           FROM pc JOIN customer ON id = c_custkey
           JOIN nation ON c_nationkey = n_nationkey),
         b AS (SELECT nation, id, rev,
             CAST((10 * (row_number() OVER (PARTITION BY nation
                 ORDER BY rev, id) - 1))
               // (count(*) OVER (PARTITION BY nation)) + 1
               AS INTEGER) AS decile
           FROM j),
         g AS (SELECT nation, decile,
             CAST(count(*) AS BIGINT) AS n_customers,
             sum(CAST(rev AS HUGEINT)) AS du
           FROM b GROUP BY 1, 2),
         t AS (SELECT nation, sum(du) AS tu FROM g GROUP BY 1),
         c AS (SELECT nation, decile, n_customers, du,
             sum(du) OVER (PARTITION BY nation ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM g)
         SELECT c.nation, c.decile, c.n_customers,
           CAST(du AS DOUBLE) / 10000.0 AS revenue,
           floor(CAST(cum AS DOUBLE) / CAST(tu AS DOUBLE) * 1000000
             + 0.5) / 1000000.0 AS cum_share
         FROM c JOIN t ON c.nation = t.nation""",
    // per-nation exact quartile VALUES (double-ceil law, ties by
    // customer) on exact-unit revenue sums, Tukey fences through one
    // mirrored expression
    "x173_iqr_outliers" ->
      """WITH pc AS (SELECT o_custkey AS custkey,
           sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS du
           FROM orders GROUP BY 1),
         s AS (SELECT custkey, n_name AS nation,
             CAST(du AS DOUBLE) / 10000.0 AS v
           FROM pc JOIN customer ON custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey),
         r AS (SELECT nation, custkey, v,
             CAST(row_number() OVER (PARTITION BY nation
               ORDER BY v, custkey) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY nation) AS BIGINT) AS n
           FROM s),
         q AS (SELECT nation,
             max(CASE WHEN rank = CAST(ceil(0.25 * n) AS BIGINT)
               THEN v END) AS q1,
             max(CASE WHEN rank = CAST(ceil(0.75 * n) AS BIGINT)
               THEN v END) AS q3
           FROM r GROUP BY 1),
         f AS (SELECT nation, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
           FROM q)
         SELECT f.nation, s.custkey, s.v AS revenue, q1, q3,
           lo AS lo_fence, hi AS hi_fence
         FROM s JOIN f ON s.nation = f.nation
         WHERE s.v < lo OR s.v > hi""",
    // the x12 score CTE, gridded to integer units, then the x167
    // moment closed form per language; direction carries the sign
    "x174_quality_length_corr" ->
      """WITH qs AS (SELECT doc_id,
           CAST(length(trim(text)) AS BIGINT) AS x,
           CAST(floor(
             floor((0.4 * (CASE WHEN length(trim(text)) >= 100
                 AND length(trim(text)) <= 20000 THEN 1 ELSE 0 END)
             + 0.3 * greatest(0.0, 1.0 -
                 ((length(trim(text)) - length(regexp_replace(
                   lower(trim(text)), '[^a-z0-9 ]', '', 'g'))) * 1.0
                  / length(trim(text))) * 5)
             + 0.3 * least(1.0,
                 (len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   x -> x IN ('the','a','of','and','to','in','is',
                              'der','die','das','und','ist','ein','zu',
                              'el','la','de','que','y','en','un',
                              'le','et','les','des','une',
                              '的','是','了','在','和','有','我'))) * 1.0
                  / len(string_split_regex(lower(trim(text)), '\s+'))) * 5))
             * 10000 + 0.5) / 10000.0
             * 10000 + 0.5) AS BIGINT) AS y
           FROM documents),
         j AS (SELECT lang, x, y FROM qs
           JOIN documents USING (doc_id)),
         m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM j GROUP BY 1),
         k AS (SELECT lang, n, n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
           FROM m)
         SELECT lang, n,
           CASE WHEN dx > 0 AND dy > 0 THEN
             floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
               / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))
               * 1000000 + 0.5) / 1000000.0 END AS r2,
           CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
             ELSE 0 END AS INTEGER) AS direction
         FROM k""",
    // two grouped-median passes (count, then absolute deviation),
    // all-integer; flag |x − med| > 3·MAD in longs
    "x175_mad_anomaly_days" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
           CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2),
         r1 AS (SELECT event_type, day, n_events,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY n_events, day) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n
           FROM d),
         med AS (SELECT event_type, n_events AS med FROM r1
           WHERE rank = CAST(ceil(0.5 * n) AS BIGINT)),
         dev AS (SELECT d.event_type, d.day, d.n_events, med.med,
             abs(d.n_events - med.med) AS adev
           FROM d JOIN med ON d.event_type = med.event_type),
         r2 AS (SELECT event_type, day, adev,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY adev, day) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n
           FROM dev),
         mad AS (SELECT event_type, adev AS mad FROM r2
           WHERE rank = CAST(ceil(0.5 * n) AS BIGINT))
         SELECT dev.event_type, dev.day, dev.n_events,
           dev.med AS median, mad.mad
         FROM dev JOIN mad ON dev.event_type = mad.event_type
         WHERE dev.adev > 3 * mad.mad""",
    // one leg per FK edge: LEFT JOIN against the parent's distinct
    // keys, orphan = non-null child key with no parent; rate on the
    // 1e-6 grid
    "x176_ri_audit" -> {
      def leg(name: String, child: String, ck: String, parent: String,
              pk: String): String =
        s"""SELECT '$name' AS edge,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(*) - count($ck) AS BIGINT) AS n_null_keys,
            CAST(coalesce(sum(CASE WHEN $ck IS NOT NULL AND pk IS NULL
              THEN 1 END), 0) AS BIGINT) AS n_orphans,
            floor(CAST(coalesce(sum(CASE WHEN $ck IS NOT NULL
                AND pk IS NULL THEN 1 END), 0) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000.0
              AS orphan_rate
          FROM $child LEFT JOIN
            (SELECT DISTINCT $pk AS pk FROM $parent) p ON $ck = p.pk"""
      Seq(
        leg("lineitem.orderkey", "lineitem", "l_orderkey", "orders",
          "o_orderkey"),
        leg("lineitem.partkey", "lineitem", "l_partkey", "part",
          "p_partkey"),
        leg("lineitem.suppkey", "lineitem", "l_suppkey", "supplier",
          "s_suppkey"),
        leg("orders.custkey", "orders", "o_custkey", "customer",
          "c_custkey"),
        leg("customer.nationkey", "customer", "c_nationkey", "nation",
          "n_nationkey"),
        leg("supplier.nationkey", "supplier", "s_nationkey", "nation",
          "n_nationkey"),
        leg("nation.regionkey", "nation", "n_regionkey", "region",
          "r_regionkey")).mkString("\nUNION ALL\n")
    },
    // the merged state is directly expressible: inserts restore the
    // held-out keys, seq-2 updates (+2000, keys ≡ 0 mod 20) beat
    // seq-1 (+1000, keys ≡ 0 mod 10), deletes drop keys ≡ 1 mod 10
    "x177_cdc_apply" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 20 = 0 THEN o_totalprice + 2000.0
                WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 10 <> 1""",
    // full recompute from scratch — equality with the two-shard merge
    // IS the mergeability check
    "x178_rollup_merge" ->
      """SELECT o_orderpriority AS priority,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
             AS DOUBLE) / 10000.0 AS revenue,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
         FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2""",
    // per-user first-3 path via conditional max over row_number;
    // concat_ws skips NULLs in both engines (shorter paths for
    // shorter histories)
    "x179_user_journeys" ->
      """WITH r AS (SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
             ORDER BY epoch_ms(ts), event_id) AS rn
           FROM events),
         p AS (SELECT user_id,
             concat_ws('>',
               max(CASE WHEN rn = 1 THEN event_type END),
               max(CASE WHEN rn = 2 THEN event_type END),
               max(CASE WHEN rn = 3 THEN event_type END)) AS path
           FROM r WHERE rn <= 3 GROUP BY 1)
         SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p
         GROUP BY 1 ORDER BY n_users DESC, path LIMIT 50""",
    // md5-rank within stratum, ceil-boundary cuts on the SAME
    // cumulative literals (0.8/0.9) the Spark side uses
    "x180_split_manifest" ->
      """WITH r AS (SELECT doc_id, source,
           CAST(row_number() OVER (PARTITION BY source ORDER BY
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
             doc_id) AS BIGINT) AS rank,
           CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_group
           FROM documents)
         SELECT doc_id, source, rank, n_group,
           CASE WHEN rank <= CAST(ceil(0.8 * n_group) AS BIGINT)
                  THEN 'train'
                WHEN rank <= CAST(ceil(0.9 * n_group) AS BIGINT)
                  THEN 'val'
                ELSE 'test' END AS split
         FROM r""",
    // per-key counts, global rank by (count desc, key), share of the
    // FULL table on the 1e-6 grid
    "x181_key_skew" ->
      """WITH c AS (SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_rows
           FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         t AS (SELECT sum(n_rows) AS tot FROM c),
         r AS (SELECT l_partkey, n_rows,
             CAST(row_number() OVER (ORDER BY n_rows DESC, l_partkey)
               AS BIGINT) AS rank
           FROM c)
         SELECT r.l_partkey, r.n_rows, r.rank,
           floor(CAST(n_rows AS DOUBLE) / CAST(tot AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS share
         FROM r, t WHERE rank <= 20""",
    // full CMS mirror: row hash = md5("<d>:<key>") first-15-hex mod
    // width (positive, so % = pmod); estimate = min over depth rows
    "x182_cms_audit" ->
      """WITH k AS (SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_rows
           FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         b AS (SELECT l_partkey, n_rows, d,
             ('0x' || substring(md5(CAST(d AS VARCHAR) || ':' ||
               CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT % 1024
               AS bkt
           FROM k, (SELECT unnest([0, 1, 2]) AS d) ds),
         s AS (SELECT d, bkt, sum(n_rows) AS c FROM b GROUP BY 1, 2),
         r AS (SELECT l_partkey, n_rows,
             CAST(row_number() OVER (ORDER BY n_rows DESC, l_partkey)
               AS BIGINT) AS rank
           FROM k)
         SELECT r.l_partkey, r.n_rows, r.rank,
           CAST(min(s.c) AS BIGINT) AS cms_estimate
         FROM r JOIN b ON r.l_partkey = b.l_partkey
         JOIN s ON b.d = s.d AND b.bkt = s.bkt
         WHERE r.rank <= 20
         GROUP BY 1, 2, 3""",
    // first-seen day per user, then the running total over the
    // calendar-bounded day frame
    "x183_user_growth" ->
      """WITH f AS (SELECT user_id,
           min(epoch_ms(ts) // 86400000) AS first_day
           FROM events GROUP BY 1),
         d AS (SELECT first_day, CAST(count(*) AS BIGINT)
             AS n_new_users
           FROM f GROUP BY 1)
         SELECT first_day, n_new_users,
           CAST(sum(n_new_users) OVER (ORDER BY first_day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
         FROM d""",
    // ship-minus-order epoch days through the grouped double-ceil
    // quantile law (the x156 shape), ties by the composite line id
    "x184_fulfillment_lag" ->
      """WITH s AS (SELECT o_orderpriority AS priority,
           CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS line_id,
           CAST(epoch_ms(l_shipdate) // 86400000
             - epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS lag_days
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         r AS (SELECT priority, line_id, lag_days,
             CAST(row_number() OVER (PARTITION BY priority
               ORDER BY lag_days, line_id) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY priority) AS BIGINT) AS n
           FROM s),
         q AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS quantile)
         SELECT priority, quantile, rank, line_id, lag_days
         FROM r JOIN q ON rank = CAST(ceil(quantile * n) AS BIGINT)""",
    // distinct-name dictionary (min-id canonical + count), blocked on
    // the last token, length-filtered, then the exact levenshtein cut
    "x185_fuzzy_match" ->
      """WITH d AS (SELECT p_name AS name, min(p_partkey) AS id,
           CAST(count(*) AS BIGINT) AS n_rows,
           regexp_extract(p_name, '(\S+)$', 1) AS blk
           FROM part WHERE p_name IS NOT NULL GROUP BY 1, 4)
         SELECT a.name AS name_a, b.name AS name_b, a.id AS id_a,
           b.id AS id_b, a.n_rows AS n_a, b.n_rows AS n_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
         FROM d a JOIN d b ON a.blk = b.blk AND a.name < b.name
         WHERE abs(length(a.name) - length(b.name)) <= 2
           AND levenshtein(a.name, b.name) <= 2""",
    // x161's exact-decimal daily frame densified onto each nation's
    // own [min, max] spine; forward fill = last_value IGNORE NULLS
    "x186_gap_fill" ->
      """WITH d AS (SELECT n_name AS nation,
           epoch_ms(l_shipdate) // 86400000 AS day,
           floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
             / 10000.0 AS v
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey),
         g AS (SELECT nation, day,
             CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS revenue
           FROM d GROUP BY 1, 2),
         e AS (SELECT nation, min(day) AS d0, max(day) AS d1
           FROM g GROUP BY 1),
         sp AS (SELECT nation, unnest(generate_series(d0, d1)) AS day
           FROM e),
         j AS (SELECT sp.nation, sp.day, g.revenue
           FROM sp LEFT JOIN g ON sp.nation = g.nation
             AND sp.day = g.day)
         SELECT nation, day, revenue,
           last_value(revenue IGNORE NULLS) OVER (PARTITION BY nation
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
             CURRENT ROW) AS filled_revenue,
           revenue IS NULL AS is_gap
         FROM j""",
    // LAG within each user's (ts, event_id)-ordered timeline, then
    // dictionary-bounded counts + row-normalized 1e-6-grid P(next|prev)
    "x187_markov_transitions" ->
      """WITH s AS (SELECT user_id, event_type AS next_type,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type
           FROM events),
         c AS (SELECT prev_type, next_type,
             CAST(count(*) AS BIGINT) AS n_transitions
           FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT prev_type, sum(n_transitions) AS tot
           FROM c GROUP BY 1)
         SELECT c.prev_type, c.next_type, c.n_transitions,
           floor(CAST(n_transitions AS DOUBLE) / CAST(tot AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS prob
         FROM c JOIN t ON c.prev_type = t.prev_type""",
    // 3 unrolled integer-PageRank rounds: per-edge shares on the 1e9
    // grid, floor-div contributions, 0.85 damping as (85·acc)//100 —
    // every intermediate an exact integer, so pr is hash-stable
    "x188_pagerank" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         e AS (SELECT a.b AS src, c2.b AS dst,
             CAST(count(*) AS BIGINT) AS w
           FROM ob a JOIN ob c2 ON a.ok = c2.ok AND a.b <> c2.b
           GROUP BY 1, 2),
         ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY 1),
         sh AS (SELECT e.src, e.dst,
             CAST((CAST(e.w AS HUGEINT) * CAST(1000000000 AS BIGINT))
               // ow.outw AS BIGINT) AS share
           FROM e JOIN ow ON e.src = ow.src),
         n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         c AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM n),
         bs AS (SELECT n.node,
             (15 * CAST(1000000000 AS BIGINT)) // (100 * nn) AS base,
             CAST(1000000000 AS BIGINT) // nn AS pr0
           FROM n, c),
         p1 AS (SELECT bs.node, bs.base
             + (85 * COALESCE(a.acc, 0)) // 100 AS pr
           FROM bs LEFT JOIN (SELECT sh.dst AS node,
               sum((p.pr0 * sh.share)
                 // CAST(1000000000 AS BIGINT)) AS acc
             FROM sh JOIN bs p ON sh.src = p.node GROUP BY 1) a
             ON bs.node = a.node),
         p2 AS (SELECT bs.node, bs.base
             + (85 * COALESCE(a.acc, 0)) // 100 AS pr
           FROM bs LEFT JOIN (SELECT sh.dst AS node,
               sum((p.pr * sh.share)
                 // CAST(1000000000 AS BIGINT)) AS acc
             FROM sh JOIN p1 p ON sh.src = p.node GROUP BY 1) a
             ON bs.node = a.node),
         p3 AS (SELECT bs.node, bs.base
             + (85 * COALESCE(a.acc, 0)) // 100 AS pr
           FROM bs LEFT JOIN (SELECT sh.dst AS node,
               sum((p.pr * sh.share)
                 // CAST(1000000000 AS BIGINT)) AS acc
             FROM sh JOIN p2 p ON sh.src = p.node GROUP BY 1) a
             ON bs.node = a.node)
         SELECT node AS brand, CAST(pr AS BIGINT) AS pr_units
         FROM p3""",
    // Page's CUSUM in the closed form S_i = P_i − min(0, min_j P_j)
    // over exact integer deviations D·x − Σx; flag S² > h²·(D·Σx²−Σx²)
    "x189_cusum_drift" ->
      """WITH dc AS (SELECT event_type,
           epoch_ms(ts) // 86400000 AS day,
           CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS d,
             CAST(sum(n_events) AS HUGEINT) AS s1,
             sum(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT))
               AS s2
           FROM dc GROUP BY 1),
         dev AS (SELECT dc.event_type, dc.day, dc.n_events,
             st.d * dc.n_events - st.s1 AS dd,
             st.d * st.s2 - st.s1 * st.s1 AS v
           FROM dc JOIN st ON dc.event_type = st.event_type),
         pre AS (SELECT *, sum(dd) OVER (PARTITION BY event_type
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
             CURRENT ROW) AS p FROM dev),
         cus AS (SELECT *, p - least(CAST(0 AS HUGEINT),
             min(p) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             AS sc FROM pre)
         SELECT event_type, day, n_events,
           CASE WHEN v > 0 THEN floor(CAST(sc AS DOUBLE)
             / sqrt(CAST(v AS DOUBLE)) * 1000000 + 0.5) / 1000000.0
             END AS drift_sigmas,
           sc * sc > 9 * v AS flagged
         FROM cus""",
    // 3 unrolled deterministic-LPA rounds over the lift-filtered
    // (cb·N > cu1·cu2, exact integers) symmetric brand graph;
    // argmax = (w DESC, label ASC), exactly min(struct(-w, label))
    "x190_label_communities" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         u AS (SELECT b, CAST(count(*) AS BIGINT) AS cu
           FROM ob GROUP BY 1),
         nn AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS nb
           FROM ob),
         p AS (SELECT a.b AS src, c2.b AS dst,
             CAST(count(*) AS BIGINT) AS w
           FROM ob a JOIN ob c2 ON a.ok = c2.ok AND a.b <> c2.b
           GROUP BY 1, 2),
         e AS (SELECT p.src, p.dst, p.w
           FROM p JOIN u u1 ON p.src = u1.b
           JOIN u u2 ON p.dst = u2.b, nn
           WHERE CAST(p.w AS HUGEINT) * nb
             > CAST(u1.cu AS HUGEINT) * u2.cu),
         l0 AS (SELECT src AS node, src AS label FROM e
           UNION SELECT dst, dst FROM e),
         a1 AS (SELECT e.dst AS node, l.label, sum(e.w) AS w
           FROM e JOIN l0 l ON e.src = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, label FROM (SELECT node, label,
             row_number() OVER (PARTITION BY node
               ORDER BY w DESC, label) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT e.dst AS node, l.label, sum(e.w) AS w
           FROM e JOIN l1 l ON e.src = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, label FROM (SELECT node, label,
             row_number() OVER (PARTITION BY node
               ORDER BY w DESC, label) AS rn FROM a2) WHERE rn = 1),
         a3 AS (SELECT e.dst AS node, l.label, sum(e.w) AS w
           FROM e JOIN l2 l ON e.src = l.node GROUP BY 1, 2),
         l3 AS (SELECT node, label FROM (SELECT node, label,
             row_number() OVER (PARTITION BY node
               ORDER BY w DESC, label) AS rn FROM a3) WHERE rn = 1)
         SELECT node AS brand, label AS community FROM l3""",
    // user-keyed LAG gaps, then the grouped double-ceil quantile law
    // (x156/x184's shape) at p50/p90/p99 per event type
    "x191_event_gaps" ->
      """WITH g AS (SELECT event_id, event_type,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
             ORDER BY epoch_ms(ts), event_id) AS gap_ms
           FROM events),
         s AS (SELECT event_type, event_id, gap_ms FROM g
           WHERE gap_ms IS NOT NULL),
         r AS (SELECT event_type, event_id, gap_ms,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY gap_ms, event_id) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n
           FROM s),
         q AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE])
           AS quantile)
         SELECT event_type, quantile, rank, event_id, gap_ms
         FROM r JOIN q ON rank = CAST(ceil(quantile * n) AS BIGINT)""",
    // oriented a<b<c triangle enumeration over the affinity graph;
    // coefficient = 2t/(d(d-1)) on the 1e-6 grid, NULL below degree 2
    "x192_triangle_stats" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         u AS (SELECT b, CAST(count(*) AS BIGINT) AS cu
           FROM ob GROUP BY 1),
         nn AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS nb
           FROM ob),
         p AS (SELECT a.b AS src, c2.b AS dst,
             CAST(count(*) AS BIGINT) AS w
           FROM ob a JOIN ob c2 ON a.ok = c2.ok AND a.b <> c2.b
           GROUP BY 1, 2),
         e AS (SELECT p.src, p.dst, p.w
           FROM p JOIN u u1 ON p.src = u1.b
           JOIN u u2 ON p.dst = u2.b, nn
           WHERE CAST(p.w AS HUGEINT) * nb
             > CAST(u1.cu AS HUGEINT) * u2.cu),
         und AS (SELECT DISTINCT src AS a, dst AS b FROM e
           WHERE src < dst),
         tri AS (SELECT w1.a, w1.b, w2.b AS c
           FROM und w1 JOIN und w2 ON w1.b = w2.a
           JOIN und w3 ON w3.a = w1.a AND w3.b = w2.b),
         pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
           FROM (SELECT a AS node FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri) GROUP BY 1),
         deg AS (SELECT src AS node, CAST(count(*) AS BIGINT)
             AS degree
           FROM e GROUP BY 1)
         SELECT deg.node AS brand, deg.degree,
           CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.degree >= 2 THEN
             floor(2.0 * CAST(COALESCE(pn.n_triangles, 0) AS BIGINT)
               / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
               * 1000000 + 0.5) / 1000000.0 END AS clustering_coeff
         FROM deg LEFT JOIN pn ON deg.node = pn.node""",
    // per-user runmax of event time over the deterministic delayed
    // arrival order (id % 7 = 0 lands a day late — mirrored verbatim)
    "x193_watermark_audit" ->
      """WITH s AS (SELECT event_type, user_id, event_id,
           epoch_ms(ts) AS ms,
           epoch_ms(ts) + CASE WHEN event_id % 7 = 0
             THEN 86400000 ELSE 0 END AS arr
           FROM events),
         m AS (SELECT event_type, ms,
             max(ms) OVER (PARTITION BY user_id ORDER BY arr, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
           FROM s),
         l AS (SELECT event_type,
             CASE WHEN rm > ms THEN rm - ms ELSE 0 END AS late
           FROM m)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           floor(CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS late_share,
           CAST(max(late) AS BIGINT) AS max_lateness_ms
         FROM l GROUP BY 1""",
    // the MV-refresh contract with a join in the path: the oracle IS
    // the full recompute the base+delta merge must equal bit-for-bit
    "x194_mv_join_delta" ->
      """SELECT n_name AS nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
               * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
             AS revenue,
           min(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
             / 10000.0) AS min_item,
           max(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
             / 10000.0) AS max_item
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1, 2""",
    // md5 bucket + 60-bit payload-hash digests (the x182 hash law),
    // folded mod 2^60; the mutated snapshot mirrored verbatim
    "x195_bucket_checksums" ->
      """WITH li AS (SELECT
           CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS line_id,
           CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
         snap AS (SELECT line_id,
             CASE WHEN line_id % 89 = 0 THEN qty + 1 ELSE qty END
               AS qty
           FROM li WHERE line_id % 97 <> 0),
         bh AS (SELECT ('0x' || substring(md5(CAST(line_id AS VARCHAR)),
               1, 15))::BIGINT % 64 AS bucket,
             ('0x' || substring(md5(CAST(line_id AS VARCHAR) || '|'
               || CAST(qty AS VARCHAR)), 1, 15))::BIGINT AS h
           FROM li),
         sh AS (SELECT ('0x' || substring(md5(CAST(line_id AS VARCHAR)),
               1, 15))::BIGINT % 64 AS bucket,
             ('0x' || substring(md5(CAST(line_id AS VARCHAR) || '|'
               || CAST(qty AS VARCHAR)), 1, 15))::BIGINT AS h
           FROM snap),
         b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_base,
             CAST(sum(h) % 1152921504606846976 AS BIGINT) AS base_sum
           FROM bh GROUP BY 1),
         s AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_snap,
             CAST(sum(h) % 1152921504606846976 AS BIGINT) AS snap_sum
           FROM sh GROUP BY 1)
         SELECT COALESCE(b.bucket, s.bucket) AS bucket,
           CAST(COALESCE(n_base, 0) AS BIGINT) AS n_base,
           CAST(COALESCE(n_snap, 0) AS BIGINT) AS n_snap,
           CAST(COALESCE(base_sum, 0) AS BIGINT) AS base_sum,
           CAST(COALESCE(snap_sum, 0) AS BIGINT) AS snap_sum,
           COALESCE(n_base, 0) <> COALESCE(n_snap, 0)
             OR COALESCE(base_sum, 0) <> COALESCE(snap_sum, 0)
             AS differs
         FROM b FULL JOIN s ON b.bucket = s.bucket""",
    // direct unpruned 3-way basket join — the Apriori prune is
    // lossless so the engines must agree row-for-row
    "x196_brand_triples" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         nn AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
           AS n FROM lineitem),
         t AS (SELECT a.b AS brand_a, c.b AS brand_b, d.b AS brand_c,
             CAST(count(*) AS BIGINT) AS n_orders
           FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
           JOIN ob d ON a.o = d.o AND c.b < d.b
           GROUP BY 1, 2, 3 HAVING count(*) >= 3),
         k AS (SELECT * FROM t ORDER BY n_orders DESC, brand_a,
           brand_b, brand_c LIMIT 50)
         SELECT brand_a, brand_b, brand_c, n_orders,
           floor(CAST(n_orders AS DOUBLE) / CAST(nn.n AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS support
         FROM k, nn""",
    // per observed cell: (o/N)·ln(o·N/(r·c)), grid-6 + exact decimal
    // sum; entropies the same way over the margins
    "x197_mi_audit" ->
      """WITH d AS (SELECT c_mktsegment AS a, o_orderpriority AS b
           FROM orders JOIN customer ON o_custkey = c_custkey),
         cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
           FROM d GROUP BY 1, 2),
         r AS (SELECT a, CAST(sum(o) AS BIGINT) AS rr
           FROM cells GROUP BY 1),
         c AS (SELECT b, CAST(sum(o) AS BIGINT) AS cc
           FROM cells GROUP BY 1),
         nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
         mt AS (SELECT floor((CAST(o AS DOUBLE) / n)
             * ln(CAST(o AS DOUBLE) * n
               / (CAST(rr AS DOUBLE) * cc)) * 1000000 + 0.5)
             / 1000000.0 AS t
           FROM cells JOIN r USING (a) JOIN c USING (b), nn),
         mi AS (SELECT CAST(sum(CAST(t AS DECIMAL(38,6))) AS DOUBLE)
           AS mi_nats FROM mt),
         ha AS (SELECT CAST(sum(CAST(floor((CAST(rr AS DOUBLE) / n)
             * ln(CAST(n AS DOUBLE) / rr) * 1000000 + 0.5) / 1000000.0
             AS DECIMAL(38,6))) AS DOUBLE) AS h_a FROM r, nn),
         hb AS (SELECT CAST(sum(CAST(floor((CAST(cc AS DOUBLE) / n)
             * ln(CAST(n AS DOUBLE) / cc) * 1000000 + 0.5) / 1000000.0
             AS DECIMAL(38,6))) AS DOUBLE) AS h_b FROM c, nn)
         SELECT nn.n, mi.mi_nats, ha.h_a, hb.h_b
         FROM nn, mi, ha, hb""",
    // q13's session law to session grain (entry type = rn-1 event),
    // then the grouped double-ceil quantile cut, ties by session id
    "x198_session_durations" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
           epoch_ms(ts) AS ms,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS sess
           FROM x),
         z AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess
             ORDER BY ms, event_id) AS rn FROM y),
         g AS (SELECT CAST(user_id AS VARCHAR) || '_'
               || CAST(sess AS VARCHAR) AS session_id,
             max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
             CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms
           FROM z GROUP BY user_id, sess),
         rk AS (SELECT entry_type, session_id, duration_ms,
             CAST(row_number() OVER (PARTITION BY entry_type
               ORDER BY duration_ms, session_id) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY entry_type) AS BIGINT)
               AS n
           FROM g),
         q AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS quantile)
         SELECT entry_type, quantile, rank, session_id, duration_ms
         FROM rk JOIN q ON rank = CAST(ceil(quantile * n) AS BIGINT)""",
    // session grain again, aggregated per entry type; shares and the
    // mean duration on the 1e-6 grid (exact integer sums)
    "x199_bounce_report" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
           epoch_ms(ts) AS ms,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS sess
           FROM x),
         z AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess
             ORDER BY ms, event_id) AS rn FROM y),
         g AS (SELECT user_id, sess,
             max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
             CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms,
             CAST(count(*) AS BIGINT) AS n_events
           FROM z GROUP BY 1, 2)
         SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_bounce,
           floor(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS bounce_share,
           floor(CAST(sum(duration_ms) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS avg_duration_ms
         FROM g GROUP BY 1""",
    // distinct (user, day) once; each active day supports report days
    // [d, d+6] / [d, d+29]; report rows only for days with activity
    "x200_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id,
           epoch_ms(ts) // 86400000 AS d FROM events),
         dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
           FROM ud GROUP BY 1),
         we AS (SELECT DISTINCT user_id,
             unnest(generate_series(d, d + 6)) AS day FROM ud),
         w AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
           FROM we GROUP BY 1),
         me AS (SELECT DISTINCT user_id,
             unnest(generate_series(d, d + 29)) AS day FROM ud),
         m AS (SELECT day, CAST(count(*) AS BIGINT) AS mau
           FROM me GROUP BY 1)
         SELECT dau.day, dau.dau, w.wau, m.mau,
           floor(CAST(dau.dau AS DOUBLE) / CAST(m.mau AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS stickiness
         FROM dau JOIN w ON dau.day = w.day
         JOIN m ON dau.day = m.day""",
    // A-ES keys ln(u)/w from the md5 grid, ordered desc with id ties;
    // the reported key is grid-9 rounded AFTER selection
    "x201_weighted_sample" ->
      """WITH s AS (SELECT doc_id,
           CAST(len(string_split_regex(lower(trim(text)), '\s+')) + 1
             AS BIGINT) AS n_tokens_w,
           ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               ::BIGINT + 1)::DOUBLE / 1152921504606846976.0)
             / CAST(len(string_split_regex(lower(trim(text)), '\s+'))
               + 1 AS BIGINT) AS key
           FROM documents),
         r AS (SELECT doc_id, n_tokens_w, key,
             CAST(row_number() OVER (ORDER BY key DESC, doc_id)
               AS BIGINT) AS rank
           FROM s)
         SELECT doc_id, n_tokens_w, rank,
           floor(key * 1000000000 + 0.5) / 1000000000.0 AS key
         FROM r WHERE rank <= 100""",
    // symmetric rule table (confidence is direction-specific), then
    // row_number per brand over (lift desc, confidence desc, brand)
    // — the engines rank the identical grid-rounded doubles
    "x202_brand_recs" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS no
           FROM lineitem),
         bc AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM ob
           GROUP BY 1),
         p AS (SELECT a.b AS brand, r.b AS rec_brand,
             CAST(count(*) AS BIGINT) AS n_co
           FROM ob a JOIN ob r ON a.o = r.o AND a.b <> r.b
           GROUP BY 1, 2 HAVING count(*) >= 5),
         s AS (SELECT brand, rec_brand, n_co,
             floor(CAST(n_co AS DOUBLE) / ca.c * 1000000 + 0.5)
               / 1000000.0 AS confidence,
             floor(CAST(n_co AS DOUBLE) * no
               / (CAST(ca.c AS DOUBLE) * cb.c) * 1000000 + 0.5)
               / 1000000.0 AS lift
           FROM p JOIN bc ca ON p.brand = ca.b
           JOIN bc cb ON p.rec_brand = cb.b CROSS JOIN n),
         rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY brand
             ORDER BY lift DESC, confidence DESC, rec_brand)
             AS BIGINT) AS rank FROM s)
         SELECT brand, rec_brand, rank, n_co, confidence, lift
         FROM rk WHERE rank <= 3""",
    // equi-width integer histogram per priority read back at the
    // target ranks (bucket midpoints), next to the exact double-ceil
    // values and the grid rel_err
    "x203_histogram_quantiles" ->
      """WITH v AS (SELECT o_orderkey AS id,
           o_orderpriority AS priority,
           CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT) AS u
           FROM orders),
         st AS (SELECT priority, min(u) AS mn, max(u) AS mx,
             CAST(count(*) AS BIGINT) AS ng
           FROM v GROUP BY 1),
         ix AS (SELECT v.priority,
             CAST((CAST(v.u - st.mn AS HUGEINT) * 32)
               // (st.mx - st.mn + 1) AS BIGINT) AS idx
           FROM v JOIN st ON v.priority = st.priority),
         c AS (SELECT priority, idx, CAST(count(*) AS BIGINT) AS cnt
           FROM ix GROUP BY 1, 2),
         cum AS (SELECT *, sum(cnt) OVER (PARTITION BY priority
             ORDER BY idx ROWS UNBOUNDED PRECEDING) AS cm FROM c),
         q AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE]) AS quantile),
         hit AS (SELECT cum.priority, q.quantile, min(cum.idx) AS qi
           FROM cum JOIN st ON cum.priority = st.priority, q
           WHERE cum.cm >= CAST(ceil(q.quantile * st.ng) AS BIGINT)
           GROUP BY 1, 2),
         est AS (SELECT hit.priority, hit.quantile,
             CAST(st.mn AS DOUBLE) + (qi + 0.5)
               * CAST(st.mx - st.mn + 1 AS DOUBLE) / 32 AS e
           FROM hit JOIN st ON hit.priority = st.priority),
         r AS (SELECT priority, id, u,
             CAST(row_number() OVER (PARTITION BY priority
               ORDER BY u, id) AS BIGINT) AS rank,
             CAST(count(*) OVER (PARTITION BY priority) AS BIGINT)
               AS n
           FROM v),
         ex AS (SELECT priority, q.quantile, u AS exact_units
           FROM r JOIN q ON r.rank
             = CAST(ceil(q.quantile * n) AS BIGINT))
         SELECT est.priority, est.quantile,
           floor(e * 1000000 + 0.5) / 1000000.0 AS est_units,
           ex.exact_units,
           CASE WHEN ex.exact_units <> 0 THEN
             floor(abs(e - ex.exact_units) / abs(ex.exact_units)
               * 1000000 + 0.5) / 1000000.0 END AS rel_err
         FROM est JOIN ex ON est.priority = ex.priority
           AND est.quantile = ex.quantile"""
  )
}
