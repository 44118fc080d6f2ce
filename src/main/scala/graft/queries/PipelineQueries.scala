package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{CorpusPipeline, Multimodal}

/** The end-to-end training-corpus pipeline as ONE registered oracle
  * query (x42): quality gate (x35 signals) → exact dedup apply (x34) →
  * near-dup apply (x36) → decontaminate (x38) → stratified sample (x37)
  * → chunk (x31) → hash split (x26), returning the final chunk table.
  * Each stage is individually oracle-green; this registration checks the
  * COMPOSITION — where dedup semantics, survivor sets and float laws
  * interact — against one chained-CTE DuckDB mirror built from the same
  * per-stage SQL.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x42 — the composed pipeline over the fixture corpus: documents with
    // doc_id < 20 stand in for the held-out benchmark (the x38
    // convention); the rest are training candidates. Thresholds mirror
    // the per-stage registrations: gate top_bigram_frac <= 0.2 and
    // >= 100 chars, 3-shingle near-dup at jaccard >= 0.8, decontamination
    // at 3 overlapping shingles, en 50% / zh 20% / default 10% mixing,
    // 64-token chunks at stride 48.
    "x42_corpus_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      CorpusPipeline.prepare(
        corpus = d.filter(col("doc_id") >= 20),
        benchmark = d.filter(col("doc_id") < 20),
        idCol = "doc_id", textCol = "text",
        maxTopBigramFrac = 0.2, minChars = 100,
        shingleK = 3, neardupThreshold = 0.8,
        decontamThreshold = 3,
        groupCol = "lang", pctByGroup = Map("en" -> 50, "zh" -> 20),
        defaultPct = 10,
        chunkSize = 64, chunkStride = 48)
    }),

    // x56 — the cleaning-first curation pipeline: boilerplate strip
    // (8-token passages, df > 1) → drop emptied docs → PII redaction
    // (x60 semantics; identity on the PII-free fixture but mirrored in
    // the oracle regardless) → exact dedup ON the cleaned text
    // (cleaning can create new exact dups — the stage-ordering this
    // composition checks) → split label.
    "x56_clean_pipeline" -> ((s, dir) =>
      CorpusPipeline.curate(t(s, dir, "documents"), "doc_id", "text",
        passageTokens = 8, maxDf = 1)),

    // x65 — the IMAGE curation composition over the synthetic PPM corpus
    // (originals + re-encoded copies): contrast gate at >= 75 (the
    // corpus's contrast spread is 64-90, so the bar does real work and
    // can break a (doc, copy) cluster asymmetrically) → perceptual
    // dedup on the gated survivors → split label.
    "x65_image_pipeline" -> ((s, dir) =>
      CorpusPipeline.curateImages(s,
        Multimodal.syntheticPpmPairs(s, t(s, dir, "documents"), "doc_id",
          "text", copyOffset = 1000000L),
        minContrast = 75.0)),

    // x73 — the EXPORT composition: classifier gate (x69 semantics, at
    // -2.2 — the fixture score median is ~-2.27, so the bar keeps ~46%
    // and does real work) → exact dedup applied (x34) → deterministic
    // 64-doc shard manifest (x71). Gate and dedup change which
    // documents exist, so every rank/shard boundary/key range moves —
    // the composition is what's under test.
    "x73_export_shards" -> ((s, dir) =>
      CorpusPipeline.exportShards(t(s, dir, "documents"), "doc_id",
        "text", threshold = -2.2, shardSize = 64)),

    // x226 — the MODERN curation chain: x42 with the semantic tier
    // composed in — gate → exact → MinHash → SemDeDup (x219 knobs:
    // 8 seeds / 3 rounds / τ 0.35, clusters trained on the
    // lexically-deduped survivors' embeddings) → DSIR selection (x220
    // knobs: 256 buckets, English-likeness, top 100) → decontaminate →
    // sample → chunk → split. Stage INTERACTIONS are what's under
    // test: SemDeDup's clusters move when the lexical stages change
    // the survivor set, DSIR's distributions are fit on the semantic
    // survivors, decontamination prunes the SELECTED set.
    "x226_curation_v2" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      CorpusPipeline.prepareV2(
        corpus = d.filter(col("doc_id") >= 20),
        embeddings = t(s, dir, "embeddings"),
        benchmark = d.filter(col("doc_id") < 20),
        idCol = "doc_id", textCol = "text",
        vecIdCol = "vec_id", vecCol = "embedding",
        maxTopBigramFrac = 0.2, minChars = 100,
        shingleK = 3, neardupThreshold = 0.8,
        semSeeds = 8, semRounds = 3, semThreshold = 0.35,
        dsirTarget = col("lang") === "en",
        dsirBuckets = 256, dsirTopN = 100,
        decontamThreshold = 3,
        groupCol = "lang", pctByGroup = Map("en" -> 50, "zh" -> 20),
        defaultPct = 10,
        chunkSize = 64, chunkStride = 48)
    })
  )

  // The oracle chains the per-stage SQL (x35 gate signals, x34 exact
  // dedup, x36 near-dup walk, x38 overlap, x37 sample, x31 chunks, x26
  // split) as CTEs over the same corpus/benchmark partition.
  val oracleSql: Map[String, String] = Map(
    "x42_corpus_pipeline" ->
      """WITH RECURSIVE
         corp AS (SELECT * FROM documents WHERE doc_id >= 20),
         -- stage 1: quality gate (x35 signal shapes)
         gtoks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM corp),
         gbi AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
           FROM gtoks, unnest(generate_series(1, len(t) - 1)) AS s(i)),
         gbic AS (SELECT doc_id, g, count(*) AS c FROM gbi GROUP BY 1, 2),
         gbstat AS (SELECT doc_id, sum(c) AS n_bigrams,
             max(c) AS top_bigram_count
           FROM gbic GROUP BY 1),
         gated AS (SELECT c.* FROM corp c LEFT JOIN gbstat bs USING (doc_id)
           WHERE length(trim(c.text)) >= 100
             AND (bs.n_bigrams IS NULL
                  OR CAST(bs.top_bigram_count AS DOUBLE)
                     / CAST(bs.n_bigrams AS DOUBLE) <= 0.2)),
         -- stage 2: exact dedup applied (x34 shape)
         ex AS (SELECT g.* FROM gated g JOIN (
             SELECT min(doc_id) AS doc_id FROM gated
             GROUP BY sha256(lower(trim(text)))) k
           USING (doc_id)),
         -- stage 3: near-dup applied (x36 shape: exact jaccard >= 0.8 on
         -- 3-shingles, transitive-closure walk, keep representatives)
         etoks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM ex),
         esh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
           FROM etoks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
         esz AS (SELECT doc_id, count(*) AS n FROM esh GROUP BY 1),
         einter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM esh a JOIN esh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         eqp AS (SELECT d1, d2
           FROM einter JOIN esz x ON d1 = x.doc_id JOIN esz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.8),
         eedges AS (SELECT d1 AS a, d2 AS b FROM eqp
           UNION SELECT d2, d1 FROM eqp),
         walk(node, reach) AS (
           SELECT a, a FROM eedges
           UNION
           SELECT w.node, e.b FROM walk w JOIN eedges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1),
         nd AS (SELECT * FROM ex
           WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> rep)),
         -- stage 4: benchmark decontamination (x38 shape)
         bsh AS (SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS s
           FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS t
                 FROM documents WHERE doc_id < 20) bt,
                unnest(generate_series(1, len(t) - 2)) AS g(i)),
         ov AS (SELECT e.doc_id, count(*) AS n_overlap
           FROM (SELECT sh2.* FROM esh sh2 JOIN nd USING (doc_id)) e
           JOIN bsh USING (s) GROUP BY 1),
         clean AS (SELECT nd.* FROM nd LEFT JOIN ov USING (doc_id)
           WHERE coalesce(n_overlap, 0) < 3),
         -- stage 5: stratified sample (x37 shape)
         samp AS (SELECT * FROM clean
           WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               ::BIGINT % 100
             < CASE WHEN lang = 'en' THEN 50
                    WHEN lang = 'zh' THEN 20 ELSE 10 END),
         -- stages 6+7: chunk (x31 shape) + split label (x26 shape)
         stoks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM samp),
         counted AS (SELECT doc_id, t,
           CASE WHEN len(t) <= 64 THEN 1
                ELSE CAST(ceil((len(t) - 64) * 1.0 / 48) AS BIGINT) + 1
           END AS n_chunks FROM stoks)
         SELECT doc_id, g.i AS chunk_idx,
           array_to_string(t[(g.i * 48 + 1):(g.i * 48 + 64)], ' ') AS chunk,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '9'
                  THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'val'
                ELSE 'test' END AS split
         FROM counted, unnest(generate_series(0, n_chunks - 1)) AS g(i)""",
    // chains the x50 strip CTEs, the x34 min-id dedup on clean_text, and
    // the x26 split rule; both engines key the strip on md5(passage).
    "x56_clean_pipeline" ->
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
           FROM kept GROUP BY doc_id),
         strip AS (SELECT c.doc_id, a.clean_text,
           CAST(a.n_kept AS BIGINT) AS n_kept,
           CAST(c.n_chunks - a.n_kept AS BIGINT) AS n_dropped
           FROM counted c JOIN agg a USING (doc_id)),
         -- x60 redaction chain (email -> phone -> IPv4), mirrored even
         -- though the fixture is PII-free so the stage is load-bearing
         -- the moment any text matches
         red AS (SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(clean_text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
             AS clean_text, n_kept, n_dropped FROM strip),
         ex AS (SELECT s.* FROM red s JOIN (
             SELECT min(doc_id) AS doc_id FROM red
             GROUP BY sha256(lower(trim(clean_text)))) k
           USING (doc_id))
         SELECT doc_id, clean_text, n_dropped,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '9'
                  THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'val'
                ELSE 'test' END AS split
         FROM ex""",
    // the x64 stats CTEs gate on gridded contrast, then the x63 dedup
    // walk runs on the GATED population only, then the x26 split rule.
    "x65_image_pipeline" ->
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
         st AS (SELECT doc_id, g,
           CAST(list_sum(g) AS BIGINT) AS s,
           CAST(list_sum(list_transform(g, x -> x * x)) AS BIGINT) AS sq
           FROM gs),
         gated AS (SELECT doc_id, g FROM st
           WHERE floor(sqrt(CAST(70 * sq - s * s AS DOUBLE)) / 70 * 10000
             + 0.5) / 10000.0 >= 75.0),
         fp AS (SELECT doc_id,
           CAST(list_sum(list_transform(range(60), b ->
             CASE WHEN g[CAST(b // 6 * 7 + b % 6 + 2 AS INTEGER)]
                     > g[CAST(b // 6 * 7 + b % 6 + 1 AS INTEGER)]
                  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
                  ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
           FROM gated),
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
         SELECT f.doc_id, f.fp,
           CASE WHEN substring(md5(CAST(f.doc_id AS VARCHAR)), 1, 1) <= '9'
                  THEN 'train'
                WHEN substring(md5(CAST(f.doc_id AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'val'
                ELSE 'test' END AS split
         FROM fp f
         WHERE f.doc_id NOT IN (SELECT node FROM comp WHERE node <> rep)""",
    // chains the x69 score filter, the x34 min-id dedup, and the x71
    // rank/manifest rule over the surviving corpus.
    "x73_export_shards" ->
      """WITH toks AS (SELECT doc_id, text,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
         kept AS (SELECT doc_id, text, len(t) AS n_tokens FROM toks
           WHERE floor(CAST(list_sum(list_transform(t, x ->
               ('0x' || substring(md5(x), 1, 15))::BIGINT % 21 - 10))
               AS DOUBLE) / len(t) * 10000 + 0.5) / 10000.0 >= -2.2),
         surv AS (SELECT k.doc_id, k.n_tokens FROM kept k JOIN (
             SELECT min(doc_id) AS doc_id FROM kept
             GROUP BY sha256(lower(trim(text)))) g USING (doc_id)),
         r AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key, n_tokens,
           row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             - 1 AS rnk FROM surv)
         SELECT CAST(rnk // 64 AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           min(key) AS first_key, max(key) AS last_key
         FROM r GROUP BY 1""",
    // x226: the x42 chain with the x219 kmeans/witness CTEs and the
    // x220 weight-fit CTEs spliced in between the near-dup walk and
    // decontamination — each block is its stage oracle's SQL verbatim,
    // re-rooted on the previous stage's survivor set.
    "x226_curation_v2" ->
      s"""WITH RECURSIVE
         corp AS (SELECT * FROM documents WHERE doc_id >= 20),
         -- stage 1: quality gate (x35 signal shapes)
         gtoks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t FROM corp),
         gbi AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
           FROM gtoks, unnest(generate_series(1, len(t) - 1)) AS s(i)),
         gbic AS (SELECT doc_id, g, count(*) AS c FROM gbi GROUP BY 1, 2),
         gbstat AS (SELECT doc_id, sum(c) AS n_bigrams,
             max(c) AS top_bigram_count
           FROM gbic GROUP BY 1),
         gated AS (SELECT c.* FROM corp c LEFT JOIN gbstat bs USING (doc_id)
           WHERE length(trim(c.text)) >= 100
             AND (bs.n_bigrams IS NULL
                  OR CAST(bs.top_bigram_count AS DOUBLE)
                     / CAST(bs.n_bigrams AS DOUBLE) <= 0.2)),
         -- stage 2: exact dedup applied (x34 shape)
         ex AS MATERIALIZED (SELECT g.* FROM gated g JOIN (
             SELECT min(doc_id) AS doc_id FROM gated
             GROUP BY sha256(lower(trim(text)))) k
           USING (doc_id)),
         -- stage 3: near-dup applied (x36 shape)
         etoks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t FROM ex),
         esh AS MATERIALIZED (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
           FROM etoks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
         esz AS (SELECT doc_id, count(*) AS n FROM esh GROUP BY 1),
         einter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
           FROM esh a JOIN esh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         eqp AS (SELECT d1, d2
           FROM einter JOIN esz x ON d1 = x.doc_id JOIN esz y ON d2 = y.doc_id
           WHERE floor(c * 1.0 / (x.n + y.n - c) * 10000 + 0.5) / 10000.0
             >= 0.8),
         eedges AS (SELECT d1 AS a, d2 AS b FROM eqp
           UNION SELECT d2, d1 FROM eqp),
         walk(node, reach) AS (
           SELECT a, a FROM eedges
           UNION
           SELECT w.node, e.b FROM walk w JOIN eedges e ON w.reach = e.a),
         comp AS (SELECT node, min(reach) AS rep FROM walk GROUP BY 1),
         nd AS MATERIALIZED (SELECT * FROM ex
           WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> rep)),
         -- stage 4: SemDeDup (x219 shape) on the SURVIVORS' embeddings;
         -- seeds stay the full table's 8 smallest ids
         sememb AS MATERIALIZED (SELECT e.vec_id, e.embedding FROM embeddings e
           JOIN nd ON e.vec_id = nd.doc_id),
         ${ExtensionQueries.kmeansCtesOver(8, 3, "sememb")},
         scorp AS (SELECT vec_id AS vid, embedding AS v FROM sememb),
         sassign AS MATERIALIZED (SELECT vid, v, cid FROM (
           SELECT vid, v, c.cid, row_number() OVER (PARTITION BY vid
             ORDER BY ${ExtensionQueries.kmeansCos("v", "c.cv")} DESC,
               c.cid) AS arn
           FROM scorp, cent3 c) WHERE arn = 1),
         sdrop AS (SELECT DISTINCT b.vid FROM sassign a
           JOIN sassign b ON a.cid = b.cid AND a.vid < b.vid
           WHERE floor(${ExtensionQueries.duckCos("a.v", "b.v")}
             * 1000000 + 0.5) / 1000000.0 >= 0.35),
         sem AS MATERIALIZED (SELECT * FROM nd
           WHERE doc_id NOT IN (SELECT vid FROM sdrop)),
         -- stage 5: DSIR selection (x220 shape) fit ON the semantic
         -- survivors, English-likeness, top 100
         dtoks AS (SELECT doc_id, (lang = 'en') AS tgt,
           string_split_regex(lower(trim(text)), '\\s+') AS t FROM sem),
         dgr AS (SELECT doc_id, tgt, array_to_string(t[i:i+1], ' ') AS g
           FROM dtoks, unnest(generate_series(1, len(t) - 1)) AS x(i)
           WHERE len(t) >= 2),
         dgb AS (SELECT doc_id, tgt,
             ('0x' || substring(md5(g), 1, 15))::BIGINT % 256 AS b
           FROM dgr),
         dq AS (SELECT b, count(*) AS q_n FROM dgb GROUP BY 1),
         dp AS (SELECT b, count(*) AS p_n FROM dgb WHERE tgt GROUP BY 1),
         dtot AS (SELECT (SELECT sum(q_n) FROM dq) AS qt,
             (SELECT COALESCE(sum(p_n), 0) FROM dp) AS pt),
         dbw AS (SELECT dq.b,
             CAST(floor(ln(
                 ((COALESCE(p_n, 0) + 1.0) * (qt + 256.0))
                 / ((q_n + 1.0) * (pt + 256.0))) * 10000 + 0.5)
               AS BIGINT) AS w
           FROM dq LEFT JOIN dp ON dq.b = dp.b, dtot),
         dds AS (SELECT dgb.doc_id, sum(w) AS si
           FROM dgb JOIN dbw ON dgb.b = dbw.b GROUP BY 1),
         dalld AS (SELECT s.doc_id,
             CAST(COALESCE(si, 0) AS BIGINT) AS si
           FROM sem s LEFT JOIN dds ON s.doc_id = dds.doc_id),
         sel AS (SELECT doc_id FROM dalld
           QUALIFY row_number() OVER (ORDER BY si DESC, doc_id) <= 100),
         picked AS MATERIALIZED (SELECT * FROM sem
           WHERE doc_id IN (SELECT doc_id FROM sel)),
         -- stage 6: benchmark decontamination (x38 shape) over the
         -- SELECTED set
         bsh AS (SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS s
           FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
                 FROM documents WHERE doc_id < 20) bt,
                unnest(generate_series(1, len(t) - 2)) AS g(i)),
         ov AS (SELECT e.doc_id, count(*) AS n_overlap
           FROM (SELECT sh2.* FROM esh sh2 JOIN picked USING (doc_id)) e
           JOIN bsh USING (s) GROUP BY 1),
         clean AS (SELECT picked.* FROM picked LEFT JOIN ov USING (doc_id)
           WHERE coalesce(n_overlap, 0) < 3),
         -- stage 7: stratified sample (x37 shape)
         samp AS (SELECT * FROM clean
           WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               ::BIGINT % 100
             < CASE WHEN lang = 'en' THEN 50
                    WHEN lang = 'zh' THEN 20 ELSE 10 END),
         -- stages 8+9: chunk (x31 shape) + split label (x26 shape)
         stoks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t FROM samp),
         counted AS (SELECT doc_id, t,
           CASE WHEN len(t) <= 64 THEN 1
                ELSE CAST(ceil((len(t) - 64) * 1.0 / 48) AS BIGINT) + 1
           END AS n_chunks FROM stoks)
         SELECT doc_id, g.i AS chunk_idx,
           array_to_string(t[(g.i * 48 + 1):(g.i * 48 + 64)], ' ') AS chunk,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '9'
                  THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
                  THEN 'val'
                ELSE 'test' END AS split
         FROM counted, unnest(generate_series(0, n_chunks - 1)) AS g(i)"""
  )
}
