package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorExpressions

import graft.functions.{Par, Vectors}

/** Similarity search over an embedding column (SURVEY §2.4 X3).
  *
  * Two tiers:
  *  - brute force: query-set × corpus join with exact cosine — the small
  *    query set is broadcast, so the corpus is scanned once with no
  *    shuffle; per-query top-k via a ranking window partitioned by query.
  *  - IVF: corpus is pre-assigned to its nearest centroid (one pass),
  *    queries probe only the `nprobe` nearest centroid buckets. At 100 TB
  *    the assignment is computed once and persisted/bucketed by
  *    `centroid_id`, so a query touches nprobe/numCentroids of the data.
  *
  * Embedding-cosine near-dup (all pairs above a threshold) reuses the
  * brute-force join shape with the corpus on both sides.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (excluding self-matches).
    * Deterministic: ties broken by ascending neighbor id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.norm(col(vecCol)).as("qn"))
    val c = Par.spread(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Vectors.norm(col(vecCol)).as("cn")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("similarity", Vectors.cosinePrenormed(
        col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        graft.functions.Num.fpRound(col("similarity"), 6).as("similarity"))
  }

  /** All corpus pairs with cosine >= threshold (embedding near-dup).
    * O(n²/2) scoring — the SMALL-CORPUS exact variant, size-gated: an
    * input past `maxRows` fails fast (one count job) pointing at the
    * scale path, [[ivfCosinePairs]], instead of launching a quadratic
    * job (20k rows is already 200M pair evaluations). Raise `maxRows`
    * explicitly to opt into a bigger exact run.
    * No broadcast hint: for a small corpus the planner broadcasts the
    * build side on its own (scan stats < autoBroadcastJoinThreshold);
    * past the broadcast size cap it can still fall back to a
    * non-broadcast strategy instead of failing outright. */
  def cosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
                  threshold: Double, maxRows: Long = 20000): DataFrame = {
    graft.functions.Guards.requireSmall(corpus, maxRows,
      "Similarity.cosinePairs", "Similarity.ivfCosinePairs")
    val a = Par.spread(corpus.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      Vectors.norm(col(vecCol)).as("n1")))
    val b = corpus.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      Vectors.norm(col(vecCol)).as("n2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("similarity", Vectors.cosinePrenormed(
        col("v1"), col("v2"), col("n1"), col("n2")))
      .filter(col("similarity") >= threshold)
      .select(col("id1"), col("id2"),
        graft.functions.Num.fpRound(col("similarity"), 6).as("similarity"))
  }

  /** Widen an integral id value to Long (the kernel's bucket-key type);
    * clear error for non-integral id columns instead of a CCE. */
  private[operators] def integralId(v: Any, idCol: String): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case other => throw new IllegalArgumentException(
      s"IVF id column '$idCol' must be integral, got " +
        s"${if (other == null) "null" else other.getClass.getName}")
  }

  /** Driver-collected centroid table (IVF "training" output — eagerly
    * materialized, like fitting the centroids would be), sorted by id so
    * kernel tie-breaks match the ranking-window formulation. */
  private[operators] def collectCentroids(
      centroids: DataFrame, idCol: String,
      vecCol: String): (Array[Long], Array[Array[Float]]) = {
    val rows = centroids.select(col(idCol), col(vecCol)).collect()
      .map(r => (integralId(r.get(0), idCol), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  /** IVF-blocked near-dup: corpus pairs above `threshold`, but only pairs
    * sharing a centroid bucket are scored — the O(n²)-free scale path for
    * embedding dedup (deliberately approximate: cross-bucket pairs are
    * out of scope by construction, which an oracle can mirror exactly).
    * Assignment is the per-row [[VectorExpressions.nearestCentroid]]
    * kernel: zero shuffles and no k× row blowup (round 1 cross-joined
    * the broadcast centroids and ranked with a window — a shuffle + sort
    * of the k×n stream for the same argmax).
    */
  def ivfCosinePairs(corpus: DataFrame, centroids: DataFrame, idCol: String,
                     vecCol: String, threshold: Double): DataFrame = {
    val (ids, vecs) = collectCentroids(centroids, idCol, vecCol)
    // empty centroid table => no buckets => no pairs (the round-1 window
    // formulation's behavior; the kernel itself needs >= 1 centroid)
    if (ids.isEmpty)
      return corpus.select(col(idCol).as("id1"), col(idCol).as("id2"),
        lit(null).cast("double").as("similarity")).limit(0)
    val corp = Par.spread(corpus.select(col(idCol).as("vid"), col(vecCol).as("v"),
      Vectors.norm(col(vecCol)).as("nv")))
    val assigned = corp.withColumn("centroid_id",
      VectorExpressions.nearestCentroid(col("v"), ids, vecs))
    val a = assigned.alias("a"); val b = assigned.alias("b")
    a.join(b, col("a.centroid_id") === col("b.centroid_id") &&
        col("a.vid") < col("b.vid"))
      .withColumn("similarity", Vectors.cosinePrenormed(
        col("a.v"), col("b.v"), col("a.nv"), col("b.nv")))
      .filter(col("similarity") >= threshold)
      .select(col("a.vid").as("id1"), col("b.vid").as("id2"),
        graft.functions.Num.fpRound(col("similarity"), 6).as("similarity"))
  }

  /** Embedding dedup APPLIED — the vector-modality twin of the text
    * pipeline's near-dup application: IVF-blocked near-dup pairs feed
    * connected components, and every vector that is not its cluster's
    * representative (min id) is dropped. The drop set is near-dup-sized,
    * so the final anti-join broadcasts even when the corpus doesn't. */
  def dedupedVectors(corpus: DataFrame, centroids: DataFrame, idCol: String,
                     vecCol: String, threshold: Double): DataFrame = {
    val pairs = ivfCosinePairs(corpus, centroids, idCol, vecCol, threshold)
    val drops = Components.connectedComponents(pairs, "id1", "id2")
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    corpus.join(drops, Seq(idCol), "left_anti")
  }

  /** SEMANTIC DEDUPLICATION — the SemDeDup recipe (Abbas et al. 2023,
    * arXiv:2303.09540) as one composed operator: k-means clusters the
    * embedding space ([[kmeansCentroids]] — deterministic seeded Lloyd
    * rounds), then duplicates are decided ONLY within a cluster —
    * pairwise cosine is confined to same-cluster blocks, which is the
    * trick that makes semantic dedup tractable at corpus scale (the
    * all-pairs stage never exists; per-block work is |cluster|², and k
    * grows with the corpus to bound block sizes).
    *
    * Returns one row per input vector:
    * `(vec_id, cluster_id, status, dup_of, similarity)` — `status` is
    * `dropped` when some SMALLER-id same-cluster vector sits at or
    * above `threshold` (the paper keeps one representative per
    * ε-neighborhood; min-id is this repo's deterministic stand-in for
    * its random choice), `dup_of`/`similarity` name the strongest such
    * witness (highest cosine, then smallest id — similarity rounded at
    * 1e-6 BEFORE the ranking so the oracle's window agrees bit-for-bit),
    * `kept` rows carry nulls. Pair cosine is computed on the RAW float
    * vectors with pre-computed norms ([[ivfCosinePairs]]'s law);
    * assignment runs the nearest-centroid kernel against the trained
    * grid-scale centroids (cosine is scale-invariant — the
    * [[kmeansCentroids]] scaladoc note).
    *
    * 100 TB shape: centroid training collects k×dim stats only; the
    * self-join shuffles on `cluster_id` (both sides already hashed the
    * same way), and the witness window partitions by vector id — no
    * global sort, no corpus-sized collect. */
  /** EMBEDDING-level DECONTAMINATION (x231) — the semantic counter to
    * the lexical x38/x44/x95 family: a corpus vector is CONTAMINATED
    * when its cosine against ANY benchmark vector reaches `threshold`,
    * catching PARAPHRASED benchmark leakage that shingle overlap and
    * verbatim span matching cannot see (the reason modern curation
    * pipelines run an embedding decontam pass NEXT TO the lexical
    * one, not instead of it). One row per corpus vector:
    * `(vec_id, status kept|dropped, best_bench_id, similarity)` — the
    * strongest benchmark witness (argmax cosine, ties → smallest
    * bench id, x3's total order; similarity 1e-6-rounded, x9's law;
    * the threshold compares the RAW cosine, also x9's law).
    *
    * 100 TB shape: the benchmark is eval-suite-sized and collects to
    * the driver ONCE (the [[collectCentroids]] convention — the same
    * boundedness argument as IVF training output); the corpus then
    * pays a single scan through the codegen [[VectorExpressions
    * .bestMatch]] kernel — a pure projection: zero joins, zero
    * shuffles, no row blowup, embarrassingly parallel at any corpus
    * size. A window/crossJoin formulation of the same argmax would
    * shuffle |corpus|×|benchmark| scored rows. */
  def semanticDecontam(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val (ids, vecs) = collectCentroids(benchmark, idCol, vecCol)
    require(ids.nonEmpty, "semanticDecontam: empty benchmark")
    Par.spread(corpus.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("_v")))
      .withColumn("_m", VectorExpressions.bestMatch(col("_v"), ids, vecs))
      .select(col("vec_id"),
        when(col("_m").isNotNull && col("_m.sim") >= threshold,
          lit("dropped")).otherwise(lit("kept")).as("status"),
        col("_m.bench_id").as("best_bench_id"),
        graft.functions.Num.fpRound(col("_m.sim"), 6).as("similarity"))
  }

  def semDedup(corpus: DataFrame, init: DataFrame, idCol: String,
               vecCol: String, rounds: Int, threshold: Double): DataFrame = {
    val cents = kmeansCentroids(corpus, init, idCol, vecCol, rounds)
    val (ids, vecs) = collectCentroids(cents, "centroid_id", "centv")
    // CACHED for the call: `assigned` feeds both sides of the
    // same-cluster self-join AND the final status select — uncached,
    // the corpus scan + nearest-centroid kernel would run per use
    // (the self-join's two sides share one exchange, but the vid-keyed
    // final join cannot). Caller-owned cache (the [[mmrTopKIndexed]]
    // convention — Bench/Verify clearCache between queries); at true
    // corpus scale, persist the assignment once (the x92 index
    // pattern) instead of caching.
    val assigned = Par.spread(corpus.select(
        col(idCol).cast("long").as("vid"), col(vecCol).as("v"),
        Vectors.norm(col(vecCol)).as("nv")))
      .withColumn("cluster_id",
        VectorExpressions.nearestCentroid(col("v"), ids, vecs))
      .cache()
    val a = assigned.alias("a"); val b = assigned.alias("b")
    val hits = a.join(b, col("a.cluster_id") === col("b.cluster_id") &&
        col("a.vid") < col("b.vid"))
      .withColumn("similarity", graft.functions.Num.fpRound(
        Vectors.cosinePrenormed(col("a.v"), col("b.v"),
          col("a.nv"), col("b.nv")), 6))
      .filter(col("similarity") >= threshold)
      .select(col("b.vid").as("vid"), col("a.vid").as("dup_of"),
        col("similarity"))
    val best = hits.withColumn("rn", row_number().over(Window
        .partitionBy(col("vid"))
        .orderBy(col("similarity").desc, col("dup_of"))))
      .filter(col("rn") === 1).drop("rn")
    assigned.select(col("vid"), col("cluster_id"))
      .join(best, Seq("vid"), "left")
      .select(col("vid").as("vec_id"), col("cluster_id"),
        when(col("dup_of").isNull, lit("kept")).otherwise(lit("dropped"))
          .as("status"),
        col("dup_of"), col("similarity"))
  }

  /** IVF-ish approximate top-k: assign corpus vectors to their nearest
    * centroid, probe the `nprobe` centroids nearest each query, brute-force
    * only inside the probed buckets. Centroids are passed in as a (small)
    * DataFrame and broadcast everywhere.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val (ids, vecs) = collectCentroids(centroids, idCol, vecCol)
    // empty centroid table => nothing probe-able => empty result (the
    // round-1 window formulation's behavior)
    if (ids.isEmpty)
      return queries.select(col(idCol).as("query_id"),
        col(idCol).as("neighbor_id"), lit(null).cast("long").as("rank"),
        lit(null).cast("double").as("similarity")).limit(0)
    val corp = Par.spread(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Vectors.norm(col(vecCol)).as("cn")))
    // one-pass scan-side assignment: nearest centroid per corpus vector
    val assigned = corp.withColumn("centroid_id",
      VectorExpressions.nearestCentroid(col("cv"), ids, vecs))
    // per-query probe list: nprobe nearest centroids, also per-row
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Vectors.norm(col(vecCol)).as("qn"))
      .withColumn("centroid_id", explode(
        VectorExpressions.probeCentroids(col("qv"), ids, vecs, nprobe)))
    // brute force inside probed buckets only
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("similarity", Vectors.cosinePrenormed(
        col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        graft.functions.Num.fpRound(col("similarity"), 6).as("similarity"))
  }

  /** kNN label propagation — semi-supervised labeling for corpus
    * curation: each unlabeled query vector takes the MAJORITY label of
    * its k nearest LABELED neighbors (quality tiers, topic tags, source
    * classes propagated from a hand-labeled seed set to the full
    * corpus). Neighbor search is [[ivfTopK]] — bucketed probes, never
    * all-pairs — so the cost model is the ANN query path's, not a
    * brute-force classifier's.
    *
    * Output: `(query_id, predicted_label, votes, n_neighbors)` — votes
    * the winning label's count, n_neighbors the actual neighbor count
    * (< k when the probed buckets are thin), so confidence = votes /
    * n_neighbors is auditable downstream.
    *
    * Determinism: neighbor ranks tie-break by neighbor id (in
    * [[ivfTopK]]); vote ties break toward the SMALLEST label. The vote
    * aggregate groups the k×|queries| neighbor stream — tiny relative
    * to the corpus — and the ranking window partitions by query, whose
    * group is bounded by the label-alphabet size. */
  def knnLabel(queries: DataFrame, labeled: DataFrame, centroids: DataFrame,
               idCol: String, vecCol: String, labelCol: String, k: Int,
               nprobe: Int): DataFrame = {
    // the vote's tie-break negates the label cast to long, so a
    // non-numeric label would predict NULL everywhere and a fractional
    // Double/Decimal label would silently truncate (distinct labels
    // colliding in the tie-break AND in predicted_label) — fail loudly
    // on both instead (the connectedComponents convention)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val labelType = labeled.schema(labelCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(labelType),
      s"knnLabel needs an integral label column; '$labelCol' is $labelType " +
        "(map string/fractional classes to integer codes before propagating)")
    val nn = ivfTopK(queries, labeled, centroids, idCol, vecCol, k, nprobe)
    val labels = labeled.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("_nl"))
    val votes = nn.join(labels, "neighbor_id")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_neighbors"),
        collect_list(col("_nl")).as("_ls"))
    // winner = max (count, -label) over the k-bounded per-query list —
    // computed per row instead of a second shuffle + ranking window
    val winner = array_max(transform(array_distinct(col("_ls")),
      l => struct(
        size(filter(col("_ls"), x => x === l)).as("votes"),
        (-l.cast("long")).as("_negl"))))
    votes.select(col("query_id"),
      (-winner.getField("_negl")).as("predicted_label"),
      winner.getField("votes").cast("long").as("votes"),
      col("n_neighbors"))
  }

  /** int8 scalar quantization report — the storage/serving prep step for
    * an embedding corpus (store 64 bytes, not 256): per vector, the
    * symmetric scale `max|v| / 127`, the round-trip RMSE at that scale,
    * and the quantized max magnitude (≤ 127 by construction — a
    * checkable invariant, not an assumption). Pure per-row projection —
    * zero shuffles, scales with input splits.
    *
    * Rounding is an explicit `floor(x/scale + 0.5)` (half-toward-+inf)
    * rather than an engine `round()` so the quantized grid is identical
    * in any IEEE engine; the RMSE accumulates in the element order of
    * the vector on both sides (the [[Vectors.dot]] precedent). */
  /** IVF index BALANCE audit (x101) — the health report for every
    * IVF-family operator (x10/x22/x91): per-centroid assigned-vector
    * counts plus each bucket's load factor n·k/N (1.0 = perfectly
    * balanced; a hot bucket's factor is its slowdown multiple for any
    * probe that hits it, since probed-bucket cost is bucket size).
    * Empty centroids appear with 0 — a dead codebook entry is exactly
    * what the audit exists to surface.
    *
    * Scale shape: one zero-shuffle assignment kernel pass ([[
    * VectorExpressions.nearestCentroid]], the x22 convention) + one
    * k-row aggregate; the centroid list and the 1-row total broadcast.
    * load factor = (n·k)/N — two exact-long products into one IEEE
    * division, bit-identical cross-engine. */
  def ivfBalanceReport(corpus: DataFrame, centroids: DataFrame,
                       idCol: String, vecCol: String): DataFrame = {
    val (ids, vecs) = collectCentroids(centroids, idCol, vecCol)
    require(ids.nonEmpty, "ivfBalanceReport needs >= 1 centroid")
    val assigned = Par.spread(corpus.select(col(idCol).as("vid"),
        col(vecCol).as("v")))
      .withColumn("centroid_id",
        VectorExpressions.nearestCentroid(col("v"), ids, vecs))
    val counts = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vectors"))
    val total = corpus.agg(count(lit(1)).as("total"))
    centroids.select(col(idCol).cast("long").as("centroid_id"))
      .join(counts, Seq("centroid_id"), "left")
      .withColumn("n_vectors", coalesce(col("n_vectors"), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("centroid_id"), col("n_vectors"),
        // empty corpus: 0·k/0 is NaN for every centroid — report the
        // defined value 0.0 (an index over nothing has no load anywhere)
        when(col("total") > 0,
          graft.functions.Num.fpRound(
            col("n_vectors").cast("double") * lit(ids.length.toDouble) /
              col("total").cast("double"), 4))
          .otherwise(lit(0.0d)).as("load_factor"))
  }

  def quantizeReport(emb: DataFrame, idCol: String,
                     vecCol: String): DataFrame = {
    val v = col(vecCol)
    val absMax = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = absMax / lit(127.0)
    def quant(x: Column): Column = floor(x.cast("double") / scale + 0.5)
    val sqErr = aggregate(v, lit(0.0d), (acc, x) => {
      val d = x.cast("double") - quant(x) * scale
      acc + d * d
    })
    val qMax = array_max(transform(v, x => abs(quant(x))))
    Par.spread(emb).select(
      col(idCol).as("vec_id"),
      graft.functions.Num.fpRound(scale, 6).as("scale"),
      when(absMax > 0,
        graft.functions.Num.fpRound(sqrt(sqErr / size(v)), 6))
        .otherwise(lit(0.0d)).as("rmse"),
      when(absMax > 0, qMax.cast("long")).otherwise(lit(0L)).as("q_max"))
  }

  /** Top-k ANN over the int8-QUANTIZED grid — the search half of
    * [[quantizeReport]] (report the error, then actually search the
    * compressed index): both sides are quantized to the per-vector
    * symmetric int8 grid and ranked by QUANTIZED cosine. The per-vector
    * scales cancel in the cosine — `(Σq₁q₂·s₁s₂) / (√Σq₁²·s₁ · √Σq₂²·s₂)
    * = Σq₁q₂ / (√Σq₁² · √Σq₂²)` — so the similarity derives entirely
    * from INTEGER sums (64 dims × 127² fits comfortably in a long):
    * exact, engine-portable, and the memory story at 100 TB is the
    * point — the scan side moves 8-bit codes, 4× less than float32,
    * which is what makes a brute-force re-rank tier affordable.
    *
    * Plan shape mirrors [[bruteForceTopK]]: quantization is a scan-side
    * per-row projection on BOTH sides (no quantized index table needed
    * here — persist the projected codes via `Sinks.writeBucketed` for
    * the production read path), the query set broadcasts, per-query
    * top-k is a ranking window partitioned by query. Direction-less
    * vectors (all-zero: no grid) are excluded on both sides; ties break
    * by ascending neighbor id as everywhere. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    def absMax(v: Column): Column =
      array_max(transform(v, x => abs(x.cast("double"))))
    def prep(df: DataFrame, id: String, q: String, n: String): DataFrame = {
      val v = col(vecCol)
      val scale = absMax(v) / lit(127.0)
      df.filter(absMax(col(vecCol)) > 0)
        .select(col(idCol).as(id),
          transform(v, x => floor(x.cast("double") / scale + 0.5)).as(q))
        .withColumn(n, sqrt(
          aggregate(col(q), lit(0L), (a, x) => a + x * x).cast("double")))
    }
    val qs = prep(queries, "query_id", "qq", "qn")
    val cs = Par.spread(prep(corpus, "neighbor_id", "cq", "cn"))
    val scored = cs.join(broadcast(qs),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("similarity",
        aggregate(zip_with(col("qq"), col("cq"), (a, b) => a * b),
          lit(0L), (a, x) => a + x).cast("double") /
          (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        graft.functions.Num.fpRound(col("similarity"), 6).as("similarity"))
  }

  /** Lloyd k-means codebook TRAINING — the missing front of the IVF
    * family (x10/x22/x70 consume a centroid table; this trains one).
    * `init` seeds the k clusters (cluster_id = the seed's id); each
    * round assigns every vector to its argmax-cosine centroid (the
    * [[VectorExpressions.nearestCentroid]] codegen kernel — one
    * zero-shuffle corpus pass) and recomputes centroids as member
    * means. Returns the final per-vector assignment
    * `(vec_id, cluster_id)` under the round-`rounds` codebook; clusters
    * that lose all members drop out (SQL GROUP BY semantics, which is
    * what an oracle can mirror).
    *
    * Cross-engine determinism: vectors are first snapped to the 1e-6
    * integer grid (half-up, cosine is scale-invariant), so the mean
    * aggregate is an EXACT integer sum — no float-accumulation drift —
    * and new centroid components are the IEEE double `sum/count`
    * rounded through float (the kernel's storage type), a computation
    * DuckDB replicates bit-for-bit (`CAST(CAST(s/n AS REAL) AS
    * DOUBLE)`). Grid values stay < 2^24 for any |x| < 16, so the
    * float-typed kernel input is lossless.
    *
    * Scale shape: `rounds` passes over the quantized corpus (cached
    * here; at warehouse scale persist it once — it is the 100 TB
    * artifact, the k×dims stats rows per round are the only driver
    * traffic, the [[collectCentroids]] tier). Each pass is one
    * map-side-combined aggregate: k×dims partials per partition, no
    * row blowup beyond the dims-explode, no join anywhere.
    *
    * Precondition: non-null vectors (a NULL row would take a NULL
    * cluster in the output while vanishing from the mean aggregate —
    * filter upstream; the fixtures carry none). */
  def kmeansCodebook(corpus: DataFrame, init: DataFrame, idCol: String,
                     vecCol: String, rounds: Int): DataFrame = {
    val (quant, cents) = lloyd(corpus, init, idCol, vecCol, rounds)
    val ids = cents.map(_._1); val vecs = cents.map(_._2)
    quant.select(col("vec_id"),
      VectorExpressions.nearestCentroid(col("qf"), ids, vecs)
        .as("cluster_id"))
  }

  /** The TRAINED codebook itself as a `(centroid_id, centv)` frame —
    * [[kmeansCodebook]]'s centroids instead of its assignment, in
    * [[writeAnnIndex]]'s centroid-table shape, so the self-trained ANN
    * stack composes: train (x90) → build the index under the learned
    * codebook → query (x91/x92). Components are the grid-scale float
    * means (cosine is scale-invariant, so assignment against them
    * equals assignment against the down-scaled codebook). */
  def kmeansCentroids(corpus: DataFrame, init: DataFrame, idCol: String,
                      vecCol: String, rounds: Int): DataFrame = {
    val (quant, cents) = lloyd(corpus, init, idCol, vecCol, rounds)
    quant.unpersist()
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.toSeq.toDF("centroid_id", "centv")
  }

  /** Shared Lloyd loop: returns the cached quantized corpus and the
    * round-`rounds` centroids (sorted by cluster id). See
    * [[kmeansCodebook]] for the determinism and scale notes. */
  private def lloyd(corpus: DataFrame, init: DataFrame, idCol: String,
                    vecCol: String, rounds: Int)
      : (DataFrame, Array[(Long, Array[Float])]) = {
    require(rounds >= 1, "rounds must be >= 1")
    def grid(v: Column): Column =
      transform(v, x => floor(x.cast("double") * lit(1e6) + lit(0.5)))
    val quant = Par.spread(corpus.select(col(idCol).cast("long").as("vec_id"),
        grid(col(vecCol)).cast("array<long>").as("qv")))
      .withColumn("qf", col("qv").cast("array<float>"))
      .cache() // read once per round + once for the result (CACHE
               // CONTRACT: keyed to the returned plan, caller clears)
    var cents: Array[(Long, Array[Float])] = init
      .select(col(idCol).cast("long"), grid(col(vecCol)).cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, "init must seed at least one cluster")
    (1 to rounds).foreach { _ =>
      val ids = cents.map(_._1); val vecs = cents.map(_._2)
      val stats = quant
        .select(VectorExpressions.nearestCentroid(col("qf"), ids, vecs)
            .as("cid"),
          posexplode(col("qv")).as(Seq("d", "q")))
        .groupBy(col("cid"), col("d"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect() // k × dims rows — codebook-sized, never corpus-sized
      cents = stats
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_._2).map(t => (t._3.toDouble / t._4).toFloat)) }
        .toArray.sortBy(_._1)
    }
    (quant, cents)
  }

  /** Persist the IVF index as catalog tables — the [[ivfTopK]] scale
    * contract ("at 100 TB the assignment is computed once and
    * persisted/bucketed by centroid_id") made real, the embedding-side
    * twin of [[TextDedup.writeNeardupIndex]] (x80/x81):
    *  - `centTable`: the codebook (centroid_id, centv) — tiny, read
    *    whole by every query.
    *  - `assignTable`: (centroid_id, neighbor_id, cv, cn) BUCKETED by
    *    centroid_id — corpus vectors with their PRE-COMPUTED norms,
    *    assigned by one pass of the nearest-centroid kernel at build
    *    time. A probe reads only its buckets' files; nothing about the
    *    corpus is recomputed at query time. */
  def writeAnnIndex(corpus: DataFrame, centroids: DataFrame, idCol: String,
                    vecCol: String, assignTable: String, centTable: String,
                    numBuckets: Int = 16): Unit = {
    val (ids, vecs) = collectCentroids(centroids, idCol, vecCol)
    require(ids.nonEmpty, "centroids must be non-empty to build an index")
    centroids.select(col(idCol).cast("long").as("centroid_id"),
        col(vecCol).as("centv"))
      .write.mode("overwrite").format("parquet").saveAsTable(centTable)
    val assigned = Par.spread(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cv"), Vectors.norm(col(vecCol)).as("cn")))
      .withColumn("centroid_id",
        VectorExpressions.nearestCentroid(col("cv"), ids, vecs))
    graft.sinks.Sinks.writeBucketed(assigned, assignTable,
      Seq("centroid_id"), numBuckets)
  }

  /** [[ivfTopK]] over a [[writeAnnIndex]] artifact: centroids come from
    * the codebook table (collected — codebook-sized), corpus vectors and
    * their norms from the bucketed assignment table. The corpus side is
    * a pure index scan — no nearest-centroid kernel, no norm recompute —
    * and the probe list broadcasts, so the only exchange in the plan is
    * the per-query top-k window's.
    *
    * The probed centroid set is collected first (ONE eager job at
    * construction time, bounded by the query count × nprobe — the
    * degenerate-input-guard tier) and pushed as an IN predicate on the
    * bucket column: a broadcast join alone would scan the whole table,
    * but an IN on the bucketing key engages Spark's bucket pruning
    * (`SelectedBucketsCount` in the scan, spec-pinned), so the query
    * READS only nprobe/numCentroids of the index files — the actual
    * IVF promise. Rows are identical to [[ivfTopK]] with the same
    * centroid set (the same assignment kernel ran at build time). */
  def ivfTopKIndexed(queries: DataFrame, idCol: String, vecCol: String,
                     k: Int, nprobe: Int, assignTable: String,
                     centTable: String): DataFrame =
    ivfScoredIndexed(queries, idCol, vecCol, nprobe, assignTable,
        centTable) match {
      case None =>
        queries.select(col(idCol).as("query_id"),
          col(idCol).as("neighbor_id"), lit(null).cast("long").as("rank"),
          lit(null).cast("double").as("similarity")).limit(0)
      case Some(scored) =>
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("similarity").desc, col("neighbor_id"))
        scored
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("neighbor_id"),
            col("rank").cast("long").as("rank"),
            graft.functions.Num.fpRound(col("similarity"), 6)
              .as("similarity"))
    }

  /** The shared probe-and-score core under [[ivfTopKIndexed]] and
    * [[diversifiedTopKIndexed]]: probe list from the collected codebook
    * (one eager job, codebook-bounded), probed-centroid IN pushed onto
    * the assignment table's bucket column, exact cosine on the pruned
    * stream. Returns the scored candidates
    * `(query_id, neighbor_id, centroid_id, similarity)` with
    * UNROUNDED similarity (the tails' windows order on it), or None
    * when the centroid table is empty. */
  private def ivfScoredIndexed(queries: DataFrame, idCol: String,
                               vecCol: String, nprobe: Int,
                               assignTable: String, centTable: String)
      : Option[DataFrame] = {
    val spark = queries.sparkSession
    val (ids, vecs) = collectCentroids(
      spark.table(centTable), "centroid_id", "centv")
    if (ids.isEmpty) return None
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Vectors.norm(col(vecCol)).as("qn"))
      .withColumn("centroid_id", explode(
        VectorExpressions.probeCentroids(col("qv"), ids, vecs, nprobe)))
    val probed = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0))
    Some(spark.table(assignTable)
      .filter(col("centroid_id").isin(probed: _*))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("similarity", Vectors.cosinePrenormed(
        col("qv"), col("cv"), col("qn"), col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("centroid_id"),
        col("similarity"), col("cv"), col("cn")))
  }

  /** CLUSTER-CAPPED diversified top-k (x142) — result diversification
    * over the persisted IVF index: at most `perCluster` results per
    * (query, IVF cell), survivors re-ranked by similarity into the
    * final top-k. The IVF cell is a quantized neighborhood, so the cap
    * is an MMR-lite diversity rule with ZERO extra distance
    * computations: a near-dup pile-up (the x9/x22 failure mode in
    * serving — one cluster of paraphrases filling the whole result
    * page) can take at most `perCluster` slots, and the cell id is already
    * on every scored row because the index carries it.
    *
    * Output `(query_id, neighbor_id, centroid_id, rank, similarity)` —
    * the cell id stays exposed so callers can see WHICH neighborhoods
    * the page drew from.
    *
    * Scale shape: identical corpus cost to [[ivfTopKIndexed]] (same
    * bucket-pruned scan, same broadcast probe join); the cap window
    * partitions by (query, cell) — the probe stream's own grain, one
    * exchange of the pruned candidates — and the final re-rank window
    * sees only ≤ queries·nprobe·perCluster rows. */
  def diversifiedTopKIndexed(queries: DataFrame, idCol: String,
                             vecCol: String, k: Int, nprobe: Int,
                             perCluster: Int, assignTable: String,
                             centTable: String): DataFrame = {
    require(perCluster >= 1,
      s"perCluster must be >= 1, got $perCluster")
    ivfScoredIndexed(queries, idCol, vecCol, nprobe, assignTable,
        centTable) match {
      case None =>
        queries.select(col(idCol).as("query_id"),
          col(idCol).as("neighbor_id"),
          lit(null).cast("long").as("centroid_id"),
          lit(null).cast("long").as("rank"),
          lit(null).cast("double").as("similarity")).limit(0)
      case Some(scored) =>
        val wc = Window.partitionBy(col("query_id"), col("centroid_id"))
          .orderBy(col("similarity").desc, col("neighbor_id"))
        val wq = Window.partitionBy(col("query_id"))
          .orderBy(col("similarity").desc, col("neighbor_id"))
        scored
          .withColumn("_cr", row_number().over(wc))
          .filter(col("_cr") <= perCluster)
          .withColumn("rank", row_number().over(wq))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("neighbor_id"),
            col("centroid_id").cast("long").as("centroid_id"),
            col("rank").cast("long").as("rank"),
            graft.functions.Num.fpRound(col("similarity"), 6)
              .as("similarity"))
    }
  }

  /** Incremental EMBEDDING near-dup over the persisted IVF index — the
    * x74/x75/x80 continuous-ingestion shape on the vector side: a new
    * vector is dropped when its cosine to ANY indexed vector in its
    * `nprobe` probed buckets reaches `threshold`; survivors return
    * unchanged. Blocking is deliberately approximate exactly like x22
    * (cross-bucket pairs are out of scope by construction — an oracle
    * mirrors the probe list), and the existing corpus contributes ONLY
    * its index artifact: no corpus vector is re-assigned, no norm
    * recomputed.
    *
    * Scale shape: the probed-centroid IN predicate engages bucket
    * pruning on the scan, and the index side takes a shuffle-hash join
    * (x80's convention) so candidates shuffle TO the table's bucketing
    * — the index stays where it is; probe rows (batch × nprobe) move.
    * One eager job collects the probed-centroid set (codebook-bounded).
    */
  def embeddingSurvivorsIndexed(batch: DataFrame, idCol: String,
                                vecCol: String, threshold: Double,
                                nprobe: Int, assignTable: String,
                                centTable: String): DataFrame = {
    val spark = batch.sparkSession
    val (ids, vecs) = collectCentroids(
      spark.table(centTable), "centroid_id", "centv")
    if (ids.isEmpty) return batch
    val probes = Par.spread(batch.select(col(idCol).as("new_id"),
        col(vecCol).as("qv"), Vectors.norm(col(vecCol)).as("qn")))
      .withColumn("centroid_id", explode(
        VectorExpressions.probeCentroids(col("qv"), ids, vecs, nprobe)))
    val probed = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0))
    val drops = spark.table(assignTable)
      .filter(col("centroid_id").isin(probed: _*))
      .hint("shuffle_hash")
      .join(probes, Seq("centroid_id"))
      .withColumn("similarity", Vectors.cosinePrenormed(
        col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("similarity") >= threshold)
      .select(col("new_id").as(idCol)).distinct()
    batch.join(drops, Seq(idCol), "left_anti")
  }

  /** Incremental maintenance of [[writeAnnIndex]] — the
    * [[TextDedup.appendNeardupIndex]] pairing on the vector side:
    * assign `batch` with the PERSISTED codebook (no re-clustering;
    * codebook drift is a rebuild decision, made offline) and append
    * its (centroid_id, neighbor_id, cv, cn) rows to the bucketed
    * assignment table — one file per bucket per ingest, so the index
    * stays scan-efficient; compact by rebuilding via [[writeAnnIndex]]
    * when file counts warrant. */
  def appendAnnIndex(batch: DataFrame, idCol: String, vecCol: String,
                     assignTable: String, centTable: String,
                     numBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val (ids, vecs) = collectCentroids(
      spark.table(centTable), "centroid_id", "centv")
    require(ids.nonEmpty, "codebook table is empty — build the index first")
    val assigned = Par.spread(batch.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cv"), Vectors.norm(col(vecCol)).as("cn")))
      .withColumn("centroid_id",
        VectorExpressions.nearestCentroid(col("cv"), ids, vecs))
    graft.sinks.Sinks.writeBucketed(assigned, assignTable,
      Seq("centroid_id"), numBuckets, append = true)
  }

  // ---------- Product quantization (x120/x121) ----------
  //
  // The memory tier the rest of the ANN family doesn't cover: IVF
  // (x10/x91) prunes WHICH vectors a query touches; PQ compresses WHAT
  // each touched vector costs — m sub-codes instead of `dim` floats
  // (here 4 codes for 64 floats, a 64× working-set cut at byte-sized
  // codes), the standard RAM-resident layout for billion-vector search
  // (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  // TPAMI 2011; the FAISS IVF-PQ layout). Distances are asymmetric
  // (ADC): the query stays exact, each corpus vector is replaced by its
  // per-subspace nearest codeword, and L2(q, x) ≈ Σ_j L2(q_j, c_{j,
  // code_j(x)}) — exact per-subspace tables, summed.
  //
  // Cross-engine determinism (the same discipline as [[kmeansCodebook]],
  // but integer-exact end to end): vectors snap to the 1e-6 grid; the
  // working scale is grid/1e6 (two IEEE ops both engines replicate);
  // every per-dimension squared difference is floor-rounded to an
  // integer at 1e-6 — so subspace distances are EXACT LONGS, argmin and
  // ranking compare integers, and no float sum ever crosses an
  // aggregation boundary. Centroid updates divide exact long sums
  // (CAST(s AS DOUBLE)/n, then /1e6). Ties: argmin → smallest cid;
  // ranking → ascending neighbor id. Empty clusters drop from the
  // codebook (both engines rebuild it from the round's assignments).

  /** Per-dimension-rounded integer L2 distance between a grid-long
    * slice and a down-scaled literal centroid: Σ_d floor(((q_d/1e6) −
    * c_d)² · 1e6 + 0.5) — exact (each term ≤ 6.4e7, 16-dim sums ≪
    * 2^63). */
  private def pqDist(sl: Column, cent: Seq[Double]): Column =
    aggregate(
      zip_with(sl, typedlit(cent), (q, c) =>
        floor(((q.cast("double") / lit(1e6)) - c) *
          ((q.cast("double") / lit(1e6)) - c) * lit(1e6) + lit(0.5))
          .cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** (code cid, distance table) for one subspace against a literal
    * codebook: the table is the k exact-long distances in cid order;
    * the code is the cid at the FIRST minimum (ties → smallest cid). */
  private def pqAssign(sl: Column,
                       cents: Array[(Long, Array[Double])]): (Column, Column) = {
    val dists = array(cents.map(c => pqDist(sl, c._2.toIndexedSeq)): _*)
    val cid = element_at(typedlit(cents.map(_._1).toIndexedSeq),
      array_position(dists, array_min(dists)).cast("int"))
    (cid, dists)
  }

  /** Train the m per-subspace codebooks (Lloyd's on each slice) over the
    * cached grid corpus; returns (quantized corpus with `qv`, per-sub
    * codebooks as (cid, down-scaled centroid)). CACHE CONTRACT: the
    * returned frame's cache is caller-owned.
    *
    * SEEDING CONTRACT: the initial codewords are the k SMALLEST ids in
    * the training set (deterministic and id-layout-independent — a
    * corpus whose ids don't start near 0 still seeds k codewords).
    *
    * `trainPct` < 100 trains on a deterministic md5-bucket sample
    * (md5(id) mod 100 < trainPct — the x26/x37 split convention, no
    * RNG) while the returned grid frame still covers EVERYTHING, so
    * encode stays full-corpus. This is the documented 100 TB practice:
    * the m·rounds Lloyd aggregation passes scan only the sample (a
    * codebook is k·dim numbers — a bounded sample estimates it as well
    * as the corpus does), the one encode pass scans everything. */
  private def pqFit(corpus: DataFrame, idCol: String, vecCol: String,
                    m: Int, k: Int, rounds: Int, trainPct: Int = 100)
      : (DataFrame, Int, Array[Array[(Long, Array[Double])]]) = {
    require(rounds >= 1, "rounds must be >= 1")
    require(trainPct >= 1 && trainPct <= 100,
      s"trainPct must be in [1, 100], got $trainPct")
    val quant = Par.spread(corpus.select(col(idCol).cast("long").as("vec_id"),
        transform(col(vecCol), x =>
          floor(x.cast("double") * lit(1e6) + lit(0.5)))
          .cast("array<long>").as("qv")))
      .cache() // m·rounds stats passes + the encode read
    val dim = quant.select(size(col("qv"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val train = if (trainPct >= 100) quant else quant.filter(
      pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(100L)) < trainPct)
    val books = (0 until m).toArray.map { j =>
      val sl = slice(col("qv"), j * subDim + 1, subDim)
      var cents: Array[(Long, Array[Double])] =
        train.orderBy(col("vec_id")).limit(k)
          .select(col("vec_id"), sl.as("s")).collect()
          .map(r => (r.getLong(0),
            r.getSeq[Long](1).map(_.toDouble / 1e6).toArray))
          .sortBy(_._1)
      require(cents.nonEmpty, "init must seed at least one codeword")
      (1 to rounds).foreach { _ =>
        val stats = train
          .select(pqAssign(sl, cents)._1.as("cid"),
            posexplode(sl).as(Seq("d", "q")))
          .groupBy(col("cid"), col("d"))
          .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
          .collect() // k × subDim rows — codebook-sized
        cents = stats
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .groupBy(_._1)
          .map { case (cid, rows) =>
            (cid, rows.sortBy(_._2)
              .map(t => (t._3.toDouble / t._4) / 1e6).toArray) }
          .toArray.sortBy(_._1)
      }
      cents
    }
    (quant, subDim, books)
  }

  /** PQ codes for every corpus vector (x120): `(vec_id, code_0 ..
    * code_{m-1})` — each code the cid of the subspace's nearest
    * codeword under the integer-exact L2 above. This is the 100 TB
    * compression artifact: training touches the corpus m·rounds times
    * for codebook-sized stats (at warehouse scale: train on a sample —
    * `trainPct` < 100 does exactly that via the deterministic md5
    * bucket cut, the codebook is k·dim numbers), and the encode itself
    * is ONE scan whose output is m small ints per vector — the frame a
    * production deployment persists next to (or instead of) the raw
    * vectors. Codebooks seed from the k smallest training ids (the
    * [[pqFit]] seeding contract). CACHE CONTRACT: the gridded corpus
    * backing the returned frame stays cached; caller owns the release
    * (`spark.catalog.clearCache()` or consume-and-drop). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int = 4, k: Int = 8, rounds: Int = 2,
               trainPct: Int = 100): DataFrame = {
    val (quant, subDim, books) =
      pqFit(corpus, idCol, vecCol, m, k, rounds, trainPct)
    val codeCols = (0 until m).map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }
    quant.select(col("vec_id") +: codeCols: _*)
  }

  /** PQ DISTORTION report (x122) — the codebook acceptance metric: how
    * much information the compression throws away, per subspace. For
    * every vector, the (exact integer) L2 distance to its OWN assigned
    * codeword — i.e. the quantization error ADC search inherits —
    * aggregated to `(sub, n_vectors, avg_dist, max_dist)`. A subspace
    * whose avg/max dwarf the others needs more codewords (or a
    * rotation); the report is to PQ what x101's balance audit is to
    * IVF and x72's RMSE is to int8 quantization.
    *
    * Scale shape: training as [[pqEncode]]; the report itself is one
    * scan (the per-vector min over each subspace's k exact-long
    * distances — the assignment distance, no second argmin pass) into
    * an m-row aggregate. Exact-long sums; the two-step average
    * division and the 1e-6 down-scale are mirrored op-for-op in the
    * oracle.
    *
    * `trainPct` < 100 trains the books on the md5-bucket sample but
    * still reports distortion over the WHOLE corpus — exactly the
    * acceptance question sampled training raises ("how much fit did
    * the sample cost?"); compare against the trainPct=100 report. The
    * result is fully aggregated (m rows), so the training cache is
    * released here rather than left to the caller (the one extra grid
    * computation on the final scan is one pass — cheaper at corpus
    * scale than a corpus-sized MEMORY pin). */
  def pqDistortion(corpus: DataFrame, idCol: String, vecCol: String,
                   m: Int = 4, k: Int = 8, rounds: Int = 2,
                   trainPct: Int = 100): DataFrame = {
    val (quant, subDim, books) =
      pqFit(corpus, idCol, vecCol, m, k, rounds, trainPct)
    quant.unpersist()
    distortionReport(quant, subDim, books)
  }

  /** The one-scan distortion tail shared by [[pqDistortion]] and
    * [[pqDistortionWithBooks]]: per vector, the min over each
    * subspace's k exact-long distances (the assignment distance), into
    * an m-row aggregate. */
  private def distortionReport(quant: DataFrame, subDim: Int,
      books: Array[Array[(Long, Array[Double])]]): DataFrame = {
    val minCols = books.indices.map { j =>
      array_min(pqAssign(slice(col("qv"), j * subDim + 1, subDim),
        books(j))._2) }
    quant.select(posexplode(array(minCols: _*)).as(Seq("sub", "d")))
      .groupBy(col("sub"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d")).as("_s"),
        max(col("d")).as("_mx"))
      .select(col("sub"), col("n_vectors"),
        graft.functions.Num.fpRound(
          (col("_s").cast("double") / col("n_vectors")) / lit(1e6), 6)
          .as("avg_dist"),
        (col("_mx").cast("double") / lit(1e6)).as("max_dist"))
  }

  /** IVF-PQ top-k (x123) — the two index families COMPOSED, the layout
    * billion-vector deployments actually run (FAISS `IVF…,PQ…`): IVF
    * prunes WHICH vectors a query touches (nprobe of numCentroids
    * buckets, x10's machinery), PQ compresses WHAT each touched vector
    * costs (m codes + table lookups, x121's machinery). A query reads
    * nprobe/numCentroids of the corpus and pays m integer ops per
    * candidate — both cuts at once.
    *
    * Scale shape: ONE corpus scan emits (bucket, codes) — the
    * persistable artifact; at warehouse scale it is written bucketed
    * by centroid_id ([[writeAnnIndex]]'s contract) so a probe reads
    * only its buckets' files, and the row is m+1 small ints instead of
    * cv+norm. The probe join broadcasts nprobe rows per query (each
    * carrying its m distance tables); ranking is x121's
    * (ids, long)-tuple window. Bucketing is cosine (the IVF family's
    * metric here), candidate ranking is integer-exact ADC L2 —
    * deterministic on both axes. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String, topK: Int, nprobe: Int,
                m: Int = 4, k: Int = 8, rounds: Int = 2,
                trainPct: Int = 100): DataFrame = {
    val (ids, vecs) = collectCentroids(centroids, idCol, vecCol)
    require(ids.nonEmpty, "centroids must be non-empty")
    val (quant, subDim, books) =
      pqFit(corpus, idCol, vecCol, m, k, rounds, trainPct)
    quant.unpersist()
    ivfPqRank(queries, corpus, idCol, vecCol, ids, vecs, books, subDim,
      topK, nprobe)
  }

  /** [[ivfPqTopK]] under FROZEN pre-trained codebooks (a
    * [[writeIvfPqIndex]] books table) — the train-once consolidation
    * [[pqTopKWithBooks]] gives the flat-PQ exhibits, applied to the
    * composed layout: coarse bucket pruning and the inline
    * (bucket, codes) encode both run under the persisted books, zero
    * Lloyd rounds. Rows identical to [[ivfPqTopK]] when the books were
    * trained with the same knobs on the same corpus ([[pqFit]] is
    * deterministic — the x127 guarantee). [[ivfPqTopKIndexed]] is
    * cheaper still when the CODES for this corpus snapshot are also
    * persisted; this form is for scoring a fresh snapshot under an
    * existing model. */
  def ivfPqTopKWithBooks(spark: org.apache.spark.sql.SparkSession,
                         queries: DataFrame, corpus: DataFrame,
                         centroids: DataFrame, idCol: String,
                         vecCol: String, booksTable: String, topK: Int,
                         nprobe: Int): DataFrame = {
    val (ids, vecs) = collectCentroids(centroids, idCol, vecCol)
    require(ids.nonEmpty, "centroids must be non-empty")
    val books = readBooks(spark, booksTable)
    val subDim = books(0)(0)._2.length
    ivfPqRank(queries, corpus, idCol, vecCol, ids, vecs, books, subDim,
      topK, nprobe)
  }

  /** The shared IVF-PQ tail under [[ivfPqTopK]] and
    * [[ivfPqTopKWithBooks]]: one corpus scan emits (bucket, codes)
    * under the given books, probes broadcast nprobe rows per query,
    * integer-exact ADC ranking. */
  private def ivfPqRank(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, ids: Array[Long],
                        vecs: Array[Array[Float]],
                        books: Array[Array[(Long, Array[Double])]],
                        subDim: Int, topK: Int, nprobe: Int): DataFrame = {
    val m = books.length
    val codeCols = (0 until m).map { j =>
      pqAssign(slice(col("_qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }
    val assigned = Par.spread(corpus.select(
        col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cv"),
        gridded(col(vecCol)).as("_qv")))
      .withColumn("centroid_id",
        VectorExpressions.nearestCentroid(col("cv"), ids, vecs))
      .select(col("centroid_id") +: col("neighbor_id") +: codeCols: _*)
    val tableCols = (0 until m).map { j =>
      pqAssign(slice(col("_qv"), j * subDim + 1, subDim), books(j))._2
        .as(s"t_$j") }
    val probes = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qvf"), gridded(col(vecCol)).as("_qv"))
      .withColumn("centroid_id", explode(
        VectorExpressions.probeCentroids(col("qvf"), ids, vecs, nprobe)))
      .select(col("centroid_id") +: col("query_id") +: tableCols: _*)
    val adc = (0 until m).map { j =>
      element_at(col(s"t_$j"),
        array_position(typedlit(books(j).map(_._1).toIndexedSeq),
          col(s"code_$j")).cast("int"))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_int").asc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_int", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        (col("adc_int").cast("double") / lit(1e6)).as("adc_dist"))
  }

  /** Asymmetric-distance top-k (x121): each query scores the WHOLE
    * corpus through its codes alone — per-subspace distance tables
    * (k exact longs each) are computed once per query, broadcast, and
    * every corpus vector costs m table lookups + an integer add, never
    * a dim-length float walk. Returns `(query_id, neighbor_id, rank,
    * adc_dist)`, ranked by (exact integer ADC asc, neighbor id).
    *
    * Scale shape: corpus vectors are read once to encode (at
    * 100 TB the code frame is the persisted artifact — see
    * [[pqEncode]] — and this stage reads codes only); the query frame
    * with its tables broadcasts; the only exchange is the per-query
    * top-k ranking window over (ids, long) tuples, x3's shape.
    * CACHE CONTRACT: as [[pqEncode]] — the gridded corpus stays
    * cached, caller owns the release. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, topK: Int, m: Int = 4, k: Int = 8,
             rounds: Int = 2, trainPct: Int = 100): DataFrame = {
    val (quant, subDim, books) =
      pqFit(corpus, idCol, vecCol, m, k, rounds, trainPct)
    val codeCols = (0 until m).map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }
    val codes = quant.select(col("vec_id").as("neighbor_id") +: codeCols: _*)
    val q = Par.spread(queries.select(col(idCol).cast("long").as("query_id"),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(1e6) + lit(0.5)))
        .cast("array<long>").as("qv")))
    val tableCols = (0 until m).map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._2
        .as(s"t_$j") }
    val qt = q.select(col("query_id") +: tableCols: _*)
    adcRank(codes, qt, books, topK)
  }

  /** The shared ADC ranking tail under [[pqTopK]] and
    * [[pqTopKIndexed]]: broadcast the query frame (each row carrying
    * its m distance tables), score every code row with m lookups +
    * integer adds, per-query top-k window over (ids, long) tuples. */
  private def adcRank(codes: DataFrame, qt: DataFrame,
                      books: Array[Array[(Long, Array[Double])]],
                      topK: Int): DataFrame = {
    val adc = books.indices.map { j =>
      element_at(col(s"t_$j"),
        array_position(typedlit(books(j).map(_._1).toIndexedSeq),
          col(s"code_$j")).cast("int"))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_int").asc, col("neighbor_id"))
    codes.join(broadcast(qt), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_int", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        (col("adc_int").cast("double") / lit(1e6)).as("adc_dist"))
  }

  /** Persist the PQ index as catalog tables — the x80/x91/x107
    * convention on the PQ side: `codesTable` holds `(vec_id, code_0 ..
    * code_{m-1})` (the m-small-ints-per-vector artifact [[pqEncode]]
    * describes), `booksTable` the trained codebooks as `(sub, cid,
    * centv)` rows (m·k rows — tiny, read whole by every query). Built
    * once per corpus snapshot; [[pqTopKIndexed]] then serves queries
    * with ZERO training work and zero corpus-vector reads. */
  def writePqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   codesTable: String, booksTable: String,
                   m: Int = 4, k: Int = 8, rounds: Int = 2,
                   trainPct: Int = 100): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (quant, subDim, books) =
      pqFit(corpus, idCol, vecCol, m, k, rounds, trainPct)
    val codeCols = (0 until m).map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }
    quant.select(col("vec_id") +: codeCols: _*)
      .write.mode("overwrite").format("parquet").saveAsTable(codesTable)
    quant.unpersist()
    books.zipWithIndex.toSeq
      .flatMap { case (cents, j) =>
        cents.toSeq.map { case (cid, cv) => (j, cid, cv.toSeq) } }
      .toDF("sub", "cid", "centv")
      .write.mode("overwrite").format("parquet").saveAsTable(booksTable)
  }

  /** A trained PQ model with a MANAGED cache — the bracket form of
    * [[pqEncode]]/[[pqTopK]] for library users outside a harness that
    * calls `spark.catalog.clearCache()`: inside
    * [[Similarity.withPqModel]]'s body, [[codes]] and [[topK]] serve
    * from the shared cached grid corpus (training paid ONCE however
    * many calls); at body exit the cache is released unconditionally.
    * CONSUME results inside the body (write/collect) — frames
    * returned out of the bracket would recompute the grid scan-side
    * on their next action (still correct, no longer cached). */
  final class PqModel private[Similarity](quant: DataFrame, subDim: Int,
      books: Array[Array[(Long, Array[Double])]]) {
    private def codeCols = books.indices.map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }

    /** [[pqEncode]]'s frame under the bracket's cache. */
    def codes: DataFrame = quant.select(col("vec_id") +: codeCols: _*)

    /** [[pqTopK]]'s frame under the bracket's cache. */
    def topK(queries: DataFrame, idCol: String, vecCol: String,
             topK: Int): DataFrame = {
      val q = Par.spread(queries.select(
        col(idCol).cast("long").as("query_id"),
        transform(col(vecCol), x =>
          floor(x.cast("double") * lit(1e6) + lit(0.5)))
          .cast("array<long>").as("qv")))
      val tableCols = books.indices.map { j =>
        pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._2
          .as(s"t_$j") }
      adcRank(quant.select(col("vec_id").as("neighbor_id") +: codeCols: _*),
        q.select(col("query_id") +: tableCols: _*), books, topK)
    }
  }

  /** Train once, serve many, release the cache on exit — returns the
    * body's result. Same training contract as [[pqEncode]] (seeding,
    * `trainPct` sampling); unlike the open-ended CACHE CONTRACT
    * there, the gridded corpus is unpersisted in a `finally`, so no
    * cached RDD survives the call however the body exits. */
  def withPqModel[T](corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int = 4, k: Int = 8, rounds: Int = 2,
                     trainPct: Int = 100)(body: PqModel => T): T = {
    val (quant, subDim, books) =
      pqFit(corpus, idCol, vecCol, m, k, rounds, trainPct)
    try body(new PqModel(quant, subDim, books))
    finally quant.unpersist()
  }

  /** Incremental PQ index MAINTENANCE: encode an arriving batch with
    * the FROZEN persisted codebooks and append its codes — the
    * continuous-ingestion contract of [[graft.operators.TextDedup]]'s
    * x74/x75 and [[appendAnnIndex]], on the PQ side. Freezing is the
    * standard deployment practice (the codebook is the trained model;
    * retraining re-codes the whole corpus), so after the append
    * [[pqTopKIndexed]] serves the union corpus with the batch scored
    * through the same codebooks as everything else. Retrain + rebuild
    * ([[writePqIndex]]) when x122's distortion report says the frozen
    * books no longer fit the distribution. */
  /** Collect a [[writePqIndex]] codebook table back into [[pqFit]]'s
    * in-memory shape — m·k rows, driver-sized by construction. */
  private def readBooks(spark: org.apache.spark.sql.SparkSession,
                        booksTable: String)
      : Array[Array[(Long, Array[Double])]] = {
    val raw = spark.table(booksTable)
      .select(col("sub"), col("cid"), col("centv")).collect()
    require(raw.nonEmpty, s"codebook table $booksTable is empty — " +
      "build the index first")
    raw.groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map(_._2.map(r => (r.getLong(1), r.getSeq[Double](2).toArray))
        .sortBy(_._1))
  }

  def appendPqIndex(batch: DataFrame, idCol: String, vecCol: String,
                    codesTable: String, booksTable: String): Unit = {
    val spark = batch.sparkSession
    val books = readBooks(spark, booksTable)
    val subDim = books(0)(0)._2.length
    val codeCols = books.indices.map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }
    Par.spread(batch.select(col(idCol).cast("long").as("vec_id"),
        transform(col(vecCol), x =>
          floor(x.cast("double") * lit(1e6) + lit(0.5)))
          .cast("array<long>").as("qv")))
      .select(col("vec_id") +: codeCols: _*)
      .write.mode("append").format("parquet").saveAsTable(codesTable)
  }

  /** ADC top-k against the PERSISTED index (x124) — [[pqTopK]]'s rows
    * with the steady-state cost profile: the codebooks (m·k rows) read
    * driver-side, the query's distance tables built from them, and the
    * corpus side touching ONLY the codes table — no Lloyd rounds, no
    * embedding scan, no grid kernel on the corpus (plan-pinned). The
    * repeated-retrieval twin of x91/x107/x110. */
  def pqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                    queries: DataFrame, idCol: String, vecCol: String,
                    codesTable: String, booksTable: String,
                    topK: Int): DataFrame = {
    val books = readBooks(spark, booksTable)
    val m = books.length
    val subDim = books(0)(0)._2.length
    val q = Par.spread(queries.select(col(idCol).cast("long").as("query_id"),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(1e6) + lit(0.5)))
        .cast("array<long>").as("qv")))
    val tableCols = (0 until m).map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._2
        .as(s"t_$j") }
    val qt = q.select(col("query_id") +: tableCols: _*)
    val codes = spark.table(codesTable)
      .withColumnRenamed("vec_id", "neighbor_id")
    adcRank(codes, qt, books, topK)
  }

  /** [[pqTopK]] under FROZEN pre-trained codebooks (a [[writePqIndex]]
    * books table): zero Lloyd rounds, zero training scans — the corpus
    * is read ONCE to encode inline under the frozen books (the same
    * frozen-book encode [[appendPqIndex]] applies to an arriving
    * batch) and ADC-ranked. Rows identical to [[pqTopK]] when the
    * books were trained with the same knobs on the same corpus
    * ([[pqFit]] is deterministic — the x124 guarantee). This is the
    * right form whenever a trained model already exists and the CODES
    * for this corpus snapshot don't ([[pqTopKIndexed]] is cheaper
    * still when they do): scoring a fresh snapshot, an ablation
    * corpus, or — as in the registered suite — several exhibits
    * sharing one fixture-trained model instead of retraining
    * per-query. No cache contract: the single corpus pass needs no
    * shared grid frame. */
  def pqTopKWithBooks(spark: org.apache.spark.sql.SparkSession,
                      queries: DataFrame, corpus: DataFrame,
                      idCol: String, vecCol: String, booksTable: String,
                      topK: Int): DataFrame = {
    val books = readBooks(spark, booksTable)
    val subDim = books(0)(0)._2.length
    val codeCols = books.indices.map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }
    val codes = Par.spread(corpus.select(
        col(idCol).cast("long").as("vec_id"), gridded(col(vecCol)).as("qv")))
      .select(col("vec_id").as("neighbor_id") +: codeCols: _*)
    val q = Par.spread(queries.select(col(idCol).cast("long").as("query_id"),
      gridded(col(vecCol)).as("qv")))
    val tableCols = books.indices.map { j =>
      pqAssign(slice(col("qv"), j * subDim + 1, subDim), books(j))._2
        .as(s"t_$j") }
    adcRank(codes, q.select(col("query_id") +: tableCols: _*), books, topK)
  }

  /** [[pqDistortion]] under FROZEN pre-trained codebooks: the
    * acceptance metric re-measured WITHOUT retraining — one corpus
    * scan against the persisted books. This is the production
    * drift-watch form ([[appendPqIndex]]'s scaladoc points here):
    * distortion creeping up over snapshots is the signal the frozen
    * books no longer fit the distribution and [[writePqIndex]] should
    * retrain. Identical rows to [[pqDistortion]] with the books'
    * training knobs (same determinism argument as
    * [[pqTopKWithBooks]]). */
  def pqDistortionWithBooks(spark: org.apache.spark.sql.SparkSession,
                            corpus: DataFrame, idCol: String,
                            vecCol: String, booksTable: String): DataFrame = {
    val books = readBooks(spark, booksTable)
    val subDim = books(0)(0)._2.length
    distortionReport(Par.spread(corpus.select(
        col(idCol).cast("long").as("vec_id"),
        gridded(col(vecCol)).as("qv"))),
      subDim, books)
  }

  /** [[pqRerankTopK]] under FROZEN pre-trained codebooks: the ADC
    * short-list comes from [[pqTopKWithBooks]] (one inline encode scan,
    * zero training), the exact re-rank from [[exactRerank]]. Rows
    * identical to [[pqRerankTopK]] with the books' training knobs. */
  def pqRerankTopKWithBooks(spark: org.apache.spark.sql.SparkSession,
                            queries: DataFrame, corpus: DataFrame,
                            idCol: String, vecCol: String,
                            booksTable: String, topK: Int,
                            shortlist: Int): DataFrame = {
    require(shortlist >= topK, "shortlist must be >= topK")
    val cand = pqTopKWithBooks(spark, queries, corpus, idCol, vecCol,
      booksTable, shortlist)
    exactRerank(cand, queries, corpus, idCol, vecCol, topK)
  }

  /** 1e-6 grid quantization of a float-vector column (the PQ working
    * representation). */
  private def gridded(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(1e6) + lit(0.5)))
      .cast("array<long>")

  /** Persist the COMPOSED IVF-PQ index — the layout FAISS deployments
    * actually serve (`IVF…,PQ…`), the artifact [[ivfPqTopK]]'s Scaladoc
    * promises: three catalog tables,
    *  - `codesTable`: (centroid_id, vec_id, code_0 .. code_{m-1})
    *    BUCKETED by centroid_id ([[writeAnnIndex]]'s contract) — one
    *    corpus scan assigns (nearest-centroid kernel) AND encodes
    *    (integer-exact per-subspace argmin), and the row is m+1 small
    *    ints instead of dim floats + a norm: IVF's read cut and PQ's
    *    byte cut in the same file layout;
    *  - `booksTable`: the m·k trained codewords ([[writePqIndex]]'s
    *    shape), read whole by every query;
    *  - `centTable`: the coarse codebook (centroid_id, centv), read
    *    whole by every query.
    * [[ivfPqTopKIndexed]] then serves with zero training, zero
    * embedding reads, and bucket-pruned probes. */
  def writeIvfPqIndex(corpus: DataFrame, centroids: DataFrame,
                      idCol: String, vecCol: String,
                      codesTable: String, booksTable: String,
                      centTable: String, m: Int = 4, k: Int = 8,
                      rounds: Int = 2, numBuckets: Int = 16,
                      trainPct: Int = 100): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (ids, vecs) = collectCentroids(centroids, idCol, vecCol)
    require(ids.nonEmpty, "centroids must be non-empty to build an index")
    centroids.select(col(idCol).cast("long").as("centroid_id"),
        col(vecCol).as("centv"))
      .write.mode("overwrite").format("parquet").saveAsTable(centTable)
    val (quant, subDim, books) =
      pqFit(corpus, idCol, vecCol, m, k, rounds, trainPct)
    quant.unpersist() // the build scan below re-grids in one pass
    books.zipWithIndex.toSeq
      .flatMap { case (cents, j) =>
        cents.toSeq.map { case (cid, cv) => (j, cid, cv.toSeq) } }
      .toDF("sub", "cid", "centv")
      .write.mode("overwrite").format("parquet").saveAsTable(booksTable)
    val codeCols = (0 until m).map { j =>
      pqAssign(slice(col("_qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }
    val assigned = Par.spread(corpus.select(
        col(idCol).cast("long").as("vec_id"), col(vecCol).as("cv"),
        gridded(col(vecCol)).as("_qv")))
      .withColumn("centroid_id",
        VectorExpressions.nearestCentroid(col("cv"), ids, vecs))
      .select(col("centroid_id") +: col("vec_id") +: codeCols: _*)
    graft.sinks.Sinks.writeBucketed(assigned, codesTable,
      Seq("centroid_id"), numBuckets)
  }

  /** Incremental maintenance of [[writeIvfPqIndex]]: assign + encode an
    * arriving batch under the FROZEN coarse codebook and the FROZEN PQ
    * books (both are the trained model — retraining re-codes the
    * corpus, a rebuild decision made offline via x122's distortion
    * report) and append its (centroid_id, vec_id, codes) rows into the
    * bucket layout — one file per bucket per ingest, the
    * [[appendAnnIndex]]/[[appendPqIndex]] contract composed. */
  def appendIvfPqIndex(batch: DataFrame, idCol: String, vecCol: String,
                       codesTable: String, booksTable: String,
                       centTable: String, numBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val (ids, vecs) = collectCentroids(
      spark.table(centTable), "centroid_id", "centv")
    require(ids.nonEmpty, "codebook table is empty — build the index first")
    val books = readBooks(spark, booksTable)
    val subDim = books(0)(0)._2.length
    val codeCols = books.indices.map { j =>
      pqAssign(slice(col("_qv"), j * subDim + 1, subDim), books(j))._1
        .as(s"code_$j") }
    val assigned = Par.spread(batch.select(
        col(idCol).cast("long").as("vec_id"), col(vecCol).as("cv"),
        gridded(col(vecCol)).as("_qv")))
      .withColumn("centroid_id",
        VectorExpressions.nearestCentroid(col("cv"), ids, vecs))
      .select(col("centroid_id") +: col("vec_id") +: codeCols: _*)
    graft.sinks.Sinks.writeBucketed(assigned, codesTable,
      Seq("centroid_id"), numBuckets, append = true)
  }

  /** [[ivfPqTopK]] through its PERSISTED index (x127) — the serving
    * form with the steady-state cost profile: both codebooks read
    * driver-side (m·k + numCentroids rows), the query's probe list and
    * ADC distance tables built from them, and the corpus side touching
    * ONLY the probed buckets of the codes table — no Lloyd rounds, no
    * embedding scan, no nearest-centroid kernel on the corpus. The
    * probed-centroid set is collected first (ONE eager job, bounded by
    * query count × nprobe) and pushed as an IN predicate on the
    * BUCKETING column, engaging bucket pruning exactly like
    * [[ivfTopKIndexed]]; the probe frame (nprobe rows per query, each
    * carrying its m distance tables) broadcasts, so the only exchange
    * is the per-query top-k window's. Rows identical to [[ivfPqTopK]]
    * with the same centroid set and PQ knobs — the same assignment
    * kernel and the same training ran at build time. */
  def ivfPqTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                       queries: DataFrame, idCol: String, vecCol: String,
                       codesTable: String, booksTable: String,
                       centTable: String, topK: Int,
                       nprobe: Int): DataFrame = {
    val (ids, vecs) = collectCentroids(
      spark.table(centTable), "centroid_id", "centv")
    require(ids.nonEmpty, "codebook table is empty — build the index first")
    val books = readBooks(spark, booksTable)
    val m = books.length
    val subDim = books(0)(0)._2.length
    val tableCols = (0 until m).map { j =>
      pqAssign(slice(col("_qv"), j * subDim + 1, subDim), books(j))._2
        .as(s"t_$j") }
    val probes = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qvf"), gridded(col(vecCol)).as("_qv"))
      .withColumn("centroid_id", explode(
        VectorExpressions.probeCentroids(col("qvf"), ids, vecs, nprobe)))
      .select(col("centroid_id") +: col("query_id") +: tableCols: _*)
    val probed = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0))
    val adc = (0 until m).map { j =>
      element_at(col(s"t_$j"),
        array_position(typedlit(books(j).map(_._1).toIndexedSeq),
          col(s"code_$j")).cast("int"))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_int").asc, col("neighbor_id"))
    spark.table(codesTable)
      .filter(col("centroid_id").isin(probed: _*))
      .withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_int", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        (col("adc_int").cast("double") / lit(1e6)).as("adc_dist"))
  }

  /** Dimension-TRUNCATED cosine top-k (x132) — the matryoshka serving
    * tier: rank by cosine over the FIRST `dims` components only. With
    * prefix-trained (MRL-style) embeddings the leading dimensions carry
    * most of the signal, so a 64→16 cut buys a 4× dot-product and
    * cache-traffic reduction — the standard cheap tier served in front
    * of (or instead of) full-dimension scoring, orthogonal to PQ's
    * codebook compression. Same plan shape as [[bruteForceTopK]] over
    * the sliced column: broadcast query frame, one corpus scan, the
    * per-query ranking window as the only exchange. Pair with
    * [[recallReport]] against the full-dimension exact top-k to size
    * `dims` (the spec does exactly that). */
  def truncatedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, dims: Int): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    def cut(df: DataFrame) =
      df.select(col(idCol), slice(col(vecCol), 1, dims).as(vecCol))
    bruteForceTopK(cut(queries), cut(corpus), idCol, vecCol, k)
  }

  /** Compact a [[writePqIndex]] codes table after at-least-once
    * replays: a replayed micro-batch re-appends IDENTICAL rows (same
    * ids through the same frozen books), so `distinct` removes exactly
    * the replay duplicates — and the rewrite collapses the
    * one-file-per-ingest accumulation. An id re-ingested with a
    * CHANGED vector is a versioning decision upstream of compaction
    * (both rows survive; resolve with an id-keyed upsert if arriving
    * vectors can mutate). Two-step via a scratch table — reading and
    * overwriting the same table in one plan is illegal. */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
                     codesTable: String): Unit = {
    val tmp = codesTable + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.table(codesTable).distinct()
      .write.mode("overwrite").format("parquet").saveAsTable(tmp)
    spark.table(tmp)
      .write.mode("overwrite").format("parquet").saveAsTable(codesTable)
    spark.sql(s"DROP TABLE $tmp")
  }

  /** [[compactPqIndex]] for the BUCKETED composed-index codes table
    * ([[writeIvfPqIndex]]): same replay-duplicate removal, rewritten
    * through [[graft.sinks.Sinks.writeBucketed]] so each bucket lands
    * as ONE file again (appends add a file per bucket per ingest —
    * this is also the file-count compaction the append docs point
    * at). */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        codesTable: String, numBuckets: Int = 16): Unit = {
    val tmp = codesTable + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    graft.sinks.Sinks.writeBucketed(spark.table(codesTable).distinct(),
      tmp, Seq("centroid_id"), numBuckets)
    graft.sinks.Sinks.writeBucketed(spark.table(tmp),
      codesTable, Seq("centroid_id"), numBuckets)
    spark.sql(s"DROP TABLE $tmp")
  }

  /** ADC short-list + EXACT re-rank (x130) — the standard two-stage
    * serving pattern, and the fix the x128 audit points at when PQ
    * recall reads low (the fixture's ADC-only recall@5 is 0.24 at
    * m=4/k=8 — 16× compression is doing the ranking): stage 1 scores
    * the WHOLE corpus through codes alone ([[pqTopK]], `shortlist`
    * candidates — the cheap cut), stage 2 fetches only the short-list's
    * real vectors and re-ranks them by exact cosine ([[bruteForceTopK]]'s
    * metric and tie-law), returning the top `topK`.
    *
    * Scale shape: the corpus pays the ADC scan (m integer ops/vector)
    * plus ONE id-equi fetch join of queries×shortlist rows — the
    * candidate frame broadcasts into the vector scan, so no corpus
    * shuffle; the re-rank window covers queries×shortlist rows. Exact
    * vector reads per query drop from |corpus| (brute force) to
    * `shortlist` — the two-stage trade. Recall is bounded by short-list
    * membership: x131 audits exactly that. */
  def pqRerankTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, topK: Int, shortlist: Int,
                   m: Int = 4, k: Int = 8, rounds: Int = 2,
                   trainPct: Int = 100): DataFrame = {
    require(shortlist >= topK, "shortlist must be >= topK")
    val cand = pqTopK(queries, corpus, idCol, vecCol, shortlist,
      m, k, rounds, trainPct)
    exactRerank(cand, queries, corpus, idCol, vecCol, topK)
  }

  /** The EXACT re-rank stage by itself — composable behind ANY
    * candidate generator (flat ADC, indexed ADC, IVF-PQ, truncated
    * prefix): fetch only the candidate ids' real vectors (the
    * queries×shortlist candidate frame broadcasts into an id-equi
    * join — no corpus shuffle) and rank them by exact cosine with
    * [[bruteForceTopK]]'s metric, rounding and tie-law. `candidates`
    * needs (query_id, neighbor_id); extra columns are ignored. */
  def exactRerank(candidates: DataFrame, queries: DataFrame,
                  corpus: DataFrame, idCol: String, vecCol: String,
                  topK: Int): DataFrame = {
    val cand = candidates.select(col("query_id"), col("neighbor_id"))
    val c = Par.spread(corpus.select(
      col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cv"),
      Vectors.norm(col(vecCol)).as("cn")))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv"), Vectors.norm(col(vecCol)).as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("neighbor_id"))
    c.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("similarity", Vectors.cosinePrenormed(
        col("qv"), col("cv"), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"),
        graft.functions.Num.fpRound(col("similarity"), 6).as("similarity"))
  }

  /** [[pqRerankTopK]] through the PERSISTED index (x134) — the
    * production two-stage serving path: the ADC short-list comes from
    * the codes table through the frozen books ([[pqTopKIndexed]] —
    * zero training), then [[exactRerank]] fetches only `shortlist`
    * real vectors per query. Per query the corpus costs one codes
    * scan (m integer ops/row) plus `shortlist` exact vector reads —
    * at no point does a full-width float scan of the corpus happen,
    * and nothing retrains. Rows identical to [[pqRerankTopK]] with
    * the same knobs (the short-list stage serves [[pqTopK]]'s rows by
    * the x124 guarantee). */
  def pqRerankTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                          queries: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String,
                          codesTable: String, booksTable: String,
                          topK: Int, shortlist: Int): DataFrame = {
    require(shortlist >= topK, "shortlist must be >= topK")
    val cand = pqTopKIndexed(spark, queries, idCol, vecCol,
      codesTable, booksTable, shortlist)
    exactRerank(cand, queries, corpus, idCol, vecCol, topK)
  }

  /** ANN RECALL@k audit (x128) — the acceptance metric the IVF/PQ
    * knobs (nprobe, m, k, rounds) are actually tuned against: the
    * fraction of the EXACT top-k ([[bruteForceTopK]]) each approximate
    * method recovers. Complements x101 (bucket balance) and x122
    * (quantization distortion), which measure proxies.
    *
    * One row per audited leg: `(method, k, n_queries, n_exact, n_hits,
    * recall)` where recall is MICRO-averaged — total hits over total
    * exact rows, one exact long/long division, so the metric is
    * deterministic under any partitioning and mirrors to SQL with no
    * float law. (With every query holding a full k exact neighbors —
    * any corpus with > k+1 vectors — micro equals the per-query macro
    * average.)
    *
    * Scale shape: each leg's join is top-k-sized (n_queries × k rows
    * per side — the audit inputs, not the corpus), so the audit itself
    * costs nothing next to the legs that produced the frames; the
    * result is legs.length rows. */
  def recallReport(legs: Seq[(String, DataFrame, DataFrame, Int)])
      : DataFrame = {
    require(legs.nonEmpty, "recallReport needs at least one leg")
    legs.map { case (method, exact, approx, k) =>
      val e = exact.select(col("query_id"), col("neighbor_id"))
      val a = approx.select(col("query_id"), col("neighbor_id"))
        .withColumn("_hit", lit(1))
      e.join(a, Seq("query_id", "neighbor_id"), "left")
        .agg(countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_exact"),
          sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_hits"))
        .select(lit(method).as("method"), lit(k).as("k"),
          col("n_queries"), col("n_exact"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
    }.reduce(_.union(_))
  }

  /** [[semDedup]] APPLIED (x223) — the family's apply twin (x34/x36/
    * x39's shape): the corpus minus the vectors [[semDedup]] marks
    * dropped, original columns preserved. The drop set is
    * duplicate-sized, so the anti-join broadcasts even when the
    * corpus doesn't. */
  def semDedupApply(corpus: DataFrame, init: DataFrame, idCol: String,
                    vecCol: String, rounds: Int,
                    threshold: Double): DataFrame = {
    val drops = semDedup(corpus, init, idCol, vecCol, rounds, threshold)
      .filter(col("status") === "dropped")
      .select(col("vec_id").as("_drop_id"))
    corpus.join(broadcast(drops), col(idCol) === col("_drop_id"),
      "left_anti")
  }

  /** NPROBE SWEEP (x221) — the recall/cost TUNING CURVE for a
    * persisted IVF index, one row per probed width: recall@k against
    * the exact top-k ([[recallReport]]'s micro-averaged law) next to
    * `n_candidates`, the number of (query, neighbor) pairs the probe
    * actually scored — the serving-cost axis. x128 answers "is THIS
    * nprobe acceptable"; the sweep is the artifact an operator reads
    * to PICK it: where the recall column saturates while the
    * candidate column keeps growing linearly in nprobe, stop.
    *
    * Scale shape: the exact leg is one [[bruteForceTopK]] (broadcast
    * query set, corpus scanned once — the audit's unavoidable ground
    * truth; materialized ONCE
    * as an eager local checkpoint — a queries×k frame whose storage
    * is released with the frame itself, not parked in the session
    * cache — so the per-width union branches reuse it instead of
    * re-scanning the corpus); each probed leg's bucket-pruned
    * scan feeds the top-k and the candidate count (two index-bounded
    * passes, deliberately uncached so the plan pins stay inspectable)
    * and aggregates to ONE row, so the whole sweep costs
    * O(|nprobes|) index probes + one exact pass regardless of corpus
    * size. */
  def nprobeSweep(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, k: Int, nprobes: Seq[Int],
                  assignTable: String, centTable: String): DataFrame = {
    require(nprobes.nonEmpty, "nprobeSweep needs at least one nprobe")
    require(nprobes.forall(_ > 0), "nprobe values must be > 0")
    require(k > 0, s"k must be > 0, got $k")
    val spark = queries.sparkSession
    // the exact leg is a |queries|×k frame: localCheckpoint(eager)
    // materializes it ONCE (one corpus scan for the whole sweep) and
    // ties its lifetime to this frame's GC — nothing lingers in the
    // session cache after the sweep result is consumed
    val exact = bruteForceTopK(queries, corpus, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    nprobes.map { np =>
      ivfScoredIndexed(queries, idCol, vecCol, np, assignTable,
          centTable) match {
        case None =>
          // one SENTINEL ROW per probed width (null recall, zero
          // counts) — range(1), so the "one row per nprobe" contract
          // holds even when the index has no codebook
          spark.range(1).select(lit(np).as("nprobe"), lit(k).as("k"),
            lit(0L).as("n_queries"), lit(0L).as("n_exact"),
            lit(0L).as("n_hits"), lit(null).cast("double").as("recall"),
            lit(0L).as("n_candidates"))
        case Some(scored) =>
          val w = Window.partitionBy(col("query_id"))
            .orderBy(col("similarity").desc, col("neighbor_id"))
          val approx = scored.withColumn("rank", row_number().over(w))
            .filter(col("rank") <= k)
            .select(col("query_id"), col("neighbor_id"),
              lit(1).as("_hit"))
          val cand = scored.agg(count(lit(1)).as("n_candidates"))
          exact.join(approx, Seq("query_id", "neighbor_id"), "left")
            .agg(countDistinct(col("query_id")).as("n_queries"),
              count(lit(1)).as("n_exact"),
              sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_hits"))
            .crossJoin(broadcast(cand))
            .select(lit(np).as("nprobe"), lit(k).as("k"),
              col("n_queries"), col("n_exact"), col("n_hits"),
              (col("n_hits").cast("double") / col("n_exact").cast("double"))
                .as("recall"),
              col("n_candidates"))
      }
    }.reduce(_.unionByName(_))
  }

  /** MAXIMAL-MARGINAL-RELEVANCE re-rank (x145) — true MMR (Carbonell &
    * Goldstein '98) over the persisted IVF index, the exact-penalty
    * big sibling of [[diversifiedTopKIndexed]]'s cluster cap: greedily
    * pick k of the top-`candK` candidates, each pick maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — relevance traded
    * against redundancy to EVERYTHING already on the page, not just
    * same-cell membership.
    *
    * Output `(query_id, neighbor_id, pick, mmr_score, similarity)` —
    * `pick` is the greedy selection order (the order a serving page
    * shows), `mmr_score` the value that won the pick (pick 1 scores
    * `λ·rel`, the empty-set penalty), `similarity` the plain relevance.
    *
    * Scale shape: the candidate fetch is [[ivfTopKIndexed]]'s
    * bucket-pruned scan (vectors ride along from the index — no second
    * corpus touch); candidates and their |q|·candK² pairwise cosines
    * are PERSISTED query-set-sized frames (caller-owned cache, the
    * [[pqFit]] convention — Bench/Verify clearCache between queries),
    * and the k-step greedy loop unrolls into k windowed argmaxes over
    * those cached frames — corpus cost identical to one IVF query,
    * regardless of k.
    *
    * Numeric law: rel and pair sims round 1e-6 (the x10 convention);
    * each MMR score is ONE IEEE expression `λ·rel − (1−λ)·maxPen`
    * rounded 1e-6 (max of rounded doubles is order-independent); ties
    * break by ascending neighbor id; λ and 1−λ enter both engines as
    * the same binary doubles. */
  def mmrTopKIndexed(queries: DataFrame, idCol: String, vecCol: String,
                     k: Int, candK: Int, nprobe: Int, lambda: Double,
                     assignTable: String, centTable: String): DataFrame = {
    require(k >= 1 && candK >= k,
      s"need candK >= k >= 1, got k=$k candK=$candK")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1], got $lambda")
    import graft.functions.Num
    val empty = queries.select(col(idCol).as("query_id"),
      col(idCol).as("neighbor_id"), lit(null).cast("long").as("pick"),
      lit(null).cast("double").as("mmr_score"),
      lit(null).cast("double").as("similarity")).limit(0)
    ivfScoredIndexed(queries, idCol, vecCol, nprobe, assignTable,
        centTable) match {
      case None => empty
      case Some(scored) =>
        val om = 1.0 - lambda
        val wCand = Window.partitionBy(col("query_id"))
          .orderBy(col("similarity").desc, col("neighbor_id"))
        val cands = scored
          .withColumn("_crn", row_number().over(wCand))
          .filter(col("_crn") <= candK)
          .select(col("query_id"), col("neighbor_id"),
            Num.fpRound(col("similarity"), 6).as("rel"),
            col("cv"), col("cn"))
          .persist()
        val pairs = cands.select(col("query_id"),
            col("neighbor_id").as("aid"), col("cv").as("av"),
            col("cn").as("an"))
          .join(cands.select(col("query_id"),
            col("neighbor_id").as("bid"), col("cv").as("bv"),
            col("cn").as("bn")), Seq("query_id"))
          .filter(col("aid") =!= col("bid"))
          .select(col("query_id"), col("aid"), col("bid"),
            Num.fpRound(Vectors.cosinePrenormed(
              col("av"), col("bv"), col("an"), col("bn")), 6).as("psim"))
          .persist()
        val wPick = Window.partitionBy(col("query_id"))
          .orderBy(col("mmr").desc, col("neighbor_id"))
        // each pick is PERSISTED (lazily — everything materializes in
        // the final action's single cascade): stage i's penalty join
        // reads picks 1..i-1 from cache, so the greedy chain costs k
        // linear stages instead of an exponentially-recomputed lineage
        // tree (caller-owned cache, the cands/pairs contract above)
        var picks = Vector(cands
          .withColumn("mmr", Num.fpRound(lit(lambda) * col("rel"), 6))
          .withColumn("_rn", row_number().over(wPick))
          .filter(col("_rn") === 1)
          .select(col("query_id"), col("neighbor_id"), col("rel"),
            col("mmr"), lit(1).as("pick"))
          .persist())
        (2 to k).foreach { i =>
          val selAll = picks.reduce(_.unionByName(_))
          val pen = pairs
            .join(selAll.select(col("query_id"),
              col("neighbor_id").as("bid")), Seq("query_id", "bid"))
            .groupBy(col("query_id"), col("aid").as("neighbor_id"))
            .agg(max(col("psim")).as("mp"))
          val pick = cands
            .join(selAll.select(col("query_id"), col("neighbor_id")),
              Seq("query_id", "neighbor_id"), "left_anti")
            .join(pen, Seq("query_id", "neighbor_id"))
            .withColumn("mmr", Num.fpRound(
              lit(lambda) * col("rel") - lit(om) * col("mp"), 6))
            .withColumn("_rn", row_number().over(wPick))
            .filter(col("_rn") === 1)
            .select(col("query_id"), col("neighbor_id"), col("rel"),
              col("mmr"), lit(i).as("pick"))
            .persist()
          picks :+= pick
        }
        picks.reduce(_.unionByName(_)).select(col("query_id"), col("neighbor_id"),
          col("pick").cast("long").as("pick"),
          col("mmr").as("mmr_score"), col("rel").as("similarity"))
    }
  }

  /** RANKING-quality audit (x141) — MRR and nDCG@k for each approximate
    * leg against its exact baseline, the metric pair that separates
    * "found the right documents" from "put them in the right order".
    * [[recallReport]] (x128/x131) measures MEMBERSHIP only — x131's
    * sweep showed re-ranking leaves recall's residual in the
    * short-list, but recall is blind to the rank repair that IS the
    * second stage's whole contribution; this report quantifies it.
    * Same leg contract as [[recallReport]]: `(method, exact, approx,
    * k)` with `approx` carrying the leg's `rank` column.
    *
    * Per query (binary relevance: the exact top-k set):
    * MRR's addend is 1/rank of the FIRST relevant document in the
    * approximate ranking (0 when the leg missed everything); nDCG's is
    * DCG/IDCG with the standard log2 position discount, DCG summing
    * 1/log2(rank+1) over relevant positions. Both reports are the
    * macro average over queries. Assumes (like [[recallReport]]'s
    * micro=macro note) every query holds a full k exact rows — any
    * corpus with > k+1 vectors.
    *
    * Numeric law: each discount ln(2)/ln(rank+1) is 1e-4-rounded (the
    * idf convention — two correctly-rounded `ln`s and one IEEE divide
    * are engine-identical), per-query DCG is a DECIMAL sum of those;
    * IDCG@k is the same rounded-term DECIMAL sum over ranks 1..k
    * (constant, computed driver-side with the identical law); per-query
    * ndcg and rr round at 1e-6, and the final macro means round at
    * 1e-6 after one DECIMAL sum / n_queries division each.
    *
    * Scale shape: identical to [[recallReport]] — every join and
    * window runs on top-k-sized frames; the report is legs.length
    * rows, the corpus work happened inside the legs. */
  def rankingReport(legs: Seq[(String, DataFrame, DataFrame, Int)])
      : DataFrame = {
    require(legs.nonEmpty, "rankingReport needs at least one leg")
    import graft.functions.Num
    legs.map { case (method, exact, approx, k) =>
      val idcg = (1 to k).map { r =>
        val d = math.floor(
          math.log(2.0) / math.log(r + 1.0) * 10000 + 0.5) / 10000.0
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val e = exact.select(col("query_id"), col("neighbor_id"))
      val a = approx.select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("_arank"))
      val disc = Num.fpRound(
        lit(math.log(2.0)) / log(col("_arank").cast("double") + lit(1.0)), 4)
      val perQ = e.join(a, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(min(col("_arank")).as("_fh"),
          Num.dsum(coalesce(disc, lit(0.0))).as("_dcg"))
      perQ
        .agg(count(lit(1)).as("n_queries"),
          Num.dsum(when(col("_fh").isNotNull,
              Num.fpRound(lit(1.0) / col("_fh").cast("double"), 6))
            .otherwise(lit(0.0))).as("_rrsum"),
          Num.dsum(Num.fpRound(col("_dcg") / lit(idcg), 6)).as("_ndcgsum"))
        .select(lit(method).as("method"), lit(k).as("k"),
          col("n_queries"),
          Num.fpRound(col("_rrsum") / col("n_queries").cast("double"), 6)
            .as("mrr"),
          Num.fpRound(col("_ndcgsum") / col("n_queries").cast("double"), 6)
            .as("ndcg"))
    }.reduce(_.union(_))
  }
}
