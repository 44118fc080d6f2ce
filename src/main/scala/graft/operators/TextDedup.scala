package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorExpressions

import graft.functions.{Num, Par, Text}

/** Document deduplication suite (BASELINE.json extension ops; SURVEY §2.4
  * X1/X2). All operators are declarative DataFrame plans tuned for scale:
  *
  *  - exact: one hash-aggregate on a normalized-text digest (single
  *    shuffle of (hash, id) pairs only — the text never moves).
  *  - near-dup, exact Jaccard: prefix-filtered inverted-index join
  *    (AllPairs/PPJoin family): shingles are globally ordered by document
  *    frequency and only each document's rare-shingle *prefix* is indexed —
  *    provably no false negatives at the given threshold, and the hot
  *    (stop-word) shingles that explode a naive shingle self-join never
  *    enter the index. Candidates are exact-verified on the full sets.
  *  - near-dup, MinHash+LSH: signatures via explode + codegen'd min
  *    aggregates (one pass over (doc, shingle) pairs — no interpreted
  *    higher-order lambdas); banded keys generate candidates; exact verify.
  *  - near-dup, SimHash: 64-bit fingerprint from codegen'd bit-vote sums;
  *    4x16-bit pigeonhole banding gives exact Hamming<=3 retrieval.
  */
object TextDedup {

  /** X1 — exact dedup groups on sha256(lower(trim(text))). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(lower(trim(col(textCol))), 256).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct (doc_id, shingle) pairs built with codegen'd operators
    * only: posexplode tokens, then window `lead` assembles each k-token
    * shingle — no interpreted higher-order lambdas (Spark evaluates HOF
    * lambdas outside codegen; at millions of shingles that interpretation
    * dominated the runtime ~8x). */
  private def shingleInv(docs: DataFrame, idCol: String, textCol: String,
                         k: Int): DataFrame = {
    val tok = Par.spread(docs).select(col(idCol).as("doc_id"),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until k).map(j => lead(col("t"), j).over(w))
    tok.select(col("doc_id"),
        concat_ws(" ", (col("t") +: leads): _*).as("s"),
        leads.last.isNotNull.as("_full"))
      .filter(col("_full")).drop("_full")
      .dropDuplicates("doc_id", "s")
  }

  /** Sorted distinct shingle sets with sizes, CACHED: one query plan
    * references the sets up to three times (inverted index + both verify
    * sides). Sorting enables the codegen'd merge intersect in verify. */
  private def shingleSets(inv: DataFrame): DataFrame =
    inv.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("s"))).as("sh"))
      .withColumn("n", size(col("sh")))
      .cache()

  /** Exact-verify candidate (doc1, doc2) pairs against true shingle
    * Jaccard; emit pairs >= threshold. */
  private def verified(candidates: DataFrame, sets: DataFrame,
                       threshold: Double): DataFrame = {
    val inter = VectorExpressions.sortedIntersectSize(col("sh1"), col("sh2"))
    // sets are one row per document (small next to the corpus text):
    // broadcasting them keeps the candidate stream from shuffling two
    // full shingle arrays per pair. At true 100 TB scale, replace with a
    // bucketed join on doc id.
    candidates
      .join(broadcast(sets.select(col("doc_id").as("doc1"), col("sh").as("sh1"),
        col("n").as("n1"))), "doc1")
      .join(broadcast(sets.select(col("doc_id").as("doc2"), col("sh").as("sh2"),
        col("n").as("n2"))), "doc2")
      .withColumn("inter", inter)
      .withColumn("jaccard", Num.fpRound(
        col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }

  /** Exact Jaccard near-dup pairs (prefix-filtered AllPairs join).
    *
    * For jaccard(A,B) >= t, |A∩B| >= ceil(t·|A|); under a global shingle
    * order, any qualifying partner must hit one of the first
    * |A| - ceil(t·|A|) + 1 shingles of A (and symmetrically) — so indexing
    * only those prefixes loses no qualifying pair. Ordering by ascending
    * document frequency puts the *rarest* shingles in the prefix, keeping
    * per-shingle join groups small at any scale.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, threshold: Double): DataFrame = {
    val inv0 = shingleInv(docs, idCol, textCol, k)
    val sets = shingleSets(inv0)
    val inv = sets.select(col("doc_id"), col("n"), explode(col("sh")).as("s"))
    val freq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val wOrder = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("s"))
    val prefix = inv.join(freq, "s")
      .withColumn("pos", row_number().over(wOrder))
      .filter(col("pos") <=
        col("n") - ceil(lit(threshold) * col("n")).cast("int") + lit(1))
      .select(col("doc_id"), col("n"), col("s"))
    val a = prefix.alias("a"); val b = prefix.alias("b")
    // length filter: jaccard >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
    val candidates = a.join(b,
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= lit(threshold) * col("a.n") &&
          col("a.n") >= lit(threshold) * col("b.n"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    verified(candidates, sets, threshold)
  }

  /** MinHash + LSH near-dup pairs. Signatures are built by exploding the
    * shingle set once and taking `numPerms` codegen'd MIN aggregates of
    * seeded xxhash64 — one shuffle of (doc, shingle) pairs, no interpreted
    * lambdas. Banded signature slices generate candidates; candidates are
    * exact-verified. Miss probability at j >= threshold is
    * (1 - j^rows)^bands (~2.6e-5 at j=0.8 with 20x4).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, threshold: Double,
                      numBands: Int = 20, rowsPerBand: Int = 4): DataFrame = {
    val numPerms = numBands * rowsPerBand
    val inv0 = shingleInv(docs, idCol, textCol, k)
    val sets = shingleSets(inv0)
    // hash each shingle string ONCE to a 64-bit h; the numPerms
    // "permutations" re-hash only the 8-byte h with different seeds
    // (codegen'd; ANSI-safe, unlike wrap-around affine maps).
    val inv = sets.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val minCols = (0 until numPerms).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sigs = inv.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
    val bands = sigs.select(col("doc_id"),
      posexplode(Text.lshBands(col("sig"), numBands, rowsPerBand))
        .as(Seq("band_idx", "band_key")))
    val x = bands.alias("x"); val y = bands.alias("y")
    val candidates = x.join(y,
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
    verified(candidates, sets, threshold)
  }

  /** SimHash near-dup pairs: 64 codegen'd bit-vote SUM aggregates over the
    * exploded token stream, then pigeonhole banding. Exact for <= 3. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole is exact only for <= 3")
    val tok = Par.spread(docs).select(col(idCol).as("doc_id"),
      explode(Text.tokens(col(textCol))).as("t"))
    val h = xxhash64(col("t"))
    val voteCols = (0 until 64).map(i =>
      sum(when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"b$i"))
    val votes = tok.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val fpCol = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a: Column, b: Column) => a.bitwiseOR(b))
    val fp = votes.select(col("doc_id"), fpCol.as("fp"))
    val chunks = fp.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("fp"), j * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val p = chunks.alias("p"); val q = chunks.alias("q")
    p.join(q,
        col("p.chunk_idx") === col("q.chunk_idx") &&
          col("p.chunk_val") === col("q.chunk_val") &&
          col("p.doc_id") < col("q.doc_id"))
      .select(col("p.doc_id").as("doc1"), col("q.doc_id").as("doc2"),
        Text.hamming64(col("p.fp"), col("q.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing-style document fingerprint: the `keep` lexicographically
    * smallest md5 digests of the document's shingles, joined by '|'.
    * Codegen'd md5 per exploded shingle + a ranking window (k-smallest),
    * instead of interpreted per-row array transforms. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, keep: Int = 4): DataFrame = {
    val inv = shingleInv(docs, idCol, textCol, shingleK)
      .select(col("doc_id"), md5(col("s")).as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("h"))
    inv.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= keep)
      .groupBy(col("doc_id"))
      .agg(concat_ws("|", array_sort(collect_list(col("h"))))
        .as("fingerprint"))
  }
}
