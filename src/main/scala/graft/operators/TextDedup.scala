package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Document deduplication suite (BASELINE.json extension ops; SURVEY §2.4
  * X1/X2). All operators are declarative DataFrame plans:
  *
  *  - exact: one hash-aggregate on a normalized-text digest (single
  *    shuffle on the digest — at 100 TB this is the minimal-movement plan:
  *    only (hash, id) pairs shuffle, never the text).
  *  - near-dup, exact Jaccard: inverted-index self-join on shingles —
  *    shuffles (shingle, id) pairs instead of computing O(n²) document
  *    pairs, so cost tracks the number of *colliding* shingles.
  *  - near-dup, MinHash+LSH: constant-size signatures replace shingle
  *    sets; candidate generation shuffles only (band, key, id) tuples.
  *    The scale path for 100 TB: signature size is fixed (numPerms longs)
  *    regardless of document length.
  *  - near-dup, SimHash: 64-bit fingerprint; pigeonhole banding over four
  *    16-bit chunks gives *exact* retrieval of all pairs with Hamming
  *    distance <= 3.
  */
object TextDedup {

  /** X1 — exact dedup groups on sha256(lower(trim(text))). Returns one row
    * per distinct normalized text: the kept (minimum) id and the group
    * size. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(lower(trim(col(textCol))), 256).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact Jaccard near-dup pairs via inverted shingle index. Emits
    * (doc1, doc2, jaccard) for pairs with jaccard >= threshold; jaccard is
    * |intersection| / |union| over distinct k-shingles, rounded to 4.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, threshold: Double): DataFrame = {
    val sets = docs.select(col(idCol).as("doc_id"),
      Text.shingleSet(col(textCol), k).as("sh"))
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = sets.select(col("doc_id"), explode(col("sh")).as("s"))
    val a = inv.alias("a"); val b = inv.alias("b")
    val inter = a.join(b,
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1")
        .withColumnRenamed("n", "n1"), "doc1")
      .join(sizes.withColumnRenamed("doc_id", "doc2")
        .withColumnRenamed("n", "n2"), "doc2")
      .withColumn("jaccard", graft.functions.Num.fpRound(
        col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }

  /** MinHash + LSH near-dup pairs: banded signatures generate candidates,
    * candidates are exact-verified against the true shingle Jaccard, and
    * only pairs >= threshold survive. With numBands*rowsPerBand perms the
    * miss probability at j >= threshold is (1 - j^rows)^bands (~2.6e-5 at
    * j=0.8 with 20x4).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, threshold: Double,
                      numBands: Int = 20, rowsPerBand: Int = 4): DataFrame = {
    val sets = docs.select(col(idCol).as("doc_id"),
      Text.shingleSet(col(textCol), k).as("sh"))
    val sigs = sets.withColumn("sig",
      Text.minhashSignature(col("sh"), numBands * rowsPerBand))
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
    // exact verification on the candidate set only
    val withSets = candidates
      .join(sets.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
      .join(sets.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
    withSets
      .withColumn("jaccard", graft.functions.Num.fpRound(
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit fingerprints; all pairs with Hamming
    * distance <= maxHamming (<= 3 guarantees exact retrieval via the
    * 4x16-bit pigeonhole banding). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole is exact only for <= 3")
    val fp = docs.select(col(idCol).as("doc_id"),
      Text.simhash64(Text.tokens(col(textCol))).as("fp"))
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

  /** Winnowing-style document fingerprint: the `k` lexicographically
    * smallest md5 digests of the document's shingles, joined by '|'.
    * Near-identical documents share most of their smallest digests. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 3, keep: Int = 4): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      concat_ws("|", slice(
        array_sort(transform(Text.shingleSet(col(textCol), shingleK), s => md5(s))),
        1, keep)).as("fingerprint"))
}
