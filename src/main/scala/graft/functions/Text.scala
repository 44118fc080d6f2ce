package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / analysis operators. Everything is
  * built from codegen'd higher-order functions over arrays — no UDFs — so
  * the hot path stays inside whole-stage codegen and scales linearly with
  * executor count.
  */
object Text {

  /** Lower-cased whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Contiguous k-token shingles joined by single spaces. Documents shorter
    * than k tokens yield an empty shingle array. */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    val make = transform(
      sequence(lit(0), size(t) - lit(k)),
      i => concat_ws(" ", (0 until k).map(j => element_at(t, i + lit(j + 1))): _*))
    when(size(t) >= k, make).otherwise(array())
  }

  /** Distinct shingle set (the unit of Jaccard similarity). */
  def shingleSet(text: Column, k: Int): Column =
    array_distinct(shingles(text, k))

  /** MinHash signature: `numPerms` independent min-hashes of the shingle
    * set. Permutation s is simulated by seeding xxhash64 with s (an extra
    * hashed column), the standard one-pass construction — O(|shingles| ×
    * numPerms) per row, no shuffle. Empty shingle sets get Long.MaxValue
    * sentinels (they collide only with other empty docs).
    */
  def minhashSignature(shingleSet: Column, numPerms: Int): Column =
    transform(sequence(lit(0), lit(numPerms - 1)),
      s => coalesce(
        array_min(transform(shingleSet, sh => xxhash64(sh, s))),
        lit(Long.MaxValue)))

  /** LSH band keys over a MinHash signature: hash of each consecutive
    * `rowsPerBand`-slice. Equal band key => candidate pair. */
  def lshBands(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))

  /** 64-bit SimHash of the token multiset: per bit position, tokens vote
    * +1/-1 by their xxhash64 bit; the sign of the tally sets the bit. The
    * bit loop is unrolled at plan-build time (shift amounts must be
    * literals), producing one codegen'd expression tree. */
  def simhash64(tokens: Column): Column = {
    val votes = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val bitVotes = array((0 until 64).map(i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)): _*)
        zip_with(acc, bitVotes, (a, b) => a + b)
      })
    (0 until 64).map(i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
