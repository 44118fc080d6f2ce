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

  /** LSH band keys over a MinHash signature: hash of each consecutive
    * `rowsPerBand`-slice. Equal band key => candidate pair. */
  def lshBands(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
