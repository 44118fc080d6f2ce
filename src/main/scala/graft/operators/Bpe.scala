package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Par, Text}

/** Byte-pair-encoding merge training (tokenizer prep — the iterative
  * stage x68's single-round bigram statistics feed into): N rounds of
  * count-adjacent-pairs → pick the most frequent → merge it everywhere.
  *
  * 100 TB shape: the corpus is touched EXACTLY ONCE, by the word-count
  * aggregate (high-reduction hash agg — the standard BPE-trainer trick
  * of working over the frequency-weighted VOCABULARY, not the token
  * stream). Every merge round then runs over the vocab-sized table:
  * pair counts are another high-reduction agg, the winner is a 1-row
  * `limit(1).collect()` (k-bounded by construction — the argmax is the
  * algorithm's inherent sequential dependency; every production BPE
  * trainer synchronizes here), and the merge-apply is a per-row string
  * `replace`. Lineage is truncated per round with `localCheckpoint`
  * (the [[Components]] iterative-plan pattern), so N rounds never
  * re-plan round 1.
  *
  * Merge-apply determinism: a word's symbol sequence is materialized as
  * a separator-wrapped string — every symbol wrapped in U+001F — so one
  * `replace(s, ␟l␟␟r␟, ␟lr␟)` performs EXACTLY the greedy left-to-right
  * non-overlapping merge BPE specifies ("aaa" + (a,a) → [aa, a]), with
  * identical semantics in any engine's `replace` (DuckDB oracle
  * included: both scan the original string left to right and resume
  * after the replaced region; per-symbol wrapping keeps adjacent
  * matches from sharing separator characters, so "aaaa" → [aa, aa]).
  * Ties on pair count break lexicographically on (lhs, rhs).
  * Precondition: text must not contain U+001F (true of any plain-text
  * corpus; assert upstream if ingesting binary-ish data).
  *
  * Note: constructing the returned frame RUNS the training loop (N
  * bounded Spark jobs) — the [[TextDedup.bandSketch]] convention for
  * driver-side artifacts.
  */
object Bpe {
  private val Sep = "\u001F"

  /** Each character wrapped in separators: "abc" → "␟a␟␟b␟␟c␟". */
  private def wrapChars(word: Column): Column =
    regexp_replace(word, "(.)", s"$Sep$$1$Sep")

  /** Frequency-weighted vocabulary with the wrapped symbol string —
    * the ONE corpus-touching stage. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    Par.spread(docs)
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("wrapped", wrapChars(col("word")))

  /** The merge table after `rounds` iterations:
    * `(merge_round, lhs, rhs, pair_count)`, one row per round in merge
    * order. Stops early if no pair remains (fully merged vocab). */
  def merges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    var v = vocab(docs, textCol).localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < rounds && !exhausted) {
      val syms = split(
        regexp_replace(col("wrapped"), s"^$Sep|$Sep$$", ""), s"$Sep$Sep")
      val pairs = v
        .select(col("freq"), syms.as("s"))
        .select(col("freq"), explode(zip_with(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("freq")).as("pair_count"))
      val win = pairs
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (win.isEmpty) exhausted = true
      else {
        val (l, r, c) = (win.head.getAs[String]("lhs"),
          win.head.getAs[String]("rhs"), win.head.getAs[Long]("pair_count"))
        out += ((k, l, r, c))
        v = v.withColumn("wrapped", call_function("replace", col("wrapped"),
            lit(s"$Sep$l$Sep$Sep$r$Sep"), lit(s"$Sep$l$r$Sep")))
          .localCheckpoint()
        k += 1
      }
    }
    spark.createDataFrame(out.toSeq)
      .toDF("merge_round", "lhs", "rhs", "pair_count")
  }

  /** The trained merge list as driver-side pairs, for [[encodeStats]] —
    * merge tables are tokenizer-sized (tens of thousands of rows in a
    * full trainer), a k-bounded collect by construction. */
  def mergeList(docs: DataFrame, textCol: String,
                rounds: Int): Seq[(String, String)] =
    merges(docs, textCol, rounds).collect()
      .sortBy(_.getAs[Int]("merge_round"))
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq

  /** ENCODE the corpus with a trained merge list — the apply side of
    * [[merges]], and the statistic a tokenizer-prep pipeline actually
    * ships (subtoken counts drive packing budgets, x46/x61): per
    * document, every word's symbol sequence after applying the merges
    * in training order. Pure per-row projection — the merge chain is
    * `rounds` nested `replace` calls on the wrapped-symbol encoding
    * inside an array lambda, so the corpus never shuffles and the
    * operator composes into any scan-side pipeline stage. Output:
    * `(doc_id, n_words, n_subtokens)`; a NULL text stays NULL-rowed
    * (never invents zeros), empty text is (0, 0). */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val toks = filter(Text.tokens(col(textCol)), w => length(w) > 0)
    def encoded(w: Column): Column =
      merges.foldLeft(wrapChars(w)) { case (acc, (l, r)) =>
        call_function("replace", acc,
          lit(s"$Sep$l$Sep$Sep$r$Sep"), lit(s"$Sep$l$r$Sep"))
      }
    def nSubtokens(w: Column): Column =
      size(split(regexp_replace(encoded(w), s"^$Sep|$Sep$$", ""),
        s"$Sep$Sep"))
    Par.spread(docs).select(
      col(idCol).as("doc_id"),
      size(toks).cast("long").as("n_words"),
      aggregate(toks, lit(0L),
        (acc, w) => acc + nSubtokens(w).cast("long")).as("n_subtokens"))
  }

  /** Tokenizer COMPRESSION-RATIO report by group (x102): per language,
    * how many subtokens the trained merge list spends per word —
    * subtokens/word is THE acceptance metric for a tokenizer on a
    * multilingual mix (a language the merges never saw tokenizes near
    * characters-per-word; the dominant language near 1), and the number
    * that converts corpus word counts into trainer token budgets
    * (x46/x47/x61). Composition: [[encodeStats]] (per-row projection)
    * → one id-equi join to the group column → one group-count agg.
    * Ratio = exact long sums into one IEEE division — bit-identical
    * cross-engine; docs with zero words contribute nothing to either
    * sum. Output `(group, n_docs, n_words, n_subtokens, subtokens_per_word)`.
    */
  def compressionByGroup(docs: DataFrame, idCol: String, textCol: String,
                         groupCol: String,
                         merges: Seq[(String, String)]): DataFrame =
    encodeStats(docs, idCol, textCol, merges)
      .join(docs.select(col(idCol).as("doc_id"),
        col(groupCol).as("group")), "doc_id")
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subtokens")).as("n_subtokens"))
      .withColumn("subtokens_per_word",
        when(col("n_words") > 0, graft.functions.Num.fpRound(
          col("n_subtokens").cast("double") /
            col("n_words").cast("double"), 4)))
}
