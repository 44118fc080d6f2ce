package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Guards

/** Entity-resolution operators — fuzzy matching of dirty name/label
  * columns, the warehouse cleanup step upstream of every dimension
  * build (the reference lands raw `name` columns from five SaaS taps;
  * reconciling near-identical spellings across them is the classic
  * post-load job). Built the way ER scales: canonicalize to the
  * DISTINCT-value dictionary first, block, cheap-filter, and only
  * then pay the edit-distance kernel on surviving candidate pairs —
  * never an all-pairs join over rows.
  */
object Resolution {

  /** BLOCKED FUZZY NAME MATCH (x185) — candidate duplicate pairs of
    * DISTINCT name values within an edit distance: for every pair of
    * distinct names sharing a blocking key (the last whitespace
    * token — the head noun of a `"<modifier> <noun>"` label; callers
    * with other shapes pass their own `blockKey`), with string
    * lengths within `maxDist` of each other and Levenshtein distance
    * ≤ `maxDist`, one row `(name_a, name_b, id_a, id_b, n_a, n_b,
    * dist)` — each name's canonical id (its MIN source id) and row
    * count ride along so the merge decision (keep the heavier
    * spelling) needs no second corpus pass.
    *
    * The three-stage cut is the textbook ER funnel:
    *  1. DICTIONARY, not rows — one aggregate collapses the corpus to
    *     distinct names (+ min-id + count); all pair work happens at
    *     name-dictionary cardinality.
    *  2. BLOCK + LENGTH — the equi-join on the blocking key bounds
    *     candidates to same-block pairs, and
    *     `|len(a) − len(b)| ≤ maxDist` (a true lower bound on edit
    *     distance) prunes before any kernel runs.
    *  3. BOUNDED KERNEL — Spark's 3-arg `levenshtein(l, r, threshold)`
    *     computes the banded O(maxDist·min(len)) form and returns −1
    *     past the bound, so no pair ever pays the full O(len²) table.
    *
    * Scale shape: one corpus aggregate (map-side combined) + one
    * equi self-join of the name dictionary on the block key. Block
    * sizes are guarded fail-fast ([[Guards.requireSmallGroups]]) —
    * a degenerate blocking key (every name the same noun) is an
    * immediate explanatory error, not a quadratic job; the fix is a
    * finer key, exactly like x52's `maxFpDf` law. */
  def fuzzyNameMatches(df: DataFrame, idCol: String, nameCol: String,
                       maxDist: Int = 2,
                       maxBlockNames: Long = 10000): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val names = df
      .filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("_name"))
      .agg(min(col(idCol)).as("_id"), count(lit(1)).as("_n"))
      .withColumn("_blk", regexp_extract(col("_name"), "(\\S+)$", 1))
    Guards.requireSmallGroups(names, "_blk", maxBlockNames,
      "fuzzyNameMatches", "a finer blocking key (more tokens, or " +
        "token + length band)")
    val a = names.select(col("_name").as("name_a"), col("_id").as("id_a"),
      col("_n").as("n_a"), col("_blk"))
    val b = names.select(col("_name").as("name_b"), col("_id").as("id_b"),
      col("_n").as("n_b"), col("_blk"))
    a.join(b, Seq("_blk"))
      .filter(col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b")))
        <= lit(maxDist))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("id_a"), col("id_b"),
        col("n_a"), col("n_b"), col("dist"))
  }
}
