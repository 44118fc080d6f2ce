package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregates — the 100 TB path for distinct counts and quantiles.
  *
  * Exact COUNT(DISTINCT x) shuffles every distinct value; exact
  * percentiles sort every group. The sketch forms move a constant-size
  * summary per (partition x group) instead — HyperLogLog++ registers for
  * distinct counts, a KLL/GK-style summary for quantiles — and both merge
  * associatively, so AQE re-planning and partition count don't change the
  * answer's error bound. These are deliberately NOT in the DuckDB oracle
  * inventory: sketch internals differ across engines, so there is no
  * bit-stable cross-engine result to hash (x24 carries the exact-
  * percentile oracle; SketchesSpec bounds these against exact answers).
  */
object Sketches {

  /** Approximate distinct values of `valueCol` per group (HLL++, default
    * relative standard deviation 5%). */
  def approxDistinctByGroup(df: DataFrame, groupCol: String,
                            valueCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate percentiles of `valueCol` per group (one-pass summary;
    * `accuracy` trades memory for error = 1/accuracy). */
  def approxPercentilesByGroup(df: DataFrame, groupCol: String,
                               valueCol: String, probs: Seq[Double],
                               accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol),
          array(probs.map(lit): _*), lit(accuracy))
        .as("approx_percentiles"))

  /** KMV DISTINCT-COUNT SKETCH (x166) — the k-minimum-values estimator
    * per group, the ORACLE-CHECKABLE sibling of [[approxDistinctByGroup]]:
    * hash every value onto the 60-bit grid (first 15 hex chars of md5 —
    * the repo's deterministic-hash convention, identically computable in
    * any engine, unlike HLL register layouts), keep each group's k
    * smallest DISTINCT hashes, and estimate
    * `D̂ = (k−1) · 2⁶⁰ / h₍ₖ₎` — the classic KMV/bottom-k estimator
    * (Bar-Yossef et al. 2002). A group with fewer than k distinct
    * hashes keeps them all and its estimate IS the exact count (the
    * sketch hasn't saturated). The output carries the exact distinct
    * count and the grid-rounded relative error next to the estimate —
    * the acceptance view (x128's recall pattern: every approximate
    * operator here ships with its exact twin in the same row).
    *
    * Scale shape: `(group, hash)` dedup is one exchange; the k-smallest
    * survivors come from [[graft.functions.Skew.saltedTopK]] (per-salt
    * partial top-k, then a k·salts-row final pass — no full-group
    * window); the k-row-per-group sketch frame aggregates to one row
    * per group and joins the exact side group-keyed. The exact
    * countDistinct leg is the audit, not the serving path — at 100 TB
    * the sketch column alone is the product. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15),
      16, 10).cast("long")
    val hashes = df.select(col(groupCol).as("grp"), h.as("_h")).distinct()
    // k smallest per group = top-k by descending -_h (saltedTopK is
    // max-first); _h <= 2^60 so negation is safe
    val minK = graft.functions.Skew.saltedTopK(
      hashes.withColumn("_nh", -col("_h")), Seq("grp"), "_nh", k,
      tieCols = Seq("_h"))
    val sketch = minK.groupBy(col("grp"))
      .agg(count(lit(1)).as("_nk"), max(col("_h")).as("kth_min"))
    val exact = df.select(col(groupCol).as("grp"), col(valueCol))
      .groupBy(col("grp"))
      .agg(count_distinct(col(valueCol)).as("n_exact"))
    val two60 = math.pow(2.0, 60) // exact in double (power of two)
    sketch.join(exact, Seq("grp"))
      .withColumn("estimate",
        when(col("_nk") < k, col("_nk").cast("double"))
          .otherwise(graft.functions.Num.fpRound(
            lit((k - 1).toDouble) * lit(two60) / col("kth_min"), 4)))
      .withColumn("rel_err", graft.functions.Num.fpRound(
        abs(col("estimate") - col("n_exact")) / col("n_exact"), 6))
      .select(col("grp").as(groupCol), col("n_exact"), col("kth_min"),
        col("estimate"), col("rel_err"))
  }
}
