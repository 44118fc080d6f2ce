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
}
