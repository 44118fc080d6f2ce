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

  /** The CMS row hash: bucket of `key` in depth-row `d` —
    * `md5("<d>:<key>")`'s first 15 hex chars as a long, mod width.
    * Deterministic and SQL-mirrorable (the x7/x26 md5 law), so the
    * whole sketch is oracle-checkable bit-for-bit. */
  private def cmsBucket(keyCol: String, d: Int, width: Int) =
    pmod(conv(substring(md5(concat_ws(":", lit(d.toString),
      col(keyCol).cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(width.toLong))

  /** COUNT-MIN SKETCH heavy-hitter audit (x182) — build a `depth ×
    * width` count-min sketch over a key column and read the true
    * top-`topK` keys back through it: `(key, n_rows, rank,
    * cms_estimate)` with `cms_estimate = min_d sketch[d][h_d(key)]`.
    * CMS never underestimates (`estimate ≥ n_rows`, spec-pinned); the
    * gap is collision mass, bounded by `2N/width` with probability
    * `1 − 2^−depth` (Cormode & Muthukrishnan 2005). The audit says
    * whether a `depth × width` budget is enough for this corpus's
    * heavy-hitter tracking before anyone trusts the sketch in a
    * stream.
    *
    * Scale shape: the sketch is built from the per-key COUNT frame,
    * not raw rows (CMS cells are sums of per-key totals — same cells,
    * key-cardinality replication instead of corpus replication), so
    * the only corpus-sized exchange is the count aggregate's
    * (map-side combined). The sketch itself is `depth·width` rows —
    * constant — and BROADCASTS back onto the probe keys; the true
    * top-k rides [[graft.functions.Skew.saltedTopK]]. At 100 TB the
    * same build is one aggregate + one tiny sketch — and the sketch
    * MERGES across partitions/streams by cell-wise addition, which is
    * why it is the standard streaming heavy-hitter layout. */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, depth: Int = 3,
                      width: Int = 1024, topK: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 8,
      s"depth must be in [1, 8], got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val keys = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val rows = (0 until depth).map(d => struct(lit(d).as("d"),
      cmsBucket(keyCol, d, width).as("b")))
    val sketch = keys
      .select(explode(array(rows: _*)).as("_db"), col("n_rows"))
      .groupBy(col("_db.d").as("d"), col("_db.b").as("b"))
      .agg(sum(col("n_rows")).as("c"))
    val top = graft.functions.Skew.saltedTopK(keys, Seq.empty, "n_rows",
      topK, tieCols = Seq(keyCol))
    top.select(col(keyCol), col("n_rows"), col("rank"),
        explode(array(rows: _*)).as("_db"))
      .join(broadcast(sketch),
        col("_db.d") === col("d") && col("_db.b") === col("b"))
      .groupBy(col(keyCol), col("n_rows"), col("rank"))
      .agg(min(col("c")).as("cms_estimate"))
  }

  /** HISTOGRAM-QUANTILE SKETCH + ACCEPTANCE METRIC (x203) — the
    * oracle-checkable sibling of [[approxPercentilesByGroup]] (the
    * x166 pattern: KMV stands in for HLL, this stands in for
    * KLL/GK): per group, an EQUI-WIDTH integer histogram over the
    * group's own [min, max] — `idx = (v−min)·B div (max−min+1)`,
    * exact integer arithmetic, every cell mergeable — read back at
    * each requested quantile as the MIDPOINT of the bucket holding
    * rank `ceil(q·n)`, next to the exact double-ceil value and the
    * 1e-6-grid relative error. The histogram is what a 100 TB
    * engine actually maintains (constant-size, cell-additive across
    * partitions AND ingest batches); the rel_err column is the
    * audit that says whether B buckets are enough for this column's
    * shape — every approximate operator here ships with its
    * acceptance metric.
    *
    * Scale shape: one corpus aggregate to (group × ≤B) cells
    * (map-side combined); the cumulative/pick/estimate stages run
    * on B-bounded per-group frames (the documented window exception
    * class); the exact leg is [[TextAnalysis.groupedQuantiles]]'
    * bucketed rank — no per-group sort on either side. */
  def histogramQuantiles(df: DataFrame, idCol: String, groupCol: String,
                         valueCol: String, buckets: Int,
                         quantiles: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(quantiles.nonEmpty, "quantiles must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(idCol).as("_id"), col(groupCol).as("_g"),
      col(valueCol).cast("long").as("_v"))
    val stats = vals.groupBy(col("_g"))
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"),
        count(lit(1)).as("_ng"))
    val cells = vals.join(broadcast(stats), Seq("_g"))
      .withColumn("_idx", expr(
        s"CAST(_v - _mn AS DECIMAL(38,0)) * $buckets div (_mx - _mn + 1)"))
      .groupBy(col("_g"), col("_idx"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells.withColumn("_cum", sum(col("_c")).over(w))
      .join(broadcast(stats), Seq("_g"))
    val qdf = quantiles.toDF("quantile")
    val hit = cum.join(broadcast(qdf),
        col("_cum") >= ceil(col("quantile") * col("_ng")).cast("long"))
      .groupBy(col("_g"), col("quantile"))
      .agg(min(col("_idx")).as("_qi"))
      .join(broadcast(stats), Seq("_g"))
    val est = col("_mn").cast("double") +
      (col("_qi") + lit(0.5)) *
        (col("_mx") - col("_mn") + lit(1L)).cast("double") /
        lit(buckets)
    val exact = graft.operators.TextAnalysis.groupedQuantiles(
        vals, "_id", "_g", "_v", quantiles)
      .select(col("_g"), col("quantile"), col("_v").as("exact_units"))
    hit.select(col("_g"), col("quantile"),
        graft.functions.Num.fpRound(est, 6).as("est_units"),
        est.as("_e"))
      .join(exact, Seq("_g", "quantile"))
      .select(col("_g").as(groupCol), col("quantile"), col("est_units"),
        col("exact_units"),
        // |est − exact| / |exact|: the denominator is abs()ed too, so
        // a group whose exact quantile is NEGATIVE still reports a
        // non-negative relative error (the acceptance metric must be
        // sign-blind on signed value columns)
        when(col("exact_units") =!= 0, graft.functions.Num.fpRound(
          abs(col("_e") - col("exact_units")) / abs(col("exact_units")),
          6)).as("rel_err"))
  }
}
