package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Dates, Num}

/** Temporal joins Spark lacks as built-ins, each expressed in the shape
  * that survives 100 TB.
  *
  *  - [[asofJoin]]: the merge-scan as-of join — NO pair join at all.
  *    Both streams union into one frame, one shuffle on the equality
  *    key, and a running `last(..., ignoreNulls)` window carries the
  *    most recent right row forward into each left row. The naive
  *    formulation (theta-join on `r.ts <= l.ts` + per-left argmax)
  *    materializes every left×prior-right pair — quadratic per key in
  *    event depth; the merge scan is linear and carries ONE packed
  *    struct of the right row's attributes, so all matched columns
  *    come from the same right row by construction.
  *  - [[proximityAgg]]: the ε-banded interval join — each left row
  *    explodes to its 3 candidate time bands (band width = the radius),
  *    the right side lands in its own band, and the join is an
  *    EQUALITY join on the band key with the exact |Δt| ≤ radius
  *    predicate as a residual filter. A time-proximity join with no
  *    equality key would otherwise plan as a broadcast-nested-loop /
  *    cartesian scan; banding makes it a shuffle join whose per-band
  *    population is bounded by the data's arrival rate × radius.
  */
object Temporal {

  /** AS-OF JOIN: for each left row, the single most recent right row of
    * the same `keyCol` with `rightTs <= leftTs` — ties on the timestamp
    * broken by the LARGEST `rightIdCol` (a total order, so the result
    * is deterministic under any partitioning). Left rows with no prior
    * right row survive with NULL matched columns (left-outer
    * semantics — last-touch attribution must keep the unattributed).
    *
    * Output: every left column unchanged, then the matched right row's
    * id, timestamp and `payloadCols`, each renamed `prefix + name`.
    *
    * Scale shape: the two streams are unioned (right rows sort BEFORE
    * left rows on equal timestamps — `<=`, not `<`), shuffled ONCE on
    * the key, and scanned linearly per key by a running
    * `last(ignoreNulls)` window over a packed right-row struct. No
    * join operator appears in the plan; cost is one exchange + one
    * sort, identical to the sessionize (q13) class. Skew follows the
    * key's event depth, the same bound the naive join breaks
    * quadratically. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String, rightIdCol: String,
               payloadCols: Seq[String],
               prefix: String = "prior_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right.select(
      col(keyCol).as("_k"), col(rightTsCol).as("_ts"),
      lit(0).as("_side"), col(rightIdCol).as("_oid"),
      struct(col(rightIdCol).as("_id") +: col(rightTsCol).as("_rts") +:
        payloadCols.map(col): _*).as("_r"))
    val rType = r.schema("_r").dataType
    val oidType = r.schema("_oid").dataType
    val l = left.select(
      col(keyCol).as("_k"), col(leftTsCol).as("_ts"),
      lit(1).as("_side"), lit(null).cast(oidType).as("_oid"),
      lit(null).cast(rType).as("_r"),
      struct(leftCols.map(col): _*).as("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_side").asc, col("_oid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.withColumn("_l",
        lit(null).cast(l.schema("_l").dataType))
      .unionByName(l)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = leftCols.map(c => col("_l").getField(c).as(c)) ++
      Seq(col("_m._id").as(prefix + rightIdCol),
        col("_m._rts").as(prefix + rightTsCol)) ++
      payloadCols.map(c => col("_m").getField(c).as(prefix + c))
    matched.select(out: _*)
  }

  /** ε-BANDED interval aggregate: for each left row, the count of right
    * rows within `radiusMs` milliseconds (inclusive) of its timestamp,
    * plus the DECIMAL-exact sum of the right rows' 1e-4-rounded
    * `valueCol`. Left rows with no neighbor keep `n_near` 0 and a NULL
    * sum (no synthetic zero — an empty sum is absence, not 0.0).
    *
    * Band law: band = floor(epochMs / radiusMs); a |Δt| ≤ radius match
    * can only live in the left row's own band ± 1, so the left side
    * explodes to exactly those 3 band keys and each (left, right) pair
    * meets at most once (the right row holds a single band). The join
    * is an equality join on the band key — shuffle-partitionable,
    * AQE-skew-splittable — with the exact predicate as a residual
    * filter; no cartesian, no broadcast-nested-loop, regardless of
    * how many rows share a time window. */
  def proximityAgg(left: DataFrame, leftIdCol: String, leftTsCol: String,
                   right: DataFrame, rightTsCol: String,
                   valueCol: String, radiusMs: Long): DataFrame = {
    require(radiusMs > 0, s"radiusMs must be positive, got $radiusMs")
    val band = (ms: org.apache.spark.sql.Column) =>
      floor(ms.cast("double") / lit(radiusMs.toDouble)).cast("long")
    val lb = left.select(col(leftIdCol).as("_lid"),
        Dates.toEpochMillis(col(leftTsCol)).as("_lms"))
      .withColumn("_band", explode(array(
        band(col("_lms")) - 1, band(col("_lms")), band(col("_lms")) + 1)))
    val rb = right.select(
        Dates.toEpochMillis(col(rightTsCol)).as("_rms"),
        Num.fpRound(col(valueCol), 4).as("_rv"))
      .withColumn("_band", band(col("_rms")))
    lb.join(rb,
        lb("_band") === rb("_band") &&
          abs(col("_lms") - col("_rms")) <= lit(radiusMs), "left")
      .groupBy(col("_lid").as(leftIdCol))
      .agg(count(col("_rms")).as("n_near"),
        Num.dsum(col("_rv")).as("v_sum"))
  }
}
