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

  /** SCD TYPE-2 dimension build (x148): from an event/version stream
    * `(key, ts, tieId, attribute)`, one row per key per RUN of equal
    * consecutive attribute values — the classic warehouse
    * slowly-changing-dimension table: `valid_from_ms` (run start),
    * `valid_to_ms` (next run's start; NULL on the current run),
    * `version` (1-based per key), `is_current`, and `n_events` (rows
    * collapsed into the run). Consecutive-equal collapse is the SCD2
    * point — re-asserting an unchanged attribute extends the current
    * validity interval instead of opening a new version, but a value
    * that REVERTS later opens a fresh version (history, not dedup).
    *
    * Event order per key is `(ts, tieId)` — total, so versioning is
    * deterministic under any partitioning. NULL attribute values are a
    * legal state: the change test is null-safe (NULL → NULL extends,
    * NULL → x and x → NULL change).
    *
    * Scale shape: ONE exchange on the key and two linear per-key window
    * scans (change flags + running version number), then the collapse
    * aggregate and a per-(key, version) lead — all on the same key
    * partitioning, no join anywhere. The asofJoin/sessionize class:
    * cost follows per-key event depth linearly. */
  def scd2(events: DataFrame, keyCol: String, tsCol: String,
           tieIdCol: String, attrCol: String): DataFrame = {
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col("_ms").asc, col(tieIdCol).asc)
    val flagged = events
      .select(col(keyCol), col(tieIdCol), col(attrCol).as("_attr"),
        Dates.toEpochMillis(col(tsCol)).as("_ms"))
      .withColumn("_chg", when(
        col("_attr") <=> lag(col("_attr"), 1).over(ordered), lit(0L))
        .otherwise(lit(1L)))
      .withColumn("version", sum(col("_chg")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged.groupBy(col(keyCol), col("version"))
      .agg(min(col("_ms")).as("valid_from_ms"),
        // one run holds one attribute value by construction; min is a
        // deterministic pick that tolerates the all-NULL run
        min(col("_attr")).as(attrCol),
        count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(col(keyCol))
      .orderBy(col("version").asc)
    runs
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1)
        .over(byVersion))
      .withColumn("is_current", col("valid_to_ms").isNull)
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from_ms"), col("valid_to_ms"), col("is_current"),
        col("n_events"))
  }

  /** POINT-IN-TIME dimension enrichment (x155) — the [[scd2]] loop
    * closed on the consumption side: each fact row joins the dimension
    * VERSION that was current at its own timestamp (`valid_from <= ts`,
    * latest such version — exactly the interval containing ts, since
    * versions tile each key's timeline). This is the join a warehouse
    * runs against an SCD2 dimension ("what plan was this user on WHEN
    * they purchased"), and joining on the current version instead is
    * the classic time-travel bug this operator exists to prevent.
    * Facts BEFORE the key's first version (or with no dimension key)
    * keep NULL attributes — left-outer, like [[asofJoin]].
    *
    * Implementation IS [[asofJoin]] on the version-start column: the
    * dimension's (key, valid_from, attr, version) rows play the right
    * stream, so the whole lookup is the merge scan — ONE key exchange,
    * no interval predicate, no range join; the version picked by
    * "latest valid_from at-or-before ts" is the containing interval by
    * the tiling invariant. Version starts are unique per key, so the
    * as-of tie law never fires. Both time axes ride epoch-ms longs
    * (the dimension already stores ms; the fact ts converts via the
    * tz-safe [[Dates.toEpochMillis]]) — no timestamp-flavor coupling
    * between the two inputs. */
  def enrichAsOf(facts: DataFrame, dim: DataFrame, keyCol: String,
                 factTsCol: String, attrCols: Seq[String],
                 prefix: String = "dim_"): DataFrame = {
    val f = facts.withColumn("_fms",
      Dates.toEpochMillis(col(factTsCol)))
    val vers = dim.select(col(keyCol) +:
      col("valid_from_ms").as("_vfrom") +:
      col("version") +: attrCols.map(col): _*)
    asofJoin(f, vers, keyCol, "_fms", "_vfrom", "version",
      attrCols, prefix)
      .drop("_fms", prefix + "_vfrom")
  }

  /** POSITION-BASED (U-shaped) multi-touch attribution (x149): each
    * purchase distributes credit over the SAME user's clicks in the
    * `[purchase − windowMs, purchase]` lookback, under the standard
    * U-shape: one touch takes 1.0, two take 0.5 each, three-plus give
    * 0.4 to the first touch, 0.4 to the last, and the middle touches
    * split 0.2 evenly — the first-contact/closer law single-touch
    * (x143) flattens away. Output is PAIR grain
    * `(purchase id, click id, touch_rank, n_touches, weight, credit)`:
    * `touch_rank` orders the window's clicks by (ts, id) ascending,
    * `credit` = the purchase's 1e-4-rounded value × weight, 1e-6 — a
    * click's total earned credit is one groupBy away. Purchases with
    * no in-window click don't appear (x143 reports the unattributed).
    *
    * Weight law is EXACT in both engines: weights come from one CASE
    * on integers (n, rank); 0.2/(n−2) is a single IEEE divide of
    * constants, rounded 1e-6; ties at the same instant order by id.
    *
    * Scale shape: [[proximityAgg]]'s band trick made ONE-SIDED — the
    * purchase explodes to its 2 candidate `(user, band)` keys (band
    * width = the window), the click lands in its own, and the join is
    * an equality join on (user, band) with `0 ≤ Δt ≤ window` as a
    * residual — no theta join, per-key population bounded by the
    * user's arrival rate × window. The rank window then partitions by
    * purchase id — the pair stream's own grain. */
  def multiTouchAttribution(purchases: DataFrame, pIdCol: String,
                            pTsCol: String, pValueCol: String,
                            clicks: DataFrame, cIdCol: String,
                            cTsCol: String, keyCol: String,
                            windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val band = (ms: org.apache.spark.sql.Column) =>
      floor(ms.cast("double") / lit(windowMs.toDouble)).cast("long")
    val pb = purchases.select(col(keyCol).as("_k"),
        col(pIdCol).as("purchase_id"),
        Dates.toEpochMillis(col(pTsCol)).as("_pms"),
        Num.fpRound(col(pValueCol), 4).as("_pv"))
      .withColumn("_band", explode(array(
        band(col("_pms")) - 1, band(col("_pms")))))
    val cb = clicks.select(col(keyCol).as("_k"),
        col(cIdCol).as("click_id"),
        Dates.toEpochMillis(col(cTsCol)).as("_cms"))
      .withColumn("_band", band(col("_cms")))
    val pairs = pb.join(cb, Seq("_k", "_band"))
      .filter(col("_pms") - col("_cms") >= 0 &&
        col("_pms") - col("_cms") <= lit(windowMs))
    val wRank = Window.partitionBy(col("purchase_id"))
      .orderBy(col("_cms").asc, col("click_id").asc)
    val wN = Window.partitionBy(col("purchase_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = pairs
      .withColumn("touch_rank", row_number().over(wRank).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wN))
    val weight = Num.fpRound(
      when(col("n_touches") === 1, lit(1.0))
        .when(col("n_touches") === 2, lit(0.5))
        .when(col("touch_rank") === 1, lit(0.4))
        .when(col("touch_rank") === col("n_touches"), lit(0.4))
        .otherwise(lit(0.2) / (col("n_touches") - lit(2))), 6)
    ranked
      .withColumn("weight", weight)
      .withColumn("credit", Num.fpRound(col("_pv") * col("weight"), 6))
      .select(col("purchase_id"), col("click_id"), col("touch_rank"),
        col("n_touches"), col("weight"), col("credit"))
  }
}
