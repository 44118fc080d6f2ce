package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys: two-phase salted aggregate.
  *
  * Phase 1 groups on (key, salt) — the hot key's rows spread over
  * `numSalts` reducers; phase 2 merges the partials on the key alone.
  * Correct for any algebraic aggregate expressed as (partial, merge)
  * pairs. AQE's skew handling covers joins; aggregation skew on a
  * pathological key still benefits from explicit salting.
  */
object Skew {

  /** Salted sum/count aggregate: returns one row per key with
    * `sum_<col>` / `cnt` columns, computed skew-resistantly. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], sumCol: String,
                     numSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(numSalts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(sumCol).cast("decimal(38,6)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).cast("double").as(s"sum_$sumCol"),
        sum(col("_pcnt")).as("cnt"))
  }
}
