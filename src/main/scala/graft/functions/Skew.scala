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

  /** Salted grouped top-k: phase 1 ranks within (key, salt) so a hot
    * key's rows spread over `numSalts` reducers and each contributes at
    * most k survivors; phase 2 ranks the <= numSalts*k survivors per key.
    * EXACT for any salt assignment: every row of a key's true top-k is
    * also within the top-k of its own salt slice, so it survives phase 1.
    * (Spark's WindowGroupLimit already bounds the per-key reducer input
    * to k rows per *map partition*; salting bounds it to k*numSalts
    * regardless of how many thousand partitions feed a 100 TB hot key.)
    * Ties on `orderCol` across phases are broken by `tieCols` — pass
    * enough columns to make the ordering total, or ties may differ from
    * an unsalted run. */
  def saltedTopK(df: DataFrame, keyCols: Seq[String], orderCol: String,
                 k: Int, tieCols: Seq[String] = Seq.empty,
                 numSalts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = col(orderCol).desc +: tieCols.map(col(_).asc)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(numSalts)))
    val w1 = Window.partitionBy((keyCols.map(col) :+ col("_salt")): _*)
      .orderBy(order: _*)
    val survivors = salted.withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= k).drop("_r1", "_salt")
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    survivors.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
  }

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
