package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (most-recent-match) via the interleaved-window formulation.
  *
  * The classic as-of join ("for each left row, the latest right row with
  * rightTime <= leftTime, per key") is expressed WITHOUT a range join:
  * union both sides tagged, sort per key by time, and carry the last seen
  * right-side value forward with `last(_, ignoreNulls)` over the preceding
  * frame. One shuffle on the key, one per-partition sort — the same cost
  * as a window aggregate, immune to the quadratic blowup of a naive
  * time-range join condition. (Spark's own WindowExec streams the frame.)
  */
object AsOf {

  /** For each `left` row: the latest `right` row's `valueCol` with
    * `right.tsCol <= left.tsCol`, matched per `keyCol`. Output = left rows
    * + `asof_<valueCol>` (+ `asof_ts`). Ties on ts: the right side sorts
    * before the left (<=` semantics), then by `tieBreak`. */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           valueCol: String, tieBreak: String): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("_rts", lit(null).cast(right.schema(tsCol).dataType))
    val r = right.select(col(keyCol), col(tsCol), col(valueCol), col(tieBreak))
      .withColumn("_side", lit(0))
      .withColumn("_rv", col(valueCol))
      .withColumn("_rts", col(tsCol))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select(l.columns.map(col).toIndexedSeq: _*).unionByName(l)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("_rv"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("_rts"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv", "_rts")
  }
}
