package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-row-per-key dedup — the relational core of the reference's
  * Singer-target upsert (SURVEY §2.1 K1, §2.4 Q6): the target keeps the
  * last record per `key_properties` (`ID_COLUMNS`, `tap_wrike/config.py:
  * 16-22`). Implemented as a ranking window partitioned by the key — one
  * hash-partition shuffle on the key, then a per-partition sort; no
  * driver-side state.
  *
  * Tie-breaks are explicit (`tieBreak` columns, descending) so the result
  * is deterministic under re-execution — a requirement for idempotent
  * re-runs (upsert(upsert(x)) == upsert(x)).
  */
object Upsert {
  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
                   tieBreak: Seq[String] = Nil): DataFrame = {
    val ordering = (orderCol +: tieBreak).map(c => col(c).desc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
