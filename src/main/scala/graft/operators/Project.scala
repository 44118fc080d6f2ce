package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Projection to a declared schema (SURVEY §2.1 P1): the reference keeps
  * only keys present in the stream's JSON-Schema and silently drops the
  * rest (`tap_wrike/utility.py:283`). In Spark this is a plain `select`,
  * which Catalyst turns into column pruning pushed all the way into the
  * parquet scan (`ReadSchema` lists only the declared columns).
  */
object Project {
  /** Keep exactly `declared` columns, in that order. Unknown names raise —
    * the declared schema is a contract, not a hint. */
  def toDeclared(df: DataFrame, declared: Seq[String]): DataFrame =
    df.select(declared.map(col): _*)

  /** Lenient variant: intersect with what's actually present (the
    * reference's drop-extras behavior when rows carry unknown keys). */
  def toDeclaredLenient(df: DataFrame, declared: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(declared.filter(present.contains).map(col): _*)
  }
}
