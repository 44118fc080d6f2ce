package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven flatteners (SURVEY §2.1 F1-F4).
  *
  * The reference flattens nested API JSON row-at-a-time in Python
  * (`tap_wrike/utility.py:34-56` — `-`-joined keys, list items by index;
  * `tap_hubspot/utility.py:99` — properties hoist; `:200-209` — association
  * prefix). Here flattening is *plan-time*: we walk the DataFrame's
  * `StructType` once on the driver and emit a single `select` list, so the
  * whole operation is a zero-shuffle projection inside whole-stage codegen.
  */
object Flatten {

  /** F1 — recursive flatten. Nested struct fields become `parent-child`
    * columns; array fields are exploded positionally up to `maxListIndex`
    * items (`key-0`, `key-1`, …) mirroring the reference's index-suffixed
    * list flattening. Fields named in `preserve` are kept as-is (the
    * reference exempts substream-bound lists, `tap_wrike/utility.py:43-44`).
    */
  def flatten(df: DataFrame, sep: String = "-", maxListIndex: Int = 3,
              preserve: Set[String] = Set.empty): DataFrame = {
    def walk(prefix: String, path: Column, dt: DataType): Seq[Column] = dt match {
      case st: StructType =>
        st.fields.flatMap { f =>
          val name = if (prefix.isEmpty) f.name else s"$prefix$sep${f.name}"
          if (preserve.contains(f.name)) Seq(path.getField(f.name).as(name))
          else walk(name, path.getField(f.name), f.dataType)
        }
      case ArrayType(et, _) =>
        // try_element_at: index past the list end yields null (ANSI-safe),
        // matching the reference's index-suffixed flatten of short lists
        (0 until maxListIndex).flatMap { i =>
          val name = s"$prefix$sep$i"
          et match {
            case st: StructType => walk(name, try_element_at(path, lit(i + 1)), st)
            case _ => Seq(try_element_at(path, lit(i + 1)).as(name))
          }
        }
      case _ => Seq(path.as(prefix))
    }
    val cols = df.schema.fields.flatMap { f =>
      if (preserve.contains(f.name)) Seq(col(f.name))
      else walk(f.name, col(f.name), f.dataType)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** F2 — hoist a map/struct column's fields to top level and drop the
    * envelope (HubSpot `properties`, `tap_hubspot/utility.py:99`). */
  def hoistStruct(df: DataFrame, field: String): DataFrame =
    df.select(col("*"), col(s"$field.*")).drop(field)

  /** F3 — prefix-rename all columns of a child/association DataFrame
    * (`companies_id` style, `tap_hubspot/utility.py:200-209`). */
  def prefixColumns(df: DataFrame, prefix: String, sep: String = "_"): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"$prefix$sep$c")).toIndexedSeq: _*)

  /** Q3 helper — project JSON-string column keys into typed flat columns
    * (`props` → `props-k`). Keys and target types are declared, so the
    * extraction stays a codegen'd `get_json_object` projection.
    */
  def flattenJsonString(df: DataFrame, jsonCol: String,
                        keys: Seq[(String, DataType)],
                        sep: String = "-"): DataFrame = {
    val extracted = keys.map { case (k, dt) =>
      // try_cast: malformed JSON values become NULL, not job failures
      get_json_object(col(jsonCol), s"$$.$k").try_cast(dt.sql).as(s"$jsonCol$sep$k")
    }
    df.select(col("*") +: extracted: _*).drop(jsonCol)
  }
}
