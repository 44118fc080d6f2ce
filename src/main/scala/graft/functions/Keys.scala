package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Synthetic composite keys (SURVEY §2.1 E2): the reference builds child-row
  * primary keys as `{parent_id}_{child_key}` string concatenations
  * (`tap_wrike/fetch.py:13-20`, `tap_hubspot/fetch.py:17-44`,
  * `tap_xero/fetch.py:99-104`). Codegen'd `concat_ws`, never a UDF.
  */
object Keys {
  /** `parts` joined by `_` after casting everything to string. */
  def compositeKey(parts: Column*): Column =
    concat_ws("_", parts.map(_.cast("string")): _*)
}
