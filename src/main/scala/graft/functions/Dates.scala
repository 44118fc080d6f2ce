package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time normalization suite (SURVEY §2.1 T1).
  *
  * Reference behavior: `tap_xero/utility.py:354-372` parses Microsoft-JSON
  * dates `/Date(1672531200000+1300)/` by taking the leading epoch-millis as
  * UTC and *ignoring* the trailing display offset; `tap_wrike/utility.py:
  * 198-206,242-261` do ISO formatting/parsing with millisecond truncation.
  * All of it is re-expressed as codegen'd built-in expressions — no UDFs.
  */
object Dates {

  private val MsJsonMillis = "^/Date\\((-?\\d+)(?:[+-]\\d+)?\\)/$"

  /** Parse `/Date(ms±offset)/` → timestamp (UTC). Falls back to ISO-8601
    * parsing for plain strings, mirroring the reference's dual-path parse.
    */
  def parseMsJsonDate(c: Column): Column = {
    val ms = regexp_extract(c, MsJsonMillis, 1)
    // try_*: a malformed poison row yields NULL instead of killing the
    // job under ANSI mode (the reference raises per-row; a distributed
    // job must not)
    when(c.startsWith("/Date("), timestamp_millis(try_cast_long(ms)))
      .otherwise(try_to_timestamp(c))
  }

  private def try_cast_long(c: Column): Column = c.try_cast("long")

  // unix_millis rejects TIMESTAMP_NTZ (how parquet timestamps without
  // isAdjustedToUTC land in Spark 4). The session runs UTC, so the
  // NTZ→LTZ cast is epoch-identity; on an already-LTZ column it's a no-op.
  private def epochMs(ts: Column): Column = unix_millis(ts.cast("timestamp"))

  /** Render a timestamp as a MS-JSON date string (test-vector generator). */
  def toMsJsonDate(ts: Column, offset: String = "+0000"): Column =
    concat(lit("/Date("), epochMs(ts).cast("string"), lit(offset + ")/"))

  /** ISO-8601 with millisecond precision and Z suffix — the reference's
    * canonical output shape (`tap_xero/utility.py:371-372`). */
  def toIsoMillis(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** Epoch millis (reference `iso_to_unix`, `tap_wrike/utility.py:248-251`). */
  def toEpochMillis(ts: Column): Column = epochMs(ts)
}
