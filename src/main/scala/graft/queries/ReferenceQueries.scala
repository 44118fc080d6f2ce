package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.{Dates, Keys, Num}
import graft.operators.{Flatten, Project, Substreams, Upsert, Watermark}

/** Reference-derived query inventory (SURVEY §2.4 Q1-Q12 + Q13 sessionize).
  * Each entry has a matching ANSI-SQL oracle (DuckDB) over the same parquet
  * fixtures; column names/aliases are kept identical on both sides because
  * the driver's compare sorts columns by name before hashing.
  */
object ReferenceQueries {

  /** Fixed bookmark used by the watermark queries (events span 2024-01). */
  val Bookmark = "2024-01-15 00:00:00"

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — proposal_durations semantics (dbt proposal_durations.sql:6-19):
    // equality filter + NOT NULL x2 + lower(...) LIKE + epoch-diff/86400
    // rounded to 4. lineitem⋈orders is a key-equi join; orders-side filters
    // are pushed below the join by Catalyst.
    "q1_task_durations" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderdate").isNotNull && col("l_shipdate").isNotNull &&
          lower(col("o_orderpriority")).like("%urgent%"))
        .select(col("o_orderkey"), col("l_linenumber"),
          Num.fpRound((unix_millis(col("l_shipdate").cast("timestamp")) -
            unix_millis(col("o_orderdate").cast("timestamp"))) / lit(8.64e7), 4)
            .as("duration_days"))
    }),

    // Q2 — incremental watermark scan (W1/W2): pushed-down ts predicate.
    "q2_watermark_scan" -> ((s, dir) =>
      Watermark.newerThan(t(s, dir, "events"), "ts", Bookmark)),

    // Q3 — JSON-string flatten to `props-k` (F1 over the fixture shape).
    "q3_flatten_json" -> ((s, dir) =>
      Flatten.flattenJsonString(
        t(s, dir, "events").select("event_id", "props"),
        "props", Seq(("k", LongType)))),

    // Q4 — substream extraction: lineitem as child of orders with
    // parent_id FK + synthetic `{parent}_{line}` key (E1/E2).
    "q4_explode_substream" -> ((s, dir) =>
      Substreams.fromChildTable(t(s, dir, "lineitem"),
        fkCol = "l_orderkey", childKeyCol = "l_linenumber",
        childCols = Seq("l_linenumber", "l_quantity", "l_extendedprice"))),

    // Q5 — projection to declared schema (P1): column pruning at the scan.
    "q5_schema_project" -> ((s, dir) =>
      Project.toDeclared(t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_mktsegment"))),

    // Q6 — target-upsert dedup: latest row per user_id (K1 semantics).
    "q6_upsert_dedup" -> ((s, dir) =>
      Upsert.latestPerKey(t(s, dir, "events"), Seq("user_id"), "ts",
          tieBreak = Seq("event_id"))
        .select("user_id", "event_id", "ts", "event_type", "value")),

    // Q7 — multi-tenant enrichment (S3/T3). The reference scans each tenant
    // separately and stamps lit() columns, then unions; with tenants as a
    // dimension table the Spark-first plan is a broadcast hash join — same
    // result, no per-tenant driver loop, no shuffle of the fact side.
    "q7_multi_tenant_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_nationkey").as("tenant_id"), col("n_name").as("tenant_name"))
    }),

    // Q8 — MS-JSON `/Date(ms±tz)/` parse (T1): round-trips events.ts
    // through the wire format; offset is display-only and ignored, matching
    // the reference parser.
    "q8_date_parse_msjson" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), Dates.toMsJsonDate(col("ts"), "+1300").as("raw"))
        .withColumn("parsed_ts", Dates.parseMsJsonDate(col("raw")))),

    // Q9 — interval-chunked scan (S4): yearly buckets of orders.
    "q9_interval_chunks" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(date_trunc("year", col("o_orderdate")).as("bucket_start"))
        .agg(count(lit(1)).as("n_orders"),
          Num.dsum(col("o_totalprice")).as("total_value"))),

    // Q10 — association flatten (F3): child columns prefix-renamed.
    "q10_assoc_flatten" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val nat = Flatten.prefixColumns(t(s, dir, "nation"), "nation")
      sup.join(broadcast(nat),
          sup("s_nationkey") === nat("nation_n_nationkey"))
        .select("s_suppkey", "s_name", "nation_n_nationkey",
          "nation_n_name", "nation_n_regionkey")
    }),

    // Q11 — analytics rollup (S5/T2): daily × breakdown with synthetic id.
    "q11_analytics_rollup" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date_key"),
          col("event_type").as("breakdown"))
        .agg(count(lit(1)).as("n_events"),
          Num.dsum(col("value")).as("value_sum"))
        .withColumn("id", concat_ws("-", col("date_key"), col("breakdown")))),

    // Q12 — bookmark advance (W3 analytics policy): max(ts) over the batch.
    "q12_bookmark_advance" -> ((s, dir) =>
      Watermark.newerThan(t(s, dir, "events"), "ts", Bookmark)
        .agg(max(col("ts")).as("new_bookmark"),
          count(lit(1)).as("rows_seen"))),

    // Q13 — gap-based sessionization: batch analog of the streaming
    // mapGroupsWithState operator (graft.streaming). One shuffle on
    // user_id shared by the lag window, the running sum, and the final
    // group-by (same partitioning reused across all three).
    "q13_sessionize" -> ((s, dir) => {
      val gapMs = 30L * 60 * 1000
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("_brk",
          when(lag(col("ts"), 1).over(w).isNull ||
            Dates.toEpochMillis(col("ts")) -
              Dates.toEpochMillis(lag(col("ts"), 1).over(w))
              > gapMs, 1).otherwise(0))
        .withColumn("sess", sum(col("_brk")).over(run))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .select(Keys.compositeKey(col("user_id"), col("sess")).as("session_id"),
          col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_task_durations" ->
      """SELECT o_orderkey, l_linenumber,
         floor((epoch_ms(l_shipdate) - epoch_ms(o_orderdate)) / 86400000.0
           * 10000 + 0.5) / 10000.0 AS duration_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F' AND o_orderdate IS NOT NULL
           AND l_shipdate IS NOT NULL
           AND lower(o_orderpriority) LIKE '%urgent%'""",
    "q2_watermark_scan" ->
      s"SELECT * FROM events WHERE ts > TIMESTAMP '$Bookmark'",
    "q3_flatten_json" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS "props-k"
         FROM events""",
    "q4_explode_substream" ->
      """SELECT l_orderkey AS parent_id, l_linenumber, l_quantity,
         l_extendedprice,
         CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
           AS id
         FROM lineitem""",
    "q5_schema_project" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "q6_upsert_dedup" ->
      """SELECT user_id, event_id, ts, event_type, value FROM events
         QUALIFY row_number() OVER
           (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""",
    "q7_multi_tenant_union" ->
      """SELECT c_custkey, c_name, c_acctbal, n_nationkey AS tenant_id,
         n_name AS tenant_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey""",
    "q8_date_parse_msjson" ->
      """SELECT event_id,
         '/Date(' || CAST(epoch_ms(ts) AS VARCHAR) || '+1300)/' AS raw,
         epoch_ms(epoch_ms(ts)) AS parsed_ts
         FROM events""",
    "q9_interval_chunks" ->
      """SELECT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS bucket_start,
         count(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS total_value
         FROM orders GROUP BY 1""",
    "q10_assoc_flatten" ->
      """SELECT s_suppkey, s_name, n_nationkey AS nation_n_nationkey,
         n_name AS nation_n_name, n_regionkey AS nation_n_regionkey
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
    "q11_analytics_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date_key,
         event_type AS breakdown, count(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum,
         strftime(ts, '%Y-%m-%d') || '-' || event_type AS id
         FROM events GROUP BY 1, 2""",
    "q12_bookmark_advance" ->
      s"""SELECT max(ts) AS new_bookmark, count(*) AS rows_seen
         FROM events WHERE ts > TIMESTAMP '$Bookmark'""",
    "q13_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), y AS (
           SELECT user_id, ts, sum(brk) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS sess
           FROM x
         )
         SELECT CAST(user_id AS VARCHAR) || '_' || CAST(sess AS VARCHAR)
             AS session_id,
           user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
         FROM y GROUP BY user_id, sess"""
  )
}
