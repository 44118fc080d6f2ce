package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num
import graft.operators.AsOf

/** Category-completing capability queries (SURVEY §2.3): the checklist
  * categories the reference's SQL surface lacks — multi-level aggregation
  * (ROLLUP), ordered top-k (sort + limit), and explicit set operations —
  * each proven over the fixtures with a DuckDB oracle.
  */
object CapabilityQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x16 — ROLLUP over the star join dimensions: region, region+nation,
    // grand total, disambiguated by grouping() indicators. One shuffle for
    // the base agg; Spark expands the rollup with partial aggregation.
    "x16_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          Num.dsum(col("c_acctbal")).as("total_balance"),
          grouping(col("r_name")).cast("int").as("g_region"),
          grouping(col("n_name")).cast("int").as("g_nation"))
    }),

    // x17 — ordered top-k: highest-revenue customers, global sort + limit
    // (Spark plans TakeOrderedAndProject: per-partition top-k, then a
    // single k-row merge on the driver — no full global sort).
    "x17_top_customers" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.groupBy(col("o_custkey"))
        .agg(Num.dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(c, col("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    }),

    // x18 — set operations: customers with orders in BOTH halves of the
    // fixture date range (INTERSECT) and first-half-only (EXCEPT), tagged
    // and unioned. INTERSECT/EXCEPT hash-dedup on the full row.
    "x18_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val firstHalf = o.filter(col("o_orderdate") <
          lit("1998-01-01").cast("timestamp_ntz"))
        .select(col("o_custkey").as("custkey"))
      val secondHalf = o.filter(col("o_orderdate") >=
          lit("1998-01-01").cast("timestamp_ntz"))
        .select(col("o_custkey").as("custkey"))
      firstHalf.intersect(secondHalf)
        .withColumn("segment", lit("both_halves"))
        .unionByName(
          firstHalf.except(secondHalf)
            .withColumn("segment", lit("first_half_only")))
    }),

    // x23 — CUBE over order status × priority: all 4 grouping combinations
    // in one pass with grouping indicators.
    "x23_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Num.dsum(col("o_totalprice")).as("total_value"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"))),

    // x24 — exact percentile aggregates (sort-based `percentile`): media
    // summary per event_type. Exact percentiles buffer every group value
    // in one task, so the query is SIZE-GATED on group cardinality: a
    // group past 10M rows fails fast (one cheap count job) pointing at
    // the 100 TB path, Sketches.approxPercentilesByGroup (one-pass
    // sketch). All three probs go through ONE percentile buffer (array
    // form) — one per-group sort, not three.
    "x24_percentiles" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.functions.Guards.requireSmallGroups(ev, "event_type", 10000000L,
        "x24_percentiles (exact sort-based percentile)",
        "Sketches.approxPercentilesByGroup")
      ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, array(0.5D, 0.9D, 0.99D))").as("_ps"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .select(col("event_type"),
          Num.fpRound(element_at(col("_ps"), 1), 6).as("p50"),
          Num.fpRound(element_at(col("_ps"), 2), 6).as("p90"),
          Num.fpRound(element_at(col("_ps"), 3), 6).as("p99"),
          col("v_min"), col("v_max"))
    }),

    // x19 — semi/anti joins: customers with vs without orders. left_semi
    // and left_anti move only the probe side's keys; no fact columns.
    "x19_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .withColumn("segment", lit("has_orders"))
        .unionByName(
          c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
            .select(col("c_custkey"), col("c_name"))
            .withColumn("segment", lit("no_orders")))
    }),

    // x21 — time-series resample + gap fill: hourly grid per event_type
    // over the fixture range, missing hours zero-filled. The grid is a
    // sequence fan-out (no driver loop); the join is grid ⋈ pre-aggregated
    // hourly counts, so the fact table shuffles once at hour granularity.
    "x21_resample_gapfill" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val hourly = e.groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"),
          Num.dsum(col("value")).as("value_sum"))
      val bounds = e.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val grid = bounds
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
        .crossJoin(broadcast(e.select(col("event_type")).distinct()))
      grid.join(hourly, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("value_sum"), lit(0.0)).as("value_sum"))
    }),

    // x20 — as-of join via the interleaved-window formulation: each
    // 'click' matched to the user's latest preceding-or-equal 'view'.
    // One shuffle + one sort — no time-range join blowup (see AsOf).
    "x20_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
      val views = e.filter(col("event_type") === "view")
      AsOf.join(clicks, views, keyCol = "user_id", tsCol = "ts",
          valueCol = "event_id", tieBreak = "event_id")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("asof_event_id"), col("asof_ts"))
    }),

    // x27 — PIVOT: daily value totals spread into one column per event
    // type, as conditional aggregates. Semantically identical to
    // `.pivot("event_type", values)` but plans ONE partial+final hash
    // aggregate with ONE exchange — Dataset.pivot lowers to a two-level
    // aggregate (inner group-by + pivotfirst) with a second shuffle the
    // static value list makes unnecessary.
    "x27_pivot_daily" -> ((s, dir) => {
      def sumFor(v: String) =
        Num.dsum(when(col("event_type") === v, col("value")))
          .as(s"${v}_sum")
      t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date_key"))
        .agg(sumFor("click"), sumFor("error"), sumFor("purchase"),
          sumFor("signup"), sumFor("view"))
    }),

    // x28 — UNPIVOT/melt: wide per-line measures to long (measure, amount)
    // rows — a narrow per-row generator, no shuffle.
    "x28_unpivot_measures" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "amount")),

    // x29 — range (band) join: each event matched to its value band via
    // an inequality-only join. The band dim is tiny and broadcast, so the
    // fact side never shuffles (BroadcastNestedLoopJoin) — the correct
    // plan at any scale for a small interval dimension.
    "x29_range_join" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val bands = Seq(
        ("low", 0.0, 50.0), ("mid", 50.0, 150.0),
        ("high", 150.0, 300.0), ("extreme", 300.0, 1.0e9))
        .toDF("band", "lo", "hi")
      t(s, dir, "events")
        .join(broadcast(bands),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_events"),
          Num.dsum(col("value")).as("value_sum"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
    }),

    // x30 — grouped top-k: each customer's 3 highest-value orders via a
    // ranking window; Spark's WindowGroupLimit pushes the per-group limit
    // below the shuffle (partial top-k per map partition).
    "x30_grouped_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rank").cast("long").as("rank"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x16_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
           AS total_balance,
         CAST(GROUPING(r_name) AS INTEGER) AS g_region,
         CAST(GROUPING(n_name) AS INTEGER) AS g_nation
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)""",
    "x17_top_customers" ->
      """SELECT c_custkey, c_name, revenue, n_orders FROM (
           SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS revenue,
             count(*) AS n_orders
           FROM orders GROUP BY o_custkey
         ) r JOIN customer ON o_custkey = c_custkey
         ORDER BY revenue DESC, c_custkey LIMIT 10""",
    "x18_set_ops" ->
      """WITH f AS (SELECT o_custkey AS custkey FROM orders
           WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
         s AS (SELECT o_custkey AS custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
         SELECT custkey, 'both_halves' AS segment
           FROM (SELECT custkey FROM f INTERSECT SELECT custkey FROM s)
         UNION ALL
         SELECT custkey, 'first_half_only' AS segment
           FROM (SELECT custkey FROM f EXCEPT SELECT custkey FROM s)""",
    "x23_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS total_value,
         CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
         CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "x24_percentiles" ->
      """SELECT event_type,
         floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000.0 AS p50,
         floor(quantile_cont(value, 0.9) * 1000000 + 0.5) / 1000000.0 AS p90,
         floor(quantile_cont(value, 0.99) * 1000000 + 0.5) / 1000000.0 AS p99,
         min(value) AS v_min, max(value) AS v_max
         FROM events GROUP BY 1""",
    "x19_semi_anti" ->
      """SELECT c_custkey, c_name, 'has_orders' AS segment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT c_custkey, c_name, 'no_orders' AS segment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "x20_asof_join" ->
      """WITH u AS (
           SELECT user_id, ts, event_id, 1 AS side,
             CAST(NULL AS BIGINT) AS rv, CAST(NULL AS TIMESTAMP) AS rts
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts, event_id, 0 AS side, event_id AS rv, ts AS rts
           FROM events WHERE event_type = 'view'
         )
         SELECT user_id, ts, event_id,
           last_value(rv IGNORE NULLS) OVER w AS asof_event_id,
           last_value(rts IGNORE NULLS) OVER w AS asof_ts
         FROM u
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         QUALIFY side = 1""",
    "x21_resample_gapfill" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS hour,
             count(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum
           FROM events GROUP BY 1, 2
         ), bounds AS (
           SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi FROM events
         ), grid AS (
           SELECT t.event_type, CAST(g.hour AS TIMESTAMP) AS hour
           FROM bounds, unnest(generate_series(
             CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
             INTERVAL 1 HOUR)) AS g(hour)
           CROSS JOIN (SELECT DISTINCT event_type FROM events) t
         )
         SELECT grid.event_type, grid.hour,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(value_sum, 0.0) AS value_sum
         FROM grid LEFT JOIN hourly
           ON grid.event_type = hourly.event_type
           AND grid.hour = hourly.hour""",
    "x27_pivot_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date_key,
         CAST(SUM(CAST(value AS DECIMAL(38,6)))
           FILTER (WHERE event_type = 'click') AS DOUBLE) AS click_sum,
         CAST(SUM(CAST(value AS DECIMAL(38,6)))
           FILTER (WHERE event_type = 'error') AS DOUBLE) AS error_sum,
         CAST(SUM(CAST(value AS DECIMAL(38,6)))
           FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_sum,
         CAST(SUM(CAST(value AS DECIMAL(38,6)))
           FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup_sum,
         CAST(SUM(CAST(value AS DECIMAL(38,6)))
           FILTER (WHERE event_type = 'view') AS DOUBLE) AS view_sum
         FROM events GROUP BY 1""",
    "x28_unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber,
           'l_quantity' AS measure, l_quantity AS amount FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber,
           'l_extendedprice' AS measure, l_extendedprice AS amount
           FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber,
           'l_discount' AS measure, l_discount AS amount FROM lineitem""",
    "x29_range_join" ->
      """SELECT band, count(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum,
         min(value) AS v_min, max(value) AS v_max
         FROM events
         JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
           ('high', 150.0, 300.0), ('extreme', 300.0, 1000000000.0))
           b(band, lo, hi)
           ON value >= lo AND value < hi
         GROUP BY band""",
    "x30_grouped_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER w AS rank
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey)
         QUALIFY row_number() OVER w <= 3"""
  )
}
