package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Dates, Num}

/** Product-analytics aggregates over event streams — the reports the
  * reference's warehouse users build downstream of the landed tables
  * (cohort retention, conversion funnels), expressed in the shapes
  * that survive 100 TB: key-partitioned aggregates and re-used
  * exchanges, never per-user collects.
  */
object Analytics {

  /** Epoch week index as EXACT integer arithmetic: (ms div 86400000)
    * div 7 — each step subtracts the remainder first, so the double
    * division is of an exactly-divisible pair (exact below 2^53); no
    * date_trunc, whose week-start/timezone conventions differ across
    * engines. */
  private def weekIdx(ms: Column): Column = {
    val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
      .cast("long")
    ((day - pmod(day, lit(7L))) / lit(7L)).cast("long")
  }

  /** COHORT RETENTION (x152) — the classic retention triangle: users
    * grouped by first-activity week (their cohort), counted in each
    * later week they return — `(cohort_week, week_offset, n_users)`;
    * offset 0 is the cohort's own size, and
    * `n_users(c, k) / n_users(c, 0)` is week-k retention. Weeks are
    * exact integer epoch-week indexes (see [[weekIdx]]) so the bucket
    * boundaries are engine-independent.
    *
    * Scale shape: ONE exchange on the user key — each user's cohort
    * week and distinct activity weeks come out of a single aggregate
    * (`min` + `collect_set`; the set is CALENDAR-bounded — weeks of
    * history, not events — so it is a few hundred longs at any corpus
    * size), the offsets explode from it, and the triangle aggregate's
    * (#weeks)²-bounded output needs only `count` (each user
    * contributes at most one row per offset by set construction). No
    * join, no second user exchange, no countDistinct. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    events.select(col(userCol).as("_u"),
        weekIdx(Dates.toEpochMillis(col(tsCol))).as("_w"))
      .groupBy(col("_u"))
      .agg(min(col("_w")).as("_cw"), collect_set(col("_w")).as("_ws"))
      .select(col("_cw"), explode(col("_ws")).as("_w"))
      .groupBy(col("_cw").as("cohort_week"),
        (col("_w") - col("_cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** ORDERED CONVERSION FUNNEL (x153) — how many users complete each
    * stage IN ORDER: the first stage-1 event, then the first stage-2
    * event AT-OR-AFTER it, then the first stage-3 event at-or-after
    * that, … A user whose purchases all precede their first click does
    * not count as converted — event order is the funnel's whole point
    * (an unordered `count distinct per type` overstates conversion).
    * Output `(stage, stage_idx, n_users)`, one row per stage;
    * `n_users` is non-increasing by construction.
    *
    * Scale shape: the sequential at-or-after dependency is a chain of
    * per-user conditional MIN aggregates through user-co-partitioned
    * joins — every exchange is on the same user key, no windows, no
    * per-user event lists. Each stage's user set is PERSISTED (lazily;
    * caller-owned cache, the pqFit convention) so the k 1-row stage
    * counts materialize the chain once, not k times, and the plan
    * stays fully lazy — nothing executes at construction. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages")
    val base = events.select(col(userCol).as("_u"),
      col(typeCol).as("_t"), Dates.toEpochMillis(col(tsCol)).as("_ms"))
    def stageCount(st: String, idx: Int, reached: DataFrame) =
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(st).as("stage"),
          lit(idx.toLong).as("stage_idx"), col("n_users"))
    var reached = base.filter(col("_t") === stages.head)
      .groupBy(col("_u")).agg(min(col("_ms")).as("_at"))
      .persist()
    var legs = Vector(stageCount(stages.head, 1, reached))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = base.filter(col("_t") === st)
        .join(reached, Seq("_u"))
        .filter(col("_ms") >= col("_at"))
        .groupBy(col("_u")).agg(min(col("_ms")).as("_at"))
        .persist()
      legs :+= stageCount(st, i + 1, reached)
    }
    legs.reduce(_.unionByName(_))
  }

  /** RFM SEGMENTATION (x154) — the classic customer-value grid: per
    * purchasing user, Recency (ms since their last purchase, measured
    * from the stream's own latest purchase — self-contained and
    * deterministic, no wall clock), Frequency (purchase count) and
    * Monetary (exact-decimal value sum), each scored into `nTiles`
    * equal-frequency tiles (nTiles=5 → the standard 1–5 scores, 5
    * best) and concatenated into the `segment` code ("555" = champion,
    * "111" = lost). Tile boundaries are
    * [[TextAnalysis.groupedNtileBuckets]]'s exact integer law — which
    * IS SQL NTILE's remainder-first law, so the oracle mirrors with
    * plain `ntile()`; ties break by user id on every axis.
    *
    * Scale shape: one user-keyed purchase aggregate; each score axis
    * is the grouped bucketed rank (score-range buckets + broadcast
    * offsets — NO global sort anywhere, where the textbook
    * `ntile() OVER (ORDER BY …)` is a single-partition window over
    * every user); the three label frames join back user-keyed. */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, valueCol: String,
                  purchaseType: String, nTiles: Int = 5): DataFrame = {
    require(nTiles >= 2 && nTiles <= 9,
      s"nTiles must be in [2, 9] (single-digit scores), got $nTiles")
    val p = events.filter(col(typeCol) === purchaseType)
      .select(col(userCol).as("user_id"),
        Dates.toEpochMillis(col(tsCol)).as("_ms"),
        Num.fpRound(col(valueCol), 4).as("_v"))
    val asOf = p.agg(max(col("_ms")).as("_asof"))
    val base = p.groupBy(col("user_id"))
      .agg(max(col("_ms")).as("_last"), count(lit(1)).as("frequency"),
        Num.dsum(col("_v")).as("monetary"))
      .crossJoin(broadcast(asOf))
      .withColumn("recency_ms", col("_asof") - col("_last"))
      .withColumn("_g", lit(0))
      .select(col("user_id"), col("_g"), col("recency_ms"),
        col("frequency"), col("monetary"))
    val labels = (1 to nTiles).reverse.map(_.toString) // "5".."1"
    def scored(metric: String, bestFirst: Boolean, out: String) =
      TextAnalysis.groupedNtileBuckets(
          base.select(col("user_id"), col("_g"), col(metric)),
          "user_id", "_g", metric, labels, bestFirst = bestFirst)
        .select(col("user_id"), col("bucket").as(out))
    base
      .join(scored("recency_ms", bestFirst = false, "_r"), Seq("user_id"))
      .join(scored("frequency", bestFirst = true, "_f"), Seq("user_id"))
      .join(scored("monetary", bestFirst = true, "_m"), Seq("user_id"))
      .select(col("user_id"), col("recency_ms"), col("frequency"),
        col("monetary"),
        col("_r").cast("int").as("r_score"),
        col("_f").cast("int").as("f_score"),
        col("_m").cast("int").as("m_score"),
        concat(col("_r"), col("_f"), col("_m")).as("segment"))
  }

  /** ROLLING 7-DAY REVENUE (x161) — per supplier nation, daily
    * lineitem revenue (`extendedprice·(1−discount)`, per-row product
    * rounded to the 1e-4 grid, then exact decimal sums) plus the
    * trailing 7-day rolling sum — the standard smoothed-trend report.
    * The window frame is RANGE over the integer epoch-day key, so gaps
    * in the calendar shorten the window (a 7-ROW frame would silently
    * stretch over missing days — the classic rolling-metric bug).
    *
    * Scale shape: the corpus-sized work is ONE aggregate to
    * `(nation, day)` — calendar × dictionary bounded output at any
    * corpus size — with map-side partial sums; the rolling window then
    * runs per-nation over that bounded frame, summing DECIMAL(38,6)
    * (order-independent, engine-exact). The supplier→nation key rides
    * a broadcast dim join. */
  def rollingRevenue(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, windowDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ms = Dates.toEpochMillis(col("l_shipdate"))
    val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
      .cast("long")
    val daily = lineitem
      .join(broadcast(supplier.select(col("s_suppkey"),
        col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name"))), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), day.as("day"),
        Num.fpRound(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
          4).as("_v"))
      .groupBy(col("nation"), col("day"))
      .agg(sum(col("_v").cast("decimal(38,6)")).as("_dec"),
        count(lit(1)).as("n_items"))
    val w = Window.partitionBy(col("nation")).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .withColumn("revenue", col("_dec").cast("double"))
      .withColumn("rolling_rev", sum(col("_dec")).over(w).cast("double"))
      .withColumn("days_in_window", count(lit(1)).over(w))
      .select(col("nation"), col("day"), col("n_items"), col("revenue"),
        col("rolling_rev"), col("days_in_window"))
  }

  /** YEAR-OVER-YEAR GROWTH (x162) — per customer nation and order
    * year: exact-decimal revenue, the previous year's revenue (LAG
    * over the year sequence) and the growth ratio on the 1e-6 grid.
    * `prev_rev`/`yoy` are NULL on each nation's first year — there is
    * nothing to compare against, and a 0-fill would read as "flat".
    * LAG is positional here because the yearly aggregate emits at most
    * one row per (nation, year); a nation with no orders in some year
    * compares against its last ACTIVE year (documented, matches the
    * oracle's law).
    *
    * Scale shape: same as [[rollingRevenue]] — one bounded-output
    * aggregate does the corpus work; the LAG window runs per-nation
    * over a years-long frame. */
  def yoyGrowth(orders: DataFrame, customer: DataFrame,
                nation: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val yearly = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        Num.fpRound(col("o_totalprice"), 4).as("_v"))
      .groupBy(col("nation"), col("order_year"))
      .agg(Num.dsum(col("_v")).as("revenue"))
    val w = Window.partitionBy(col("nation")).orderBy(col("order_year"))
    yearly
      .withColumn("prev_rev", lag(col("revenue"), 1).over(w))
      .withColumn("yoy",
        when(col("prev_rev").isNotNull,
          Num.fpRound((col("revenue") - col("prev_rev")) / col("prev_rev"),
            6)))
      .select(col("nation"), col("order_year"), col("revenue"),
        col("prev_rev"), col("yoy"))
  }

  /** DAILY ANOMALY FLAGS (x163) — days whose event count deviates from
    * that event type's own mean by more than `sigmas` standard
    * deviations, decided in EXACT INTEGER arithmetic: with per-day
    * count x, day count d, Σx and Σx² per type,
    * `|x − μ| > s·σ  ⟺  d²(x − Σx/d)² > s²·d²·σ²
    *               ⟺  (d·x − Σx)² > s²·(d·Σx² − (Σx)²)`
    * — no division, no sqrt, no float law anywhere; the squares ride
    * DECIMAL(38,0) so corpus-scale counts cannot overflow a BIGINT.
    * The alerting report every ops dashboard runs on landed event
    * tables.
    *
    * Scale shape: one corpus aggregate to `(type, day)` (bounded
    * output), a dictionary-sized per-type stats frame joined back
    * BROADCAST, and a row-local integer comparison. */
  /** x163's per-type daily counts: `(event_type, day, n_events)`. */
  def dailyCounts(events: DataFrame, tsCol: String,
                  typeCol: String): DataFrame = {
    val ms = Dates.toEpochMillis(col(tsCol))
    val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
      .cast("long")
    events.select(col(typeCol).as("event_type"), day.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** x163's per-type count moments over [[dailyCounts]] —
    * `(event_type, n_days, sum_n, _sum_n2)`, the frozen batch artifact
    * [[graft.streaming.Streams.anomalyGate]] serves against. */
  def anomalyStats(daily: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("n_events")).as("sum_n"),
        sum(dec(col("n_events")) * dec(col("n_events"))).as("_sum_n2"))
  }

  /** The shared exact-integer anomaly predicate over a row carrying
    * `n_events` + [[anomalyStats]] columns — the ONE body both the
    * batch report and the streaming gate filter with (parity by
    * construction). */
  def anomalyBound(sigmas: Int): Column = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val dev = dec(col("n_days")) * dec(col("n_events")) - dec(col("sum_n"))
    dev * dev > lit(sigmas.toLong * sigmas) *
      (dec(col("n_days")) * col("_sum_n2") -
        dec(col("sum_n")) * dec(col("sum_n")))
  }

  def anomalyDays(events: DataFrame, tsCol: String, typeCol: String,
                  sigmas: Int = 2): DataFrame = {
    val daily = dailyCounts(events, tsCol, typeCol)
    daily.join(broadcast(anomalyStats(daily)), Seq("event_type"))
      .filter(anomalyBound(sigmas))
      .select(col("event_type"), col("day"), col("n_events"),
        col("n_days"), col("sum_n").cast("long").as("total_events"))
  }

  /** MARKET-BASKET BRAND AFFINITY (x164) — association rules over
    * order baskets: for each unordered brand pair co-occurring in an
    * order, `support = P(a,b)`, `confidence = P(b|a)` and
    * `lift = P(a,b)/(P(a)·P(b))`, on exact integer counts with one
    * final grid-rounded division. Pairs below `minCount` co-orders are
    * cut — the hapax-pair guard (x150's PMI law): one shared order
    * makes any rare pair look like a rule.
    *
    * Scale shape: the pair generation is a self-join of the DISTINCT
    * `(order, brand)` frame on the order key — co-partitioned, and
    * per-order fanout is bounded by the brand DICTIONARY (≤ B(B−1)/2
    * pairs per order however many lines it has), so the blow-up of a
    * general basket self-join (items² per order) cannot happen on a
    * dictionary axis. Per-brand and total counts are
    * dictionary/1-row-sized and broadcast. */
  def basketAffinity(lineitem: DataFrame, part: DataFrame,
                     minCount: Long = 5): DataFrame = {
    val ob = Graph.orderBrands(lineitem, part)
    basketAffinityFrom(ob, Graph.brandTotals(ob), corpusOrders(lineitem),
      minCount)
  }

  /** The support denominator the corpus-path basket operators need —
    * distinct orders in lineitem, as a 1-row `n_orders` frame (the
    * index path reads the same column off the persisted stats
    * sidecar instead). */
  private def corpusOrders(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))

  /** [[basketAffinity]] over the persisted edge-index frames
    * ([[Graph.readEdgeIndex]]): undirected pairs are the directed edge
    * list cut to `src < dst` (same counts by the both-directions
    * symmetry), denominators come from the totals/stats sidecars —
    * zero corpus scans at serve time. */
  def basketAffinityIndexed(edges: DataFrame, totals: DataFrame,
                            stats: DataFrame,
                            minCount: Long = 5): DataFrame =
    affinityTail(
      edges.filter(col("src") < col("dst"))
        .select(col("src").as("brand_a"), col("dst").as("brand_b"),
          col("w").as("n_co"))
        .filter(col("n_co") >= minCount),
      totals, stats)

  private def basketAffinityFrom(ob: DataFrame, totals: DataFrame,
                                 stats: DataFrame,
                                 minCount: Long): DataFrame = {
    val left = ob.select(col("order_key"), col("brand").as("brand_a"))
    val right = ob.select(col("order_key"), col("brand").as("brand_b"))
    val pairs = left.join(right, Seq("order_key"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCount)
    affinityTail(pairs, totals, stats)
  }

  /** The shared scoring tail under [[basketAffinity]] and its indexed
    * twin: broadcast the per-brand totals and the 1-row order count
    * onto the pair frame, emit support/confidence/lift on the grid. */
  private def affinityTail(pairs: DataFrame, totals: DataFrame,
                           stats: DataFrame): DataFrame =
    pairs
      .join(broadcast(totals.select(col("brand").as("brand_a"),
        col("n_orders").as("_ca"))), Seq("brand_a"))
      .join(broadcast(totals.select(col("brand").as("brand_b"),
        col("n_orders").as("_cb"))), Seq("brand_b"))
      .crossJoin(broadcast(stats.select(col("n_orders").as("_n"))))
      .select(col("brand_a"), col("brand_b"), col("n_co"),
        col("_ca").as("n_a"), col("_cb").as("n_b"),
        Num.fpRound(col("n_co").cast("double") / col("_n"), 6)
          .as("support"),
        Num.fpRound(col("n_co").cast("double") / col("_ca"), 6)
          .as("confidence"),
        Num.fpRound(col("n_co").cast("double") * col("_n") /
          (col("_ca").cast("double") * col("_cb")), 6).as("lift"))

  /** ACTIVE-USER CURVES (x200) — per calendar day with activity:
    * DAU, trailing-7-day WAU, trailing-30-day MAU and the
    * DAU/MAU stickiness ratio (1e-6 grid) — the other half of the
    * x183 growth chart (x183 counts arrivals; this counts who is
    * STILL here). Window membership is exact: a user counts toward
    * day d's WAU iff they were active on some day in [d−6, d] —
    * no approximation, no sliding sketch.
    *
    * Scale shape: the corpus collapses ONCE to the distinct
    * (user, day) frame (map-side combined; bounded by users ×
    * active days, not events). Each active day then explodes to
    * the ≤7/≤30 report days it supports — a CONSTANT fanout of the
    * bounded frame, re-collapsed by a distinct + count per report
    * day (a second (user, day)-keyed exchange, never an event
    * exchange). Report days are exact integer epoch days; days with
    * no activity have no row (densify with [[gapFillDaily]] when a
    * chart needs the spine). */
  def activeUsers(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val ms = Dates.toEpochMillis(col(tsCol))
    val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
      .cast("long")
    val ud = events.select(col(userCol).as("_u"), day.as("_d"))
      .distinct()
    val dau = ud.groupBy(col("_d").as("day"))
      .agg(count(lit(1)).as("dau"))
    def trailing(windowDays: Int, out: String) = ud
      .select(col("_u"),
        explode(sequence(col("_d"),
          col("_d") + lit(windowDays.toLong - 1))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as(out))
    dau
      .join(trailing(7, "wau"), Seq("day"))
      .join(trailing(30, "mau"), Seq("day"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        Num.fpRound(col("dau").cast("double") /
          col("mau").cast("double"), 6).as("stickiness"))
  }

  /** FREQUENT BRAND TRIPLES (x196) — Apriori level 3 (Agrawal &
    * Srikant 1994) over order baskets: the top-K brand triples by
    * co-order count (ties by brand), with exact counts and the
    * 1e-6-grid support. The candidate (b1, b2) base pairs are PRUNED
    * against the frequent-pair set BEFORE extending to triples — the
    * anti-monotone law (a triple is frequent only if every sub-pair
    * is) makes the prune LOSSLESS, so the oracle is the direct
    * unpruned 3-way join (spec pins pruned == unpruned too).
    *
    * Scale shape: all joins ride the order key of the DISTINCT
    * (order, brand) frame — per-order fanout is dictionary-bounded
    * (≤ B³ however many lines, x164's law), and on a real item
    * catalog the L2 prune is what keeps the candidate space from
    * being catalog³. The top-K is orderBy+limit = TakeOrdered
    * (x150's convention — never a global sort); the 1-row basket
    * total broadcasts. */
  def frequentTriples(lineitem: DataFrame, part: DataFrame,
                      minCount: Long = 3, topK: Int = 50): DataFrame =
    frequentTriplesFrom(Graph.orderBrands(lineitem, part),
      corpusOrders(lineitem), minCount, topK)

  /** [[frequentTriples]] over the persisted edge-index frames
    * ([[Graph.readEdgeIndex]]): the 3-way mining re-joins the PERSISTED
    * `(order_key, brand)` basket frame — bucketed by order key, so the
    * self-joins are co-located — and the support base comes from the
    * stats sidecar; zero corpus scans at serve time. */
  def frequentTriplesIndexed(ob: DataFrame, stats: DataFrame,
                             minCount: Long = 3,
                             topK: Int = 50): DataFrame =
    frequentTriplesFrom(ob, stats, minCount, topK)

  private def frequentTriplesFrom(ob: DataFrame, stats: DataFrame,
                                  minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val nOrders = stats.select(col("n_orders").as("_n"))
    val a = ob.select(col("order_key").as("_o"), col("brand").as("brand_a"))
    val b = ob.select(col("order_key").as("_o"), col("brand").as("brand_b"))
    val c = ob.select(col("order_key").as("_o"), col("brand").as("brand_c"))
    val freqPairs = a.join(b, Seq("_o"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("_pc"))
      .filter(col("_pc") >= minCount)
      .select(col("brand_a"), col("brand_b"))
    a.join(b, Seq("_o"))
      .filter(col("brand_a") < col("brand_b"))
      .join(broadcast(freqPairs), Seq("brand_a", "brand_b"), "left_semi")
      .join(c, Seq("_o"))
      .filter(col("brand_b") < col("brand_c"))
      .groupBy(col("brand_a"), col("brand_b"), col("brand_c"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minCount)
      .orderBy(col("n_orders").desc, col("brand_a"), col("brand_b"),
        col("brand_c"))
      .limit(topK)
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("brand_c"),
        col("n_orders"),
        Num.fpRound(col("n_orders").cast("double") /
          col("_n").cast("double"), 6).as("support"))
  }

  /** BRAND RECOMMENDATIONS (x202) — the serving table behind
    * "customers who buy X also buy Y": per brand, the top-k
    * co-purchased brands by lift (ties by confidence, then brand —
    * fully deterministic), with the co-order count, confidence and
    * lift riding along. x164 audits the rule list; this turns it
    * into the per-item lookup a recommender actually serves.
    * Ordering uses the GRID-ROUNDED lift/confidence (the hash-stable
    * values), so engines rank identical doubles.
    *
    * Scale shape: x164's machinery with BOTH directions kept
    * (confidence is direction-specific), then one grouped top-k via
    * the salted two-phase window — no brand ever sorts more than its
    * shard, no global sort. All frames after the basket collapse are
    * dictionary-bounded. */
  def brandRecommendations(lineitem: DataFrame, part: DataFrame,
                           minCount: Long = 5, k: Int = 3): DataFrame = {
    val ob = Graph.orderBrands(lineitem, part)
    brandRecommendationsFrom(Graph.coPurchaseEdgesFrom(ob),
      Graph.brandTotals(ob), corpusOrders(lineitem), minCount, k)
  }

  /** [[brandRecommendations]] over the persisted edge-index frames
    * ([[Graph.readEdgeIndex]]): the directed pair counts ARE the edge
    * list (both directions kept — confidence is direction-specific),
    * denominators come from the totals/stats sidecars; zero corpus
    * scans at serve time. */
  def brandRecommendationsIndexed(edges: DataFrame, totals: DataFrame,
                                  stats: DataFrame, minCount: Long = 5,
                                  k: Int = 3): DataFrame =
    brandRecommendationsFrom(edges, totals, stats, minCount, k)

  private def brandRecommendationsFrom(edges: DataFrame,
                                       totals: DataFrame,
                                       stats: DataFrame, minCount: Long,
                                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = edges
      .select(col("src").as("brand"), col("dst").as("rec_brand"),
        col("w").as("n_co"))
      .filter(col("n_co") >= minCount)
    val scored = pairs
      .join(broadcast(totals.select(col("brand"),
        col("n_orders").as("_ca"))), Seq("brand"))
      .join(broadcast(totals.select(col("brand").as("rec_brand"),
        col("n_orders").as("_cb"))), Seq("rec_brand"))
      .crossJoin(broadcast(stats.select(col("n_orders").as("_n"))))
      .select(col("brand"), col("rec_brand"), col("n_co"),
        Num.fpRound(col("n_co").cast("double") / col("_ca"), 6)
          .as("confidence"),
        Num.fpRound(col("n_co").cast("double") * col("_n") /
          (col("_ca").cast("double") * col("_cb")), 6).as("lift"))
      .withColumn("_negconf", -col("confidence"))
    graft.functions.Skew.saltedTopK(scored, Seq("brand"), "lift", k,
        tieCols = Seq("_negconf", "rec_brand"))
      .select(col("brand"), col("rec_brand"),
        col("rank").cast("long").as("rank"), col("n_co"),
        col("confidence"), col("lift"))
  }

  /** SESSIONIZE TO SESSION GRAIN (x198/x199's core) — q13's exact
    * session law (a new session after `gapMs` of inactivity, ties by
    * event id) collapsed to one row per session with the columns the
    * session reports need: `(session_id, user, start_ms, end_ms,
    * duration_ms, n_events, entry_type)`. The entry type is the
    * FIRST event's type — `min(struct(ms, id, type))`, deterministic
    * because (ms, id) is unique — the dimension product teams cut
    * session quality by ("sessions that start with a search run
    * longer").
    *
    * Scale shape: identical to q13 — one user exchange feeds the
    * break window, the running session sum and the session
    * aggregate. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String,
               gapMs: Long = 30L * 60 * 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapMs >= 1, s"gapMs must be >= 1, got $gapMs")
    val w = Window.partitionBy(col("_u")).orderBy(col("_ms"), col("_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col(userCol).as("_u"),
        Dates.toEpochMillis(col(tsCol)).as("_ms"), col(idCol).as("_id"),
        col(typeCol).as("_t"))
      .withColumn("_brk",
        when(lag(col("_ms"), 1).over(w).isNull ||
          col("_ms") - lag(col("_ms"), 1).over(w) > gapMs, 1)
          .otherwise(0))
      .withColumn("_sess", sum(col("_brk")).over(run))
      .groupBy(col("_u"), col("_sess"))
      .agg(min(struct(col("_ms").as("m"), col("_id").as("i"),
          col("_t").as("t"))).as("_f"),
        min(col("_ms")).as("start_ms"), max(col("_ms")).as("end_ms"),
        count(lit(1)).as("n_events"))
      .select(
        graft.functions.Keys.compositeKey(col("_u"), col("_sess"))
          .as("session_id"),
        col("_u").as("user_id"), col("start_ms"), col("end_ms"),
        (col("end_ms") - col("start_ms")).as("duration_ms"),
        col("n_events"), col("_f.t").as("entry_type"))
  }

  /** LINEAR REVENUE TREND (x167) — per nation, the OLS fit of daily
    * revenue against the epoch-day axis via the closed form
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, with
    * `r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))` —
    * every Σ an EXACT integer (x = epoch day, y = revenue in
    * `floor(v·10⁴+0.5)` units) riding DECIMAL(38,0), so both engines
    * divide the IDENTICAL integers and the only float ops are the two
    * mirrored final divisions (slope converts units→currency by one
    * more exact /10⁴). Nations with <2 active days, a degenerate
    * x-spread or zero y-variance report NULLs. The trend-detection
    * report; regr_slope() would be engine-float all the way down.
    *
    * Scale shape: one corpus aggregate to `(nation, day)` (bounded
    * output), then a dictionary-sized per-nation moment aggregate —
    * no window at all. */
  def revenueTrend(lineitem: DataFrame, supplier: DataFrame,
                   nation: DataFrame): DataFrame = {
    val ms = Dates.toEpochMillis(col("l_shipdate"))
    val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
      .cast("long")
    val units = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 1e4 + lit(0.5)).cast("long")
    val daily = lineitem
      .join(broadcast(supplier.select(col("s_suppkey"),
        col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("nation"), day.as("_x"), units.as("_u"))
      .groupBy(col("nation"), col("_x"))
      .agg(sum(col("_u")).as("_y"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = daily.groupBy(col("nation"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("_x"))).as("_sx"),
        sum(dec(col("_y"))).as("_sy"),
        sum(dec(col("_x")) * dec(col("_y"))).as("_sxy"),
        sum(dec(col("_x")) * dec(col("_x"))).as("_sxx"),
        sum(dec(col("_y")) * dec(col("_y"))).as("_syy"))
    val num = dec(col("n_days")) * col("_sxy") - col("_sx") * col("_sy")
    val denX = dec(col("n_days")) * col("_sxx") - col("_sx") * col("_sx")
    val denY = dec(col("n_days")) * col("_syy") - col("_sy") * col("_sy")
    m.withColumn("_num", num).withColumn("_dx", denX)
      .withColumn("_dy", denY)
      .select(col("nation"), col("n_days"),
        when(col("_dx") > 0, Num.fpRound(
          col("_num").cast("double") / col("_dx").cast("double") / 1e4,
          6)).as("slope"),
        when(col("_dx") > 0 && col("_dy") > 0, Num.fpRound(
          col("_num").cast("double") * col("_num").cast("double") /
            (col("_dx").cast("double") * col("_dy").cast("double")),
          6)).as("r2"))
  }

  /** A/B CONVERSION TEST (x168) — users split 50/50 by the md5 grid
    * (first hex of `md5(user_id)` ≤ '7' → A; the x26 deterministic-
    * assignment convention — no RNG, re-runnable, engine-neutral),
    * conversion = at least `minCount` events of `convertType` (an
    * absolute bar — on an engaged fixture a ≥1 bar saturates both arms
    * and the pooled variance degenerates); reports per-variant exact
    * counts, grid-rounded rates, and the two-proportion z² statistic
    * `(p_a − p_b)² / (p̂(1−p̂)(1/n_a + 1/n_b))` — computed by BOTH
    * engines from the same four exact integers through the same
    * mirrored IEEE expression (z² > 3.84 ⇒ p < .05); NULL when either
    * arm is empty or the pooled rate is degenerate (0 or 1). The
    * experiment readout every product team runs on landed events.
    *
    * Scale shape: one user-keyed aggregate (variant + converted flag
    * per user), one 2-row variant aggregate, one 1-row pivot — nothing
    * after the first exchange is bigger than 2 rows. */
  def abConversion(events: DataFrame, userCol: String, typeCol: String,
                   convertType: String, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val variant = when(substring(md5(col("_u").cast("string")), 1, 1)
      <= "7", "A").otherwise("B")
    val perUser = events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"))
      .groupBy(col("_u"))
      .agg(sum(when(col("_t") === convertType, 1L).otherwise(0L))
        .as("_k"))
      .select(variant.as("_v"),
        when(col("_k") >= minCount, 1L).otherwise(0L).as("_conv"))
    val byVar = perUser.groupBy(col("_v"))
      .agg(count(lit(1)).as("_n"), sum(col("_conv")).as("_c"))
    val one = byVar.agg(
      max(when(col("_v") === "A", col("_n"))).as("n_a"),
      max(when(col("_v") === "A", col("_c"))).as("conv_a"),
      max(when(col("_v") === "B", col("_n"))).as("n_b"),
      max(when(col("_v") === "B", col("_c"))).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pPool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val pooled = col("conv_a") + col("conv_b")
    val total = col("n_a") + col("n_b")
    one.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      Num.fpRound(pa, 6).as("rate_a"),
      Num.fpRound(pb, 6).as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0 &&
          pooled > 0 && pooled < total,
        Num.fpRound(
          (pa - pb) * (pa - pb) /
            (pPool * (lit(1.0) - pPool) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4))
        .as("z2"))
  }

  /** FUNNEL STAGE LATENCY (x169) — [[funnel]]'s companion report: for
    * each consecutive stage transition, exact p50/p90 of the per-user
    * time from reaching the earlier stage to first completing the
    * later one (the same at-or-after chain — a user's stage-k time is
    * their first stage-k event at-or-after their stage-(k−1) time).
    * Quantiles are [[TextAnalysis.groupedQuantiles]]' exact double-ceil
    * law over the transition groups; the cut user's id rides along.
    *
    * Scale shape: [[funnel]]'s user-keyed conditional-min chain, then
    * a per-transition grouped rank over user-count-bounded delta
    * frames — no per-transition sort. */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, stages: Seq[String],
                    quantiles: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    require(stages.size >= 2, s"need >= 2 stages, got $stages")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages")
    val base = events.select(col(userCol).as("_u"),
      col(typeCol).as("_t"), Dates.toEpochMillis(col(tsCol)).as("_ms"))
    var reached = base.filter(col("_t") === stages.head)
      .groupBy(col("_u")).agg(min(col("_ms")).as("_at"))
      .persist()
    var legs = Vector.empty[DataFrame]
    stages.drop(1).zip(stages).foreach { case (st, prev) =>
      val next = base.filter(col("_t") === st)
        .join(reached, Seq("_u"))
        .filter(col("_ms") >= col("_at"))
        .groupBy(col("_u"))
        .agg(min(col("_ms")).as("_nat"), min(col("_at")).as("_pat"))
        .persist()
      legs :+= next.select(col("_u"),
        lit(s"$prev->$st").as("transition"),
        (col("_nat") - col("_pat")).as("delta_ms"))
      reached = next.select(col("_u"), col("_nat").as("_at"))
    }
    TextAnalysis.groupedQuantiles(legs.reduce(_.unionByName(_)),
      "_u", "transition", "delta_ms", quantiles)
      .withColumnRenamed("_u", "user_id")
  }

  /** WEEKDAY SEASONALITY (x171) — per supplier nation and day-of-week:
    * item count, exact-decimal revenue, and each weekday's share of
    * the nation's total. Day-of-week is EXACT integer arithmetic on
    * the epoch day (`(day + 3) mod 7`, 0 = Monday — 1970-01-01 was a
    * Thursday = 3), not an engine date function whose week-start
    * convention varies. The staffing/load report behind every ops
    * calendar.
    *
    * Scale shape: one corpus aggregate to the (nation × 7)-bounded
    * frame; nation totals re-aggregate from it and broadcast back. */
  def weekdaySeasonality(lineitem: DataFrame, supplier: DataFrame,
                         nation: DataFrame): DataFrame = {
    val ms = Dates.toEpochMillis(col("l_shipdate"))
    val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
      .cast("long")
    val units = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 1e4 + lit(0.5)).cast("long")
    val byDow = lineitem
      .join(broadcast(supplier.select(col("s_suppkey"),
        col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("nation"), pmod(day + 3, lit(7L)).as("day_of_week"),
        units.as("_u"))
      .groupBy(col("nation"), col("day_of_week"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("_u").cast("decimal(38,0)")).as("_du"))
    val totals = byDow.groupBy(col("nation"))
      .agg(sum(col("_du")).as("_tu"))
    byDow.join(broadcast(totals), Seq("nation"))
      .select(col("nation"), col("day_of_week"), col("n_items"),
        (col("_du").cast("double") / 1e4).as("revenue"),
        Num.fpRound(col("_du").cast("double") / col("_tu"), 6)
          .as("share"))
  }

  /** LORENZ CURVE (x172) — x165's Gini number, unrolled into the curve
    * it integrates: each nation's customers cut into revenue deciles
    * (the ceil-boundary law `(10·(rank−1)) div n + 1`, ties by
    * customer key — NOT SQL ntile, see
    * [[TextAnalysis.groupedNtileBuckets]]), with each
    * decile's customer count, exact revenue, and the CUMULATIVE share
    * of the nation's revenue up to that decile. A 45° line is perfect
    * equality; the sag is the concentration x165 summarizes.
    *
    * Scale shape: the x165 aggregate + grouped-rank machinery, then a
    * decile aggregate and a window over 10-row-per-nation frames. */
  def lorenzCurve(orders: DataFrame, customer: DataFrame,
                  nation: DataFrame, nDeciles: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nDeciles >= 2 && nDeciles <= 100,
      s"nDeciles must be in [2, 100], got $nDeciles")
    val units = floor(col("o_totalprice") * 1e4 + lit(0.5)).cast("long")
    val perCust = orders.select(col("o_custkey"), units.as("_u"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("_u")).as("_rev"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("o_custkey").as("_id"), col("nation"), col("_rev"))
    val labels = (1 to nDeciles).map(_.toString)
    val bucketed = TextAnalysis.groupedNtileBuckets(perCust, "_id",
      "nation", "_rev", labels, bestFirst = false)
    val byDecile = bucketed
      .select(col("nation"), col("bucket").cast("int").as("decile"),
        col("_rev"))
      .groupBy(col("nation"), col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("_rev").cast("decimal(38,0)")).as("_du"))
    val w = Window.partitionBy(col("nation")).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = byDecile.groupBy(col("nation"))
      .agg(sum(col("_du")).as("_tu"))
    byDecile
      .withColumn("_cum", sum(col("_du")).over(w))
      .join(broadcast(totals), Seq("nation"))
      .select(col("nation"), col("decile"), col("n_customers"),
        (col("_du").cast("double") / 1e4).as("revenue"),
        Num.fpRound(col("_cum").cast("double") / col("_tu"), 6)
          .as("cum_share"))
  }

  /** IQR OUTLIERS (x173) — Tukey's fences per group: values outside
    * `[Q1 − k·IQR, Q3 + k·IQR]` (k = 1.5, the boxplot law) where the
    * quartiles are each group's EXACT rank-`ceil(q·n)` values
    * ([[TextAnalysis.groupedQuantiles]]' double-ceil law) on the
    * 1e-4-rounded measure. The fences are one mirrored double
    * expression from two exact grid values — engine-identical. The
    * data-quality screen for any landed numeric column.
    *
    * Scale shape: grouped-rank quantiles (no per-group sort), a
    * group-count-sized fence table broadcast back, and a row-local
    * filter. */
  def iqrOutliers(df: DataFrame, idCol: String, groupCol: String,
                  valueCol: String, k: Double = 1.5): DataFrame = {
    val scored = df.select(col(idCol).as("_id"),
      col(groupCol).as("_g"), Num.fpRound(col(valueCol), 4).as("_v"))
    val quarts = TextAnalysis.groupedQuantiles(scored, "_id", "_g",
        "_v", Seq(0.25, 0.75))
      .groupBy(col("_g"))
      .agg(max(when(col("quantile") === 0.25, col("_v"))).as("_q1"),
        max(when(col("quantile") === 0.75, col("_v"))).as("_q3"))
      .select(col("_g"), col("_q1"), col("_q3"),
        (col("_q1") - lit(k) * (col("_q3") - col("_q1"))).as("_lo"),
        (col("_q3") + lit(k) * (col("_q3") - col("_q1"))).as("_hi"))
    scored.join(broadcast(quarts), Seq("_g"))
      .filter(col("_v") < col("_lo") || col("_v") > col("_hi"))
      .select(col("_g").as(groupCol), col("_id").as(idCol),
        col("_v").as(valueCol), col("_q1").as("q1"), col("_q3").as("q3"),
        col("_lo").as("lo_fence"), col("_hi").as("hi_fence"))
  }

  /** GROUPED PEARSON R² (x174) — the correlation between two INTEGER
    * measures per group via the closed form
    * `r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))`,
    * every Σ an exact DECIMAL(38,0) integer — x167's moment recipe
    * generalized to any (group, x, y) frame; only the one final
    * division (and its sign, carried separately as `direction`) is a
    * mirrored double. Degenerate variance → NULL. Callers pre-grid
    * non-integer measures (`floor(v·10^s + 0.5)`).
    *
    * Scale shape: one corpus aggregate to the group-count-bounded
    * moment frame; windowless. */
  def groupedCorrelation(df: DataFrame, groupCol: String, xCol: String,
                         yCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = df.select(col(groupCol).as("grp"),
        col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("_x"))).as("_sx"), sum(dec(col("_y"))).as("_sy"),
        sum(dec(col("_x")) * dec(col("_y"))).as("_sxy"),
        sum(dec(col("_x")) * dec(col("_x"))).as("_sxx"),
        sum(dec(col("_y")) * dec(col("_y"))).as("_syy"))
    val num = dec(col("n")) * col("_sxy") - col("_sx") * col("_sy")
    val dx = dec(col("n")) * col("_sxx") - col("_sx") * col("_sx")
    val dy = dec(col("n")) * col("_syy") - col("_sy") * col("_sy")
    m.withColumn("_num", num).withColumn("_dx", dx).withColumn("_dy", dy)
      .select(col("grp").as(groupCol), col("n"),
        when(col("_dx") > 0 && col("_dy") > 0, Num.fpRound(
          col("_num").cast("double") * col("_num").cast("double") /
            (col("_dx").cast("double") * col("_dy").cast("double")), 6))
          .as("r2"),
        when(col("_num") > 0, 1).when(col("_num") < 0, -1).otherwise(0)
          .cast("int").as("direction"))
  }

  /** MAD ROBUST ANOMALIES (x175) — x163's robust twin: a day flags
    * when its count deviates from the type's MEDIAN by more than
    * `k × MAD` (median absolute deviation) — ALL-INTEGER: the median
    * is the exact rank-`ceil(n/2)` count, deviations are integer
    * |x − med|, the MAD is their exact median, and the flag compares
    * `|x − med| > k·MAD` in longs. Where x163's mean/σ test lets one
    * giant spike inflate σ and mask smaller anomalies, the median/MAD
    * pair doesn't budge (50% breakdown point). MAD = 0 (over half the
    * days identical) flags EVERY deviating day — the strict reading,
    * documented.
    *
    * Scale shape: the daily aggregate, then two grouped-rank passes
    * over the (type × day)-bounded count frame; thresholds broadcast
    * back; no per-type sort. */
  def madAnomalyDays(events: DataFrame, tsCol: String, typeCol: String,
                     k: Long = 3L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val daily = dailyCounts(events, tsCol, typeCol)
    val med = TextAnalysis.groupedQuantiles(
        daily.select(col("event_type"), col("day"), col("n_events")),
        "day", "event_type", "n_events", Seq(0.5))
      .select(col("event_type"), col("n_events").as("_med"))
    val devs = daily.join(broadcast(med), Seq("event_type"))
      .withColumn("_dev", abs(col("n_events") - col("_med")))
    val mad = TextAnalysis.groupedQuantiles(
        devs.select(col("event_type"), col("day"), col("_dev")),
        "day", "event_type", "_dev", Seq(0.5))
      .select(col("event_type"), col("_dev").as("_mad"))
    devs.join(broadcast(mad), Seq("event_type"))
      .filter(col("_dev") > lit(k) * col("_mad"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("_med").as("median"), col("_mad").as("mad"))
  }

  /** GINI CONCENTRATION (x165) — how concentrated is each nation's
    * order revenue across its customers: the Gini coefficient
    * `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` over ascending per-customer
    * revenue (ties by customer key), computed on EXACT integers — each
    * order contributes `floor(price·10⁴ + 0.5)` revenue units, the
    * rank-weighted sums ride DECIMAL(38,0), and only the final ratio
    * touches a double (grid-rounded). 0 = everyone equal, →1 = one
    * customer is the book. The concentration-risk report.
    *
    * Scale shape: one customer-keyed aggregate, then
    * [[TextAnalysis.groupedRanks]] for per-nation EXACT ranks with NO
    * per-nation sort (range-bucket + broadcast-offset core), then a
    * nation-keyed weighted sum — every exchange is on a key, output is
    * dictionary-sized. */
  def giniConcentration(orders: DataFrame, customer: DataFrame,
                        nation: DataFrame): DataFrame = {
    val units = floor(col("o_totalprice") * 1e4 + lit(0.5)).cast("long")
    val perCust = orders.select(col("o_custkey"), units.as("_u"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("_u")).as("_rev"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("o_custkey").as("_id"), col("nation"), col("_rev"))
    val ranked = TextAnalysis.groupedRanks(perCust, "_id", "nation",
      "_rev", bestFirst = false)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    ranked.groupBy(col("nation"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("_rev"))).as("_sx"),
        sum(dec(col("rank")) * dec(col("_rev"))).as("_six"))
      .select(col("nation"), col("n_customers"),
        (col("_sx").cast("double") / 1e4).as("revenue"),
        Num.fpRound(
          (lit(2.0) * col("_six").cast("double") -
            (col("n_customers") + lit(1)).cast("double") *
              col("_sx").cast("double")) /
            (col("n_customers").cast("double") *
              col("_sx").cast("double")), 6).as("gini"))
  }

  /** TOP USER JOURNEYS (x179) — the most common first-`k` event-type
    * paths across users (`"signup>view>purchase"`), the "how do people
    * actually enter the product" report behind every funnel design
    * (x153 checks ONE declared funnel; this discovers which paths are
    * worth declaring). Each user's first `k` events by `(ts, tie)`
    * concatenate with `>` (shorter if the user has fewer events), then
    * paths are counted and the top `topN` returned, ties broken by
    * path.
    *
    * Scale shape: one user-keyed window (frames are per-user event
    * depth — millions of small frames, never a global sort), a
    * conditional-max aggregate per user (k columns — no collect_list),
    * then a path-keyed count whose frame is |event types|^k-bounded:
    * dictionary-sized at any corpus, so the final top-N is a
    * TakeOrdered over a tiny frame. */
  def topJourneys(events: DataFrame, idCol: String, typeCol: String,
                  tsCol: String, tieCol: String, k: Int = 3,
                  topN: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ms").asc, col("_tie").asc)
    val firstK = events.select(col(idCol).as("_u"),
        col(typeCol).as("_t"), Dates.toEpochMillis(col(tsCol)).as("_ms"),
        col(tieCol).as("_tie"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
    val steps = (1 to k).map(i =>
      max(when(col("_rn") === i, col("_t"))).as(s"_s$i"))
    val paths = firstK.groupBy(col("_u"))
      .agg(steps.head, steps.tail: _*)
      .select(concat_ws(">", (1 to k).map(i => col(s"_s$i")): _*)
        .as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(topN)
  }

  /** CUMULATIVE NEW-USERS CURVE (x183) — per day: how many users were
    * seen for the FIRST time that day, and the running total — the
    * growth chart on every dashboard. Days are exact integer epoch
    * days (`ms div 86400000` with the remainder subtracted first — no
    * date_trunc timezone law).
    *
    * Scale shape: one user-keyed `min` aggregate (each user's first
    * day — map-side combined), then a day aggregate; the running sum's
    * window is ordered over the DAY frame, which is CALENDAR-bounded
    * (years of history = a few thousand rows), so the single-partition
    * window — the same documented exception as the V-bounded Zipf
    * rank — never sees users or events. */
  def cumulativeNewUsers(events: DataFrame, idCol: String,
                         tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ms = Dates.toEpochMillis(col(tsCol))
    val day = ((ms - pmod(ms, lit(86400000L))) / lit(86400000L))
      .cast("long")
    val firstSeen = events.select(col(idCol).as("_u"), day.as("_d"))
      .groupBy(col("_u")).agg(min(col("_d")).as("first_day"))
    val daily = firstSeen.groupBy(col("first_day"))
      .agg(count(lit(1)).as("n_new_users"))
    val w = Window.orderBy(col("first_day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.withColumn("cum_users", sum(col("n_new_users")).over(w))
  }

  /** CALENDAR GAP-FILL + FORWARD FILL (x186) — densify a per-group
    * daily series onto its own [min, max] calendar spine and carry the
    * last observed value across the gaps: `(group, day, value,
    * filled_value, is_gap)`. The step every downstream rolling /
    * charting consumer needs BEFORE trusting a window frame — x161
    * documents the dual bug (a ROWS frame silently stretches over
    * missing days); this operator makes the missing days explicit
    * rows instead. Days before a group's first observation cannot
    * exist (the spine starts at the group's own min), so
    * `filled_value` is never NULL.
    *
    * Scale shape: the spine comes from each group's own (min, max)
    * extent — one bounded aggregate, then `sequence()` exploded
    * per group, CALENDAR-bounded rows (years of history = a few
    * thousand rows per group, however large the corpus); the join
    * back to observations is key-partitioned on (group, day); the
    * forward-fill window runs per-group over the calendar-bounded
    * frame (the documented V-bounded-window exception class). The
    * corpus itself is touched only by whatever bounded aggregate
    * produced `daily` — this operator never sees fact rows. */
  def gapFillDaily(daily: DataFrame, groupCol: String, dayCol: String,
                   valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ext = daily.groupBy(col(groupCol))
      .agg(min(col(dayCol)).as("_d0"), max(col(dayCol)).as("_d1"))
    val spine = ext.select(col(groupCol),
      explode(sequence(col("_d0"), col("_d1"))).as(dayCol))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq(groupCol, dayCol), "left")
      .withColumn("filled_value",
        last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(valueCol).isNull)
  }

  /** MARKOV EVENT TRANSITIONS (x187) — the first-order transition
    * matrix of the event stream: for every (prev_type, next_type)
    * pair of CONSECUTIVE events within a user's timeline, the exact
    * transition count and the row-normalized probability
    * `P(next | prev)` on the 1e-6 grid. The behavioral-model summary
    * x179's top-journeys report samples from — journeys show the
    * most common full paths, this gives the complete one-step law
    * (and feeds simulation / next-event prediction). Ordering ties
    * break by the event id, so the sequence — and therefore the
    * matrix — is deterministic.
    *
    * Scale shape: one user-keyed window (each user's events sorted
    * within their own partition — the q13 sessionize exchange) feeds
    * a (types × types) DICTIONARY-bounded aggregate with map-side
    * combine; the per-prev totals frame is dictionary-sized and
    * broadcast back. No self-join — LAG touches each event once. */
  def markovTransitions(events: DataFrame, userCol: String,
                        tsCol: String, typeCol: String,
                        idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_u"))
      .orderBy(col("_ts"), col("_id"))
    val seq = events.select(col(userCol).as("_u"),
        Dates.toEpochMillis(col(tsCol)).as("_ts"), col(idCol).as("_id"),
        col(typeCol).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = seq.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n_transitions")).as("_tot"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n_transitions"),
        Num.fpRound(col("n_transitions").cast("double") /
          col("_tot").cast("double"), 6).as("prob"))
  }

  /** INTER-EVENT GAPS (x191's core) — for every event after a user's
    * first: the milliseconds since that user's PREVIOUS event (any
    * type), labeled with the current event's type and id —
    * `(event_id, event_type, gap_ms)`. Feeding this through the
    * grouped exact-quantile machinery (x156's `groupedQuantiles`)
    * yields the gap distribution that SIZES q13's sessionize
    * timeout and `Streams.sessionize`'s state timeout: a 30-minute
    * gap parameter is an assumption until this report shows where
    * the within-session/between-session valley actually sits.
    *
    * Scale shape: ONE user-keyed window (the q13 exchange), ordered
    * by (ts, id) so ties — and therefore gaps — are deterministic;
    * each event is touched once, output is input-sized minus one
    * row per user. */
  def interEventGaps(events: DataFrame, userCol: String, tsCol: String,
                     idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_u")).orderBy(col("_ms"), col("_id"))
    events.select(col(userCol).as("_u"),
        Dates.toEpochMillis(col(tsCol)).as("_ms"),
        col(idCol).as("_id"), col(typeCol).as("event_type"))
      .withColumn("gap_ms", col("_ms") - lag(col("_ms"), 1).over(w))
      .filter(col("gap_ms").isNotNull)
      .select(col("_id").as("event_id"), col("event_type"),
        col("gap_ms"))
  }

  /** CUSUM DRIFT DETECTION (x189) — Page's cumulative-sum control
    * chart (Page 1954, zero-slack form) over each event type's daily
    * counts: the one-sided upward CUSUM
    * `S_i = max(0, S_{i-1} + (x_i − μ))` flags SUSTAINED drift that
    * x163's per-day z-test misses (ten consecutive days at +1σ never
    * trip a 2σ point test but accumulate to 10σ of CUSUM mass — the
    * spec pins exactly that contrast) and x175's MAD test also
    * misses (both are point detectors).
    *
    * Exactness: the recursion unrolls to the closed form
    * `S_i = P_i − min(0, min_{j≤i} P_j)` over the prefix sums `P` of
    * the deviations — so with deviations kept as EXACT integers
    * `d_i = D·x_i − Σx` (D = day count; everything scaled by D to
    * clear the mean's division), both windows are integer sums/mins
    * riding DECIMAL(38,0)/HUGEINT, and the flag
    * `S_i > h·D·σ  ⟺  S_i² > h²·(D·Σx² − (Σx)²)` is decided in
    * exact integer arithmetic (x163's squares law; same 1e19 count
    * bound). The reported `drift_sigmas = S_i / (D·σ)` is ONE
    * mirrored double division of the two exact integers, grid-
    * rounded; NULL when the variance is zero (a constant series has
    * no σ unit — and its S_i is identically 0).
    *
    * Scale shape: one corpus aggregate to (type, day) — bounded
    * output, map-side combined; a dictionary-sized per-type stats
    * frame broadcast back; two windows per type over CALENDAR-
    * bounded day frames (the documented exception class). */
  /** x189's per-type count moments over [[dailyCounts]] —
    * `(event_type, _d, _s1, _s2)`: day count, Σx and Σx² (the Σx²
    * on DECIMAL(38,0)). The frozen batch artifact
    * [[graft.streaming.Streams.cusumStream]] serves against — the
    * same batch/stream split as [[anomalyStats]]/`anomalyGate`. */
  def cusumStats(daily: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("_d"), sum(col("n_events")).as("_s1"),
        sum(dec(col("n_events")) * dec(col("n_events"))).as("_s2"))
  }

  def cusumDrift(events: DataFrame, tsCol: String, typeCol: String,
                 h: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(h >= 1, s"h must be >= 1, got $h")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val daily = dailyCounts(events, tsCol, typeCol)
    val stats = cusumStats(daily)
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dev = daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("_dd",
        dec(col("_d")) * dec(col("n_events")) - dec(col("_s1")))
    val pre = dev.withColumn("_p", sum(col("_dd")).over(w))
    val vcol = dec(col("_d")) * col("_s2") -
      dec(col("_s1")) * dec(col("_s1"))
    pre
      .withColumn("_s",
        col("_p") - least(lit(0).cast("decimal(38,0)"),
          min(col("_p")).over(w)))
      .select(col("event_type"), col("day"), col("n_events"),
        when(vcol > lit(0),
          Num.fpRound(col("_s").cast("double") /
            sqrt(vcol.cast("double")), 6)).as("drift_sigmas"),
        (col("_s") * col("_s") >
          lit(h.toLong * h).cast("decimal(38,0)") * vcol).as("flagged"))
  }
}
