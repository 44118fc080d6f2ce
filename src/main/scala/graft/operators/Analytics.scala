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
}
