package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val weekMs = 7L * 86400000L

  private def withTs(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ts", timestamp_millis(col("ms"))).drop("ms")

  test("cohortRetention (x152): cohort = first-activity week, offsets " +
      "count distinct returning users, gaps leave no row — and a user " +
      "active twice in one week counts once") {
    val ev = withTs(Seq(
      // user 1: weeks 0, 0 (dup), 2 — cohort 0, offsets {0, 2}
      (1L, 1000L), (1L, 2000L), (1L, 2 * weekMs + 5),
      // user 2: weeks 0, 1 — cohort 0, offsets {0, 1}
      (2L, 500L), (2L, weekMs + 1),
      // user 3: first seen week 1 — its OWN cohort
      (3L, weekMs + 2)
    ).toDF("user_id", "ms"))
    val out = Analytics.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      (0L, 0L) -> 2L,  // users 1 and 2
      (0L, 1L) -> 1L,  // user 2 returns in week 1
      (0L, 2L) -> 1L,  // user 1 returns in week 2 (no week-1 row)
      (1L, 0L) -> 1L)) // user 3's own cohort
  }

  test("rfmSegments (x154): each axis scores into exact quintiles " +
      "(2 users per tile at n=10), recency measures from the stream's " +
      "own latest purchase, and the champion reads 555") {
    // 10 users; user i's last purchase at i*1000 ms (user 10 most
    // recent), frequency = i purchases, per-purchase value = i — so
    // user 10 is best on every axis, user 1 worst
    val rows = (1 to 10).flatMap { i =>
      (1 to i).map(j => (i.toLong, "purchase", j * 100L + i * 1000L,
        i.toDouble))
    } :+ ((3L, "view", 99999L, 0.0)) // non-purchase noise is ignored
    val ev = withTs(rows.toDF("user_id", "event_type", "ms", "value"))
    val out = Analytics.rfmSegments(ev, "user_id", "ts", "event_type",
        "value", "purchase")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    assert(out.size === 10)
    // champion: zero recency, 10 purchases, top value
    assert(out(10L) === ((0L, 10L, 5, 5, 5, "555")))
    // worst on every axis (recency = 10000 - 1100 + ... last at 1100)
    val (rec1, f1, r1, fs1, ms1, seg1) = out(1L)
    assert(f1 === 1L && r1 === 1 && fs1 === 1 && ms1 === 1 &&
      seg1 === "111")
    assert(rec1 === (10000L + 10 * 100L) - 1100L)
    // exact quintiles: each score value appears exactly twice per axis
    (1 to 5).foreach { q =>
      assert(out.values.count(_._3 == q) === 2, s"r_score tile $q")
      assert(out.values.count(_._4 == q) === 2, s"f_score tile $q")
      assert(out.values.count(_._5 == q) === 2, s"m_score tile $q")
    }
  }

  test("funnel (x153): stages count only IN-ORDER completion — a " +
      "purchase before the first click does not convert; equal " +
      "timestamps satisfy at-or-after; counts are non-increasing") {
    val ev = withTs(Seq(
      // user 1 completes in order: view 10, click 20, purchase 30
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: purchase BEFORE its click — reaches click only
      (2L, "view", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      // user 3: click at the view's own instant — '>=' admits it
      (3L, "view", 50L), (3L, "click", 50L),
      // user 4: clicks but never views — enters no stage
      (4L, "click", 10L), (4L, "purchase", 20L),
      // noise types are ignored
      (1L, "error", 5L)
    ).toDF("user_id", "event_type", "ms"))
    val out = Analytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "view" -> ((1L, 3L)),      // users 1, 2, 3
      "click" -> ((2L, 3L)),     // all three clicked at-or-after
      "purchase" -> ((3L, 1L)))) // only user 1, in order
  }
}
