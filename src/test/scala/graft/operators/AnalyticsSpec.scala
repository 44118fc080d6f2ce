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

  test("rollingRevenue (x161): RANGE frame sums only days within the " +
      "trailing window — a calendar gap drops out instead of " +
      "stretching the frame") {
    val li = Seq(
      // nation 10, days 0, 1 and 8 (gap over days 2..7)
      (1L, 10.0, 0.0, 0L), (1L, 20.0, 0.0, 86400000L),
      (1L, 5.0, 0.0, 8L * 86400000L)
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "ms")
      .withColumn("l_shipdate", timestamp_millis(col("ms"))).drop("ms")
    val supp = Seq((1L, 10)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((10, "ALPHA")).toDF("n_nationkey", "n_name")
    val out = Analytics.rollingRevenue(li, supp, nat)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(out === Map(
      0L -> ((10.0, 10.0, 1L)),
      1L -> ((20.0, 30.0, 2L)),  // day 0 still in the 7-day frame
      8L -> ((5.0, 5.0, 1L))))   // days 2..7 empty — frame has 1 day
  }

  test("yoyGrowth (x162): growth vs the last ACTIVE year; first year " +
      "NULL, not zero") {
    val orders = Seq(
      (1L, 1L, 10.0, "1995-02-01"), (2L, 1L, 15.0, "1996-02-01"),
      (3L, 1L, 30.0, "1998-02-01") // 1997 silent — compares vs 1996
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "_d")
      .withColumn("o_orderdate", to_timestamp(col("_d"))).drop("_d")
    val cust = Seq((1L, 10)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((10, "ALPHA")).toDF("n_nationkey", "n_name")
    val out = Analytics.yoyGrowth(orders, cust, nat)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out === Map(
      1995L -> ((None, None)),
      1996L -> ((Some(10.0), Some(0.5))),
      1998L -> ((Some(15.0), Some(1.0)))))
  }

  test("anomalyDays (x163): flags exactly the days whose count breaks " +
      "the exact-integer 2-sigma bound") {
    // type 'a': five 1-count days + one 10-count day:
    //   d=6, Σx=15, Σx²=105 → lhs(10)=(60−15)²=2025 > 4·(630−225)=1620
    //   and lhs(1)=(6−15)²=81 < 1620 — only the spike flags.
    val ev = (0 to 4).map(d => ("a", d.toLong * 86400000L)) ++
      (0 until 10).map(i => ("a", 5L * 86400000L + i))
    val df = ev.toDF("event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val out = Analytics.anomalyDays(df, "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(("a", 5L, 10L, 6L, 15L)))
  }

  test("basketAffinity (x164): pair counts over distinct per-order " +
      "brand sets; minCount cuts rare pairs; lift exact") {
    val li = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L), // o1: brands A, B (103 dups A)
      (2L, 101L), (2L, 102L),             // o2: A, B
      (3L, 101L),                         // o3: A
      (4L, 102L), (4L, 104L)              // o4: B, C
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq(
      (101L, "A"), (102L, "B"), (103L, "A"), (104L, "C")
    ).toDF("p_partkey", "p_brand")
    val out = Analytics.basketAffinity(li, part, minCount = 2).collect()
    assert(out.length === 1) // (B, C) co-occurs once — cut
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) ===
      (("A", "B", 2L)))
    assert(r.getDouble(5) === 0.5)      // support 2/4
    assert(r.getDouble(6) === 0.666667) // confidence 2/3 on the grid
    assert(r.getDouble(7) === 0.888889) // lift 2·4/(3·3)
  }

  test("revenueTrend (x167): a perfect 10-per-day ramp reads slope 10 " +
      "and r2 1; a single-day nation reads NULLs") {
    val li = Seq(
      (1L, 10.0, 0.0, 0L), (1L, 20.0, 0.0, 86400000L),
      (1L, 30.0, 0.0, 2L * 86400000L), // ALPHA: days 0,1,2 → 10,20,30
      (2L, 7.0, 0.0, 0L)               // BETA: one day — no spread
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "ms")
      .withColumn("l_shipdate", timestamp_millis(col("ms"))).drop("ms")
    val supp = Seq((1L, 10), (2L, 20)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((10, "ALPHA"), (20, "BETA"))
      .toDF("n_nationkey", "n_name")
    val out = Analytics.revenueTrend(li, supp, nat)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out === Map(
      "ALPHA" -> ((3L, Some(10.0), Some(1.0))),
      "BETA" -> ((1L, None, None))))
  }

  test("abConversion (x168): md5-grid split, >= minCount bar, exact " +
      "rates; equal arms read z2 = 0") {
    // md5 first hex: "6","9" <= '7' → A; "1","2" → B
    val ev = Seq(
      (6L, "purchase"), (6L, "purchase"),        // A, converts (k=2)
      (9L, "purchase"),                          // A, k=1 — below bar
      (1L, "purchase"), (1L, "purchase"), (1L, "purchase"), // B conv
      (2L, "view")                               // B, k=0
    ).toDF("user_id", "event_type")
    val r = Analytics.abConversion(ev, "user_id", "event_type",
      "purchase", minCount = 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 2L, 1L)))
    assert((r.getDouble(4), r.getDouble(5)) === ((0.5, 0.5)))
    assert(r.getDouble(6) === 0.0)
  }

  test("funnelLatency (x169): per-transition deltas follow the " +
      "at-or-after chain; quantile cuts are the exact double-ceil law") {
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 30L),
      (2L, "view", 0L), (2L, "click", 50L) // drops out before purchase
    ).toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val out = Analytics.funnelLatency(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), quantiles = Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      ("view->click", 0.5) -> ((1L, 1L, 10L)),  // rank ceil(1) = user 1
      ("view->click", 0.9) -> ((2L, 2L, 50L)),  // rank ceil(1.8) = 2
      ("click->purchase", 0.5) -> ((1L, 1L, 20L)),
      ("click->purchase", 0.9) -> ((1L, 1L, 20L))))
  }

  test("weekdaySeasonality (x171): exact integer day-of-week buckets " +
      "(epoch day 0 = Thursday = 3) and shares of the nation total") {
    val li = Seq(
      (1L, 30.0, 0.0, 0L),             // day 0 → Thursday (dow 3)
      (1L, 10.0, 0.0, 4L * 86400000L)  // day 4 → Monday (dow 0)
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "ms")
      .withColumn("l_shipdate", timestamp_millis(col("ms"))).drop("ms")
    val supp = Seq((1L, 10)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((10, "ALPHA")).toDF("n_nationkey", "n_name")
    val out = Analytics.weekdaySeasonality(li, supp, nat)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out === Map(
      3L -> ((1L, 30.0, 0.75)),
      0L -> ((1L, 10.0, 0.25))))
  }

  test("lorenzCurve (x172): quartile cuts follow the exact ntile law " +
      "and cumulative shares close at 1.0") {
    // 4 customers, revenues 1,1,1,7 → quartiles (nDeciles=4) hold one
    // customer each; cum shares 0.1, 0.2, 0.3, 1.0
    val orders = Seq(
      (1L, 1L, 1.0), (2L, 2L, 1.0), (3L, 3L, 1.0), (4L, 4L, 7.0)
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = (1L to 4L).map((_, 10)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((10, "ALPHA")).toDF("n_nationkey", "n_name")
    val out = Analytics.lorenzCurve(orders, cust, nat, nDeciles = 4)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out === Map(
      1 -> ((1L, 1.0, 0.1)), 2 -> ((1L, 1.0, 0.2)),
      3 -> ((1L, 1.0, 0.3)), 4 -> ((1L, 7.0, 1.0))))
  }

  test("iqrOutliers (x173): flags exactly the values beyond the " +
      "Tukey fences from exact rank quartiles") {
    // group g: values 1..9 and one far outlier 100.
    // n=10: q1 = rank ceil(2.5)=3 → 3.0; q3 = rank ceil(7.5)=8 → 8.0
    // IQR=5 → fences [-4.5, 15.5] → only 100 flags.
    val df = ((1 to 9).map(i => (i.toLong, "g", i.toDouble)) :+
      (10L, "g", 100.0)).toDF("id", "grp", "v")
    val out = Analytics.iqrOutliers(df, "id", "grp", "v").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(10L))
    val r = out.head
    assert((r.getDouble(3), r.getDouble(4)) === ((3.0, 8.0)))
    assert((r.getDouble(5), r.getDouble(6)) === ((-4.5, 15.5)))
  }

  test("groupedCorrelation (x174): a perfect linear relation reads " +
      "r2 = 1 with the right sign; zero variance reads NULL") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 8L), ("a", 3L, 6L), // y = 12 − 2x
      ("b", 1L, 5L), ("b", 2L, 5L)                  // zero y-variance
    ).toDF("grp", "x", "y")
    val out = Analytics.groupedCorrelation(df, "grp", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getInt(3)))).toMap
    assert(out === Map(
      "a" -> ((3L, Some(1.0), -1)),
      "b" -> ((2L, None, 0))))
  }

  test("madAnomalyDays (x175): the median/MAD pair flags a spike the " +
      "same data's mean/sigma test masks when a second giant inflates " +
      "sigma") {
    // counts 1,1,2,2,3,5,100 over days 0..6: med = 2 (rank ceil(3.5)
    // = 4 under (count, day)), adev = 1,1,0,0,1,3,98 → MAD = 1 (rank
    // 4 of sorted 0,0,1,1,1,3,98); 3·MAD = 3 → flags day 6 (98 > 3)
    // but NOT day 5 (3 > 3 is false — strict).
    val counts = Seq(1, 1, 2, 2, 3, 5, 100)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => ("a", d.toLong * 86400000L + i))
    }
    val df = rows.toDF("event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val out = Analytics.madAnomalyDays(df, "ts", "event_type")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq((6L, 100L, 2L, 1L)))
  }

  test("giniConcentration (x165): equal revenues read 0; a 1:3 split " +
      "over two customers reads 0.25") {
    val orders = Seq(
      (1L, 1L, 1.0), (2L, 2L, 1.0), // BETA: equal split
      (3L, 3L, 1.0), (4L, 4L, 3.0)  // ALPHA: 1:3
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq((1L, 20), (2L, 20), (3L, 10), (4L, 10))
      .toDF("c_custkey", "c_nationkey")
    val nat = Seq((10, "ALPHA"), (20, "BETA"))
      .toDF("n_nationkey", "n_name")
    val out = Analytics.giniConcentration(orders, cust, nat)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out === Map(
      "BETA" -> ((2L, 2.0, 0.0)),
      "ALPHA" -> ((2L, 4.0, 0.25))))
  }

  test("topJourneys (x179): paths order by (ts, tie), short histories " +
      "yield short paths, counts aggregate across users, topN ties " +
      "break by path") {
    val ev = withTs(Seq(
      // users 1, 2: signup>view>buy (user 2 has a 4th event — ignored)
      (1L, 1L, "signup", 10L), (1L, 2L, "view", 20L), (1L, 3L, "buy", 30L),
      (2L, 4L, "signup", 10L), (2L, 5L, "view", 20L), (2L, 6L, "buy", 30L),
      (2L, 7L, "churn", 40L),
      // user 3: same ms for both events — event_id breaks the tie
      (3L, 8L, "view", 10L), (3L, 9L, "signup", 10L),
      // user 4: single event
      (4L, 10L, "signup", 10L)
    ).map { case (u, e, t, ms) => (u, e, t, ms) }
      .toDF("user_id", "event_id", "event_type", "ms"))
    val out = Analytics.topJourneys(ev, "user_id", "event_type", "ts",
      "event_id", k = 3, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(
      ("signup>view>buy", 2L), ("signup", 1L), ("view>signup", 1L)))
  }

  test("cumulativeNewUsers (x183): a user counts only on their FIRST " +
      "day, gaps leave no row, the running total is monotone") {
    val day = 86400000L
    val ev = withTs(Seq(
      (1L, 0L), (1L, 5L),          // user 1 twice on day 0
      (2L, day + 1),               // user 2 first on day 1
      (1L, 3 * day), (3L, 3 * day) // day 3: user 1 returns, user 3 new
    ).map { case (u, ms) => (u, ms) }.toDF("user_id", "ms"))
    val out = Analytics.cumulativeNewUsers(ev, "user_id", "ts")
      .orderBy(col("first_day")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 1L, 1L), (1L, 1L, 2L), (3L, 1L, 3L)))
  }

  test("gapFillDaily (x186): the spine covers each group's OWN " +
      "[min, max] days, gaps are explicit rows carrying the last " +
      "observed value, and filled_value is never NULL") {
    import spark.implicits._
    val daily = Seq(
      ("a", 10L, 1.5), ("a", 13L, 2.5), // gap at 11, 12
      ("b", 20L, 9.0)                   // single day — no gap
    ).toDF("nation", "day", "revenue")
    val out = Analytics.gapFillDaily(daily, "nation", "day", "revenue")
      .orderBy(col("nation"), col("day")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      ("a", 10L, Some(1.5), 1.5, false),
      ("a", 11L, None, 1.5, true),
      ("a", 12L, None, 1.5, true),
      ("a", 13L, Some(2.5), 2.5, false),
      ("b", 20L, Some(9.0), 9.0, false)))
  }

  test("markovTransitions (x187): consecutive pairs within each " +
      "user's (ts, event_id)-ordered timeline; counts aggregate " +
      "across users; probs row-normalize per prev state") {
    val ev = withTs(Seq(
      // user 1: A -> B -> A
      (1L, 1L, "A", 10L), (1L, 2L, "B", 20L), (1L, 3L, "A", 30L),
      // user 2: A -> B; NO cross-user transition to user 1's events
      (2L, 4L, "A", 10L), (2L, 5L, "B", 20L),
      // user 3: same-ms pair — event_id orders it C(6) -> A(7)
      (3L, 6L, "C", 10L), (3L, 7L, "A", 10L),
      // user 4: single event contributes nothing
      (4L, 8L, "B", 10L)
    ).map { case (u, e, t, ms) => (u, e, t, ms) }
      .toDF("user_id", "event_id", "event_type", "ms"))
    val out = Analytics.markovTransitions(ev, "user_id", "ts",
        "event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      ("A", "B") -> ((2L, 1.0)),
      ("B", "A") -> ((1L, 1.0)),
      ("C", "A") -> ((1L, 1.0))))
  }

  test("markovTransitions: probabilities split on the 1e-6 grid when " +
      "a state fans out") {
    val ev = withTs(Seq(
      (1L, 1L, "A", 10L), (1L, 2L, "B", 20L),
      (2L, 3L, "A", 10L), (2L, 4L, "B", 20L),
      (3L, 5L, "A", 10L), (3L, 6L, "C", 20L)
    ).map { case (u, e, t, ms) => (u, e, t, ms) }
      .toDF("user_id", "event_id", "event_type", "ms"))
    val out = Analytics.markovTransitions(ev, "user_id", "ts",
        "event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("A", "B")) === 0.666667) // floor(2/3*1e6+0.5)/1e6
    assert(out(("A", "C")) === 0.333333)
  }

  test("cusumDrift (x189): sustained small drift accumulates past the " +
      "3-sigma decision bound even though NO single day trips x163's " +
      "point z-test — and the closed form matches the direct " +
      "max(0, S+d) recursion day by day") {
    // 20 days at 10/day, then 10 days at 12/day: each high day is
    // ~1.4 sigma above the pooled mean (never a point anomaly), but
    // the run accumulates.
    val day = 86400000L
    val counts = (0 until 20).map(d => (d, 10)) ++
      (20 until 30).map(d => (d, 12))
    val rows = counts.flatMap { case (d, n) =>
      (0 until n).map(i => ("t", d * day + i))
    }
    val ev = withTs(rows.toDF("event_type", "ms"))
    val out = Analytics.cusumDrift(ev, "ts", "event_type", h = 3)
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
    // direct recursion in exact integers: d_i = D*x_i - S1
    val xs = counts.map(_._2.toLong)
    val dd = xs.map(x => xs.length * x - xs.sum)
    val svals = dd.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    val v = xs.length * xs.map(x => x * x).sum - xs.sum * xs.sum
    out.zip(svals).foreach { case ((_, _, drift, flag), s) =>
      assert(flag === (s * s > 9L * v))
      val expect = math.floor(s / math.sqrt(v.toDouble) * 1e6 + 0.5) / 1e6
      assert(drift.contains(expect))
    }
    // the drift run IS flagged...
    assert(out.count(_._4) > 0)
    // ...but no single day is a 2-sigma point anomaly for x163
    assert(Analytics.anomalyDays(ev, "ts", "event_type", sigmas = 2)
      .count() === 0)
  }

  test("interEventGaps (x191): gap = ms since the user's previous " +
      "event of ANY type, ties ordered by event id, first events " +
      "emit nothing, users never cross") {
    val ev = withTs(Seq(
      (1L, 1L, "A", 10L), (1L, 2L, "B", 30L),
      (1L, 3L, "C", 30L),            // tie with id2 -> gap 0 after it
      (2L, 4L, "A", 1000L)           // single event -> no gap row
    ).map { case (u, e, t, ms) => (u, e, t, ms) }
      .toDF("user_id", "event_id", "event_type", "ms"))
    val out = Analytics.interEventGaps(ev, "user_id", "ts",
        "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((2L, "B", 20L), (3L, "C", 0L)))
  }

  test("activeUsers (x200): DAU counts the day, WAU the trailing 7, " +
      "MAU the trailing 30; a user active twice in a window counts " +
      "once; days without activity have no row") {
    val day = 86400000L
    val ev = withTs(Seq(
      (1L, 0L), (1L, 5L),      // user 1 on day 0 (twice)
      (2L, 100L),              // user 2 on day 0
      (3L, 7 * day),           // user 3 on day 7
      (1L, 8 * day)            // user 1 returns on day 8
    ).map { case (u, ms) => (u, ms) }.toDF("user_id", "ms"))
    val out = Analytics.activeUsers(ev, "user_id", "ts")
      .orderBy(col("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 2L, 2L, 2L, 1.0),        // u1+u2; stickiness 2/2
      (7L, 1L, 1L, 3L, 0.333333),   // wau [1,7] = {u3}; mau all three
      (8L, 1L, 2L, 3L, 0.333333)))  // wau [2,8] = {u1, u3}
  }

  test("frequentTriples (x196): exact triple counts with support; " +
      "the Apriori pair prune is lossless; raising minCount above " +
      "the triple count empties the output even when pairs survive") {
    import spark.implicits._
    // o1-o3: {X,Y,Z}; o4: {X,Y}; o5: {W} -> triple XYZ in 3 of 5 orders
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (2L, 3L), (3L, 1L), (3L, 2L), (3L, 3L), (4L, 1L), (4L, 2L),
      (5L, 4L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z"), (4L, "W"))
      .toDF("p_partkey", "p_brand")
    val out = Analytics.frequentTriples(li, part, minCount = 3)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getString(2)) ===
      (("X", "Y", "Z")))
    assert(r.getLong(3) === 3L)
    assert(r.getDouble(4) === 0.6) // 3 of 5 orders
    // pair XY (4 co-orders) survives minCount=4, the triple does not
    assert(Analytics.frequentTriples(li, part, minCount = 4)
      .count() === 0)
  }

  test("brandRecommendations (x202): per-brand top-k by lift with " +
      "direction-specific confidence; exact grid values") {
    import spark.implicits._
    // o1{X,Y} o2{X,Y} o3{X,Z} o4{Z} o5{X}: N=5, cu X=4 Y=2 Z=2
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (3L, 3L), (4L, 3L), (5L, 1L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z"))
      .toDF("p_partkey", "p_brand")
    val out = Analytics.brandRecommendations(li, part, minCount = 1,
        k = 2).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getString(1), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // X: Y (lift 2*5/(4*2)=1.25, conf 0.5) then Z (0.625, 0.25)
    assert(out(("X", 1L)) === (("Y", 2L, 0.5, 1.25)))
    assert(out(("X", 2L)) === (("Z", 1L, 0.25, 0.625)))
    // Y's only rec is X, with direction-specific confidence 2/2 = 1.0
    assert(out(("Y", 1L)) === (("X", 2L, 1.0, 1.25)))
  }

  test("brandRecommendations: equal lift AND confidence tie-breaks " +
      "by brand name — fully deterministic") {
    import spark.implicits._
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "A"), (2L, "B"), (3L, "C"))
      .toDF("p_partkey", "p_brand")
    val recsForA = Analytics.brandRecommendations(li, part,
        minCount = 1, k = 2)
      .filter(col("brand") === "A").orderBy(col("rank")).collect()
      .map(_.getString(1)).toSeq
    assert(recsForA === Seq("B", "C"))
  }

  test("sessions (x198/x199 core): q13's gap law at session grain — " +
      "entry type is the FIRST event's (ties by id), bounces are " +
      "single-event sessions") {
    val m = 60000L
    val ev = withTs(Seq(
      // user 1: view at 0, click at +10min (same session),
      // buy at +50min (new session, 40min gap > 30min)
      (1L, 1L, "view", 0L), (1L, 2L, "click", 10 * m),
      (1L, 3L, "buy", 50 * m),
      // user 2: two events at the SAME ms — id 4 is the entry
      (2L, 4L, "b", 0L), (2L, 5L, "a", 0L)
    ).map { case (u, e, t, ms) => (u, e, t, ms) }
      .toDF("user_id", "event_id", "event_type", "ms"))
    val out = Analytics.sessions(ev, "user_id", "ts", "event_id",
        "event_type").collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getLong(5),
        r.getString(6)))).toMap
    assert(out === Map(
      "1_1" -> ((10 * m, 2L, "view")),
      "1_2" -> ((0L, 1L, "buy")),
      "2_1" -> ((0L, 2L, "b"))))
  }

  test("cusumDrift: a constant series has zero variance — " +
      "drift_sigmas NULL, nothing flagged") {
    val day = 86400000L
    val rows = (0 until 5).flatMap(d =>
      (0 until 7).map(i => ("c", d * day + i)))
    val ev = withTs(rows.toDF("event_type", "ms"))
    val out = Analytics.cusumDrift(ev, "ts", "event_type").collect()
    assert(out.length === 5)
    assert(out.forall(r => r.isNullAt(3) && !r.getBoolean(4)))
  }
}
