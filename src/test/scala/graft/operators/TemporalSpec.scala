package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def withTs(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ts", timestamp_millis(col("ms"))).drop("ms")

  test("asofJoin (x143): most recent right row at-or-before, ties to " +
      "the larger id, unattributed lefts kept — and NO join operator " +
      "in the plan") {
    val clicks = withTs(Seq(
      (100L, 1L, 10000L, 1.0),
      (101L, 1L, 20000L, 2.0),
      (102L, 1L, 20000L, 3.0),   // same-ts tie: larger id wins
      (103L, 3L, 50000L, 4.0)    // other user — never matches
    ).toDF("event_id", "user_id", "ms", "value"))
    val purchases = withTs(Seq(
      (200L, 1L, 20000L),        // ts == click ts → '<=' includes it
      (201L, 1L, 15000L),        // only the t=10s click is prior
      (202L, 2L, 5000L)          // no clicks for this user at all
    ).toDF("event_id", "user_id", "ms"))
    val out = Temporal.asofJoin(purchases, clicks, "user_id",
      "ts", "ts", "event_id", Seq("value"))
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts",
      "prior_event_id", "prior_ts", "prior_value"))
    val rows = out.collect().map { r =>
      r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("prior_event_id")),
          Option(r.getAs[java.lang.Double]("prior_value"))))
    }.toMap
    assert(rows(200L) === ((Some(102L), Some(3.0))))
    assert(rows(201L) === ((Some(100L), Some(1.0))))
    assert(rows(202L) === ((None, None)))
    // the merge-scan promise: union + window, no pair join
    val p = out.queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), s"as-of should not plan a join:\n$p")
  }

  test("asofJoin: a right row strictly after every left row matches " +
      "nothing; payload columns travel with THEIR OWN row") {
    val r = withTs(Seq((1L, 9L, 99000L, 7.0), (2L, 9L, 1000L, 5.0))
      .toDF("event_id", "user_id", "ms", "value"))
    val l = withTs(Seq((10L, 9L, 2000L)).toDF("event_id", "user_id", "ms"))
    val row = Temporal.asofJoin(l, r, "user_id", "ts", "ts",
      "event_id", Seq("value")).collect().head
    // t=99s is in the future; the match is (id 2, value 5.0) — value
    // must not leak from the later row
    assert(row.getAs[Long]("prior_event_id") === 2L)
    assert(row.getAs[Double]("prior_value") === 5.0)
  }

  test("proximityAgg (x144): inclusive radius, cross-band neighbors " +
      "found, exact-decimal sum, empty neighborhoods read (0, NULL) — " +
      "and no cartesian in the plan") {
    val radius = 3600000L
    val purchases = withTs(Seq((1L, 3600000L), (2L, 100000000L))
      .toDF("event_id", "ms"))
    val clicks = withTs(Seq(
      (5400000L, 0.5),    // +30 min, same band
      (1234000L, 0.25),   // -39 min, band below
      (7200000L, 0.125),  // exactly +radius, band above — inclusive
      (7300000L, 9.0)     // +61.7 min — band above but outside radius
    ).toDF("ms", "value"))
    val out = Temporal.proximityAgg(purchases, "event_id", "ts",
      clicks, "ts", "value", radius)
    val rows = out.collect().map { r =>
      r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_near"),
          Option(r.getAs[java.lang.Double]("v_sum"))))
    }.toMap
    assert(rows(1L) === ((3L, Some(0.875))))
    assert(rows(2L) === ((0L, None)))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"banding should yield an equality join:\n$p")
  }

  test("scd2 (x148): consecutive repeats extend an interval, a revert " +
      "opens a NEW version, NULL transitions are null-safe, and the " +
      "valid_to chain links run starts — with no join in the plan") {
    val ev = withTs(Seq(
      (1L, 1000L, 1L, Some("a")),
      (2L, 2000L, 1L, Some("a")),   // repeat → extends version 1
      (3L, 3000L, 1L, Some("b")),   // change → version 2
      (4L, 4000L, 1L, None),        // b → NULL: a change (version 3)
      (5L, 5000L, 1L, None),        // NULL → NULL: extends (null-safe)
      (6L, 6000L, 1L, Some("a")),   // REVERT to a → version 4, not 1
      (7L, 1000L, 2L, Some("z"))    // other key: its own chain
    ).toDF("event_id", "ms", "user_id", "attr"))
    val out = Temporal.scd2(ev, "user_id", "ts", "event_id", "attr")
      .collect().map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
          ((Option(r.getAs[String]("attr")),
            r.getAs[Long]("valid_from_ms"),
            Option(r.getAs[java.lang.Long]("valid_to_ms")),
            r.getAs[Boolean]("is_current"), r.getAs[Long]("n_events")))
      }.toMap
    assert(out((1L, 1L)) ===
      ((Some("a"), 1000L, Some(3000L), false, 2L)))
    assert(out((1L, 2L)) === ((Some("b"), 3000L, Some(4000L), false, 1L)))
    assert(out((1L, 3L)) === ((None, 4000L, Some(6000L), false, 2L)))
    assert(out((1L, 4L)) === ((Some("a"), 6000L, None, true, 1L)))
    assert(out((2L, 1L)) === ((Some("z"), 1000L, None, true, 1L)))
    assert(out.size === 5)
    val p = Temporal.scd2(ev, "user_id", "ts", "event_id", "attr")
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), s"scd2 should be join-free:\n$p")
  }

  test("enrichAsOf (x155): facts join the dimension version current " +
      "AT THEIR OWN TIME — not the current one; version starts are " +
      "inclusive; pre-history facts keep NULLs; join-free plan") {
    val ev = withTs(Seq(
      (1L, 1000L, 1L, "bronze"),
      (2L, 5000L, 1L, "gold"),    // upgrade at t=5s
      (3L, 9000L, 1L, "bronze"),  // downgrade at t=9s (version 3)
      (4L, 1000L, 2L, "trial")
    ).toDF("event_id", "ms", "user_id", "attr"))
    val dim = Temporal.scd2(ev, "user_id", "ts", "event_id", "attr")
    val facts = withTs(Seq(
      (100L, 1L, 3000L),  // inside version 1 — bronze, though user
                          // is bronze AGAIN now via version 3
      (101L, 1L, 5000L),  // exactly at version 2's start — gold
      (102L, 1L, 7000L),  // inside version 2 — gold
      (103L, 1L, 500L),   // before any version — NULLs
      (104L, 3L, 3000L)   // unknown key — NULLs
    ).toDF("event_id", "user_id", "ms"))
    val out = Temporal.enrichAsOf(facts, dim, "user_id", "ts",
      Seq("attr"))
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts",
      "dim_version", "dim_attr"))
    val rows = out.collect().map { r =>
      r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("dim_version")),
          Option(r.getAs[String]("dim_attr"))))
    }.toMap
    assert(rows(100L) === ((Some(1L), Some("bronze"))))
    assert(rows(101L) === ((Some(2L), Some("gold"))))
    assert(rows(102L) === ((Some(2L), Some("gold"))))
    assert(rows(103L) === ((None, None)))
    assert(rows(104L) === ((None, None)))
    val p = out.queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), s"the lookup should be a merge scan:\n$p")
  }

  test("multiTouchAttribution (x149): U-shape weights at n=1/2/4, the " +
      "lookback excludes older and future clicks, cross-band pairs " +
      "are found, and credit = rounded value x weight") {
    val win = 60000L
    val clicks = withTs(Seq(
      (100L, 1L, 10000L),  // in window of p1 (Δ=50 s)
      (101L, 1L, 30000L),
      (102L, 1L, 45000L),
      (103L, 1L, 60000L),  // Δ=0: at the purchase instant — included
      (104L, 1L, 61000L),  // AFTER the purchase — excluded
      (105L, 1L, -60000L), // Δ=120 s — outside the lookback
      (200L, 2L, 100000L), // lone touch for p2 — crosses a band edge
      (300L, 3L, 5000L), (301L, 3L, 6000L) // exactly two for p3
    ).toDF("event_id", "user_id", "ms"))
    val purchases = withTs(Seq(
      (1L, 1L, 60000L, 10.0),
      (2L, 2L, 130000L, 2.0), // click at 100 s: other side of band 2
      (3L, 3L, 50000L, 4.0),
      (4L, 4L, 50000L, 9.9)   // no clicks at all — absent from output
    ).toDF("event_id", "user_id", "ms", "value"))
    val out = Temporal.multiTouchAttribution(purchases, "event_id",
      "ts", "value", clicks, "event_id", "ts", "user_id", win)
    val rows = out.collect().map { r =>
      (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id")) ->
        ((r.getAs[Long]("touch_rank"), r.getAs[Long]("n_touches"),
          r.getAs[Double]("weight"), r.getAs[Double]("credit")))
    }.toMap
    // p1: 4 touches → 0.4 / 0.2/2 / 0.2/2 / 0.4
    assert(rows((1L, 100L)) === ((1L, 4L, 0.4, 4.0)))
    assert(rows((1L, 101L)) === ((2L, 4L, 0.1, 1.0)))
    assert(rows((1L, 102L)) === ((3L, 4L, 0.1, 1.0)))
    assert(rows((1L, 103L)) === ((4L, 4L, 0.4, 4.0)))
    // p2: single touch takes everything (found across the band edge)
    assert(rows((2L, 200L)) === ((1L, 1L, 1.0, 2.0)))
    // p3: two touches split evenly
    assert(rows((3L, 300L)) === ((1L, 2L, 0.5, 2.0)))
    assert(rows((3L, 301L)) === ((2L, 2L, 0.5, 2.0)))
    assert(rows.size === 7)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the one-sided band join should be an equality join:\n$p")
  }
}
