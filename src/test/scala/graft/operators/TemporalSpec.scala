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
}
