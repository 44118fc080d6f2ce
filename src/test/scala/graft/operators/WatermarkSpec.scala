package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (2L, ts("2024-01-15 00:00:00")), // exactly at bookmark: excluded
    (3L, ts("2024-01-20 00:00:00"))
  ).toDF("event_id", "ts")

  test("newerThan keeps strictly-newer rows only (W1/W2)") {
    val out = Watermark.newerThan(events, "ts", "2024-01-15 00:00:00")
    assert(out.collect().map(_.getAs[Long]("event_id")).toSet == Set(3L))
  }

  test("re-running with an advanced bookmark yields a subset (monotonicity)") {
    val first = Watermark.newerThan(events, "ts", "2024-01-01 00:00:00")
      .collect().map(_.getLong(0)).toSet
    val later = Watermark.newerThan(events, "ts", "2024-01-15 00:00:00")
      .collect().map(_.getLong(0)).toSet
    assert(later.subsetOf(first))
  }

  test("advanceToMaxSeen returns max event time; None on empty batch (W3)") {
    assert(Watermark.advanceToMaxSeen(events, "ts")
      .contains(ts("2024-01-20 00:00:00")))
    assert(Watermark.advanceToMaxSeen(events.filter("event_id > 99"), "ts").isEmpty)
  }
}
