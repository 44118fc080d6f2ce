package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join matches latest preceding-or-equal right row per key") {
    val clicks = Seq(
      (7L, ts("2024-01-01 00:10:00"), 100L),
      (7L, ts("2024-01-01 00:30:00"), 101L),
      (8L, ts("2024-01-01 00:05:00"), 102L) // user with no prior view
    ).toDF("user_id", "ts", "event_id")
    val views = Seq(
      (7L, ts("2024-01-01 00:05:00"), 1L),
      (7L, ts("2024-01-01 00:20:00"), 2L),
      (7L, ts("2024-01-01 00:40:00"), 3L), // after both clicks
      (8L, ts("2024-01-01 00:06:00"), 4L)  // after user 8's click
    ).toDF("user_id", "ts", "event_id")

    val out = AsOf.join(clicks, views, "user_id", "ts", "event_id", "event_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap
    assert(out == Map(
      100L -> Some(1L), // 00:10 click -> 00:05 view
      101L -> Some(2L), // 00:30 click -> 00:20 view (not 00:40)
      102L -> None))    // no view at or before 00:05
  }

  test("equal timestamps match (<= semantics)") {
    val clicks = Seq((1L, ts("2024-01-01 00:00:00"), 10L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((1L, ts("2024-01-01 00:00:00"), 20L))
      .toDF("user_id", "ts", "event_id")
    val out = AsOf.join(clicks, views, "user_id", "ts", "event_id", "event_id")
      .head()
    assert(out.getAs[Long]("asof_event_id") == 20L)
  }
}
