package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, 100L, ts("2024-01-01 10:00:00"), "a"),
    (1L, 101L, ts("2024-01-01 11:00:00"), "b"), // latest for key 1
    (2L, 102L, ts("2024-01-02 09:00:00"), "c"),
    (2L, 103L, ts("2024-01-02 09:00:00"), "d")  // ts tie -> higher id wins
  ).toDF("user_id", "event_id", "ts", "payload")

  test("latestPerKey keeps the newest row per key with tie-break (Q6/K1)") {
    val out = Upsert.latestPerKey(events, Seq("user_id"), "ts",
      tieBreak = Seq("event_id"))
    val byKey = out.collect().map(r =>
      r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    assert(byKey == Map(1L -> 101L, 2L -> 103L))
  }

  test("upsert is idempotent: upsert(upsert(x)) == upsert(x)") {
    val once = Upsert.latestPerKey(events, Seq("user_id"), "ts",
      tieBreak = Seq("event_id"))
    val twice = Upsert.latestPerKey(once, Seq("user_id"), "ts",
      tieBreak = Seq("event_id"))
    assert(once.collect().toSet == twice.collect().toSet)
  }
}
