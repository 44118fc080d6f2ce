package graft.runner

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.Watermark
import graft.state.Bookmarks

class OrchestratorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (2L, ts("2024-01-20 00:00:00"))
  ).toDF("event_id", "ts")

  test("runOnce filters by bookmark, sinks, and advances state (O1/O2/W3)") {
    var sunk: Seq[Long] = Nil
    val job = Orchestrator.StreamJob(
      name = "events", tsCol = "ts",
      extract = (_, bk) => bk.map(Watermark.newerThan(events, "ts", _))
        .getOrElse(events),
      sink = (df: DataFrame) =>
        sunk = df.collect().map(_.getLong(0)).toSeq.sorted,
      advanceToMaxSeen = true)
    val p = Orchestrator.Pipeline("sys", Seq(job))

    val s1 = Orchestrator.runOnce(spark, Seq(p), Bookmarks.empty)
    assert(sunk == Seq(1L, 2L)) // first run: full extract
    assert(s1.get("sys.events").contains("2024-01-20T00:00:00Z")) // max seen

    val s2 = Orchestrator.runOnce(spark, Seq(p), s1)
    assert(sunk.isEmpty) // nothing newer than the advanced bookmark
    assert(s2.get("sys.events") == s1.get("sys.events")) // unchanged on empty
  }

  test("loop persists state after each round") {
    val statePath = Files.createTempDirectory("orch").resolve("state.json")
    val job = Orchestrator.StreamJob("e", "ts",
      extract = (_, _) => events, sink = _ => (), advanceToMaxSeen = true)
    Orchestrator.loop(spark, Seq(Orchestrator.Pipeline("sys", Seq(job))),
      statePath, intervalMillis = 0, rounds = 2)
    val persisted = Bookmarks.load(statePath)
    assert(persisted.get("sys.e").contains("2024-01-20T00:00:00Z"))
  }
}
