package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.Views
import graft.operators.{Flatten, Project, Upsert, Watermark}
import graft.runner.Orchestrator
import graft.schema.JsonSchema
import graft.sinks.Sinks
import graft.state.Bookmarks

/** Minimum slice end-to-end (SURVEY §7.2): reproduce the reference's
  * wrike.proposal_durations topology across all layers in one run —
  * raw nested extract → recursive flatten → declared-schema projection →
  * watermark filter → upsert dedup → parquet landing → view model →
  * bookmark state advance — driven by the Orchestrator, twice, to prove
  * incremental semantics.
  */
class E2EPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val tasksSchemaJson = """{
    "type": "object",
    "additionalProperties": false,
    "properties": {
      "id": {"type": "string"},
      "accountId": {"type": ["null", "string"]},
      "title": {"type": ["null", "string"]},
      "status": {"type": ["null", "string"]},
      "importance": {"type": ["null", "string"]},
      "createdDate": {"type": ["null", "string"], "format": "date-time"},
      "updatedDate": {"type": ["null", "string"], "format": "date-time"},
      "completedDate": {"type": ["null", "string"], "format": "date-time"},
      "dates-start": {"type": ["null", "string"], "format": "date-time"},
      "dates-due": {"type": ["null", "string"], "format": "date-time"}
    }
  }"""

  /** Raw API-shaped rows: nested `dates` object, extra undeclared key. */
  private def rawBatch(updatedAfter: String): DataFrame = {
    val rows = Seq(
      ("""{"id":"t1","accountId":"a","title":"Big proposal","status":"Completed",
          "importance":"High","createdDate":"2024-01-01T00:00:00",
          "updatedDate":"2024-01-04T00:00:00",
          "completedDate":"2024-01-03T12:00:00",
          "dates":{"start":"2024-01-01T00:00:00","due":"2024-01-05T00:00:00"},
          "undeclared":"DROP ME"}"""),
      ("""{"id":"t2","accountId":"a","title":"Quote thing","status":"Completed",
          "importance":"Low","createdDate":"2024-01-01T00:00:00",
          "updatedDate":"2024-01-10T00:00:00",
          "completedDate":"2024-01-02T00:00:00",
          "dates":{"start":"2024-01-01T00:00:00","due":null},
          "undeclared":"DROP ME"}"""),
      // stale t1 version (earlier update) to be dropped by upsert dedup
      ("""{"id":"t1","accountId":"a","title":"Big proposal OLD","status":"Active",
          "importance":"High","createdDate":"2024-01-01T00:00:00",
          "updatedDate":"2024-01-02T00:00:00",
          "completedDate":null,
          "dates":{"start":"2024-01-01T00:00:00","due":"2024-01-05T00:00:00"},
          "undeclared":"DROP ME"}""")
    ).map(_.replaceAll("\n\\s*", ""))
    spark.read.json(rows.toDS())
      .filter(col("updatedDate") > lit(updatedAfter))
  }

  test("minimum slice: extract -> flatten -> project -> upsert -> view -> state") {
    val declared = JsonSchema.toStructType(tasksSchemaJson)
    val landing = Files.createTempDirectory("e2e").toString
    val statePath = Files.createTempDirectory("e2e-state").resolve("state.json")

    val job = Orchestrator.StreamJob(
      name = "tasks", tsCol = "updatedDate",
      extract = (_, bookmark) => {
        val raw = rawBatch(bookmark.getOrElse("1970-01-01T00:00:00"))
        val flat = Flatten.flatten(raw)
        val projected = Project.toDeclaredLenient(flat, declared.fieldNames.toSeq)
        Upsert.latestPerKey(projected, Seq("id"), "updatedDate")
      },
      sink = df => Sinks.writeParquet(df, s"$landing/tasks"),
      advanceToMaxSeen = true)

    // round 1
    val s1 = Orchestrator.runOnce(spark, Seq(
      Orchestrator.Pipeline("wrike", Seq(job))), Bookmarks.empty)
    Bookmarks.save(s1, statePath)

    val landed = spark.read.parquet(s"$landing/tasks")
    // upsert kept the latest t1 (Completed), dropped the stale Active one
    assert(landed.count() == 2)
    val t1 = landed.filter("id = 't1'").head()
    assert(t1.getAs[String]("status") == "Completed")
    // undeclared key projected away; flattened dates-* kept
    assert(!landed.columns.contains("undeclared"))
    assert(landed.columns.contains("dates-start"))

    // model layer over the landed table (dbt analog)
    val typed = landed
      .withColumn("createdDate", to_timestamp(col("createdDate")))
      .withColumn("completedDate", to_timestamp(col("completedDate")))
    Views.register(spark, "wrike", "tasks", typed)
    val durations = Views.proposalDurations(spark.table("wrike_tasks")).collect()
    assert(durations.map(_.getAs[String]("id")).toSeq == Seq("t1"))
    assert(durations.head.getAs[Double]("duration_days") == 2.5)

    // round 2: bookmark advanced to max updatedDate -> nothing re-extracted
    val reloaded = Bookmarks.load(statePath)
    assert(reloaded.get("wrike.tasks").exists(_.startsWith("2024-01-10")))
    // keep the bookmark in the same ISO-T shape the raw rows use — mixed
    // formats silently break string comparison (the reference's own
    // pitfall, SURVEY §7.4)
    val second = rawBatch(reloaded.get("wrike.tasks").get.replace("Z", "").take(19))
    assert(second.isEmpty)
  }

  test("upsert sink SQL path matches landed dedup semantics (K1)") {
    // the JDBC upsert is exercised to the SQL boundary: its batch-dedup
    // must agree with what round 1 landed
    val df = Seq(("t1", Timestamp.valueOf("2024-01-04 00:00:00"), "Completed"),
      ("t1", Timestamp.valueOf("2024-01-02 00:00:00"), "Active"))
      .toDF("id", "updatedDate", "status")
    val deduped = Upsert.latestPerKey(df, Seq("id"), "updatedDate")
    assert(deduped.count() == 1 &&
      deduped.head().getAs[String]("status") == "Completed")
    val sql = Sinks.upsertSql("wrike.tasks", "staging",
      df.columns.toSeq, Seq("id"))
    assert(sql.contains("ON CONFLICT (\"id\") DO UPDATE"))
  }
}
