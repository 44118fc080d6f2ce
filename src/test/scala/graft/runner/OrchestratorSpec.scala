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

  test("catalog round-trip drives selection: discover, patch, sync only selected") {
    var synced: Seq[String] = Nil
    def job(n: String) = Orchestrator.StreamJob(n, "ts",
      extract = (_, _) => events, sink = _ => synced :+= n,
      keyProperties = Seq("event_id"),
      schemaDdl = Some("event_id BIGINT, ts TIMESTAMP"))
    val p = Orchestrator.Pipeline("sys", Seq(job("a"), job("b"), job("c")))

    // discovery emits everything UNselected — nothing syncs yet
    val discovered = Catalog.discover(Seq(p))
    assert(discovered.entries.map(_.stream) == Seq("a", "b", "c"))
    assert(discovered.entries.forall(!_.selected))
    assert(discovered.entries.head.keyProperties == Seq("event_id"))
    Orchestrator.runOnce(spark, Seq(p), Bookmarks.empty,
      catalog = Some(discovered))
    assert(synced.isEmpty)

    // selection patch + file round-trip (the user-editable artifact)
    val path = Files.createTempDirectory("cat").resolve("catalog.json")
    Catalog.save(discovered.select(Seq("sys" -> "a", "sys" -> "c")), path)
    val loaded = Catalog.load(path)
    assert(loaded.isSelected("sys", "a") && loaded.isSelected("sys", "c"))
    assert(!loaded.isSelected("sys", "b"))
    assert(loaded.entries.head.schema == "event_id BIGINT, ts TIMESTAMP")

    val s = Orchestrator.runOnce(spark, Seq(p), Bookmarks.empty,
      catalog = Some(loaded))
    assert(synced.sorted == Seq("a", "c")) // b skipped
    assert(s.get("sys.a").isDefined && s.get("sys.b").isEmpty)
  }

  test("JSON-schema -> catalog -> projection: the declared-schema config path") {
    // the reference's path: a stream's schemas/<s>.json declares the shape,
    // the catalog carries it, the engine projects to it
    val schemaJson =
      """{"type": "object", "additionalProperties": false,
          "properties": {
            "event_id": {"type": ["null", "integer"]},
            "ts": {"type": ["null", "string"], "format": "date-time"}}}"""
    val declared = graft.schema.JsonSchema.toStructType(schemaJson)
    var projectedCols: Seq[String] = Nil
    val job = Orchestrator.StreamJob("e", "ts",
      extract = (_, _) => events.withColumn("extra",
        org.apache.spark.sql.functions.lit("drop-me")),
      sink = df => projectedCols = df.columns.toSeq,
      keyProperties = Seq("event_id"),
      schemaDdl = Some(declared.toDDL))
    val p = Orchestrator.Pipeline("sys", Seq(job))
    val cat = Catalog.discover(Seq(p)).select(Seq("sys" -> "e"))
    // the catalog's schema string round-trips to the declared StructType
    val fromCatalog = org.apache.spark.sql.types.StructType
      .fromDDL(cat.entries.head.schema)
    assert(fromCatalog == declared)
    // and a job projecting to it drops undeclared columns
    val projecting = job.copy(sink = df => projectedCols =
      graft.operators.Project.toDeclared(df, fromCatalog.fieldNames.toSeq)
        .columns.toSeq)
    Orchestrator.runOnce(spark, Seq(p.copy(jobs = Seq(projecting))),
      Bookmarks.empty, catalog = Some(cat))
    assert(projectedCols == Seq("event_id", "ts")) // extra dropped
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
