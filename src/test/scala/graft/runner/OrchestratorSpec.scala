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

  test("loop + maintenance: a multi-cycle run ends compacted AND fresh " +
      "with no manual calls — stale deleted, missing appended after " +
      "every ingest, partials deep-merged, file layout compacted (the " +
      "scheduler's per-cycle dbt-maintenance analog)") {
    import org.apache.spark.sql.functions.{col, lit, lower, pmod, sha2, trim}
    import graft.operators.{Graph, Warehouse}
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val landT = "graft_idx_test.m_docs"
    val digT = "graft_idx_test.m_digests"
    val et = Seq("graft_idx_test.m_ob", "graft_idx_test.m_edges",
      "graft_idx_test.m_totals", "graft_idx_test.m_stats")
    (Seq(landT, digT) ++ et).foreach(graft.sinks.Sinks.dropManaged(spark, _))
    // bootstrap: the landing corpus holds one seed doc; the digest
    // index additionally holds a PHANTOM digest (a prior takedown the
    // index never heard about) — cycle 1 must delete it
    Seq((0L, "seed doc")).toDF("doc_id", "text")
      .write.format("parquet").saveAsTable(landT)
    graft.operators.TextDedup.writeDigestIndex(
      spark.table(landT).unionByName(
        Seq((99L, "stale text")).toDF("doc_id", "text")),
      "text", digT, numBuckets = 2)
    // edge index seeded with two disjoint ingests: partial rows the
    // cycle's deep merge must fold
    val li = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L), (13L, 1L), (13L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z"))
      .toDF("p_partkey", "p_brand")
    val Seq(obT, edT, toT, stT) = et
    Graph.writeEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 0),
      part, obT, edT, toT, stT, numBuckets = 2)
    Graph.appendEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 1),
      part, obT, edT, toT, stT, numBuckets = 2)

    val digests = (df: DataFrame) =>
      df.select(sha2(lower(trim(col("text"))), 256).as("k"))
    val maintained = Seq(
      MaintainedIndex("digests",
        tables = Seq(("digests", digT, Seq.empty)),
        corpusKeys = s => digests(s.table(landT)),
        indexKeys = s => s.table(digT).select(col("digest")),
        appendMissing = Some((s, keys) => graft.sinks.Sinks.writeBucketed(
          keys.toDF("digest"), digT, Seq("digest"), 2, append = true)),
        deleteStale = Some((s, keys) =>
          Warehouse.deleteFromIndex(s, digT, "digest", keys))),
      MaintainedIndex("edges",
        tables = Seq(("ob", obT, Seq("order_key", "brand")),
          ("edges", edT, Seq("src", "dst")),
          ("totals", toT, Seq("brand")), ("stats", stT, Seq.empty)),
        corpusKeys = s => li.select(col("l_orderkey")).distinct(),
        indexKeys = s => s.table(obT).select(col("order_key")).distinct(),
        merge = Some(s => Graph.mergeEdgeIndex(s, obT, edT, toT, stT))))

    // three cycles, each landing two new docs BEFORE maintenance runs
    var round = 0
    val job = Orchestrator.StreamJob("docs", "ts",
      extract = (s, _) => {
        round += 1
        Seq((round * 10L + 1, s"doc ${round}a"),
          (round * 10L + 2, s"doc ${round}b")).toDF("doc_id", "text")
      },
      sink = df => df.write.mode("append").format("parquet")
        .saveAsTable(landT))
    val statePath = Files.createTempDirectory("morch").resolve("state.json")
    Orchestrator.loop(spark,
      Seq(Orchestrator.Pipeline("sys", Seq(job))), statePath,
      intervalMillis = 0, rounds = 3, maintenance = maintained)

    // fresh: every landed doc indexed, the phantom digest gone
    val fresh = Warehouse.indexFreshnessAudit(Seq(("d",
        digests(spark.table(landT)),
        spark.table(digT).select(col("digest"))))).collect().head
    assert(fresh.getLong(3) === 0L, "missing after the loop")
    assert(fresh.getLong(4) === 0L, "stale after the loop")
    // compacted: three append cycles, still <= one file per bucket
    val files = Warehouse.indexFileAudit(spark, Seq(("d", digT)))
      .collect().head
    assert(files.getLong(2) <= files.getLong(1),
      s"files ${files.getLong(2)} > buckets after maintenance")
    // deep-merged: the additive tables are back to one row per key
    val worst = Warehouse.indexPartialAudit(spark,
        Seq(("e", edT, Seq("src", "dst")), ("t", toT, Seq("brand"))))
      .collect().map(_.getDouble(3)).max
    assert(worst === 1.0, "edge partials not folded")
    // steady state: one more cycle repairs NOTHING (audit rows only)
    val log = Maintenance.runCycle(spark, maintained)
    assert(log.forall(_.action == "audit"), log.mkString("; "))
    assert(log.forall(_.detail == "missing=0 stale=0"), log.mkString("; "))
    (Seq(landT, digT) ++ et).foreach(graft.sinks.Sinks.dropManaged(spark, _))
  }
}
