package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("riAudit (x176): counts rows, NULL keys and orphans per edge; " +
      "a fully-joined edge reads zero orphans") {
    val child = Seq(
      (Some(1L), "a"), (Some(1L), "b"), (Some(2L), "c"),
      (Some(9L), "orphan1"), (Some(9L), "orphan2"),
      (None, "nullkey")
    ).toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Warehouse.riAudit(Seq(
      Warehouse.RiEdge("child.fk", child, "fk", parent, "pk"),
      Warehouse.RiEdge("parent.self", parent, "pk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // 6 rows, 1 null key, 2 orphan rows (key 9 appears twice)
    assert(out("child.fk") === ((6L, 1L, 2L, 0.333333)))
    assert(out("parent.self") === ((3L, 0L, 0L, 0.0)))
  }

  test("riAudit: a parent with duplicate keys does not fan out the " +
      "child count (distinct-keys contract)") {
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pk") // dup parent keys
    val Array(r) = Warehouse.riAudit(Seq(
      Warehouse.RiEdge("e", child, "fk", parent, "pk"))).collect()
    assert(r.getLong(1) === 3L && r.getLong(3) === 0L)
  }

  test("cdcApply (x177): latest change per key wins, D drops the key, " +
      "U on an absent key inserts, untouched rows pass through") {
    val base = Seq((1L, "one", 10.0), (2L, "two", 20.0),
      (3L, "three", 30.0)).toDF("k", "name", "v")
    val changes = Seq(
      // key 1: U seq 1 then U seq 2 — seq 2 must win
      (1L, "one", 11.0, "U", 1L), (1L, "one", 12.0, "U", 2L),
      // key 2: deleted
      (2L, "two", 20.0, "D", 1L),
      // key 4: U on absent key — upsert inserts
      (4L, "four", 40.0, "U", 1L),
      // key 5: plain insert
      (5L, "five", 50.0, "I", 1L)
    ).toDF("k", "name", "v", "op", "seq")
    val out = Warehouse.cdcApply(base, changes, "k", "op", "seq")
    assert(out.columns.toSeq === Seq("k", "name", "v"))
    val got = out.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> (("one", 12.0)),   // latest update
      3L -> (("three", 30.0)), // untouched
      4L -> (("four", 40.0)),  // upsert-insert
      5L -> (("five", 50.0)))) // insert
  }

  test("cdcApply: a key whose latest op is D stays deleted even if an " +
      "earlier change re-inserted it") {
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val changes = Seq((1L, 2.0, "I", 1L), (1L, 3.0, "D", 2L))
      .toDF("k", "v", "op", "seq")
    assert(Warehouse.cdcApply(base, changes, "k", "op", "seq")
      .count() === 0L)
  }

  test("mergeRollup (x178): merging partial shards equals the rollup " +
      "of the union — counts/sums re-sum, min/max re-extremize") {
    val all = Seq(
      ("a", 1L, 100L, 1.0), ("a", 1L, 200L, 9.0), ("a", 2L, 50L, 5.0),
      ("b", 1L, 10L, 2.0), ("b", 1L, 20L, 0.5)
    ).toDF("g", "y", "u", "v")
    val shards = Seq(all.filter(col("u") < 100L),
      all.filter(col("u") >= 100L)).map(p =>
      Warehouse.rollupPartial(p, Seq("g", "y"), "u", "v"))
    val merged = Warehouse.mergeRollup(shards, Seq("g", "y"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDecimal(3).longValueExact(),
          r.getDouble(4), r.getDouble(5)))).toMap
    val full = Warehouse.rollupPartial(all, Seq("g", "y"), "u", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDecimal(3).longValueExact(),
          r.getDouble(4), r.getDouble(5)))).toMap
    assert(merged === full)
    assert(merged(("a", 1L)) === ((2L, 300L, 1.0, 9.0)))
  }

  test("keySkewAudit (x181): planted hot key ranks first with the " +
      "exact share; NULL keys are excluded; ties break by key") {
    val df = (Seq.fill(6)(Some(7L)) ++ Seq(Some(1L), Some(1L),
      Some(2L), Some(2L), None)).toDF("k")
    val out = Warehouse.keySkewAudit(df, "k", topK = 2)
      .orderBy(col("rank")).collect()
    assert(out.length === 2)
    assert(out(0).getLong(0) === 7L && out(0).getLong(1) === 6L &&
      out(0).getDouble(3) === 0.6)
    // 1 and 2 tie at two rows — key 1 wins rank 2
    assert(out(1).getLong(0) === 1L && out(1).getLong(1) === 2L &&
      out(1).getDouble(3) === 0.2)
  }

  test("latenessAudit (x193): lateness is measured per KEY timeline " +
      "against the running max event time in ARRIVAL order — a " +
      "delayed event is late by exactly the event-time it arrived " +
      "behind; in-order keys read zero") {
    val ev = Seq(
      // user 1: id2 (type b) delayed past ids 3 and 4 — when it
      // arrives the key's max seen event time is 400, its own is 200
      (1L, "a", 100L, 100L, 1L),
      (1L, "b", 200L, 500L, 2L),
      (1L, "a", 300L, 300L, 3L),
      (1L, "a", 400L, 400L, 4L),
      // user 2: fully in order -> contributes no lateness
      (2L, "a", 50L, 50L, 5L), (2L, "a", 60L, 60L, 6L)
    ).toDF("user_id", "event_type", "ms", "arr", "event_id")
    val out = Warehouse.latenessAudit(ev, "user_id", "event_type",
        "ms", "arr", "event_id").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(out("a") === ((5L, 0L, 0.0, 0L)))
    assert(out("b") === ((1L, 1L, 1.0, 200L)))
  }

  test("bucketChecksums (x195): identical tables produce identical " +
      "(count, digest) pairs in every bucket; one mutated payload " +
      "changes EXACTLY its key's bucket; a dropped row changes the " +
      "count too") {
    val base = (1L to 200L).map(i => (i, i * 3)).toDF("k", "v")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Warehouse.bucketChecksums(df, "k", Seq("v"), 16).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val b = sums(base)
    assert(sums(base) === b)   // deterministic
    // mutate key 7's payload: only 7's bucket digest moves, counts hold
    val mut = sums(base.withColumn("v",
      when(col("k") === 7L, lit(999L)).otherwise(col("v"))))
    val changed = b.keySet.filter(k => b(k) !== mut(k))
    assert(changed.size === 1)
    assert(b(changed.head)._1 === mut(changed.head)._1)
    // drop key 7: same single bucket, now count AND digest differ
    val dropped = sums(base.filter(col("k") =!= 7L))
    val changed2 = b.keySet.filter(k => b(k) !== dropped(k))
    assert(changed2 === changed)
    assert(dropped(changed2.head)._1 === b(changed2.head)._1 - 1)
  }

  test("latenessAudit: equal arrival times order by the id column — " +
      "the tie-break is deterministic") {
    // both events arrive at the same instant; id order puts the
    // later-timestamped one first, making the other late by 10
    val ev = Seq(
      (1L, "t", 110L, 500L, 1L),
      (1L, "t", 100L, 500L, 2L)
    ).toDF("user_id", "event_type", "ms", "arr", "event_id")
    val out = Warehouse.latenessAudit(ev, "user_id", "event_type",
      "ms", "arr", "event_id").collect()
    assert(out.head.getLong(2) === 1L)      // n_late
    assert(out.head.getLong(4) === 10L)     // max_lateness_ms
  }

  test("indexFreshnessAudit (x211): missing = corpus keys the index " +
      "lacks, stale = index keys the corpus lost, coverage on the grid") {
    val corpus = Seq(1L, 2L, 3L, 4L, 5L).toDF("k")
    val index = Seq(2L, 4L, 9L, 9L).toDF("k") // 9 stale, dup collapses
    val out = Warehouse.indexFreshnessAudit(Seq(
        ("leg", corpus, index),
        ("fresh", corpus, corpus)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(out("leg") === ((5L, 3L, 3L, 1L, 0.4)))
    assert(out("fresh") === ((5L, 5L, 0L, 0L, 1.0)))
  }

  test("compactIndex (x210): append x2 then compact == one file per " +
      "bucket, rows bit-identical, serve identical to one-shot build") {
    val li = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 3L), (13L, 1L), (13L, 2L), (14L, 2L), (14L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z"))
      .toDF("p_partkey", "p_brand")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val tabs = Seq("graft_idx_test.cp_ob", "graft_idx_test.cp_edges",
      "graft_idx_test.cp_totals", "graft_idx_test.cp_stats")
    val oneTabs = tabs.map(_ + "_one")
    (tabs ++ oneTabs).foreach(graft.sinks.Sinks.dropManaged(spark, _))
    val Seq(obT, edT, toT, stT) = tabs
    val Seq(obO, edO, toO, stO) = oneTabs
    // two disjoint complete-order ingests vs the one-shot build
    Graph.writeEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 0),
      part, obT, edT, toT, stT, numBuckets = 2)
    Graph.appendEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 1),
      part, obT, edT, toT, stT, numBuckets = 2)
    Graph.writeEdgeIndex(li, part, obO, edO, toO, stO, numBuckets = 2)

    def audit() = Warehouse.indexFileAudit(spark,
        Seq("ob" -> obT, "edges" -> edT, "totals" -> toT, "stats" -> stT))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val before = audit()
    // two ingests: more files than buckets on the bucketed tables
    assert(before("ob")._2 > before("ob")._1)
    assert(before("stats")._3 === 2L) // one partial row per ingest

    val rowsBefore = tabs.map(t => spark.table(t).collect().map(_.toSeq).toSet)
    tabs.foreach(Warehouse.compactIndex(spark, _))
    val after = audit()
    assert(after("ob") === ((2L, 2L, before("ob")._3)))
    assert(after("edges") === ((2L, 2L, before("edges")._3)))
    assert(after("totals")._2 === 1L && after("stats")._2 === 1L)
    // rows bit-identical (compaction moves bytes, never merges)
    tabs.zip(rowsBefore).foreach { case (t, r) =>
      assert(spark.table(t).collect().map(_.toSeq).toSet === r, t)
    }
    // serve identical to the one-shot build
    val (_, e1, t1, s1) = Graph.readEdgeIndex(spark, obT, edT, toT, stT)
    val (_, e2, t2, s2) = Graph.readEdgeIndex(spark, obO, edO, toO, stO)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(e1) === rows(e2))
    assert(rows(t1) === rows(t2))
    assert(rows(s1) === rows(s2))
    assert(rows(Graph.pageRank(e1)) === rows(Graph.pageRank(e2)))
  }

  test("deleteFromIndex (x214): anti-join rewrite through the table's " +
      "own bucket layout — stale keys gone, table rows equal a " +
      "from-scratch rebuild on the reduced corpus, files <= buckets, " +
      "freshness n_stale -> 0") {
    import org.apache.spark.sql.functions.{col, lower, pmod, lit, sha2, trim}
    val docs = (0L until 30L).map(i => (i, s"document text $i"))
      .toDF("doc_id", "text")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val idx = "graft_idx_test.del_digests"
    val reb = "graft_idx_test.del_digests_reb"
    Seq(idx, reb).foreach(graft.sinks.Sinks.dropManaged(spark, _))
    // index built on the EVEN ids; the current snapshot keeps %3 == 0
    graft.operators.TextDedup.writeDigestIndex(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", idx,
      numBuckets = 2)
    val snapshot = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val snapKeys = snapshot
      .select(sha2(lower(trim(col("text"))), 256).as("k"))
    def freshness() = Warehouse.indexFreshnessAudit(Seq(("digest",
        snapKeys, spark.table(idx).select(col("digest")))))
      .collect().head
    assert(freshness().getLong(4) > 0L, "fixture must start stale")
    val stale = spark.table(idx).select(col("digest"))
      .join(snapKeys.select(col("k").as("digest")), Seq("digest"),
        "left_anti")
    Warehouse.deleteFromIndex(spark, idx, "digest", stale)
    assert(freshness().getLong(4) === 0L, "post-delete stale must be 0")
    // bit-identical to the from-scratch rebuild on even ∩ snapshot
    graft.operators.TextDedup.writeDigestIndex(
      docs.filter(pmod(col("doc_id"), lit(6)) === 0), "text", reb,
      numBuckets = 2)
    assert(spark.table(idx).collect().map(_.toSeq).toSet ===
      spark.table(reb).collect().map(_.toSeq).toSet)
    val audit = Warehouse.indexFileAudit(spark, Seq(("d", idx)))
      .collect().head
    assert(audit.getLong(2) <= audit.getLong(1),
      "the delete rewrite is also a compaction: files <= buckets")
    Seq(idx, reb).foreach(graft.sinks.Sinks.dropManaged(spark, _))
  }

  test("indexPartialAudit (x213): rows-per-key reads append partials " +
      "exactly; 1.0 on a fully-merged table") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val t = "graft_idx_test.pa_counts"
    graft.sinks.Sinks.dropManaged(spark, t)
    val part1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
    val part2 = Seq(("a", 3L), ("c", 1L)).toDF("k", "n")
    graft.sinks.Sinks.writeBucketed(part1, t, Seq("k"), 2)
    graft.sinks.Sinks.writeBucketed(part2, t, Seq("k"), 2, append = true)
    val r = Warehouse.indexPartialAudit(spark, Seq(("c", t, Seq("k"))))
      .collect().head
    // 4 rows over 3 keys: a twice, b and c once
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((4L, 3L, 1.333333)))
    val merged = spark.table(t).groupBy(col("k"))
      .agg(org.apache.spark.sql.functions.sum(col("n")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("k", "n") // materialized BEFORE the drop re-creates below
    graft.sinks.Sinks.dropManaged(spark, t)
    graft.sinks.Sinks.writeBucketed(merged, t, Seq("k"), 2)
    assert(Warehouse.indexPartialAudit(spark, Seq(("c", t, Seq("k"))))
      .collect().head.getDouble(3) === 1.0)
    graft.sinks.Sinks.dropManaged(spark, t)
  }

  test("indexFreshnessAuditBucketed (x215): identical counts to the " +
      "exact full-outer path on mixed fresh/stale/missing legs, at " +
      "bucket counts above and below the key cardinality") {
    val corpus = Seq(1L, 2L, 3L, 4L, 5L).toDF("k")
    val index = Seq(2L, 4L, 9L, 9L).toDF("k")
    val legs = Seq(("leg", corpus, index), ("fresh", corpus, corpus))
    val exact = Warehouse.indexFreshnessAudit(legs)
      .collect().map(_.toSeq).toSet
    for (b <- Seq(2, 64)) {
      assert(Warehouse.indexFreshnessAuditBucketed(legs, numBuckets = b)
        .collect().map(_.toSeq).toSet === exact, s"numBuckets=$b")
    }
  }

  test("recoverIndex heals a torn compaction swap: live table missing " +
      "with _compact_new present -> rename finishes, rows and bucket " +
      "spec intact; a no-op when the live table is healthy") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val table = "graft_idx_test.torn_swap"
    val newT = table + "_compact_new"
    Seq(table, newT).foreach(graft.sinks.Sinks.dropManaged(spark, _))
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    graft.sinks.Sinks.writeBucketed(rows, table, Seq("k"), 2)
    assert(!Warehouse.recoverIndex(spark, table),
      "healthy table must not trigger recovery")
    // simulate the crash window: compacted copy written, live dropped,
    // process died before the RENAME
    graft.sinks.Sinks.writeBucketed(spark.table(table), newT, Seq("k"), 2)
    spark.sql(s"DROP TABLE $table")
    assert(Warehouse.recoverIndex(spark, table))
    assert(spark.table(table).collect().map(_.toSeq).toSet ===
      rows.collect().map(_.toSeq).toSet)
    assert(spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.exists(_.numBuckets == 2),
      "recovered table must keep the compacted bucket spec")
    assert(!spark.catalog.tableExists(newT))
    // compactIndex itself runs recovery first: tear it again, compact
    graft.sinks.Sinks.writeBucketed(spark.table(table), newT, Seq("k"), 2)
    spark.sql(s"DROP TABLE $table")
    Warehouse.compactIndex(spark, table)
    assert(spark.table(table).collect().map(_.toSeq).toSet ===
      rows.collect().map(_.toSeq).toSet)
    graft.sinks.Sinks.dropManaged(spark, table)
  }

  test("recoverIndex drops a leftover _compact_old aside copy (crash " +
      "before the rename-aside swap's final drop) — the live table is " +
      "already whole in every state that leaves one") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val table = "graft_idx_test.torn_old"
    val oldT = table + "_compact_old"
    Seq(table, oldT).foreach(graft.sinks.Sinks.dropManaged(spark, _))
    val rows = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    graft.sinks.Sinks.writeBucketed(rows, table, Seq("k"), 2)
    // simulate: swap renamed the previous live copy aside, renamed the
    // new one in, died before dropping the aside copy
    rows.write.format("parquet").saveAsTable(oldT)
    assert(Warehouse.recoverIndex(spark, table))
    assert(!spark.catalog.tableExists(oldT))
    assert(spark.table(table).collect().map(_.toSeq).toSet ===
      rows.collect().map(_.toSeq).toSet)
    graft.sinks.Sinks.dropManaged(spark, table)
  }

  test("indexFreshnessAudit: an EMPTY corpus leg reports coverage 1.0 " +
      "(vacuously covered), not NaN — in both audit forms") {
    val corpus = Seq.empty[Long].toDF("k")
    val index = Seq(1L, 2L).toDF("k")
    for ((form, df) <- Seq(
        ("exact", Warehouse.indexFreshnessAudit(
          Seq(("empty", corpus, index)))),
        ("bucketed", Warehouse.indexFreshnessAuditBucketed(
          Seq(("empty", corpus, index)))))) {
      val r = df.collect().head
      assert(r.getLong(1) === 0L && r.getLong(4) === 2L, form)
      assert(r.getDouble(5) === 1.0, s"$form coverage must be total")
    }
  }

  test("deleteFromIndexVersioned + compactIndexVersioned: pointer flips " +
      "with one ledger append, replays are no-ops, an in-flight reader " +
      "of the old snapshot is never raced, retire reclaims it") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val ledger = "graft_idx_test.vw_ledger"
    val base = "graft_idx_test.vw_idx"
    (Seq(ledger, base) ++ (1 to 4).map(v => s"${base}_v$v"))
      .foreach(graft.sinks.Sinks.dropManaged(spark, _))
    val rows0 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    graft.sinks.Sinks.writeBucketed(rows0, base, Seq("k"), 2)
    // v0 = the unversioned base: versioned ops migrate it in place
    val keys = Seq(3L, 4L).toDF("k")
    assert(Warehouse.deleteFromIndexVersioned(spark, ledger, "vw", base,
      "k", keys))
    // replay of the same key set: ledger no-op
    assert(!Warehouse.deleteFromIndexVersioned(spark, ledger, "vw", base,
      "k", keys))
    val cur = graft.operators.Snapshots.resolve(spark, ledger, "vw",
      Seq(base)).head
    assert(cur === base + "_v1")
    assert(spark.table(cur).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
    // the base (v0) table still holds the old snapshot for in-flight
    // readers; retire with keepVersions=1 must NOT touch v0 (it is the
    // unversioned base, reclaimed by the owner, not the protocol)
    assert(spark.table(base).count() === 4L)
    // a compaction publishes v2; v1 retires afterward
    assert(Warehouse.compactIndexVersioned(spark, ledger, "vw", base))
    val dropped = graft.operators.Snapshots.retire(spark, ledger, "vw",
      Seq(base), keepVersions = 1)
    assert(dropped.contains(1L))
    assert(!spark.catalog.tableExists(base + "_v1"))
    assert(spark.table(graft.operators.Snapshots.resolve(spark, ledger,
        "vw", Seq(base)).head)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    (Seq(ledger, base) ++ (1 to 4).map(v => s"${base}_v$v"))
      .foreach(graft.sinks.Sinks.dropManaged(spark, _))
  }
}
