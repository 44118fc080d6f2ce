package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("coPurchaseEdges: distinct (order, brand) first — duplicate " +
      "lines collapse; both directions emitted; weight = co-orders") {
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 2L), // o10: X, Y (Y twice -> once)
      (11L, 1L), (11L, 2L),            // o11: X, Y
      (12L, 1L), (12L, 3L),            // o12: X, Z
      (13L, 3L)                        // o13: Z alone -> no edge
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z"))
      .toDF("p_partkey", "p_brand")
    val edges = Graph.coPurchaseEdges(li, part).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(edges === Map(
      ("X", "Y") -> 2L, ("Y", "X") -> 2L,
      ("X", "Z") -> 1L, ("Z", "X") -> 1L))
  }

  test("pageRank (x188): one hand-computed integer round on the path " +
      "graph a-b-c — floors and damping land on the exact units") {
    val edges = Seq(
      ("a", "b", 1L), ("b", "a", 1L),
      ("b", "c", 1L), ("c", "b", 1L)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, iterations = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = 3: pr0 = 1e9 div 3 = 333333333; base = 15e9 div 300 = 5e7.
    // shares: a->b 1e9, b->a 5e8, b->c 5e8, c->b 1e9.
    // acc(a) = (333333333 * 5e8) div 1e9 = 166666666
    //   pr(a) = 5e7 + (85 * 166666666) div 100 = 50000000 + 141666666
    // acc(b) = (333333333 * 1e9) div 1e9 * 2 = 666666666
    //   pr(b) = 5e7 + (85 * 666666666) div 100 = 50000000 + 566666666
    assert(pr("a") === 191666666L)
    assert(pr("c") === 191666666L)
    assert(pr("b") === 616666666L)
    // mass conservation up to floor losses: ≤ 1 unit per term per round
    assert(math.abs(pr.values.sum - Graph.Unit) < 10L)
  }

  test("affinityEdges: keeps only pairs ABOVE independence — the " +
      "exact integer lift cut cb*N > cu1*cu2, both directions") {
    // baskets: o1{X,Y} o2{X,Y} o3{X,Z} o4{Z}: N=4, cu X=3 Y=2 Z=2.
    // XY: 2*4=8 > 3*2=6 -> keep. XZ: 1*4=4 > 3*2=6 fails -> drop.
    val li = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L), (4L, 30L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((10L, "X"), (20L, "Y"), (30L, "Z"))
      .toDF("p_partkey", "p_brand")
    val edges = Graph.affinityEdges(li, part).collect()
      .map(r => (r.getString(1), r.getString(0)) -> r.getLong(2)).toMap
    assert(edges === Map(("X", "Y") -> 2L, ("Y", "X") -> 2L))
  }

  test("labelPropagation (x190): ties adopt the SMALLEST label — one " +
      "deterministic round on an equal-weight path") {
    val path = Seq(("a", "b", 1L), ("b", "a", 1L),
      ("a", "c", 1L), ("c", "a", 1L)).toDF("src", "dst", "w")
    val lbl = Graph.labelPropagation(path, rounds = 1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // a's neighbors b and c tie at w=1 -> smallest label "b"
    assert(lbl("a") === "b")
    assert(lbl("b") === "a" && lbl("c") === "a")
  }

  test("labelPropagation: two triangles over a weak bridge settle " +
      "into TWO communities after 3 rounds") {
    def tri(ns: Seq[String], w: Long) = for {
      s <- ns; d <- ns if s != d
    } yield (s, d, w)
    val edges = (tri(Seq("a", "b", "c"), 2L) ++ tri(Seq("x", "y", "z"), 2L)
      ++ Seq(("c", "x", 1L), ("x", "c", 1L))).toDF("src", "dst", "w")
    val lbl = Graph.labelPropagation(edges, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(lbl("a") === lbl("b") && lbl("b") === lbl("c"))
    assert(lbl("x") === lbl("y") && lbl("y") === lbl("z"))
    assert(lbl("a") !== lbl("x"))
  }

  test("triangleStats (x192): square + one diagonal — exact per-node " +
      "triangle counts, degrees, and 1e-6-grid coefficients") {
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"),
      ("a", "c"))
    val edges = (und ++ und.map(_.swap)).map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "w")
    val out = Graph.triangleStats(edges).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") === ((3L, 2L, 0.666667)))
    assert(out("b") === ((2L, 1L, 1.0)))
    assert(out("c") === ((3L, 2L, 0.666667)))
    assert(out("d") === ((2L, 1L, 1.0)))
  }

  test("triangleStats: a degree-1 node has NULL coefficient and zero " +
      "triangles") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val out = Graph.triangleStats(edges).collect()
    assert(out.forall(r => r.getLong(2) === 0L && r.isNullAt(3)))
  }

  test("pageRank: symmetric positions earn EQUAL integer ranks and " +
      "the hub outranks the leaves after 3 rounds") {
    val star = Seq(
      ("hub", "l1", 1L), ("l1", "hub", 1L),
      ("hub", "l2", 1L), ("l2", "hub", 1L),
      ("hub", "l3", 1L), ("l3", "hub", 1L)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(star, iterations = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("l1") === pr("l2") && pr("l2") === pr("l3"))
    assert(pr("hub") > pr("l1"))
  }

  // ---- persisted edge index ------------------------------------------

  /** Shared fixture for the index tests: 6 orders over brands X/Y/Z,
    * one line whose part has no dictionary row (order 15) — so
    * n_orders (7, from lineitem) differs from n_baskets (6, from the
    * collapsed frame), pinning the two denominators apart. */
  private def fixture = {
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 2L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 3L),
      (13L, 1L), (13L, 2L),
      (14L, 2L), (14L, 3L),
      (15L, 99L), // no part row -> order counts in n_orders only
      (16L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z"))
      .toDF("p_partkey", "p_brand")
    (li, part)
  }

  private def dropIdx(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get("spark-warehouse",
      name.split('.')(0) + ".db", name.split('.')(1))
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private val idxTables = Seq("graft_idx_test.eg_ob",
    "graft_idx_test.eg_edges", "graft_idx_test.eg_totals",
    "graft_idx_test.eg_stats")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("edge index round-trip: every served graph twin returns " +
      "IDENTICAL rows to its corpus-path form — zero corpus scans") {
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    idxTables.foreach(dropIdx)
    val Seq(obT, edT, toT, stT) = idxTables
    Graph.writeEdgeIndex(li, part, obT, edT, toT, stT, numBuckets = 2)
    val (ob, edges, totals, stats) =
      Graph.readEdgeIndex(spark, obT, edT, toT, stT)

    // stats pins the two denominators apart
    val st = stats.collect().head
    assert(st.getLong(0) === 6L && st.getLong(1) === 7L)

    assert(rows(edges) === rows(Graph.coPurchaseEdges(li, part)))
    assert(rows(Graph.pageRank(edges)) ===
      rows(Graph.pageRank(Graph.coPurchaseEdges(li, part))))
    val affIdx = Graph.affinityEdgesFrom(edges, totals, stats)
    assert(rows(affIdx) === rows(Graph.affinityEdges(li, part)))
    assert(rows(Graph.labelPropagation(affIdx)) ===
      rows(Graph.labelPropagation(Graph.affinityEdges(li, part))))
    assert(rows(Graph.triangleStats(affIdx)) ===
      rows(Graph.triangleStats(Graph.affinityEdges(li, part))))
    assert(rows(Analytics.frequentTriplesIndexed(ob, stats,
        minCount = 2, topK = 10)) ===
      rows(Analytics.frequentTriples(li, part, minCount = 2, topK = 10)))
    assert(rows(Analytics.brandRecommendationsIndexed(edges, totals,
        stats, minCount = 2, k = 2)) ===
      rows(Analytics.brandRecommendations(li, part, minCount = 2, k = 2)))
    assert(rows(Analytics.basketAffinityIndexed(edges, totals, stats,
        minCount = 2)) ===
      rows(Analytics.basketAffinity(li, part, minCount = 2)))
  }

  test("appendEdgeIndex additivity: disjoint complete-order ingests " +
      "merge to the one-shot build's exact frames") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    idxTables.foreach(dropIdx)
    val Seq(obT, edT, toT, stT) = idxTables
    Graph.writeEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 0),
      part, obT, edT, toT, stT, numBuckets = 2)
    Graph.appendEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 1),
      part, obT, edT, toT, stT, numBuckets = 2)
    val (ob, edges, totals, stats) =
      Graph.readEdgeIndex(spark, obT, edT, toT, stT)
    assert(rows(ob) === rows(Graph.orderBrands(li, part)))
    assert(rows(edges) === rows(Graph.coPurchaseEdges(li, part)))
    val obAll = Graph.orderBrands(li, part)
    assert(rows(totals) === rows(Graph.brandTotals(obAll)))
    assert(rows(stats) === rows(Graph.basketStats(li, obAll)))
  }

  test("deleteFromEdgeIndex (x214): negated partials + basket anti-join " +
      "serve rows bit-identical to a from-scratch rebuild of the " +
      "reduced corpus — incl. an edge cancelled to ZERO — and " +
      "mergeEdgeIndex folds the tombstones away (partial audit -> 1.0)") {
    import org.apache.spark.sql.functions.col
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val dt = Seq("graft_idx_test.dd_ob", "graft_idx_test.dd_edges",
      "graft_idx_test.dd_totals", "graft_idx_test.dd_stats")
    val rt = dt.map(_ + "_reb")
    (dt ++ rt).foreach(dropIdx)
    val Seq(obT, edT, toT, stT) = dt
    val Seq(obR, edR, toR, stR) = rt
    Graph.writeEdgeIndex(li, part, obT, edT, toT, stT, numBuckets = 2)
    // delete orders 11 {X,Y,Z} and 14 {Y,Z}: the ONLY two orders
    // carrying the Y-Z pair, so that edge's merged count cancels to
    // exactly zero — the read-side drop law
    val deleted = li.filter(col("l_orderkey").isin(11L, 14L))
    Graph.deleteFromEdgeIndex(deleted, part, obT, edT, toT, stT)
    Graph.writeEdgeIndex(li.filter(!col("l_orderkey").isin(11L, 14L)),
      part, obR, edR, toR, stR, numBuckets = 2)
    val (ob1, e1, t1, s1) = Graph.readEdgeIndex(spark, obT, edT, toT, stT)
    val (ob2, e2, t2, s2) = Graph.readEdgeIndex(spark, obR, edR, toR, stR)
    assert(rows(ob1) === rows(ob2))
    assert(rows(e1) === rows(e2))
    assert(!rows(e1).exists(r => r.take(2).toSet == Set("Y", "Z")),
      "the fully-deleted Y-Z edge must not serve")
    assert(rows(t1) === rows(t2))
    assert(rows(s1) === rows(s2))
    assert(rows(Graph.pageRank(e1)) === rows(Graph.pageRank(e2)))
    // tombstone rows are physical until the deep merge: the partial
    // audit reads > 1 row per key, then exactly 1.0 after the fold —
    // and the folded TABLE equals the rebuild's table, key for key
    val audit = () => graft.operators.Warehouse.indexPartialAudit(spark,
        Seq(("edges", edT, Seq("src", "dst"))))
      .collect().head.getDouble(3)
    assert(audit() > 1.0)
    Graph.mergeEdgeIndex(spark, obT, edT, toT, stT)
    dt.foreach(spark.catalog.refreshTable)
    assert(audit() === 1.0)
    assert(rows(spark.table(edT)) === rows(spark.table(edR)))
    assert(rows(spark.table(obT)) === rows(spark.table(obR)))
  }

  test("mergeEdgeIndex: append partials fold to the one-shot build's " +
      "EXACT table rows (not just serve), one file per bucket") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val mt = Seq("graft_idx_test.mg_ob", "graft_idx_test.mg_edges",
      "graft_idx_test.mg_totals", "graft_idx_test.mg_stats")
    val ot = mt.map(_ + "_one")
    (mt ++ ot).foreach(dropIdx)
    val Seq(obT, edT, toT, stT) = mt
    val Seq(obO, edO, toO, stO) = ot
    Graph.writeEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 0),
      part, obT, edT, toT, stT, numBuckets = 2)
    Graph.appendEdgeIndex(li.filter(pmod(col("l_orderkey"), lit(2)) === 1),
      part, obT, edT, toT, stT, numBuckets = 2)
    Graph.writeEdgeIndex(li, part, obO, edO, toO, stO, numBuckets = 2)
    // before the merge: partial rows (stats holds one row per ingest)
    assert(spark.table(stT).count() === 2L)
    Graph.mergeEdgeIndex(spark, obT, edT, toT, stT)
    mt.foreach(spark.catalog.refreshTable)
    // after: TABLE rows equal the one-shot build's, key for key
    mt.zip(ot).foreach { case (m, o) =>
      assert(rows(spark.table(m)) === rows(spark.table(o)), m)
    }
    // layout: one file per bucket / per sidecar
    val audit = graft.operators.Warehouse.indexFileAudit(spark,
        mt.map(t => t -> t))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(audit(obT) === ((2L, 2L)) && audit(edT) === ((2L, 2L)))
    assert(audit(toT)._2 === 1L && audit(stT)._2 === 1L)
    // and the served operator is untouched
    val (_, e1, _, _) = Graph.readEdgeIndex(spark, obT, edT, toT, stT)
    val (_, e2, _, _) = Graph.readEdgeIndex(spark, obO, edO, toO, stO)
    assert(rows(Graph.pageRank(e1)) === rows(Graph.pageRank(e2)))
  }

  // ---- versioned (publish-by-pointer) edge index -----------------------

  private val vdBases = Seq("graft_idx_test.vd_ob", "graft_idx_test.vd_edges",
    "graft_idx_test.vd_totals", "graft_idx_test.vd_stats")

  private def dropVersioned(ledger: String, bases: Seq[String]): Unit = {
    dropIdx(ledger)
    (bases ++ bases.flatMap(b => (1 to 4).map(v => s"${b}_v$v")))
      .foreach(dropIdx)
  }

  test("deleteFromEdgeIndexVersioned (x216): killed at EVERY step " +
      "boundary, the current snapshot serves complete and untouched; " +
      "the rerun converges bit-identical to a from-scratch rebuild; a " +
      "post-publish replay is a logged no-op") {
    import org.apache.spark.sql.functions.col
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val ledger = "graft_idx_test.vd_ledger"
    val rb = vdBases.map(_ + "_reb")
    dropVersioned(ledger, vdBases)
    rb.foreach(dropIdx)
    val Seq(obB, edB, toB, stB) = vdBases
    assert(Graph.writeEdgeIndexVersioned(li, part, ledger, "vd",
      obB, edB, toB, stB, numBuckets = 2))
    val preDelete = rows(Graph.readEdgeIndexVersioned(spark, ledger, "vd",
      obB, edB, toB, stB)._2)
    val deleted = li.filter(col("l_orderkey").isin(11L, 14L))
    // the truth: a from-scratch one-shot build of the reduced corpus
    val Seq(obR, edR, toR, stR) = rb
    Graph.writeEdgeIndex(li.filter(!col("l_orderkey").isin(11L, 14L)),
      part, obR, edR, toR, stR, numBuckets = 2)
    val (obE, eE, tE, sE) = Graph.readEdgeIndex(spark, obR, edR, toR, stR)

    // kill after each staging write: nothing is visible — the pointer
    // still resolves the pre-delete snapshot, complete and untouched
    Seq("edges", "totals", "stats", "ob").foreach { s =>
      val ex = intercept[IllegalStateException] {
        Graph.deleteFromEdgeIndexVersioned(deleted, part, ledger, "vd",
          obB, edB, toB, stB, crashAfterStep = Some(s))
      }
      assert(ex.getMessage.contains(s))
      val (obNow, eNow, tNow, sNow) = Graph.readEdgeIndexVersioned(spark,
        ledger, "vd", obB, edB, toB, stB)
      assert(rows(eNow) === preDelete, s"torn serve after crash at $s")
      assert(rows(sNow).head.head === 6L, s"stats torn after crash at $s")
    }
    // kill right after the commit point: the delete IS applied
    intercept[IllegalStateException] {
      Graph.deleteFromEdgeIndexVersioned(deleted, part, ledger, "vd",
        obB, edB, toB, stB, crashAfterStep = Some("publish"))
    }
    // ... and the post-crash rerun (the natural recovery) is a ledger
    // no-op, NOT a double-subtract
    assert(!Graph.deleteFromEdgeIndexVersioned(deleted, part, ledger,
      "vd", obB, edB, toB, stB))
    // served rows AND physical table rows are bit-identical to the
    // from-scratch rebuild (the staged tables land fully merged)
    val (obV, eV, tV, sV) = Graph.readEdgeIndexVersioned(spark, ledger,
      "vd", obB, edB, toB, stB)
    assert(rows(obV) === rows(obE))
    assert(rows(eV) === rows(eE))
    assert(!rows(eV).exists(r => r.take(2).toSet == Set("Y", "Z")),
      "the fully-deleted Y-Z edge must not serve")
    assert(rows(tV) === rows(tE))
    assert(rows(sV) === rows(sE))
    val (_, edT2, _, _) = Graph.resolveEdgeIndex(spark, ledger, "vd",
      obB, edB, toB, stB)
    assert(edT2 === edB + "_v2")
    assert(rows(spark.table(edT2)) === rows(spark.table(edR)))
    // the ledger records exactly one build and one delete — the replay
    // and every killed attempt left no row
    val lg = graft.operators.Snapshots.ledger(spark, ledger, "vd")
      .collect().map(r => (r.getLong(1), r.getString(3))).toSet
    assert(lg === Set((1L, "build"), (2L, "delete")))
  }

  test("deleteFromEdgeIndexVersioned alias guard: delete -> re-ingest " +
      "-> direct identical delete THROWS AliasedBatchId pointing at " +
      "the salted capture path; replay of the original batch (keys " +
      "gone) still no-ops; the captured salted id applies cleanly") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Snapshots
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val ledger = "graft_idx_test.vg_ledger"
    val bases = Seq("ob", "edges", "totals", "stats")
      .map(n => s"graft_idx_test.vg_$n")
    dropVersioned(ledger, bases)
    val Seq(obB, edB, toB, stB) = bases
    assert(Graph.writeEdgeIndexVersioned(li, part, ledger, "vg",
      obB, edB, toB, stB, numBuckets = 2))
    val deleted = li.filter(col("l_orderkey").isin(11L, 14L))
    assert(Graph.deleteFromEdgeIndexVersioned(deleted, part, ledger,
      "vg", obB, edB, toB, stB))
    // genuine replay — keys gone from the snapshot — stays a quiet
    // no-op (the x216 recovery contract is untouched)
    assert(!Graph.deleteFromEdgeIndexVersioned(deleted, part, ledger,
      "vg", obB, edB, toB, stB))
    // re-ingest the same orders (the ingest feed carries its own id —
    // the content digest would alias the delete's ledger row too)
    assert(Graph.appendEdgeIndexVersionedStaged(deleted, part, ledger,
      "vg", obB, edB, toB, stB, batchId = Some("reingest-1")))
    // the direct identical delete recomputes the SAME content id while
    // the keys are served again: undecidable -> loud
    val ex = intercept[Snapshots.AliasedBatchId] {
      Graph.deleteFromEdgeIndexVersioned(deleted, part, ledger, "vg",
        obB, edB, toB, stB)
    }
    assert(ex.getMessage.contains("deleteFromLandingWithCapture"),
      ex.getMessage)
    // the capture-feed route: the epoch-salted id captured at mutation
    // creation applies the repeat delete cleanly
    val epoch = Snapshots.currentVersion(spark, ledger, "vg")
    val bid = Snapshots.batchIdFor(
      deleted.select(col("l_orderkey")), epoch)
    assert(Graph.deleteFromEdgeIndexVersioned(deleted, part, ledger,
      "vg", obB, edB, toB, stB, batchId = Some(bid)))
    // ... and the orders are gone again
    assert(spark.table(Graph.resolveEdgeIndex(spark, ledger, "vg",
        obB, edB, toB, stB)._1)
      .filter(col("order_key").isin(11L, 14L)).isEmpty)
    dropVersioned(ledger, bases)
  }

  test("appendEdgeIndexVersionedStaged: killed at EVERY step boundary, " +
      "the current snapshot serves complete; the rerun converges " +
      "bit-identical to a from-scratch rebuild of the GROWN corpus; a " +
      "post-publish replay is a logged no-op") {
    import org.apache.spark.sql.functions.col
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val ledger = "graft_idx_test.va_ledger"
    val bases = vdBases.map(_.replace(".vd_", ".va_"))
    val rb = bases.map(_ + "_reb")
    dropVersioned(ledger, bases)
    rb.foreach(dropIdx)
    val Seq(obB, edB, toB, stB) = bases
    val seed = li.filter(col("l_orderkey") < 13L)
    val grow = li.filter(col("l_orderkey") >= 13L)
    assert(Graph.writeEdgeIndexVersioned(seed, part, ledger, "va",
      obB, edB, toB, stB, numBuckets = 2))
    val preAppend = rows(Graph.readEdgeIndexVersioned(spark, ledger, "va",
      obB, edB, toB, stB)._2)
    // the truth: a from-scratch one-shot build of the GROWN corpus
    val Seq(obR, edR, toR, stR) = rb
    Graph.writeEdgeIndex(li, part, obR, edR, toR, stR, numBuckets = 2)
    val (obE, eE, tE, sE) = Graph.readEdgeIndex(spark, obR, edR, toR, stR)

    // kill after each staging write: the pointer still resolves the
    // pre-append snapshot, complete and untouched
    Seq("edges", "totals", "stats", "ob").foreach { s =>
      val ex = intercept[IllegalStateException] {
        Graph.appendEdgeIndexVersionedStaged(grow, part, ledger, "va",
          obB, edB, toB, stB, crashAfterStep = Some(s))
      }
      assert(ex.getMessage.contains(s))
      val (_, eNow, _, _) = Graph.readEdgeIndexVersioned(spark,
        ledger, "va", obB, edB, toB, stB)
      assert(rows(eNow) === preAppend, s"torn serve after crash at $s")
    }
    // kill right after the commit point: the append IS applied, and
    // the post-crash rerun is a ledger no-op, NOT a double-count
    intercept[IllegalStateException] {
      Graph.appendEdgeIndexVersionedStaged(grow, part, ledger, "va",
        obB, edB, toB, stB, crashAfterStep = Some("publish"))
    }
    assert(!Graph.appendEdgeIndexVersionedStaged(grow, part, ledger,
      "va", obB, edB, toB, stB))
    val (obV, eV, tV, sV) = Graph.readEdgeIndexVersioned(spark, ledger,
      "va", obB, edB, toB, stB)
    assert(rows(obV) === rows(obE))
    assert(rows(eV) === rows(eE))
    assert(rows(tV) === rows(tE))
    assert(rows(sV) === rows(sE))
    // staged tables land fully MERGED: physical rows == rebuild's
    val (_, edT2, _, _) = Graph.resolveEdgeIndex(spark, ledger, "va",
      obB, edB, toB, stB)
    assert(edT2 === edB + "_v2")
    assert(rows(spark.table(edT2)) === rows(spark.table(edR)))
    val lg = graft.operators.Snapshots.ledger(spark, ledger, "va")
      .collect().map(r => (r.getLong(1), r.getString(3))).toSet
    assert(lg === Set((1L, "build"), (2L, "append-staged")))
  }

  test("versioned serving + retire: a reader resolved BEFORE a publish " +
      "keeps a complete old snapshot (old-or-new, never torn); retire " +
      "reclaims the old version afterward") {
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val ledger = "graft_idx_test.vs_ledger"
    val bases = vdBases.map(_.replace(".vd_", ".vs_"))
    dropVersioned(ledger, bases)
    val Seq(obB, edB, toB, stB) = bases
    Graph.writeEdgeIndexVersioned(li, part, ledger, "vs",
      obB, edB, toB, stB, numBuckets = 2)
    val truth = rows(Graph.coPurchaseEdges(li, part))
    // an in-flight reader: resolved at v1, not yet executed
    val (obT1, edT1, toT1, stT1) = Graph.resolveEdgeIndex(spark, ledger,
      "vs", obB, edB, toB, stB)
    val (_, eOld, _, _) = Graph.readEdgeIndex(spark, obT1, edT1, toT1, stT1)
    // a maintenance publish lands v2 mid-flight
    assert(Graph.mergeEdgeIndexVersioned(spark, ledger, "vs",
      obB, edB, toB, stB))
    // the old reader still serves its COMPLETE snapshot — the publish
    // dropped nothing
    assert(rows(eOld) === truth)
    // new resolutions serve v2, rows preserved bit-identically
    val (_, eNew, _, _) = Graph.readEdgeIndexVersioned(spark, ledger,
      "vs", obB, edB, toB, stB)
    assert(rows(eNew) === truth)
    // grace period over: retire reclaims v1, current keeps serving
    val dropped = graft.operators.Snapshots.retire(spark, ledger, "vs",
      bases, keepVersions = 1)
    assert(dropped === Seq(1L))
    assert(!spark.catalog.tableExists(edT1))
    assert(rows(Graph.readEdgeIndexVersioned(spark, ledger, "vs",
      obB, edB, toB, stB)._2) === truth)
  }

  test("appendEdgeIndexVersioned: the applied-batch guard makes a " +
      "replayed ingest a no-op; distinct batches merge additively") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val (li, part) = fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val ledger = "graft_idx_test.va_ledger"
    val bases = vdBases.map(_.replace(".vd_", ".va_"))
    dropVersioned(ledger, bases)
    val Seq(obB, edB, toB, stB) = bases
    val even = li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
    val odd = li.filter(pmod(col("l_orderkey"), lit(2)) === 1)
    Graph.writeEdgeIndexVersioned(even, part, ledger, "va",
      obB, edB, toB, stB, numBuckets = 2)
    assert(Graph.appendEdgeIndexVersioned(odd, part, ledger, "va",
      obB, edB, toB, stB))
    // the replay — same complete-order key set, same deterministic
    // batch id — is a logged no-op instead of a double-count
    assert(!Graph.appendEdgeIndexVersioned(odd, part, ledger, "va",
      obB, edB, toB, stB))
    val (_, eV, _, sV) = Graph.readEdgeIndexVersioned(spark, ledger,
      "va", obB, edB, toB, stB)
    assert(rows(eV) === rows(Graph.coPurchaseEdges(li, part)))
    assert(rows(sV).head === Seq(6L, 7L))
  }

  // ---- checkpointed iterative rounds ---------------------------------

  test("pageRank rounds=12: matches the driver-side integer recurrence " +
      "exactly, and the checkpointed plan stays shallow") {
    val edges = Seq(
      ("a", "b", 1L), ("b", "a", 1L),
      ("b", "c", 1L), ("c", "b", 1L)).toDF("src", "dst", "w")
    // reference: the same floor recurrence, pure Scala
    var m = Map("a" -> 333333333L, "b" -> 333333333L, "c" -> 333333333L)
    for (_ <- 1 to 12) {
      val acc = Map(
        "a" -> m("b") * 500000000L / 1000000000L,
        "b" -> (m("a") + m("c")),
        "c" -> m("b") * 500000000L / 1000000000L)
      m = acc.map { case (n, a) => n -> (50000000L + 85L * a / 100L) }
    }
    val pr12 = Graph.pageRank(edges, iterations = 12)
    assert(pr12.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === m)
    // lineage cut every CheckpointEvery rounds => plan depth is O(1)
    // per round: 12 rounds must not plan deeper than ~one cadence of
    // un-checkpointed rounds
    def nNodes(df: org.apache.spark.sql.DataFrame) = {
      var n = 0; df.queryExecution.analyzed.foreach(_ => n += 1); n
    }
    val pr4 = Graph.pageRank(edges, iterations = 4)
    assert(nNodes(pr12) <= 2 * nNodes(pr4),
      s"12-round plan ${nNodes(pr12)} nodes vs 4-round ${nNodes(pr4)}")
  }

  test("labelPropagation rounds=12: converged fixture is stable across " +
      "the checkpoint boundary (same communities as rounds=3)") {
    def tri(ns: Seq[String], w: Long) = for {
      s <- ns; d <- ns if s != d
    } yield (s, d, w)
    val edges = (tri(Seq("a", "b", "c"), 2L) ++ tri(Seq("x", "y", "z"), 2L)
      ++ Seq(("c", "x", 1L), ("x", "c", 1L))).toDF("src", "dst", "w")
    assert(rows(Graph.labelPropagation(edges, rounds = 12)) ===
      rows(Graph.labelPropagation(edges, rounds = 3)))
    // and the 12-round plan is no deeper than ~one checkpoint cadence
    def nNodes(df: org.apache.spark.sql.DataFrame) = {
      var n = 0; df.queryExecution.analyzed.foreach(_ => n += 1); n
    }
    assert(nNodes(Graph.labelPropagation(edges, rounds = 12)) <=
      2 * nNodes(Graph.labelPropagation(edges, rounds = 4)))
  }

  test("pageRankConvergence (x212): integer L1/max deltas between the " +
      "last two rounds match the driver-side recurrence") {
    val edges = Seq(
      ("a", "b", 1L), ("b", "a", 1L),
      ("b", "c", 1L), ("c", "b", 1L)).toDF("src", "dst", "w")
    def round(m: Map[String, Long]): Map[String, Long] = {
      val acc = Map(
        "a" -> m("b") * 500000000L / 1000000000L,
        "b" -> (m("a") + m("c")),
        "c" -> m("b") * 500000000L / 1000000000L)
      acc.map { case (n, a) => n -> (50000000L + 85L * a / 100L) }
    }
    val p0 = Map("a" -> 333333333L, "b" -> 333333333L, "c" -> 333333333L)
    val p1 = round(p0); val p2 = round(p1)
    // per-NODE deltas (a Set.map would dedupe the symmetric pair)
    val deltas = p1.keys.toSeq.map(k => math.abs(p2(k) - p1(k)))
    val out = Graph.pageRankConvergence(edges, iterations = 2)
      .collect().head
    assert(out.getLong(0) === 3L)
    assert(out.getLong(1) === deltas.sum)
    assert(out.getLong(2) === deltas.max)
  }

  // ---- triangle orientation ------------------------------------------

  test("triangleStats orientBy=degree: identical output to the " +
      "id-oriented form (same triangles, different wedge fanout bound)") {
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"),
      ("a", "c"))
    val edges = (und ++ und.map(_.swap)).map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "w")
    assert(rows(Graph.triangleStats(edges, orientBy = "degree")) ===
      rows(Graph.triangleStats(edges, orientBy = "id")))
  }

  test("triangleStats on a multigraph: duplicate edge rows inflate " +
      "neither degree nor triangle counts (deduped symmetric set)") {
    val und = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val once = (und ++ und.map(_.swap)).map { case (s, d) => (s, d, 1L) }
    val dup = once ++ once // every edge twice
    assert(rows(Graph.triangleStats(dup.toDF("src", "dst", "w"))) ===
      rows(Graph.triangleStats(once.toDF("src", "dst", "w"))))
  }

  // ---- adaptive rounds -------------------------------------------------

  test("pageRankAdaptive: early-stops at the first round whose integer " +
      "L1 delta <= tol, returns EXACTLY pageRank at that round count, " +
      "and is deterministic across runs") {
    val (li, part) = fixture
    val edges = Graph.coPurchaseEdges(li, part)
    val tol = 2000000L
    val adaptive = rows(Graph.pageRankAdaptive(edges, maxRounds = 10,
      tolUnits = tol))
    // the measured stop round: first r whose convergence audit reads
    // l1 <= tol (pageRankConvergence(r) = delta between rounds r-1, r)
    val stop = (2 to 10).find(r =>
      Graph.pageRankConvergence(edges, r).collect().head.getLong(1)
        <= tol).get
    assert(adaptive === rows(Graph.pageRank(edges, stop)),
      s"adaptive != fixed at measured stop round $stop")
    assert(adaptive !== rows(Graph.pageRank(edges, stop - 1)),
      "fixture must not be converged BEFORE the stop round")
    assert(adaptive === rows(Graph.pageRankAdaptive(edges,
      maxRounds = 10, tolUnits = tol)), "re-run must be identical")
    // tol 0 on a graph still moving: runs to maxRounds, equals fixed
    assert(rows(Graph.pageRankAdaptive(edges, maxRounds = 3,
      tolUnits = 0L)) === rows(Graph.pageRank(edges, 3)))
  }

  test("labelPropagationAdaptive: stops at the label fixed point and " +
      "equals the fixed form at any round count >= the stop round") {
    // two triangles over a weak bridge — the converging LPA fixture
    val und = Seq(("a", "b", 5L), ("b", "c", 5L), ("a", "c", 5L),
      ("d", "e", 5L), ("e", "f", 5L), ("d", "f", 5L), ("c", "d", 1L))
    val edges = (und ++ und.map { case (s, d, w) => (d, s, w) })
      .toDF("src", "dst", "w")
    val adaptive = rows(Graph.labelPropagationAdaptive(edges,
      maxRounds = 10))
    assert(adaptive === rows(Graph.labelPropagation(edges, rounds = 3)))
    assert(adaptive === rows(Graph.labelPropagation(edges, rounds = 10)))
    assert(adaptive.size === 6)            // one row per node
    assert(adaptive.map(_(1)).size === 2)  // two communities
  }
}
