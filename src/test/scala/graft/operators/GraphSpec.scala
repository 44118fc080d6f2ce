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
}
