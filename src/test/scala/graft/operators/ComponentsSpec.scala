package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains, cliques and singleton pairs") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, isolated pair 20-21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("src", "dst")
    val out = Components.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents handles a long path within maxIters") {
    // path 0-1-2-...-9: min label must walk the full diameter
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Components.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(0L))
    assert(out.keySet == (0L to 9L).toSet)
  }

  test("pointer jumping converges on a path graph of diameter >> maxIters") {
    // path 0-1-...-200: plain one-hop propagation needs ~200 rounds; the
    // label-of-label shortcut doubles reach per round, so 10 rounds
    // (2^10 = 1024 > 200) must suffice — O(log diameter) convergence
    val edges = (0L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Components.connectedComponents(edges, "src", "dst",
        maxIters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(0L))
    assert(out.keySet == (0L to 200L).toSet)
  }

  test("near-dup pairs to clusters: rep is the minimum member (x32 shape)") {
    val pairs = Seq((5L, 9L, 0.9), (9L, 30L, 0.8), (100L, 101L, 0.99))
      .toDF("id1", "id2", "similarity")
    val out = Components.connectedComponents(pairs, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(5L) == 5L && out(9L) == 5L && out(30L) == 5L)
    assert(out(100L) == 100L && out(101L) == 100L)
  }
}
