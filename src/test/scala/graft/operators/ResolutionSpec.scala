package graft.operators

import graft.SparkSpec

class ResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Seq(
    (1L, "cold widget"),   // canonical for "cold widget" (min id, 2 rows)
    (2L, "bold widget"),   // 1 edit from "cold widget", same block
    (3L, "cold widget"),   // duplicate spelling — collapses, not a pair
    (4L, "large bolt"),    // alone in its block
    (5L, "cold gizmo"),    // alone in its block
    (6L, "tall widget"),   // 3 edits from "cold widget" — over maxDist
    (7L, null)             // NULL names are dropped, not matched
  ).toDF("p_partkey", "p_name")

  test("fuzzyNameMatches (x185): distinct-name grain, block on the " +
      "last token, pairs within the edit bound only — duplicates " +
      "collapse, NULLs drop, canonical id/count ride along") {
    val out = Resolution.fuzzyNameMatches(parts, "p_partkey", "p_name",
      maxDist = 2).collect()
    assert(out.length === 1)
    val r = out.head
    // name_a < name_b: "bold widget" sorts before "cold widget"
    assert(r.getString(0) === "bold widget")
    assert(r.getString(1) === "cold widget")
    assert(r.getLong(2) === 2L)   // id_a = bold widget's min id
    assert(r.getLong(3) === 1L)   // id_b = cold widget's MIN id (1, not 3)
    assert(r.getLong(4) === 1L)   // n_a
    assert(r.getLong(5) === 2L)   // n_b: both "cold widget" rows counted
    assert(r.getLong(6) === 1L)   // dist: c -> b
  }

  test("fuzzyNameMatches: the length filter is a true lower bound — " +
      "a same-block pair with length gap > maxDist never reaches the " +
      "kernel, and raising maxDist admits it") {
    val df = Seq((1L, "big gear"), (2L, "enormous gear")).toDF("id", "nm")
    assert(Resolution.fuzzyNameMatches(df, "id", "nm", maxDist = 2)
      .count() === 0)
    // dist("big", "enormous") = 7 substitutions/inserts -> within 8
    val wide = Resolution.fuzzyNameMatches(df, "id", "nm", maxDist = 8)
      .collect()
    assert(wide.length === 1 && wide.head.getLong(6) <= 8L)
  }

  test("fuzzyNameMatches: a degenerate blocking key fails fast with " +
      "the scale-path message instead of going quadratic") {
    val e = intercept[IllegalArgumentException] {
      Resolution.fuzzyNameMatches(parts, "p_partkey", "p_name",
        maxDist = 2, maxBlockNames = 2)
    }
    assert(e.getMessage.contains("finer blocking key"))
  }
}
