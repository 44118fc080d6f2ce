package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke: every registered query runs end-to-end on the sf0.001 fixtures.
  * Row-count expectations are minimal (near-dup/threshold queries may be
  * legitimately small at smoke scale); hash correctness is the Verify +
  * DuckDB gate's job. */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val mayBeEmpty = Set(
    "x2_minhash_lsh", "x7_simhash_dedup", "x8_ngram_jaccard",
    "x9_embedding_neardup")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("x216-x218 are invocation-stable: reruns replay nothing — the " +
      "ledger keeps one row per batch and the live maintenance cycle " +
      "stays audit-only (what Bench's repeated passes rely on)") {
    Seq("x216_applied_batch_ledger", "x217_maintenance_cycle",
        "x218_tombstone_capture").foreach { n =>
      val fn = SparkEntry.queries(n)
      val first = fn(spark, sfDir).collect().map(_.toSeq).toSet
      val second = fn(spark, sfDir).collect().map(_.toSeq).toSet
      assert(first === second, s"$n drifted across invocations")
    }
  }
}
