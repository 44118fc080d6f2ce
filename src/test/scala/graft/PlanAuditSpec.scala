package graft

import graft.queries.ReferenceQueries

/** Plan-shape audits: the SCALING.md claims, asserted against actual
  * physical plans so regressions show up in CI, not in a cluster. */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q2 watermark predicate reaches the parquet scan (NanosPushdown)") {
    val p = plan("q2_watermark_scan")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(ts"),
      s"watermark range predicate not pushed:\n$p")
  }

  test("q2 pushdown rewrite preserves semantics vs unoptimized filter") {
    import org.apache.spark.sql.functions._
    val events = Tables(spark, sfDir, "events")
    val optimized = ReferenceQueries.queries("q2_watermark_scan")(spark, sfDir)
      .count()
    // baseline: block the rewrite by hiding the literal behind an exclusive
    // strictly-greater comparison computed post-hoc
    val baseline = events.filter(
      unix_micros(col("ts")) > unix_micros(
        to_timestamp(lit(ReferenceQueries.Bookmark)))).count()
    assert(optimized == baseline)
  }

  test("q5 projection prunes the scan to declared columns") {
    val p = plan("q5_schema_project")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"),
      s"scan not pruned:\n$p")
  }

  test("x17 plans TakeOrderedAndProject (no global sort)") {
    assert(plan("x17_top_customers").contains("TakeOrderedAndProject"))
  }

  test("x3 top-k plans partial WindowGroupLimit before the exchange") {
    val p = plan("x3_topk_similarity")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"no partial per-partition top-k:\n$p")
  }

  test("x6 star join broadcasts the dimension tables") {
    val p = plan("x6_star_join")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q13 sessionize reuses one exchange across windows and group-by") {
    val p = plan("q13_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }
}
