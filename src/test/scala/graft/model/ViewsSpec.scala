package graft.model

import java.sql.Timestamp

import graft.SparkSpec

class ViewsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val tasks = Seq(
    ("t1", "acc", "Project proposal draft", "Completed", "High",
      ts("2024-01-01 00:00:00"), ts("2024-01-03 12:00:00")),
    ("t2", "acc", "Quote for client", "Completed", "High",
      ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
    ("t3", "acc", "Proposal review", "Active", "Low",
      ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")), // not Completed
    ("t4", "acc", "Misc proposal", "Completed", "Low",
      null, ts("2024-01-05 00:00:00")) // null created
  ).toDF("id", "accountId", "title", "status", "importance",
    "createdDate", "completedDate")

  test("proposalDurations: filter chain + rounded day duration (Q1/dbt)") {
    val out = Views.proposalDurations(tasks).collect()
    assert(out.map(_.getAs[String]("id")).toSeq == Seq("t1"))
    assert(out.head.getAs[Double]("duration_days") == 2.5)
  }

  test("quoteDurations differs only in pattern") {
    val out = Views.quoteDurations(tasks).collect()
    assert(out.map(_.getAs[String]("id")).toSeq == Seq("t2"))
    assert(out.head.getAs[Double]("duration_days") == 1.0)
  }

  test("register exposes system-namespaced views") {
    Views.register(spark, "wrike", "tasks", tasks)
    assert(spark.table("wrike_tasks").count() == 4)
  }
}
