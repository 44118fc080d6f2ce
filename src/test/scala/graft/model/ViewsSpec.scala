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

  test("taskDurationsSql view text matches the DataFrame form row-for-row") {
    tasks.createOrReplaceTempView("vs_tasks_src")
    val viaSql = spark.sql(Views.taskDurationsSql("vs_tasks_src", "%proposal%"))
      .collect().map(r => (r.getAs[String]("id"),
        r.getAs[Double]("duration_days"))).toSeq
    val viaDf = Views.proposalDurations(tasks)
      .collect().map(r => (r.getAs[String]("id"),
        r.getAs[Double]("duration_days"))).toSeq
    assert(viaSql == viaDf && viaSql == Seq(("t1", 2.5)))
  }

  // The dbt-parity claim: `<system>.<stream>` tables and model VIEWS
  // live in a metastore-backed spark_catalog and survive the session.
  // Two fresh subprocess JVMs against one Derby metastore + warehouse:
  // the writer registers, the reader only RESOLVES names.
  test("persistent catalog: wrike.tasks + model views survive a new JVM") {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft_cat")
      .toFile.getAbsolutePath
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED")).toSeq
    def runMode(mode: String): (Int, String) = {
      val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++
        addOpens ++ Seq("-Xmx2g",
          "-Dspark.ui.enabled=false",
          "-cp", System.getProperty("java.class.path"),
          "graft.tools.CatalogRoundTrip", mode,
          s"$base/warehouse", s"$base/metastore_db")
      val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      pb.directory(new java.io.File(base)) // derby.log stays out of the repo
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      (p.waitFor(), out)
    }
    val (rc1, o1) = runMode("write")
    assert(rc1 == 0 && o1.contains("WRITE_OK tables=3"), o1.takeRight(2000))
    val (rc2, o2) = runMode("read")
    assert(rc2 == 0 &&
      o2.contains("READ_OK tasks=4 proposals=t1:2.5 quotes=1"),
      o2.takeRight(2000))
  }
}
