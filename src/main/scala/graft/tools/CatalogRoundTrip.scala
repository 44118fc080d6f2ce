package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.model.Views

/** Cross-JVM persistence proof for the persistent-catalog model layer
  * (the dbt `<schema>.<table>` semantics of
  * `dbt/macros/generate_schema_name.sql:1-14`): run once with `write`
  * to land `wrike.tasks` and materialize both model views through a
  * Derby-backed Hive metastore, then again with `read` in a FRESH JVM
  * that only resolves names — `spark.table("wrike.tasks")` and both
  * views must come back from catalog metadata alone, exactly like a
  * Postgres warehouse between dbt runs.
  *
  * Usage: `runMain graft.tools.CatalogRoundTrip write|read
  * <warehouseDir> <metastoreDb>`. ViewsSpec drives both modes as
  * subprocesses and asserts on the OK lines.
  */
object CatalogRoundTrip {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: CatalogRoundTrip write|read <warehouseDir> <metastoreDb>")
    val Seq(mode, warehouse, metastore) = args.take(3).toSeq
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"catalog-roundtrip-$mode")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore;create=true")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      mode match {
        case "write" =>
          import spark.implicits._
          def ts(s: String) = Timestamp.valueOf(s)
          val tasks = Seq(
            ("t1", "acc", "Project proposal draft", "Completed", "High",
              ts("2024-01-01 00:00:00"), ts("2024-01-03 12:00:00")),
            ("t2", "acc", "Quote for client", "Completed", "High",
              ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
            ("t3", "acc", "Proposal review", "Active", "Low",
              ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")),
            ("t4", "acc", "Misc proposal", "Completed", "Low",
              null.asInstanceOf[Timestamp], ts("2024-01-05 00:00:00"))
          ).toDF("id", "accountId", "title", "status", "importance",
            "createdDate", "completedDate")
          Views.registerPersistent(spark, "wrike", "tasks", tasks)
          Views.registerModelView(spark, "wrike", "proposal_durations",
            Views.taskDurationsSql("wrike.tasks", "%proposal%"))
          Views.registerModelView(spark, "wrike", "quote_durations",
            Views.taskDurationsSql("wrike.tasks", "%quote%"))
          println(s"WRITE_OK tables=" +
            spark.sql("SHOW TABLES IN wrike").count())
        case "read" =>
          // resolution only — nothing is registered in this JVM
          val n = spark.table("wrike.tasks").count()
          val p = spark.table("wrike.proposal_durations")
            .select("id", "duration_days").collect()
            .map(r => s"${r.getString(0)}:${r.getDouble(1)}").mkString(",")
          val q = spark.table("wrike.quote_durations").count()
          println(s"READ_OK tasks=$n proposals=$p quotes=$q")
        case other => sys.error(s"unknown mode $other")
      }
    } finally spark.stop()
  }
}
