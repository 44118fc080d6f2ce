package graft.sinks

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("upsertSql emits ON CONFLICT DO UPDATE excluding key columns (K1)") {
    val sql = Sinks.upsertSql("wrike.tasks", "wrike_tasks_staging",
      Seq("id", "title", "status"), Seq("id"))
    assert(sql ==
      """INSERT INTO "wrike"."tasks" ("id", "title", "status") """ +
      """SELECT "id", "title", "status" FROM "wrike_tasks_staging" """ +
      """ON CONFLICT ("id") DO UPDATE SET "title" = EXCLUDED."title", """ +
      """"status" = EXCLUDED."status"""")
  }

  test("upsertSql with only key columns degrades to DO NOTHING") {
    val sql = Sinks.upsertSql("t", "s", Seq("id"), Seq("id"))
    assert(sql.endsWith("""ON CONFLICT ("id") DO NOTHING"""))
  }

  test("ddlFor maps Spark types to Postgres types with PK (K2)") {
    val df = Seq((1L, "x", 1.5, true)).toDF("id", "name", "score", "ok")
      .selectExpr("id", "name", "score", "ok",
        "timestamp'2024-01-01' as ts", "date'2024-01-01' as d")
    val ddl = Sinks.ddlFor("sys.stream", df, Seq("id"))
    assert(ddl.contains(""""id" BIGINT"""))
    assert(ddl.contains(""""name" TEXT"""))
    assert(ddl.contains(""""score" DOUBLE PRECISION"""))
    assert(ddl.contains(""""ok" BOOLEAN"""))
    assert(ddl.contains(""""ts" TIMESTAMP"""))
    assert(ddl.contains(""""d" DATE"""))
    assert(ddl.contains("""PRIMARY KEY ("id")"""))
  }

  test("postgres upsert branch: golden server-side statement sequence") {
    // no live Postgres in this environment — pin the exact statements the
    // pg dialect executes after the staging load (Derby integration-tests
    // the "merge" branch live against a real database)
    val df = Seq((1L, "a", 2.5)).toDF("id", "title", "score")
    val stmts = Sinks.upsertStatements(df, "wrike.tasks",
      "wrike_tasks_staging", Seq("id"), dialect = "postgres",
      tableExists = false)
    assert(stmts == Seq(
      """CREATE TABLE IF NOT EXISTS "wrike"."tasks" ("id" BIGINT, """ +
        """"title" TEXT, "score" DOUBLE PRECISION, PRIMARY KEY ("id"))""",
      """INSERT INTO "wrike"."tasks" ("id", "title", "score") """ +
        """SELECT "id", "title", "score" FROM "wrike_tasks_staging" """ +
        """ON CONFLICT ("id") DO UPDATE SET "title" = EXCLUDED."title", """ +
        """"score" = EXCLUDED."score"""",
      """DROP TABLE "wrike_tasks_staging""""))
    // an existing target skips the DDL, keeping merge + cleanup
    assert(Sinks.upsertStatements(df, "wrike.tasks", "wrike_tasks_staging",
      Seq("id"), "postgres", tableExists = true).length == 2)
  }

  test("writeParquet partitions for pruning") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val df = Seq(("a", 1), ("b", 2)).toDF("sys", "v")
    Sinks.writeParquet(df, s"$dir/t", partitionCols = Seq("sys"))
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 2)
    assert(new java.io.File(s"$dir/t/sys=a").exists()) // partition dirs
  }

  test("writeRangeClustered + zoneMapAudit: clustered layout audits " +
      "ZERO overlapping file ranges (prunable); a hash-shuffled write " +
      "of the same rows audits overlapping and unprunable") {
    import org.apache.spark.sql.functions.{col, pmod}
    val dir = java.nio.file.Files.createTempDirectory("zones").toString
    // keys deliberately landed in hash order — every hash partition
    // spans the whole key domain
    val rows = (0L until 4000L).map(i => (i, s"payload_$i"))
      .toDF("k", "payload")
    Sinks.writeRangeClustered(rows, s"$dir/clustered", "k", numFiles = 8)
    rows.repartition(8, pmod(col("k"), org.apache.spark.sql.functions
        .lit(97L)))
      .write.mode("overwrite").parquet(s"$dir/shuffled")

    def audit(path: String) = graft.operators.Warehouse.zoneMapAudit(
        spark.read.parquet(path), "k").collect().head
    val c = audit(s"$dir/clustered")
    assert(c.getLong(0) === 8L && c.getLong(1) === 4000L)
    assert(c.getLong(2) === 0L && c.getBoolean(3),
      "range-clustered files must have disjoint [min,max] spans")
    val sh = audit(s"$dir/shuffled")
    assert(sh.getLong(1) === 4000L)
    assert(sh.getLong(2) > 0L && !sh.getBoolean(3),
      "hash-shuffled files should overlap on the key column")
  }

  test("dropManaged resolves the location from catalog metadata: " +
      "1-part default-database names (tables live directly under the " +
      "warehouse dir), db.table names, and orphaned locations all " +
      "clear so a re-create never hits LOCATION_ALREADY_EXISTS") {
    import spark.implicits._
    def create(table: String): Unit =
      Seq((1L, "a")).toDF("k", "v").write.mode("overwrite")
        .format("parquet").saveAsTable(table)
    // 1-part name in the default database: the old string-built
    // <warehouse>/<db>.db/<name> guess threw MatchError / missed the
    // real location
    create("drop_managed_plain")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser
          .parseTableIdentifier("drop_managed_plain")).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(loc))
    Sinks.dropManaged(spark, "drop_managed_plain")
    assert(!fs.exists(loc), "default-db location must be cleared")
    create("drop_managed_plain") // re-create proves the path is free
    Sinks.dropManaged(spark, "drop_managed_plain")
    // orphaned location (data on disk, no catalog entry): the case the
    // helper exists for — dropManaged on the MISSING table still clears
    // the default path
    create("drop_managed_orphan")
    val oloc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser
          .parseTableIdentifier("drop_managed_orphan")).location)
    spark.sessionState.catalog.dropTable(
      spark.sessionState.sqlParser
        .parseTableIdentifier("drop_managed_orphan"),
      ignoreIfNotExists = false, purge = false)
    // in-memory catalog drop removes data too; re-materialize the orphan
    if (!fs.exists(oloc)) fs.mkdirs(oloc)
    Sinks.dropManaged(spark, "drop_managed_orphan")
    assert(!fs.exists(oloc), "orphaned location must be cleared")
  }
}
