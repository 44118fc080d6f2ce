package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Num

/** Model layer (SURVEY §2.2, §7.1 step 7): the dbt-view analog. Landed
  * stream tables are registered as `<system>_<stream>` temp views and the
  * reference's two dbt models are defined as DataFrame views over them.
  *
  * `proposal_durations` / `quote_durations` (dbt models, wrike
  * proposal_durations.sql:6-19 and quote_durations.sql) differ only in the
  * LIKE pattern — both are: project 7 columns + one
  * computed duration, filter status/'Completed' + two NOT NULLs + a
  * lower(...) LIKE, duration = round(extract(epoch from completed -
  * created) / 86400, 4).
  */
object Views {

  /** Register a landed table under its system namespace — session-scoped
    * form (temp view, `<system>_<stream>` name-mangling). Zero-cost and
    * self-cleaning; the right tool inside a single job. */
  def register(spark: SparkSession, system: String, stream: String,
               df: DataFrame): Unit =
    df.createOrReplaceTempView(s"${system}_$stream")

  /** PERSISTENT registration — the real dbt semantics
    * (`generate_schema_name.sql:1-14` routes every model into a named
    * Postgres schema like `wrike.proposal_durations`): one database per
    * source system in `spark_catalog`, one managed table per landed
    * stream, so a warehouse user writes `spark.table("wrike.tasks")`
    * and — under a metastore-backed catalog (`enableHiveSupport` with a
    * shared warehouse dir + Derby metastore) — tomorrow's session still
    * resolves it. With the default in-memory catalog the same calls
    * work but the METADATA dies with the session; persistence across
    * sessions is exactly what the metastore adds (ViewsSpec proves it
    * across two separate JVMs). */
  def registerPersistent(spark: SparkSession, system: String,
                         stream: String, df: DataFrame,
                         partitionCols: Seq[String] = Nil): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$system`")
    val w = df.write.mode("overwrite").format("parquet")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .saveAsTable(s"`$system`.`$stream`")
  }

  /** Persistent VIEW materialization of a dbt model (dbt's default
    * `materialized: view` — the reference materializes both models as
    * views, `dbt_project.yml:19-28`): the model's SQL text is stored in
    * the catalog under `<system>.<name>` and re-planned at every read,
    * exactly like a Postgres view. */
  def registerModelView(spark: SparkSession, system: String, name: String,
                        sqlText: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$system`")
    spark.sql(s"CREATE OR REPLACE VIEW `$system`.`$name` AS $sqlText")
  }

  /** [[taskDurations]] as catalog-view SQL over a registered source
    * table — same projection, filters and rounding law (floor(x·10⁴ +
    * 0.5)/10⁴), so the view's rows equal the DataFrame form's. */
  def taskDurationsSql(sourceTable: String, titlePattern: String): String =
    s"""SELECT id, accountId, title, status, importance,
       |       createdDate, completedDate,
       |       floor((unix_millis(CAST(completedDate AS TIMESTAMP)) -
       |              unix_millis(CAST(createdDate AS TIMESTAMP)))
       |             / 8.64e7 * 10000 + 0.5) / 1e4 AS duration_days
       |FROM $sourceTable
       |WHERE status = 'Completed'
       |  AND createdDate IS NOT NULL AND completedDate IS NOT NULL
       |  AND lower(title) LIKE '$titlePattern'""".stripMargin

  /** The shared body of the two dbt models, parameterized by pattern. */
  def taskDurations(tasks: DataFrame, titlePattern: String): DataFrame =
    tasks
      .filter(col("status") === "Completed" &&
        col("createdDate").isNotNull && col("completedDate").isNotNull &&
        lower(col("title")).like(titlePattern))
      .select(
        col("id"), col("accountId"), col("title"), col("status"),
        col("importance"), col("createdDate"), col("completedDate"),
        Num.fpRound(
          (unix_millis(col("completedDate").cast("timestamp")) -
            unix_millis(col("createdDate").cast("timestamp"))) / lit(8.64e7), 4)
          .as("duration_days"))

  def proposalDurations(tasks: DataFrame): DataFrame =
    taskDurations(tasks, "%proposal%")

  def quoteDurations(tasks: DataFrame): DataFrame =
    taskDurations(tasks, "%quote%")
}
