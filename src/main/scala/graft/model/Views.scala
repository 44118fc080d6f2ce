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

  /** Register a landed table under its system namespace. */
  def register(spark: SparkSession, system: String, stream: String,
               df: DataFrame): Unit =
    df.createOrReplaceTempView(s"${system}_$stream")

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
