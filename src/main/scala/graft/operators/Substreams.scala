package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Keys

/** Sub-stream extraction (SURVEY §2.1 E1/E2): the reference splits each
  * parent row's list-valued field into a child table carrying a `parent_id`
  * FK and a synthesized `{parent_id}_{child_key}` primary key
  * (`tap_wrike/utility.py:146-195`, `tap_wrike/fetch.py:13-20`).
  *
  * Spark-first shape: one `explode` per child stream — a narrow,
  * shuffle-free generator that Catalyst pipelines with the downstream
  * projection. The child table inherits the parent's partitioning.
  */
object Substreams {

  /** Explode `listField` (array of struct) of `parent` into a child table:
    * `parent_id` = parent's `pkCol`, child columns hoisted to top level,
    * `id` = composite `{parent_id}_{childKeyField}`.
    */
  def extract(parent: DataFrame, pkCol: String, listField: String,
              childKeyField: String): DataFrame = {
    val exploded = parent
      .select(col(pkCol).as("parent_id"), explode(col(listField)).as("_child"))
      .select(col("parent_id"), col("_child.*"))
    exploded.withColumn(
      "id", Keys.compositeKey(col("parent_id"), col(childKeyField)))
  }

  /** Relational variant used when parent/child already live in separate
    * tables (the fixture layout: `lineitem` as child of `orders`): project
    * the child with a `parent_id` FK and a synthesized composite key.
    */
  def fromChildTable(child: DataFrame, fkCol: String, childKeyCol: String,
                     childCols: Seq[String]): DataFrame = {
    val base: Seq[Column] = col(fkCol).as("parent_id") +:
      childCols.map(col)
    child.select(base: _*)
      .withColumn("id", Keys.compositeKey(col("parent_id"), col(childKeyCol)))
  }
}
