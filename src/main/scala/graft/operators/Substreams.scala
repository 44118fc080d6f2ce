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

  /** F4 — two-level nested-list flatten (Xero `BudgetLines[].
    * BudgetBalances[]`, `tap_xero/utility.py:243-292`): each outer-list
    * struct is crossed with each of its inner-list structs and the two
    * field sets are merged into one flat row. Two chained `explode`
    * generators — still narrow, still shuffle-free.
    */
  def extractNested(parent: DataFrame, pkCol: String, outerField: String,
                    innerField: String, keyFields: Seq[String]): DataFrame = {
    val outer = parent
      .select(col(pkCol).as("parent_id"), explode(col(outerField)).as("_o"))
    val exploded = outer
      .select(col("parent_id"), col("_o"), explode(col(s"_o.$innerField")).as("_i"))
      .select(col("parent_id") +:
        outer.select(col("_o.*")).drop(innerField).columns.toIndexedSeq
          .map(c => col(s"_o.$c")) :+ col("_i.*"): _*)
    exploded.withColumn("id",
      Keys.compositeKey((col("parent_id") +: keyFields.map(col)): _*))
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
