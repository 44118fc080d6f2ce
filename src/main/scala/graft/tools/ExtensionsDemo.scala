package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke for the cluster-deployment registration path: builds a session
  * with `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  * (as a cluster would) and calls the injected functions from SQL. */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dot = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))""")
      .head().getDouble(0)
    val isect = spark.sql(
      "SELECT sorted_intersect_size(array('a','b'), array('b','c'))")
      .head().getInt(0)
    assert(dot == 11.0 && isect == 1, s"got dot=$dot isect=$isect")
    println(s"[extensions-demo] OK vec_dot=$dot sorted_intersect_size=$isect")
    spark.stop()
  }
}
