package graft.expressions

import org.apache.spark.sql.graft.GraftFunctions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("vec_dot is callable from SQL and matches manual dot product") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("sorted_intersect_size counts common elements of sorted arrays") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n")
      .head().getInt(0)
    assert(r == 2)
    // null-intolerant: null input -> null result
    val n = spark.sql(
      "SELECT sorted_intersect_size(CAST(NULL AS ARRAY<STRING>), array('a'))")
    assert(n.head().isNullAt(0))
  }

  test("interpreted and codegen paths agree (FloatVecDot eval)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((Array(1.5f, -2.0f, 0.5f), Array(2.0f, 0.25f, 8.0f)))
      .toDF("a", "b")
    val viaColumn = df.select(
      org.apache.spark.sql.graft.VectorExpressions.vecDot(col("a"), col("b")))
      .head().getDouble(0)
    val expected = 1.5 * 2.0 + -2.0 * 0.25 + 0.5 * 8.0
    assert(viaColumn == expected)
  }
}
