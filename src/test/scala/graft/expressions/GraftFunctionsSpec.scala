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

  test("text kernels are callable from SQL (shingle/minhash/simhash/digests)") {
    GraftFunctions.register(spark)
    val sh = spark.sql(
      "SELECT shingle_set('a b c d', 3) AS sh").head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val hs = spark.sql(
      "SELECT shingle_hash_set('a b c d', 3) AS hs").head().getSeq[Long](0)
    assert(hs.length == 2 && hs == hs.sorted)
    // minhash over strings == minhash over pre-hashed shingles
    val viaStr = spark.sql(
      "SELECT minhash_sig(shingle_set('a b c d', 3), 8)").head().getSeq[Long](0)
    val viaHash = spark.sql(
      "SELECT minhash_sig_hashes(shingle_hash_set('a b c d', 3), 8)")
      .head().getSeq[Long](0)
    assert(viaStr == viaHash)
    val fp = spark.sql("SELECT simhash64('hello world')").head().getLong(0)
    val fp2 = spark.sql("SELECT simhash64('hello world')").head().getLong(0)
    assert(fp == fp2)
    val digest = spark.sql(
      "SELECT smallest_digests(shingle_set('a b c d e', 3), 2)")
      .head().getString(0)
    assert(digest.split("\\|").length == 2)
    val lis = spark.sql(
      "SELECT sorted_long_intersect_size(array(1L, 5L, 9L), array(5L, 9L, 12L))")
      .head().getInt(0)
    assert(lis == 2)
    // structural params must be literals
    intercept[Exception] {
      spark.sql("SELECT shingle_set('a b c', length('xx'))").collect()
    }
  }
}
