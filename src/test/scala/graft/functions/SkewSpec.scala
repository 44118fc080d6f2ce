package graft.functions

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the direct aggregate (hot-key safe)") {
    // one pathologically hot key + normal keys
    val rows = (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 5}", i.toDouble))
    val df = rows.toDF("key", "v")
    val salted = Skew.saltedSumCount(df, Seq("key"), "v", numSalts = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = df.groupBy("key")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("v").cast("decimal(38,6)"))
        .cast("double").as("s"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
    assert(salted("hot")._2 == 10000L)
  }

  test("saltedTopK equals the unsalted window top-k under a hot key") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // hot key with 50k rows vs normal keys with a handful; unique (v, id)
    // ordering makes the expected result deterministic
    val rows = (1 to 50000).map(i => ("hot", i.toLong, i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 7}", (i * 13 % 101).toLong, 100000L + i))
    val df = rows.toDF("key", "v", "id")
    val salted = Skew.saltedTopK(df, Seq("key"), "v", k = 5,
        tieCols = Seq("id"), numSalts = 8)
      .select("key", "v", "id", "rank")
    val w = Window.partitionBy(col("key"))
      .orderBy(col("v").desc, col("id").asc)
    val direct = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("key", "v", "id", "rank")
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // every key (incl. hot) has exactly min(n, 5) survivors
    val counts = salted.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("hot") == 5L)
  }
}
