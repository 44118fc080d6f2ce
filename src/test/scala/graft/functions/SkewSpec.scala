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
}
