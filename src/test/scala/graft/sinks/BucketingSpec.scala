package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = pre-shuffled storage: joins/aggregates on the bucket key
  * must plan without Exchange operators. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get("spark-warehouse", name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("join of co-bucketed tables plans with zero shuffles") {
    dropTable("b_orders"); dropTable("b_items")
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "i")
    Sinks.writeBucketed(orders, "b_orders", Seq("key"), 8, Seq("key"))
    Sinks.writeBucketed(items, "b_items", Seq("key"), 8, Seq("key"))

    // merge hint on the build side so the co-located sort-merge path is
    // what gets planned (broadcast would hide the bucketing)
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_items"), "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 3000)

    // aggregate on the bucket key: also exchange-free
    val agg = spark.table("b_items").groupBy("key").agg(count(lit(1)))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
