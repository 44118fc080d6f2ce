package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class FlattenSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val nested = {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("dates", StructType(Seq(
        StructField("start", StringType),
        StructField("due", StringType),
        StructField("inner", StructType(Seq(StructField("deep", LongType))))))),
      StructField("tags", ArrayType(StringType)),
      StructField("profiles", ArrayType(StringType))))
    spark.createDataFrame(
      List(Row("t1", Row("2024-01-01", "2024-02-01", Row(7L)),
        Seq("a", "b"), Seq("p1"))).asJava, schema)
  }

  test("flatten joins nested keys with '-' recursively (F1)") {
    val out = Flatten.flatten(nested, preserve = Set("profiles"))
    assert(out.columns.toSet ==
      Set("id", "dates-start", "dates-due", "dates-inner-deep",
        "tags-0", "tags-1", "tags-2", "profiles"))
    val r = out.head()
    assert(r.getAs[String]("dates-start") == "2024-01-01")
    assert(r.getAs[Long]("dates-inner-deep") == 7L)
    assert(r.getAs[String]("tags-0") == "a")
    assert(r.getAs[String]("tags-2") == null) // index beyond list length
    assert(r.getAs[scala.collection.Seq[String]]("profiles").toSeq ==
      Seq("p1")) // preserved
  }

  test("hoistStruct lifts struct fields to top level (F2)") {
    val out = Flatten.hoistStruct(nested.selectExpr("id",
      "named_struct('amount', 5L, 'stage', 'won') as properties"), "properties")
    assert(out.columns.toSeq == Seq("id", "amount", "stage"))
    assert(out.head().getAs[Long]("amount") == 5L)
  }

  test("prefixColumns renames every column (F3)") {
    val out = Flatten.prefixColumns(nested.select("id"), "companies")
    assert(out.columns.toSeq == Seq("companies_id"))
  }

  test("flattenJsonString extracts typed keys from a JSON column (Q3)") {
    import spark.implicits._
    val df = Seq(("e1", """{"k": 9, "s": "x"}"""), ("e2", """{"k": null}"""))
      .toDF("event_id", "props")
    val out = Flatten.flattenJsonString(df, "props",
      Seq(("k", LongType), ("s", StringType)))
    assert(out.columns.toSet == Set("event_id", "props-k", "props-s"))
    val rows = out.orderBy("event_id").collect()
    assert(rows(0).getAs[Long]("props-k") == 9L)
    assert(rows(0).getAs[String]("props-s") == "x")
    assert(rows(1).isNullAt(rows(1).fieldIndex("props-k")))
  }

  test("flattenJsonString: non-castable value yields NULL, not a job failure") {
    import spark.implicits._
    val df = Seq(("e1", """{"k": "notalong"}""")).toDF("event_id", "props")
    val out = Flatten.flattenJsonString(df, "props", Seq(("k", LongType)))
    val r = out.head()
    assert(r.isNullAt(r.fieldIndex("props-k")))
  }
}
