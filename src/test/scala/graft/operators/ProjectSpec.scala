package graft.operators

import org.apache.spark.sql.types.{LongType, StringType}

import graft.SparkSpec

class ProjectSpec extends SparkSpec {
  import spark.implicits._

  test("quarantineJson: verdict classes and precedence (x76)") {
    val rows = Seq(
      (1L, """{"k": 87, "name": "a"}"""),       // ok
      (2L, "oops{"),                            // not_json
      (3L, """{"name": "b"}"""),                // missing k
      (4L, """{"k": "bad", "name": "c"}"""),    // k wrong type
      (5L, """{"k": 1}"""),                     // name missing (second field)
      (6L, null.asInstanceOf[String]),          // SQL NULL payload
      (7L, "null")                              // VALID JSON scalar null
    ).toDF("event_id", "props")
    val out = Project.quarantineJson(rows, "props",
        Seq("k" -> LongType, "name" -> StringType))
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[String]("verdict")).toMap
    assert(out == Map(
      1L -> "ok",
      2L -> "not_json",
      3L -> "missing_required:k",
      4L -> "wrong_type:k",
      5L -> "missing_required:name",
      6L -> "not_json",
      7L -> "missing_required:k")) // parses, just has no fields
    // missing-of-an-earlier-field outranks wrong-type-of-a-later one
    val both = Seq((7L, """{"name": 3}""")).toDF("event_id", "props")
    val v = Project.quarantineJson(both, "props",
        Seq("k" -> LongType, "name" -> StringType))
      .head().getAs[String]("verdict")
    assert(v == "missing_required:k")
    // schema: input columns preserved + one verdict column appended
    val q = Project.quarantineJson(rows, "props", Seq("k" -> LongType))
    assert(q.schema.fieldNames.toSeq == Seq("event_id", "props", "verdict"))
    intercept[IllegalArgumentException] {
      Project.quarantineJson(rows, "props", Seq.empty)
    }
  }
}
