package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonSchemaSpec extends AnyFunSuite {

  test("converts Singer stream schema shapes (tasks.json-like)") {
    val schema = """{
      "type": "object",
      "additionalProperties": false,
      "properties": {
        "id": {"type": "string"},
        "title": {"type": ["null", "string"]},
        "createdDate": {"type": ["null", "string"], "format": "date-time"},
        "trackedDate": {"type": ["null", "string"], "format": "date"},
        "dates-duration": {"type": ["null", "integer"]},
        "hours": {"type": ["null", "number"]},
        "deleted": {"type": ["null", "boolean"]},
        "primaryEmail": {"type": ["null", "string"], "format": "email"},
        "details-Attached To Name": {"type": ["null", "string"]}
      }
    }"""
    val st = JsonSchema.toStructType(schema)
    def f(n: String) = st.fields.find(_.name == n).get
    assert(f("id").dataType == StringType && !f("id").nullable)
    assert(f("title").dataType == StringType && f("title").nullable)
    assert(f("createdDate").dataType == TimestampType)
    assert(f("trackedDate").dataType == DateType)
    assert(f("dates-duration").dataType == LongType)
    assert(f("hours").dataType == DoubleType)
    assert(f("deleted").dataType == BooleanType)
    assert(f("primaryEmail").dataType == StringType) // email -> plain string
    assert(st.fieldNames.contains("details-Attached To Name")) // spaces kept
  }

  test("handles nested objects and arrays") {
    val schema = """{
      "type": "object",
      "properties": {
        "dates": {"type": ["null", "object"], "properties": {
          "start": {"type": ["null", "string"], "format": "date-time"}}},
        "tags": {"type": ["null", "array"], "items": {"type": ["null", "string"]}}
      }
    }"""
    val st = JsonSchema.toStructType(schema)
    assert(st("dates").dataType.isInstanceOf[StructType])
    assert(st("tags").dataType == ArrayType(StringType, containsNull = true))
  }
}
