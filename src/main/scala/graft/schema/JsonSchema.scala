package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Singer JSON-Schema → Spark StructType converter (SURVEY §7.1 step 1).
  *
  * Mirrors the reference's declared-schema contract (the `schemas` JSON
  * files in each tap, loaded at `internal.py:38-47`): flat property maps,
  * `["null", T]` type
  * unions for nullability, `format: date-time`/`date` refinements, and
  * `additionalProperties: false` closed-world semantics (enforcement is
  * projection — see graft.operators.Project). Field names are preserved
  * verbatim, including `-`-joined flattened keys and keys with spaces
  * (`details-Attached To Name`, FIXTURES.md §A).
  */
object JsonSchema {

  /** Parse a JSON-Schema document (the content of a stream schema file). */
  def toStructType(jsonSchema: String): StructType = {
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(jsonSchema)
    objectToStruct(root)
  }

  private def objectToStruct(node: JValue): StructType = {
    val props = (node \ "properties") match {
      case JObject(fields) => fields
      case _ => Nil
    }
    StructType(props.map { case (name, spec) =>
      val (dt, nullable) = fieldType(spec)
      StructField(name, dt, nullable)
    })
  }

  /** Resolve one property spec to (DataType, nullable). */
  private def fieldType(spec: JValue): (DataType, Boolean) = {
    val types: Seq[String] = (spec \ "type") match {
      case JString(t) => Seq(t)
      case JArray(ts) => ts.collect { case JString(t) => t }
      case _ => Seq("string")
    }
    val nullable = types.contains("null") || types.isEmpty
    val concrete = types.filterNot(_ == "null").headOption.getOrElse("string")
    val format = (spec \ "format") match {
      case JString(f) => Some(f)
      case _ => None
    }
    val dt: DataType = concrete match {
      case "string" => format match {
        case Some("date-time") => TimestampType
        case Some("date") => DateType
        case _ => StringType // email/uri etc: no semantic type in Spark
      }
      case "number" => DoubleType
      case "integer" => LongType
      case "boolean" => BooleanType
      case "object" => objectToStruct(spec)
      case "array" =>
        val (et, en) = fieldType(spec \ "items")
        ArrayType(et, containsNull = en)
      case _ => StringType
    }
    (dt, nullable)
  }
}
