package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class DatesSpec extends SparkSpec {
  import spark.implicits._

  private def parse(raw: String): Timestamp =
    Seq(raw).toDF("raw")
      .select(Dates.parseMsJsonDate(col("raw")).as("ts"))
      .head().getAs[Timestamp]("ts")

  test("parses /Date(ms)/ with +, -, and no offset — offset ignored (T1)") {
    val expected = Timestamp.valueOf("2023-01-01 00:00:00") // 1672531200000 UTC
    assert(parse("/Date(1672531200000+1300)/") == expected)
    assert(parse("/Date(1672531200000-0800)/") == expected)
    assert(parse("/Date(1672531200000)/") == expected)
  }

  test("parses pre-epoch (negative) millis") {
    assert(parse("/Date(-1000)/") == Timestamp.valueOf("1969-12-31 23:59:59"))
  }

  test("falls back to ISO-8601 for plain strings") {
    assert(parse("2023-06-15T12:30:00") == Timestamp.valueOf("2023-06-15 12:30:00"))
  }

  test("round-trips through toMsJsonDate") {
    val ts = Timestamp.valueOf("2024-03-01 08:30:15.123")
    val raw = Seq(ts).toDF("ts")
      .select(Dates.toMsJsonDate(col("ts"), "+1300").as("raw"))
      .head().getString(0)
    assert(raw.startsWith("/Date(") && raw.endsWith("+1300)/"))
    assert(parse(raw) == ts)
  }

  test("malformed input yields NULL, not a job failure (poison row)") {
    val out = Seq("/Date(notanumber)/", "garbage", "")
      .toDF("raw")
      .select(Dates.parseMsJsonDate(col("raw")).as("ts"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("toIsoMillis renders millisecond-Z form") {
    val out = Seq(Timestamp.valueOf("2024-03-01 08:30:15.123"))
      .toDF("ts").select(Dates.toIsoMillis(col("ts"))).head().getString(0)
    assert(out == "2024-03-01T08:30:15.123Z")
  }
}
