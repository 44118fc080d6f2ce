package graft.sources

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("readPaginated drains cursor pages in order (S1/S2)") {
    val pages = Map(
      None -> (Seq("""{"id": 1}""", """{"id": 2}"""), Some("p2")),
      Some("p2") -> (Seq("""{"id": 3}"""), Some("p3")),
      Some("p3") -> (Seq.empty[String], None))
    val fetcher = new Sources.PageFetcher {
      def fetch(t: Option[String]) = pages(t)
    }
    val out = Sources.readPaginated(spark, fetcher)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("readPaginated lands a many-page fetch incrementally (bounded driver buffer)") {
    val nPages = 40
    val perPage = 10
    val fetcher = new Sources.PageFetcher {
      def fetch(t: Option[String]) = {
        val i = t.map(_.toInt).getOrElse(0)
        val recs = (0 until perPage).map(j => s"""{"id": ${i * perPage + j}}""")
        (recs, if (i + 1 < nPages) Some((i + 1).toString) else None)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("spill")
    // threshold of 25 records => the 400-record fetch must flush to files
    val out = Sources.readPaginated(spark, fetcher,
      spillThresholdRecords = 25, spillDir = Some(dir))
    assert(out.count() == (nPages * perPage).toLong)
    assert(out.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == (0L until (nPages * perPage)).sum)
    val files = jsonlFilesUnder(dir)
    // threshold=25 trips at 30 buffered records (3 pages) => ~13 flushes
    // plus the remainder — the fetch landed in many bounded slices
    assert(files.length >= 10,
      s"expected many spill files, got ${files.length}")
  }

  private def jsonlFilesUnder(dir: java.nio.file.Path): Seq[String] = {
    val w = java.nio.file.Files.walk(dir)
    try w.toArray.map(_.toString).filter(_.endsWith(".jsonl")).toSeq
    finally w.close()
  }

  private def seqFetcher(records: Seq[String]): Sources.PageFetcher =
    new Sources.PageFetcher {
      def fetch(t: Option[String]) = (records, None)
    }

  test("reused spillDir never mixes a previous fetch's records in") {
    val dir = java.nio.file.Files.createTempDirectory("spill-reuse")
    val first = Sources.readPaginated(spark,
      seqFetcher(Seq("""{"id": 1}""", """{"id": 2}""")),
      spillThresholdRecords = 0, spillDir = Some(dir))
    assert(first.count() == 2)
    // same caller-supplied spillDir, second run: result must be ONLY the
    // second fetch's records (per-call subdirectory isolation)
    val second = Sources.readPaginated(spark,
      seqFetcher(Seq("""{"id": 10}""", """{"id": 11}""", """{"id": 12}""")),
      spillThresholdRecords = 0, spillDir = Some(dir))
    assert(second.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 11L, 12L))
    assert(first.count() == 2) // first result still readable, still 2 rows
  }

  test("spill threshold also trips on buffered chars (few huge records)") {
    val big = """{"pad": """" + "x" * 200000 + """"}"""
    val nPages = 6
    val fetcher = new Sources.PageFetcher {
      def fetch(t: Option[String]) = {
        val i = t.map(_.toInt).getOrElse(0)
        (Seq(big), if (i + 1 < nPages) Some((i + 1).toString) else None)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("spill-bytes")
    // record threshold would buffer all 6; the 300k-char threshold must
    // flush every couple of pages => several bounded spill files
    val out = Sources.readPaginated(spark, fetcher,
      spillThresholdRecords = 100000, spillDir = Some(dir),
      spillThresholdChars = 300000L)
    assert(out.count() == nPages.toLong)
    assert(jsonlFilesUnder(dir).length >= 2,
      "huge records must flush on the char threshold")
  }

  test("records with raw newlines parse identically on both paths") {
    val pretty = "{\n  \"id\": 7,\r\n  \"name\": \"a b\"\n}"
    val inMem = Sources.readPaginated(spark, seqFetcher(Seq(pretty)))
    val spilled = Sources.readPaginated(spark, seqFetcher(Seq(pretty)),
      spillThresholdRecords = 0)
    for (out <- Seq(inMem, spilled)) {
      val r = out.select("id", "name").head()
      assert(r.getLong(0) == 7L && r.getString(1) == "a b")
      assert(out.columns.toSet == Set("id", "name"), "no corrupt-record rows")
    }
  }

  test("readPaginated keeps small fetches on the in-memory fast path") {
    val fetcher = new Sources.PageFetcher {
      def fetch(t: Option[String]) = (Seq("""{"id": 1}"""), None)
    }
    val dir = java.nio.file.Files.createTempDirectory("nospill")
    val out = Sources.readPaginated(spark, fetcher, spillDir = Some(dir))
    assert(out.count() == 1)
    assert(!java.nio.file.Files.list(dir).findAny().isPresent, "no spill expected")
  }

  test("multiTenantUnion stamps tenant columns on every record (S3/T3)") {
    val base = Map(
      "t1" -> Seq((1L, "a")), "t2" -> Seq((2L, "b"), (3L, "c")))
    val out = Sources.multiTenantUnion(
      Seq(("t1", "Tenant One"), ("t2", "Tenant Two")),
      id => base(id).toDF("id", "v"))
    assert(out.count() == 3)
    val r = out.filter("id = 2").head()
    assert(r.getAs[String]("tenant_id") == "t2")
    assert(r.getAs[String]("tenant_name") == "Tenant Two")
  }

  test("intervalChunks fans out yearly [start, end) windows (S4)") {
    val out = Sources.intervalChunks(spark, "2021-01-01", "2023-06-01")
      .collect()
    assert(out.map(_.getDate(0).toString).toSeq ==
      Seq("2021-01-01", "2022-01-01", "2023-01-01"))
    assert(out.head.getDate(1).toString == "2022-01-01") // end = start + 1y
  }
}
