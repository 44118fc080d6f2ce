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
