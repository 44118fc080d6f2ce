package graft.operators

import graft.SparkSpec

class SubstreamsSpec extends SparkSpec {
  import spark.implicits._

  test("extract explodes list field into child rows with composite key (E1/E2)") {
    val parent = Seq(
      ("p1", Seq(("c1", 1.0), ("c2", 2.0))),
      ("p2", Seq(("c3", 3.0))),
      ("p3", Seq.empty[(String, Double)]))
      .toDF("pid", "children")
      .selectExpr("pid",
        "transform(children, c -> named_struct('cid', c._1, 'v', c._2)) as children")
    val out = Substreams.extract(parent, "pid", "children", "cid")
    assert(out.columns.toSet == Set("parent_id", "cid", "v", "id"))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("id")).toSeq ==
      Seq("p1_c1", "p1_c2", "p2_c3")) // empty-list parent contributes none
    // multiplicity: child count == sum of list sizes
    assert(out.count() == 3)
  }

  test("fromChildTable projects FK + synthesizes composite key (Q4)") {
    val child = Seq((10L, 1, 5.0), (10L, 2, 6.0), (11L, 1, 7.0))
      .toDF("okey", "line", "qty")
    val out = Substreams.fromChildTable(child, "okey", "line", Seq("line", "qty"))
    assert(out.columns.toSet == Set("parent_id", "line", "qty", "id"))
    assert(out.orderBy("id").collect().map(_.getAs[String]("id")).toSeq ==
      Seq("10_1", "10_2", "11_1"))
  }
}
