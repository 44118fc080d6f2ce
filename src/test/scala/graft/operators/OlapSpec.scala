package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OlapSpec extends SparkSpec {
  import spark.implicits._

  private def ordersOf(rows: Seq[(Long, Long, Double, String)]) =
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "_d")
      .withColumn("o_orderdate", to_timestamp(col("_d"))).drop("_d")

  private val customer = Seq(
    (1L, 10), (2L, 10), (3L, 20)
  ).toDF("c_custkey", "c_nationkey")
    .withColumn("c_mktsegment",
      when(col("c_custkey") === 1L, "AUTOMOBILE").otherwise("BUILDING"))

  private val nation =
    Seq((10, "ALPHA"), (20, "BETA")).toDF("n_nationkey", "n_name")

  test("rollupRevenue (x157): detail + per-nation subtotal + grand " +
      "total levels, rolled-up dims read ALL, sums exact") {
    val orders = ordersOf(Seq(
      (1L, 1L, 10.0, "1995-03-01"), (2L, 2L, 20.0, "1996-07-01"),
      (3L, 3L, 5.0, "1995-05-01")))
    val out = Olap.rollupRevenue(orders, customer, nation)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out === Map(
      ("ALPHA", "1995", 0) -> (1L, 10.0),
      ("ALPHA", "1996", 0) -> (1L, 20.0),
      ("BETA", "1995", 0) -> (1L, 5.0),
      ("ALPHA", "ALL", 1) -> (2L, 30.0),
      ("BETA", "ALL", 1) -> (1L, 5.0),
      ("ALL", "ALL", 2) -> (3L, 35.0)))
  }

  test("segmentPivot (x158): one column per declared segment, empty " +
      "cells NULL, undeclared segments dropped") {
    val orders = ordersOf(Seq(
      (1L, 1L, 10.0, "1995-03-01"), // AUTOMOBILE 1995
      (2L, 2L, 20.0, "1995-07-01"), // BUILDING 1995
      (3L, 2L, 40.0, "1996-07-01"))) // BUILDING 1996
    val out = Olap.segmentPivot(orders, customer,
      Seq("AUTOMOBILE", "BUILDING", "MACHINERY"))
    assert(out.columns.toSeq === Seq("order_year", "automobile_rev",
      "building_rev", "machinery_rev"))
    val rows = out.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows === Map(
      1995L -> (Some(10.0), Some(20.0), None),
      1996L -> (None, Some(40.0), None)))
  }

  test("profileCard (x159): per-column nulls/distinct/min-max in one " +
      "pass; numeric and string families fill their own stat pair") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (None, Some("c")), (Some(2L), Some("a"))
    ).toDF("num", "s")
    val out = Olap.profileCard(df, numCols = Seq("num"),
      strCols = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = out("num")
    assert((n.getLong(1), n.getLong(2), n.getLong(3)) === ((4L, 1L, 2L)))
    assert((n.getDouble(4), n.getDouble(5)) === ((1.0, 2.0)))
    assert(n.isNullAt(6) && n.isNullAt(7))
    val s = out("s")
    assert((s.getLong(1), s.getLong(2), s.getLong(3)) === ((4L, 1L, 2L)))
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert((s.getString(6), s.getString(7)) === (("a", "c")))
  }

  test("chiSquare (x170): a perfectly dependent 2x2 reads chi2 = n " +
      "(zero cells included); an independent table reads chi2 = 0") {
    val dep = (Seq.fill(10)(("a1", "b1")) ++ Seq.fill(10)(("a2", "b2")))
      .toDF("da", "db")
    val d = Olap.chiSquare(dep, "da", "db").collect().head
    assert((d.getLong(0), d.getLong(3)) === ((20L, 1L))) // n, dof
    assert(d.getDouble(4) === 20.0) // = n for perfect dependence
    val ind = (for { a <- Seq("a1", "a2"); b <- Seq("b1", "b2") }
      yield Seq.fill(5)((a, b))).flatten.toDF("da", "db")
    assert(Olap.chiSquare(ind, "da", "db").collect().head
      .getDouble(4) === 0.0)
  }

  test("paretoFront (x160): keeps exactly the non-dominated parts; " +
      "equal-on-both-axes parts both survive (neither dominates)") {
    val part = Seq(
      (1L, 1, 10.0), // frontier (smallest size)
      (2L, 2, 20.0), // frontier (price beats every smaller size)
      (3L, 2, 15.0), // dominated by part 2 (same size, cheaper retail)
      (4L, 3, 20.0), // dominated by part 2 (bigger, no better price)
      (5L, 3, 25.0), // frontier
      (6L, 1, 10.0)  // ties part 1 on both axes — not dominated
    ).toDF("p_partkey", "p_size", "p_retailprice")
    val keys = Olap.paretoFront(part).collect().map(_.getLong(0)).toSet
    assert(keys === Set(1L, 2L, 5L, 6L))
  }

  test("mutualInformation (x197): perfectly dependent columns read " +
      "MI = H(A) = H(B) = ln 2 on the grid; independent columns " +
      "read exactly zero") {
    import spark.implicits._
    // A == B over two symbols, two rows each: MI saturates at ln 2
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val d = Olap.mutualInformation(dep, "a", "b").collect().head
    assert(d.getLong(0) === 4L)
    // 2 cells x fpRound6(0.5 * ln 2) = 2 x 0.346574
    assert(d.getDouble(1) === 0.693148)
    assert(d.getDouble(2) === d.getDouble(1)) // h_a == mi at saturation
    assert(d.getDouble(3) === d.getDouble(1))
    // uniform independent 2x2: every cell term is ln(1) = 0
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val i = Olap.mutualInformation(ind, "a", "b").collect().head
    assert(i.getDouble(1) === 0.0)
    assert(i.getDouble(2) === 0.693148 && i.getDouble(3) === 0.693148)
  }
}
