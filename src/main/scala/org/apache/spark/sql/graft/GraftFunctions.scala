package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the custom Catalyst expressions: registers
  * `vec_dot(a, b)` and `sorted_intersect_size(a, b)` so `spark.sql` users
  * get the codegen'd kernels too.
  *
  * Two registration paths:
  *  - [[GraftFunctions.register]]: per-session temp functions (works on an
  *    already-built session — used by tests and notebooks);
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` installer for
  *    cluster deployment via `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
object GraftFunctions {

  /** Extract a literal int argument (k, numPerms, keep — structural
    * parameters that shape the kernel, so they must be constants). */
  private def intLit(e: Expression, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => FloatVecDot(es(0), es(1))),
    "sorted_intersect_size" -> (es => SortedStringArrayIntersectSize(es(0), es(1))),
    "sorted_long_intersect_size" -> (es => SortedLongArrayIntersectSize(es(0), es(1))),
    "shingle_set" -> (es => ShingleSetExpr(es(0), intLit(es(1), "k"))),
    "shingle_hash_set" -> (es => ShingleHashSetExpr(es(0), intLit(es(1), "k"))),
    "minhash_sig" -> (es => MinHashSigExpr(es(0), intLit(es(1), "numPerms"))),
    "minhash_sig_hashes" -> (es =>
      MinHashSigFromHashesExpr(es(0), intLit(es(1), "numPerms"))),
    "simhash64" -> (es => SimHash64Expr(es(0))),
    "smallest_digests" -> (es => SmallestDigestsExpr(es(0), intLit(es(1), "keep"))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => FloatVecDot(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedStringArrayIntersectSize].getName,
        "sorted_intersect_size"),
      (es: Seq[Expression]) => SortedStringArrayIntersectSize(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64Expr(es(0))))
  }
}
