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

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => FloatVecDot(es(0), es(1))),
    "sorted_intersect_size" -> (es => SortedStringArrayIntersectSize(es(0), es(1))))

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
  }
}
