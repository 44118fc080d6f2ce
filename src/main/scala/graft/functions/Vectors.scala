package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorExpressions

/** Dense-vector math over `array<float>` columns, in double precision.
  *
  * The dot-product kernel is a custom codegen'd Catalyst expression
  * (graft.expressions.FloatVecDot) — Spark's higher-order functions
  * evaluate lambdas interpreted, which dominates cost at millions of pair
  * scorings. Accumulation order is the array order in every path, so
  * results are deterministic and reproducible across engines (needed for
  * the DuckDB oracle compare) and across re-executions.
  */
object Vectors {
  def dot(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n)
  }
}
