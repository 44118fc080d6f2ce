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

  /** Cosine from PRE-COMPUTED norms: in an all-pairs join each vector's
    * norm is identical across its n-1 pairs, so computing it once in the
    * projection before the join does a third of [[cosine]]'s per-pair
    * work — and because `sqrt`/`*`//` are IEEE-exact-rounded over the
    * same inputs, the result is bit-identical to [[cosine]]. */
  def cosinePrenormed(a: Column, b: Column, normA: Column,
                      normB: Column): Column = {
    val n = normA * normB
    when(n > 0, dot(a, b) / n)
  }
}
