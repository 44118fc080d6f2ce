package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the query inventory.
  *
  * Floating-point sums are order-dependent, and Spark's shuffle order is
  * nondeterministic — so any double SUM that must hash-match an oracle is
  * computed by casting each (deterministic) per-row double addend to
  * DECIMAL(38,6), summing exactly, and casting the exact total back to
  * double. Both sides of the oracle compare use the identical recipe.
  */
object Num {
  /** Order-independent sum of a double expression. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(38,6)")).cast("double")

  /** Order-independent mean: exact decimal sum / count, rounded. */
  def davg(c: Column, scale: Int = 6): Column =
    fpRound(sum(c.cast("decimal(38,6)")).cast("double") / count(lit(1)), scale)

  /** Cross-engine-stable rounding: floor(x*10^n + 0.5)/10^n in plain IEEE
    * double ops. Engines disagree on round() exactly when the value sits
    * within one ulp of a decimal tie (Spark rounds the exact binary value
    * via BigDecimal; DuckDB multiplies first) — computing the *same* IEEE
    * expression on both sides makes the result identical by construction.
    * (Negative inputs round half toward +inf — consistently on both sides.)
    */
  def fpRound(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + lit(0.5)) / lit(p)
  }
}
