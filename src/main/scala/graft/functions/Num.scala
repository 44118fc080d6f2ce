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
    round(sum(c.cast("decimal(38,6)")).cast("double") / count(lit(1)), scale)
}
