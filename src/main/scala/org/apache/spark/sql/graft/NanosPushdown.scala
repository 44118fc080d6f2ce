package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Optimizer rule restoring predicate pushdown through the NANOS-timestamp
  * workaround (graft.Tables reads parquet TIMESTAMP(NANOS) as a raw long
  * and rebuilds `timestamp_micros(ts div 1000)`).
  *
  * A watermark filter then compares a *computed* column, which the file
  * source cannot push — `PushedFilters` loses the range predicate and
  * row-group pruning with it. This rule rewrites comparisons of
  * `timestamp_micros(col div 1000)` against a timestamp literal into
  * equivalent comparisons on the raw nanosecond long, which FileSourceStrategy
  * then pushes into the parquet reader.
  *
  * Equivalences (n = nanos long, m = floor(n/1000), T = literal micros;
  * valid for non-negative n, which epoch-nanos fixtures satisfy —
  * IntegralDivide truncates toward zero):
  *   m >  T  ⟺  n >= (T+1)*1000
  *   m >= T  ⟺  n >= T*1000
  *   m <  T  ⟺  n <  T*1000
  *   m <= T  ⟺  n <  (T+1)*1000
  */
object NanosPushdown extends Rule[LogicalPlan] {

  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(c, Literal(1000, IntegerType), _)) => Some(c)
      case MicrosToTimestamp(IntegralDivide(c, Literal(1000L, LongType), _)) => Some(c)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case Cast(Literal(v: Long, TimestampType), TimestampType, _, _) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(MicrosOfNanos(c), TsLit(t)) =>
        GreaterThanOrEqual(c, Literal((t + 1) * 1000L))
      case GreaterThanOrEqual(MicrosOfNanos(c), TsLit(t)) =>
        GreaterThanOrEqual(c, Literal(t * 1000L))
      case LessThan(MicrosOfNanos(c), TsLit(t)) =>
        LessThan(c, Literal(t * 1000L))
      case LessThanOrEqual(MicrosOfNanos(c), TsLit(t)) =>
        LessThan(c, Literal((t + 1) * 1000L))
      case LessThan(TsLit(t), MicrosOfNanos(c)) =>
        GreaterThanOrEqual(c, Literal((t + 1) * 1000L))
      case LessThanOrEqual(TsLit(t), MicrosOfNanos(c)) =>
        GreaterThanOrEqual(c, Literal(t * 1000L))
      case GreaterThan(TsLit(t), MicrosOfNanos(c)) =>
        LessThan(c, Literal(t * 1000L))
      case GreaterThanOrEqual(TsLit(t), MicrosOfNanos(c)) =>
        LessThan(c, Literal((t + 1) * 1000L))
    }

  /** Idempotently add the rule to a live session's optimizer. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(NanosPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NanosPushdown
    }
}
