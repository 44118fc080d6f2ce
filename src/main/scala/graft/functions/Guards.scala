package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fail-fast scale guards for deliberately small-input exact operators.
  *
  * Some operators are correct-but-quadratic (all-pairs cosine) or
  * correct-but-memory-bound (exact sort-based percentiles): the right
  * tool on a small corpus and a scale-killer on a large one. Each has a
  * scale-path twin in the library; these guards make pointing the exact
  * variant at a large input an IMMEDIATE, explanatory error instead of a
  * cluster-melting job. Each guard costs one cheap counting job — noise
  * next to the exact operator it protects, and infinitely cheaper than
  * the O(n²) job it prevents.
  */
object Guards {

  /** Require `df` to have at most `maxRows` rows; names the scale path
    * in the error. Returns the row count (callers often want it). */
  def requireSmall(df: DataFrame, maxRows: Long, op: String,
                   scalePath: String): Long = {
    val n = df.count()
    require(n <= maxRows,
      s"$op is the small-corpus exact variant: input has $n rows " +
        s"(> maxRows=$maxRows). Use $scalePath at scale, or raise " +
        "maxRows explicitly if the quadratic/sort cost is intended.")
    n
  }

  /** Require no group of `groupCol` to exceed `maxGroupRows` rows —
    * the guard for per-group-sort aggregates (exact percentiles buffer
    * every group value in one task). */
  def requireSmallGroups(df: DataFrame, groupCol: String, maxGroupRows: Long,
                         op: String, scalePath: String): Unit = {
    val top = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(1).collect()
    top.headOption.foreach { r =>
      val n = r.getLong(1)
      require(n <= maxGroupRows,
        s"$op buffers every group value in one task: group " +
          s"'${r.get(0)}' has $n rows (> maxGroupRows=$maxGroupRows). " +
          s"Use $scalePath at scale, or raise maxGroupRows explicitly.")
    }
  }
}
