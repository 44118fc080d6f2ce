package graft.functions

import org.apache.spark.sql.DataFrame

/** Parallelism helper for compute-bound stages.
  *
  * A small parquet file arrives as ONE input split, so a per-row-expensive
  * operator (pair scoring, signature computation) would run on one core no
  * matter how many executors exist. A round-robin repartition to the
  * cluster's default parallelism before the expensive projection costs one
  * narrow exchange of the (small) input and buys full-width compute. At
  * 100 TB inputs already arrive as many splits; the repartition then only
  * rebalances and can be dropped by callers that pre-partition.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(target)
  }
}
