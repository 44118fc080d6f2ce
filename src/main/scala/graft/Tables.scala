package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Fixture-table loader (TESTDATA.md): one parquet file per table under the
  * scale-factor directory. Loading is a plain parquet scan so Catalyst gets
  * full pushdown (PushedFilters / ReadSchema) into the columnar reader.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's reader
  * rejects outright; we read it via the `nanosAsLong` escape hatch and
  * normalize back to a microsecond timestamp (truncation — the same
  * conversion DuckDB applies), keeping the column name and downstream
  * semantics identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // restore range-predicate pushdown through the nanos->micros rebuild
    org.apache.spark.sql.graft.NanosPushdown.install(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeNanos(df, "ts") else df
  }

  /** Nano-long epoch column → microsecond timestamp (floor division). */
  private def normalizeNanos(df: DataFrame, c: String): DataFrame =
    df.schema.find(_.name == c) match {
      case Some(StructField(_, LongType, _, _)) =>
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case _ => df
    }

  /** Register every fixture table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
