package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession builder for the local harness mains (Bench, Verify,
  * profiling tools) — one place for the local-fixture tuning knobs so the
  * four mains can't drift.
  */
object LocalSession {
  def build(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing targets bytes; our compute-heavy shuffles are tiny
      // in bytes but expensive per row — keep them wide.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // LOCAL-FIXTURE knob: each fixture table is one small parquet file,
      // which the 128m default reads as ONE split — serializing scan-side
      // aggregation onto a single core. 1m gives the local plans the
      // multi-split parallelism a real corpus gets from many files. Do
      // NOT carry this to a real deployment: it caps split size per
      // splittable file, so large files would shred into thousands of
      // tiny tasks.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
