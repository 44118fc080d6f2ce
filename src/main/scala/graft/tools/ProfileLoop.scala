package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev main: run one registered query N times in a single JVM to separate
  * JIT/codegen warmup from steady-state (Bench times each query once). */
object ProfileLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = sys.env.getOrElse("SPARK_GRAFT_Q", "x8_ngram_jaccard")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = graft.LocalSession.build(cpus)
    // per-stage wall/cpu report: where does a cold first run spend time?
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (si.completionTime.getOrElse(0L) -
            si.submissionTime.getOrElse(0L)) / 1e3
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          val run = si.taskMetrics.executorRunTime / 1e3
          System.err.println(
            f"[stage] id=${si.stageId}%-4d wall=$wall%6.2f run=$run%7.2f cpu=$cpu%7.2f  ${si.name.take(60)}")
        }
      })
    name.split(',').map(_.trim).filter(_.nonEmpty).foreach { q =>
      val fn = SparkEntry.queries(q)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        System.err.println(f"[loop] $q rep $i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
