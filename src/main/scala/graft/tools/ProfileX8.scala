package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TextExpressions, VectorExpressions}

import graft.Tables
import graft.functions.{Num, Par}

/** Dev profiling main for the kernel-based x8 (jaccardPairs) stages. */
object ProfileX8 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.LocalSession.build(cpus)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val threshold = 0.5
    val docs = Tables(spark, sfDir, "documents")
    val sets = Par.spread(docs)
      .select(col("doc_id"), TextExpressions.shingleHashSet(col("text"), 3).as("sh"))
      .withColumn("n", size(col("sh")))
      .filter(col("n") > 0)
      .cache()
    time("sets (kernel)") { sets.count() }
    val inv = sets.select(col("doc_id"), col("n"), explode(col("sh")).as("s")).cache()
    time("inv explode") { inv.count() }
    val freq = inv.groupBy(col("s")).agg(count(lit(1)).as("df")).cache()
    time("freq") { freq.count() }
    val wOrder = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val prefix = inv.join(freq, "s")
      .withColumn("pos", row_number().over(wOrder))
      .filter(col("pos") <=
        col("n") - ceil(lit(threshold) * col("n")).cast("int") + lit(1))
      .select(col("doc_id"), col("n"), col("s"))
      .cache()
    time("prefix (join+window)") { prefix.count() }
    val a = prefix.alias("a"); val b = prefix.alias("b")
    val candidates = a.join(b,
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= lit(threshold) * col("a.n") &&
          col("a.n") >= lit(threshold) * col("b.n"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
      .cache()
    time("candidates (self-join)") { candidates.count() }
    val inter = TextExpressions.sortedLongIntersectSize(col("sh1"), col("sh2"))
    val out = candidates
      .join(broadcast(sets.select(col("doc_id").as("doc1"), col("sh").as("sh1"),
        col("n").as("n1"))), "doc1")
      .join(broadcast(sets.select(col("doc_id").as("doc2"), col("sh").as("sh2"),
        col("n").as("n2"))), "doc2")
      .withColumn("inter", inter)
      .withColumn("jaccard", Num.fpRound(
        col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
    time("verify") { out.queryExecution.toRdd.foreach(_ => ()) }
    spark.stop()
  }
}
