package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Par, Text}

/** Dev profiling main: times the internal stages of the heavy dedup
  * operators so optimization work targets the real bottleneck. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables(spark, sfDir, "documents")
    val tok = Par.spread(docs).select(col("doc_id"),
      posexplode(Text.tokens(col("text"))).as(Seq("pos", "t")))
    val wLead = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val inv0 = tok.select(col("doc_id"),
        concat_ws(" ", col("t"), lead(col("t"), 1).over(wLead),
          lead(col("t"), 2).over(wLead)).as("s"),
        lead(col("t"), 2).over(wLead).isNotNull.as("_full"))
      .filter(col("_full")).drop("_full")
      .dropDuplicates("doc_id", "s").cache()
    time("shingleInv (lead windows)") { inv0.count() }
    val sets = inv0.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("s"))).as("sh"))
      .withColumn("n", size(col("sh"))).cache()
    time("sets (collect+sort)") { sets.count() }
    val inv = sets.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s")).cache()
    time("inv explode") { inv.count() }
    val invh = inv.select(col("doc_id"), xxhash64(col("s")).as("h")).cache()
    time("invh hash-once") { invh.count() }

    // minhash signature stage
    val minCols = (0 until 80).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sigs = invh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until 80).map(i => col(s"m$i")): _*).as("sig"))
      .cache()
    time("minhash sigs (80 aggs)") { sigs.count() }
    val bands = sigs.select(col("doc_id"),
      posexplode(Text.lshBands(col("sig"), 20, 4)).as(Seq("band_idx", "band_key")))
    val x = bands.alias("x"); val y = bands.alias("y")
    val cand = x.join(y,
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2")).distinct()
      .cache()
    time("lsh candidates") { System.err.println("  n_cand=" + cand.count()) }
    val ver = cand
      .join(sets.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
      .join(sets.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
      .withColumn("j", size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
        size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("j") >= 0.8)
    time("exact verify") { System.err.println("  n_pairs=" + ver.count()) }

    // prefix filter stage (x8)
    val freq = inv.groupBy(col("s")).agg(count(lit(1)).as("df")).cache()
    time("shingle freq") { System.err.println("  n_distinct_shingles=" + freq.count()) }
    val wOrder = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val prefix = inv.join(freq, "s")
      .withColumn("pos", row_number().over(wOrder))
      .filter(col("pos") <= col("n") - ceil(lit(0.5) * col("n")).cast("int") + lit(1))
      .select(col("doc_id"), col("s")).cache()
    time("prefix index") { System.err.println("  n_prefix_rows=" + prefix.count()) }
    val a = prefix.alias("a"); val b = prefix.alias("b")
    val cand8 = a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2")).distinct().cache()
    time("prefix candidates") { System.err.println("  n_cand8=" + cand8.count()) }
    val ver8 = cand8
      .join(sets.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
      .join(sets.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
      .withColumn("j", size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
        size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("j") >= 0.5)
    time("exact verify x8") { System.err.println("  n_pairs8=" + ver8.count()) }
    spark.stop()
  }
}
