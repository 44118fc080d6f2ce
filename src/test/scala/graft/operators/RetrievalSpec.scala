package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, known term layout: "apple" in 1&2, "banana" only in 3,
  // "cherry" nowhere, doc 4 matches nothing.
  private lazy val docs = Seq(
    (1L, "apple pie apple tart"),
    (2L, "apple sauce with toast"),
    (3L, "banana split"),
    (4L, "plain bread loaf here")
  ).toDF("doc_id", "text")

  /** Reference BM25 re-derivation (plain Scala, not Catalyst): the
    * operator's numeric law — idf pre-rounded at 1e-4, tf-norm rounded,
    * contribution rounded, exact sum. */
  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def refBm25(tf: Long, df: Long, n: Long, dl: Long,
                      avgdl: Double, k1: Double = 1.2,
                      b: Double = 0.75): Double = {
    val idf = r4(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
    val tfn = r4(tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl)))
    r4(idf * tfn)
  }

  test("bm25TopK scores match the hand-derived law and rank correctly") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "banana", "cherry"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // avgdl = (4+4+2+4)/4 = 3.5 exactly
    val avgdl = 14.0 / 4.0
    val expected = Map(
      1L -> refBm25(tf = 2, df = 2, n = 4, dl = 4, avgdl),
      2L -> refBm25(tf = 1, df = 2, n = 4, dl = 4, avgdl),
      3L -> refBm25(tf = 1, df = 1, n = 4, dl = 2, avgdl))
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L)) // doc 4 absent
    out.foreach { case (id, nTerms, score) =>
      assert(nTerms === 1L)
      assert(score === expected(id), s"doc $id")
    }
    // rarer term (banana, df=1) outranks the common one at equal tf;
    // within apple, higher tf wins
    assert(expected(3L) > expected(2L))
    assert(expected(1L) > expected(2L))
  }

  test("bm25TopK respects topK with the (score desc, id asc) total order") {
    val top1 = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "banana"), topK = 1).collect()
    assert(top1.length === 1)
  }

  test("bm25TopK plans TakeOrderedAndProject, not a global sort") {
    val p = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("apple"), 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sourceQualityCap keeps at most n per source, merit-ranked") {
    val corpus = (1L to 30L).map { i =>
      val src = if (i <= 20) "a" else "b"
      // longer docs score higher on the length component
      val text = Seq.fill(i.toInt + 3)("the quick brown fox jumps")
        .mkString(" ")
      (i, src, text)
    }.toDF("doc_id", "source", "text")
    val out = Retrieval.sourceQualityCap(corpus, "doc_id", "text",
      "source", maxPerSource = 5)
    val rows = out.collect()
    val bySrc = rows.groupBy(_.getString(1))
    assert(bySrc("a").length === 5)
    assert(bySrc("b").length === 5)
    // ranks are 1..5 within each source and ordered by score desc
    bySrc.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to 5L))
      val byRank = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("contaminationPairs emits pair-grain overlaps at the threshold") {
    val corpus = Seq(
      (100L, "one two three four five six"), // shares 4 shingles w/ bench 1
      (101L, "one two three unrelated tail here"), // shares 1
      (102L, "nothing in common at all")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "one two three four five six seven"),
      (2L, "totally different benchmark item")
    ).toDF("doc_id", "text")
    val out = Retrieval.contaminationPairs(corpus, bench, "doc_id", "text",
      k = 3, threshold = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set((1L, 100L, 4L)))
    // threshold 1 admits the single-shingle pair too
    val loose = Retrieval.contaminationPairs(corpus, bench, "doc_id",
      "text", k = 3, threshold = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === Set((1L, 100L), (1L, 101L)))
  }

  test("contaminationPairs broadcasts the benchmark side") {
    val p = Retrieval.contaminationPairs(docs, docs.limit(1), "doc_id",
      "text", k = 3, threshold = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  private def dropIdxTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val Array(db, t) = name.split('.')
    val loc = java.nio.file.Paths.get("spark-warehouse", s"$db.db", t)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("indexed BM25 (x107): the persisted-index path returns identical " +
      "rows to the bootstrap form and never reads text") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (post, stats) =
      ("graft_idx_test.bm25_post", "graft_idx_test.bm25_stats")
    Seq(post, stats).foreach(dropIdxTable)
    Retrieval.writeBm25Index(docs, "doc_id", "text", post, stats,
      numBuckets = 2)
    val boot = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "banana", "cherry"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaIndex = Retrieval.bm25TopKIndexed(spark, post, stats,
      Seq("apple", "banana", "cherry"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaIndex === boot)
    // query-time plan: postings + stats tables only, no text kernels
    val p = Retrieval.bm25TopKIndexed(spark, post, stats, Seq("apple"), 5)
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("termcounts"), p)
    assert(p.contains("SelectedBucketsCount"),
      s"term filter should prune buckets:\n$p")
  }

  test("indexed BM25: incremental append equals the one-shot build " +
      "(the ingest-maintenance contract)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (post1, stats1) =
      ("graft_idx_test.bm25_post_full", "graft_idx_test.bm25_stats_full")
    val (post2, stats2) =
      ("graft_idx_test.bm25_post_incr", "graft_idx_test.bm25_stats_incr")
    Seq(post1, stats1, post2, stats2).foreach(dropIdxTable)
    // one-shot over the full corpus
    Retrieval.writeBm25Index(docs, "doc_id", "text", post1, stats1,
      numBuckets = 2)
    // incremental: build on batch 1 (docs 1-2), append batch 2 (3-4)
    Retrieval.writeBm25Index(docs.filter(col("doc_id") <= 2), "doc_id",
      "text", post2, stats2, numBuckets = 2)
    Retrieval.appendBm25Index(spark, docs.filter(col("doc_id") > 2),
      "doc_id", "text", post2, stats2, numBuckets = 2)
    def serve(post: String, stats: String) =
      Retrieval.bm25TopKIndexed(spark, post, stats,
        Seq("apple", "banana", "cherry"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val incremental = serve(post2, stats2)
    assert(incremental === serve(post1, stats1))
    assert(incremental.nonEmpty)
  }

  test("bm25Stats rejects an all-NULL-text corpus with a clear message") {
    val nulls = Seq((1L, null: String), (2L, null: String))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25Stats(nulls, "text", Seq("apple"))
    }
    assert(e.getMessage.contains("no tokenizable text"))
  }
}
