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

  test("deleteFromBm25Index (x214): post-delete serving rows are " +
      "bit-identical to a from-scratch rebuild of the reduced corpus " +
      "— postings AND the 1-row scoring stats both fold") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (post1, stats1) =
      ("graft_idx_test.bm25_post_del", "graft_idx_test.bm25_stats_del")
    val (post2, stats2) =
      ("graft_idx_test.bm25_post_dreb", "graft_idx_test.bm25_stats_dreb")
    Seq(post1, stats1, post2, stats2).foreach(dropIdxTable)
    Retrieval.writeBm25Index(docs, "doc_id", "text", post1, stats1,
      numBuckets = 2)
    // takedown: docs 3+ leave; the deleted docs' text drives the
    // stats fold (the append arithmetic, negated)
    Retrieval.deleteFromBm25Index(spark, docs.filter(col("doc_id") > 2),
      "doc_id", "text", post1, stats1)
    Retrieval.writeBm25Index(docs.filter(col("doc_id") <= 2), "doc_id",
      "text", post2, stats2, numBuckets = 2)
    def serve(post: String, stats: String) =
      Retrieval.bm25TopKIndexed(spark, post, stats,
        Seq("apple", "banana", "cherry"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    assert(serve(post1, stats1) === serve(post2, stats2))
    assert(serve(post1, stats1).nonEmpty)
    // both physical artifacts match the rebuild, row for row
    assert(spark.table(post1).collect().map(_.toSeq).toSet ===
      spark.table(post2).collect().map(_.toSeq).toSet)
    assert(spark.table(stats1).collect().map(_.toSeq) ===
      spark.table(stats2).collect().map(_.toSeq))
    Seq(post1, stats1, post2, stats2).foreach(dropIdxTable)
  }

  test("deleteFromBm25IndexVersioned: killed at every step boundary the " +
      "postings/stats PAIR stays consistent (the old snapshot — never a " +
      "torn mix); the rerun converges bit-identical to a rebuild; a " +
      "replay is a no-op") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val ledger = "graft_idx_test.bm25_vd_ledger"
    val (postB, statsB) =
      ("graft_idx_test.bm25_post_vd", "graft_idx_test.bm25_stats_vd")
    val (postR, statsR) =
      ("graft_idx_test.bm25_post_vreb", "graft_idx_test.bm25_stats_vreb")
    val all = Seq(ledger, postR, statsR) ++
      Seq(postB, statsB).flatMap(b => Seq(b, b + "_v1", b + "_v2", b + "_v3"))
    all.foreach(dropIdxTable)
    assert(Retrieval.writeBm25IndexVersioned(spark, docs, "doc_id",
      "text", ledger, "bm25", postB, statsB, numBuckets = 2))
    Retrieval.writeBm25Index(docs.filter(col("doc_id") <= 2), "doc_id",
      "text", postR, statsR, numBuckets = 2)
    def serveV() = Retrieval.bm25TopKIndexedVersioned(spark, ledger,
        "bm25", postB, statsB, Seq("apple", "banana", "cherry"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val preDelete = serveV()
    val deleted = docs.filter(col("doc_id") > 2)
    // kill after each staging write: the pair serves the OLD snapshot —
    // in particular after "postings", where the unversioned form would
    // serve new postings against stale stats (skewed IDF for every doc)
    Seq("postings", "stats").foreach { s =>
      val ex = intercept[IllegalStateException] {
        Retrieval.deleteFromBm25IndexVersioned(spark, deleted, "doc_id",
          "text", ledger, "bm25", postB, statsB,
          crashAfterStep = Some(s))
      }
      assert(ex.getMessage.contains(s))
      assert(serveV() === preDelete, s"torn pair after crash at $s")
    }
    // kill right after the commit; the rerun is a ledger no-op, not a
    // second stats subtraction
    intercept[IllegalStateException] {
      Retrieval.deleteFromBm25IndexVersioned(spark, deleted, "doc_id",
        "text", ledger, "bm25", postB, statsB,
        crashAfterStep = Some("publish"))
    }
    assert(!Retrieval.deleteFromBm25IndexVersioned(spark, deleted,
      "doc_id", "text", ledger, "bm25", postB, statsB))
    // served rows and both physical artifacts equal the from-scratch
    // rebuild of the reduced corpus
    assert(serveV() === Retrieval.bm25TopKIndexed(spark, postR, statsR,
      Seq("apple", "banana", "cherry"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    val (postV, statsV) = Retrieval.resolveBm25Index(spark, ledger,
      "bm25", postB, statsB)
    assert(postV === postB + "_v2" && statsV === statsB + "_v2")
    assert(spark.table(postV).collect().map(_.toSeq).toSet ===
      spark.table(postR).collect().map(_.toSeq).toSet)
    assert(spark.table(statsV).collect().map(_.toSeq) ===
      spark.table(statsR).collect().map(_.toSeq))
    all.foreach(dropIdxTable)
  }

  test("deleteFromBm25IndexVersioned alias guard: delete -> re-ingest " +
      "-> direct identical delete throws AliasedBatchId; genuine " +
      "replay (keys gone) no-ops; a captured salted id applies") {
    import graft.operators.Snapshots
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val ledger = "graft_idx_test.bm25_ag_ledger"
    val (postB, statsB) =
      ("graft_idx_test.bm25_post_ag", "graft_idx_test.bm25_stats_ag")
    val all = Seq(ledger) ++ Seq(postB, statsB)
      .flatMap(b => b +: (1 to 4).map(v => s"${b}_v$v"))
    all.foreach(dropIdxTable)
    assert(Retrieval.writeBm25IndexVersioned(spark, docs, "doc_id",
      "text", ledger, "bm25a", postB, statsB, numBuckets = 2))
    val deleted = docs.filter(col("doc_id") > 2)
    assert(Retrieval.deleteFromBm25IndexVersioned(spark, deleted,
      "doc_id", "text", ledger, "bm25a", postB, statsB))
    // genuine replay: keys gone, quiet no-op
    assert(!Retrieval.deleteFromBm25IndexVersioned(spark, deleted,
      "doc_id", "text", ledger, "bm25a", postB, statsB))
    // re-ingest: a new build snapshot carrying the docs again,
    // published under the ingest's own batch id
    val next = Snapshots.currentVersion(spark, ledger, "bm25a") + 1
    Retrieval.writeBm25Index(docs, "doc_id", "text",
      Snapshots.tableAt(postB, next), Snapshots.tableAt(statsB, next),
      numBuckets = 2)
    Snapshots.publish(spark, ledger, "bm25a", next, "reingest-1",
      "build")
    // direct identical delete: same content id, keys served -> loud
    val ex = intercept[Snapshots.AliasedBatchId] {
      Retrieval.deleteFromBm25IndexVersioned(spark, deleted, "doc_id",
        "text", ledger, "bm25a", postB, statsB)
    }
    assert(ex.getMessage.contains("deleteFromLandingWithCapture"))
    // the salted captured id applies the repeat delete cleanly
    val bid = Snapshots.batchIdFor(deleted.select(col("doc_id")),
      Snapshots.currentVersion(spark, ledger, "bm25a"))
    assert(Retrieval.deleteFromBm25IndexVersioned(spark, deleted,
      "doc_id", "text", ledger, "bm25a", postB, statsB,
      batchId = Some(bid)))
    val (postV, _) = Retrieval.resolveBm25Index(spark, ledger, "bm25a",
      postB, statsB)
    assert(spark.table(postV).filter(col("doc_id") > 2).isEmpty)
    all.foreach(dropIdxTable)
  }

  test("bm25TopKPerQueryIndexed (x135): an out-of-corpus query matches " +
      "the single-query indexed form; ranks are dense from 1") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (post, stats) =
      ("graft_idx_test.bm25_post_pq", "graft_idx_test.bm25_stats_pq")
    Seq(post, stats).foreach(dropIdxTable)
    Retrieval.writeBm25Index(docs, "doc_id", "text", post, stats,
      numBuckets = 2)
    // query id 99 is not a corpus doc, so self-exclusion is a no-op and
    // the per-query ranking must equal the single-query form's order
    val queries = Seq((99L, "apple banana cherry")).toDF("doc_id", "text")
    val perQ = Retrieval.bm25TopKPerQueryIndexed(spark, post, stats,
      queries, "doc_id", "text", topK = 10)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val single = Retrieval.bm25TopKIndexed(spark, post, stats,
      Seq("apple", "banana", "cherry"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(perQ.map(_._1).distinct === Seq(99L))
    assert(perQ.map(_._4) === (1L to perQ.length.toLong))
    assert(perQ.map(t => (t._2, t._3, t._5)) === single)
  }

  test("bm25TopKPerQueryIndexed: a query never retrieves its own doc; " +
      "maxDf prunes corpus-wide stopword terms") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (post, stats) =
      ("graft_idx_test.bm25_post_pq2", "graft_idx_test.bm25_stats_pq2")
    Seq(post, stats).foreach(dropIdxTable)
    Retrieval.writeBm25Index(docs, "doc_id", "text", post, stats,
      numBuckets = 2)
    // doc 1's own text as the query: doc 1 itself must be excluded even
    // though it is the best lexical match for its own terms
    val self = Retrieval.bm25TopKPerQueryIndexed(spark, post, stats,
      docs.filter(col("doc_id") === 1), "doc_id", "text", topK = 10)
      .collect()
    assert(self.forall(_.getLong(1) != 1L),
      "query retrieved its own document")
    // df(apple)=2, df(plain)=1: maxDf=1 keeps only 'plain' -> only doc 4
    val pruned = Retrieval.bm25TopKPerQueryIndexed(spark, post, stats,
      Seq((99L, "apple plain")).toDF("doc_id", "text"),
      "doc_id", "text", topK = 10, maxDf = Some(1L))
      .collect().map(_.getLong(1)).toSeq
    assert(pruned === Seq(4L), s"expected only the rare-term doc: $pruned")
    // the serving plan prunes postings buckets via the collected IN set
    val p = Retrieval.bm25TopKPerQueryIndexed(spark, post, stats,
      docs.filter(col("doc_id") === 1), "doc_id", "text", topK = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount"),
      s"term IN set should prune postings buckets:\n$p")
  }

  /** The rrfFuse numeric law, re-derived in plain Scala. */
  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def recip(rank: Long): Double = r6(1.0 / (60.0 + rank))

  test("rrfFuse (x135): reciprocal-rank sum with NULL-safe leg misses " +
      "and (score desc, id) re-rank") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 11L, 1L, 0.9), (1L, 12L, 2L, 0.8))
      .toDF("query_id", "neighbor_id", "rank", "similarity")
    val out = Retrieval.rrfFuse(lex, vec, topK = 10)
      .orderBy(col("fused_rank")).collect()
    // doc 11 is in both legs -> two reciprocals; 10 and 12 one each
    val expect = Seq(
      (11L, Option(2L), Option(1L), r6(recip(2) + recip(1))),
      (10L, Option(1L), None, r6(recip(1) + 0.0)),
      (12L, None, Option(2L), r6(0.0 + recip(2))))
    assert(out.length === 3)
    out.zip(expect).zipWithIndex.foreach { case ((row, e), i) =>
      assert(row.getLong(1) === e._1, s"doc order at $i")
      assert((if (row.isNullAt(2)) None else Some(row.getLong(2))) === e._2)
      assert((if (row.isNullAt(3)) None else Some(row.getLong(3))) === e._3)
      assert(row.getLong(4) === i + 1L)
      assert(row.getDouble(5) === e._4, s"rrf score at $i")
    }
  }

  test("hardNegatives (x136): dense-only hits survive the anti-join, " +
      "re-ranked hardest (most similar) first") {
    val vec = Seq(
      (1L, 10L, 1L, 0.9), (1L, 11L, 2L, 0.8), (1L, 12L, 3L, 0.7),
      (2L, 20L, 1L, 0.6))
      .toDF("query_id", "neighbor_id", "rank", "similarity")
    val lex = Seq((1L, 10L, 1L), (2L, 21L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.hardNegatives(vec, lex, topK = 5)
      .orderBy(col("query_id"), col("neg_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // q1: 10 is a lexical positive -> dropped; 11 (0.8) outranks 12 (0.7)
    // q2: its lexical positive 21 is not a dense hit -> 20 survives
    assert(out.toSeq === Seq(
      (1L, 11L, 1L, 0.8), (1L, 12L, 2L, 0.7), (2L, 20L, 1L, 0.6)))
  }

  test("contrastiveTriplets (x137): the lexical top-1 anchors the " +
      "positive; queries with no lexical hits form no triplet") {
    val vec = Seq(
      (1L, 10L, 1L, 0.9), (1L, 11L, 2L, 0.8), (1L, 12L, 3L, 0.7),
      (2L, 20L, 1L, 0.6))
      .toDF("query_id", "neighbor_id", "rank", "similarity")
    val lex = Seq((1L, 10L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.contrastiveTriplets(vec, lex, negK = 5)
      .orderBy(col("query_id"), col("neg_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // q1: positive = lexical top-1 (doc 10), negatives = dense-only
    // hits 11, 12; q2 has no lexical positive -> no triplet
    assert(out.toSeq === Seq((1L, 10L, 11L, 1L), (1L, 10L, 12L, 2L)))
  }

  test("legOverlap (x138): exact per-query counts and the 1e-6-rounded " +
      "Jaccard") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 11L, 1L, 0.9), (1L, 12L, 2L, 0.8))
      .toDF("query_id", "neighbor_id", "rank", "similarity")
    val out = Retrieval.legOverlap(lex, vec)
      .orderBy(col("query_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1L, 2L, 2L, 1L, r6(1.0 / 3.0)), // {10,11} vs {11,12}
      (2L, 1L, 0L, 0L, 0.0)))          // vec leg empty for q2
  }

  test("expansionTerms (x139): feedback docs' NEW terms only, scored " +
      "idf*fb_tf, tie-broken by term") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (post, stats) =
      ("graft_idx_test.bm25_post_prf", "graft_idx_test.bm25_stats_prf")
    Seq(post, stats).foreach(dropIdxTable)
    Retrieval.writeBm25Index(docs, "doc_id", "text", post, stats,
      numBuckets = 2)
    // query "apple" -> feedback docs 1 & 2; their other terms are all
    // df=1 fb_tf=1 -> identical scores, ranked by term ascending; the
    // query's own term never expands
    val out = Retrieval.expansionTerms(spark, post, stats,
      Seq((99L, "apple")).toDF("doc_id", "text"), "doc_id", "text",
      docs, fbK = 5, expandM = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(out.map(_._1).toSeq ===
      Seq("pie", "sauce", "tart", "toast", "with"))
    val expScore = r4(r4(math.log(1.0 + (4 - 1 + 0.5) / (1 + 0.5))) * 1.0)
    out.foreach { case (term, fbDf, fbTf, _, score) =>
      assert(fbDf === 1L && fbTf === 1L, term)
      assert(score === expScore, term)
    }
    assert(out.map(_._4).toSeq === (1L to 5L))
  }

  test("bm25TopKExpandedIndexed (x140): expansion reaches documents " +
      "sharing NO term with the original query") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (post, stats) =
      ("graft_idx_test.bm25_post_prf2", "graft_idx_test.bm25_stats_prf2")
    Seq(post, stats).foreach(dropIdxTable)
    val corpus = docs.union(
      Seq((5L, "split second decision")).toDF("doc_id", "text"))
    Retrieval.writeBm25Index(corpus, "doc_id", "text", post, stats,
      numBuckets = 2)
    val queries = Seq((99L, "banana")).toDF("doc_id", "text")
    // round 1 alone: only doc 3 contains "banana"
    val r1 = Retrieval.bm25TopKPerQueryIndexed(spark, post, stats,
      queries, "doc_id", "text", topK = 10).collect().map(_.getLong(1))
    assert(r1.toSeq === Seq(3L))
    // PRF: doc 3's "split" expands the query, reaching doc 5 — which
    // shares no term with the original query
    val expanded = Retrieval.bm25TopKExpandedIndexed(spark, post, stats,
      queries, "doc_id", "text", corpus, fbK = 5, expandM = 5, topK = 10)
      .collect().map(_.getLong(1))
    assert(expanded.contains(5L),
      s"expansion should reach doc 5: ${expanded.toSeq}")
    assert(expanded.contains(3L))
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
