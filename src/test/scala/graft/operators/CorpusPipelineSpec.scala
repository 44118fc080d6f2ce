package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("composed pipeline applies every stage's filter (x42)") {
    val textA = (1 to 30).map(i => s"word$i").mkString(" ")
    val bench = (1 to 20).map(i => s"bench$i").mkString(" ")
    val docs = Seq(
      (5L, bench, "en"),                               // benchmark doc
      (20L, textA, "en"),                              // survives everything
      (21L, textA, "en"),                              // exact dup of 20
      (22L, textA + " extraword", "en"),               // near-dup (j=28/29)
      (23L, Seq.fill(30)("spam").mkString(" "), "en"), // repetition spam
      (24L, "too short", "en"),                        // under minChars
      (25L, bench + " with a long enough tail to pass the length gate", "en"),
      (26L, (31 to 60).map(i => s"word$i").mkString(" "), "xx") // 0% stratum
    ).toDF("doc_id", "text", "lang")
    val out = CorpusPipeline.prepare(
      corpus = docs.filter(col("doc_id") >= 20),
      benchmark = docs.filter(col("doc_id") < 20),
      idCol = "doc_id", textCol = "text",
      maxTopBigramFrac = 0.2, minChars = 100,
      shingleK = 3, neardupThreshold = 0.8,
      decontamThreshold = 3,
      groupCol = "lang", pctByGroup = Map("en" -> 100, "xx" -> 0),
      defaultPct = 100,
      chunkSize = 8, chunkStride = 4)
    val rows = out.collect()
    // 21 exact-deduped, 22 near-dup-dropped (rep = min id 20), 23 spam-
    // gated, 24 length-gated, 25 decontaminated, 26 sampled out => 20 only
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(20L))
    // 30 tokens, 8-token windows, stride 4: ceil((30-8)/4)+1 = 7 chunks
    assert(rows.map(_.getAs[Long]("chunk_idx")).sorted.toSeq == (0L to 6L))
    assert(out.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "chunk", "split"))
    // one deterministic split label per document, stamped on every chunk
    assert(rows.map(_.getAs[String]("split")).toSet.size == 1)
    assert(Set("train", "val", "test")
      .contains(rows.head.getAs[String]("split")))
    // chunk content comes from the surviving document's token stream
    assert(rows.forall(_.getAs[String]("chunk").split(" ")
      .forall(tok => tok.startsWith("word"))))
  }

  test("pipeline stages drop monotonically (fixture corpus smoke)") {
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = CorpusPipeline.prepare(
      corpus = d.filter(col("doc_id") >= 20),
      benchmark = d.filter(col("doc_id") < 20),
      idCol = "doc_id", textCol = "text",
      maxTopBigramFrac = 0.2, minChars = 100,
      shingleK = 3, neardupThreshold = 0.8,
      decontamThreshold = 3,
      groupCol = "lang", pctByGroup = Map("en" -> 50, "zh" -> 20),
      defaultPct = 10,
      chunkSize = 64, chunkStride = 48)
    val docsOut = out.select("doc_id").distinct().count()
    val corpusIn = d.filter(col("doc_id") >= 20).count()
    assert(docsOut > 0, "pipeline must keep some documents")
    assert(docsOut < corpusIn, "pipeline must drop some documents")
    // every chunk carries a split label
    assert(out.filter(col("split").isNull).count() == 0)
  }

  test("prepare stageTable variant: identical output to the fused-cache " +
      "path, with NO memory-resident corpus frame in the plan (x42 " +
      "production phase boundary)") {
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val stage = "graft_idx_test.x42_stage"
    spark.sql(s"DROP TABLE IF EXISTS $stage")
    val loc = java.nio.file.Paths.get("spark-warehouse",
      "graft_idx_test.db", "x42_stage")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    def run(stageTable: Option[String]) = CorpusPipeline.prepare(
      corpus = d.filter(col("doc_id") >= 20),
      benchmark = d.filter(col("doc_id") < 20),
      idCol = "doc_id", textCol = "text",
      maxTopBigramFrac = 0.2, minChars = 100,
      shingleK = 3, neardupThreshold = 0.8,
      decontamThreshold = 3,
      groupCol = "lang", pctByGroup = Map("en" -> 50, "zh" -> 20),
      defaultPct = 10,
      chunkSize = 64, chunkStride = 48,
      stageTable = stageTable)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_idx"), r.getAs[String]("chunk"),
        r.getAs[String]("split"))).toSet
    val fused = rows(run(None))
    spark.catalog.clearCache()
    val staged = run(Some(stage))
    assert(rows(staged) == fused && fused.nonEmpty)
    // the staged plan reads the materialized phase table and holds no
    // MEMORY-resident corpus frame
    val p = staged.queryExecution.executedPlan.toString
    assert(p.contains("x42_stage"), s"stage table not scanned:\n$p")
    assert(!p.contains("InMemoryTableScan"),
      s"staged variant must not pin a corpus frame in memory:\n$p")
  }

  test("curate: cleaning creates exact dups that dedup then collapses (x56)") {
    // docs 1/2 differ ONLY in boilerplate ("a b" / "c d" each appear in
    // 3 docs -> stripped at maxDf=2); their shared residue "u v" has
    // df=2 <= maxDf and survives, making the cleaned texts IDENTICAL —
    // the dedup-after-cleaning collapse this stage ordering exists for.
    val docs = Seq(
      (1L, "u v a b"),
      (2L, "u v c d"),
      (3L, "a b p1 q1"),
      (4L, "a b p2 q2"),
      (5L, "c d p3 q3"),
      (6L, "c d p4 q4"),
      (7L, "a b c d") // all passages boilerplate -> dropped entirely
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "doc_id", "text",
        passageTokens = 2, maxDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("split")))).toMap
    assert(out.keySet == Set(1L, 3L, 4L, 5L, 6L)) // 2 collapsed into 1; 7 emptied
    assert(out(1L)._1 == "u v" && out(1L)._2 == 1L)
    assert(out(3L)._1 == "p1 q1")
    assert(out.values.forall(v => Set("train", "val", "test")(v._3)))
  }

  test("curate: PII redaction creates exact dups that dedup then collapses (x60 stage)") {
    // docs 1/2 are the same message to different recipients — identical
    // only AFTER their contact lines become placeholder tokens; the
    // boilerplate bar is raised so stripping alone cannot collapse them
    val docs = Seq(
      (1L, "hello please contact alice@ex.org soon"),
      (2L, "hello please contact bob.jones@corp.io soon"),
      (3L, "entirely unrelated text body here")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "doc_id", "text",
        passageTokens = 2, maxDf = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    assert(out.keySet == Set(1L, 3L)) // 2 collapsed into 1 via redaction
    assert(out(1L) == "hello please contact <EMAIL> soon")
  }

  test("curateImages: gate drops flat frames, dedup collapses re-encodes (x65)") {
    import org.apache.spark.sql.functions.{lit, struct}
    val gray = Array.tabulate(70)(i => (i * 37 + 11) % 256)
    val png = {
      val img = new java.awt.image.BufferedImage(7, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 7; y <- 0 until 10) {
        val v = gray(y * 7 + x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      1L -> Multimodal.makePpmGray(7, 10, gray), // survives, representative
      2L -> png,                                 // same picture -> collapses
      3L -> Multimodal.makePpmGray(7, 10, Array.fill(70)(128))) // flat -> gated
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/*"))
      .withColumn("meta", struct(lit("und").as("lang"), lit(0L).as("chars")))
    val out = CorpusPipeline.curateImages(spark, media, minContrast = 10.0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    assert(out.keySet == Set(1L))
    assert(Set("train", "val", "test")(out(1L)))
  }

  test("exportShards: gate and dedup reshape the shard layout (x73)") {
    import spark.implicits._
    // surrogate scores are bounded in [-10, 10], so -100/+100 pin the
    // gate to keep-all/keep-none — the layout consequences are what's
    // under test, not absolute scores (ClassifierSpec covers those)
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"), // exact dup of 1 -> collapses to 1
      (3L, "delta epsilon zeta eta"),
      (4L, "theta iota kappa")).toDF("doc_id", "text")
    // keep-all: 3 survivors (dedup folds 2 into 1), shardSize 2 -> 2,1
    val all = CorpusPipeline.exportShards(docs, "doc_id", "text",
        threshold = -100.0, shardSize = 2)
      .collect().sortBy(_.getAs[Long]("shard_id"))
    assert(all.map(_.getAs[Long]("n_docs")).toSeq == Seq(2L, 1L))
    assert(all.map(_.getAs[Long]("n_tokens")).sum == 3 + 4 + 3)
    // keep-none: empty manifest, not a crash
    assert(CorpusPipeline.exportShards(docs, "doc_id", "text",
      threshold = 100.0, shardSize = 2).count() == 0)
  }

  test("lmCurate: LM trains on the DEDUPED text; bigram-less docs drop; " +
      "the gate thresholds the deduped scores (x89)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),  // 2-token chunks: "a b" twice -> deduped to "a b"
      (2L, "a b c d"),  // head chunk dups doc 1's -> deduped to "c d"
      (3L, "x")         // single token: no transitions after dedup
    ).toDF("doc_id", "text")
    // deduped corpus = {"a b", "c d", "x"}: V=5, every unigram count 1,
    // each doc's one bigram count 1 -> lp = round4(ln(2/6)) = -1.0986.
    // (training on RAW text would give doc 1 three bigrams incl. the
    // duplicated "a b" twice — the circularity the order prevents)
    val out = CorpusPipeline.lmCurate(docs, "doc_id", "text",
        chunk = 2, minLogprob = -1.1)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toSet
    assert(out == Set((1L, 1L, -1.0986), (2L, 1L, -1.0986)))
    // the gate is live: nudging it past the scores keeps nothing
    assert(CorpusPipeline.lmCurate(docs, "doc_id", "text",
      chunk = 2, minLogprob = -1.0).count() == 0)
  }

  test("clusterSplit: near-dup clusters share one split — zero leaky " +
      "pairs by construction; singletons are their own rep (x93)") {
    import spark.implicits._
    // 12/14 3-shingles shared between each neighboring pair: a 3-doc
    // near-dup chain (1-2, 2-3) that components close into ONE cluster
    // even though docs 1 and 3 may fall under the pair threshold
    val base = (1 to 14).map(i => s"t$i").mkString(" ")
    val var2 = (1 to 13).map(i => s"t$i").mkString(" ") + " zz"
    val var3 = "zz " + (2 to 14).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, var2), (3L, var3),
      (40L, "completely different content lives here"),
      (41L, "another unrelated standalone document")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clusterSplit(docs, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_rep"), r.getAs[String]("split"))).toMap
    assert(out.size == 5)
    // the chain collapses to rep 1 and ONE split for all three
    assert(Seq(1L, 2L, 3L).map(out(_)._1).toSet == Set(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).toSet.size == 1)
    // singletons: own rep, own hash split
    assert(out(40L)._1 == 40L && out(41L)._1 == 41L)
    // leakage-zero invariant: every near-dup pair shares a split
    val split = out.map { case (id, (_, s)) => id -> s }
    val leaky = graft.operators.TextDedup.jaccardPairs(docs, "doc_id",
        "text", k = 3, threshold = 0.5)
      .collect().filter(r => split(r.getAs[Long]("doc1")) !=
        split(r.getAs[Long]("doc2")))
    assert(leaky.isEmpty)

    // the size histogram over the same graph (x97): one 3-doc chain
    // cluster, two singletons; total mass = corpus size
    val hist = CorpusPipeline.dedupClusterStats(docs, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("cluster_size") ->
        r.getAs[Long]("n_clusters")).toMap
    assert(hist == Map(3L -> 1L, 1L -> 2L))
  }

  test("sourceDuplication (x108): per-source doc and token dup mass, " +
      "non-rep members count as duplicated") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, base, "web"),                                     // rep of {1,2,4}
      (2L, base + " ok", "web"),                             // dup, 11 tokens
      (3L, "completely different unrelated content sits here now", "web"),
      (4L, base + " yes", "books"),                          // dup, 11 tokens
      (5L, "another entirely separate book text", "books")
    ).toDF("doc_id", "text", "source")
    val out = CorpusPipeline.sourceDuplication(docs, "doc_id", "text",
        "source", k = 3, threshold = 0.5)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_frac")))).toMap
    // web: docs 1(10t, rep) 2(11t, dup) 3(7t); books: 4(11t, dup) 5(5t)
    assert(out("web") === ((3L, 1L, 28L, 11L,
      math.floor(11.0 / 28.0 * 1e4 + 0.5) / 1e4)))
    assert(out("books") === ((2L, 1L, 16L, 11L, 0.6875)))
  }

  test("exactDupSavings (x115): min-id keep rule per digest group, " +
      "per-source doc and token mass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text here now", "web"),     // keeper of the group
      (2L, "same text here now", "web"),     // dup, 4 tokens
      (3L, "Same   Text Here Now", "books"), // dup after lower/trim? no — inner whitespace differs
      (4L, "unique content in this one", "books")
    ).toDF("doc_id", "text", "source")
    // doc 3's internal double-space survives lower(trim(·)) so its
    // digest differs — only doc 2 is removable mass
    val out = CorpusPipeline.exactDupSavings(docs, "doc_id", "text",
        "source")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(out("web") === ((2L, 1L, 8L, 4L, 0.5)))
    assert(out("books") === ((2L, 0L, 9L, 0L, 0.0)))
  }

  test("crossSourceDuplication (x109): near-dup pairs folded to the " +
      "unordered source matrix") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, base, "web"),
      (2L, base + " ok", "web"),
      (3L, "completely different unrelated content sits here now", "web"),
      (4L, base + " yes", "books"),
      (5L, "another entirely separate book text", "books")
    ).toDF("doc_id", "text", "source")
    // pairs: (1,2) web-web; (1,4) and (2,4) web-books
    val out = CorpusPipeline.crossSourceDuplication(docs, "doc_id",
        "text", "source", k = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) -> r.getAs[Long]("n_pairs")).toMap
    assert(out === Map(("web", "web") -> 1L, ("books", "web") -> 2L))
  }

  test("qualityReps (x116): the cluster keeps its highest-quality " +
      "member, not the min id; singletons keep themselves") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base, "s"),                 // 0 stopwords -> score 0.3
      (2L, base + " the the", "s"),    // 2/12 stopwords -> score 0.55
      (3L, "entirely unrelated singleton content here", "s")
    ).toDF("doc_id", "text", "source")
    // sanity: doc 2 really does outscore doc 1 under x12
    val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("quality_score"))
      .toMap
    assert(q(2L) > q(1L))
    // shingle sets (k=3): doc1 8 of doc2's 10 -> jaccard 0.8 >= 0.5
    val out = CorpusPipeline.qualityReps(docs, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("cluster_rep")).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
    // contrast with the min-id rule: same cluster, different keeper
    val minId = CorpusPipeline.clusterReps(docs, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("cluster_rep")).toMap
    assert(minId === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    // the indexed serve (persisted component table) is bit-identical
    // to the one-shot — the pair walk moved to the writer, the keep
    // rule did not change
    val compT = "graft_idx_test.cp_ndcomp"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    graft.sinks.Sinks.dropManaged(spark, compT)
    CorpusPipeline.writeComponentIndex(docs, "doc_id", "text",
      k = 3, threshold = 0.5, compT)
    val served = CorpusPipeline.qualityRepsIndexed(docs, "doc_id",
        "text", spark.table(compT))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("cluster_rep")).toMap
    assert(served === out)
    // the persisted table is near-dup-sized: the singleton never lands
    assert(spark.table(compT).count() === 2L)
    graft.sinks.Sinks.dropManaged(spark, compT)
  }
}
