package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat and the dog is in the house", "en"),
    (2L, "der hund und die katze ist ein tier und das haus", "de"),
    (3L, "xyzzy qwerty zzz", "en")
  ).toDF("doc_id", "text", "lang")

  test("langId votes by stopword dictionary; no hits -> und (x11)") {
    val out = TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("predicted_lang")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("qualityScore components are bounded and deterministic (x12)") {
    val r = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .filter("doc_id = 1").head()
    assert(r.getAs[Double]("punct_ratio") == 0.0)
    assert(r.getAs[Double]("stopword_ratio") > 0.3) // 'the' x4, 'and', 'is', 'in', 'on'...
    val score = r.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
  }

  test("tokenCounts: ws vs BPE-ish tokens (x13)") {
    val r = TextAnalysis.tokenCounts(
      Seq((1L, "hello, world! it's 42")).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(r.getAs[Int]("ws_tokens") == 4)
    // hello , world ! it ' s 42  -> 8
    assert(r.getAs[Int]("bpe_tokens") == 8)
  }

  test("statsByLang aggregates per language (X4)") {
    val withChars = docs.selectExpr("doc_id", "text", "lang",
      "length(text) as n_chars")
    val out = TextAnalysis.statsByLang(withChars, "text")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(out == Map("en" -> 2L, "de" -> 1L))
  }

  test("tfidfTopTerms ranks rare terms above ubiquitous ones (x25)") {
    val corpus = Seq(
      (1L, "alpha alpha alpha common"),
      (2L, "beta common"),
      (3L, "gamma common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(corpus, "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank")) -> r.getString(1))
      .toMap
    // 'common' appears in every doc (df=3, idf=0) -> never outranks a
    // doc-specific term; repeated 'alpha' stays rank 1 for doc 1
    assert(out((1L, 1L)) == "alpha")
    assert(out((2L, 1L)) == "beta")
    assert(out((3L, 1L)) == "gamma")
    val scores = TextAnalysis.tfidfTopTerms(corpus, "doc_id", "text", 2)
      .collect().map(r => r.getString(1) -> r.getAs[Double]("score")).toMap
    assert(scores("alpha") > scores("beta")) // tf 3 vs 1, same df
    assert(scores("common") == 0.0) // ln((3+1)/(3+1)) = 0
  }

  test("chunk produces overlapping token windows; short docs = 1 chunk (x31)") {
    val corpus = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "short doc")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(corpus, "doc_id", "text", size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // doc 1: 10 tokens, size 4, stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert(out((1L, 0L)) == "t1 t2 t3 t4")
    assert(out((1L, 1L)) == "t4 t5 t6 t7")
    assert(out((1L, 2L)) == "t7 t8 t9 t10") // last window clamps
    assert(out((2L, 0L)) == "short doc")    // n <= size -> one chunk
    assert(out.size == 4)
    // consecutive chunks overlap by size - stride tokens
    assert(out((1L, 0L)).split(" ").last == out((1L, 1L)).split(" ").head)
  }

  test("repetition: repeated n-grams raise the fractions; short docs NULL (x35)") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // one bigram, fully repeated
      (2L, "one two three four five six"),   // all n-grams unique
      (3L, "hi")                             // too short for any n-gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(out(1L).getAs[Double]("dup_trigram_frac") == 1.0)
    assert(out(2L).getAs[Double]("top_bigram_frac") == 0.2) // 1 of 5
    assert(out(2L).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("top_bigram_frac")))
    assert(out(3L).getAs[Long]("n_bigrams") == 0L)
  }

  test("stratifiedSample is deterministic and monotone in the rate (x37)") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    def sample(en: Int, de: Int) =
      TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
          Map("en" -> en, "de" -> de), defaultPct = 0)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    val a = sample(50, 10)
    assert(a == sample(50, 10)) // reproducible, no RNG
    assert(a.subsetOf(sample(80, 30))) // raising rates only ADDS docs
    // a 0% group vanishes entirely; others are untouched
    val enOnly = sample(50, 0)
    assert(enOnly.forall(_ % 2 == 0))
    assert(enOnly == a.filter(_ % 2 == 0))
  }

  test("stratifiedSample preserves a user column named 'bucket'") {
    val docs = (1L to 50L).map(i => (i, "en", s"user-bucket-$i"))
      .toDF("doc_id", "lang", "bucket")
    val out = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 100), defaultPct = 0)
    // the working column is _bucket — the user's column survives intact
    assert(out.columns.toSeq == Seq("doc_id", "lang", "bucket"))
    assert(out.count() == 50)
    assert(out.filter(org.apache.spark.sql.functions.col("bucket")
      .startsWith("user-bucket-")).count() == 50)
  }

  test("decontaminate counts benchmark shingle overlap; clean docs flag 0 (x38)") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // contains bench
      (11L, "entirely different words with no shared phrases here"),
      (12L, "x y")                                          // too short
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "quick brown fox jumps")).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text",
        k = 3, threshold = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_overlap"), r.getAs[Int]("contaminated"))).toMap
    assert(out(10L) == (2L, 1)) // "quick brown fox", "brown fox jumps"
    assert(out(11L) == (0L, 0))
    assert(out(12L) == (0L, 0)) // no shingles at all
  }

  test("tokenEntropy: uniform terms -> ln(k); constant doc -> 0 (x41)") {
    val docs = Seq(
      (1L, "a b c d"),          // uniform over 4 terms: H = ln 4
      (2L, "spam spam spam"),   // single term: H = 0
      (3L, "a a b b")           // uniform over 2: H = ln 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_terms"),
          r.getAs[Double]("entropy"))).toMap
    assert(out(1L)._1 == 4L && out(1L)._2 == 4L)
    assert(math.abs(out(1L)._3 - math.log(4)) < 1e-3)
    assert(out(2L)._3 == 0.0)
    assert(math.abs(out(3L)._3 - math.log(2)) < 1e-3)
  }

  test("decontaminateBloom is bit-identical to the exact path (x44)") {
    import org.apache.spark.sql.functions.col
    val corpus = (1L to 60L).map { i =>
      val base = s"word$i stuff$i thing$i filler$i tail$i more$i"
      // every 7th doc quotes a benchmark phrase
      (i + 100L, if (i % 7 == 0) s"held out eval phrase one $base" else base)
    }.toDF("doc_id", "text")
    val bench = Seq((1L, "held out eval phrase one two"),
      (2L, "another benchmark sentence entirely")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_overlap"), r.getAs[Int]("contaminated"))).toSet
    val exact = rows(TextAnalysis.decontaminate(
      corpus, bench, "doc_id", "text", k = 3, threshold = 2))
    val bloom = rows(TextAnalysis.decontaminateBloom(
      corpus, bench, "doc_id", "text", k = 3, threshold = 2))
    assert(bloom == exact) // FPs die in the verify join; FNs impossible
    assert(exact.exists(_._3 == 1)) // the quoting docs are flagged
    // shared-artifact form: ONE prebuilt sketch serves batch (here) and
    // the streaming decontaminationGate (StreamsSpec) — result unchanged
    val sketch = TextAnalysis.benchmarkSketch(bench, "text", 3)
    val shared = rows(TextAnalysis.decontaminateBloom(
      corpus, bench, "doc_id", "text", k = 3, threshold = 2, sketch))
    assert(shared == exact)
  }

  test("quotaSample keeps exactly min(quota, stratum size) per stratum (x45)") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 300L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de"))
      .toDF("doc_id", "lang") // 100 per stratum
    def pick(en: Int, zh: Int, de: Int) =
      TextAnalysis.quotaSample(docs, "doc_id", "lang",
          Map("en" -> en, "zh" -> zh), defaultQuota = de)
        .collect().map(r => r.getAs[String]("lang") ->
          r.getAs[Long]("doc_id"))
    val a = pick(40, 15, 5)
    val byLang = a.groupBy(_._1).map { case (k, v) => k -> v.size }
    assert(byLang == Map("en" -> 40, "zh" -> 15, "de" -> 5))
    assert(a.toSet == pick(40, 15, 5).toSet) // deterministic
    // monotone: raising quotas only ADDS documents
    assert(a.map(_._2).toSet.subsetOf(pick(80, 30, 10).map(_._2).toSet))
    // quota above stratum size returns the whole stratum
    val full = pick(200, 15, 5).filter(_._1 == "en")
    assert(full.size == 100)
    // rank agrees with a plain window formulation (the oracle shape)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(org.apache.spark.sql.functions.conv(
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(col("doc_id").cast("string")),
          1, 15), 16, 10).cast("long"), col("doc_id"))
    val windowed = docs.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= 40 && col("lang") === "en")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"))).toSet
    val salted = TextAnalysis.quotaSample(docs, "doc_id", "lang",
        Map("en" -> 40), defaultQuota = 0)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"))).toSet
    assert(salted == windowed)
  }

  test("stratifiedSplit (x180): EXACT ceil-boundary proportions per " +
      "stratum, disjoint + exhaustive, deterministic across runs") {
    val docs = ((1L to 100L).map(i => (i, "web")) ++
      (101L to 107L).map(i => (i, "books"))).toDF("doc_id", "source")
    val out = TextAnalysis.stratifiedSplit(docs, "doc_id", "source")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[String]("split")))
    assert(out.length === 107) // exhaustive, once each
    assert(out.map(_._1).distinct.length === 107)
    val byStratum = out.groupBy(_._2).map { case (s, v) =>
      s -> v.groupBy(_._3).map { case (k, g) => k -> g.size } }
    // web n=100: ceil(80)/ceil(90) → exactly 80/10/10
    assert(byStratum("web") ===
      Map("train" -> 80, "val" -> 10, "test" -> 10))
    // books n=7: ceil(5.6)=6 train, ceil(6.3)=7 → 1 val, 0 test
    assert(byStratum("books") === Map("train" -> 6, "val" -> 1))
    // deterministic re-run
    val again = TextAnalysis.stratifiedSplit(docs, "doc_id", "source")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[String]("split")))
    assert(out.toSet === again.toSet)
  }

  test("hashSplit is deterministic and covers every doc exactly once (x26)") {
    val ids = (1L to 200L)
    val corpus = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = TextAnalysis.hashSplit(corpus, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == ids.toSet)
    assert(out.values.toSet.subsetOf(Set("train", "val", "test")))
    // expected proportions 10/16, 2/16, 4/16 — loose bounds at n=200
    val n = out.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(n("train") > 90 && n("test") > 20)
    // stable across runs / partitionings
    val again = TextAnalysis.hashSplit(corpus.repartition(7), "doc_id")
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  // 40 docs × 10 tokens in "big" (400 tokens), 10 docs × 4 in "small"
  // (40 tokens): a 10:1 token ratio for the temperature tests
  private lazy val mixDocs = ((1L to 40L).map(i =>
      (i, "big", ("t " * 10).trim)) ++ (41L to 50L).map(i =>
      (i, "small", ("t " * 4).trim)))
    .toDF("doc_id", "src", "text")

  test("temperatureQuotas: alpha sweeps natural -> uniform shares (x48)") {
    def q(alpha: Double) = TextAnalysis
      .temperatureQuotas(mixDocs, "doc_id", "text", "src", alpha, 100)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    val natural = q(1.0) // shares ∝ tokens: 400/440, 40/440
    assert(natural("big") == 90 && natural("small") == 9)
    val uniform = q(0.0) // tokens^0 = 1: equal shares
    assert(uniform("big") == 50 && uniform("small") == 50)
    val temp = q(0.5) // ∝ sqrt(tokens): 20/(20+6.3245), 6.3245/...
    assert(temp("big") == 75 && temp("small") == 24)
    // every source keeps at least one doc even when its share rounds to 0
    val tiny = TextAnalysis.temperatureQuotas(mixDocs, "doc_id", "text",
        "src", 1.0, 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    assert(tiny("small") == 1L)
  }

  test("temperatureSample: deterministic pick, quota-bounded (x48)") {
    val s1 = TextAnalysis.temperatureSample(mixDocs, "doc_id", "text",
        "src", 0.5, 20)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src")))
    val bySrc = s1.groupBy(_._2).map { case (k, v) => k -> v.size }
    assert(bySrc("big") == 15 && bySrc("small") == 4) // floor(w/W*20)
    val s2 = TextAnalysis.temperatureSample(
        mixDocs.repartition(7), "doc_id", "text", "src", 0.5, 20)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src")))
    assert(s2.toSet == s1.toSet) // partitioning-independent
  }

  test("tokenBudgetMix matches the naive per-group cumsum filter (x47)") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 120L).map(i =>
      (i, s"s${i % 4}", ("w " * (1 + (i % 9).toInt)).trim))
      .toDF("doc_id", "src", "text")
    val out = TextAnalysis.tokenBudgetMix(docs, "doc_id", "text", "src",
        Map("s0" -> 30L), defaultBudget = 50L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens"))).toMap
    // naive formulation: single window per group
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(org.apache.spark.sql.functions.conv(
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(col("doc_id").cast("string")),
          1, 15), 16, 10).cast("long"), col("doc_id"))
    val naive = docs.withColumn("n",
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions
          .split(org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.trim(col("text"))), "\\s+"))
          .cast("long"))
      .withColumn("cum",
        org.apache.spark.sql.functions.sum(col("n")).over(w))
      .filter(col("cum") <= org.apache.spark.sql.functions
        .when(col("src") === "s0", 30L).otherwise(50L))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum"))).toMap
    assert(out == naive)
    assert(out.nonEmpty && out.size < 120) // the budget actually cuts
  }

  test("epochRepeat: floor copies + md5 fractional admission, monotone (x49)") {
    val docs = (1L to 200L).map(i =>
      (i, if (i <= 100) "hot" else "cold")).toDF("doc_id", "src")
    def counts(wHot: Double) = TextAnalysis
      .epochRepeat(docs, "doc_id", "src", Map("hot" -> wHot),
        defaultWeight = 1.0)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch")))
      .groupBy(_._1).map { case (k, v) => k -> v.size }
    val c225 = counts(2.25)
    // every hot doc appears 2 or 3 times, epochs are 0..copies-1
    assert((1L to 100L).forall(i => c225(i) == 2 || c225(i) == 3))
    val thirds = (1L to 100L).count(i => c225(i) == 3)
    assert(thirds > 10 && thirds < 40, s"~25% expected, got $thirds")
    assert((101L to 200L).forall(i => c225(i) == 1)) // default w=1.0
    // w < 1 downsamples deterministically
    val cHalf = counts(0.5)
    val kept = (1L to 100L).filter(cHalf.contains)
    assert(kept.size > 30 && kept.size < 70)
    // monotone: raising w only ever ADDS copies
    assert(kept.toSet.subsetOf(
      (1L to 100L).filter(i => c225(i) >= 2).toSet))
    val c075 = counts(0.75)
    assert(kept.toSet.subsetOf((1L to 100L).filter(c075.contains).toSet))
  }

  test("dataCard: counts, dup rate, and token shares per (source, lang) (x51)") {
    val corpus = Seq(
      (1L, "a b c d", "s1", "en"),      // 4 tokens
      (2L, "a b c d", "s1", "en"),      // exact dup of 1
      (3L, "e f", "s1", "en"),          // 2 tokens
      (4L, "g h i j k l", "s2", "en"),  // 6 tokens
      (5L, "m n", "s2", "de")           // 2 tokens
    ).toDF("doc_id", "text", "source", "lang")
    val out = TextAnalysis.dataCard(corpus, "doc_id", "text", "source", "lang")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r)
      .toMap
    assert(out.size == 3)
    val s1en = out(("s1", "en"))
    assert(s1en.getAs[Long]("n_docs") == 3L)
    assert(s1en.getAs[Long]("n_tokens") == 10L)
    assert(s1en.getAs[Long]("n_distinct_texts") == 2L)
    assert(s1en.getAs[Double]("avg_doc_tokens") == 3.3333) // fpRound grid
    assert(s1en.getAs[Double]("dup_rate") == 0.3333)
    assert(s1en.getAs[Double]("token_share") == 0.5556)    // 10/18
    val s2de = out(("s2", "de"))
    assert(s2de.getAs[Double]("dup_rate") == 0.0)
    assert(s2de.getAs[Double]("token_share") == 0.1111)    // 2/18
    // shares cover the corpus (up to grid rounding)
    val shareSum = out.values.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 0.001)
  }

  test("sourceSimilarity: identical vocab -> 1.0, disjoint -> absent (x53)") {
    val corpus = Seq(
      (1L, "a b c", "s1"),
      (2L, "c b a a b", "s2"), // same vocabulary as s1, different counts
      (3L, "a b x y", "s3"),   // shares {a, b} with s1/s2
      (4L, "p q r", "s4")      // disjoint
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceSimilarity(corpus, "text", "source")
      .collect().map(r => (r.getAs[String]("source1"), r.getAs[String]("source2")) ->
        ((r.getAs[Long]("n_shared_terms"), r.getAs[Double]("vocab_jaccard"))))
      .toMap
    assert(out(("s1", "s2")) == ((3L, 1.0)))
    assert(out(("s1", "s3")) == ((2L, 0.4))) // |{a,b}| / |{a,b,c,x,y}|
    assert(!out.keys.exists(p => p._1 == "s4" || p._2 == "s4"))
  }

  test("sourceNeighbors: banded candidates + exact verify match the matrix semantics (x62)") {
    val corpus = Seq(
      (1L, "a b c d e", "s1"),
      (2L, "e d c b a a", "s2"), // same vocab as s1 -> j = 1.0
      (3L, "a b c d x", "s3"),   // j(s1,s3) = 4/6 = 0.6667 — below bar
      (4L, "p q r", "s4")        // disjoint
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceNeighbors(corpus, "text", "source",
        threshold = 0.9)
      .collect().map(r => (r.getAs[String]("source1"),
        r.getAs[String]("source2"), r.getAs[Long]("n_shared_terms"),
        r.getAs[Double]("vocab_jaccard")))
    assert(out.toSeq == Seq(("s1", "s2", 5L, 1.0)))
  }

  test("sourceNeighbors handles stratum counts that trip sourceSimilarity's guard") {
    // domain-granular strata (one per doc — the shape the guard rejects)
    // with identical vocabularies, so every pair is a true neighbor
    val granular = spark.range(20).selectExpr("id AS doc_id",
      "'alpha beta gamma delta' AS text", "concat('domain', id) AS source")
    val out = TextAnalysis.sourceNeighbors(granular, "text", "source",
      threshold = 0.9)
    assert(out.count() == 190L) // 20 choose 2, all at jaccard 1.0
    assert(out.collect().forall(_.getAs[Double]("vocab_jaccard") == 1.0))
  }

  test("sourceSimilarity fails fast past maxSources strata, naming the scale path") {
    // a domain-granular stratum column: one stratum per document
    val granular = spark.range(20).selectExpr("id AS doc_id",
      "concat('shared tok', id) AS text", "concat('domain', id) AS source")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.sourceSimilarity(granular, "text", "source",
        maxSources = 10L)
    }
    assert(e.getMessage.contains("sourceNeighbors")) // names the real path
    // raising the bound deliberately admits the same input
    assert(TextAnalysis.sourceSimilarity(granular, "text", "source",
      maxSources = 100L).collect().nonEmpty) // all share the "shared" term
  }

  test("oovRate: occurrences outside the top-K vocab (x55)") {
    val corpus = Seq(
      (1L, "a a a b c"), // occ: a 4, b 3, c 1, d 1 -> top-2 vocab {a, b}
      (2L, "a b b d")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(corpus, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate")))).toMap
    assert(out(1L) == ((5L, 1L, 0.2)))  // c is OOV
    assert(out(2L) == ((4L, 1L, 0.25))) // d is OOV
  }

  test("splitLeakage counts cross-split near-dup pairs under the md5 rule (x54)") {
    // six identical docs: ids 1,2,3,5 -> test, 4 -> val, 6 -> train
    // (md5 first hex: c,c,e,a,e,1), so 9 of the 15 j=1.0 pairs leak
    val corpus = (1L to 6L).map((_, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.splitLeakage(corpus, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[String]("split1"), r.getAs[String]("split2")) ->
        ((r.getAs[Long]("n_leaky_pairs"), r.getAs[Double]("avg_jaccard"))))
      .toMap
    assert(out(("test", "train")) == ((4L, 1.0)))
    assert(out(("test", "val")) == ((4L, 1.0)))
    assert(out(("train", "val")) == ((1L, 1.0)))
    assert(out.size == 3)
    // sanity: the labels match hashSplit itself
    val splits = TextAnalysis.hashSplit(corpus, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    assert(splits(4L) == "val" && splits(6L) == "train" &&
      splits(1L) == "test")
  }

  test("bigramCounts: adjacent pairs with occurrence + doc frequency, " +
      "deterministic top-K cut (x68)") {
    val docs = Seq(
      (1L, "a b a b"),  // pairs: "a b", "b a", "a b"
      (2L, "a b c"),    // pairs: "a b", "b c"
      (3L, "x")         // single token: no pairs
    ).toDF("doc_id", "text")
    val all = TextAnalysis.bigramCounts(docs, "doc_id", "text", topK = 10)
      .collect().map(r => r.getAs[String]("pair") ->
        ((r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_docs")))).toMap
    assert(all == Map("a b" -> ((3L, 2L)), "b a" -> ((1L, 1L)),
      "b c" -> ((1L, 1L))))
    // the K boundary cuts ties by pair text: "b a" < "b c"
    val top2 = TextAnalysis.bigramCounts(docs, "doc_id", "text", topK = 2)
      .collect().map(_.getAs[String]("pair")).toSeq
    assert(top2 == Seq("a b", "b a"))
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramCounts(docs, "doc_id", "text", topK = 0)
    }
  }

  test("bigramLmScores: add-one smoothed conditional log-prob, " +
      "multiplicity-weighted mean, bigram-less docs absent (x86)") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "c")  // V=3; c(a)=2; c(a,b)=2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScores(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toSet
    // lp(a,b) = round4(ln((2+1)/(2+3))) = round4(ln(0.6)) = -0.5108
    assert(out == Set((1L, 1L, -0.5108), (2L, 1L, -0.5108)))

    // repeated pair weights the mean by its multiplicity:
    // "x y x y": V=2, c(x,y)=2, c(y,x)=1, c(x)=c(y)=2
    // lp(x,y) = round4(ln(3/4)) = -0.2877; lp(y,x) = round4(ln(2/4))
    //         = -0.6931; mean = (2*(-0.2877) + 1*(-0.6931)) / 3
    val rep = TextAnalysis.bigramLmScores(
      Seq((9L, "x y x y")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("avg_logprob"))).toSet
    assert(rep == Set((3L, -0.4228)))
  }

  test("curriculumPhases: bucketed rank equals the single-window " +
      "reference under any partitioning (x103)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    // varied lengths/punctuation give a spread of scores WITH ties
    // (identical docs 40/41 tie and must order by id)
    val docs = ((1L to 39L).map { i =>
      (i, Seq.fill(i.toInt * 3)("the quick fox").mkString(" ") +
        ("!" * (i.toInt % 7)))
    } ++ Seq((40L, "same tied text here"), (41L, "same tied text here")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.curriculumPhases(
        docs.repartition(7), "doc_id", "text", nPhases = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("rank"), r.getAs[Int]("phase")))).toMap
    // reference: plain global window on the same score frame
    val ref = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality_score"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("quality_score").desc, col("doc_id"))).cast("long"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank"))
      .toMap
    assert(out.size == 41)
    ref.foreach { case (id, r) =>
      assert(out(id)._1 == r, s"doc $id")
      assert(out(id)._2 == ((r - 1) * 4 / 41).toInt)
    }
    // the tie orders by id
    assert(out(40L)._1 + 1 == out(41L)._1)
  }

  test("sourceDrift: hand-derived KL over the shared top-V vocabulary; " +
      "identical distributions score 0 (x106)") {
    val docs = Seq(
      (1L, "a", "x x x y"),   // src a: x:3 y:1 over {x,y}
      (2L, "b", "x y x y"),   // src b: x:2 y:2
      (3L, "c", "x x x y")    // src c == src a's distribution
    ).toDF("doc_id", "source", "text")
    def r4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    // corpus over {x,y}: x:8, y:4, total 12
    def kl(px: Double, py: Double): Double = {
      val qx = 8.0 / 12.0; val qy = 4.0 / 12.0
      r4(px * r4(math.log(px / qx))) + r4(py * r4(math.log(py / qy)))
    }
    val out = TextAnalysis.sourceDrift(docs, "doc_id", "text", "source",
        vocabSize = 10)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Double]("kl_divergence"))))
      .toMap
    assert(out("a") == ((2L, kl(0.75, 0.25))))
    assert(out("c") == ((2L, kl(0.75, 0.25))))
    assert(out("b") == ((2L, kl(0.5, 0.5))))
    assert(out("b")._2 > 0) // 1:1 vs the 2:1 corpus: nonzero drift
    // vocabSize 1 keeps only "x": a source never using it reports
    // (0, null)
    val noX = Seq((1L, "a", "x x x"), (2L, "b", "z z"))
      .toDF("doc_id", "source", "text")
    val v1 = TextAnalysis.sourceDrift(noX, "doc_id", "text", "source",
        vocabSize = 1)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_terms"),
          Option(r.getAs[java.lang.Double]("kl_divergence"))))).toMap
    assert(v1("b") == ((0L, None)))
    assert(v1("a")._1 == 1L) // p=q=1 over {x}: KL exactly 0
    assert(v1("a")._2 == Some(0.0))
  }

  test("noveltyScores: corpus-unique shingle fraction; short docs " +
      "report (0, 0, null) (x104)") {
    val docs = Seq(
      (1L, "a b c d"),  // shingles {a b c, b c d}; "a b c" shared w/ 2
      (2L, "a b c x"),  // shingles {a b c, b c x}
      (3L, "zz")        // < 3 tokens: no shingles
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_unique"),
          Option(r.getAs[java.lang.Double]("novelty"))))).toMap
    assert(out(1L) == ((2L, 1L, Some(0.5))))
    assert(out(2L) == ((2L, 1L, Some(0.5))))
    assert(out(3L) == ((0L, 0L, None)))
  }

  test("zipfAudit (x111): closed-form fit matches a plain-Scala " +
      "re-derivation of the same numeric law") {
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // reference regression under the operator's law: rounded lns,
    // rounded products, exact decimal sums, IEEE closed form
    def fit(pts: Seq[(Long, Long)]): (Long, Double, Double, Double) = {
      def d(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val xs = pts.map { case (r, _) => r4(math.log(r.toDouble)) }
      val ys = pts.map { case (_, f) => r4(math.log(f.toDouble)) }
      val n = pts.size.toDouble
      val sx = xs.map(d).sum.toDouble
      val sy = ys.map(d).sum.toDouble
      val sxx = xs.map(x => d(r4(x * x))).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => d(r4(x * y)) }.sum.toDouble
      val syy = ys.map(y => d(r4(y * y))).sum.toDouble
      val dx = n * sxx - sx * sx
      val dy = n * syy - sy * sy
      val cov = n * sxy - sx * sy
      (pts.size.toLong, r4(cov / dx), r4((sy * sxx - sx * sxy) / dx),
        r4(cov * cov / (dx * dy)))
    }
    // freq: a=4, b=2, c=1 -> ranks 1, 2, 3
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.zipfAudit(docs, "text", vocabSize = 10).head()
    val (n, slope, intercept, r2) = fit(Seq((1L, 4L), (2L, 2L), (3L, 1L)))
    assert(out.getLong(0) === n)
    assert(out.getDouble(1) === slope)
    assert(out.getDouble(2) === intercept)
    assert(out.getDouble(3) === r2)
    assert(slope < 0, "frequency must fall with rank")

    // single term: zero x-variance -> every fit output NULL
    val degenerate = TextAnalysis.zipfAudit(
      Seq((1L, "a a a")).toDF("doc_id", "text"), "text", 10).head()
    assert(degenerate.getLong(0) === 1L)
    assert(degenerate.isNullAt(1) && degenerate.isNullAt(2) &&
      degenerate.isNullAt(3))
  }

  test("lengthHistogram (x112): exact power-of-2 buckets by binary " +
      "digit count, token mass per bucket") {
    val docs = Seq(
      (1L, "t1", "s"),                      // 1 token  -> bucket 1
      (2L, "t1 t2", "s"),                   // 2        -> bucket 2
      (3L, "t1 t2 t3", "s"),                // 3        -> bucket 2
      (4L, "t1 t2 t3 t4", "s"),             // 4        -> bucket 3
      (5L, "a b c d e f g", "s"),           // 7        -> bucket 3
      (6L, "a b c d e f g h", "s")          // 8        -> bucket 4
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.lengthHistogram(docs, "doc_id", "text", "source")
      .collect().map(r => r.getAs[Long]("len_bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))).toMap
    assert(out === Map(1L -> ((1L, 1L)), 2L -> ((2L, 5L)),
      3L -> ((2L, 11L)), 4L -> ((1L, 8L))))
  }

  test("mixEntropy (x113): balanced two-source mix scores the rounded " +
      "maximum; single source has NULL balance") {
    val docs = Seq(
      (1L, "a b", "s1"), (2L, "c d", "s2")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.mixEntropy(docs, "doc_id", "text", "source")
      .head()
    assert(out.getLong(0) === 2L)
    assert(out.getLong(1) === 4L)
    // each term: r4(-0.5 * r4(ln 0.5)) = r4(0.5 * 0.6931) = 0.3466
    assert(out.getDouble(2) === 0.6932)
    // balance = r4(0.6932 / r4(ln 2)) — rounding puts it 1 ulp above 1
    assert(out.getDouble(3) === 1.0001)

    val solo = TextAnalysis.mixEntropy(
      Seq((1L, "a b", "only")).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source").head()
    assert(solo.getLong(0) === 1L)
    assert(solo.getDouble(2) === 0.0)
    assert(solo.isNullAt(3))
  }

  test("scoreQuantiles (x114): the document at ascending rank ceil(qN) " +
      "— matches a local sort of the operator's own scores") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a short one"),
      (3L, "!!! ??? $$$ %%% ^^^"),
      (4L, "the and of to in is a document with stopwords " * 5),
      (5L, "middle quality text with the usual words in it"),
      (6L, "zz"),
      (7L, "another perfectly ordinary document of the corpus")
    ).toDF("doc_id", "text")
    val sorted = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select("doc_id", "quality_score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (s, id) }
    val qs = Seq(0.1, 0.5, 1.0)
    val expected = qs.map { q =>
      val rank = math.ceil(q * sorted.size).toLong
      val (id, s) = sorted(rank.toInt - 1)
      (q, rank, id, s)
    }.toSet
    val out = TextAnalysis.scoreQuantiles(docs, "doc_id", "text", qs)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out === expected)
  }

  test("groupedNtileBuckets (x146 core): per-group exact ranks (score " +
      "desc, id tie) and NTILE's remainder-first tercile boundaries; a " +
      "constant-score group collapses to one bucket with exact ranks") {
    val scored = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.7), ("a", 4L, 0.5),
      ("a", 5L, 0.3), ("a", 6L, 0.2), ("a", 7L, 0.1),
      // all-equal scores: degenerate single bucket, ranks fall to ids
      ("b", 10L, 0.4), ("b", 11L, 0.4), ("b", 12L, 0.4)
    ).toDF("grp", "id", "score")
    val out = TextAnalysis.groupedNtileBuckets(scored, "id", "grp",
        "score", Seq("head", "middle", "tail"), bucketBits = 2)
      .collect().map(r => (r.getString(1), r.getLong(0)) ->
        ((r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    // group a: 7 rows → tercile sizes 3/2/2 (remainder to the FIRST
    // buckets); the 0.7 tie resolves by ascending id
    assert(out(("a", 1L)) === ((1L, 7L, "head")))
    assert(out(("a", 2L)) === ((2L, 7L, "head")))
    assert(out(("a", 3L)) === ((3L, 7L, "head")))
    assert(out(("a", 4L)) === ((4L, 7L, "middle")))
    assert(out(("a", 5L)) === ((5L, 7L, "middle")))
    assert(out(("a", 6L)) === ((6L, 7L, "tail")))
    assert(out(("a", 7L)) === ((7L, 7L, "tail")))
    // group b: 3 rows → 1/1/1
    assert(out(("b", 10L)) === ((1L, 3L, "head")))
    assert(out(("b", 11L)) === ((2L, 3L, "middle")))
    assert(out(("b", 12L)) === ((3L, 3L, "tail")))
  }

  test("ccnetBuckets (x146): per-LANGUAGE terciles of the bigram-LM " +
      "score — matches a local per-lang sort of the operator's own " +
      "scores; sub-2-token docs drop out (x86's law)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "the lazy dog sleeps under the quick fox", "en"),
      (3L, "completely unrelated gibberish tokens here now", "en"),
      (4L, "the quick brown fox jumps again and again", "en"),
      (5L, "der schnelle braune fuchs springt gern hoch", "de"),
      (6L, "der faule hund schlaeft gern unten tief", "de"),
      (7L, "ein ganz anderes thema ohne gemeinsame worte", "de"),
      (8L, "solo", "en") // 1 token → no bigrams → absent
    ).toDF("doc_id", "text", "lang")
    val scores = TextAnalysis.bigramLmScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val langOf = Map(1L -> "en", 2L -> "en", 3L -> "en", 4L -> "en",
      5L -> "de", 6L -> "de", 7L -> "de")
    val expected = langOf.keys.groupBy(langOf).flatMap {
      case (lang, ids) =>
        val sorted = ids.toSeq.sortBy(id => (-scores(id), id))
        val n = sorted.size
        sorted.zipWithIndex.map { case (id, i) =>
          val rk = i + 1L
          val bucket = if (rk <= (n + 2) / 3) "head"
            else if (rk <= (n * 2 + 2) / 3) "middle" else "tail"
          id -> ((lang, scores(id), rk, n.toLong, bucket))
        }
    }
    val out = TextAnalysis.ccnetBuckets(docs, "doc_id", "text", "lang",
        Seq("head", "middle", "tail"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getDouble(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(out === expected)
    assert(!out.contains(8L))
  }

  test("groupedQuantiles (x156 core): each group cuts at ITS OWN " +
      "ceil(q*n) ascending rank — the cut row's id rides along") {
    val scored = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
      ("b", 10L, 5.0), ("b", 11L, 7.0)
    ).toDF("grp", "id", "v")
    val out = TextAnalysis.groupedQuantiles(scored, "id", "grp", "v",
        Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // group a (n=4): p50 at rank 2 (20.0), p100 at rank 4 (40.0)
    assert(out(("a", 0.5)) === ((2L, 2L, 20.0)))
    assert(out(("a", 1.0)) === ((4L, 4L, 40.0)))
    // group b (n=2): p50 at rank 1 (5.0), p100 at rank 2 (7.0)
    assert(out(("b", 0.5)) === ((1L, 10L, 5.0)))
    assert(out(("b", 1.0)) === ((2L, 11L, 7.0)))
    assert(out.size === 4)
  }

  test("pmiCollocations (x150): a true collocation outranks a " +
      "frequent-but-independent pair; the minCount guard kills the " +
      "hapax-pair PMI explosion") {
    // "new york" only ever adjacent (PMI high); "the cat"/"the dog"
    // frequent but 'the' pairs promiscuously (PMI low); "qq zz" occurs
    // ONCE between two hapax words — max PMI but noise
    val docs = Seq(
      (1L, "new york new york new york the cat the dog"),
      (2L, "the cat the dog the cat the dog new york"),
      (3L, "the dog saw the cat near new york qq zz"),
      (4L, "new york the cat the dog new york the cat")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "doc_id", "text",
      minCount = 2, topK = 10).collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(5)).toMap
    assert(!byPair.contains(("qq", "zz")), "hapax pair must be gated")
    assert(byPair(("new", "york")) > byPair(("the", "cat")))
    assert(byPair(("new", "york")) > byPair(("the", "dog")))
    // exact law on one pair: ln(cb·N²/(B·cu1·cu2)) on the 1e-4 grid
    val row = out.find(r => r.getString(0) == "new").get
    val (cb, cu1, cu2) = (row.getLong(2), row.getLong(3), row.getLong(4))
    val n = docs.collect().map(_.getString(1).split("\\s+").length).sum
    val b = docs.collect()
      .map(_.getString(1).split("\\s+").length - 1).sum
    val want = math.floor(math.log(
      (cb.toDouble * n * n) / (b.toDouble * cu1 * cu2))
      * 10000 + 0.5) / 10000.0
    assert(row.getDouble(5) === want)
  }

  test("vocabCoverage (x151): ranks follow (freq desc, term), the " +
      "running share is cumulative over ALL occurrences, and a cut " +
      "below the vocab size tops out under 1.0") {
    val docs = Seq(
      (1L, "a a a a b b b c c d"),
      (2L, "a a b b c e")
    ).toDF("doc_id", "text")
    // freqs: a=6 b=5 c=3 d=1 e=1 (N=16); ties d/e by term
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text",
        topK = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) === (("a", 6L, 6L, 0.375)))
    assert(out(2L) === (("b", 5L, 11L, 0.6875)))
    assert(out(3L) === (("c", 3L, 14L, 0.875)))
    assert(out(4L) === (("d", 1L, 15L, 0.9375)))
    assert(out.size === 4) // e is cut; coverage stays < 1.0
  }

  test("groupedCalibratedGate (x147): each group gates at its OWN " +
      "exact p25 score (ties at the bar survive); a global bar gates " +
      "the whole low-scoring language, the grouped bar keeps its top") {
    // en: stopword-rich text scores high; xx: punctuation soup scores
    // low — every xx score sits below every en score
    val en = (1L to 8L).map(i => (i,
      s"the quick document $i of the corpus and the usual words in it",
      "en"))
    // distinct punctuation ratios UNDER the 0.2 saturation point →
    // distinct (low) scores, so the global bar cuts INSIDE xx instead
    // of tying across all of it
    val xx = (101L to 104L).map(i =>
      (i, "plain words here plain words here plain words here " +
        ("!" * (3 * (i - 100) - 2).toInt), "xx"))
    val docs = (en ++ xx).toDF("doc_id", "text", "lang")
    val scores = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select("doc_id", "quality_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(xx.map(x => scores(x._1)).max < en.map(e => scores(e._1)).min)
    def expectedKept(ids: Seq[Long]) = {
      val sorted = ids.sortBy(id => (scores(id), id))
      val thr = scores(sorted(math.ceil(0.25 * ids.size).toInt - 1))
      ids.filter(scores(_) >= thr).toSet
    }
    val grouped = TextAnalysis.groupedCalibratedGate(docs, "doc_id",
        "text", "lang", q = 0.25)
      .collect().map(r => r.getLong(0)).toSet
    assert(grouped === expectedKept(en.map(_._1)) ++
      expectedKept(xx.map(_._1)))
    // the grouped gate keeps xx's own top 75%; the GLOBAL gate's p25
    // bar (12 docs → rank 3) lands inside xx and deletes most of it
    val global = TextAnalysis.calibratedGate(docs, "doc_id", "text",
        q = 0.25).collect().map(r => r.getLong(0)).toSet
    assert((grouped & xx.map(_._1).toSet).size >
      (global & xx.map(_._1).toSet).size)
  }

  test("indexed novelty (x110): persisted gram-df index returns the " +
      "self-contained rows; a disjoint batch scores (0, 0, null)") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c x"),
      (3L, "zz")
    ).toDF("doc_id", "text")
    val table = "graft_idx_test.nov_df"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = java.nio.file.Paths.get("spark-warehouse",
      "graft_idx_test.db", "nov_df")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    TextAnalysis.writeNoveltyIndex(docs, "doc_id", "text", k = 3, table,
      numBuckets = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_unique"),
          Option(r.getAs[java.lang.Double]("novelty"))))).toMap
    val viaIndex = rows(
      TextAnalysis.noveltyScoresIndexed(spark, docs, "doc_id", "text",
        k = 3, table))
    assert(viaIndex ==
      rows(TextAnalysis.noveltyScores(docs, "doc_id", "text", k = 3)))
    // a batch sharing NO grams with the indexed corpus: everything is
    // new relative to the index — no joined grams, (0, 0, null)
    val disjoint = rows(TextAnalysis.noveltyScoresIndexed(spark,
      Seq((9L, "p q r s")).toDF("doc_id", "text"), "doc_id", "text",
      k = 3, table))
    assert(disjoint(9L) == ((0L, 0L, None)))
  }

  test("scoreHistogram (x125): buckets partition the corpus and agree " +
      "with the operator's own scores") {
    val hdocs = Seq(
      (1L, "!!! ??? $$$"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "plain words without stop terms here"),
      (4L, "the and of to in is a document with stopwords " * 3),
      (5L, "zz yy xx")
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.qualityScore(hdocs, "doc_id", "text")
      .collect().map(r => (math.floor(
        r.getAs[Double]("quality_score") * 20.0).toInt,
        r.getAs[Int]("n_tokens").toLong))
    val expected = scored.groupBy(_._1).map { case (b, rows) =>
      b -> ((rows.size.toLong, rows.map(_._2).sum)) }
    val out = TextAnalysis.scoreHistogram(hdocs, "doc_id", "text")
      .collect().map(r => r.getAs[Int]("score_bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))).toMap
    assert(out === expected)
    assert(out.values.map(_._1).sum === 5L)
  }

  test("phaseSourceMatrix (x126): cells agree with a local sort of the " +
      "operator's own scores; cell mass sums to the corpus") {
    val mdocs = Seq(
      (1L, "!!! ??? $$$", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"),
      (3L, "plain words without stop terms here", "books"),
      (4L, "the and of to in is a document with stopwords " * 3, "books"),
      (5L, "zz yy xx", "web"),
      (6L, "another ordinary document of the corpus", "books")
    ).toDF("doc_id", "text", "source")
    val scored = TextAnalysis.qualityScore(mdocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getAs[Double]("quality_score"),
        r.getAs[Int]("n_tokens").toLong))
    val n = scored.size
    val phaseOf = scored.sortBy { case (id, s, _) => (-s, id) }
      .zipWithIndex.map { case ((id, _, nt), i) =>
        id -> ((math.floor(i.toDouble * 2.0 / n).toInt, nt)) }.toMap
    val srcOf = Map(1L -> "web", 2L -> "web", 3L -> "books",
      4L -> "books", 5L -> "web", 6L -> "books")
    val expected = phaseOf.toSeq.groupBy { case (id, (p, _)) =>
      (p, srcOf(id)) }.map { case (k, rows) =>
      k -> ((rows.size.toLong, rows.map(_._2._2).sum)) }
    val out = TextAnalysis.phaseSourceMatrix(mdocs, "doc_id", "text",
        "source", nPhases = 2)
      .collect().map(r => (r.getAs[Int]("phase"),
        r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))).toMap
    assert(out === expected)
    assert(out.values.map(_._1).sum === 6L)
  }

  test("mixturePlan (x117): sqrt-mass weights, capped plan, deficit " +
      "prices the shortfall") {
    val docs = Seq(
      (1L, (1 to 16).map(i => s"t$i").mkString(" "), "s1"), // 16 tokens
      (2L, "u1 u2 u3 u4", "s2")                             // 4 tokens
    ).toDF("doc_id", "text", "source")
    def plan(budget: Long) =
      TextAnalysis.mixturePlan(docs, "doc_id", "text", "source", budget)
        .collect().map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("src_tokens"), r.getAs[Double]("weight"),
            r.getAs[Long]("target_tokens"), r.getAs[Long]("planned_tokens"),
            r.getAs[Double]("sample_rate"), r.getAs[Long]("deficit_tokens"))))
        .toMap
    // weights: r4(4/6) = 0.6667, r4(2/6) = 0.3333
    // budget 30: targets floor(30*w + .5) = 20 / 10 — both over mass
    val over = plan(30L)
    assert(over("s1") === ((16L, 0.6667, 20L, 16L, 1.0, 4L)))
    assert(over("s2") === ((4L, 0.3333, 10L, 4L, 1.0, 6L)))
    // budget 12: targets 8 / 4 — s1 subsamples at exactly 0.5
    val under = plan(12L)
    assert(under("s1") === ((16L, 0.6667, 8L, 8L, 0.5, 0L)))
    assert(under("s2") === ((4L, 0.3333, 4L, 4L, 1.0, 0L)))
  }

  test("calibratedGate (x119): threshold is the exact q-quantile score " +
      "of the corpus itself; score ties at the bar all survive") {
    val docs = Seq(
      (1L, "!!! ??? $$$ %%%"),                                   // worst
      (2L, "plain middling words without any stop terms here"),
      (3L, "plain middling words without any stop terms here"),  // tie w/ 2
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "the and of to in is a document with stopwords " * 3),
      (6L, "another perfectly ordinary document of the corpus"),
      (7L, "the cat sat on the mat and the dog is in the house"),
      (8L, "zz yy xx ww vv uu")
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getAs[Double]("quality_score")))
    val sorted = scores.sortBy { case (id, s) => (s, id) }
    val thr = sorted(math.ceil(0.25 * sorted.size).toInt - 1)._2
    val expected = scores.filter(_._2 >= thr).toSet
    val out = TextAnalysis.calibratedGate(docs, "doc_id", "text", q = 0.25)
      .collect().map(r => ((r.getLong(0), r.getAs[Double]("quality_score")),
        r.getAs[Double]("threshold")))
    assert(out.map(_._1).toSet === expected)
    assert(out.map(_._2).distinct.toSeq === Seq(thr))
    // docs 2 and 3 are byte-identical -> equal scores: if either is
    // kept, both are (the gate is on score, not rank)
    val kept = out.map(_._1._1).toSet
    assert(kept.contains(2L) === kept.contains(3L))
  }

  test("weightedSample (x201): selection replicates the A-ES " +
      "ln(u)/w law computed locally — same ids, same order, same " +
      "weights — and is deterministic across runs") {
    import spark.implicits._
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill((i % 5).toInt + 1)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    def localKey(id: Long, nTokens: Int): (Double, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h + 1L).toDouble / 1152921504606846976.0
      (math.log(u) / (nTokens + 1).toDouble, id)
    }
    val expect = (1L to 30L)
      .map(i => localKey(i, (i % 5).toInt + 1))
      .sortBy { case (k, id) => (-k, id) }
      .take(10).map(_._2)
    val out = TextAnalysis.weightedSample(docs, "doc_id", "text", 10)
      .orderBy(org.apache.spark.sql.functions.col("rank")).collect()
    assert(out.map(_.getLong(0)).toSeq === expect)
    assert(out.map(_.getLong(2)).toSeq === (1L to 10L))
    // weights rode along: doc i has i % 5 + 2 as n_tokens_w
    out.foreach(r =>
      assert(r.getLong(1) === (r.getLong(0) % 5) + 2))
    val again = TextAnalysis.weightedSample(docs, "doc_id", "text", 10)
      .orderBy(org.apache.spark.sql.functions.col("rank")).collect().map(_.getLong(0)).toSeq
    assert(again === expect)
  }
  test("dsirSelect (x220): target-like documents outrank off-target " +
      "ones, no-bigram docs score 0, ranks dense, deterministic") {
    import org.apache.spark.sql.functions.col
    // target slice = lang 'en'; docs 1/2 share the target's bigrams,
    // docs 3/4 are pure off-target vocabulary, doc 5 has one token
    // (no bigrams) and doc 6 is empty.
    val d = Seq(
      (1L, "alpha beta gamma alpha beta", "en"),
      (2L, "alpha beta gamma delta", "xx"),
      (3L, "omega psi chi omega psi", "xx"),
      (4L, "psi chi omega chi", "xx"),
      (5L, "solo", "xx"),
      (6L, "", "xx")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.dsirSelect(d, "doc_id", "text",
      col("lang") === "en", numBuckets = 64, topN = 6)
      .orderBy("rank").collect()
    assert(out.length === 6)
    assert(out.map(_.getAs[Long]("rank")).toSeq === (1L to 6L))
    val score = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("score")).toMap
    val nGrams = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("n_grams")).toMap
    // docs built from the target's bigrams outrank off-target docs
    // (at these tiny counts add-one smoothing pulls ALL weights
    // negative, so the no-bigram docs' neutral 0 tops the list —
    // ordering is what the operator promises, not sign)
    assert(score(1L) > score(2L) && score(2L) > score(4L) &&
      score(4L) > score(3L))
    // no bigrams -> neutral 0 and zero gram count
    assert(score(5L) === 0.0 && nGrams(5L) === 0L)
    assert(score(6L) === 0.0 && nGrams(6L) === 0L)
    assert(nGrams(1L) === 4L && nGrams(2L) === 3L)
    // hand-computed fixture scores (md5 buckets, 1e-4 weights)
    assert(score(1L) === -0.4321 && score(3L) === -3.8456)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      Seq(5L, 6L, 1L, 2L, 4L, 3L))
    // topN truncates below the cut, keeping the best
    val top2 = TextAnalysis.dsirSelect(d, "doc_id", "text",
      col("lang") === "en", numBuckets = 64, topN = 2)
      .orderBy("rank").collect()
    assert(top2.map(_.getAs[Long]("doc_id")).toSeq ===
      out.take(2).map(_.getAs[Long]("doc_id")).toSeq)
    // deterministic end to end
    val again = TextAnalysis.dsirSelect(d, "doc_id", "text",
      col("lang") === "en", numBuckets = 64, topN = 6)
      .orderBy("rank").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // parameter guards
    intercept[IllegalArgumentException] {
      TextAnalysis.dsirSelect(d, "doc_id", "text",
        col("lang") === "en", numBuckets = 0, topN = 5)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.dsirSelect(d, "doc_id", "text",
        col("lang") === "en", numBuckets = 64, topN = 0)
    }
  }
  test("writeDsirIndex/dsirScoreIndexed (x222): the frozen table is " +
      "complete over all buckets, indexed scores follow the weight " +
      "law bit-for-bit, unseen grams take the smoothed default") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (2L, "alpha beta gamma alpha beta", "en"),
      (4L, "omega psi chi omega psi", "xx")
    ).toDF("doc_id", "text", "lang")
    val table = "graft_idx_test.dsir_w"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = java.nio.file.Paths.get("spark-warehouse",
      "graft_idx_test.db", "dsir_w")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    TextAnalysis.writeDsirIndex(corpus, "doc_id", "text",
      col("lang") === "en", numBuckets = 32, table)
    // COMPLETE: one weight row per bucket, including corpus-unseen ones
    assert(spark.table(table).count() === 32L)
    assert(spark.table(table).select("b").distinct().count() === 32L)

    // hand-recompute the law: corpus has P = 4 target grams, Q = 8 raw
    def w(p: Long, q: Long): Long =
      math.floor(math.log(((p + 1.0) * (8 + 32.0))
        / ((q + 1.0) * (4 + 32.0))) * 10000 + 0.5).toLong
    val batch = Seq(
      (1L, "alpha beta gamma"),        // 2 grams, both in-corpus/target
      (3L, "totally unseen gram pair brand new"), // 5 grams, none in corpus
      (5L, "solo")                     // no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dsirScoreIndexed(spark, batch, "doc_id",
      "text", table).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("score")))).toMap
    // doc 1: grams "alpha beta" (p=2,q=2) + "beta gamma" (p=1,q=1)
    assert(out(1L)._1 === 2L)
    assert(out(1L)._2 === (w(2, 2) + w(1, 1)) / 10000.0)
    // doc 3: every gram lands in an untrained bucket -> the smoothed
    // default w(0,0), five times (assumes no collision with trained
    // buckets at B=32 for these grams - verified by the score itself)
    assert(out(3L)._1 === 5L)
    assert(out(3L)._2 === 5 * w(0, 0) / 10000.0)
    // doc 5: no bigrams -> neutral zero
    assert(out(5L) === ((0L, 0.0)))
  }
}
