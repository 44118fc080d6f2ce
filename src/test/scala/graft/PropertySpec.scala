package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Substreams, Upsert, Watermark}

/** Property-based invariants (SURVEY §5.2): explode multiplicity, upsert
  * idempotence, watermark monotonicity — over ScalaCheck-generated inputs
  * (sampled deterministically; each case spins Spark jobs, so the sample
  * count is kept small). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(20), Seed(42L + i)))

  private val genRows: Gen[List[(Long, Long, Int)]] = Gen.nonEmptyListOf(
    for {
      key <- Gen.choose(0L, 5L)
      ts <- Gen.choose(0L, 1000L)
      v <- Gen.choose(0, 100)
    } yield (key, ts, v))

  test("upsert idempotence: upsert(upsert(x)) == upsert(x)") {
    samples(genRows, 5).foreach { rows =>
      val df = rows.toDF("k", "ts", "v")
      val once = Upsert.latestPerKey(df, Seq("k"), "ts", Seq("v"))
      val twice = Upsert.latestPerKey(once, Seq("k"), "ts", Seq("v"))
      assert(once.collect().toSet == twice.collect().toSet)
      assert(once.count() == rows.map(_._1).distinct.size) // one row per key
    }
  }

  test("watermark monotonicity: advancing the bookmark shrinks the batch") {
    val gen = for {
      rows <- genRows
      b1 <- Gen.choose(0L, 1000L)
      b2 <- Gen.choose(0L, 1000L)
    } yield (rows, math.min(b1, b2), math.max(b1, b2))
    samples(gen, 5).foreach { case (rows, lo, hi) =>
      val df = rows.map { case (k, ts, v) =>
        (k, new Timestamp(ts * 86400000L), v) }.toDF("k", "ts", "v")
      val early = Watermark.newerThan(df, "ts",
        new Timestamp(lo * 86400000L)).collect().toSet
      val late = Watermark.newerThan(df, "ts",
        new Timestamp(hi * 86400000L)).collect().toSet
      assert(late.subsetOf(early))
    }
  }

  test("substream multiplicity: child count == sum of list sizes") {
    val genParents: Gen[List[(String, List[String])]] = Gen.nonEmptyListOf(
      for {
        pid <- Gen.identifier.map(_.take(8))
        kids <- Gen.listOf(Gen.identifier.map(_.take(4)))
      } yield (pid, kids)).map(_.distinctBy(_._1))
    samples(genParents, 5).foreach { parents =>
      val df = parents.toDF("pid", "kids")
        .selectExpr("pid", "transform(kids, k -> named_struct('cid', k)) as kids")
      val out = Substreams.extract(df, "pid", "kids", "cid")
      assert(out.count() == parents.map(_._2.size).sum)
      val ids = out.select("id", "parent_id").collect()
      assert(ids.forall(r => r.getString(0).startsWith(r.getString(1) + "_")))
    }
  }

  test("exact-dedup partition: group sizes sum to corpus size") {
    val genDocs: Gen[List[String]] = Gen.nonEmptyListOf(
      Gen.oneOf("alpha beta", "ALPHA  beta", "gamma", "  gamma ", "delta"))
    samples(genDocs, 5).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val groups = operators.TextDedup.exactGroups(df, "doc_id", "text")
        .collect()
      assert(groups.map(_.getAs[Long]("n_dups")).sum == docs.size)
    }
  }

  test("boilerplate strip: passage accounting closes; clean text is an ordered subsequence") {
    // tiny vocabulary so cross-document passage collisions actually occur
    val genCorpus: Gen[List[(Long, String)]] = (for {
      n <- Gen.choose(2, 5)
      texts <- Gen.listOfN(n, Gen.choose(1, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("w0", "w1", "w2"))))
    } yield texts.zipWithIndex.map { case (ts, i) =>
      ((i + 1).toLong, ts.mkString(" ")) }).suchThat(_.nonEmpty)
    def isSubseq(sub: Seq[String], full: Seq[String]): Boolean = {
      var i = 0
      full.foreach(t => if (i < sub.length && sub(i) == t) i += 1)
      i == sub.length
    }
    samples(genCorpus, 4).foreach { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val out = operators.Cleaning
        .stripBoilerplate(df, "doc_id", "text", passageTokens = 2, maxDf = 1)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("n_dropped")))).toMap
      assert(out.size == corpus.size) // every document survives as a row
      corpus.foreach { case (id, text) =>
        val toks = text.split(" ").toSeq
        val nChunks = if (toks.size <= 2) 1L else ((toks.size + 1) / 2).toLong
        val (clean, kept, dropped) = out(id)
        assert(kept + dropped == nChunks)
        val cleanToks =
          if (clean.isEmpty) Seq.empty[String] else clean.split(" ").toSeq
        assert(isSubseq(cleanToks, toks),
          s"'$clean' is not an ordered subsequence of '$text'")
      }
    }
  }

  test("winnowing guarantee: a planted run of >= window+k-1 tokens shares a fingerprint") {
    val alphabet = (0 until 20).map(i => s"t$i")
    val genCase: Gen[(List[String], List[String], List[String], List[String], List[String])] =
      for {
        run <- Gen.listOfN(7, Gen.oneOf(alphabet)) // 7 >= 4 + 3 - 1
        pre1 <- Gen.listOf(Gen.oneOf(alphabet))
        suf1 <- Gen.listOf(Gen.oneOf(alphabet))
        pre2 <- Gen.listOf(Gen.oneOf(alphabet))
        suf2 <- Gen.listOf(Gen.oneOf(alphabet))
      } yield (run, pre1, suf1, pre2, suf2)
    samples(genCase, 4).foreach { case (run, pre1, suf1, pre2, suf2) =>
      val df = Seq(
        (1L, (pre1 ++ run ++ suf1).mkString(" ")),
        (2L, (pre2 ++ run ++ suf2).mkString(" "))
      ).toDF("doc_id", "text")
      val pairs = operators.TextDedup
        .winnowPairs(df, "doc_id", "text", minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)),
        s"planted run '${run.mkString(" ")}' produced no shared fingerprint")
    }
  }

  test("shard partition law: ranks are a permutation; every shard is full " +
      "except possibly the last") {
    val genCase = for {
      n <- Gen.choose(1, 40)
      shardSize <- Gen.choose(1L, 12L)
    } yield (n, shardSize)
    samples(genCase, 5).foreach { case (n, shardSize) =>
      val docs = (0L until n.toLong).map(i => (i * 7 + 3, s"w$i x"))
        .toDF("doc_id", "text")
      val out = operators.Packing
        .shardAssign(docs, "doc_id", "text", shardSize)
        .collect()
      assert(out.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (0L until n.toLong), s"ranks not a permutation (n=$n)")
      val sizes = out.groupBy(_.getAs[Long]("shard_id"))
        .map { case (s, rs) => s -> rs.length.toLong }
      val lastShard = (n - 1) / shardSize
      sizes.foreach { case (s, sz) =>
        if (s < lastShard) assert(sz == shardSize,
          s"shard $s not full: $sz of $shardSize (n=$n)")
        else assert(sz == n - lastShard * shardSize,
          s"last shard wrong size (n=$n, shardSize=$shardSize)")
      }
    }
  }

  test("classifier score law: surrogate scores live in [-10, 10] and are " +
      "invariant to case/leading-trailing whitespace") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    val genDoc = Gen.nonEmptyListOf(word).map(_.take(12).mkString(" "))
    samples(Gen.listOfN(4, genDoc), 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val scores = operators.Classifier.score(docs, "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("score")).toMap
      assert(scores.values.forall(s => s >= -10 && s <= 10))
      val shouted = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, "  " + t.toUpperCase + " ") }.toDF("doc_id", "text")
      val scores2 = operators.Classifier.score(shouted, "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("score")).toMap
      assert(scores2 == scores, "score not normalization-invariant")
    }
  }

  test("incremental dedup stability: survivors re-run against " +
      "(existing + survivors) all drop; against existing alone are a fixpoint") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val genDoc = Gen.listOfN(4, word).map(_.mkString(" "))
    val genCase = for {
      ex <- Gen.listOfN(5, genDoc)
      nw <- Gen.listOfN(6, genDoc)
    } yield (ex, nw)
    samples(genCase, 4).foreach { case (ex, nw) =>
      val existing = ex.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = nw.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val surv = operators.TextDedup
        .incrementalExactDedup(batch, existing, "doc_id", "text")
      val survRows = surv.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
      // fixpoint: survivors are already distinct and disjoint from
      // existing, so re-running them as a batch changes nothing
      val again = operators.TextDedup
        .incrementalExactDedup(surv, existing, "doc_id", "text")
        .collect().map(r =>
          (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
      assert(again.toSet == survRows.toSet)
      // absorption: once the corpus has ingested the survivors, the
      // same batch dedups to nothing
      val absorbed = operators.TextDedup
        .incrementalExactDedup(batch, existing.unionByName(surv),
          "doc_id", "text")
      assert(absorbed.count() == 0)
    }
  }
}
