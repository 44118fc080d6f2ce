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
}
