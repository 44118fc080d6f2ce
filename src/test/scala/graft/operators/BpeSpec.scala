package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges: greedy pair argmax with lexicographic ties, early stop " +
      "when fully merged (x82)") {
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab xy"))
      .toDF("doc_id", "text")
    val out = Bpe.merges(docs, "text", rounds = 6).collect()
      .map(r => (r.getAs[Int]("merge_round"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("pair_count"))).toSeq
    // vocab: aaab x3, ab x1, xy x1
    // r0: (a,a)=6 beats (a,b)=4        -> merge a+a (greedy: aaab=[aa,a,b])
    // r1: (a,b)=4 beats (aa,a)=3       -> merge a+b
    // r2: (aa,ab)=3                    -> merge aa+ab
    // r3: (x,y)=1                      -> merge x+y
    // r4: nothing left => early stop at 4 rows, not 6
    assert(out == Seq(
      (0, "a", "a", 6L),
      (1, "a", "b", 4L),
      (2, "aa", "ab", 3L),
      (3, "x", "y", 1L)))
  }

  test("merge-apply is greedy left-to-right non-overlapping") {
    // "aaaa": merging (a,a) must give [aa][aa] -> round 2 pairs (aa,aa)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = Bpe.merges(docs, "text", rounds = 2).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(out == Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("symbols with regex metacharacters never corrupt merge-apply") {
    // '(', '.', '$' as symbols: the replace chain is plain-string, and
    // only the SUBJECT side ever sees them — a regex-built apply would
    // throw or mis-merge here
    val docs = Seq((1L, "(.$ (.$ (.)")).toDF("doc_id", "text")
    val trained = Bpe.mergeList(docs, "text", rounds = 3)
    assert(trained.head == (("(", ".")))
    val enc = Bpe.encodeStats(docs, "doc_id", "text", trained).head()
    assert(enc.getAs[Long]("n_words") == 3L)
  }

  test("encodeStats applies the trained merges in order (x84)") {
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aaab xy"))
      .toDF("doc_id", "text")
    def stats(merges: Seq[(String, String)]) =
      Bpe.encodeStats(docs, "doc_id", "text", merges)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_words"), r.getAs[Long]("n_subtokens")))).toMap
    // one merge (a,a): aaab -> [aa,a,b]=3, ab -> [a,b]=2, xy -> [x,y]=2
    assert(stats(Seq(("a", "a"))) ==
      Map(1L -> ((3L, 8L)), 2L -> ((2L, 5L))))
    // the full trained list collapses every word to one symbol except
    // none: aaab -> [aaab], ab -> [ab], xy -> [xy]
    val trained = Bpe.mergeList(docs, "text", rounds = 6)
    assert(trained == Seq(("a", "a"), ("a", "b"), ("aa", "ab"),
      ("x", "y")))
    assert(stats(trained) == Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L))))
  }

  test("compressionByGroup: exact-sum ratio per group (x102)") {
    val docs = Seq(
      (1L, "en", "aaab aaab ab"), (2L, "en", "aaab xy"),
      (3L, "de", "qq qq"), (4L, "de", "")
    ).toDF("doc_id", "lang", "text")
    // merge (a,a) only: en doc1 [aa,a,b]x2+[a,b] = 8 sub / 3 words,
    // doc2 [aa,a,b]+[x,y] = 5 / 2; de "qq" -> [q,q] = 2 sub each word
    val out = Bpe.compressionByGroup(docs, "doc_id", "text", "lang",
        Seq(("a", "a")))
      .collect().map(r => r.getAs[String]("group") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_subtokens"),
          r.getAs[Double]("subtokens_per_word")))).toMap
    assert(out("en") == ((2L, 5L, 13L,
      math.floor(13.0 / 5.0 * 1e4 + 0.5) / 1e4)))
    // empty doc contributes n_words=0 to the de sums
    assert(out("de") == ((2L, 2L, 4L, 2.0)))
  }
}
