package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packChunks: every chunk packed once; packs respect the budget") {
    val chunks = (1L to 100L).map(i =>
      (i, 0L, 10 + (i % 50).toInt)) // token counts 10..59
      .toDF("doc_id", "chunk_idx", "n_tokens")
    val packed = Packing.packChunks(spark, chunks, budget = 128).collect()
    // exactly-once membership
    assert(packed.map(p => (p.doc_id, p.chunk_idx)).distinct.length == 100)
    assert(packed.length == 100)
    // no pack exceeds the budget (no oversized chunks in this input)
    val byPack = packed.groupBy(_.pack_id)
    byPack.foreach { case (id, ms) =>
      val total = ms.map(_.n_tokens).sum
      assert(total <= 128, s"pack $id over budget: $total")
      assert(ms.forall(_.pack_tokens == total)) // consistent annotation
    }
    // packing actually packs: fewer packs than chunks, decent fill
    assert(byPack.size < 50)
    val fill = packed.map(_.n_tokens).sum.toDouble / (byPack.size * 128)
    assert(fill > 0.7, s"fill rate $fill too low for first-fit")
  }

  test("packDeterministic: assignment invariant to input partitioning (x61)") {
    val chunks = (1L to 200L).map(i =>
      (i % 40, i / 40, 5 + (i % 60).toInt))
      .toDF("doc_id", "chunk_idx", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packDeterministic(spark, df, budget = 100)
        .collect().map(p => (p.pack_id, p.doc_id, p.chunk_idx, p.n_tokens,
          p.pack_tokens)).sortBy(x => (x._2, x._3)).toSeq
    val base = run(chunks)
    assert(base.length == 200)
    // repartitioning / reordering the INPUT cannot change the assignment
    assert(run(chunks.repartition(13)) == base)
    assert(run(chunks.repartition(1).orderBy(desc("n_tokens"))) == base)
    // budget + exactly-once hold like the first-fit form
    base.groupBy(_._1).foreach { case (id, ms) =>
      val total = ms.map(_._4).sum
      assert(total <= 100, s"pack $id over budget: $total")
      assert(ms.forall(_._5 == total))
    }
  }

  test("packDeterministic: oversized chunks become singleton packs") {
    val chunks = Seq((1L, 0L, 250), (2L, 0L, 30), (3L, 0L, 40))
      .toDF("doc_id", "chunk_idx", "n_tokens")
    val packed = Packing.packDeterministic(spark, chunks, budget = 100)
      .collect()
    assert(packed.length == 3)
    val oversize = packed.find(_.doc_id == 1L).get
    assert(oversize.pack_tokens == 250)
    assert(packed.count(_.pack_id == oversize.pack_id) == 1)
    assertThrows[IllegalArgumentException] {
      Packing.packDeterministic(spark, chunks, budget = 0)
    }
  }

  test("concatOffsets: contiguous spans covering the token stream (x46)") {
    val docs = (1L to 200L).map(i => (i, ("w " * (1 + (i % 17).toInt)).trim))
      .toDF("doc_id", "text")
    val out = Packing.concatOffsets(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 200)
    // spans tile [0, total) with no gaps or overlaps
    val spans = out.sortBy(_._3)
    assert(spans.head._3 == 0L)
    spans.sliding(2).foreach { case Array((_, n, s), (_, _, s2)) =>
      assert(s + n == s2, s"gap/overlap at offset $s")
    }
    val total = spans.last._3 + spans.last._2
    assert(total == out.map(_._2).sum)
    // the result is invariant to the bucketing (plan shape only)
    val other = Packing.concatOffsets(docs, "doc_id", "text", bucketBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(other.toSet == out.toSet)
    // and matches the single-window formulation (the oracle shape)
    val hk = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window.orderBy(hk, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = docs.select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(naive.toSet == out.toSet)

    // the column-count form (x96's engine): identical when fed the
    // whitespace counts, and arbitrary counts drive the prefix sum
    val counted = docs.withColumn("n",
      size(split(lower(trim(col("text"))), "\\s+")))
    val viaCol = Packing.concatOffsetsBy(counted, "doc_id", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaCol.toSet == out.toSet)
    val doubled = Packing.concatOffsetsBy(
        counted.withColumn("n", col("n") * 2), "doc_id", "n")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out.foreach { case (id, n, s) =>
      assert(doubled(id) == ((2 * n, 2 * s)),
        s"doc $id: expected doubled counts/offsets") }
  }

  test("concatOffsets: bucketBits-invariant at high fan-out (16 vs 8)") {
    // larger corpus + 2^16 buckets: the totals frame is 65536 rows —
    // exercises the single-task totals window and the broadcast at the
    // recommended high end while the corpus-side window stays partitioned
    val docs = (1L to 20000L).map(i =>
      (i, ("w " * (1 + (i % 29).toInt)).trim)).toDF("doc_id", "text")
    val base = Packing.concatOffsets(docs, "doc_id", "text", bucketBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hi = Packing.concatOffsets(docs, "doc_id", "text", bucketBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hi.toSet == base.toSet) // claimed property: bucketBits-invariant
    // and the high-fan-out result still tiles [0, total)
    val spans = hi.sortBy(_._3)
    assert(spans.head._3 == 0L)
    spans.sliding(2).foreach { case Array((_, n, s), (_, _, s2)) =>
      assert(s + n == s2, s"gap/overlap at offset $s")
    }
  }

  test("groupedOffsets: per-group tiling; groups are independent concats") {
    val docs = (1L to 300L).map(i =>
      (i, s"g${i % 3}", ("w " * (1 + (i % 13).toInt)).trim))
      .toDF("doc_id", "grp", "text")
    val out = Packing.groupedOffsets(docs, "doc_id", "text", "grp")
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("start_offset")))
    assert(out.length == 300)
    out.groupBy(_._1).foreach { case (g, rows) =>
      // within each group, spans tile [0, group total) with no gaps
      val spans = rows.sortBy(_._4)
      assert(spans.head._4 == 0L, s"group $g does not start at 0")
      spans.sliding(2).foreach { case Array((_, _, n, s), (_, _, _, s2)) =>
        assert(s + n == s2, s"gap/overlap in group $g at offset $s")
      }
      // and each group independently matches the ungrouped operator run
      // on just that group's documents
      val alone = Packing.concatOffsets(
          docs.filter(col("grp") === g), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.map(r => (r._2, r._3, r._4)).toSet == alone)
    }
  }

  test("packChunks property: exactly-once + budget over random inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.nonEmptyListOf(Gen.choose(1, 200))
    val cases = (0 until 4).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(120), Seed(7L + i)))
    assert(cases.nonEmpty, "generator produced no cases — vacuous test")
    cases.foreach { sizes =>
        val chunks = sizes.zipWithIndex
          .map { case (n, i) => (i.toLong, 0L, n) }
          .toDF("doc_id", "chunk_idx", "n_tokens")
        val packed = Packing.packChunks(spark, chunks, budget = 128).collect()
        assert(packed.length == sizes.length) // exactly once
        assert(packed.map(_.doc_id).distinct.length == sizes.length)
        packed.groupBy(_.pack_id).foreach { case (id, ms) =>
          val total = ms.map(_.n_tokens).sum
          assert(ms.forall(_.pack_tokens == total))
          // over budget only for oversized singletons
          assert(total <= 128 || ms.length == 1,
            s"pack $id over budget with ${ms.length} members")
        }
      }
  }

  test("packChunks: oversized chunks become singleton packs, not dropped") {
    val chunks = Seq(
      (1L, 0L, 500), // oversized vs budget 128
      (2L, 0L, 60), (3L, 0L, 60)
    ).toDF("doc_id", "chunk_idx", "n_tokens")
    val packed = Packing.packChunks(spark, chunks, budget = 128).collect()
    assert(packed.length == 3)
    val big = packed.find(_.doc_id == 1L).get
    assert(big.pack_tokens == 500) // singleton, annotated with its size
    // nothing else joined the oversized pack
    assert(packed.count(_.pack_id == big.pack_id) == 1)
  }

  test("shardAssign: md5-order ranks are a permutation; shards contiguous " +
      "and full except the last (x71)") {
    val docs = (0L until 10L).map(i => (i, s"tok$i words here"))
      .toDF("doc_id", "text")
    val out = Packing.shardAssign(docs, "doc_id", "text", shardSize = 3)
      .collect()
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq == (0L until 10L))
    // rank order IS ascending (shuffle_key, doc_id) order
    val byRank = out.sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("shuffle_key"), r.getAs[Long]("doc_id")))
    assert(byRank.toSeq == byRank.sortBy(identity).toSeq)
    // shard = rank / shardSize: sizes 3,3,3,1
    val sizes = out.groupBy(_.getAs[Long]("shard_id"))
      .map { case (s, rs) => s -> rs.length }
    assert(sizes == Map(0L -> 3, 1L -> 3, 2L -> 3, 3L -> 1))
  }

  test("shardAssign: invariant to the bucket split (1 vs 3 hex chars)") {
    val docs = (0L until 50L).map(i => (i, s"alpha beta $i"))
      .toDF("doc_id", "text")
    val a = Packing.shardAssign(docs, "doc_id", "text", 8, bucketHexChars = 1)
      .select("doc_id", "rank", "shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = Packing.shardAssign(docs, "doc_id", "text", 8, bucketHexChars = 3)
      .select("doc_id", "rank", "shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }

  test("groupedShardAssign: ranks restart per group; groups lay out " +
      "independently (x77)") {
    val docs = (0L until 30L).map(i => (i, s"a b c", if (i % 3 == 0) "x" else "y"))
      .toDF("doc_id", "text", "grp")
    val out = Packing.groupedShardAssign(docs, "doc_id", "text", "grp",
      shardSize = 4).collect()
    val byGroup = out.groupBy(_.getAs[String]("grp"))
    assert(byGroup.keySet == Set("x", "y"))
    byGroup.foreach { case (g, rows) =>
      val n = rows.length.toLong
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (0L until n),
        s"group $g ranks not a fresh permutation")
      // a group's layout equals running shardAssign on that group alone
      val solo = Packing.shardAssign(docs.filter(col("grp") === g),
          "doc_id", "text", shardSize = 4)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("rank"), r.getAs[Long]("shard_id"))).sorted.toSeq
      val grouped = rows.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("rank"), r.getAs[Long]("shard_id"))).sorted.toSeq
      assert(solo == grouped, s"group $g layout differs from solo run")
    }
  }

  test("shardManifest: key ranges tile the hash order without overlap") {
    val docs = (0L until 40L).map(i => (i, s"w$i x y")).toDF("doc_id", "text")
    val m = Packing.shardManifest(docs, "doc_id", "text", shardSize = 16)
      .collect().sortBy(_.getAs[Long]("shard_id"))
    assert(m.map(_.getAs[Long]("n_docs")).toSeq == Seq(16L, 16L, 8L))
    assert(m.forall(r => r.getAs[Long]("n_tokens") == 3 * r.getAs[Long]("n_docs")))
    // consecutive shards: strictly increasing, non-overlapping key ranges
    m.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[String]("last_key") < hi.getAs[String]("first_key"))
      case _ =>
    }
  }
}
