package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // orthogonal-ish unit vectors: 0 aligned with 1, opposite of 2, orthogonal 3
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(-1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.5f, 0.5f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self (X3)") {
    val out = Similarity.bruteForceTopK(
      vecs.filter("vec_id = 0"), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 4L, 3L))
    assert(out.head.getAs[Double]("similarity") > 0.99)
  }

  test("cosinePairs returns threshold-filtered unordered pairs (x9)") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L))) // opposite vectors
    assert(pairs.forall(p => p._1 < p._2)) // canonical orientation
  }

  test("cosinePairs size gate trips past maxRows, pointing at the IVF path") {
    val e = intercept[IllegalArgumentException] {
      Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9, maxRows = 3)
    }
    assert(e.getMessage.contains("ivfCosinePairs"))
    assert(e.getMessage.contains("5 rows"))
    // under the threshold the exact variant still runs (x9 oracle shape)
    assert(Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.9,
      maxRows = 5).count() > 0)
  }

  test("dedupedVectors keeps one rep per near-dup cluster (x39)") {
    // two centroids: 0/1/4 land in centroid-0's bucket (4 ties .707/.707,
    // broken to the lower centroid id), 2/3 in centroid-3's. In-bucket
    // pairs at cos>=0.7: (0,1)=.994, (0,4)=.707, (1,4)=.78 => one cluster
    // {0,1,4} keeping 0; 2~3 at cos 0 stay singletons.
    val out = Similarity.dedupedVectors(vecs,
        vecs.filter("vec_id IN (0, 3)"), "vec_id", "embedding",
        threshold = 0.7)
      .collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(out == Seq(0L, 2L, 3L))
  }

  test("ivfTopK probes buckets and never returns self (x10)") {
    val out = Similarity.ivfTopK(
      vecs.filter("vec_id = 0"), vecs, vecs.filter("vec_id < 3"),
      "vec_id", "embedding", k = 2, nprobe = 2)
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getAs[Long]("neighbor_id") == 0L))
    // rank-1 neighbor must be vector 1 (same bucket, near-parallel)
    assert(out.head.getAs[Long]("neighbor_id") == 1L)
  }

  test("knnLabel takes the majority label, ties to the smallest (x70)") {
    import spark.implicits._
    val centroids = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    // labeled seed: 1/4/5 assign to centroid 0's bucket, 2 to centroid 3's
    val labeled = Seq(
      (1L, Array(0.9f, 0.1f, 0.0f), 7),
      (4L, Array(0.5f, 0.5f, 0.0f), 7),
      (5L, Array(0.8f, 0.2f, 0.0f), 3),
      (2L, Array(-1.0f, 0.0f, 0.0f), 2)).toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Array(1.0f, 0.0f, 0.0f), -1),
      (101L, Array(0.9f, 0.1f, 0.0f), -1)).toDF("vec_id", "embedding", "label")

    // k=3 in centroid-0's bucket: neighbors 1(7), 5(3), 4(7) => 7 by 2 votes
    val maj = Similarity.knnLabel(q.filter("vec_id = 100"), labeled,
        centroids, "vec_id", "embedding", "label", k = 3, nprobe = 1)
      .collect()
    assert(maj.length == 1)
    assert(maj.head.getAs[Long]("predicted_label") == 7L)
    assert(maj.head.getAs[Long]("votes") == 2L)
    assert(maj.head.getAs[Long]("n_neighbors") == 3L)

    // k=2 from 101: neighbors 1(7) then 5(3) => 1-1 tie, smallest label
    val tie = Similarity.knnLabel(q.filter("vec_id = 101"), labeled,
        centroids, "vec_id", "embedding", "label", k = 2, nprobe = 1)
      .collect()
    assert(tie.head.getAs[Long]("predicted_label") == 3L)
    assert(tie.head.getAs[Long]("votes") == 1L)
    assert(tie.head.getAs[Long]("n_neighbors") == 2L)

    // fractional label types would silently truncate through the
    // -cast("long") tie-break (distinct labels colliding): rejected
    val fractional = labeled.withColumn("label",
      org.apache.spark.sql.functions.col("label").cast("double"))
    intercept[IllegalArgumentException] {
      Similarity.knnLabel(q, fractional, centroids, "vec_id",
        "embedding", "label", k = 3, nprobe = 1)
    }
  }

  test("quantizeReport: exact scale/rmse/q_max, zero-vector guarded (x72)") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(127.0f, 0.0f, -63.5f)),
      (1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeReport(emb, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[Double]("rmse"),
          r.getAs[Long]("q_max"))).toMap
    // scale 1.0; q = [127, 0, floor(-63.5+0.5) = -63]; err = [0,0,-0.5]
    // => rmse = sqrt(0.25/3) on the 1e-6 grid; |q| max = 127
    assert(out(0L)._1 == 1.0)
    assert(out(0L)._2 == math.floor(math.sqrt(0.25 / 3) * 1e6 + 0.5) / 1e6)
    assert(out(0L)._3 == 127L)
    // all-zero vector: scale 0, rmse 0, q_max 0 (guarded, not NaN)
    assert(out(1L) == ((0.0, 0.0, 0L)))
  }

  test("quantizedTopK ranks by integer-exact quantized cosine; " +
      "zero vectors excluded on both sides (x88)") {
    val corpus = Seq(
      (10L, Array(2.0f, 0.0f)),   // q=(127,0): sim 1.0 with the query
      (11L, Array(1.0f, 1.0f)),   // q=(127,127): sim 1/sqrt(2)
      (12L, Array(0.0f, 0.0f)),   // zero vector: no grid, excluded
      (13L, Array(-1.0f, 0.5f))   // q=(-127,64): negative sim
    ).toDF("vec_id", "embedding")
    val queries = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f))     // zero QUERY also excluded
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizedTopK(queries, corpus, "vec_id",
        "embedding", k = 2)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("similarity"))).toSet
    assert(out == Set(
      (1L, 10L, 1L, 1.0),
      (1L, 11L, 2L, 0.707107)))  // floor(1/sqrt(2)*1e6 + 0.5)/1e6
  }

  test("kmeansCodebook assigns to argmax-cosine centroid after Lloyd " +
      "rounds; clusters with no members drop (x90)") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.95f, 0.05f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.05f, 0.95f, 0.0f)),
      (5L, Array(0.1f, 0.9f, 0.0f))).toDF("vec_id", "embedding")
    // seeds 100/200 sit on the two direction clusters; seed 300 points
    // away from every corpus vector (argmax-cosine never picks it), so
    // its cluster is empty after round 1 and drops from the codebook
    val init = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (200L, Array(0.0f, 1.0f, 0.0f)),
      (300L, Array(-1.0f, -0.5f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.kmeansCodebook(corpus, init, "vec_id",
        "embedding", rounds = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("cluster_id")).toMap
    assert(out.size == 6) // every vector assigned exactly once
    assert(out.values.toSet == Set(100L, 200L)) // 300 dropped
    assert(Seq(0L, 1L, 2L).forall(out(_) == 100L))
    assert(Seq(3L, 4L, 5L).forall(out(_) == 200L))

    // the trained codebook itself (x94's input): exact grid means of
    // each cluster's members — integer sums make them exact floats
    val cb = Similarity.kmeansCentroids(corpus, init, "vec_id",
        "embedding", rounds = 2)
      .collect().map(r => r.getAs[Long]("centroid_id") ->
        r.getSeq[Float](1).toList).toMap
    assert(cb.keySet == Set(100L, 200L))
    assert(cb(100L) == List(950000f, 50000f, 0f))
    assert(cb(200L) == List(50000f, 950000f, 0f))
  }

  test("ivfTopKIndexed returns ivfTopK's rows via the persisted index; " +
      "the corpus side is a pure index scan (x91)") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    Seq("graft_idx_test.ann_assign", "graft_idx_test.ann_cent").foreach {
      name =>
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val Array(db, t) = name.split('.')
        val loc = java.nio.file.Paths.get("spark-warehouse", s"$db.db", t)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
    }
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.8f, 0.2f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.1f, 0.9f, 0.0f)),
      (5L, Array(0.2f, 0.8f, 0.0f)),
      (6L, Array(0.5f, 0.5f, 0.0f)),
      (7L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = corpus.filter("vec_id IN (0, 3, 7)")
    val queries = corpus.filter("vec_id IN (1, 4)")
    Similarity.writeAnnIndex(corpus, cents, "vec_id", "embedding",
      "graft_idx_test.ann_assign", "graft_idx_test.ann_cent",
      numBuckets = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("similarity"))).toSet
    val direct = rows(Similarity.ivfTopK(queries, corpus, cents,
      "vec_id", "embedding", k = 3, nprobe = 2))
    val indexed = Similarity.ivfTopKIndexed(queries, "vec_id",
      "embedding", k = 3, nprobe = 2,
      "graft_idx_test.ann_assign", "graft_idx_test.ann_cent")
    assert(rows(indexed) == direct)
    assert(direct.nonEmpty)
    // plan pin: the corpus side comes from the bucketed artifact with
    // ZERO assignment-kernel or norm recompute (the kernel appears only
    // in the build; the probe list is probeCentroids on the query side)
    val p = indexed.queryExecution.optimizedPlan.toString
    assert(p.contains("ann_assign"), s"index table not scanned:\n$p")
    assert("(?i)nearestcentroid".r.findAllIn(p).isEmpty,
      s"corpus assignment recomputed at query time:\n$p")
    // the probed-centroid IN predicate engages bucket pruning: the scan
    // reads only the probed buckets' files, not the whole index
    val exec = indexed.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(exec)
    assert(sel.isDefined, s"bucket pruning not engaged:\n$exec")
    assert(sel.get.group(1).toInt <= sel.get.group(2).toInt)
  }

  test("embeddingSurvivorsIndexed drops batch vectors near the indexed " +
      "corpus; appendAnnIndex extends the index (x92)") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    Seq("graft_idx_test.ann2_assign", "graft_idx_test.ann2_cent").foreach {
      name =>
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val Array(db, t) = name.split('.')
        val loc = java.nio.file.Paths.get("spark-warehouse", s"$db.db", t)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
    }
    val existing = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(existing, existing, "vec_id", "embedding",
      "graft_idx_test.ann2_assign", "graft_idx_test.ann2_cent",
      numBuckets = 2)
    val batch = Seq(
      (10L, Array(0.99f, 0.01f, 0.0f)), // ~corpus 0: dropped
      (11L, Array(0.0f, 0.0f, 1.0f)),   // orthogonal to both: survives
      (12L, Array(0.05f, 0.95f, 0.0f))  // ~corpus 3: dropped
    ).toDF("vec_id", "embedding")
    def survivors(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Similarity.embeddingSurvivorsIndexed(df, "vec_id", "embedding",
          threshold = 0.9, nprobe = 2,
          "graft_idx_test.ann2_assign", "graft_idx_test.ann2_cent")
        .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(survivors(batch) == Set(11L))
    // append the survivor; a later batch near it now drops — only
    // possible because the index grew under the SAME codebook
    Similarity.appendAnnIndex(batch.filter("vec_id = 11"), "vec_id",
      "embedding", "graft_idx_test.ann2_assign",
      "graft_idx_test.ann2_cent", numBuckets = 2)
    spark.catalog.refreshTable("graft_idx_test.ann2_assign")
    val batch2 = Seq(
      (20L, Array(0.0f, 0.0f, 0.9f)),   // ~survivor 11: dropped now
      (21L, Array(-1.0f, 0.0f, 0.0f))   // negative cosine: survives
    ).toDF("vec_id", "embedding")
    assert(survivors(batch2) == Set(21L))
    // empty batch: empty probe set -> empty IN list -> empty result,
    // no degenerate plan
    assert(survivors(batch.limit(0)) == Set.empty[Long])
    // a degenerate round count is rejected, not silently absorbed
    intercept[IllegalArgumentException] {
      Similarity.kmeansCodebook(batch, batch, "vec_id", "embedding",
        rounds = 0)
    }
  }

  test("ivfBalanceReport: bucket sizes, dead centroids, load factor " +
      "(x101)") {
    // centroids 0 (x-axis) and 3 (y-axis): vecs 0,1,2,4 -> 0-ish...
    // cosine argmax: 0->0, 1->0, 2 (-x, cos -1 vs 0 on y) -> 3,
    // 4 (45°, tie 0.707/0.707) -> smaller centroid id 0, 3->3
    val cents = vecs.filter("vec_id IN (0, 3)")
    val out = Similarity.ivfBalanceReport(vecs, cents, "vec_id",
        "embedding")
      .collect().map(r => r.getAs[Long]("centroid_id") ->
        ((r.getAs[Long]("n_vectors"), r.getAs[Double]("load_factor"))))
      .toMap
    val lf = (n: Long) =>
      math.floor(n.toDouble * 2.0 / 5.0 * 1e4 + 0.5) / 1e4
    assert(out(0L) == ((3L, lf(3))))
    assert(out(3L) == ((2L, lf(2))))
    // a centroid no vector chooses reports 0, not absence
    val far = Seq((9L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val withDead = Similarity.ivfBalanceReport(vecs,
        cents.union(far.limit(0)).union(far), "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("centroid_id") ->
        r.getAs[Long]("n_vectors")).toMap
    assert(withDead(9L) == 0L)

    // empty corpus: every load factor is the defined 0.0, never NaN
    val empty = Similarity.ivfBalanceReport(vecs.limit(0), cents,
        "vec_id", "embedding")
      .collect().map(r => (r.getAs[Long]("n_vectors"),
        r.getAs[Double]("load_factor")))
    assert(empty.nonEmpty)
    assert(empty.forall { case (n, lf) => n == 0L && lf == 0.0 })
  }

  // two well-separated groups in 8 dims: A loads the first half, B the
  // second — with m=2 the subspaces see the groups separately, so PQ
  // codes must separate them too
  private lazy val pqVecs = Seq(
    (0L, Array(1.0f, 0.9f, 1.1f, 1.0f, 0.0f, 0.1f, 0.0f, 0.0f)),  // A (init)
    (1L, Array(0.0f, 0.1f, 0.0f, 0.0f, 1.0f, 1.1f, 0.9f, 1.0f)),  // B (init)
    (2L, Array(1.1f, 1.0f, 0.9f, 1.0f, 0.1f, 0.0f, 0.0f, 0.1f)),  // A
    (3L, Array(0.1f, 0.0f, 0.1f, 0.0f, 0.9f, 1.0f, 1.0f, 1.1f)),  // B
    (4L, Array(0.9f, 1.1f, 1.0f, 0.9f, 0.0f, 0.0f, 0.1f, 0.0f)),  // A
    (5L, Array(0.0f, 0.0f, 0.1f, 0.1f, 1.1f, 0.9f, 1.0f, 0.9f))   // B
  ).toDF("vec_id", "embedding")

  test("pqEncode (x120): codes separate well-clustered groups and are " +
      "deterministic across runs") {
    def codes() = Similarity.pqEncode(pqVecs, "vec_id", "embedding",
        m = 2, k = 2, rounds = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("code_0"), r.getAs[Long]("code_1")))).toMap
    val c = codes()
    val a = Set(0L, 2L, 4L); val b = Set(1L, 3L, 5L)
    // every A member shares A's code pair, every B member B's, and the
    // two pairs differ in BOTH subspaces (the groups are separated in
    // each half-space)
    assert(a.map(c).size == 1 && b.map(c).size == 1)
    assert(c(0L)._1 != c(1L)._1 && c(0L)._2 != c(1L)._2)
    assert(codes() === c)
  }

  test("pqTopK (x121): ADC ranks same-group vectors first, excludes " +
      "self, monotone distance") {
    val out = Similarity.pqTopK(pqVecs.filter("vec_id = 0"), pqVecs,
        "vec_id", "embedding", topK = 5, m = 2, k = 2, rounds = 2)
      .orderBy("rank").collect()
    val ids = out.map(_.getAs[Long]("neighbor_id")).toSeq
    assert(!ids.contains(0L))
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
    // with one codeword per group, ADC collapses each group to one
    // distance: both A members rank before every B member
    assert(ids.take(2).toSet == Set(2L, 4L))
    val d = out.map(_.getAs[Double]("adc_dist"))
    assert(d.zip(d.tail).forall { case (x, y) => x <= y })
    assert(d.forall(_ >= 0.0))
  }

  test("deleteFromIndex on the ANN assignment table (x214): post-delete " +
      "serving rows bit-identical to a from-scratch rebuild on the " +
      "reduced corpus (frozen centroids); PQ codes delete drops the " +
      "ids from serving under frozen books") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.8f, 0.2f, 0.0f)), (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.1f, 0.9f, 0.0f)), (5L, Array(0.2f, 0.8f, 0.0f)),
      (6L, Array(0.5f, 0.5f, 0.0f)), (7L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = corpus.filter("vec_id IN (0, 3, 7)")
    val queries = corpus.filter("vec_id IN (1, 4)")
    val tabs = Seq("graft_idx_test.annd_assign", "graft_idx_test.annd_cent",
      "graft_idx_test.annd_assign_reb", "graft_idx_test.annd_cent_reb")
    tabs.foreach(graft.sinks.Sinks.dropManaged(spark, _))
    val Seq(aT, cT, aR, cR) = tabs
    Similarity.writeAnnIndex(corpus, cents, "vec_id", "embedding",
      aT, cT, numBuckets = 2)
    graft.operators.Warehouse.deleteFromIndex(spark, aT, "neighbor_id",
      Seq(2L, 5L).toDF("vec_id"))
    Similarity.writeAnnIndex(corpus.filter("vec_id NOT IN (2, 5)"),
      cents, "vec_id", "embedding", aR, cR, numBuckets = 2)
    assert(spark.table(aT).collect().map(_.toSeq).toSet ===
      spark.table(aR).collect().map(_.toSeq).toSet)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Similarity.ivfTopKIndexed(queries, "vec_id", "embedding",
        k = 3, nprobe = 2, aT, cT)) ===
      rows(Similarity.ivfTopKIndexed(queries, "vec_id", "embedding",
        k = 3, nprobe = 2, aR, cR)))

    // PQ: books are the FROZEN model — delete removes the ids' code
    // rows; serving equals the untouched index minus those neighbors
    val (codesT, booksT) =
      ("graft_idx_test.pqd_codes", "graft_idx_test.pqd_books")
    Seq(codesT, booksT).foreach(graft.sinks.Sinks.dropManaged(spark, _))
    Similarity.writePqIndex(pqVecs, "vec_id", "embedding", codesT, booksT,
      m = 2, k = 2, rounds = 2)
    val before = rows(Similarity.pqTopKIndexed(spark,
      pqVecs.filter("vec_id = 0"), "vec_id", "embedding", codesT, booksT,
      topK = 5))
    graft.operators.Warehouse.deleteFromIndex(spark, codesT, "vec_id",
      Seq(2L).toDF("vec_id"))
    val after = rows(Similarity.pqTopKIndexed(spark,
      pqVecs.filter("vec_id = 0"), "vec_id", "embedding", codesT, booksT,
      topK = 5))
    assert(!after.exists(_(1) == 2L), "deleted vec must not serve")
    // membership law: exactly the pre-delete neighbors minus the
    // deleted id (ranks re-densify, so compare (query, neighbor) pairs)
    assert(after.map(_.take(2)) === before.filterNot(_(1) == 2L)
      .map(_.take(2)))
    (tabs ++ Seq(codesT, booksT))
      .foreach(graft.sinks.Sinks.dropManaged(spark, _))
  }

  test("WithBooks serving forms: pqTopK / pqDistortion / pqRerankTopK " +
      "under a persisted books table return rows IDENTICAL to inline " +
      "training with the same knobs — the x121/x122/x130 fixture-" +
      "sharing guarantee (train once, serve many, zero retraining)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val codesT = "graft_idx_test.wb_codes"
    val booksT = "graft_idx_test.wb_books"
    Seq(codesT, booksT).foreach(graft.sinks.Sinks.dropManaged(spark, _))
    Similarity.writePqIndex(pqVecs, "vec_id", "embedding",
      codesT, booksT, m = 2, k = 2, rounds = 2)
    val q = pqVecs.filter("vec_id = 0")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Similarity.pqTopKWithBooks(spark, q, pqVecs, "vec_id",
        "embedding", booksT, topK = 5)) ===
      rows(Similarity.pqTopK(q, pqVecs, "vec_id", "embedding",
        topK = 5, m = 2, k = 2, rounds = 2)))
    assert(rows(Similarity.pqDistortionWithBooks(spark, pqVecs, "vec_id",
        "embedding", booksT)) ===
      rows(Similarity.pqDistortion(pqVecs, "vec_id", "embedding",
        m = 2, k = 2, rounds = 2)))
    assert(rows(Similarity.pqRerankTopKWithBooks(spark, q, pqVecs,
        "vec_id", "embedding", booksT, topK = 3, shortlist = 5)) ===
      rows(Similarity.pqRerankTopK(q, pqVecs, "vec_id", "embedding",
        topK = 3, shortlist = 5, m = 2, k = 2, rounds = 2)))
    spark.catalog.clearCache() // the inline forms' open CACHE CONTRACT
    Seq(codesT, booksT).foreach(graft.sinks.Sinks.dropManaged(spark, _))
  }

  test("ivfPqTopKWithBooks: frozen-book IVF-PQ serves ivfPqTopK's rows " +
      "IDENTICALLY with the same knobs — x123's train-once guarantee " +
      "(the composed-layout side of the WithBooks convention)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val codesT = "graft_idx_test.wbi_codes"
    val booksT = "graft_idx_test.wbi_books"
    val centT = "graft_idx_test.wbi_cent"
    Seq(codesT, booksT, centT)
      .foreach(graft.sinks.Sinks.dropManaged(spark, _))
    val cents = pqVecs.filter("vec_id < 2")
    Similarity.writeIvfPqIndex(pqVecs, cents, "vec_id", "embedding",
      codesT, booksT, centT, m = 2, k = 2, rounds = 2)
    val q = pqVecs.filter("vec_id = 0")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Similarity.ivfPqTopKWithBooks(spark, q, pqVecs, cents,
        "vec_id", "embedding", booksT, topK = 5, nprobe = 2)) ===
      rows(Similarity.ivfPqTopK(q, pqVecs, cents, "vec_id", "embedding",
        topK = 5, nprobe = 2, m = 2, k = 2, rounds = 2)))
    spark.catalog.clearCache()
    Seq(codesT, booksT, centT)
      .foreach(graft.sinks.Sinks.dropManaged(spark, _))
  }

  test("ivfPqTopK (x123): nprobe=1 restricts candidates to the probed " +
      "bucket; ADC distances agree with pqTopK on shared candidates") {
    val cents = pqVecs.filter("vec_id < 2") // one centroid per group
    val narrow = Similarity.ivfPqTopK(pqVecs.filter("vec_id = 0"), pqVecs,
        cents, "vec_id", "embedding", topK = 5, nprobe = 1,
        m = 2, k = 2, rounds = 2)
      .collect()
    // query 0 probes only group A's bucket: candidates {2, 4}, no self
    assert(narrow.map(_.getAs[Long]("neighbor_id")).toSet == Set(2L, 4L))
    assert(narrow.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L))
    // with both buckets probed, the result is pqTopK's full-corpus ADC
    val wide = Similarity.ivfPqTopK(pqVecs.filter("vec_id = 0"), pqVecs,
        cents, "vec_id", "embedding", topK = 5, nprobe = 2,
        m = 2, k = 2, rounds = 2)
      .collect().map(r => r.getAs[Long]("neighbor_id") ->
        r.getAs[Double]("adc_dist")).toMap
    val flat = Similarity.pqTopK(pqVecs.filter("vec_id = 0"), pqVecs,
        "vec_id", "embedding", topK = 5, m = 2, k = 2, rounds = 2)
      .collect().map(r => r.getAs[Long]("neighbor_id") ->
        r.getAs[Double]("adc_dist")).toMap
    assert(wide === flat)
  }

  test("pqTopKIndexed (x124): serves pqTopK's rows from the persisted " +
      "index with no training; appendPqIndex encodes with frozen books") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    Seq("graft_idx_test.pq_codes", "graft_idx_test.pq_books").foreach {
      name =>
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val Array(db, t) = name.split('.')
        val loc = java.nio.file.Paths.get("spark-warehouse", s"$db.db", t)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
    }
    val queries = pqVecs.filter("vec_id = 0")
    Similarity.writePqIndex(pqVecs, "vec_id", "embedding",
      "graft_idx_test.pq_codes", "graft_idx_test.pq_books",
      m = 2, k = 2, rounds = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("adc_dist"))).toSet
    val direct = rows(Similarity.pqTopK(queries, pqVecs, "vec_id",
      "embedding", topK = 5, m = 2, k = 2, rounds = 2))
    val indexed = Similarity.pqTopKIndexed(spark, queries, "vec_id",
      "embedding", "graft_idx_test.pq_codes", "graft_idx_test.pq_books",
      topK = 5)
    assert(rows(indexed) == direct && direct.nonEmpty)
    // the corpus side reads ONLY the codes table — no embedding scan,
    // no grid kernel on the corpus at query time
    val p = indexed.queryExecution.optimizedPlan.toString
    assert(p.contains("pq_codes"), s"codes table not scanned:\n$p")
    // append a batch member of group B encoded with the FROZEN books:
    // it must surface in the served rows with B's existing code pair
    val batch = Seq(
      (9L, Array(0.0f, 0.1f, 0.0f, 0.1f, 1.0f, 1.0f, 0.9f, 1.0f)))
      .toDF("vec_id", "embedding")
    Similarity.appendPqIndex(batch, "vec_id", "embedding",
      "graft_idx_test.pq_codes", "graft_idx_test.pq_books")
    val after = spark.table("graft_idx_test.pq_codes")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("code_0"), r.getAs[Long]("code_1")))).toMap
    assert(after.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 9L))
    assert(after(9L) === after(1L)) // frozen-book encode lands in B
    val served = rows(Similarity.pqTopKIndexed(spark, queries, "vec_id",
      "embedding", "graft_idx_test.pq_codes", "graft_idx_test.pq_books",
      topK = 6))
    assert(served.map(_._2).contains(9L))
  }

  /** Drop a managed test table AND its warehouse location (the
    * in-memory-catalog stale-LOCATION gotcha, as the x124 test). */
  private def dropManaged(names: String*): Unit = names.foreach { name =>
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val Array(db, t) = name.split('.')
    val loc = java.nio.file.Paths.get("spark-warehouse", s"$db.db", t)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("ivfPqTopKIndexed (x127): serves ivfPqTopK's rows at every nprobe " +
      "from the persisted composed index; appendIvfPqIndex assigns and " +
      "encodes a batch under the frozen coarse + PQ codebooks") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (codesT, booksT, centT) = ("graft_idx_test.ivfpq_codes",
      "graft_idx_test.ivfpq_books", "graft_idx_test.ivfpq_cent")
    dropManaged(codesT, booksT, centT)
    val cents = pqVecs.filter("vec_id < 2") // one centroid per group
    val queries = pqVecs.filter("vec_id = 0")
    Similarity.writeIvfPqIndex(pqVecs, cents, "vec_id", "embedding",
      codesT, booksT, centT, m = 2, k = 2, rounds = 2, numBuckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("adc_dist"))).toSet
    for (np <- Seq(1, 2)) {
      val direct = rows(Similarity.ivfPqTopK(queries, pqVecs, cents,
        "vec_id", "embedding", topK = 5, nprobe = np,
        m = 2, k = 2, rounds = 2))
      val indexed = Similarity.ivfPqTopKIndexed(spark, queries, "vec_id",
        "embedding", codesT, booksT, centT, topK = 5, nprobe = np)
      assert(rows(indexed) == direct && direct.nonEmpty,
        s"nprobe=$np mismatch")
      // the corpus side is the codes table alone — no embedding scan,
      // no training, no nearest-centroid kernel over the corpus
      val p = indexed.queryExecution.optimizedPlan.toString
      assert(p.contains("ivfpq_codes"), s"codes table not scanned:\n$p")
    }
    // frozen-book append: a new group-B member must land in B's coarse
    // bucket carrying B's exact code pair
    val batch = Seq(
      (9L, Array(0.0f, 0.1f, 0.0f, 0.1f, 1.0f, 1.0f, 0.9f, 1.0f)))
      .toDF("vec_id", "embedding")
    Similarity.appendIvfPqIndex(batch, "vec_id", "embedding",
      codesT, booksT, centT, numBuckets = 4)
    val after = spark.table(codesT).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("centroid_id"),
          r.getAs[Long]("code_0"), r.getAs[Long]("code_1")))).toMap
    assert(after.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 9L))
    assert(after(9L) === after(1L)) // B's bucket, B's codes
    val served = rows(Similarity.ivfPqTopKIndexed(spark,
      pqVecs.filter("vec_id = 1"), "vec_id", "embedding",
      codesT, booksT, centT, topK = 6, nprobe = 1))
    assert(served.map(_._2).contains(9L))
  }

  test("pqRerankTopK (x130): a full-corpus short-list reproduces exact " +
      "brute force bit for bit; shortlist < topK is rejected") {
    val q = pqVecs.filter("vec_id < 2")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("similarity"))).toSet
    // shortlist = every non-self candidate: stage 2 re-ranks the whole
    // corpus with bruteForceTopK's metric, rounding and tie-law, so the
    // result must be EXACTLY the brute-force rows — the recall ceiling
    // the short-list trades against
    val exact = rows(Similarity.bruteForceTopK(q, pqVecs,
      "vec_id", "embedding", k = 3))
    val rr = rows(Similarity.pqRerankTopK(q, pqVecs, "vec_id", "embedding",
      topK = 3, shortlist = 5, m = 2, k = 2, rounds = 2))
    assert(rr == exact && exact.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqRerankTopK(q, pqVecs, "vec_id", "embedding",
        topK = 3, shortlist = 2, m = 2, k = 2, rounds = 2)
    }
    assert(e.getMessage.contains("shortlist"))
  }

  test("pqRerankTopKIndexed (x134): serves pqRerankTopK's rows from the " +
      "persisted index — the two-stage path with zero training") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (codesT, booksT) = ("graft_idx_test.rr_pq_codes",
      "graft_idx_test.rr_pq_books")
    dropManaged(codesT, booksT)
    Similarity.writePqIndex(pqVecs, "vec_id", "embedding",
      codesT, booksT, m = 2, k = 2, rounds = 2)
    val q = pqVecs.filter("vec_id < 2")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("similarity"))).toSet
    val direct = rows(Similarity.pqRerankTopK(q, pqVecs, "vec_id",
      "embedding", topK = 3, shortlist = 5, m = 2, k = 2, rounds = 2))
    val indexed = Similarity.pqRerankTopKIndexed(spark, q, pqVecs,
      "vec_id", "embedding", codesT, booksT, topK = 3, shortlist = 5)
    assert(rows(indexed) == direct && direct.nonEmpty)
    val p = indexed.queryExecution.optimizedPlan.toString
    assert(p.contains("rr_pq_codes"), s"codes table not scanned:\n$p")
  }

  test("recallReport (x128): a perfect approximation reads 1.0, top-1 " +
      "against exact top-2 reads 0.5; counts are audit-exact") {
    val q = pqVecs.filter("vec_id < 2")
    val ex2 = Similarity.bruteForceTopK(q, pqVecs, "vec_id", "embedding", 2)
    val ex1 = Similarity.bruteForceTopK(q, pqVecs, "vec_id", "embedding", 1)
    val rep = Similarity.recallReport(Seq(
        ("self", ex2, ex2, 2), ("half", ex2, ex1, 2)))
      .collect().map(r => r.getAs[String]("method") ->
        ((r.getAs[Int]("k"), r.getAs[Long]("n_queries"),
          r.getAs[Long]("n_exact"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("recall")))).toMap
    assert(rep("self") === ((2, 2L, 4L, 4L, 1.0)))
    // top-1 is a prefix of top-2 (same ordering), so exactly one of
    // each query's two exact rows is recovered
    assert(rep("half") === ((2, 2L, 4L, 2L, 0.5)))
  }

  test("diversifiedTopKIndexed (x142): a one-cell pile-up is capped at " +
      "perCluster; an unbinding cap returns ivfTopKIndexed's ranking " +
      "with the cell exposed") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    Seq("graft_idx_test.div_assign", "graft_idx_test.div_cent").foreach {
      name =>
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val Array(db, t) = name.split('.')
        val loc = java.nio.file.Paths.get("spark-warehouse", s"$db.db", t)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
    }
    // cell 0 is a 4-deep pile of near-identical vectors around the
    // query; cell 5 holds three farther ones — the serving failure the
    // cap exists for: uncapped, the pile fills the whole page
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.98f, 0.02f)), (3L, Array(0.97f, 0.03f)),
      (4L, Array(0.96f, 0.04f)),
      (5L, Array(0.0f, 1.0f)), (6L, Array(0.1f, 0.9f)),
      (7L, Array(0.2f, 0.8f))).toDF("vec_id", "embedding")
    val cents = corpus.filter("vec_id IN (0, 5)")
    val q = corpus.filter("vec_id = 1")
    Similarity.writeAnnIndex(corpus, cents, "vec_id", "embedding",
      "graft_idx_test.div_assign", "graft_idx_test.div_cent",
      numBuckets = 2)
    val div = Similarity.diversifiedTopKIndexed(q, "vec_id", "embedding",
        k = 5, nprobe = 2, perCluster = 3,
        "graft_idx_test.div_assign", "graft_idx_test.div_cent")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(div.length == 5)
    // the pile yields exactly perCluster results (and, being closer,
    // the top ranks); the remaining page slots fall to cell 5
    assert(div.filter(_._2 == 0L).map(_._3).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(div.filter(_._2 == 5L).map(_._3).sorted.toSeq === Seq(4L, 5L))
    // an unbinding cap degenerates to the plain indexed ranking
    val uncapped = Similarity.diversifiedTopKIndexed(q, "vec_id",
        "embedding", k = 5, nprobe = 2, perCluster = 100,
        "graft_idx_test.div_assign", "graft_idx_test.div_cent")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getDouble(4))).toSet
    val plain = Similarity.ivfTopKIndexed(q, "vec_id", "embedding",
        k = 5, nprobe = 2,
        "graft_idx_test.div_assign", "graft_idx_test.div_cent")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(uncapped === plain)
  }

  test("mmrTopKIndexed (x145): lambda=1 degenerates to the plain " +
      "ranking; a redundancy-penalizing lambda breaks out of the " +
      "pile after pick 1") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    Seq("graft_idx_test.mmr_assign", "graft_idx_test.mmr_cent").foreach {
      name =>
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val Array(db, t) = name.split('.')
        val loc = java.nio.file.Paths.get("spark-warehouse", s"$db.db", t)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
    }
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.98f, 0.02f)), (3L, Array(0.97f, 0.03f)),
      (4L, Array(0.96f, 0.04f)),
      (5L, Array(0.0f, 1.0f)), (6L, Array(0.1f, 0.9f)),
      (7L, Array(0.2f, 0.8f))).toDF("vec_id", "embedding")
    val cents = corpus.filter("vec_id IN (0, 5)")
    val q = corpus.filter("vec_id = 1")
    Similarity.writeAnnIndex(corpus, cents, "vec_id", "embedding",
      "graft_idx_test.mmr_assign", "graft_idx_test.mmr_cent",
      numBuckets = 2)
    def run(lambda: Double) =
      Similarity.mmrTopKIndexed(q, "vec_id", "embedding",
          k = 3, candK = 7, nprobe = 2, lambda,
          "graft_idx_test.mmr_assign", "graft_idx_test.mmr_cent")
        .orderBy(org.apache.spark.sql.functions.col("pick"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    // lambda = 1: no penalty — picks are the plain top-3 in rank order
    val plain = Similarity.ivfTopKIndexed(q, "vec_id", "embedding",
        k = 3, nprobe = 2,
        "graft_idx_test.mmr_assign", "graft_idx_test.mmr_cent")
      .orderBy(org.apache.spark.sql.functions.col("rank")).collect().map(_.getLong(1)).toSeq
    assert(run(1.0).map(_._1).toSeq === plain)
    // pick 1 is ALWAYS the top-relevance doc; with lambda = 0.3 the
    // near-identical pile (sim ~0.9999 to pick 1) is out-penalized by
    // the orthogonal cell for pick 2 — and pick 3 returns to the pile,
    // because the remaining cell-5 members are now redundant with
    // pick 2 (penalty chases whatever is already selected, not cells)
    val diverse = run(0.3)
    assert(diverse.map(_._2).toSeq === Seq(1L, 2L, 3L))
    assert(diverse(0)._1 === plain.head)
    assert(Set(5L, 6L, 7L).contains(diverse(1)._1),
      s"pick 2 should leave the pile: ${diverse.toSeq}")
    assert(Set(0L, 2L, 3L, 4L).contains(diverse(2)._1),
      s"pick 3 should return to the pile: ${diverse.toSeq}")
  }

  test("rankingReport (x141): a perfect leg reads 1.0/1.0; a rank-1 " +
      "miss halves MRR and log-discounts nDCG; missed queries count " +
      "as zeros in the macro mean") {
    val ex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L),
      (2L, 21L, 2L)).toDF("query_id", "neighbor_id", "rank")
    // query 1's leg puts an irrelevant doc at rank 1 and recovers only
    // neighbor 10 at rank 2; query 2 is entirely absent from the leg
    val partial = Seq((1L, 99L, 1L), (1L, 10L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val rep = Similarity.rankingReport(Seq(
        ("self", ex, ex, 2), ("partial", ex, partial, 2)))
      .collect().map(r => r.getAs[String]("method") ->
        ((r.getAs[Int]("k"), r.getAs[Long]("n_queries"),
          r.getAs[Double]("mrr"), r.getAs[Double]("ndcg")))).toMap
    assert(rep("self") === ((2, 2L, 1.0, 1.0)))
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    def r6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000
    val d1 = r4(math.log(2.0) / math.log(2.0))
    val d2 = r4(math.log(2.0) / math.log(3.0))
    // query 1: first hit at rank 2 → rr 1/2; dcg = disc(2) against
    // idcg = disc(1)+disc(2); query 2 contributes zeros; macro over 2
    val ndcg1 = r6(d2 / (d1 + d2))
    assert(rep("partial") === ((2, 2L, r6(r6(0.5) / 2.0), r6(ndcg1 / 2.0))))
  }

  test("pqFit trainPct (x129): sampled training is deterministic, still " +
      "reports over the whole corpus, and costs bounded fit on the " +
      "fixture embeddings") {
    // tiny frame: md5 cut < 50 keeps ids {2,3,4} — one seed per group
    // survives, so the books still separate A/B and the report covers
    // all 6 vectors
    def half() = Similarity.pqDistortion(pqVecs, "vec_id", "embedding",
        m = 2, k = 2, rounds = 2, trainPct = 50)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val h = half()
    assert(h.keySet == Set(0, 1) && h.values.forall(_._1 == 6L))
    assert(half() === h) // no RNG anywhere
    // fixture corpus: training on half the vectors must estimate the
    // codebook nearly as well as training on all of them — the stated
    // acceptance bound for the sample-train path (x129 vs x122)
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    def avg(trainPct: Int) =
      Similarity.pqDistortion(emb, "vec_id", "embedding",
          m = 4, k = 8, rounds = 2, trainPct = trainPct)
        .agg(org.apache.spark.sql.functions.avg("avg_dist")).head().getDouble(0)
    val full = avg(100); val sampled = avg(50)
    assert(sampled <= full * 1.25,
      f"sampled-train distortion $sampled%.4f vs full $full%.4f — " +
        "sample cost exceeds the 1.25x acceptance bound")
  }

  test("truncatedTopK (x132): full-width truncation IS brute force; " +
      "prefix ranking follows the prefix signal; recallReport sizes " +
      "dims on the fixture") {
    import spark.implicits._
    // prefix (first 2 dims) and tail disagree on purpose: vs query 0,
    // neighbor 1 wins on the prefix, neighbor 2 wins on the full vector
    val vs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 1.0f, 1.0f)),
      (2L, Array(0.6f, 0.6f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vs.filter("vec_id = 0")
    def top1(df: org.apache.spark.sql.DataFrame) =
      df.filter("rank = 1").head().getAs[Long]("neighbor_id")
    assert(top1(Similarity.truncatedTopK(q, vs, "vec_id", "embedding",
      k = 2, dims = 2)) == 1L)
    assert(top1(Similarity.bruteForceTopK(q, vs, "vec_id", "embedding",
      k = 2)) == 2L)
    // dims = full width: bit-for-bit brute force
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("similarity"))).toSet
    assert(rows(Similarity.truncatedTopK(q, vs, "vec_id", "embedding",
        k = 2, dims = 4)) ==
      rows(Similarity.bruteForceTopK(q, vs, "vec_id", "embedding", k = 2)))
    // the dims-sizing loop on the real fixture: recall of the 16-dim
    // prefix tier vs full-dim exact — the number a deployment reads
    // before picking the truncation point
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val fq = emb.filter("vec_id < 10")
    val ex = Similarity.bruteForceTopK(fq, emb, "vec_id", "embedding", 5)
    val tr = Similarity.truncatedTopK(fq, emb, "vec_id", "embedding", 5, 16)
    val recall = Similarity.recallReport(Seq(("trunc16", ex, tr, 5)))
      .head().getAs[Double]("recall")
    assert(recall > 0.0 && recall <= 1.0)
    info(f"fixture recall@5 of 16/64-dim prefix: $recall%.2f")
  }

  test("compactPqIndex / compactIvfPqIndex: replay-duplicate rows break " +
      "served rankings; compaction restores them exactly") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_idx_test")
    val (codesT, booksT) = ("graft_idx_test.cpq_codes",
      "graft_idx_test.cpq_books")
    val (icodesT, ibooksT, icentT) = ("graft_idx_test.civfpq_codes",
      "graft_idx_test.civfpq_books", "graft_idx_test.civfpq_cent")
    dropManaged(codesT, booksT, icodesT, ibooksT, icentT)
    val queries = pqVecs.filter("vec_id = 0")
    Similarity.writePqIndex(pqVecs, "vec_id", "embedding",
      codesT, booksT, m = 2, k = 2, rounds = 2)
    def served() = Similarity.pqTopKIndexed(spark, queries, "vec_id",
        "embedding", codesT, booksT, topK = 5)
      .collect().map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"))).toSet
    val clean = served()
    // an at-least-once replay: the same batch appended twice
    val batch = Seq(
      (9L, Array(0.0f, 0.1f, 0.0f, 0.1f, 1.0f, 1.0f, 0.9f, 1.0f)))
      .toDF("vec_id", "embedding")
    Similarity.appendPqIndex(batch, "vec_id", "embedding", codesT, booksT)
    Similarity.appendPqIndex(batch, "vec_id", "embedding", codesT, booksT)
    spark.catalog.refreshTable(codesT)
    // the duplicate code row surfaces the SAME neighbor at two ranks
    // (both 9-rows tie on ADC and id; row_number hands them rank 6 and
    // 7) — replay damage the append docs warn about
    val dup = Similarity.pqTopKIndexed(spark, queries, "vec_id",
        "embedding", codesT, booksT, topK = 7)
      .collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(dup.count(_ == 9L) == 2)
    Similarity.compactPqIndex(spark, codesT)
    spark.catalog.refreshTable(codesT)
    val after = Similarity.pqTopKIndexed(spark, queries, "vec_id",
        "embedding", codesT, booksT, topK = 7)
      .collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(after.count(_ == 9L) == 1 && after.size == 6)
    assert(spark.table(codesT).count() == 7) // 6 corpus + 1 appended
    // clean top-5 ranking is restored exactly: 9 shares B's codes, so
    // it ties every B member on ADC and loses the id tie-break — the
    // original five neighbors keep their ranks
    assert(Similarity.pqTopKIndexed(spark, queries, "vec_id", "embedding",
        codesT, booksT, topK = 5)
      .collect().map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"))).toSet == clean)
    // composed-index compaction: same law on the bucketed table
    Similarity.writeIvfPqIndex(pqVecs, pqVecs.filter("vec_id < 2"),
      "vec_id", "embedding", icodesT, ibooksT, icentT,
      m = 2, k = 2, rounds = 2, numBuckets = 4)
    Similarity.appendIvfPqIndex(batch, "vec_id", "embedding",
      icodesT, ibooksT, icentT, numBuckets = 4)
    Similarity.appendIvfPqIndex(batch, "vec_id", "embedding",
      icodesT, ibooksT, icentT, numBuckets = 4)
    spark.catalog.refreshTable(icodesT)
    assert(spark.table(icodesT).filter("vec_id = 9").count() == 2)
    Similarity.compactIvfPqIndex(spark, icodesT, numBuckets = 4)
    spark.catalog.refreshTable(icodesT)
    assert(spark.table(icodesT).filter("vec_id = 9").count() == 1)
    assert(spark.table(icodesT).count() == 7)
    // the rewrite preserved the bucketed layout: serving still prunes
    val p = Similarity.ivfPqTopKIndexed(spark, queries, "vec_id",
      "embedding", icodesT, ibooksT, icentT, topK = 5, nprobe = 1)
    assert(p.queryExecution.executedPlan.toString
      .contains("SelectedBucketsCount"))
    assert(p.collect().nonEmpty)
  }

  test("pqDistortion (x122): exact zero when every vector coincides " +
      "with its codeword; positive per-subspace error otherwise") {
    // two distinct vectors, each duplicated: centroids converge to the
    // exact members, so the quantization error is exactly 0
    val dup = Seq(
      (0L, Array(1f, 2f, 3f, 4f)), (1L, Array(5f, 6f, 7f, 8f)),
      (2L, Array(1f, 2f, 3f, 4f)), (3L, Array(5f, 6f, 7f, 8f))
    ).toDF("vec_id", "embedding")
    val z = Similarity.pqDistortion(dup, "vec_id", "embedding",
        m = 2, k = 2, rounds = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(z === Map(0 -> ((4L, 0.0, 0.0)), 1 -> ((4L, 0.0, 0.0))))
    // the jittered groups quantize with real, bounded error
    val out = Similarity.pqDistortion(pqVecs, "vec_id", "embedding",
        m = 2, k = 2, rounds = 2).collect()
    assert(out.map(_.getInt(0)).toSet == Set(0, 1))
    assert(out.forall(r => r.getLong(1) == 6L &&
      r.getDouble(2) > 0.0 && r.getDouble(2) <= r.getDouble(3)))
  }

  test("withPqModel: codes/topK match the open-contract forms, ONE " +
      "training pays for both, and NO cached RDD survives the bracket " +
      "— even on a throwing body") {
    spark.catalog.clearCache()
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val openCodes = Similarity.pqEncode(pqVecs, "vec_id", "embedding",
      m = 2, k = 2, rounds = 2).collect().map(_.toSeq).toSet
    val openTopK = Similarity.pqTopK(pqVecs.filter("vec_id = 0"), pqVecs,
        "vec_id", "embedding", topK = 5, m = 2, k = 2, rounds = 2)
      .collect().map(_.toSeq).toSet
    spark.catalog.clearCache() // release the open contracts' caches
    val (bCodes, bTopK) = Similarity.withPqModel(pqVecs, "vec_id",
        "embedding", m = 2, k = 2, rounds = 2) { mdl =>
      (mdl.codes.collect().map(_.toSeq).toSet,
        mdl.topK(pqVecs.filter("vec_id = 0"), "vec_id", "embedding", 5)
          .collect().map(_.toSeq).toSet)
    }
    assert(bCodes === openCodes)
    assert(bTopK === openTopK)
    assert(spark.sparkContext.getPersistentRDDs.size === cachedBefore,
      "bracket leaked a cached RDD")
    intercept[RuntimeException] {
      Similarity.withPqModel(pqVecs, "vec_id", "embedding",
        m = 2, k = 2, rounds = 2) { _ => sys.error("boom") }
    }
    assert(spark.sparkContext.getPersistentRDDs.size === cachedBefore,
      "bracket leaked a cached RDD on a throwing body")
  }

  test("semanticDecontam (x231): per corpus vector the strongest " +
      "benchmark witness (ties -> smallest bench id), raw-cosine " +
      "threshold verdicts, degenerate vectors kept with null witness") {
    val bench = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)), // duplicate of 0: tie -> id 0 wins
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2.0f, 0.0f, 0.0f)),  // cos 1.0 vs bench 0 AND 1
      (11L, Array(0.0f, 3.0f, 0.0f)),  // cos 1.0 vs bench 2
      (12L, Array(1.0f, 1.0f, 0.0f)),  // cos ~0.707 vs 0/1/2 — tie -> 0
      (13L, Array(-1.0f, 0.0f, 0.0f)), // best is bench 2 at cos 0.0
      (14L, Array(0.0f, 0.0f, 0.0f))   // zero vector: no valid cosine
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontam(corpus, bench, "vec_id",
        "embedding", threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(10L) === (("dropped", Some(0L), Some(1.0))))
    assert(out(11L) === (("dropped", Some(2L), Some(1.0))))
    assert(out(12L)._1 === "dropped" && out(12L)._2 === Some(0L))
    assert(out(12L)._3.get === (math.sqrt(0.5) * 1e6).round / 1e6)
    assert(out(13L) === (("kept", Some(2L), Some(0.0))))
    assert(out(14L) === (("kept", None, None)))
    intercept[IllegalArgumentException] {
      Similarity.semanticDecontam(corpus, bench.limit(0), "vec_id",
        "embedding", 0.5)
    }
  }

  test("semDedup (x219): drops exactly the vectors with a smaller-id " +
      "same-cluster witness at/above threshold; witness is the " +
      "strongest; clusters confine the decision; deterministic") {
    // two tight bundles around +x and +y, plus an outlier near -x:
    // within-bundle cosines ~1, cross-bundle ~0 — the cluster split
    // separates the bundles, and dedup fires only inside each.
    val sd = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.01f, 0.0f)),   // dup of 0
      (2L, Array(0.98f, -0.02f, 0.0f)),  // dup of 0 (and of 1)
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.01f, 0.99f, 0.0f)),   // dup of 3
      (5L, Array(-1.0f, 0.2f, 0.0f))     // alone in its neighborhood
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(sd, sd.filter("vec_id IN (0, 3)"),
      "vec_id", "embedding", rounds = 2, threshold = 0.9)
      .orderBy("vec_id").collect()
    assert(out.length === 6)
    val status = out.map(r => r.getAs[Long]("vec_id") ->
      r.getAs[String]("status")).toMap
    assert(status(0L) === "kept" && status(3L) === "kept")
    assert(status(1L) === "dropped" && status(2L) === "dropped" &&
      status(4L) === "dropped")
    assert(status(5L) === "kept") // no neighbor at 0.9 in its cluster
    // witnesses: smaller id, same cluster, similarity >= threshold
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    val clusters = out.map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Long]("cluster_id")).toMap
    out.filter(_.getAs[String]("status") == "dropped").foreach { r =>
      val id = r.getAs[Long]("vec_id"); val w = r.getAs[Long]("dup_of")
      assert(w < id)
      assert(clusters(w) === clusters(id))
      assert(r.getAs[Double]("similarity") >= 0.9)
    }
    assert(byId(1L).getAs[Long]("dup_of") === 0L)
    assert(byId(4L).getAs[Long]("dup_of") === 3L)
    // kept rows carry nulls
    assert(out.filter(_.getAs[String]("status") == "kept")
      .forall(r => r.isNullAt(r.fieldIndex("dup_of")) &&
        r.isNullAt(r.fieldIndex("similarity"))))
    // deterministic end to end
    val again = Similarity.semDedup(sd, sd.filter("vec_id IN (0, 3)"),
      "vec_id", "embedding", rounds = 2, threshold = 0.9)
      .orderBy("vec_id").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
