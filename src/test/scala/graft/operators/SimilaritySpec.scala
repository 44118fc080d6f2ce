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
}
