package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ClusteringSketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmeansFit separates well-separated clusters and assign buckets them") {
    // three tight clusters around (10,0), (0,10), (-10,-10)
    val pts = (0 until 30).map { i =>
      val (cx, cy) = (i % 3) match {
        case 0 => (10f, 0f); case 1 => (0f, 10f); case _ => (-10f, -10f)
      }
      (i.toLong, Array(cx + (i % 5) * 0.1f, cy + (i % 7) * 0.1f))
    }
    val df = pts.toDF("vec_id", "embedding")
    val model = Clustering.kmeansFit(df, "vec_id", "embedding", k = 3, iters = 5)
    assert(model.centroids.length == 3)
    val assigned = model.assign(df, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every ground-truth cluster lands in exactly one fitted bucket
    val buckets = (0 until 3).map(g =>
      pts.collect { case (id, _) if id % 3 == g => assigned(id) }.toSet)
    assert(buckets.forall(_.size == 1), s"clusters split: $buckets")
    assert(buckets.flatten.toSet.size == 3, s"clusters merged: $buckets")
  }

  test("kmeans model feeds the IVF operators (fitted centroids, real data)") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val model = Clustering.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 3)
    val counts = model.assign(emb, "vec_id", "embedding")
      .groupBy("centroid_id").count().collect()
    assert(counts.map(_.getLong(1)).sum == emb.count())
    assert(counts.length >= 2) // real embeddings spread across buckets
  }

  test("IVF operators with an empty centroid table return empty, not crash") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val none = emb.filter(col("vec_id") < 0) // empty centroid table
    assert(Similarity.ivfCosinePairs(emb, none, "vec_id", "embedding", 0.4)
      .isEmpty)
    assert(Similarity.ivfTopK(emb.limit(3), emb, none, "vec_id", "embedding",
      k = 3, nprobe = 2).isEmpty)
    // kmeans on an empty corpus -> empty model -> empty assignment
    val model = Clustering.kmeansFit(none, "vec_id", "embedding", 3, 2)
    assert(model.ids.isEmpty)
    assert(model.assign(emb, "vec_id", "embedding").isEmpty)
  }

  test("IVF id columns: Int widens to Long; non-integral fails clearly") {
    import spark.implicits._
    val intIds = Seq((1, Array(1f, 0f)), (2, Array(0f, 1f)),
      (7, Array(0.9f, 0.1f))).toDF("vid", "embedding")
    val pairs = Similarity.ivfCosinePairs(intIds,
      intIds.filter(col("vid") < 3), "vid", "embedding", 0.0)
    assert(pairs.count() >= 1) // (1,7) share the first bucket
    val strIds = Seq(("a", Array(1f, 0f))).toDF("vid", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfCosinePairs(strIds, strIds, "vid", "embedding", 0.0)
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("approxDistinctByGroup is within HLL error of exact") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val approx = Sketches.approxDistinctByGroup(e, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.15,
        s"$k: approx $ap vs exact $ex")
    }
  }

  test("approxPercentilesByGroup brackets the exact percentiles") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val approx = Sketches.approxPercentilesByGroup(
        e, "event_type", "value", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = e.groupBy("event_type")
      .agg(expr("percentile(value, array(0.5, 0.9))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, ex) =>
      approx(k).zip(ex).foreach { case (ap, exv) =>
        assert(math.abs(ap - exv) / (math.abs(exv) + 1e-9) < 0.1,
          s"$k: approx $ap vs exact $exv")
      }
    }
  }

  test("kmvDistinct (x166): unsaturated groups report their exact " +
      "count; saturated groups estimate within the k=16 error regime " +
      "and kth_min is the true 16th-smallest hash") {
    val rows = (0 until 200).map(i => ("big", s"v$i")) ++
      (0 until 3).map(i => ("small", s"w$i"))
    val df = rows.toDF("grp", "value")
    val out = Sketches.kmvDistinct(df, "grp", "value", k = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    val small = out("small")
    assert(small.getLong(1) === 3L)       // n_exact
    assert(small.getDouble(3) === 3.0)    // unsaturated → exact
    assert(small.getDouble(4) === 0.0)    // rel_err
    val big = out("big")
    assert(big.getLong(1) === 200L)
    // independent 16th-smallest hash on the same md5 grid
    val kth = df.filter(col("grp") === "big")
      .select(conv(substring(md5(col("value")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .orderBy(col("h")).limit(16).collect().map(_.getLong(0)).max
    assert(big.getLong(2) === kth)
    // k=16 KMV rsd ≈ 1/√(k−2) ≈ 27% — a 3σ bound that still fails on
    // an implementation error (off-by-one k, wrong hash width)
    assert(big.getDouble(4) < 0.81,
      s"rel_err ${big.getDouble(4)} out of the k=16 error regime")
  }

  test("cmsHeavyHitters (x182): estimates never fall below the true " +
      "count, are exact when the sketch is collision-free, and " +
      "collapse to pure collision mass at width 1") {
    import spark.implicits._
    val df = (Seq.fill(50)(7L) ++ Seq.fill(30)(1L) ++ Seq.fill(20)(2L))
      .toDF("k")
    // wide sketch: 3 keys in 3x1024 cells — collision-free, so the
    // estimate IS the count
    val wide = Sketches.cmsHeavyHitters(df, "k", depth = 3,
      width = 1024, topK = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(wide === Map(7L -> ((50L, 50L)), 1L -> ((30L, 30L)),
      2L -> ((20L, 20L))))
    // degenerate width 1: every key lands in the same cell — the
    // estimate is the full corpus mass, the documented upper bound
    val narrow = Sketches.cmsHeavyHitters(df, "k", depth = 2,
      width = 1, topK = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(narrow === Map(7L -> 100L, 1L -> 100L, 2L -> 100L))
    // overestimate-only, at any width
    Seq(2, 7, 64).foreach { w =>
      Sketches.cmsHeavyHitters(df, "k", depth = 3, width = w, topK = 3)
        .collect().foreach { r =>
          assert(r.getLong(3) >= r.getLong(1),
            s"width $w underestimated key ${r.getLong(0)}")
        }
    }
  }

  test("exact-percentile group-size gate trips, pointing at the sketch path") {
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val err = intercept[IllegalArgumentException] {
      graft.functions.Guards.requireSmallGroups(e, "event_type", 10L,
        "x24_percentiles (exact sort-based percentile)",
        "Sketches.approxPercentilesByGroup")
    }
    assert(err.getMessage.contains("approxPercentilesByGroup"))
    // generous bound passes silently (the registered x24 path at test SFs)
    graft.functions.Guards.requireSmallGroups(e, "event_type", 10000000L,
      "x24", "Sketches.approxPercentilesByGroup")
  }

  test("histogramQuantiles (x203): uniform 1..320 over 32 buckets — " +
      "exact bucket midpoints, exact rel_err against the true values") {
    val df = (1L to 320L).map(i => (i, "g", i)).toDF("id", "grp", "v")
    val out = Sketches.histogramQuantiles(df, "id", "grp", "v",
        buckets = 32, quantiles = Seq(0.5, 0.9)).collect()
      .map(r => r.getDouble(1) ->
        ((r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    // p50: rank 160 -> bucket 15 (v 151..160), midpoint 1 + 15.5*10
    assert(out(0.5) === ((156.0, 160L, 0.025)))
    // p90: rank 288 -> bucket 28, midpoint 286; err 2/288 grid-6
    assert(out(0.9) === ((286.0, 288L, 0.006944)))
  }

  test("histogramQuantiles: a constant group collapses to one bucket " +
      "and a tiny midpoint offset — no division blowup") {
    val df = (1L to 5L).map(i => (i, "c", 7L)).toDF("id", "grp", "v")
    val out = Sketches.histogramQuantiles(df, "id", "grp", "v",
        buckets = 32, quantiles = Seq(0.5)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getDouble(2) === 7.015625) // 7 + 0.5 * (1/32)
    assert(r.getLong(3) === 7L)
    assert(r.getDouble(4) === 0.002232) // fpRound6(0.015625 / 7)
  }
}
