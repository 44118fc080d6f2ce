package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-duplicate detection — the MULTIMODAL half
  * of the dedup family (text has exact/LSH/containment/winnow/SimHash;
  * embeddings have IVF-cosine; this covers image CONTENT): a 60-bit
  * difference hash (dHash) over decoded grayscale pixels, paired via the
  * same 4-chunk pigeonhole banding as SimHash (x7) for exact
  * hamming <= `maxHamming` retrieval.
  *
  * dHash (the standard perceptual-hash family member, cf. pHash/aHash):
  * nearest-neighbor downsample to a [[GridW]]×[[GridH]] grid, then
  * bit (y·(GridW−1)+x) = 1 iff gray(x+1, y) > gray(x, y) — the sign of
  * the horizontal brightness gradient. Gradient signs survive
  * re-encoding, rescaling and uniform brightness shifts, which byte
  * hashes (x1's sha256) do not — two encodings of the same picture share
  * a fingerprint despite disjoint payload bytes. 60 bits
  * (6 gradients × 10 rows) rather than the classic 64 so the fingerprint
  * is non-negative in a signed 64-bit long and splits into 4 × 15-bit
  * pigeonhole chunks — the same oracle-mirrorable layout as
  * [[TextDedup.simhashMd5Pairs]].
  *
  * 100 TB design: fingerprinting is a partition-local decode pass
  * (`mapPartitions` — media decode is external-library work, SURVEY
  * §7.3's documented tier, same as [[Multimodal.extractFeatures]]); only
  * (doc_id, fp) pairs — 16 bytes per image — ever shuffle, through the
  * banded pigeonhole equi-join. Payload bytes never move past the scan,
  * and the pair stage inherits x7's no-all-pairs property.
  */
object ImageDedup {

  /** Downsample grid: 7 columns × 10 rows ⇒ 6×10 = 60 gradient bits. */
  val GridW = 7
  val GridH = 10

  /** 60-bit dHash of a row-major grayscale image via nearest-neighbor
    * sampling — grid cell (x, y) reads source pixel
    * (⌊x·w/GridW⌋, ⌊y·h/GridH⌋), so any integer upscale of an image
    * (pixel duplication) fingerprints identically to the original. */
  def dHash60(w: Int, h: Int, gray: Array[Int]): Long = {
    require(w >= 1 && h >= 1 && gray.length >= w * h,
      s"bad raster: ${w}x$h with ${gray.length} pixels")
    var fp = 0L
    var y = 0
    while (y < GridH) {
      val row = (y * h / GridH) * w
      var x = 0
      while (x < GridW - 1) {
        val g0 = gray(row + x * w / GridW)
        val g1 = gray(row + (x + 1) * w / GridW)
        if (g1 > g0) fp |= 1L << (y * (GridW - 1) + x)
        x += 1
      }
      y += 1
    }
    fp
  }

  /** Deterministic byte-derived stub grid for payloads no decoder can
    * rasterize (video/audio — no JVM codec): the decodeGray analog of
    * [[Multimodal.StubDecoder]], keeping the operator total so a poison
    * row never fails the task. */
  def stubGray(payload: Array[Byte]): Array[Int] =
    if (payload.isEmpty) new Array[Int](GridW * GridH)
    else Array.tabulate(GridW * GridH)(i => payload(i % payload.length) & 0xff)

  /** Per-image 60-bit fingerprints: (doc_id, fp). One partition-batched
    * decode pass — the raster never leaves the task. */
  def dHashes(spark: SparkSession, media: DataFrame,
              decoder: Multimodal.MediaDecoder = Multimodal.ImageIoDecoder): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h, gray) = decoder.decodeGray(payload)
            .getOrElse((GridW, GridH, stubGray(payload)))
          (id, dHash60(w, h, gray))
        }
      }
      .toDF("doc_id", "fp")
  }

  /** Image near-dup pairs at hamming <= `maxHamming` (exact for <= 3 by
    * the 4-chunk pigeonhole): (doc1, doc2, hamming). */
  def nearDupPairs(spark: SparkSession, media: DataFrame,
                   maxHamming: Int = 3,
                   decoder: Multimodal.MediaDecoder = Multimodal.ImageIoDecoder): DataFrame =
    TextDedup.pigeonholePairs(dHashes(spark, media, decoder),
        chunkBits = 15, maxHamming)
      .withColumn("hamming", col("hamming").cast("long"))

  /** Image dedup APPLIED (x63) — the multimodal twin of the text
    * family's x36/x39 apply forms: dHash pairs, connected components
    * over the pair graph (pointer-jumping — O(log diameter) rounds),
    * keep each cluster's min-id representative plus every singleton.
    * Returns `(doc_id, fp)` — the surviving ids with their content
    * fingerprint (payload bytes are not a cross-engine-comparable
    * artifact; the 60-bit fingerprint is, which is what makes this form
    * oracle-checkable).
    *
    * The fingerprint frame is CACHED (module cache contract): the pair
    * join reads it twice and the survivor anti-join a third time —
    * without the cache the whole decode scan re-runs per consumer. The
    * drop set is near-dup-sized, so the final anti-join broadcasts in
    * practice; every upstream stage is the banded path. */
  def dedupedImages(spark: SparkSession, media: DataFrame,
                    maxHamming: Int = 3,
                    decoder: Multimodal.MediaDecoder = Multimodal.ImageIoDecoder): DataFrame = {
    val fps = dHashes(spark, media, decoder).cache()
    val pairs = TextDedup.pigeonholePairs(fps, chunkBits = 15, maxHamming)
    val comps = Components.connectedComponents(pairs, "doc1", "doc2")
    val drops = comps.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    fps.join(drops, Seq("doc_id"), "left_anti")
  }
}
