package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, TextAnalysis, TextDedup}

/** End-to-end training-data preparation over real fixture documents:
  * exact dedup -> token-window chunking -> sequence packing -> hash
  * split — the composed pipeline the individual operators exist for.
  * Every stage is the same code the registered queries use. */
class TrainingPipelineSpec extends SparkSpec {

  test("dedup -> chunk -> pack -> split composes end-to-end on fixtures") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val total = docs.count()

    // 1) exact dedup: keep one doc per normalized-text digest
    val keep = TextDedup.exactGroups(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, "doc_id")
    val nDeduped = deduped.count()
    assert(nDeduped <= total && nDeduped > 0)

    // 2) chunk into 64-token windows (stride 48)
    val chunks = TextAnalysis.chunk(deduped, "doc_id", "text", 64, 48)
      .withColumn("n_tokens", size(split(col("chunk"), " ")))
    val nChunks = chunks.count()
    assert(nChunks >= nDeduped) // every kept doc yields >= 1 chunk

    // 3) pack chunks into 128-token training sequences
    val packed = Packing.packChunks(spark, chunks, budget = 128)
    assert(packed.count() == nChunks) // exactly-once membership
    val packs = packed.groupBy("pack_id")
      .agg(sum("n_tokens").as("tok"), max("pack_tokens").as("ann"))
      .collect()
    packs.foreach { r =>
      assert(r.getLong(1) == r.getAs[Int]("ann").toLong) // annotation right
    }
    // fill rate sanity: packs are mostly full (chunks are <= 64 tokens,
    // budget 128, so first-fit pairs them up)
    val fill = packs.map(_.getLong(1)).sum.toDouble / (packs.length * 128)
    assert(fill > 0.6, s"fill rate $fill")

    // 4) deterministic split assignment joins back to the packed stream
    val splits = TextAnalysis.hashSplit(deduped, "doc_id")
    val labeled = packed.toDF().join(splits, "doc_id")
    assert(labeled.count() == nChunks) // every chunk gets a split label
    val perSplit = labeled.select("split").distinct().collect()
      .map(_.getString(0)).toSet
    assert(perSplit.subsetOf(Set("train", "val", "test")))
    assert(perSplit.contains("train"))
  }
}
