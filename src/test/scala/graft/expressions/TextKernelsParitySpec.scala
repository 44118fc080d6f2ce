package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextExpressions

import graft.{SparkSpec, Tables}
import graft.functions.Text
import graft.operators.TextAnalysis

/** Pins the per-row TextKernels to the round-1 built-in formulations
  * (posexplode + window + aggregate pipelines) on REAL fixture text —
  * the kernels must be bit-identical, or LSH candidate sets and oracle
  * hashes silently drift. Uses sf0.001 documents (poison rows included).
  */
class TextKernelsParitySpec extends SparkSpec {

  private lazy val docs =
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))

  private val K = 3

  /** Round-1 shingle set: tokens -> window lead -> distinct -> sorted. */
  private def referenceSets = {
    val tok = docs.select(col("doc_id"),
      posexplode(Text.tokens(col("text"))).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until K).map(j => lead(col("t"), j).over(w))
    tok.select(col("doc_id"),
        concat_ws(" ", (col("t") +: leads): _*).as("s"),
        leads.last.isNotNull.as("_full"))
      .filter(col("_full")).drop("_full")
      .dropDuplicates("doc_id", "s")
  }

  test("shingleSet kernel == exploded window-lead formulation") {
    val kernel = docs.select(col("doc_id"),
        TextExpressions.shingleSet(col("text"), K).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val ref = referenceSets
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("minhashSig kernel == explode + min(xxhash64(h, p)) aggregates") {
    val numPerms = 8
    val kernel = docs.select(col("doc_id"),
        TextExpressions.minhashSig(
          TextExpressions.shingleSet(col("text"), K), numPerms).as("sig"))
      .filter(col("sig").isNotNull)
    val inv = referenceSets
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val minCols = (0 until numPerms).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val ref = inv.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("simhash64 kernel == exploded 64-bit-vote SUM aggregates") {
    val kernel = docs.select(col("doc_id"),
      TextExpressions.simhash64(col("text")).as("fp"))
      .filter(col("fp").isNotNull)
    val tok = docs.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("t"))
    val h = xxhash64(col("t"))
    val voteCols = (0 until 64).map(i =>
      sum(when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"b$i"))
    val votes = tok.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val fpCol = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a: Column, b: Column) => a.bitwiseOR(b))
    val ref = votes.select(col("doc_id"), fpCol.as("fp"))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("simhashMd5 kernel == exploded md5-prefix 60-bit-vote SUM aggregates") {
    val kernel = docs.select(col("doc_id"),
      TextExpressions.simhashMd5(col("text")).as("fp"))
    val tok = docs.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("t"))
    // the oracle-mirrorable token hash: first 15 hex chars of md5 as a
    // 60-bit integer (built here from Spark builtins, independently of
    // the kernel's digest-byte loop)
    val h = conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long")
    val voteCols = (0 until 60).map(i =>
      sum(when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"b$i"))
    val votes = tok.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val fpCol = (0 until 60).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a: Column, b: Column) => a.bitwiseOR(b))
    val ref = votes.select(col("doc_id"), fpCol.as("fp"))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("smallestDigests kernel == md5 + ranking-window formulation") {
    val kernel = docs.select(col("doc_id"),
        TextExpressions.smallestDigests(
          TextExpressions.shingleSet(col("text"), K), 4).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
    val inv = referenceSets.select(col("doc_id"), md5(col("s")).as("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("h"))
    val ref = inv.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .groupBy(col("doc_id"))
      .agg(concat_ws("|", array_sort(collect_list(col("h"))))
        .as("fingerprint"))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("shingleHashSet kernel == sorted distinct xxhash64 of shingleSet") {
    val kernel = docs.select(col("doc_id"),
        TextExpressions.shingleHashSet(col("text"), K).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val ref = docs.select(col("doc_id"),
        explode(TextExpressions.shingleSet(col("text"), K)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .dropDuplicates("doc_id", "h")
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
    // and the arrays come out sorted ascending (merge-intersect contract)
    val unsorted = docs.select(
        TextExpressions.shingleHashSet(col("text"), K).as("hs"))
      .filter(size(col("hs")) > 1)
      .select(explode(sequence(lit(0), size(col("hs")) - 2)).as("i"),
        col("hs"))
      .filter(element_at(col("hs"), col("i") + 1) >=
        element_at(col("hs"), col("i") + 2))
    assert(unsorted.isEmpty)
  }

  test("minhashSigFromHashes == minhashSig on the string set") {
    val numPerms = 8
    val fromHashes = docs.select(col("doc_id"),
        TextExpressions.minhashSigFromHashes(
          TextExpressions.shingleHashSet(col("text"), K), numPerms).as("sig"))
      .filter(col("sig").isNotNull)
    val fromStrings = docs.select(col("doc_id"),
        TextExpressions.minhashSig(
          TextExpressions.shingleSet(col("text"), K), numPerms).as("sig"))
      .filter(col("sig").isNotNull)
    assert(fromHashes.exceptAll(fromStrings).isEmpty &&
      fromStrings.exceptAll(fromHashes).isEmpty)
  }

  test("sortedLongIntersectSize == size(array_intersect) on sorted sets") {
    val pairs = docs.select(col("doc_id").as("d1"),
        TextExpressions.shingleHashSet(col("text"), K).as("hs1"))
      .crossJoin(docs.select(col("doc_id").as("d2"),
        TextExpressions.shingleHashSet(col("text"), K).as("hs2")))
      .filter(col("d1") < col("d2") && col("d1") < 30 && col("d2") < 30)
    val mismatch = pairs.withColumn("merge",
        TextExpressions.sortedLongIntersectSize(col("hs1"), col("hs2")))
      .withColumn("builtin", size(array_intersect(col("hs1"), col("hs2"))))
      .filter(col("merge") =!= col("builtin"))
    assert(mismatch.isEmpty)
  }

  test("repetitionStats kernel == exploded n-gram groupBy formulation") {
    val st = TextExpressions.repetitionStats(col("text"))
    val kernel = docs.select(col("doc_id"),
      element_at(st, 1).as("n_bi"), element_at(st, 2).as("top_bi"),
      element_at(st, 3).as("n_tri"), element_at(st, 4).as("dup_tri"))
    def grams(k: Int) = docs.select(col("doc_id"),
      explode(Text.shingles(col("text"), k)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val bi = grams(2).groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bi"), max(col("c")).as("top_bi"))
    val tri = grams(3).groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tri"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_tri"))
    val ref = docs.select(col("doc_id"))
      .join(bi, Seq("doc_id"), "left").join(tri, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_bi", "top_bi", "n_tri", "dup_tri"))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("termCounts kernel == explode + groupBy(doc, term) counts") {
    val kernel = docs.select(col("doc_id"),
        explode(TextExpressions.termCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.tf").cast("long").as("tf"))
    val ref = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("stopHits kernel == interpreted HOF filter counts (incl. union)") {
    val dicts = TextAnalysis.LangDicts.map(_._2)
    val toks = Text.tokens(col("text"))
    val ha = TextExpressions.stopHits(col("text"), dicts)
    val kernel = docs.select(
      col("doc_id") +:
        (0 until dicts.size).map(i => element_at(ha, i + 1).as(s"c$i")) :+
        element_at(ha, dicts.size + 1).as("cu"): _*)
    val ref = docs.select(
      col("doc_id") +:
        dicts.zipWithIndex.map { case (ws, i) =>
          size(filter(toks, t => t.isInCollection(ws))).as(s"c$i") } :+
        size(filter(toks, t => t.isInCollection(dicts.flatten)))
          .as("cu"): _*)
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }
}
