package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Par

/** Sequence packing for training-data preparation: greedy first-fit of
  * variable-length chunks into fixed token budgets (the step after
  * [[TextAnalysis.chunk]] that turns chunks into dense training
  * sequences, minimizing pad waste).
  *
  * Bin packing is inherently sequential, so it runs per partition
  * (`mapPartitions` — the documented last-resort tier of SURVEY §7.3):
  * each partition packs its own chunks greedily in arrival order and
  * emits (pack_id, member chunks, token total). Packs never cross
  * partitions, which is exactly what a 1000-executor run needs — no
  * coordination, no shuffle, and pack quality only depends on local fill
  * rates (first-fit is within 2x of optimal waste; in practice ~1.2x for
  * chunk length << budget). Pack ids are (partition_id, local_seq) pairs
  * so they are globally unique without any global counter.
  *
  * Oversized chunks (n_tokens > budget) are emitted as singleton packs —
  * a downstream truncation policy decision, not silently dropped.
  */
object Packing {

  final case class Chunk(doc_id: Long, chunk_idx: Long, n_tokens: Int)
  final case class Packed(pack_id: String, doc_id: Long, chunk_idx: Long,
                          n_tokens: Int, pack_tokens: Int)

  /** Max packs held open per partition: bounds BOTH the first-fit scan
    * (O(maxOpen) per chunk, not O(packs ever opened)) and task memory
    * (only open packs buffer members; retired packs stream out) — the
    * two properties that make per-partition packing safe on arbitrarily
    * large partitions. When all open packs are too full for a new chunk
    * and the table is at capacity, the fullest pack retires to make room
    * (slightly worse fill than unbounded first-fit, bounded resources). */
  val MaxOpenPacks = 64

  def packChunks(spark: SparkSession, chunks: DataFrame, budget: Int): Dataset[Packed] = {
    import spark.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    val ds = Par.spread(chunks)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"))
      .as[Chunk]
    ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      final case class Open(seq: Int, var rem: Int,
                            members: scala.collection.mutable.ArrayBuffer[Chunk])
      val open = scala.collection.mutable.ArrayBuffer.empty[Open]
      var nextSeq = 0
      def emit(p: Open): Iterator[Packed] = {
        val total = p.members.iterator.map(_.n_tokens).sum
        p.members.iterator.map(c =>
          Packed(s"$pid-${p.seq}", c.doc_id, c.chunk_idx, c.n_tokens, total))
      }
      def place(c: Chunk): Iterator[Packed] = {
        val fit = open.indexWhere(_.rem >= c.n_tokens)
        if (fit >= 0) {
          val p = open(fit)
          p.rem -= c.n_tokens
          p.members += c
          // a full pack can never fit another chunk — stream it out now
          if (p.rem == 0) { open.remove(fit); emit(p) } else Iterator.empty
        } else {
          // no open pack fits; retire the fullest pack if at capacity
          val retired =
            if (open.size >= MaxOpenPacks) {
              val fullest = open.minBy(_.rem)
              open -= fullest
              emit(fullest)
            } else Iterator.empty
          val rem = math.max(0, budget - c.n_tokens)
          val p = Open(nextSeq, rem,
            scala.collection.mutable.ArrayBuffer(c))
          nextSeq += 1
          // oversized chunks (rem 0) retire immediately as singletons
          if (rem == 0) retired ++ emit(p)
          else { open += p; retired }
        }
      }
      it.flatMap(place) ++
        Iterator(()).flatMap(_ => open.iterator.flatMap(emit))
    }
  }
}
