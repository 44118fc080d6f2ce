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

  def packChunks(spark: SparkSession, chunks: DataFrame, budget: Int): Dataset[Packed] = {
    import spark.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    val ds = Par.spread(chunks)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"))
      .as[Chunk]
    ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      // open packs: (local pack seq, remaining budget); first-fit greedy
      val open = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      val members = scala.collection.mutable.ArrayBuffer.empty[(Int, Chunk)]
      var nextSeq = 0
      it.foreach { c =>
        val fit = open.indexWhere(_._2 >= c.n_tokens)
        if (fit >= 0) {
          val (seq, rem) = open(fit)
          val left = rem - c.n_tokens
          // full packs can never fit another chunk — retire them so the
          // first-fit scan stays O(open), not O(all packs ever)
          if (left == 0) open.remove(fit) else open(fit) = (seq, left)
          members += ((seq, c))
        } else {
          // no open pack fits (also the oversized-chunk case: it opens a
          // pack that is immediately over budget and never fits others)
          val rem = math.max(0, budget - c.n_tokens)
          if (rem > 0) open += ((nextSeq, rem))
          members += ((nextSeq, c))
          nextSeq += 1
        }
      }
      val totals = members.groupBy(_._1).map { case (seq, ms) =>
        seq -> ms.map(_._2.n_tokens).sum
      }
      members.iterator.map { case (seq, c) =>
        Packed(s"$pid-$seq", c.doc_id, c.chunk_idx, c.n_tokens, totals(seq))
      }
    }
  }
}
