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

  /** Concat-then-chunk offset index (x46): place every document at its
    * token offset in the virtual concatenation of the corpus in
    * deterministic shuffle order (ascending md5(id)) — the index a
    * GPT-style packing job needs to slice fixed windows out of the
    * concatenated token stream. Returns (doc_id, n_tokens, start_offset)
    * with start_offset = exclusive prefix sum of n_tokens in hash order.
    *
    * The naive formulation — `sum over Window.orderBy(hash)` with no
    * partition — collapses the corpus into ONE task (Spark's global
    * window). This is instead a two-phase distributed prefix sum, all
    * declarative:
    *
    *   1. bucket = top `bucketBits` bits of the 60-bit md5 hash — a
    *      STATIC range partitioning of the hash order (no sampled
    *      boundaries, so no nondeterminism and nothing to pin/cache;
    *      uniform because md5 is), giving 2^bucketBits parallel groups
    *      that are contiguous runs of the global order;
    *   2. local running sum per bucket (ordinary partitioned window);
    *   3. per-bucket totals (2^bucketBits rows) roll into exclusive
    *      bucket offsets with a second cumulative window over the tiny
    *      totals frame (<= 2^24 16-byte rows — never the corpus),
    *      re-joined broadcast. (Since round 7 this delegates to
    *      [[groupedOffsets]] with a constant group, so even the totals
    *      window is hash-partitioned — no single-partition exchange in
    *      the plan at all.)
    *
    * Shuffle cost: one hash exchange of (id, n_tokens) pairs for the
    * window plus a 2^bucketBits-row broadcast — the text never moves
    * and the index stays a lazy DataFrame. The only driver-side
    * materialization is the broadcast of the totals frame itself
    * (~16 B × 2^bucketBits, like any broadcast relation), so prefer
    * bucketBits <= 20 (~17 MB); the hard cap is 24 (~270 MB — workable
    * but pushing broadcast limits; past that, swap the broadcast for a
    * shuffle join on _bucket). At 100 TB raise bucketBits so each
    * bucket's run fits a task (2^20 buckets ≈ 100 MB of corpus each);
    * the result is invariant to the choice (pinned by PackingSpec).
    *
    * The (id, n_tokens, bucket) projection is cached because BOTH the
    * per-bucket cumsum and the bucket-totals aggregate read it: under a
    * nondeterministic source (e.g. a re-sampled upstream) two
    * independent scans could disagree, corrupting offsets. */
  def concatOffsets(docs: DataFrame, idCol: String, textCol: String,
                    bucketBits: Int = 8): DataFrame =
    groupedOffsets(docs.withColumn("_cg", lit(0)), idCol, textCol, "_cg",
      bucketBits)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"))

  /** Per-GROUP concat offset index — [[concatOffsets]] generalized to a
    * prefix sum within each value of `groupCol` (one virtual token
    * concatenation per source/language/tenant): returns
    * (doc_id, group, n_tokens, start_offset) with start_offset the
    * exclusive running token total within the group's md5-hash order.
    *
    * Same two-phase shape as [[concatOffsets]], with the group key
    * threaded through both phases: corpus-side windows partition by
    * (group, bucket), and the totals rollup partitions by GROUP — so
    * unlike the ungrouped form there is no single-partition exchange
    * anywhere; the per-group totals window handles <= 2^bucketBits rows
    * and distinct groups proceed in parallel. The broadcast carries
    * (#groups × 2^bucketBits) rows — size bucketBits accordingly (the
    * per-group run length, not the corpus, is what a bucket must fit).
    *
    * This is the engine under [[TextAnalysis.tokenBudgetMix]]: a
    * per-source token-budget cap is exactly "keep while the group's
    * running total is under budget", and the grouped prefix sum
    * delivers that running total without ever sorting a hot source in
    * one task. */
  def groupedOffsets(docs: DataFrame, idCol: String, textCol: String,
                     groupCol: String, bucketBits: Int = 8): DataFrame =
    groupedOffsetsCore(docs, idCol,
      size(split(lower(trim(col(textCol))), "\\s+")).cast("long"),
      groupCol, bucketBits)

  /** [[concatOffsets]] with the token count supplied as a COLUMN
    * instead of derived by whitespace split — the TOKENIZER-AWARE
    * form: x84's BPE subtoken counts (or any learned tokenizer's)
    * drive the offsets, so packing budgets measure what the trainer
    * actually consumes rather than a whitespace proxy. Same two-phase
    * prefix sum, same md5 concatenation order. */
  def concatOffsetsBy(docs: DataFrame, idCol: String, nTokensCol: String,
                      bucketBits: Int = 8): DataFrame =
    groupedOffsetsCore(docs.withColumn("_cg", lit(0)), idCol,
      col(nTokensCol).cast("long"), "_cg", bucketBits)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"))

  private def groupedOffsetsCore(docs: DataFrame, idCol: String,
                                 nTokens: org.apache.spark.sql.Column,
                                 groupCol: String,
                                 bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 24,
      s"bucketBits must be in [1,24], got $bucketBits")
    val hk = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val keyed = Par.spread(docs).select(
      col(groupCol).as("_g"),
      col(idCol).as("doc_id"),
      nTokens.as("n_tokens"),
      hk.as("_hk"))
      .withColumn("_bucket", shiftright(col("_hk"), 60 - bucketBits))
      .cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g"), col("_bucket"))
      .orderBy(col("_hk"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val local = keyed.withColumn("_cum", sum(col("n_tokens")).over(w))
    // per-(group, bucket) totals -> exclusive bucket offsets via a
    // cumulative window PARTITIONED BY GROUP over the tiny totals frame
    // (<= 2^bucketBits rows per group); stays lazy — no driver collect
    val wBuckets = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val offsetDf = keyed.groupBy(col("_g"), col("_bucket"))
      .agg(sum(col("n_tokens")).as("_total"))
      .withColumn("_bucket_offset",
        coalesce(sum(col("_total")).over(wBuckets), lit(0L)))
      .select(col("_g"), col("_bucket"), col("_bucket_offset"))
    local.join(broadcast(offsetDf), Seq("_g", "_bucket"))
      .select(col("doc_id"), col("_g").as(groupCol), col("n_tokens"),
        (col("_bucket_offset") + col("_cum") - col("n_tokens"))
          .as("start_offset"))
  }

  /** Deterministic global shuffle + fixed-size shard assignment — the
    * export step of a training-data pipeline: order the corpus by
    * `md5(id)` (a reproducible, seed-free shuffle — the same trick as
    * [[concatOffsets]]' virtual concatenation order) and cut it into
    * consecutive `shardSize`-document shards, so a trainer streams
    * shard files in a fixed, well-mixed order. Returns
    * `(doc_id, shuffle_key, n_tokens, rank, shard_id)` with `rank` the
    * 0-based position in the global md5 order and
    * `shard_id = rank / shardSize`.
    *
    * The global rank is the same TWO-PHASE distributed prefix pattern
    * as [[groupedOffsets]], with count in place of token sum: bucket =
    * first `bucketHexChars` hex chars of the key (a static range
    * partitioning of the hash order — buckets are contiguous runs of
    * the global order because fixed-length lowercase hex compares
    * lexicographically as it does numerically), local `row_number` per
    * bucket, per-bucket counts rolled into exclusive offsets over the
    * ≤ 16^bucketHexChars-row totals frame and re-joined broadcast.
    * Never a global sort, never a single corpus-sized window. Shards
    * are contiguous in the key order by construction, so the actual
    * file write is `repartitionByRange(col("shard_id"))` +
    * `partitionBy("shard_id")` with no further shuffle thought.
    *
    * Same determinism requirement and working-projection cache as
    * [[groupedOffsets]] (two scans of `docs`). */
  def shardAssign(docs: DataFrame, idCol: String, textCol: String,
                  shardSize: Long, bucketHexChars: Int = 2): DataFrame =
    groupedShardAssign(docs.withColumn("_sg", lit(0)), idCol, textCol,
      "_sg", shardSize, bucketHexChars)
      .select(col("doc_id"), col("shuffle_key"), col("n_tokens"),
        col("rank"), col("shard_id"))

  /** Per-GROUP shard assignment — [[shardAssign]] generalized to an
    * independent md5-order layout within each value of `groupCol` (one
    * shard sequence per train/val/test split, per source, per epoch):
    * a trainer streams each split's shards separately, so the rank —
    * and the shard numbering — must restart per group. Same two-phase
    * prefix shape with the group key threaded through both phases
    * (windows partition by (group, bucket); offsets roll up PER GROUP),
    * so distinct groups proceed fully in parallel and nothing ever
    * funnels through one task — the [[groupedOffsets]] argument. The
    * broadcast carries (#groups × 16^bucketHexChars) rows. */
  def groupedShardAssign(docs: DataFrame, idCol: String, textCol: String,
                         groupCol: String, shardSize: Long,
                         bucketHexChars: Int = 2): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    require(bucketHexChars >= 1 && bucketHexChars <= 4,
      s"bucketHexChars must be in [1,4], got $bucketHexChars " +
        "(16^5 bucket-offset rows would stress the broadcast for no gain)")
    val keyed = Par.spread(docs).select(
      col(groupCol).as("_g"),
      col(idCol).as("doc_id"),
      size(graft.functions.Text.tokens(col(textCol))).cast("long")
        .as("n_tokens"),
      md5(col(idCol).cast("string")).as("shuffle_key"))
      .withColumn("_bucket", substring(col("shuffle_key"), 1, bucketHexChars))
      .cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g"), col("_bucket"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    val local = keyed.withColumn("_lrank", row_number().over(w).cast("long"))
    // exclusive doc-count offsets over the tiny per-(group, bucket)
    // totals frame, cumulated per group
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val offsets = keyed.groupBy(col("_g"), col("_bucket"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_boff", coalesce(sum(col("_cnt")).over(wB), lit(0L)))
      .select(col("_g"), col("_bucket"), col("_boff"))
    local.join(broadcast(offsets), Seq("_g", "_bucket"))
      .withColumn("rank", col("_boff") + col("_lrank") - 1)
      .select(col("doc_id"), col("_g").as(groupCol), col("shuffle_key"),
        col("n_tokens"), col("rank"),
        floor(col("rank") / lit(shardSize)).cast("long").as("shard_id"))
  }

  /** Per-group shard MANIFEST over [[groupedShardAssign]] (x77): one row
    * per (group, shard) — the split-aware export index a training job
    * reads to plan each split's epoch independently. */
  def groupedShardManifest(docs: DataFrame, idCol: String, textCol: String,
                           groupCol: String, shardSize: Long,
                           bucketHexChars: Int = 2): DataFrame =
    groupedShardAssign(docs, idCol, textCol, groupCol, shardSize,
      bucketHexChars)
      .groupBy(col(groupCol), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("shuffle_key")).as("first_key"),
        max(col("shuffle_key")).as("last_key"))

  /** Shard MANIFEST over [[shardAssign]]: one row per output shard with
    * its document count, token total and key range — the index a
    * training job reads to plan epochs (and the partition-invariant,
    * oracle-checkable summary of the shard layout: every column is a
    * pure function of the data). All shards hold exactly `shardSize`
    * docs except the last. The aggregate groups by shard id — output
    * cardinality n/shardSize, a high-reduction single hash agg. */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    shardSize: Long, bucketHexChars: Int = 2): DataFrame =
    shardAssign(docs, idCol, textCol, shardSize, bucketHexChars)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("shuffle_key")).as("first_key"),
        max(col("shuffle_key")).as("last_key"))

  /** The placement core shared by [[packChunks]] (arrival-order
    * first-fit, `maxOpen` = [[MaxOpenPacks]]) and [[packDeterministic]]
    * (hash-order next-fit, `maxOpen` = 1 — with one open pack, "first
    * pack that fits" degenerates to exactly the classic next-fit rule,
    * which is what makes the deterministic variant SQL-simulable). */
  private final class Packer(budget: Int, maxOpen: Int, prefix: String)
      extends Serializable {
    private final case class Open(seq: Int, var rem: Int,
                                  members: scala.collection.mutable.ArrayBuffer[Chunk])
    private val open = scala.collection.mutable.ArrayBuffer.empty[Open]
    private var nextSeq = 0
    private def emit(p: Open): Iterator[Packed] = {
      val total = p.members.iterator.map(_.n_tokens).sum
      p.members.iterator.map(c =>
        Packed(s"$prefix-${p.seq}", c.doc_id, c.chunk_idx, c.n_tokens, total))
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
          if (open.size >= maxOpen) {
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
    /** Retire every still-open pack (end of partition / bucket). */
    def flush(): Iterator[Packed] = {
      val packs = open.toArray
      open.clear()
      packs.iterator.flatMap(emit)
    }
  }

  def packChunks(spark: SparkSession, chunks: DataFrame, budget: Int): Dataset[Packed] = {
    import spark.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    val ds = Par.spread(chunks)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"))
      .as[Chunk]
    ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val packer = new Packer(budget, MaxOpenPacks, pid.toString)
      it.flatMap(packer.place) ++
        Iterator(()).flatMap(_ => packer.flush())
    }
  }

  /** DETERMINISTIC packing (x61) — the driver-checkable twin of
    * [[packChunks]]: chunks are routed to 2^`bucketBits` md5 buckets
    * (top bits of the 60-bit md5 of "doc_id:chunk_idx" — the static
    * hash-partitioning rule of [[groupedOffsets]]) and packed NEXT-FIT
    * in ascending hash order within each bucket, the pack stream
    * resetting at every bucket boundary. The assignment is therefore a
    * pure function of the data — invariant to input partitioning, task
    * count and arrival order — which is what lets a SQL oracle simulate
    * it row for row (a recursive scan per bucket), closing the one
    * operator family that had no registered correctness row
    * ([[packChunks]]'s arrival-order first-fit is inherently
    * layout-dependent; it shares [[Packer]], so the placement arithmetic
    * x61 checks is the same code the production form runs).
    *
    * Scale shape: one hash exchange of (doc_id, chunk_idx, n_tokens)
    * triples — the text never moves — then a per-partition sort and a
    * sequential scan per bucket; buckets are processed independently, so
    * at 100 TB raise `bucketBits` until a bucket's triples fit a task
    * (the same sizing rule as [[groupedOffsets]]). Next-fit is within
    * 2x of optimal waste (vs first-fit's 1.7x bound) — the price of the
    * deterministic/auditable form; production runs wanting tighter fill
    * keep [[packChunks]].
    */
  def packDeterministic(spark: SparkSession, chunks: DataFrame, budget: Int,
                        bucketBits: Int = 3): Dataset[Packed] = {
    import spark.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1,20], got $bucketBits")
    val hk = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":"), col("chunk_idx").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    Par.spread(chunks)
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"))
      .withColumn("_hk", hk)
      .withColumn("_bucket", shiftright(col("_hk"), 60 - bucketBits))
      .repartition(col("_bucket"))
      .sortWithinPartitions(col("_bucket"), col("_hk"), col("doc_id"),
        col("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        col("n_tokens").cast("int").as("n_tokens"), col("_bucket"))
      .as[(Long, Long, Int, Long)]
      .mapPartitions { it =>
        // a partition holds whole buckets (hash-routed); the packer
        // resets at each bucket boundary so which partition a bucket
        // lands in cannot affect the assignment
        var packer: Packer = null
        var bucket = Long.MinValue
        it.flatMap { case (id, cidx, n, b) =>
          val head =
            if (packer == null || b != bucket) {
              val flushed = if (packer != null) packer.flush() else Iterator.empty
              packer = new Packer(budget, 1, b.toString)
              bucket = b
              flushed
            } else Iterator.empty
          head ++ packer.place(Chunk(id, cidx, n))
        } ++ Iterator(()).flatMap(_ =>
          if (packer != null) packer.flush() else Iterator.empty)
      }
  }
}
