package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Num, Skew}

/** Warehouse-maintenance operators over the landed star schema — the
  * jobs a warehouse team runs BETWEEN queries to keep the landed
  * tables trustworthy and fresh: referential-integrity audits, CDC
  * batch merges (the batch form of the reference's upsert sink —
  * `pipelinewise-target-postgres`' ON CONFLICT path, re-expressed as a
  * key-partitioned dataflow), incremental rollup maintenance
  * (partial-aggregate combine, the materialized-view refresh pattern),
  * and join-key skew audits. Every operator is a constant number of
  * key-partitioned exchanges — no driver loops, no per-key actions.
  */
object Warehouse {

  /** One foreign-key edge for [[riAudit]]: `child.childKey` should
    * land in `parent.parentKey`. */
  final case class RiEdge(name: String, child: DataFrame,
                          childKey: String, parent: DataFrame,
                          parentKey: String)

  /** REFERENTIAL-INTEGRITY AUDIT (x176) — for every declared FK edge:
    * child row count, NULL-key count, orphan count (non-null keys with
    * no parent) and the orphan rate on the 1e-6 grid. The first gate a
    * warehouse runs after a load lands — silent orphans are how a 10%
    * revenue understatement ships.
    *
    * Scale shape: per edge, the child collapses to its DISTINCT keys
    * WITH per-key row counts before touching the parent (the anti-join
    * then moves key-cardinality rows, not fact rows), the parent side
    * is its distinct key column only, and each edge reduces to one
    * 1-row frame — the report is a union of 1-row aggregates, one
    * key-partitioned exchange pair per edge, fact text/payload never
    * shuffled. */
  def riAudit(edges: Seq[RiEdge]): DataFrame = {
    require(edges.nonEmpty, "riAudit needs at least one edge")
    require(edges.map(_.name).distinct.size == edges.size,
      "edge names must be unique")
    val legs = edges.map { e =>
      val keys = e.child.select(col(e.childKey).as("_k"))
      val counts = keys.agg(count(lit(1)).as("n_rows"),
        count(col("_k")).as("_nn"))
      val orphans = keys.filter(col("_k").isNotNull)
        .groupBy(col("_k")).agg(count(lit(1)).as("_c"))
        .join(e.parent.select(col(e.parentKey).as("_k")).distinct(),
          Seq("_k"), "left_anti")
        .agg(coalesce(sum(col("_c")), lit(0L)).as("n_orphans"))
      // both sides are 1 row — the cross join is a broadcast of one row
      counts.crossJoin(broadcast(orphans))
        .select(lit(e.name).as("edge"), col("n_rows"),
          (col("n_rows") - col("_nn")).as("n_null_keys"),
          col("n_orphans"),
          Num.fpRound(col("n_orphans").cast("double") /
            col("n_rows").cast("double"), 6).as("orphan_rate"))
    }
    legs.reduce(_.unionByName(_))
  }

  /** CDC BATCH APPLY (x177) — MERGE a change batch onto a base
    * snapshot: `changes` carries the base's payload columns plus an
    * op column (`'I'`/`'U'`/`'D'`) and a per-key monotone sequence;
    * the LATEST change per key wins (ties impossible by the
    * (key, seq)-unique contract), `'D'` drops the key, `'I'`/`'U'`
    * both upsert their image (an `'U'` for an absent key inserts —
    * upsert semantics, matching the reference sink's ON CONFLICT
    * branch). Output = the post-merge snapshot with the base's exact
    * column set.
    *
    * Scale shape: latest-change-per-key is ONE aggregate
    * (`max(struct(seq, …))` argmax — no window, map-side combine
    * intact), untouched base rows come from one key-keyed anti-join,
    * and the result is a union — two key exchanges total, each moving
    * each key once. This is the dataflow MERGE INTO plans to when the
    * engine owns both sides. */
  def cdcApply(base: DataFrame, changes: DataFrame, keyCol: String,
               opCol: String, seqCol: String): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(keyCol), s"base lacks key column $keyCol")
    val rest = payload.filterNot(_ == keyCol)
    // seq leads the struct so max() is argmax-by-seq; op + payload
    // behind it only break (contract-impossible) ties deterministically
    val latest = changes
      .select(col(keyCol),
        struct((Seq(seqCol, opCol) ++ rest).map(col): _*).as("_ch"))
      .groupBy(col(keyCol))
      .agg(max(col("_ch")).as("_ch"))
    val upserts = latest
      .filter(col("_ch").getField(opCol) =!= "D")
      .select(col(keyCol) +:
        rest.map(c => col("_ch").getField(c).as(c)): _*)
    val untouched = base
      .join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
    untouched.select(payload.map(col): _*)
      .unionByName(upserts.select(payload.map(col): _*))
  }

  /** Partial-aggregate shard for [[mergeRollup]]: per key, the
    * MERGEABLE state (row count, exact unit sum as DECIMAL(38,0),
    * min/max of the raw measure). Compute one of these per partition /
    * load batch; merging them is associative and loses nothing —
    * count and sum re-sum, min/max re-min/max. */
  def rollupPartial(df: DataFrame, keyCols: Seq[String],
                    unitsCol: String, valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(unitsCol).cast("decimal(38,0)")).as("sum_units"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** INCREMENTAL ROLLUP MERGE (x178) — combine [[rollupPartial]]
    * shards into the exact rollup of their union: the materialized-
    * view refresh pattern. At 100 TB the point is that a nightly
    * refresh re-aggregates ONLY the fresh partition and merges its
    * k-bounded partial into the stored cube — the historical corpus
    * is never re-scanned, yet the result is bit-identical to a full
    * recompute (count/sum/min/max are all mergeable states; the
    * oracle checks merged-vs-full-recompute equality directly).
    *
    * Scale shape: a union of cube-sized frames into one hash
    * aggregate — map-side combine collapses each shard's key before
    * the exchange; the shuffle moves cube keys, not facts. */
  def mergeRollup(parts: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergeRollup needs at least one shard")
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_units")).as("sum_units"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** JOIN-KEY SKEW AUDIT (x181) — the top-k heaviest values of a join
    * key with each key's share of the table (1e-6 grid): the report
    * that tells you which keys will straggle a shuffle join BEFORE the
    * join runs, and whether they need salting / AQE skew handling.
    *
    * Scale shape: one per-key count aggregate (map-side combine — the
    * exchange moves key cardinality, not rows), then the global top-k
    * via the salted two-phase window ([[Skew.saltedTopK]] — no
    * single-task global sort even over a billion-key frame); the
    * 1-row total broadcasts. */
  def keySkewAudit(df: DataFrame, keyCol: String,
                   topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("_tot"))
    Skew.saltedTopK(counts, Seq.empty, "n_rows", topK,
        tieCols = Seq(keyCol))
      .crossJoin(broadcast(total))
      .select(col(keyCol), col("n_rows"), col("rank"),
        Num.fpRound(col("n_rows").cast("double") /
          col("_tot").cast("double"), 6).as("share"))
  }
}
