package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.Warehouse

/** A DELETE-TIME CAPTURE feed for an ADDITIVE index family
  * ([[Maintenance.runCycle]] step 1.5): `table` holds the rows the
  * landing-table delete path captured before dropping them
  * ([[Warehouse.deleteFromLandingWithCapture]]), each batch stamped
  * with its deterministic `batch_id`. The cycle applies every captured
  * batch through `apply` — expected to be the family's IDEMPOTENT
  * versioned delete ([[graft.operators.Graph.deleteFromEdgeIndexVersioned]]),
  * so a batch replayed across cycles (crash before prune) is a ledger
  * no-op — then prunes applied batches from the feed. This is how the
  * edge family reaches the same "fresh after every cycle" guarantee
  * the per-key-row families get from `deleteStale`: their staleness is
  * repairable post-hoc from key sets, the additive families' is only
  * repairable from the deleted ROWS, which this feed preserves across
  * the landing delete.
  *
  * @param apply (spark, batchRows-without-batch_id, batchId) => true
  *   when the batch was actually applied this call (false = the
  *   ledger's idempotent no-op).
  * @param isApplied (spark, batchId) => is this batch id in the
  *   family's ledger? (wire to [[graft.operators.Snapshots.isApplied]]
  *   with the family's ledger.) The PRUNE GUARD: a batch is pruned
  *   from the feed only when `apply` returned true this cycle OR
  *   `isApplied` confirms a genuine replay (applied in an earlier
  *   cycle, crash before prune). A batch that is neither — `apply`
  *   no-opped but the ledger does not carry its id (an id aliased to
  *   some OTHER batch's, a feed row from a foreign family) — is LEFT
  *   in the feed and logged `delete_batch_stuck`: its captured rows
  *   are the only repair path, so pruning them would freeze the
  *   staleness in permanently. When None, only `apply == true`
  *   batches prune (replayed batches then re-no-op each cycle until
  *   the feed owner intervenes — safe, just noisier).
  */
final case class TombstoneFeed(
    table: String,
    apply: (SparkSession, DataFrame, String) => Boolean,
    prune: Boolean = true,
    isApplied: Option[(SparkSession, String) => Boolean] = None)

/** One index under automatic maintenance ([[Maintenance.runCycle]]):
  * where its physical tables live, how to read the current corpus /
  * index key sets, and the repair callbacks + thresholds. Every field
  * beyond the audits is optional — an index with no callbacks is
  * audit-only (the report still lands in the action log).
  *
  * @param tables one entry per physical table:
  *   `(label, tableName, partialAuditKeyCols)` — key columns empty to
  *   skip the partial audit for that table (sidecars, non-additive
  *   tables).
  * @param appendMissing called with the frame of corpus keys the index
  *   lacks; implementations append the corresponding rows (the
  *   family's `append*Index`).
  * @param deleteStale called with the frame of index keys the corpus
  *   lost; implementations remove them
  *   ([[Warehouse.deleteFromIndex]] / the family's negated-append).
  * @param compactFilesFactor compact a table when its data-file count
  *   exceeds this factor × max(buckets, 1) — 1.0 = compact back to the
  *   canonical one-file-per-bucket layout whenever any append landed.
  * @param mergeRowsPerKey run `merge` when any partial-audited table
  *   reads more than this many rows per distinct key.
  * @param tombstones the delete-time capture feed for additive
  *   families (consumed before the freshness audit, so the audit sees
  *   the post-consumption state).
  * @param resolveTables versioned families' dynamic table resolution
  *   (current-snapshot names change on publish); `tables` is used when
  *   None.
  * @param ledger versioned families' `(ledgerTable, indexName)`; when
  *   set, every cycle runs the concurrent-writer tripwire
  *   ([[graft.operators.Snapshots.versionConflicts]]) and logs a
  *   `conflict_audit` row — conflicts=0 is the single-writer contract
  *   holding; a hit means a staging race lost a mutation (re-apply
  *   the losing batch or rebuild).
  * @param retireBases the family's version-0 BASE table names (all of
  *   them — an unlisted base's old snapshots would linger forever).
  *   When set together with `ledger`, every cycle ends by reclaiming
  *   snapshots past the grace window
  *   ([[graft.operators.Snapshots.retire]], keep = `keepVersions`):
  *   without this an Orchestrator-maintained versioned family grows
  *   one full index copy per mutation, unbounded. The cycle cadence IS
  *   the grace period — a reader that resolved just before this
  *   cycle's publishes still has its complete previous snapshot.
  *   Ledger rows are never dropped (the idempotency record).
  * @param keepVersions how many trailing versions [[retireBases]]
  *   keeps (default 2: current + previous — the in-flight-reader
  *   grace).
  * @param lease the family's writer-lease table
  *   ([[graft.operators.Snapshots.withLease]]). When set, the cycle
  *   runs this index's ENTIRE pass (its mutating steps — tombstone
  *   applies, freshness repairs, merges, compactions, retire — plus
  *   the audits that bracket them) under the lease, so a concurrent
  *   cycle or out-of-band writer on the same family is denied BEFORE
  *   staging instead of detected after by the tripwire. A denial
  *   skips the index for THIS cycle and logs `lease_denied` (the
  *   holder is doing the same work; the next cycle retries) — the
  *   cadence-retry trade, never a blocked loop.
  * @param compactFamily VERSIONED families' layout compaction: called
  *   ONCE per cycle when any table crosses `compactFilesFactor`,
  *   INSTEAD of the per-table [[Warehouse.compactIndex]] swap — a
  *   versioned family must compact by publishing the next snapshot
  *   (e.g. [[graft.operators.Graph.mergeEdgeIndexVersioned]] /
  *   [[Warehouse.compactIndexVersioned]]); the in-place swap would
  *   mutate the CURRENT snapshot under in-flight readers, breaking
  *   the publish-by-pointer guarantee everything else in the cycle
  *   honors.
  */
final case class MaintainedIndex(
    name: String,
    tables: Seq[(String, String, Seq[String])],
    corpusKeys: SparkSession => DataFrame,
    indexKeys: SparkSession => DataFrame,
    appendMissing: Option[(SparkSession, DataFrame) => Unit] = None,
    deleteStale: Option[(SparkSession, DataFrame) => Unit] = None,
    compactFilesFactor: Double = 1.0,
    mergeRowsPerKey: Double = 1.0,
    merge: Option[SparkSession => Unit] = None,
    tombstones: Option[TombstoneFeed] = None,
    resolveTables: Option[SparkSession => Seq[(String, String, Seq[String])]] =
      None,
    compactFamily: Option[SparkSession => Unit] = None,
    ledger: Option[(String, String)] = None,
    retireBases: Option[Seq[String]] = None,
    keepVersions: Int = 2,
    lease: Option[String] = None) {
  require(keepVersions >= 1,
    s"index $name: keepVersions must be >= 1, got $keepVersions")
  require(retireBases.forall(_.nonEmpty),
    s"index $name: retireBases, when set, needs >= 1 base")
  require(retireBases.isEmpty || ledger.isDefined,
    s"index $name: retireBases needs the family's ledger")
  require(tables.nonEmpty, s"index $name needs at least one table")
  // runCycle resolves compaction targets BY label; a duplicate would
  // silently compact the wrong table (and make audit rows ambiguous) —
  // the same uniqueness law the audit operators require of their inputs
  require(tables.map(_._1).distinct.size == tables.size,
    s"index $name has duplicate table labels")
}

/** One line of [[Maintenance.runCycle]]'s action log. `action` ∈
  * {recover, delete_stale, append_missing, merge, compact, audit,
  * lease_denied} — `audit` rows record the post-repair freshness
  * numbers, so the log alone shows a cycle ended fresh; `lease_denied`
  * records an index skipped whole because another writer held its
  * lease (the next cycle retries). */
final case class MaintenanceAction(index: String, action: String,
                                   detail: String)

/** THE MAINTENANCE CYCLE the reference's scheduler runs between syncs
  * (`scheduler.py`'s dbt step, re-expressed for the index layer) —
  * previously the operational trio (x210 file audit / x211 freshness /
  * x213 partial audit) existed as queries a human had to run and act
  * on; this closes the loop so a multi-cycle
  * [[Orchestrator.loop]] ends compacted and fresh with no manual
  * calls, the way the streaming path's `compactEvery` cadence already
  * did for micro-batches.
  *
  * Per index, in repair-before-layout order:
  *   1. RECOVER any torn compaction swap ([[Warehouse.recoverIndex]])
  *      — before anything touches the tables.
  *   2. FRESHNESS-gated repair: the bucketed-checksum audit
  *      ([[Warehouse.indexFreshnessAuditBucketed]] — numBuckets rows
  *      moved per side in the steady state, the cycle-affordable
  *      detect pass) decides whether the exact anti-join key frames
  *      are built AT ALL; `deleteStale` runs before `appendMissing`
  *      (a key in both sets — content changed — must end present).
  *   3. DEEP MERGE when the partial audit crosses `mergeRowsPerKey`
  *      (additive indexes accrete one row per (key, ingest);
  *      serve-side merge-sums grow with ingest count — x213's law).
  *   4. COMPACT every table whose file count crossed
  *      `compactFilesFactor` × buckets (appends land one file per
  *      touched bucket per ingest — x210's law).
  *   5. RETIRE versioned snapshots past the grace window
  *      (`retireBases` + `keepVersions` — the cycle cadence is the
  *      in-flight readers' grace period; ledger rows stay).
  *
  * Scale shape: the steady-state cycle (nothing to repair) costs the
  * bucketed freshness scans + one metadata listing per table; repair
  * work is proportional to what actually changed (dirty buckets,
  * appended partials), never to corpus size. Like the compaction it
  * drives, a cycle must not run concurrently with serving reads of
  * the same index. */
object Maintenance {

  def runCycle(spark: SparkSession,
               indexes: Seq[MaintainedIndex]): Seq[MaintenanceAction] = {
    val log = Seq.newBuilder[MaintenanceAction]
    indexes.foreach { idx =>
      def cycleIndex(): Unit = {
      val tables = idx.resolveTables.map(_(spark)).getOrElse(idx.tables)
      require(tables.map(_._1).distinct.size == tables.size,
        s"index ${idx.name} resolved duplicate table labels")
      tables.foreach { case (label, table, _) =>
        if (Warehouse.recoverIndex(spark, table))
          log += MaintenanceAction(idx.name, "recover", label)
      }
      // 1.2. concurrent-writer tripwire (versioned families): a
      // version carrying two STAGING publishes means a racing writer's
      // mutation was recorded but its staged tables were overwritten —
      // detect it every cycle, before trusting the freshness audit
      idx.ledger.foreach { case (lt, ln) =>
        val n = graft.operators.Snapshots.versionConflicts(spark, lt, ln)
          .count()
        log += MaintenanceAction(idx.name, "conflict_audit",
          s"conflicts=$n")
      }
      // 1.5. consume the delete-time capture feed (additive families):
      // every captured batch applies through the family's IDEMPOTENT
      // versioned delete, so a crash-before-prune replay is a ledger
      // no-op; applied batches are then pruned from the feed. Runs
      // before the freshness audit so the audit sees the
      // post-consumption state.
      idx.tombstones.foreach { feed =>
        if (spark.catalog.tableExists(feed.table)) {
          val bids = spark.table(feed.table)
            .select(col("batch_id")).distinct()
            .collect().map(_.getString(0)).sorted
          val pruneable = Seq.newBuilder[String]
          bids.foreach { bid =>
            val rows = spark.table(feed.table)
              .filter(col("batch_id") === bid).drop("batch_id")
            // applied through the family's idempotent versioned delete
            // BEFORE the freshness audit below, so the audit (and its
            // steady-state reuse as the closing row) sees the
            // post-consumption state
            if (feed.apply(spark, rows, bid)) {
              log += MaintenanceAction(idx.name, "delete_batch",
                s"batch=$bid")
              pruneable += bid
            } else if (feed.isApplied.exists(_(spark, bid))) {
              // genuine replay: applied in an earlier cycle, crashed
              // before prune — the ledger carries the id, safe to prune
              pruneable += bid
            } else {
              // apply no-opped AND the ledger does not confirm the
              // batch: pruning would discard the only rows that can
              // repair the index — keep the batch and surface it
              log += MaintenanceAction(idx.name, "delete_batch_stuck",
                s"batch=$bid")
            }
          }
          val toPrune = pruneable.result()
          if (feed.prune && toPrune.nonEmpty) {
            import spark.implicits._
            Warehouse.deleteFromIndex(spark, feed.table, "batch_id",
              toPrune.toDF("batch_id"))
          }
        }
      }
      // 2. freshness: cheap bucketed detect, exact repair only on need
      val c = idx.corpusKeys(spark).toDF("_k").distinct()
      val i = idx.indexKeys(spark).toDF("_k").distinct()
      val fresh = Warehouse
        .indexFreshnessAuditBucketed(Seq((idx.name, c, i))).head()
      val (nMissing, nStale) = (fresh.getLong(3), fresh.getLong(4))
      // BOTH repair frames are materialized up front (eager local
      // checkpoint, sized by what changed — not the corpus) from the
      // same pre-repair snapshot: the delete's table swap invalidates
      // any still-lazy plan over the old relation, and an
      // append/rewrite into the very table a frame's lineage reads
      // would be a self-insert the engine rejects
      val staleF = if (nStale > 0 && idx.deleteStale.isDefined)
        Some(i.join(c, Seq("_k"), "left_anti").localCheckpoint(true))
      else None
      val missingF = if (nMissing > 0 && idx.appendMissing.isDefined)
        Some(c.join(i, Seq("_k"), "left_anti").localCheckpoint(true))
      else None
      staleF.foreach { f =>
        idx.deleteStale.get(spark, f)
        log += MaintenanceAction(idx.name, "delete_stale", s"n=$nStale")
      }
      missingF.foreach { f =>
        idx.appendMissing.get(spark, f)
        log += MaintenanceAction(idx.name, "append_missing",
          s"n=$nMissing")
      }
      // 3. deep merge on partial-row growth
      val partialTargets = tables.filter(_._3.nonEmpty)
      if (partialTargets.nonEmpty && idx.merge.isDefined) {
        val worst = Warehouse.indexPartialAudit(spark, partialTargets)
          .collect().map(_.getDouble(3)).max
        if (worst > idx.mergeRowsPerKey) {
          idx.merge.foreach(_(spark))
          log += MaintenanceAction(idx.name, "merge",
            f"rows_per_key=$worst%.6f")
        }
      }
      // 4. layout compaction on file growth — over the tables the
      // family NOW resolves to (a versioned merge in step 3 published
      // a new snapshot; auditing the retired one would compact dead
      // data).
      val tablesNow =
        idx.resolveTables.map(_(spark)).getOrElse(idx.tables)
      val crossed = Warehouse.indexFileAudit(spark,
          tablesNow.map { case (label, table, _) => (label, table) })
        .collect().filter { r =>
          r.getLong(2) > idx.compactFilesFactor * math.max(r.getLong(1), 1L)
        }
      idx.compactFamily match {
        case Some(f) if crossed.nonEmpty =>
          // versioned families compact by PUBLISHING the next snapshot
          // — one staged write for the whole family, never an in-place
          // swap of the current version under in-flight readers
          f(spark)
          log += MaintenanceAction(idx.name, "compact",
            crossed.map(r => s"${r.getString(0)} files=${r.getLong(2)} " +
              s"buckets=${r.getLong(1)}").mkString("; "))
        case _ =>
          crossed.foreach { r =>
            val (label, buckets, files) =
              (r.getString(0), r.getLong(1), r.getLong(2))
            val table = tablesNow.find(_._1 == label).get._2
            Warehouse.compactIndex(spark, table)
            log += MaintenanceAction(idx.name, "compact",
              s"$label files=$files buckets=$buckets")
          }
      }
      // 5. retire snapshots past the grace window (versioned families):
      // the cycle's own publishes (tombstone deletes, merges, family
      // compactions) each grew the family by one full version; reclaim
      // everything <= current - keepVersions NOW — one cycle after the
      // publish, which is the in-flight readers' grace period — instead
      // of never (the pre-retire behavior: one index copy per mutation,
      // forever). Ledger rows stay; only physical tables drop.
      idx.ledger.zip(idx.retireBases).foreach { case ((lt, ln), bases) =>
        val dropped = graft.operators.Snapshots.retire(spark, lt, ln,
          bases, idx.keepVersions)
        if (dropped.nonEmpty)
          log += MaintenanceAction(idx.name, "retire",
            s"versions=${dropped.mkString(",")}")
      }
      // closing audit row: the log alone shows the cycle ended fresh.
      // Recomputed ONLY when a repair changed the key sets (delete /
      // append); merge and compact preserve served rows bit-identically
      // (their contracts), so after them — and in the steady state —
      // the opening audit is still exact and is reused, halving the
      // cycle's dominant cost (the corpus-side key scan) when nothing
      // needed repair.
      val post =
        if (staleF.isDefined || missingF.isDefined)
          Warehouse.indexFreshnessAuditBucketed(Seq((idx.name,
            idx.corpusKeys(spark).toDF("_k").distinct(),
            idx.indexKeys(spark).toDF("_k").distinct()))).head()
        else fresh
      log += MaintenanceAction(idx.name, "audit",
        s"missing=${post.getLong(3)} stale=${post.getLong(4)}")
      }
      // the whole pass — audits, repairs, publishes, retire — runs
      // under the family's writer lease when one is declared: a
      // concurrent cycle (or out-of-band mutator honoring the lease)
      // is denied before it stages anything, turning the tripwire's
      // after-the-fact detection into prevention. Denial = skip and
      // log; the holder is doing the same repairs, the next cycle
      // retries.
      idx.lease match {
        case Some(lt) =>
          try graft.operators.Snapshots.withLease(spark, lt, idx.name)(
            cycleIndex())
          catch {
            case d: graft.operators.Snapshots.LeaseDenied =>
              log += MaintenanceAction(idx.name, "lease_denied",
                s"holders=${d.holders.mkString(",")}")
          }
        case None => cycleIndex()
      }
    }
    log.result()
  }
}
