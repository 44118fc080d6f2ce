package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph ranking over co-occurrence structure mined from the landed
  * tables — PageRank on the item/brand co-purchase graph, the
  * "customers who bought X" centrality score every recommendation
  * report starts from. Expressed the way iterative graph algorithms
  * survive a warehouse engine: a FIXED number of unrolled join+agg
  * rounds over a dictionary-bounded edge list, with ALL arithmetic in
  * exact integer units so two engines running the same rounds land on
  * bit-identical ranks (float PageRank is order-dependent under
  * shuffle and never hash-matches).
  *
  * The corpus-scale work for EVERY operator here is one shared stage:
  * the basket collapse to the DISTINCT `(order, brand)` frame
  * ([[orderBrands]]) and the order-key self-join it feeds
  * ([[coPurchaseEdgesFrom]]). [[writeEdgeIndex]] persists that stage
  * once per corpus snapshot — the x91/x107/x124/x127 indexed-serving
  * pattern applied to the graph family — and every operator takes the
  * derived frames directly (`…From` variants), so a served graph query
  * reads dictionary-bounded tables and never rescans the corpus.
  */
object Graph {

  /** Mass unit: ranks are integers in units of 1e-9 of total mass. */
  val Unit: Long = 1000000000L

  /** Checkpoint cadence for the iterative operators: every this many
    * rounds, the per-round frame is lazily `localCheckpoint`ed so the
    * logical plan stays O(cadence) deep however many rounds run — the
    * unrolled join+agg chain otherwise grows the analyzed plan
    * exponentially in optimizer work (a rounds=20 million-node run
    * would spend longer planning than executing). Checkpointing is
    * lazy (no job at build time) and never applied to the RETURNED
    * frame, so results and output plans of short runs are untouched. */
  val CheckpointEvery: Int = 4

  /** THE SHARED BASKET COLLAPSE — the DISTINCT `(order_key, brand)`
    * frame every basket/graph operator starts from (x164/x188/x190/
    * x192/x196/x202 all open with exactly this stage). One corpus
    * scan, a broadcast dictionary join, and a (order, brand)-keyed
    * distinct; per-order width is bounded by the brand DICTIONARY
    * however many lines an order has — the reason none of the
    * downstream self-joins can blow up on a catalog axis. */
  def orderBrands(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("order_key"), col("l_partkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("order_key"), col("p_brand").as("brand"))
      .distinct()

  /** Per-brand distinct-order totals of an [[orderBrands]] frame —
    * `(brand, n_orders)`, dictionary-sized (broadcast by every
    * consumer). */
  def brandTotals(ob: DataFrame): DataFrame =
    ob.groupBy(col("brand")).agg(count(lit(1)).as("n_orders"))

  /** The 1-row stats frame the lift/support denominators need:
    * `n_baskets` = distinct orders IN the basket frame (the affinity
    * lift base), `n_orders` = distinct orders in the corpus (the
    * support base — equal when every line resolves to a brand, kept
    * separate so the oracles' two conventions both stay exact). */
  def basketStats(lineitem: DataFrame, ob: DataFrame): DataFrame =
    ob.agg(countDistinct(col("order_key")).as("n_baskets"))
      .crossJoin(broadcast(lineitem.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))))

  /** CO-PURCHASE EDGE LIST from an [[orderBrands]] frame — directed
    * both ways: for each unordered brand pair sharing an order,
    * `(src, dst, w)` with w = the number of co-occurring orders,
    * emitted in both directions (PageRank treats co-purchase as a
    * symmetric endorsement).
    *
    * Scale shape: the self-join on the order key is co-partitioned
    * and its per-order fanout is bounded by the brand DICTIONARY
    * (x164's law — ≤ B(B−1) ordered pairs per order however many
    * lines it has); the edge aggregate is dictionary²-bounded. */
  def coPurchaseEdgesFrom(ob: DataFrame): DataFrame = {
    val l = ob.select(col("order_key"), col("brand").as("src"))
    val r = ob.select(col("order_key"), col("brand").as("dst"))
    l.join(r, Seq("order_key"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** [[coPurchaseEdgesFrom]] over the corpus (builds the basket
    * collapse inline — [[writeEdgeIndex]] + [[readEdgeIndex]] is the
    * serving form that amortizes it). */
  def coPurchaseEdges(lineitem: DataFrame, part: DataFrame): DataFrame =
    coPurchaseEdgesFrom(orderBrands(lineitem, part))

  /** AFFINITY EDGE LIST from the index frames — [[coPurchaseEdgesFrom]]
    * cut to pairs whose co-occurrence exceeds independence (lift > 1,
    * decided as the exact integer cross-product `cb·N > cu1·cu2` —
    * x164's lift with no division): the co-purchase graph keeps every
    * pair two big brands share BY CHANCE; the affinity graph keeps
    * actual association structure, which is what community detection
    * ([[labelPropagation]]) and cohesion audits ([[triangleStats]])
    * are about. Still symmetric, still dictionary-bounded; the only
    * additions are the per-brand totals (dictionary-sized, broadcast)
    * and the 1-row stats frame. */
  def affinityEdgesFrom(edges: DataFrame, totals: DataFrame,
                        stats: DataFrame): DataFrame =
    edges
      .join(broadcast(totals.select(col("brand").as("src"),
        col("n_orders").as("_cu1"))), Seq("src"))
      .join(broadcast(totals.select(col("brand").as("dst"),
        col("n_orders").as("_cu2"))), Seq("dst"))
      .crossJoin(broadcast(stats.select(col("n_baskets").as("_nn"))))
      .filter(col("w").cast("decimal(38,0)") * col("_nn") >
        col("_cu1").cast("decimal(38,0)") * col("_cu2"))
      .select(col("src"), col("dst"), col("w"))

  /** [[affinityEdgesFrom]] over the corpus (one basket collapse feeds
    * the edges, the totals and the basket count — only the
    * denominator the lift cut needs, so the corpus plan carries no
    * extra aggregate). */
  def affinityEdges(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val ob = orderBrands(lineitem, part)
    affinityEdgesFrom(coPurchaseEdgesFrom(ob), brandTotals(ob),
      ob.agg(countDistinct(col("order_key")).as("n_baskets")))
  }

  /** Persist the CO-PURCHASE EDGE INDEX as catalog tables — the
    * x80/x91/x107/x124/x127 convention on the graph family's shared
    * stage: `obTable` holds the distinct `(order_key, brand)` basket
    * frame bucketed by order key (what triple mining re-joins on),
    * `edgesTable` the directed `(src, dst, w)` counts bucketed by src
    * (what PageRank/LPA/triangles/recs consume), `totalsTable` the
    * per-brand order counts and `statsTable` the 1-row denominators.
    * Built once per corpus snapshot; every `…From` operator then
    * serves with ZERO corpus scans ([[readEdgeIndex]]).
    *
    * Incremental maintenance ([[appendEdgeIndex]]) appends PARTIAL
    * frames: co-order counts are additive across disjoint order sets,
    * so the serving read merges partials with a dictionary-bounded
    * grouped sum. When ingest file counts warrant, compact with
    * [[Warehouse.compactIndex]]. */
  def writeEdgeIndex(lineitem: DataFrame, part: DataFrame,
                     obTable: String, edgesTable: String,
                     totalsTable: String, statsTable: String,
                     numBuckets: Int = 8): Unit =
    writeEdgePartials(lineitem, part, obTable, edgesTable, totalsTable,
      statsTable, numBuckets, append = false)

  /** Append one ingest batch to the edge index. PRECONDITIONS (the
    * additivity law): the batch carries COMPLETE orders (an order
    * split across batches would under-count its within-order pairs)
    * whose keys are DISJOINT from every prior ingest (a replayed
    * order would double-count). Each append writes partial counts;
    * [[readEdgeIndex]] merges them exactly. */
  def appendEdgeIndex(lineitem: DataFrame, part: DataFrame,
                      obTable: String, edgesTable: String,
                      totalsTable: String, statsTable: String,
                      numBuckets: Int = 8): Unit =
    writeEdgePartials(lineitem, part, obTable, edgesTable, totalsTable,
      statsTable, numBuckets, append = true)

  private def writeEdgePartials(lineitem: DataFrame, part: DataFrame,
                                obTable: String, edgesTable: String,
                                totalsTable: String, statsTable: String,
                                numBuckets: Int, append: Boolean): Unit = {
    val ob = orderBrands(lineitem, part)
    graft.sinks.Sinks.writeBucketed(ob, obTable, Seq("order_key"),
      numBuckets, append = append)
    graft.sinks.Sinks.writeBucketed(coPurchaseEdgesFrom(ob), edgesTable,
      Seq("src"), numBuckets, append = append)
    val mode = if (append) "append" else "overwrite"
    // dictionary / 1-row sidecars: single-file plain parquet tables
    brandTotals(ob).coalesce(1).write.mode(mode).format("parquet")
      .saveAsTable(totalsTable)
    basketStats(lineitem, ob).coalesce(1).write.mode(mode)
      .format("parquet").saveAsTable(statsTable)
  }

  /** Read the edge index back to serving frames, merging any append
    * partials with dictionary-bounded grouped sums (exact by the
    * [[appendEdgeIndex]] additivity law): returns
    * `(ob, edges, totals, stats)`. The merge aggregates are over
    * dictionary²-sized tables — trivial next to the corpus scan they
    * replace. Keys whose merged count is ZERO are dropped — they can
    * only arise from [[deleteFromEdgeIndex]]'s negated partials
    * cancelling an ingest exactly, and a from-scratch rebuild of the
    * post-delete corpus would not contain them. */
  def readEdgeIndex(spark: SparkSession, obTable: String,
                    edgesTable: String, totalsTable: String,
                    statsTable: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ob = spark.table(obTable)
    val edges = spark.table(edgesTable)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .filter(col("w") =!= 0)
    val totals = spark.table(totalsTable)
      .groupBy(col("brand")).agg(sum(col("n_orders")).as("n_orders"))
      .filter(col("n_orders") =!= 0)
    val stats = spark.table(statsTable)
      .agg(sum(col("n_baskets")).as("n_baskets"),
        sum(col("n_orders")).as("n_orders"))
    (ob, edges, totals, stats)
  }

  /** DELETE complete orders from the edge index — the takedown /
    * retention path ([[graft.operators.Warehouse.deleteFromIndex]]'s
    * contract for this ADDITIVE index, where edge rows are shared
    * partial COUNTS, not per-document rows an anti-join could
    * remove): because co-order counts are additive over disjoint
    * order sets, deleting orders is appending their NEGATED partial
    * frames — the same one-scan collapse as [[appendEdgeIndex]], with
    * every count sign-flipped — plus one anti-join rewrite of the
    * basket table (whose `(order, brand)` rows ARE per-order).
    * [[readEdgeIndex]]'s merge-sums then serve the post-delete corpus
    * exactly (keys cancelled to zero are dropped at read — rows
    * bit-identical to a from-scratch rebuild, spec-pinned), and the
    * next [[mergeEdgeIndex]] folds the tombstone rows away
    * physically.
    *
    * PRECONDITIONS mirror [[appendEdgeIndex]]'s additivity law:
    * `deletedLineitem` carries COMPLETE orders whose keys are
    * currently IN the index, each order deleted at most once (a
    * replay double-subtracts). The deleted orders' lineitem rows are
    * the input — a takedown flow has them (they are what's being
    * removed); the index itself is never rescanned beyond the basket
    * anti-join.
    *
    * PRODUCTION NOTE: this bootstrap form is fenced only by those
    * documented preconditions — a crash between its four table writes
    * leaves a half-applied delete, and a replay double-subtracts.
    * [[deleteFromEdgeIndexVersioned]] is the hardened form: same
    * semantics, staged next-snapshot writes, single-append commit,
    * applied-batch ledger. Use it anywhere crashes or replays are
    * reachable. */
  def deleteFromEdgeIndex(deletedLineitem: DataFrame, part: DataFrame,
                          obTable: String, edgesTable: String,
                          totalsTable: String, statsTable: String): Unit = {
    val spark = deletedLineitem.sparkSession
    Seq(obTable, edgesTable, totalsTable, statsTable)
      .foreach(Warehouse.recoverIndex(spark, _))
    val numBuckets = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(edgesTable))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(sys.error(s"$edgesTable is not bucketed"))
    val ob = orderBrands(deletedLineitem, part).cache()
    try {
      graft.sinks.Sinks.writeBucketed(
        coPurchaseEdgesFrom(ob).withColumn("w", -col("w")),
        edgesTable, Seq("src"), numBuckets, append = true)
      brandTotals(ob).withColumn("n_orders", -col("n_orders"))
        .coalesce(1).write.mode("append").format("parquet")
        .saveAsTable(totalsTable)
      basketStats(deletedLineitem, ob)
        .select((-col("n_baskets")).as("n_baskets"),
          (-col("n_orders")).as("n_orders"))
        .coalesce(1).write.mode("append").format("parquet")
        .saveAsTable(statsTable)
      Warehouse.deleteFromIndex(spark, obTable, "order_key",
        ob.select(col("order_key")).distinct())
    } finally { ob.unpersist(); () }
  }

  /** DEEP compaction of the edge index — merge the append PARTIALS
    * into one row per key, then land the canonical layout. Layout
    * compaction ([[Warehouse.compactIndex]]) bounds FILE counts but
    * leaves one partial row per (key, ingest): after 10k ingests the
    * edges table holds 10k × dictionary² rows and every serve's
    * merge-sum grows linearly with ingest count. This folds them —
    * the same grouped sums [[readEdgeIndex]] serves through, made
    * durable — so the table returns to the one-shot build's exact
    * rows (spec-pinned) and serve reads stop paying for ingest
    * history. The basket table's rows are already unique under the
    * disjoint-complete-orders law, so it only needs the layout pass.
    * Run on the same audit-driven cadence as layout compaction; the
    * tmp-snapshot hop and provider/bucket-spec preservation follow
    * [[Warehouse.compactIndex]]'s contract. */
  def mergeEdgeIndex(spark: SparkSession, obTable: String,
                     edgesTable: String, totalsTable: String,
                     statsTable: String): Unit = {
    Seq(obTable, edgesTable, totalsTable, statsTable)
      .foreach(Warehouse.recoverIndex(spark, _))
    val (_, edges, totals, stats) = readEdgeIndex(spark, obTable,
      edgesTable, totalsTable, statsTable)
    // the merged frame scans the LIVE table, so it lands in the
    // crash-safe _compact_new side table and swaps in metadata-only
    // (the Warehouse.swapIn / recoverIndex contract) — no window where
    // the live index holds partial data
    def rewrite(df: DataFrame, table: String): Unit = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      val fmt = meta.provider.getOrElse("parquet")
      Warehouse.swapIn(spark, table) { newT =>
        meta.bucketSpec match {
          case Some(bs) =>
            graft.sinks.Sinks.writeBucketed(df, newT,
              bs.bucketColumnNames, bs.numBuckets, bs.sortColumnNames,
              format = fmt)
          case None =>
            df.coalesce(1).write.format(fmt).saveAsTable(newT)
        }
      }
    }
    rewrite(edges, edgesTable)
    rewrite(totals, totalsTable)
    rewrite(stats, statsTable)
    Warehouse.compactIndex(spark, obTable)
  }

  /** THE VERSIONED EDGE-INDEX PROTOCOL — the [[Snapshots]]
    * publish-by-pointer form of the family, and the fix for the two
    * hazards the unversioned [[deleteFromEdgeIndex]] documents but
    * cannot close: a crash between its four table writes leaves a
    * HALF-APPLIED delete serving silently wrong counts, and a replayed
    * delete — the natural post-crash recovery — double-subtracts
    * (served as NEGATIVE weights, since [[readEdgeIndex]] only drops
    * keys cancelled to exactly zero). Here every mutation stages the
    * ENTIRE next version's four tables (overwrite-idempotent), then
    * commits with ONE ledger-row append; the applied-batch id makes
    * replays logged no-ops, and readers that resolved the old version
    * keep a complete snapshot until [[Snapshots.retire]]. The
    * reference contract being restored is its sink's idempotent PK
    * upsert (SURVEY §2.2) — at-least-once delivery with
    * exactly-once effects. */
  def writeEdgeIndexVersioned(lineitem: DataFrame, part: DataFrame,
                              ledgerTable: String, indexName: String,
                              obBase: String, edgesBase: String,
                              totalsBase: String, statsBase: String,
                              numBuckets: Int = 8,
                              batchId: Option[String] = None): Boolean = {
    val spark = lineitem.sparkSession
    // Callers that may RE-REACH the bootstrap (a streaming replay of
    // micro-batch 0 after a crash between its publish and the stream
    // checkpoint commit) pass their own deterministic id so the replay
    // short-circuits here instead of falling through to the append path
    // and double-counting.
    val bid = batchId.getOrElse("bootstrap")
    if (Snapshots.isApplied(spark, ledgerTable, indexName, bid)) false
    else {
      val next = Snapshots.currentVersion(spark, ledgerTable, indexName) + 1
      val Seq(ob, ed, tot, st) =
        Seq(obBase, edgesBase, totalsBase, statsBase)
          .map(Snapshots.tableAt(_, next))
      Seq(ob, ed, tot, st).foreach(graft.sinks.Sinks.dropManaged(spark, _))
      writeEdgeIndex(lineitem, part, ob, ed, tot, st, numBuckets)
      Snapshots.publish(spark, ledgerTable, indexName, next, bid, "build")
      true
    }
  }

  /** Current-version physical names of a versioned edge index —
    * `(ob, edges, totals, stats)`. */
  def resolveEdgeIndex(spark: SparkSession, ledgerTable: String,
                       indexName: String, obBase: String,
                       edgesBase: String, totalsBase: String,
                       statsBase: String)
      : (String, String, String, String) = {
    val Seq(ob, ed, tot, st) = Snapshots.resolve(spark, ledgerTable,
      indexName, Seq(obBase, edgesBase, totalsBase, statsBase))
    (ob, ed, tot, st)
  }

  /** [[readEdgeIndex]] through the snapshot pointer: the serving read
    * of a versioned family. The resolution happens ONCE per query
    * build — a publish between resolution and execution leaves this
    * reader on its complete old snapshot (publish drops nothing),
    * which is the whole point of the protocol. */
  def readEdgeIndexVersioned(spark: SparkSession, ledgerTable: String,
                             indexName: String, obBase: String,
                             edgesBase: String, totalsBase: String,
                             statsBase: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (ob, ed, tot, st) = resolveEdgeIndex(spark, ledgerTable,
      indexName, obBase, edgesBase, totalsBase, statsBase)
    readEdgeIndex(spark, ob, ed, tot, st)
  }

  /** [[appendEdgeIndex]] with the applied-batch guard: a replayed
    * ingest batch (same complete-order key set → same
    * [[Snapshots.batchIdFor]] id) is a logged no-op instead of a
    * double-count — the additivity law's "each order ingested at most
    * once" precondition enforced by the ledger rather than assumed.
    * The partial files append into the CURRENT version's tables (no
    * version bump — appends are what the read-side merge exists for);
    * the ledger row lands after them, so the one remaining crash
    * window (between the last table append and the publish) replays
    * at-least-once. Closing that window entirely needs the staged
    * next-version write ([[deleteFromEdgeIndexVersioned]]'s shape) —
    * the streaming ingest path instead dedupes batches by checkpoint
    * id, which is the production answer for high-cadence appends. */
  def appendEdgeIndexVersioned(lineitem: DataFrame, part: DataFrame,
                               ledgerTable: String, indexName: String,
                               obBase: String, edgesBase: String,
                               totalsBase: String, statsBase: String,
                               batchId: Option[String] = None): Boolean = {
    val spark = lineitem.sparkSession
    val bid = batchId.getOrElse(
      Snapshots.batchIdFor(lineitem.select(col("l_orderkey"))))
    if (Snapshots.isApplied(spark, ledgerTable, indexName, bid)) false
    else {
      val cur = Snapshots.currentVersion(spark, ledgerTable, indexName)
      val (ob, ed, tot, st) = resolveEdgeIndex(spark, ledgerTable,
        indexName, obBase, edgesBase, totalsBase, statsBase)
      val numBuckets = spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(ed))
        .bucketSpec.map(_.numBuckets)
        .getOrElse(sys.error(s"$ed is not bucketed"))
      appendEdgeIndex(lineitem, part, ob, ed, tot, st, numBuckets)
      Snapshots.publish(spark, ledgerTable, indexName, cur, bid, "append")
      true
    }
  }

  /** [[appendEdgeIndexVersioned]]'s FULLY-STAGED form — the append
    * with NO residual crash window: the post-append state of all four
    * tables is staged as the next snapshot (additive tables deep-merged
    * with the batch's partials — current rows ∪ new partials,
    * grouped-summed, bit-identical to rebuilding the grown corpus —
    * the basket table as its union) and the pointer flips with ONE
    * ledger append. A crash ANYWHERE before the publish leaves the
    * current version serving and the rerun re-stages bit-identically;
    * a replay after it no-ops on the batch id. The price is rewriting
    * the index per append (the delete's cost model), which is the
    * right trade for low-cadence batch ingests and the wrong one for
    * high-cadence streams — [[appendEdgeIndexVersioned]]'s partial-file
    * append (tiny window, documented) serves those. `crashAfterStep`
    * is the kill-injection hook for the step-boundary spec. */
  def appendEdgeIndexVersionedStaged(lineitem: DataFrame, part: DataFrame,
                                     ledgerTable: String, indexName: String,
                                     obBase: String, edgesBase: String,
                                     totalsBase: String, statsBase: String,
                                     batchId: Option[String] = None,
                                     crashAfterStep: Option[String] = None)
      : Boolean = {
    val spark = lineitem.sparkSession
    def step(s: String): Unit =
      if (crashAfterStep.contains(s))
        throw new IllegalStateException(s"injected crash after step $s")
    val bid = batchId.getOrElse(
      Snapshots.batchIdFor(lineitem.select(col("l_orderkey"))))
    if (Snapshots.isApplied(spark, ledgerTable, indexName, bid)) false
    else {
      val cur = Snapshots.currentVersion(spark, ledgerTable, indexName)
      val next = cur + 1
      val (obC, edC, totC, stC) = resolveEdgeIndex(spark, ledgerTable,
        indexName, obBase, edgesBase, totalsBase, statsBase)
      val Seq(obN, edN, totN, stN) =
        Seq(obBase, edgesBase, totalsBase, statsBase)
          .map(Snapshots.tableAt(_, next))
      val ob = orderBrands(lineitem, part).cache()
      try {
        val newEdges = spark.table(edC)
          .unionByName(coPurchaseEdgesFrom(ob))
          .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
          .filter(col("w") =!= 0)
        Warehouse.writeLike(spark, edC, newEdges, edN)
        step("edges")
        val newTotals = spark.table(totC)
          .unionByName(brandTotals(ob))
          .groupBy(col("brand")).agg(sum(col("n_orders")).as("n_orders"))
          .filter(col("n_orders") =!= 0)
        Warehouse.writeLike(spark, totC, newTotals, totN)
        step("totals")
        val newStats = spark.table(stC)
          .unionByName(basketStats(lineitem, ob))
          .agg(sum(col("n_baskets")).as("n_baskets"),
            sum(col("n_orders")).as("n_orders"))
        Warehouse.writeLike(spark, stC, newStats, stN)
        step("stats")
        val newOb = spark.table(obC).unionByName(ob)
        Warehouse.writeLike(spark, obC, newOb, obN)
        step("ob")
        Snapshots.publish(spark, ledgerTable, indexName, next, bid,
          "append-staged")
        step("publish")
        true
      } finally { ob.unpersist(); () }
    }
  }

  /** CRASH-ATOMIC, IDEMPOTENT edge-index delete — the versioned form
    * of [[deleteFromEdgeIndex]], closing its two documented hazards:
    *
    *  1. ATOMIC: the post-delete state of ALL FOUR tables is staged as
    *     the next snapshot first — the additive tables as their fully
    *     MERGED post-delete rows (current rows ∪ negated partials,
    *     grouped-summed, zero-cancelled keys dropped: bit-identical to
    *     a from-scratch rebuild of the reduced corpus, the
    *     [[mergeEdgeIndex]] law composed with the delete), the basket
    *     table as its anti-join survivors — and the pointer flips with
    *     ONE ledger append. A crash at ANY earlier point leaves the
    *     current version serving, complete and untouched.
    *  2. IDEMPOTENT: the batch id (deterministic digest of the deleted
    *     order-key set) is checked before any work; a replay returns
    *     false and changes nothing. Reruns of a CRASHED attempt
    *     rebuild the same staged tables via overwrite and re-reach the
    *     same commit point.
    *
    * Preconditions inherit [[appendEdgeIndex]]'s additivity law
    * (complete orders, currently in the index); "each order deleted at
    * most once" is now enforced by the ledger, not assumed.
    *
    * ALIASING CAVEAT (the default id): a recomputed content-derived id
    * cannot distinguish a replay from a legitimate SECOND deletion of
    * a re-ingested key set — and cannot be version-salted here, since
    * the first apply bumps the version and a post-crash rerun would
    * then derive a fresh id and double-subtract (the
    * [[Snapshots.batchIdFor(keys:*,epoch:*)]] scaladoc carries the
    * argument). Routes that re-delete re-ingested keys (retention
    * sweeps, repeat takedowns) must therefore capture the id ONCE at
    * mutation creation and pass it as `batchId` — which is exactly
    * what the tombstone feed does
    * ([[Warehouse.deleteFromLandingWithCapture]] with its `ledger`
    * epoch salt). The caveat is ENFORCED, not just documented
    * (round 18): a recomputed id that hits the ledger while its keys
    * are still in the served snapshot throws
    * [[Snapshots.AliasedBatchId]] instead of silently no-opping —
    * the two readings of that state (legitimate repeat delete vs
    * replay racing a re-ingest) are undecidable here and both
    * misread directions corrupt; genuine replays (keys gone) still
    * return false.
    * `crashAfterStep` is the kill-injection hook for the
    * step-boundary spec (GraphSpec) — production callers leave it
    * None. Returns false when the batch was already applied. */
  def deleteFromEdgeIndexVersioned(deletedLineitem: DataFrame,
                                   part: DataFrame, ledgerTable: String,
                                   indexName: String, obBase: String,
                                   edgesBase: String, totalsBase: String,
                                   statsBase: String,
                                   batchId: Option[String] = None,
                                   crashAfterStep: Option[String] = None)
      : Boolean = {
    val spark = deletedLineitem.sparkSession
    def step(s: String): Unit =
      if (crashAfterStep.contains(s))
        throw new IllegalStateException(s"injected crash after step $s")
    val bid = batchId.getOrElse(
      Snapshots.batchIdFor(deletedLineitem.select(col("l_orderkey"))))
    if (Snapshots.isApplied(spark, ledgerTable, indexName, bid)) {
      // ALIAS GUARD (recomputed ids only — a captured id carries its
      // epoch salt and decides this itself): an applied id whose keys
      // are STILL in the snapshot is either a legitimate repeat delete
      // of re-ingested keys or a replay racing that re-ingest —
      // undecidable here, so fail loudly instead of silently no-opping
      // an index into permanent staleness. Genuine replays (keys gone)
      // keep returning false.
      if (batchId.isEmpty) {
        val (obC, _, _, _) = resolveEdgeIndex(spark, ledgerTable,
          indexName, obBase, edgesBase, totalsBase, statsBase)
        val present = !spark.table(obC).join(
          deletedLineitem.select(col("l_orderkey").as("order_key"))
            .distinct(), Seq("order_key"), "left_semi").isEmpty
        if (present) throw Snapshots.AliasedBatchId(indexName, bid)
      }
      false
    } else {
      val cur = Snapshots.currentVersion(spark, ledgerTable, indexName)
      val next = cur + 1
      val (obC, edC, totC, stC) = resolveEdgeIndex(spark, ledgerTable,
        indexName, obBase, edgesBase, totalsBase, statsBase)
      val Seq(obN, edN, totN, stN) =
        Seq(obBase, edgesBase, totalsBase, statsBase)
          .map(Snapshots.tableAt(_, next))
      val ob = orderBrands(deletedLineitem, part).cache()
      try {
        val newEdges = spark.table(edC)
          .unionByName(coPurchaseEdgesFrom(ob).withColumn("w", -col("w")))
          .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
          .filter(col("w") =!= 0)
        Warehouse.writeLike(spark, edC, newEdges, edN)
        step("edges")
        val newTotals = spark.table(totC)
          .unionByName(brandTotals(ob)
            .withColumn("n_orders", -col("n_orders")))
          .groupBy(col("brand")).agg(sum(col("n_orders")).as("n_orders"))
          .filter(col("n_orders") =!= 0)
        Warehouse.writeLike(spark, totC, newTotals, totN)
        step("totals")
        val newStats = spark.table(stC)
          .unionByName(basketStats(deletedLineitem, ob)
            .select((-col("n_baskets")).as("n_baskets"),
              (-col("n_orders")).as("n_orders")))
          .agg(sum(col("n_baskets")).as("n_baskets"),
            sum(col("n_orders")).as("n_orders"))
        Warehouse.writeLike(spark, stC, newStats, stN)
        step("stats")
        val newOb = spark.table(obC)
          .join(ob.select(col("order_key")).distinct(), Seq("order_key"),
            "left_anti")
        Warehouse.writeLike(spark, obC, newOb, obN)
        step("ob")
        Snapshots.publish(spark, ledgerTable, indexName, next, bid,
          "delete")
        step("publish")
        true
      } finally { ob.unpersist(); () }
    }
  }

  /** [[mergeEdgeIndex]] through the snapshot pointer: the merged
    * (one-row-per-key, one-file-per-bucket) copy becomes the next
    * version — deep merge AND layout compaction in one staged write,
    * with no drop/rename racing an in-flight reader. Guarded by a
    * per-version batch id so a crashed merge's rerun re-stages and a
    * completed one's rerun is a no-op. Callers replayed from OUTSIDE
    * the version counter (a streaming epoch re-delivered after its
    * merge already bumped the version) pass their own deterministic
    * `batchId` so the replay no-ops instead of staging a redundant —
    * if bit-identical — extra snapshot. */
  def mergeEdgeIndexVersioned(spark: SparkSession, ledgerTable: String,
                              indexName: String, obBase: String,
                              edgesBase: String, totalsBase: String,
                              statsBase: String,
                              batchId: Option[String] = None): Boolean = {
    val cur = Snapshots.currentVersion(spark, ledgerTable, indexName)
    val next = cur + 1
    val bid = batchId.getOrElse(s"merge-v$next")
    if (Snapshots.isApplied(spark, ledgerTable, indexName, bid)) false
    else {
      val (obC, edC, totC, stC) = resolveEdgeIndex(spark, ledgerTable,
        indexName, obBase, edgesBase, totalsBase, statsBase)
      val (obF, edges, totals, stats) =
        readEdgeIndex(spark, obC, edC, totC, stC)
      Warehouse.writeLike(spark, edC, edges,
        Snapshots.tableAt(edgesBase, next))
      Warehouse.writeLike(spark, totC, totals,
        Snapshots.tableAt(totalsBase, next))
      Warehouse.writeLike(spark, stC, stats,
        Snapshots.tableAt(statsBase, next))
      Warehouse.writeLike(spark, obC, obF,
        Snapshots.tableAt(obBase, next))
      Snapshots.publish(spark, ledgerTable, indexName, next, bid, "merge")
      true
    }
  }

  /** Lazy per-round lineage cut for the iterative operators: marks the
    * frame for a local checkpoint (no job now; materialized on first
    * downstream action) so the SQL plan under it collapses to one
    * leaf. Applied every [[CheckpointEvery]] rounds, never to the
    * final frame. */
  private def roundCheckpoint(df: DataFrame, round: Int,
                              rounds: Int): DataFrame =
    if (round % CheckpointEvery == 0 && round < rounds)
      df.localCheckpoint(false)
    else df

  /** DETERMINISTIC LABEL PROPAGATION (x190) — synchronous LPA
    * (Raghavan et al. 2007) made engine-exact: every node starts as
    * its own label; each round, a node adopts the label whose
    * incoming edge-weight sum is largest, ties broken by the
    * SMALLEST label — so the community assignment after a fixed
    * number of rounds is a pure function of the edge list,
    * hash-checkable across engines (stock LPA breaks ties randomly
    * and never is). Communities read off the brand affinity graph
    * are the "bought-together families" a merchandising report
    * wants below PageRank's one-number centrality.
    *
    * Scale shape: per round, one join of the edge list to the
    * (node, label) frame and one (node, label)-keyed aggregate —
    * both dictionary-bounded here, both plain key exchanges at
    * million-node scale; the argmax is `min(struct(-w, label))`
    * (one aggregate, no window). Nodes with no in-edges keep their
    * label via the left join (cannot occur in a symmetric list —
    * same precondition as [[pageRank]]). Every [[CheckpointEvery]]
    * rounds the label frame's lineage is cut (lazy local checkpoint)
    * so plan depth stays O(1) per round at any `rounds`. */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var lbl = lpaInit(edges)
    for (i <- 1 to rounds) {
      lbl = roundCheckpoint(lpaRound(edges, lbl), i, rounds)
    }
    lbl
  }

  /** Every node its own label — the round-0 frame both LPA forms
    * start from. */
  private def lpaInit(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .withColumn("label", col("node"))

  /** ONE synchronous LPA round — the exact update both
    * [[labelPropagation]] and [[labelPropagationAdaptive]] unroll
    * (weight-argmax, ties to the smallest label, no-in-edge nodes
    * keep theirs). */
  private def lpaRound(edges: DataFrame, lbl: DataFrame): DataFrame = {
    val next = edges
      .join(lbl.select(col("node").as("src"), col("label").as("_l")),
        Seq("src"))
      .groupBy(col("dst").as("node"), col("_l"))
      .agg(sum(col("w")).as("_w"))
      .groupBy(col("node"))
      .agg(min(struct((-col("_w")).as("nw"), col("_l").as("l")))
        .as("_m"))
      .select(col("node"), col("_m.l").as("_nl"))
    lbl.join(next, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("_nl"), col("label")).as("label"))
  }

  /** ADAPTIVE-ROUNDS LABEL PROPAGATION — [[labelPropagation]] run to
    * its FIXED POINT: stop at the first round that changes no label
    * (every later round is then identical by induction, so the result
    * equals the fixed form at ANY round count ≥ the stop round —
    * spec-pinned), bounded by `maxRounds` because synchronous LPA can
    * oscillate on label-bipartite structures and a production driver
    * loop must terminate either way. Deterministic for the same reason
    * the fixed form is: the update is the same [[lpaRound]], exact
    * weights, smallest-label ties. The [[pageRankAdaptive]] cost
    * model: one node-bounded materialization + a 1-row changed-count
    * aggregate per round, plan depth O(1) via the eager checkpoint. */
  def labelPropagationAdaptive(edges: DataFrame,
                               maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var lbl = lpaInit(edges).localCheckpoint(true)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = lpaRound(edges, lbl).localCheckpoint(true)
      val changed = next
        .join(lbl.select(col("node"), col("label").as("_prev")),
          Seq("node"))
        .filter(col("label") =!= col("_prev"))
        .count()
      lbl = next
      round += 1
      converged = changed == 0L
    }
    lbl
  }

  /** TRIANGLE COUNTS + CLUSTERING COEFFICIENT (x192) — per node:
    * degree, the number of triangles through it, and the local
    * clustering coefficient `2t / (d(d−1))` on the 1e-6 grid (NULL
    * below degree 2 — no pair of neighbors to close). The cohesion
    * audit behind [[labelPropagation]]'s communities: high
    * coefficient = the node's neighbors buy together too (a real
    * family), low = a hub bridging otherwise-unrelated brands.
    * Degree and triangles both derive from the DEDUPED symmetric
    * edge set, so a multigraph input (duplicate (src, dst) rows)
    * cannot skew the coefficient.
    *
    * Scale shape: triangles enumerate ORIENTED — the symmetric list
    * collapses to one directed edge per unordered pair under a TOTAL
    * order on nodes, wedges extend only upward, and each triangle is
    * produced exactly once by construction (no count-then-divide).
    * Both joins are equi-joins of the oriented edge list with itself.
    * `orientBy = "id"` orders nodes by id; `orientBy = "degree"`
    * orders by (degree, id) — the standard skew refinement: pointing
    * every edge at the higher-degree endpoint bounds wedge fanout by
    * √|E| on power-law graphs (the hub stops being a wedge source),
    * same plan, same output, different orientation key. Here every
    * frame is dictionary-bounded and id order suffices. */
  def triangleStats(edges: DataFrame,
                    orientBy: String = "id"): DataFrame = {
    require(orientBy == "id" || orientBy == "degree",
      s"orientBy must be 'id' or 'degree', got '$orientBy'")
    val sym = edges.select(col("src"), col("dst")).distinct()
    val degree = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
    val und = orientBy match {
      case "id" =>
        sym.filter(col("src") < col("dst"))
          .select(col("src").as("a"), col("dst").as("b"))
      case "degree" =>
        sym
          .join(degree.select(col("node").as("src"),
            col("degree").as("_ds")), Seq("src"))
          .join(degree.select(col("node").as("dst"),
            col("degree").as("_dd")), Seq("dst"))
          .filter(col("_ds") < col("_dd") ||
            (col("_ds") === col("_dd") && col("src") < col("dst")))
          .select(col("src").as("a"), col("dst").as("b"))
    }
    val wedges = und
      .join(und.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    val tris = wedges.join(
      und.select(col("a"), col("b").as("c"), lit(1).as("_hit")),
      Seq("a", "c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    degree.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2, graft.functions.Num.fpRound(
          lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - lit(1))).cast("double"),
          6)).as("clustering_coeff"))
  }

  /** EXACT-INTEGER PAGERANK (x188) — `iterations` unrolled rounds of
    * `pr'(i) = (1−d)/N + d·Σ_{j→i} pr(j)·w(j,i)/outw(j)` with
    * d = 0.85, over an edge list `(src, dst, w)`; every quantity is
    * an integer count of [[Unit]]-ths of the total mass and every
    * division is FLOOR division of exact integers, so the fixed
    * point of the computation — not just its limit — is engine-
    * independent and hash-checkable. Each floor loses < 1 unit
    * (≤ 1e-9 of mass) per term per round: deterministic, identical
    * on both sides, and irrelevant at report precision.
    *
    * Per-edge SHARES are precomputed once —
    * `share = w·Unit div outw(src)` — so the per-round work is one
    * join + one aggregate with NO division by a second frame's
    * column inside the round; `pr·share` then fits a BIGINT by
    * construction (both factors ≤ Unit = 1e9). The share
    * computation itself rides DECIMAL(38,0) so corpus-scale edge
    * weights cannot overflow before the div.
    *
    * Scale shape: the edge/share/node frames are bounded by the
    * node dictionary (brands: ≤ B² rows) and broadcast through each
    * round; the only corpus-scale work is whatever bounded
    * aggregate built the edges ([[coPurchaseEdges]] — or nothing at
    * serve time, via [[readEdgeIndex]]). For million-node graphs the
    * same plan holds with the joins shuffling on node keys instead
    * of broadcasting — the rounds are still linear in |E|, and every
    * [[CheckpointEvery]] rounds the rank frame's lineage is cut
    * (lazy local checkpoint) so plan depth stays O(1) per round at
    * any `iterations`. Nodes with no in-edges keep the teleport base
    * (the LEFT join); nodes with no out-edges cannot occur in a
    * symmetric edge list (documented precondition —
    * [[coPurchaseEdges]] emits both directions). */
  /** The per-edge share and per-node base frames every PageRank
    * variant starts from (see [[pageRank]]'s contract): `shares` =
    * `(src, dst, w·Unit div outw(src))`, `base` = `(node, _base,
    * _pr0)`. */
  private def prFrames(edges: DataFrame): (DataFrame, DataFrame) = {
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("_outw"))
    val shares = edges.join(outw, Seq("src"))
      .select(col("src"), col("dst"),
        expr(s"CAST(w AS DECIMAL(38,0)) * ${Unit}L div _outw").as("share"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val cnt = nodes.agg(count(lit(1)).as("_nn"))
    val base = nodes.crossJoin(broadcast(cnt))
      .select(col("node"), expr(s"(15 * ${Unit}L) div (100 * _nn)")
        .as("_base"), expr(s"${Unit}L div _nn").as("_pr0"))
    (shares, base)
  }

  /** ONE PageRank round — the exact integer update both [[pageRank]]
    * and [[pageRankAdaptive]] unroll, so their fixed points are
    * bit-identical by construction. */
  private def prRound(shares: DataFrame, base: DataFrame,
                      pr: DataFrame): DataFrame = {
    val acc = shares
      .join(pr.select(col("node").as("src"), col("pr_units")), Seq("src"))
      .select(col("dst").as("node"),
        expr(s"(pr_units * share) div ${Unit}L").as("_c"))
      .groupBy(col("node")).agg(sum(col("_c")).as("_acc"))
    base.join(acc, Seq("node"), "left")
      .select(col("node"),
        expr("_base + (85 * coalesce(_acc, 0L)) div 100").as("pr_units"))
  }

  def pageRank(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val (shares, base) = prFrames(edges)
    var pr = base.select(col("node"), col("_pr0").as("pr_units"))
    for (i <- 1 to iterations) {
      pr = roundCheckpoint(prRound(shares, base, pr), i, iterations)
    }
    pr
  }

  /** ADAPTIVE-ROUNDS PAGERANK — [[pageRank]] with integer-delta early
    * stop, the production form [[pageRankConvergence]] measures after
    * the fact: run up to `maxRounds` rounds, stop at the first whose
    * L1 delta (in [[Unit]]-ths of total mass) is ≤ `tolUnits`. Because
    * every quantity is an exact integer and the round update is the
    * SAME [[prRound]] the fixed form unrolls, the stop round is a pure
    * function of the edge list — deterministic across runs and engines
    * — and the returned ranks equal `pageRank(edges, stopRound)`
    * bit-for-bit (spec-pinned). Keep the fixed form as the hash-exact
    * default where round count is part of the contract (the oracle
    * queries); use this where convergence is (production scoring at
    * unknown graph shapes).
    *
    * Scale shape: per round, [[pageRank]]'s join + aggregate PLUS one
    * node-bounded action (the rank frame materializes via an eager
    * local checkpoint — which also keeps plan depth O(1) per round,
    * subsuming the fixed form's [[CheckpointEvery]] cadence) and a
    * 1-row delta aggregate. Convergence detection costs one pass over
    * the node frame per round — the standard price of an iterate-
    * until-converged driver loop. */
  def pageRankAdaptive(edges: DataFrame, maxRounds: Int = 20,
                       tolUnits: Long = 1000L): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(tolUnits >= 0, s"tolUnits must be >= 0, got $tolUnits")
    val (shares, base) = prFrames(edges)
    var pr = base.select(col("node"), col("_pr0").as("pr_units"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = prRound(shares, base, pr).localCheckpoint(true)
      val delta = next
        .join(pr.select(col("node"), col("pr_units").as("_prev")),
          Seq("node"))
        .agg(coalesce(sum(abs(col("pr_units") - col("_prev"))), lit(0L)))
        .head().getLong(0)
      pr = next
      round += 1
      converged = delta <= tolUnits
    }
    pr
  }

  /** PAGERANK CONVERGENCE AUDIT (x212) — the acceptance metric for
    * [[pageRank]]'s fixed round count: the integer L1 and max deltas
    * between the last two rounds' rank vectors, over the node count.
    * The unrolled-rounds design trades convergence detection for
    * engine-exactness, so this is the report that says whether the
    * trade held — `l1_delta_units` is in [[Unit]]-ths of total mass
    * (a value of 1e6 = 0.1% of the mass still moving; rounds were too
    * few), the same role x128's recall@k plays for the ANN tier and
    * x122's distortion for PQ. Both rank vectors are exact integers,
    * so the audit is hash-stable like the ranks themselves.
    *
    * Scale shape: two [[pageRank]] runs (rounds-1 and rounds) over
    * the same dictionary-bounded frames — the shared share/base
    * subtrees are identical and exchange-reused; one node-keyed join
    * + a 1-row aggregate close it. Serve from the persisted edge
    * index and the corpus is never touched. */
  def pageRankConvergence(edges: DataFrame,
                          iterations: Int = 3): DataFrame = {
    require(iterations >= 2,
      s"iterations must be >= 2 to measure a delta, got $iterations")
    val prev = pageRank(edges, iterations - 1)
      .select(col("node"), col("pr_units").as("_prev"))
    pageRank(edges, iterations).join(prev, Seq("node"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(abs(col("pr_units") - col("_prev"))).as("l1_delta_units"),
        max(abs(col("pr_units") - col("_prev"))).as("max_delta_units"))
  }
}
