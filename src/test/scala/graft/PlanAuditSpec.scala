package graft

import graft.queries.ReferenceQueries

/** Plan-shape audits: the SCALING.md claims, asserted against actual
  * physical plans so regressions show up in CI, not in a cluster. */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q2 watermark predicate reaches the parquet scan (NanosPushdown)") {
    val p = plan("q2_watermark_scan")
    assert(p.contains("PushedFilters"))
    // Two testdata flavors: TIMESTAMP(NANOS) fixtures go through the
    // NanosPushdown rewrite (>= on the raw long); plain-micros fixtures
    // push the strict > natively. Either way the RANGE predicate — not
    // just IsNotNull — must reach the scan.
    assert(p.contains("GreaterThanOrEqual(ts") || p.contains("GreaterThan(ts"),
      s"watermark range predicate not pushed:\n$p")
  }

  test("q2 pushdown rewrite preserves semantics vs unoptimized filter") {
    import org.apache.spark.sql.functions._
    val events = Tables(spark, sfDir, "events")
    val optimized = ReferenceQueries.queries("q2_watermark_scan")(spark, sfDir)
      .count()
    // baseline: block the rewrite by hiding the literal behind an exclusive
    // strictly-greater comparison computed post-hoc
    // cast: unix_micros rejects TIMESTAMP_NTZ (micros-flavor fixtures);
    // UTC session makes the cast epoch-identity
    val baseline = events.filter(
      unix_micros(col("ts").cast("timestamp")) > unix_micros(
        to_timestamp(lit(ReferenceQueries.Bookmark)))).count()
    assert(optimized == baseline)
  }

  test("q5 projection prunes the scan to declared columns") {
    val p = plan("q5_schema_project")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"),
      s"scan not pruned:\n$p")
  }

  test("x17 plans TakeOrderedAndProject (no global sort)") {
    assert(plan("x17_top_customers").contains("TakeOrderedAndProject"))
  }

  test("x3 top-k plans partial WindowGroupLimit before the exchange") {
    val p = plan("x3_topk_similarity")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"no partial per-partition top-k:\n$p")
  }

  test("x6 star join broadcasts the dimension tables") {
    val p = plan("x6_star_join")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q13 sessionize reuses one exchange across windows and group-by") {
    val p = plan("q13_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("x29 range join broadcasts the band dim (fact side never shuffles)") {
    val p = plan("x29_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"band join should be broadcast nested-loop:\n$p")
    // only the final 4-group aggregate exchanges; the events scan doesn't
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange (final agg):\n$p")
  }

  test("x30 grouped top-k plans partial WindowGroupLimit before exchange") {
    val p = plan("x30_grouped_topk")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"no partial per-partition top-k:\n$p")
  }

  test("x27 pivot is a single hash aggregate (no per-category scans)") {
    val p = plan("x27_pivot_daily")
    assert("HashAggregate".r.findAllIn(p).size == 2, // partial + final
      s"pivot should be one partial+final aggregate pair:\n$p")
    assert("FileScan".r.findAllIn(p).size +
      "BatchScan".r.findAllIn(p).size == 1,
      s"pivot should scan events exactly once:\n$p")
  }

  test("x28 unpivot is a narrow generator (zero exchanges)") {
    val p = plan("x28_unpivot_measures")
    assert(!p.contains("Exchange"), s"unpivot should not shuffle:\n$p")
  }

  test("x2/x8 shingle sets build scan-side (no shuffle before signatures)") {
    // the kernel projection means the FIRST exchange in the minhash plan
    // carries band keys / signatures, never exploded shingle strings
    val p = plan("x2_minhash_lsh")
    assert(p.contains("shinglehashset") || p.contains("ShingleHashSet"),
      s"expected the shingleHashSet kernel in the plan:\n$p")
  }

  test("x26 hash split is a pure per-row projection (zero exchanges)") {
    val p = plan("x26_hash_split")
    assert(!p.contains("Exchange"), s"hash split should not shuffle:\n$p")
  }

  test("x33 vocabulary plans TakeOrderedAndProject (no global sort)") {
    assert(plan("x33_vocab").contains("TakeOrderedAndProject"))
  }

  test("x7 simhash plans the md5 kernel and no all-pairs join") {
    val p = plan("x7_simhash_dedup")
    assert(p.contains("simhashmd5") || p.contains("SimHashMd5"),
      s"expected the simhashMd5 kernel in the plan:\n$p")
    // candidates come from the equi-join on (chunk_idx, chunk_val) —
    // never a cartesian / nested-loop pairing of documents
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"all-pairs join in plan:\n$p")
  }

  test("x32 edge generation is IVF-bucketed (no all-pairs join)") {
    import org.apache.spark.sql.functions.col
    val e = Tables(spark, sfDir, "embeddings")
    val pairs = graft.operators.Similarity.ivfCosinePairs(
      e, e.filter(col("vec_id") < 16), "vec_id", "embedding", threshold = 0.4)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in the x32 edge plan:\n$p")
  }

  test("x8 verify join falls back to a shuffled join when sets exceed " +
      "the broadcast threshold (size-gated, no forced broadcast)") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      spark.catalog.clearCache()
      val p = plan("x8_ngram_jaccard")
      assert(!p.contains("BroadcastHashJoin"),
        s"explicit broadcast survived the threshold gate:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffled verify join:\n$p")
    } finally {
      spark.conf.set(key, prev)
      spark.catalog.clearCache()
    }
  }

  test("x35 repetition is a pure kernel projection (no hash exchange)") {
    val p = plan("x35_repetition")
    assert(p.contains("repetitionstats") || p.contains("RepetitionStats"),
      s"expected the repetitionStats kernel:\n$p")
    // Par.spread's round-robin is the only exchange; the signals
    // themselves never shuffle
    assert(!p.contains("Exchange hashpartitioning"),
      s"repetition should not hash-shuffle:\n$p")
  }

  test("x31 chunking is a kernel + narrow generator (no hash exchange)") {
    val p = plan("x31_chunk_tokens")
    assert(p.contains("chunktokens") || p.contains("ChunkTokens"),
      s"expected the chunkTokens kernel:\n$p")
    // Par.spread's round-robin repartition is the only exchange; chunking
    // itself must not add a hash shuffle
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking should not hash-shuffle:\n$p")
  }

  test("x43 containment probe is the prefix-filtered equi-join (no all-pairs)") {
    val p = plan("x43_containment_dedup")
    // candidates come from the asymmetric prefix x inverted-index
    // equi-join on the shingle hash — never a document cross join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"all-pairs join in plan:\n$p")
    assert(p.contains("shinglehashset") || p.contains("ShingleHashSet"),
      s"expected the shingle kernel:\n$p")
  }

  test("x44 Bloom probe prefilters the corpus stream before the overlap join") {
    val p = plan("x44_bloom_decontam")
    // the might_contain predicate must sit in the plan as a Filter on
    // the corpus side — that is the entire point of the sketch
    assert(p.toLowerCase.contains("might_contain"),
      s"Bloom prefilter missing from the plan:\n$p")
  }

  test("x46 corpus window is hash-partitioned; SinglePartition only above bucket totals") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, SinglePartition}

    val exec: SparkPlan =
      SparkEntry.queries("x46_concat_offsets")(spark, sfDir)
        .queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p                        => p
        }

    // 1) the corpus-side running sum is a PARTITIONED window fed by a hash
    //    exchange — the corpus itself never funnels through one task
    val corpusWindows = exec.collect {
      case w: WindowExec if w.partitionSpec.nonEmpty => w
    }
    assert(corpusWindows.nonEmpty, s"per-bucket corpus window missing:\n$exec")
    corpusWindows.foreach { w =>
      val hashFed = w.collectFirst {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      assert(hashFed.nonEmpty,
        s"corpus window not fed by a hash exchange:\n$w")
    }

    // 2) a SinglePartition exchange is allowed ONLY above an aggregate (the
    //    <=2^bucketBits-row bucket-totals frame) — never over raw corpus rows
    val singles = exec.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    singles.foreach { e =>
      assert(e.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"SinglePartition exchange over non-aggregated (corpus-sized) data:\n$e")
    }

    // 3) same bound for any global (unpartitioned) cumulative window: it must
    //    sit over the aggregated totals, never the corpus
    exec.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .foreach { w =>
        assert(w.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
          s"global window over non-aggregated (corpus-sized) data:\n$w")
      }
  }

  test("x47 grouped prefix sum: every window partitioned, no single-partition corpus exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

    val exec: SparkPlan =
      SparkEntry.queries("x47_token_budget_mix")(spark, sfDir)
        .queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p                        => p
        }
    // the grouped form threads the group key through BOTH phases: even
    // the bucket-totals rollup partitions by group, so no window in the
    // plan is global and no SinglePartition exchange moves corpus rows
    val windows = exec.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"prefix-sum windows missing:\n$exec")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window in x47:\n$w")
    }
    exec.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }.foreach { e =>
      assert(e.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"SinglePartition exchange over non-aggregated data in x47:\n$e")
    }
  }

  test("x49 epoch repeat is a zero-shuffle narrow explode") {
    val p = plan("x49_epoch_repeat")
    assert(!p.contains("Exchange"), s"epoch repeat should not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected the sequence explode:\n$p")
  }

  test("x50 boilerplate strip: digest anti-join, no cartesian, no single-partition exchange") {
    val p = plan("x50_boilerplate_strip")
    assert(p.contains("LeftAnti"),
      s"boilerplate removal should be an ANTI join on the digest:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in x50:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in x50:\n$p")
  }

  test("x52 winnow fingerprint window is hash-partitioned by document") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

    val docs = Tables(spark, sfDir, "documents")
    val exec: SparkPlan = graft.operators.TextDedup
      .winnowFingerprints(docs, "doc_id", "text")
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p                        => p
      }
    val windows = exec.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"winnow min-window missing:\n$exec")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"unpartitioned winnow window:\n$w")
      assert(w.collectFirst {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }.nonEmpty, s"winnow window not fed by a hash exchange:\n$w")
    }
  }

  test("x52 pair join groups by fingerprint — no cartesian, no single partition") {
    val p = plan("x52_winnow_pairs")
    assert(!p.contains("CartesianProduct"), s"cartesian in x52:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in x52:\n$p")
  }

  test("x53 source-similarity term join is an equi-join (no cartesian)") {
    val p = plan("x53_source_similarity")
    assert(!p.contains("CartesianProduct"), s"cartesian in x53:\n$p")
  }

  test("x51 data card broadcasts the 1-row total; no corpus-sized single partition") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

    val exec: SparkPlan =
      SparkEntry.queries("x51_data_card")(spark, sfDir)
        .queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p                        => p
        }
    // the corpus-total join side arrives as a broadcast, not a shuffle
    assert(exec.toString.contains("BroadcastExchange"),
      s"1-row total not broadcast in x51:\n$exec")
    // any SinglePartition exchange sits above an aggregate (the 1-row
    // total / cell-bounded frames), never over raw corpus rows
    exec.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }.foreach { e =>
      assert(e.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"SinglePartition exchange over non-aggregated data in x51:\n$e")
    }
  }

  test("x55 oov rate is a pure projection after the bounded vocab collect") {
    // the only permitted exchange is Par.spread's round-robin parallelism
    // spread — no hash/single-partition exchange computes anything
    val p = plan("x55_oov_rate")
    val dataExchanges = "Exchange (?!RoundRobinPartitioning)".r
      .findAllIn(p).size
    assert(dataExchanges == 0,
      s"oov projection should not shuffle by key (vocab is a " +
        s"pre-collected K-bounded literal):\n$p")
    assert(p.contains("stophitsexpr"), s"vocab hash-probe kernel missing:\n$p")
  }

  test("x59 image pair join is the banded pigeonhole equi-join (no all-pairs)") {
    val p = plan("x59_image_neardup")
    assert(!p.contains("CartesianProduct"), s"cartesian in x59:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in x59:\n$p")
    // candidates join on (chunk_idx, chunk_val) — a SortMergeJoin or
    // shuffled hash join keyed on the chunk pair, never fp inequality
    assert(p.contains("chunk_val"), s"pigeonhole chunk key missing:\n$p")
  }

  test("x60 PII redaction is a zero-shuffle per-row projection") {
    val p = plan("x60_pii_redaction")
    val dataExchanges = "Exchange (?!RoundRobinPartitioning)".r
      .findAllIn(p).size
    assert(dataExchanges == 0,
      s"redaction should be a pure scan-side projection:\n$p")
  }

  test("x62 source neighbors: aggregated signatures, banded equi-join, no cartesian") {
    val p = plan("x62_source_neighbors")
    assert(!p.contains("CartesianProduct"), s"cartesian in x62:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in x62:\n$p")
    // signatures come from min-AGGREGATES (map-side combinable), never a
    // buffered collect_set of the vocabulary
    assert(!p.contains("collect_set"), s"buffered vocab in x62:\n$p")
    assert(p.contains("band_key"), s"LSH band key missing in x62:\n$p")
  }

  test("x61 deterministic packing: one bucket exchange, no global sort") {
    val p = plan("x61_pack_chunks")
    // the route is ONE hash exchange on _bucket; the order within a
    // bucket comes from sortWithinPartitions — a global Sort (range
    // exchange) would funnel hash order through sampled boundaries
    assert(p.contains("hashpartitioning(_bucket"),
      s"bucket hash route missing in x61:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"global sort leaked into x61:\n$p")
    val singles = "SinglePartition".r.findAllIn(p).size
    assert(singles == 0, s"single-partition exchange in x61:\n$p")
  }

  test("x68 bigram top-K plans TakeOrderedAndProject (no global sort)") {
    val p = plan("x68_bigram_stats")
    assert(p.contains("TakeOrderedAndProject"), s"x68 global sort:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"global sort leaked into x68:\n$p")
  }

  test("x69 classifier gate is a pure per-row projection (no hash exchange)") {
    val p = plan("x69_classifier_gate")
    // Par.spread's round-robin is the only exchange; the score itself
    // never shuffles, never aggregates
    assert(!p.contains("Exchange hashpartitioning"),
      s"classifier gate should not hash-shuffle:\n$p")
    assert(!p.contains("HashAggregate"),
      s"classifier gate should not aggregate:\n$p")
  }

  test("x71 shard rank: corpus window hash-partitioned; SinglePartition " +
      "only above the bucket-totals aggregate") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, SinglePartition}

    val exec: SparkPlan =
      SparkEntry.queries("x71_shard_manifest")(spark, sfDir)
        .queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p                        => p
        }
    // the corpus-side row_number window is partitioned + hash-fed
    val corpusWindows = exec.collect {
      case w: WindowExec if w.partitionSpec.nonEmpty => w
    }
    assert(corpusWindows.nonEmpty, s"per-bucket rank window missing:\n$exec")
    corpusWindows.foreach { w =>
      assert(w.collectFirst {
        case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }.nonEmpty, s"rank window not fed by a hash exchange:\n$w")
    }
    // SinglePartition / unpartitioned windows only above the
    // ≤16^bucketHexChars-row totals aggregate, never the corpus
    exec.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }.foreach { e =>
      assert(e.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"SinglePartition exchange over corpus-sized data in x71:\n$e")
    }
    exec.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .foreach { w =>
        assert(w.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
          s"global window over corpus-sized data in x71:\n$w")
      }
  }

  test("x72 quantization report is a pure per-row projection (no hash exchange)") {
    val p = plan("x72_quantize_embeddings")
    // Par.spread's round-robin is the only exchange
    assert(!p.contains("Exchange hashpartitioning"),
      s"quantize should not hash-shuffle:\n$p")
    assert(!p.contains("HashAggregate"),
      s"quantize should not aggregate:\n$p")
  }

  test("x76 quarantine is a pure per-row projection (no hash exchange)") {
    val p = plan("x76_quarantine")
    // Par.spread's round-robin is the only exchange; the verdict itself
    // never shuffles, never aggregates
    assert(!p.contains("Exchange hashpartitioning"),
      s"quarantine should not hash-shuffle:\n$p")
    assert(!p.contains("HashAggregate"),
      s"quarantine should not aggregate:\n$p")
  }

  test("x76 quarantine parses each payload exactly once (variant, " +
      "no json_tuple/get_json_object double parse)") {
    val p = plan("x76_quarantine")
    val parses = "(?i)parse_?json".r.findAllIn(p).size
    assert(parses >= 1, s"expected a variant parse:\n$p")
    assert(!p.contains("json_tuple") && !p.contains("get_json_object"),
      s"legacy double-parse path still present:\n$p")
  }

  test("x84 bpe encode is a zero-shuffle projection (training collects " +
      "happen at construction; the returned plan is scan-side only)") {
    val p = plan("x84_bpe_encode")
    assert(!p.contains("Exchange hashpartitioning"),
      s"encode should not hash-shuffle:\n$p")
    assert(!p.contains("HashAggregate"),
      s"encode should not aggregate:\n$p")
  }

  test("x85 paragraph dedup reassembles via hash-partitioned aggregate, " +
      "never a global sort or pair join") {
    val p = plan("x85_paragraph_dedup")
    // per-doc ordering happens INSIDE the aggregate (array_sort over the
    // collected chunk structs), so no range partitioning anywhere; the
    // duplicate decision is one digest aggregate, never doc x doc
    assert(!p.contains("Exchange rangepartitioning"),
      s"reassembly should not globally sort:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin ["
      + "doc_id"), s"chunk dedup must stay digest-keyed:\n$p")
  }

  test("x86 bigram LM joins folded doc-pairs to vocab-bounded counts; " +
      "V rides the only nested-loop (1-row broadcast)") {
    val p = plan("x86_bigram_lm")
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl == 1, s"expected exactly the 1-row V broadcast, got $bnl:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian leaked into x86:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"x86 should not globally sort:\n$p")
  }

  test("x87 span apply cuts per-row: no explode/window after the one " +
      "doc-id join of decisions to corpus") {
    val p = plan("x87_span_apply")
    // the decisions chain has its own window (x83's islands merge); the
    // APPLY half must add none — count stays at x83's
    val w87 = "RunningWindowFunction|Window ".r.findAllIn(p).size
    val w83 = "RunningWindowFunction|Window ".r
      .findAllIn(plan("x83_span_dedup")).size
    assert(w87 == w83, s"apply added windows (x87=$w87, x83=$w83):\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
    // the kept-token cut is a fused projection, not a posexplode of the
    // corpus: exactly the decision chain's explode count survives
    val e87 = "Generate posexplode".r.findAllIn(p).size
    val e83 = "Generate posexplode".r.findAllIn(plan("x83_span_dedup")).size
    assert(e87 == e83, s"apply added explodes (x87=$e87, x83=$e83):\n$p")
  }

  test("x88 quantized ANN broadcasts the query side; quantization is " +
      "scan-side (no pre-join shuffle)") {
    val p = plan("x88_quantized_ann")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query set should broadcast (x3's shape):\n$p")
    // the only hash exchange is the top-k window's partition-by-query;
    // quantization must not force one before the join
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected at most the window's exchange:\n$p")
  }

  test("x80 existing side reads the persisted index, never corpus text") {
    val p = plan("x80_neardup_indexed")
    assert(p.contains("nd_bands_") && p.contains("nd_sets_"),
      s"index tables not scanned:\n$p")
    // the only shingle kernel left in the plan is the BATCH side's one
    // cached frame; x75's self-contained form carries the existing
    // side's kernel too
    val k80 = "(?i)shinglehashset".r.findAllIn(p).size
    val k75 = "(?i)shinglehashset".r
      .findAllIn(plan("x75_incremental_neardup")).size
    assert(k80 > 0 && k80 < k75,
      s"existing side still recomputes signatures (x80=$k80, x75=$k75):\n$p")
  }

  test("x70 knn label vote stays k-bounded: no window after the topk stage") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = SparkEntry.queries("x70_knn_label")(spark, sfDir)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p                        => p
      }
    // exactly ONE ranking window (ivfTopK's); the vote itself is an
    // aggregate + per-row fold, not a second corpus-wide window
    val windows = exec.collect { case w: WindowExec => w }
    assert(windows.size == 1, s"expected 1 window (ivfTopK rank):\n$exec")
    val joins = exec.toString
    assert(!joins.contains("CartesianProduct"),
      s"cartesian leaked into x70:\n$joins")
  }

  test("x91/x92 read the persisted ANN index with bucket pruning and " +
      "zero corpus-side kernel recompute") {
    Seq("x91_ann_indexed" -> "ann_assign_",
        "x92_embedding_dedup_indexed" -> "ann2_assign_").foreach {
      case (q, table) =>
        val p = plan(q)
        assert(p.contains(table), s"$q: index table not scanned:\n$p")
        // the nearest-centroid kernel ran at BUILD time only; at query
        // time the corpus side is a pure scan (probeCentroids on the
        // query side is a different expression)
        assert("(?i)nearestcentroid".r.findAllIn(p).isEmpty,
          s"$q: corpus assignment recomputed at query time:\n$p")
        // the probed-centroid IN predicate engages bucket pruning
        assert(p.contains("SelectedBucketsCount"),
          s"$q: bucket pruning not engaged:\n$p")
    }
  }

  test("x98 BM25 broadcasts df + stats and plans top-k without a " +
      "global sort") {
    val p = plan("x98_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k should be TakeOrderedAndProject:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      s"the |query|-row df table should broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      "BroadcastExchange".r.findAllIn(p).size >= 2,
      s"the 1-row stats frame should broadcast:\n$p")
  }

  test("x103 curriculum ranks without a corpus-sized global sort") {
    val p = plan("x103_curriculum")
    // the ONLY single-partition exchange is the ≤256-row bucket
    // rollup; the corpus-sized frames move through hash exchanges
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1,
      s"expected exactly the tiny-rollup single-partition exchange:\n$p")
    assert(!p.contains("TakeOrderedAndProject"),
      s"rank must cover ALL rows, not a cut:\n$p")
  }

  test("x107 serves BM25 from the persisted index: bucket-pruned " +
      "postings scan, zero text-kernel work") {
    val p = plan("x107_bm25_indexed")
    assert(p.contains("bm25_post_") && p.contains("bm25_stats_"),
      s"index tables not scanned:\n$p")
    // the term-count and tokenize kernels ran at BUILD time only
    assert("(?i)termcounts".r.findAllIn(p).isEmpty,
      s"postings recomputed from text at query time:\n$p")
    assert(!p.contains("documents"),
      s"corpus text scanned at query time:\n$p")
    // term IN (...) on the bucketing column engages bucket pruning
    assert(p.contains("SelectedBucketsCount"),
      s"bucket pruning not engaged on the postings scan:\n$p")
    // same serving tail as x98
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k should be TakeOrderedAndProject:\n$p")
  }

  test("x108 joins the component table by broadcast — no corpus-wide " +
      "shuffle join on doc_id") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val exec = SparkEntry.queries("x108_source_duplication")(spark, sfDir)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p                        => p
      }
    def onDocId(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      keys.exists(_.references.exists(_.name == "doc_id"))
    // the x8 pair machinery shuffles on shingle hashes — fine; the
    // doc_id-keyed rep join must be the broadcast of the near-dup-sized
    // component table, never a corpus-vs-corpus exchange
    exec.foreach {
      case j: SortMergeJoinExec =>
        assert(!onDocId(j.leftKeys),
          s"corpus-sized sort-merge join on doc_id:\n$exec")
      case j: ShuffledHashJoinExec =>
        assert(!onDocId(j.leftKeys),
          s"corpus-sized shuffled-hash join on doc_id:\n$exec")
      case _ => ()
    }
    val bcastOnDocId = exec.collect {
      case j: BroadcastHashJoinExec if onDocId(j.leftKeys) => j
    }
    assert(bcastOnDocId.nonEmpty,
      s"component rep join is not a broadcast join:\n$exec")
  }

  test("x110 scores novelty from the persisted gram-df index: one batch " +
      "text scan, no df aggregate, nothing cached") {
    val p = plan("x110_novelty_indexed")
    assert(p.contains("nov_df_"), s"df index table not scanned:\n$p")
    // batch side pays exactly one shingle-kernel pass; the index side
    // is a table scan (df never recomputed)
    assert("(?i)shinglehashset".r.findAllIn(p).size == 1,
      s"expected exactly the batch-side kernel pass:\n$p")
    // the self-contained form's DISK_ONLY gram pin is GONE — the gram
    // stream is consumed once, so nothing needs persisting
    assert(!p.contains("InMemoryTableScan"),
      s"indexed novelty should not cache anything:\n$p")
  }

  test("x109 stamps sources onto pair-sized frames — no cartesian, " +
      "no text kernels beyond x8's own") {
    val p = plan("x109_cross_source_dups")
    assert(!p.contains("CartesianProduct"),
      s"cartesian leaked into the source matrix:\n$p")
    // the plan string inlines the cached shingle-set build at every
    // InMemoryTableScan, so compare against the x8 pair query itself:
    // the source stamping must add ZERO kernel sites on top of the
    // inherited machinery
    val k109 = "(?i)shinglehashset".r.findAllIn(p).size
    val k8 = "(?i)shinglehashset".r
      .findAllIn(plan("x8_ngram_jaccard")).size
    assert(k109 <= k8,
      s"source stamping re-scanned text (x109=$k109, x8=$k8):\n$p")
  }

  test("x111 zipf audit cuts top-V with TakeOrdered; single-partition " +
      "work is V-row only") {
    val p = plan("x111_zipf_audit")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-V cut should be TakeOrderedAndProject:\n$p")
    // no corpus-sized global sort anywhere: the only Sort nodes serve
    // the V-row rank window AFTER the TakeOrdered cut
    assert(!p.contains("Exchange rangepartitioning"),
      s"corpus-sized global sort leaked into the fit:\n$p")
  }

  test("x112/x113 histogram and entropy: one corpus scan, one hash " +
      "exchange each") {
    Seq("x112_length_histogram", "x113_mix_entropy").foreach { q =>
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$q: expected exactly the per-source aggregate exchange:\n$p")
      assert("FileScan parquet".r.findAllIn(p).size == 1,
        s"$q: corpus scanned more than once:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("x114 quantiles rank without a global sort — x103's machinery, " +
      "quantile targets broadcast") {
    val p = plan("x114_score_quantiles")
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1,
      s"expected exactly the tiny-rollup single-partition exchange:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort leaked into the quantile lookup:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the |quantiles|-row target frame should broadcast:\n$p")
  }

  test("x115 exact-dup savings: digest window + source rollup — two " +
      "hash exchanges, one corpus scan") {
    val p = plan("x115_exact_dup_savings")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected the digest window + source aggregate exchanges only:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"corpus scanned more than once:\n$p")
  }

  test("x104 novelty pins the gram stream on DISK_ONLY, never memory") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val df = SparkEntry.queries("x104_novelty")(spark, sfDir)
    val levels = df.queryExecution.optimizedPlan.collect {
      case im: InMemoryRelation => im.cacheBuilder.storageLevel
    }
    assert(levels.nonEmpty, "gram stream no longer persisted — the " +
      "shingle kernel would scan corpus text twice per run")
    // corpus-scale frame: serialized local disk (the shuffle-file cost
    // model), NOT a memory pin that evicts working memory at 100 TB
    levels.foreach { l =>
      assert(l.useDisk && !l.useMemory,
        s"x104 gram stream persisted at $l — expected DISK_ONLY")
    }
  }

  test("x106 source drift broadcasts the top-V vocabulary cut") {
    val p = plan("x106_source_drift")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-V cut should be TakeOrderedAndProject:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the V-row vocabulary should broadcast into the tf stream:\n$p")
  }

  test("x116 quality reps: component and keeper tables broadcast — no " +
      "corpus-sized doc_id join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val exec = SparkEntry.queries("x116_quality_reps")(spark, sfDir)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p                        => p
      }
    def onDocId(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      keys.exists(_.references.exists(_.name == "doc_id"))
    exec.foreach {
      case j: SortMergeJoinExec =>
        assert(!onDocId(j.leftKeys),
          s"corpus-sized sort-merge join on doc_id:\n$exec")
      case j: ShuffledHashJoinExec =>
        assert(!onDocId(j.leftKeys),
          s"corpus-sized shuffled-hash join on doc_id:\n$exec")
      case _ => ()
    }
    assert(exec.collect {
      case j: BroadcastHashJoinExec if onDocId(j.leftKeys) => j
    }.nonEmpty, s"component/keeper joins are not broadcasts:\n$exec")
    // served from the PERSISTED component table (frozen-books): the
    // shingle -> pair -> connected-components walk never runs at
    // query time
    val s = exec.toString
    assert(s.contains("ndcomp_"),
      s"persisted component table not read:\n$s")
    assert(!s.toLowerCase.contains("shingle"),
      s"pair machinery recomputed at serve time:\n$s")
  }

  test("x117/x118 mixture plan and PII rate: one corpus scan, one " +
      "source-rollup hash exchange each") {
    Seq("x117_mixture_plan", "x118_pii_rate").foreach { q =>
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$q: expected exactly the per-source aggregate exchange:\n$p")
      assert("FileScan parquet".r.findAllIn(p).size == 1,
        s"$q: corpus scanned more than once:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("x125 score histogram: one scoring scan, one bucket exchange") {
    val p = plan("x125_score_histogram")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the bucket-aggregate exchange:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"corpus scanned more than once:\n$p")
  }

  test("x126 phase-source matrix ranks without a global sort") {
    val p = plan("x126_phase_source_matrix")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort leaked into the phase ranking:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1,
      s"expected exactly the tiny-rollup single-partition exchange:\n$p")
  }

  test("x124 indexed PQ search: corpus side reads ONLY the codes " +
      "table — the embedding parquet is scanned once, for the queries") {
    val p = plan("x124_pq_indexed")
    assert(p.contains("pq_codes"), s"codes table not scanned:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 2,
      s"expected exactly the codes-table + query scans:\n$p")
    assert("embeddings".r.findAllIn(p).size <= 1,
      s"corpus embeddings rescanned at query time:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the query frame should broadcast:\n$p")
  }

  test("x121 PQ ADC search: query tables broadcast; the only exchange " +
      "is the per-query ranking window over (ids, long) tuples") {
    val p = plan("x121_pq_topk")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the query frame (with its distance tables) should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the ranking-window exchange:\n$p")
  }

  test("x127 indexed IVF-PQ search: bucket-pruned codes scan, zero " +
      "training, zero embedding reads, zero corpus kernels — the " +
      "x91 + x124 pins composed") {
    val p = plan("x127_ivf_pq_indexed")
    assert(p.contains("ivfpq_codes"), s"codes table not scanned:\n$p")
    // the coarse assignment kernel ran at BUILD time only (the
    // query-side probe list uses probeCentroids — a different
    // expression)
    assert("(?i)nearestcentroid".r.findAllIn(p).isEmpty,
      s"corpus assignment recomputed at query time:\n$p")
    // probed-centroid IN on the bucketing column engages bucket pruning
    assert(p.contains("SelectedBucketsCount"),
      s"bucket pruning not engaged on the codes scan:\n$p")
    // the embedding parquet is scanned once — for the queries
    assert("embeddings".r.findAllIn(p).size <= 1,
      s"corpus embeddings rescanned at query time:\n$p")
    // the probe frame (nprobe rows/query + distance tables) broadcasts
    // into an equi-join on the bucket key
    assert(p.contains("BroadcastHashJoin"),
      s"probe frame should broadcast-hash-join on centroid_id:\n$p")
  }

  test("x128 recall audit: the audit joins are broadcast-hash on " +
      "(query, neighbor) — no cartesian, no corpus-sized exchange " +
      "beyond the legs' own") {
    val p = plan("x128_ann_recall")
    assert(!p.contains("CartesianProduct"),
      s"cartesian leaked into the audit:\n$p")
    // each leg's exact-vs-approx join is top-k-sized on both sides
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      s"audit join should broadcast:\n$p")
  }

  test("x129 sample-trained distortion releases the training cache: " +
      "the report plan holds no MEMORY-resident corpus frame") {
    val p = plan("x129_pq_sample_distortion")
    assert(!p.contains("InMemoryTableScan"),
      s"training cache leaked into the report plan:\n$p")
  }

  test("x130 two-stage re-rank: the candidate fetch and the query frame " +
      "broadcast — no corpus shuffle beyond the ADC stage's own") {
    val p = plan("x130_pq_rerank_topk")
    assert(!p.contains("CartesianProduct"),
      s"cartesian leaked into the re-rank:\n$p")
    // queries×shortlist candidates + the query vectors broadcast into
    // the corpus vector fetch
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"candidate fetch should be broadcast-hash joins:\n$p")
    // exactly the ADC ranking window's exchange + the re-rank window's
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"unexpected extra exchange in the two-stage plan:\n$p")
  }

  test("x145 MMR re-rank: candidates come from the bucket-pruned index " +
      "scan once (cached query-set-sized frames), no cartesian, no " +
      "kernel recompute") {
    val p = plan("x145_mmr_rerank")
    assert(p.contains("ann_assign_") || p.contains("InMemoryTableScan"),
      s"index-backed candidate frame missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert("(?i)nearestcentroid".r.findAllIn(p).isEmpty,
      s"corpus assignment recomputed at query time:\n$p")
  }

  test("x143 as-of join plans the merge scan: union + running window " +
      "on ONE key exchange — no join operator of any kind") {
    val p = plan("x143_asof_join")
    assert(!p.contains("Join"), s"as-of should not plan a join:\n$p")
    assert(p.contains("Window"), s"running-last window missing:\n$p")
    assert(p.contains("Union"), s"two-stream union missing:\n$p")
    // the window's key exchange is the plan's only shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the window's key exchange:\n$p")
  }

  test("x144 banded range join: the time-proximity predicate rides an " +
      "EQUALITY join on the band key — no cartesian, no nested loop") {
    val p = plan("x144_range_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"banding failed — proximity joined without an equality key:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"expected an equality join on the band key:\n$p")
  }

  test("x142 diversified top-k keeps x91's serving shape: bucket-pruned " +
      "index scan, no kernel recompute, and only the two ranking-window " +
      "exchanges on the pruned stream") {
    val p = plan("x142_diversified_topk")
    assert(p.contains("ann_assign_"), s"index table not scanned:\n$p")
    assert("(?i)nearestcentroid".r.findAllIn(p).isEmpty,
      s"corpus assignment recomputed at query time:\n$p")
    assert(p.contains("SelectedBucketsCount"),
      s"bucket pruning not engaged:\n$p")
    // the cap window's (query, cell) exchange + the re-rank's (query)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"unexpected extra exchange beyond the two windows':\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x141 ranking audit: both legs serve from the persisted codes " +
      "table (zero training), audit joins broadcast — no cartesian, " +
      "no corpus-scale exchange beyond the legs' own") {
    val p = plan("x141_ranking_quality")
    assert(p.contains("pq_codes"), s"codes table not scanned:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian leaked into the audit:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      s"audit join should broadcast:\n$p")
  }

  test("x132 truncated top-k keeps x3's shape: broadcast query frame, " +
      "one corpus scan, the ranking window as the only exchange") {
    val p = plan("x132_truncated_topk")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query frame should broadcast:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the ranking-window exchange:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x134 indexed two-stage re-rank: codes-table short-list, zero " +
      "training, broadcast vector fetch — exactly two ranking exchanges") {
    val p = plan("x134_pq_rerank_indexed")
    assert(p.contains("pq_codes"), s"codes table not scanned:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian leaked into the re-rank:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"candidate fetch should be broadcast-hash joins:\n$p")
    // the ADC short-list window + the exact re-rank window, no more
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"unexpected extra exchange in the indexed two-stage plan:\n$p")
  }

  test("x133 snapshot diff moves (id, digest) pairs only: digests " +
      "computed scan-side, one full-outer id join, text never exchanged") {
    val p = plan("x133_snapshot_diff")
    // the two snapshot legs each exchange their 40-byte (id, digest)
    // projection into the join — and nothing else
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected exactly the two join-leg exchanges:\n$p")
    assert(p.contains("FullOuter"), s"full-outer join missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x135-x138 hybrid legs serve from BOTH persisted indexes: " +
      "postings + ANN buckets pruned, corpus text kernels only on the " +
      "10-row query frame, fusion joins broadcast") {
    Seq("x135_hybrid_rrf", "x136_hard_negatives",
        "x137_contrastive_triplets", "x138_fusion_overlap").foreach { q =>
      val p = plan(q)
      // both index families are scanned...
      assert(p.contains("bm25_post_") && p.contains("ann_assign_"),
        s"$q: a leg bypassed its persisted index:\n$p")
      // ...with their IN predicates pruning buckets (postings by term,
      // ANN assignment by probed centroid)
      assert("SelectedBucketsCount".r.findAllIn(p).size >= 2,
        s"$q: bucket pruning missing on a leg:\n$p")
      // the corpus side recomputes nothing: the only term-count
      // kernels are the query frame's own tokenization — once per
      // consumer of the lexical leg (x137 consumes it twice: the
      // anti-join and the positive pick), each over the pushed-down
      // 10-row scan the documents assert below proves
      val lexConsumers = if (q == "x137_contrastive_triplets") 2 else 1
      assert("(?i)termcounts".r.findAllIn(p).size <= lexConsumers,
        s"$q: corpus postings recomputed from text at query time:\n$p")
      assert("(?i)nearestcentroid".r.findAllIn(p).isEmpty,
        s"$q: corpus assignment recomputed at query time:\n$p")
      assert(p.contains("LessThan(doc_id,10)") || !p.contains("documents"),
        s"$q: documents scanned without the query-set pushdown:\n$p")
      assert(p.contains("LessThan(vec_id,10)") || !p.contains("embeddings"),
        s"$q: embeddings scanned without the query-set pushdown:\n$p")
      // the fusion/anti stage is top-k-sized: no cartesian anywhere
      assert(!p.contains("CartesianProduct"), s"$q: unplanned cartesian:\n$p")
    }
  }

  test("x139/x140 PRF: feedback text reached only via an id-IN " +
      "pushdown, postings bucket-pruned, no cartesian") {
    Seq("x139_expansion_terms", "x140_prf_retrieval").foreach { q =>
      val p = plan(q)
      assert(p.contains("bm25_post_"), s"$q: postings not scanned:\n$p")
      assert(p.contains("SelectedBucketsCount"),
        s"$q: candidate-term IN should prune postings buckets:\n$p")
      // the feedback fetch reads only the pseudo-relevant docs (round
      // 1's ids pushed as an IN), and the query frame only its 10 rows
      assert(p.contains("In(doc_id"),
        s"$q: feedback fetch not id-pruned:\n$p")
      assert(p.contains("LessThan(doc_id,10)"),
        s"$q: query frame scanned without its pushdown:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: unplanned cartesian:\n$p")
    }
  }

  test("x119 calibrated gate: no global sort; the 1-row threshold " +
      "broadcasts into a zero-extra-shuffle score filter") {
    val p = plan("x119_calibrated_gate")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort leaked into the gate:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row threshold should broadcast:\n$p")
    // the only single-partition exchanges are the bucketed-rank rollup
    // (threshold side); the gate's scoring scan adds none
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 1,
      s"unexpected single-partition stage on the gate side:\n$p")
  }

  test("x146 ccnet buckets: no per-language global sort — ranks come " +
      "from (lang, bucket)-partitioned windows + broadcast offsets") {
    val p = plan("x146_ccnet_buckets")
    assert(!p.contains("Exchange rangepartitioning"),
      s"a range-partitioned sort leaked into the grouped rank:\n$p")
    // the corpus-sized local-rank window partitions by (lang, _b) —
    // splitting each language across buckets (a lang-only window would
    // put the whole language in one partition; lang-only windows DO
    // appear, but only over the ≤ groups·2^bits-row counts rollup)
    assert("hashpartitioning\\(lang#\\d+, _b#\\d+".r.findFirstIn(p)
        .isDefined,
      s"local rank should window by (lang, bucket):\n$p")
    // both side tables (per-group extents, per-(group,bucket) offsets)
    // broadcast into the scored stream
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"extents/offsets should broadcast:\n$p")
  }

  test("x148 scd2: join-free — ONE key exchange feeds the change-flag " +
      "and version windows, the run collapse, and the validity lead") {
    val p = plan("x148_scd2_dimension")
    assert(!p.contains("Join"), s"scd2 should be join-free:\n$p")
    assert(p.contains("Window"), s"versioning windows missing:\n$p")
    // hashpartitioning(user_id) satisfies the (user_id, version)
    // aggregate and the byVersion window too — one shuffle total
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the key exchange:\n$p")
  }

  test("x149 multi-touch: the one-sided lookback rides an EQUALITY " +
      "join on (user, band) — no cartesian, no nested loop") {
    val p = plan("x149_multitouch")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"banding should yield an equality join:\n$p")
    assert(p.contains("Window"), s"touch-rank window missing:\n$p")
  }

  test("x152 cohort retention: ONE user exchange — cohort + activity " +
      "weeks come out of a single aggregate, no join, no countDistinct") {
    val p = plan("x152_cohort_retention")
    assert(!p.contains("Join"), s"the triangle should be join-free:\n$p")
    assert("Exchange hashpartitioning\\(_u".r.findAllIn(p).size <= 1,
      s"expected at most one user exchange:\n$p")
    assert(!p.contains("distinct"), s"set dedup should be in the agg:\n$p")
  }

  test("x153 funnel: the at-or-after chain joins on the user key only " +
      "— no cartesian; stage counts are 1-row aggregates") {
    val p = plan("x153_funnel")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"stage chain should join on the user key:\n$p")
    assert(p.contains("Union"), s"stage legs should union:\n$p")
  }

  test("x156 daily value quantiles: no per-day sort — grouped bucketed " +
      "rank windows + broadcast quantile frame") {
    val p = plan("x156_daily_value_quantiles")
    assert(!p.contains("Exchange rangepartitioning"),
      s"a per-day sort leaked in:\n$p")
    assert("windowspecdefinition\\(day#\\d+L?, _b#\\d+".r.findFirstIn(p)
        .isDefined,
      s"local rank should window by (day, bucket):\n$p")
  }

  test("x155 dim enrich: the point-in-time lookup is the as-of merge " +
      "scan — no join operator, no interval predicate anywhere") {
    val p = plan("x155_dim_enrich")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"the lookup should not plan a join:\n$p")
    assert(p.contains("Union") && p.contains("Window"),
      s"merge-scan shape missing:\n$p")
  }

  test("x154 rfm segments: no global sort on any score axis — the " +
      "textbook ntile() window would range-partition every user") {
    val p = plan("x154_rfm_segments")
    assert(!p.contains("Exchange rangepartitioning"),
      s"a score axis leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x150 pmi collocations: top-K plans TakeOrderedAndProject; the " +
      "only nested-loop joins are the 1-row totals broadcasts") {
    val p = plan("x150_pmi_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K should avoid a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x151 vocab coverage: term aggregate + TakeOrderedAndProject " +
      "cut; the running sum's single-partition window is K-bounded") {
    val p = plan("x151_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-K cut should avoid a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x147 grouped calibrated gate: no per-language sort, no " +
      "single-partition stage — thresholds broadcast into a " +
      "zero-extra-shuffle score filter") {
    val p = plan("x147_lang_calibrated_gate")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global/grouped sort leaked into the gate:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"the grouped form should have no single-partition stage:\n$p")
    // extents, offsets, and the per-language threshold all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"extents/offsets/thresholds should broadcast:\n$p")
  }

  test("x157 rollup: ONE Expand feeds a single partial+final aggregate " +
      "— no per-grouping-set re-scan; the nation dim broadcasts") {
    val p = plan("x157_rollup_revenue")
    assert("Expand".r.findAllIn(p).size === 1,
      s"rollup should plan exactly one Expand:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"nation dim should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x158 pivot: declared-domain pivot is Expand-free and needs no " +
      "value-discovery pre-pass (no extra scan, no collect job)") {
    val p = plan("x158_segment_pivot")
    assert(!p.contains("Expand"),
      s"declared pivot should not Expand:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size === 2,
      s"expected exactly the orders + customer scans:\n$p")
  }

  test("x159 profile card: one COLUMN-PRUNED scan per column, no " +
      "Expand — the multi-distinct Expand would replicate every row " +
      "once per profiled column") {
    val p = plan("x159_profile_card")
    assert("FileScan parquet".r.findAllIn(p).size === 11,
      s"profile should run one pruned scan per column:\n$p")
    assert(!p.contains("Expand"),
      s"the Expand plan pushes N× row volume through one shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"each scan should prune to its own column:\n$p")
  }

  test("x160 pareto front: no pair join — per-size aggregate, " +
      "dictionary-bounded window, broadcast frontier join back") {
    val p = plan("x160_pareto_front")
    assert(p.contains("BroadcastHashJoin"),
      s"frontier table should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"skyline must not plan a dominance pair join:\n$p")
  }

  test("x161 rolling revenue: dims broadcast; the RANGE window " +
      "hash-partitions by nation — no global sort") {
    val p = plan("x161_rolling_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"supplier/nation dims should broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"rolling window leaked a global sort:\n$p")
  }

  test("x162 yoy growth: LAG window hash-partitions by nation — no " +
      "global sort; nation dim broadcasts") {
    val p = plan("x162_yoy_growth")
    assert(!p.contains("Exchange rangepartitioning"),
      s"year window leaked a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"nation dim should broadcast:\n$p")
  }

  test("x163 anomaly days: windowless — bounded daily aggregate + " +
      "broadcast per-type stats + a row-local integer filter") {
    val p = plan("x163_anomaly_days")
    assert(!p.contains("Window"), s"no window needed:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-type stats should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x164 brand affinity: the pair join is keyed on the order key; " +
      "the only nested-loop is the 1-row totals broadcast") {
    val p = plan("x164_brand_affinity")
    assert(!p.contains("CartesianProduct"),
      s"basket pair join must stay keyed:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"only the 1-row totals frame may nested-loop:\n$p")
  }

  test("x165 gini: per-nation ranks come from the bucketed-rank core " +
      "— no per-nation sort exchange") {
    val p = plan("x165_gini")
    assert(!p.contains("Exchange rangepartitioning"),
      s"rank leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x166 kmv sketch: salted partial top-k — no global sort, no " +
      "single-partition sketch stage") {
    val p = plan("x166_kmv_distinct")
    assert(!p.contains("Exchange rangepartitioning"),
      s"k-minima leaked a global sort:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"sketch stage should stay partitioned:\n$p")
  }

  test("x167 revenue trend: windowless — bounded daily aggregate + " +
      "dictionary-sized moment aggregate, dims broadcast") {
    val p = plan("x167_revenue_trend")
    assert(!p.contains("Window"), s"OLS closed form needs no window:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"supplier/nation dims should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x168 ab test: one user exchange, then nothing bigger than " +
      "two rows — no window, no global sort") {
    val p = plan("x168_ab_test")
    assert(!p.contains("Window"), s"no window needed:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort leaked in:\n$p")
  }

  test("x169 funnel latency: user-keyed stage chain + grouped " +
      "quantile cut — no per-transition sort") {
    val p = plan("x169_funnel_latency")
    assert(!p.contains("Exchange rangepartitioning"),
      s"a per-transition sort leaked in:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x170 chi-square: one corpus aggregate; past it everything is " +
      "dictionary-sized — the only nested-loops are the margin-grid " +
      "and 1-row totals broadcasts") {
    val p = plan("x170_chi_square")
    assert(!p.contains("CartesianProduct"),
      s"margins must broadcast:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      s"only the margin grid + totals may nested-loop:\n$p")
  }

  test("x171 weekday seasonality: windowless — bounded weekday " +
      "aggregate + broadcast nation totals") {
    val p = plan("x171_weekday_seasonality")
    assert(!p.contains("Window"), s"no window needed:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"dims + totals should broadcast:\n$p")
  }

  test("x172 lorenz curve: the decile axis is the grouped bucketed " +
      "rank — no per-nation sort exchange") {
    val p = plan("x172_lorenz_curve")
    assert(!p.contains("Exchange rangepartitioning"),
      s"decile cut leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x173 iqr outliers: quartiles from the grouped rank (no sort " +
      "exchange), fences broadcast into a row-local filter") {
    val p = plan("x173_iqr_outliers")
    assert(!p.contains("Exchange rangepartitioning"),
      s"quartiles leaked a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"fence table should broadcast:\n$p")
  }

  test("x174 quality-length correlation: windowless moment " +
      "aggregate — per-row kernels + one group-bounded aggregate") {
    val p = plan("x174_quality_length_corr")
    assert(!p.contains("Window"), s"closed form needs no window:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x175 mad anomaly days: two grouped-rank passes, thresholds " +
      "broadcast — no per-type sort exchange") {
    val p = plan("x175_mad_anomaly_days")
    assert(!p.contains("Exchange rangepartitioning"),
      s"median cut leaked a global sort:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"median + MAD thresholds should broadcast:\n$p")
  }

  test("x176 ri audit: orphans via anti-joins on collapsed key counts " +
      "— no sort, no cartesian (1-row frames broadcast)") {
    val p = plan("x176_ri_audit")
    assert(p.contains("LeftAnti"), s"orphan check should anti-join:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"audit leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x177 cdc apply: latest-change argmax is an aggregate (no " +
      "window), untouched base via one key anti-join") {
    val p = plan("x177_cdc_apply")
    assert(!p.contains("Window"),
      s"latest-wins should be max(struct), not a window:\n$p")
    assert(p.contains("LeftAnti"),
      s"untouched base rows should anti-join:\n$p")
  }

  test("x178 rollup merge: shard union collapses in one hash " +
      "aggregate — no window, no sort") {
    val p = plan("x178_rollup_merge")
    assert(!p.contains("Window"), s"merge needs no window:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"merge leaked a global sort:\n$p")
  }

  test("x179 user journeys: per-user window + dictionary-bounded " +
      "top-N (TakeOrdered, never a global sort exchange)") {
    val p = plan("x179_user_journeys")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N should be TakeOrdered over the path frame:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"journeys leaked a global sort:\n$p")
  }

  test("x180 split manifest: grouped bucketed rank — no per-stratum " +
      "sort exchange, offsets broadcast") {
    val p = plan("x180_split_manifest")
    assert(!p.contains("Exchange rangepartitioning"),
      s"split rank leaked a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets should broadcast:\n$p")
  }

  test("x181 key skew: per-key counts then the salted two-phase " +
      "top-k — no global sort exchange, 1-row total broadcast") {
    val p = plan("x181_key_skew")
    assert(!p.contains("Exchange rangepartitioning"),
      s"top-k leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x182 cms audit: the depth×width sketch broadcasts back onto " +
      "the probe keys — no global sort exchange") {
    val p = plan("x182_cms_audit")
    assert(p.contains("BroadcastHashJoin"),
      s"constant-size sketch should broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"cms audit leaked a global sort:\n$p")
  }

  test("x183 user growth: user-keyed min + day aggregate; the only " +
      "window rides the calendar-bounded day frame") {
    val p = plan("x183_user_growth")
    assert(p.contains("Window"),
      s"running total should be a window over days:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x184 fulfillment lag: grouped double-ceil quantiles — no " +
      "per-priority sort exchange, quantile frame broadcast") {
    val p = plan("x184_fulfillment_lag")
    assert(!p.contains("Exchange rangepartitioning"),
      s"quantile cut leaked a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"quantile/offset frames should broadcast:\n$p")
  }

  test("x185 fuzzy match: all pair work at name-dictionary grain " +
      "behind a blocked EQUI-join — no cartesian, no nested loop") {
    val p = plan("x185_fuzzy_match")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"block join must stay an equi-join:\n$p")
  }

  test("x186 gap fill: spine join is an equi-join; forward fill is " +
      "one window over the calendar-bounded frame; no cartesian") {
    val p = plan("x186_gap_fill")
    assert(p.contains("Window"), s"forward fill should be a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x187 markov transitions: LAG touches each event once (no " +
      "self-join of the corpus); the per-prev totals broadcast") {
    val p = plan("x187_markov_transitions")
    assert(p.contains("Window"), s"LAG should be a window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"dictionary-sized totals should broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"markov leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x188 pagerank: the corpus collapses to the distinct " +
      "(order, brand) frame before any self-join; rounds run on " +
      "dictionary frames — no cartesian anywhere in 3 unrolled " +
      "iterations") {
    val p = plan("x188_pagerank")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x189 cusum drift: one corpus aggregate to (type, day); the " +
      "per-type stats broadcast; both windows ride the calendar-" +
      "bounded day frame — no global sort") {
    val p = plan("x189_cusum_drift")
    assert(p.contains("Window"), s"prefix sums should be windows:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-type stats should broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"cusum leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x190 label communities: 3 LPA rounds are join+aggregate " +
      "chains on dictionary frames — argmax is an aggregate, not a " +
      "window; no cartesian") {
    val p = plan("x190_label_communities")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert(!p.contains("Window"),
      s"LPA argmax must be min(struct(...)), not a window:\n$p")
  }

  test("x191 event gaps: one user-keyed LAG exchange feeds the " +
      "grouped quantile rank — no global sort exchange") {
    val p = plan("x191_event_gaps")
    assert(p.contains("Window"), s"LAG should be a window:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"gap quantiles leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x192 triangle stats: oriented wedge/closure joins stay " +
      "equi-joins on the dictionary edge list — no cartesian, no " +
      "nested loop beyond the 1-row basket broadcast") {
    val p = plan("x192_triangle_stats")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x193 watermark audit: one key-partitioned arrival window, " +
      "then a dictionary-bounded type aggregate — no global sort") {
    val p = plan("x193_watermark_audit")
    assert(p.contains("Window"), s"runmax should be a window:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"lateness audit leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x194 mv join delta: dims broadcast into both shards, the " +
      "merge is one hash aggregate — no window, no sort, no " +
      "cartesian") {
    val p = plan("x194_mv_join_delta")
    assert(p.contains("BroadcastHashJoin"),
      s"dims should broadcast:\n$p")
    assert(!p.contains("Window"), s"merge must be an aggregate:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"mv merge leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x195 bucket checksums: two scan-side md5 kernels + bucket " +
      "aggregates; the reconciliation join moves numBuckets rows — " +
      "no global sort, no cartesian") {
    val p = plan("x195_bucket_checksums")
    assert(!p.contains("Exchange rangepartitioning"),
      s"digest table leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x196 brand triples: order-keyed equi-joins of the distinct " +
      "basket frame; the top-K is TakeOrdered, never a global sort " +
      "exchange") {
    val p = plan("x196_brand_triples")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K should be TakeOrdered:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"triples leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x197 mi audit: one cell aggregate, margins broadcast, three " +
      "bounded term sums — no global sort, no cartesian") {
    val p = plan("x197_mi_audit")
    assert(p.contains("BroadcastHashJoin"),
      s"margins should broadcast:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"mi audit leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x198 session durations: the q13 session windows + the " +
      "grouped quantile rank — no global sort exchange") {
    val p = plan("x198_session_durations")
    assert(p.contains("Window"), s"session law should be windows:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"session quantiles leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x199 bounce report: session windows into one dictionary-" +
      "bounded entry-type aggregate — no global sort, no cartesian") {
    val p = plan("x199_bounce_report")
    assert(p.contains("Window"), s"session law should be windows:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"bounce report leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x200 active users: one corpus collapse to (user, day), then " +
      "constant-fanout explodes of the bounded frame — no window, " +
      "no global sort, no cartesian") {
    val p = plan("x200_active_users")
    assert(!p.contains("Window"),
      s"active-user curves must be aggregates, not windows:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"active users leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x201 weighted sample: scan-side md5+ln kernels into the " +
      "salted top-k — no global sort exchange, no cartesian") {
    val p = plan("x201_weighted_sample")
    assert(!p.contains("Exchange rangepartitioning"),
      s"weighted sample leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x202 brand recs: dictionary frames end-to-end after the " +
      "basket collapse; grouped top-k is the salted window — no " +
      "global sort, no cartesian") {
    val p = plan("x202_brand_recs")
    assert(!p.contains("Exchange rangepartitioning"),
      s"brand recs leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x203 histogram quantiles: one cell aggregate; cumulative/" +
      "pick/estimate ride B-bounded frames; exact leg is the " +
      "bucketed rank — no global sort, no cartesian") {
    val p = plan("x203_histogram_quantiles")
    assert(p.contains("Window"),
      s"cumulative counts should be a window:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"histogram quantiles leaked a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  /** The x204-x209 served-graph pin: the query reads the persisted
    * edge-index tables and NEVER rescans the corpus — no lineitem
    * scan, no part-dictionary join, no basket collapse at serve
    * time. */
  private def assertCorpusFree(name: String, indexTable: String,
                               extra: String => Unit = _ => ()): Unit = {
    val p = plan(name)
    assert(p.contains(indexTable), s"index table not scanned:\n$p")
    assert(!p.contains("lineitem"),
      s"corpus lineitem scanned at serve time:\n$p")
    assert(!p.contains("p_partkey"),
      s"part dictionary joined at serve time:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    extra(p)
  }

  test("x204 indexed PageRank: rounds ride the persisted edge list — " +
      "zero corpus scans") {
    assertCorpusFree("x204_pagerank_indexed", "edge_list_")
  }

  test("x205 indexed communities: lift cut + LPA rounds from the " +
      "persisted edges/sidecars — zero corpus scans") {
    assertCorpusFree("x205_communities_indexed", "edge_list_")
  }

  test("x206 indexed triangles: oriented enumeration over persisted " +
      "affinity edges — zero corpus scans") {
    assertCorpusFree("x206_triangles_indexed", "edge_list_")
  }

  test("x207 indexed triples: 3-way mining re-joins the PERSISTED " +
      "basket frame, co-located by its order-key bucketing — zero " +
      "corpus scans, no exchange before the first pair aggregate") {
    assertCorpusFree("x207_triples_indexed", "edge_ob_", p => {
      // the bucketed (order_key) self-joins must not re-shuffle the
      // basket frame: every hash exchange in the plan carries brand
      // keys (pair/triple aggregates), never the order key — which
      // the mining frame aliases to `_o`
      assert(!"Exchange hashpartitioning\\((order_key|_o)#".r
        .findFirstIn(p).isDefined,
        s"basket frame re-shuffled on its own bucket key:\n$p")
    })
  }

  test("x208 indexed brand recs: pair counts ARE the persisted edges " +
      "— zero corpus scans") {
    assertCorpusFree("x208_brand_recs_indexed", "edge_list_")
  }

  test("x209 indexed affinity rules: src<dst cut of persisted edges " +
      "— zero corpus scans") {
    assertCorpusFree("x209_affinity_indexed", "edge_list_")
  }

  test("x213 partial-merge audit: serve time reads the persisted " +
      "before-sidecar + the merged index tables — zero corpus scans") {
    assertCorpusFree("x213_index_partial_merge", "medge_", p =>
      assert(p.contains("medge_before_"),
        s"persisted pre-merge audit sidecar not read:\n$p"))
  }

  test("x214 post-delete freshness: audits the DELETED index tables " +
      "against the snapshot — key-collapsed joins, no cartesian") {
    val p = plan("x214_index_delete")
    assert(p.contains("ddel_digests_"), s"deleted digest index:\n$p")
    assert(p.contains("ddel_ann_assign_"), s"deleted ann index:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    // both sides collapse to DISTINCT keys before the full-outer meet
    assert(p.contains("FullOuter"), s"freshness counters join:\n$p")
  }

  test("x215 bucketed freshness: the dirty-bucket cut is engaged " +
      "(semi joins on the bucket id) — the exact key diff never runs " +
      "unrestricted") {
    val p = plan("x215_freshness_bucketed")
    assert(p.contains("digests_"), s"digest index not scanned:\n$p")
    assert(p.contains("LeftSemi"),
      s"dirty-bucket restriction missing from the key diff:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }

  test("x219 semdedup: the pair stage is an EQUALITY join on the " +
      "learned cluster id — no cartesian anywhere; assignment is the " +
      "codegen nearest-centroid kernel, not a k-way window") {
    val p = plan("x219_semdedup")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert(p.contains("cluster_id"), s"cluster-confined join missing:\n$p")
    assert(p.toLowerCase.contains("nearestcentroidexpr"),
      s"kernel assignment missing from the plan:\n$p")
    // the dedup decision never materializes a global sort
    assert(!p.contains("Sort [similarity"), s"global sort crept in:\n$p")
  }

  test("x220 dsir: selection is TakeOrdered (no corpus-wide sort " +
      "materializes); the B-row weight table broadcasts; totals ride " +
      "broadcast-scalar crossJoins, never a cartesian") {
    val p = plan("x220_dsir_select")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N not TakeOrdered:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"bucket-weight/totals broadcast missing:\n$p")
  }

  test("x221 nprobe sweep: every probed leg reads the PERSISTED " +
      "assignment table (bucket-pruned index scans, no corpus " +
      "recompute beyond the one exact leg), no cartesian") {
    val p = plan("x221_nprobe_sweep")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    // four probed legs -> four index-table scans
    assert("ann_assign_".r.findAllIn(p).size >= 4,
      s"probed legs not served from the persisted index:\n$p")
    // the probed-centroid pushdown reaches each index scan
    assert(p.contains("In(centroid_id") || p.contains("centroid_id IN"),
      s"probe pruning missing from the index scan:\n$p")
  }

  test("x222 dsir indexed: serving reads the FROZEN weight table " +
      "(broadcast) and scans only the batch slice — the weight-fit " +
      "aggregation never appears at serve time") {
    val p = plan("x222_dsir_indexed")
    assert(p.contains("dsir_w_"), s"frozen weight table not read:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"B-row weight join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    // weights are READ, not learned: the fit columns exist only in
    // the writer's plan
    assert(!p.contains("q_n") && !p.contains("p_n"),
      s"weight fit recomputed at serve time:\n$p")
  }

  test("x226 curation v2: the semantic tier composes live (nearest-" +
      "centroid kernel in-plan), DSIR selection is TakeOrdered, the " +
      "drop/keep sets broadcast back, no cartesian anywhere") {
    val p = plan("x226_curation_v2")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert(p.toLowerCase.contains("nearestcentroidexpr"),
      s"semantic tier missing from the composed plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"DSIR top-N not TakeOrdered:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"drop/keep sets not broadcast:\n$p")
    // the final stages are anti/semi joins, never a re-aggregation of
    // the corpus text
    assert(p.contains("LeftAnti") && p.contains("LeftSemi"),
      s"apply joins missing:\n$p")
  }

  test("x224 substring dedup: the L-bounded suffix-rank doubling runs " +
      "as chained per-doc windows over ONE doc_id exchange — no L-char " +
      "gram strings materialize, no pair join, keeper is an aggregate") {
    val p = plan("x224_substring_dedup")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    // log2(24) doubling rounds (1,2,4,8) + the overlapped L-combine,
    // on BOTH join sides -> >= 10 lead windows in the plan
    assert("lead\\(_h".r.findAllIn(p).size >= 10,
      s"doubling rounds missing — keys not built by lead windows:\n$p")
    // equality keys are 64-bit hashes; the naive alternative's
    // substring(_t, pos, 24) gram strings never appear
    assert(p.contains("xxhash64"), s"hashed rank keys missing:\n$p")
    assert(!p.contains("substring("),
      s"gram strings materialized — the doubling was bypassed:\n$p")
    // occurrence marking is (count, argmin) per key class, never a
    // positional pair join — the argmin is the STRUCT-typed
    // min(struct(doc_id, pos)) (round 18: no doc*1e6+pos encoding, no
    // document-length bound)
    assert(p.contains("partial_min(struct(doc_id") ||
      p.contains("min(struct(doc_id"),
      s"keeper struct-argmin aggregate missing:\n$p")
  }

  test("x227 substring indexed: the batch pays its own doubling pass " +
      "and a bucketed semi-join against the FROZEN gram-key table — " +
      "corpus text never rescanned, no cartesian") {
    val p = plan("x227_substring_indexed")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert(p.contains("ssidx_"), s"frozen gram-key table not read:\n$p")
    assert(p.contains("LeftSemi"), s"index semi-join missing:\n$p")
    // the batch side builds keys by doubling windows, same as x224
    assert("lead\\(_h".r.findAllIn(p).size >= 5,
      s"batch doubling rounds missing:\n$p")
    // the even-id corpus text is only in the index: every documents
    // scan in the plan carries the odd-id batch filter
    val scans = "pmod\\(doc_id#\\d+L?, 2\\) = (\\d)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(scans.nonEmpty && scans.forall(_ == "1"),
      s"a corpus-side documents scan crept in:\n$p")
  }

  test("x231 semantic decontam: a PURE PROJECTION — the bestMatch " +
      "kernel in-plan, zero Exchange, no join/window over the " +
      "corpus x benchmark product") {
    val p = plan("x231_semantic_decontam")
    assert(p.contains("bestmatchexpr") || p.contains("bestMatch") ||
      p.toLowerCase.contains("bestmatch"),
      s"bestMatch kernel missing from the plan:\n$p")
    // the only exchange is Par.spread's round-robin rebalance (droppable
    // at true scale); no hash/range shuffle — nothing aggregates, joins
    // or sorts the corpus x benchmark product
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      s"a keyed shuffle crept into the scan-side decontam:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"the benchmark product materialized as a join:\n$p")
    assert(!p.contains("Window"), s"window formulation crept in:\n$p")
  }

  test("x230 substring apply indexed: one batch doubling pass + the " +
      "frozen-index semi-join + the fused surgery — corpus text only " +
      "behind the key table, no gram strings, no cartesian") {
    val p = plan("x230_substring_apply_indexed")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert(p.contains("ssidx_"), s"frozen gram-key table not read:\n$p")
    assert(p.contains("LeftSemi"), s"index semi-join missing:\n$p")
    assert("lead\\(_h".r.findAllIn(p).size >= 5,
      s"batch doubling rounds missing:\n$p")
    // the cut is the fused aggregate rewrite, never an explode of text
    assert(p.contains("aggregate("), s"fused surgery missing:\n$p")
    // every documents scan carries the odd-id batch filter — the
    // even-id corpus exists only as its key table
    val scans = "pmod\\(doc_id#\\d+L?, 2\\) = (\\d)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(scans.nonEmpty && scans.forall(_ == "1"),
      s"a corpus-side documents scan crept in:\n$p")
  }

  test("x223 semdedup apply: serves from the PERSISTED drop set — " +
      "broadcast anti-join, no retraining (the nearest-centroid " +
      "kernel never appears at serve time)") {
    val p = plan("x223_semdedup_apply")
    assert(p.contains("semdrop_"), s"persisted drop set not read:\n$p")
    assert(p.contains("LeftAnti"), s"anti-join missing:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"drop set not broadcast:\n$p")
    assert(!p.toLowerCase.contains("nearestcentroidexpr"),
      s"kmeans recomputed at serve time:\n$p")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
  }
}
