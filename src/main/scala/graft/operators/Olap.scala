package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Dates, Num}

/** Multi-dimensional OLAP shapes over the landed star schema — the
  * report layer a warehouse user builds on top of the reference's
  * tables: grouping-set rollups, cross-tab pivots, column profiling and
  * dominance (Pareto-frontier) views. All expressed as single-pass
  * declarative aggregates so Catalyst's Expand/partial-agg machinery
  * does the work — no per-cell re-scans, no driver loops.
  */
object Olap {

  /** ROLLUP revenue cube (x157) — `(nation, order-year)` revenue with
    * the classic subtotal hierarchy: detail rows, per-nation subtotals
    * and a grand total in ONE pass (`GROUP BY ROLLUP`). Rolled-up
    * dimensions print as `'ALL'` (the fixture dims are never null, so
    * the sentinel is unambiguous) and `grp_level` = how many dims were
    * rolled up (0 = detail, 2 = grand total) via engine-independent
    * `grouping()` sums — NOT `grouping_id()`, whose bit order is an
    * engine convention.
    *
    * Scale shape: Spark plans rollup as one Expand (3 replicas of each
    * row — the grouping-set count, a constant) feeding a single partial
    * + final hash aggregate: one shuffle keyed on the expanded grouping
    * key, map-side combine intact. The nation dim broadcasts; the
    * orders↔customer join shuffles on the customer key once.
    * Monetary sums are order-independent DECIMAL(38,6) ([[Num.dsum]]).
    */
  def rollupRevenue(orders: DataFrame, customer: DataFrame,
                    nation: DataFrame): DataFrame = {
    val joined = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation),
        customer("c_nationkey") === nation("n_nationkey"))
      .select(col("n_name").as("_nat"),
        year(col("o_orderdate")).cast("long").as("_yr"),
        Num.fpRound(col("o_totalprice"), 4).as("_v"))
    joined.rollup(col("_nat"), col("_yr"))
      .agg(count(lit(1)).as("n_orders"), Num.dsum(col("_v")).as("revenue"),
        (grouping(col("_nat")) + grouping(col("_yr")))
          .cast("int").as("grp_level"))
      .select(coalesce(col("_nat"), lit("ALL")).as("nation"),
        coalesce(col("_yr").cast("string"), lit("ALL")).as("order_year"),
        col("grp_level"), col("n_orders"), col("revenue"))
  }

  /** Cross-tab PIVOT (x158) — order revenue by year × market segment,
    * one column per segment (the spreadsheet shape every BI tool
    * exports). `segments` must be the full declared domain: an
    * explicit value list keeps the plan a single pass (Spark's
    * auto-pivot first runs a distinct-collect job to discover values —
    * a corpus-sized extra pass at 100 TB — and makes the output schema
    * data-dependent, which no downstream contract wants).
    *
    * Scale shape: pivot compiles to one hash aggregate keyed on year
    * whose per-segment conditional sums are Expand-free (each input row
    * feeds exactly its own segment's aggregate); one shuffle on the
    * year key after the customer-key join. Cells with no orders stay
    * NULL (both engines' empty-SUM law). */
  def segmentPivot(orders: DataFrame, customer: DataFrame,
                   segments: Seq[String]): DataFrame = {
    require(segments.nonEmpty, "segments must be non-empty")
    require(segments.distinct.size == segments.size,
      s"segments must be distinct, got $segments")
    val joined = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .select(year(col("o_orderdate")).cast("long").as("order_year"),
        col("c_mktsegment").as("_seg"),
        Num.fpRound(col("o_totalprice"), 4).as("_v"))
    val pivoted = joined.groupBy(col("order_year"))
      .pivot("_seg", segments)
      .agg(Num.dsum(col("_v")))
    // stable lower-cased *_rev column names, independent of the pivot
    // value spelling
    val renamed = segments.foldLeft(pivoted) { (df, s) =>
      df.withColumnRenamed(s, s.toLowerCase + "_rev")
    }
    renamed.select(col("order_year") +:
      segments.map(s => col(s.toLowerCase + "_rev")): _*)
  }

  /** COLUMN PROFILE CARD (x159) — per-column data-quality stats for a
    * table, long form: `(col_name, n_rows, n_nulls, n_distinct, min_num,
    * max_num, min_str, max_str)`. Numeric/timestamp columns carry
    * min/max as doubles (timestamps as epoch-ms — exact below 2^53);
    * string columns carry lexicographic min/max; each family's other
    * pair is NULL. The first screen of any ingestion audit — x51's data
    * card profiles the corpus, this profiles any relational table.
    *
    * Scale shape: one COLUMN-PRUNED scan per profiled column, unioned
    * as 1-row aggregates. The tempting alternative — a single
    * all-columns scan with N `count(DISTINCT …)` — compiles to an
    * Expand that replicates EVERY ROW once per column (N× the scan's
    * row volume through one shuffle; measured 25 s → 3 s on the sf0.1
    * fixture). On a columnar store the per-column scans read the same
    * total bytes with no replication, each feeding an independent
    * two-phase distinct aggregate — embarrassingly parallel across
    * columns, no job touches more than one column's bytes. */
  def profileCard(df: DataFrame, numCols: Seq[String],
                  strCols: Seq[String],
                  tsCols: Seq[String] = Seq.empty): DataFrame = {
    val all = numCols ++ strCols ++ tsCols
    require(all.nonEmpty, "profile needs at least one column")
    require(all.distinct.size == all.size, s"duplicate columns in $all")
    def numExpr(c: String): Column =
      if (tsCols.contains(c)) Dates.toEpochMillis(col(c)).cast("double")
      else col(c).cast("double")
    val legs = all.map { c =>
      val isStr = strCols.contains(c)
      df.select(col(c))
        .agg(count(lit(1)).as("_rows"), count(col(c)).as("_nn"),
          count_distinct(col(c)).as("n_distinct"),
          min(if (isStr) lit(null).cast("double") else numExpr(c))
            .as("min_num"),
          max(if (isStr) lit(null).cast("double") else numExpr(c))
            .as("max_num"),
          min(if (isStr) col(c) else lit(null).cast("string"))
            .as("min_str"),
          max(if (isStr) col(c) else lit(null).cast("string"))
            .as("max_str"))
        .select(lit(c).as("col_name"), col("_rows").as("n_rows"),
          (col("_rows") - col("_nn")).as("n_nulls"), col("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    legs.reduce(_.unionByName(_))
  }

  /** CHI-SQUARE INDEPENDENCE TEST (x170) — are two categorical
    * dimensions independent: the contingency table of exact integer
    * cell counts, expected `E = R·C/N` from the margins, and
    * `χ² = Σ (O−E)²/E`. Each cell's term is computed through the SAME
    * mirrored IEEE expression in both engines from the same exact
    * integers, then rounded to the 1e-6 grid and summed as decimals —
    * the term-by-term float recipe, since raw double terms would sum
    * in shuffle order. Output: one row `(n, n_rows, n_cols, dof,
    * chi2)`. χ² ≫ dof ⇒ the dims are dependent — the segmentation-
    * sanity test behind every cross-tab report (x158 shows the cells;
    * this says whether the pattern is real). UNOBSERVED (A, B)
    * combinations still contribute `(0−E)²/E` — the margin grid, not
    * the observed-cell set, is the summation domain (a perfectly
    * dependent 2×2 would otherwise read half its χ²).
    *
    * Scale shape: one corpus aggregate to the DICTIONARY-bounded cell
    * table; margins re-aggregate from the cells (not the corpus), the
    * full margin grid is dictionary² rows, and everything past the
    * first aggregate is broadcast-sized. */
  def chiSquare(df: DataFrame, dimA: String, dimB: String): DataFrame = {
    val cells = df.select(col(dimA).as("_a"), col(dimB).as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
    val rowTot = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_r"))
    val colTot = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_c"))
    val tot = cells.agg(sum(col("_o")).as("_n"),
      count_distinct(col("_a")).as("n_rows"),
      count_distinct(col("_b")).as("n_cols"))
    val grid = rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("_a", "_b"), "left")
      .withColumn("_obs", coalesce(col("_o"), lit(0L)))
    val e = col("_r").cast("double") * col("_c") / col("_n")
    val term = (col("_obs").cast("double") - e) * (col("_obs") - e) / e
    grid
      .crossJoin(broadcast(tot))
      .select(col("_n"), col("n_rows"), col("n_cols"),
        Num.fpRound(term, 6).as("_t"))
      .groupBy(col("_n").as("n"), col("n_rows"), col("n_cols"),
        ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"))
      .agg(Num.dsum(col("_t")).as("chi2"))
  }

  /** MUTUAL INFORMATION (x197) — the dependence STRENGTH x170's
    * chi-square only tests the existence of: `I(A;B) = Σ p_ab ·
    * ln(p_ab / (p_a·p_b))` in nats over two categorical columns,
    * reported next to both marginal entropies (so the reader can
    * normalize by min(H) if they want a [0,1] score). Zero cells
    * contribute zero (`lim p→0 p·ln p = 0`), so unlike chi-square no
    * margin grid is needed — only observed cells carry terms.
    *
    * Exactness: every count is an exact integer; each cell term is
    * ONE mirrored double expression `(o/N)·ln(o·N/(r·c))`, 1e-6-grid
    * rounded and decimal-summed (x170's shuffle-order-free term
    * law); same for the two entropy legs.
    *
    * Scale shape: one corpus aggregate to the (A × B) cell table,
    * then everything is dictionary-sized — margins broadcast, three
    * bounded term sums, a 1-row result. */
  def mutualInformation(df: DataFrame, dimA: String,
                        dimB: String): DataFrame = {
    val cells = df.select(col(dimA).as("_a"), col(dimB).as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
    val rowTot = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_r"))
    val colTot = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_c"))
    val tot = cells.agg(sum(col("_o")).as("_n"))
    val miTerm = (col("_o").cast("double") / col("_n")) *
      log(col("_o").cast("double") * col("_n") /
        (col("_r").cast("double") * col("_c")))
    val mi = cells
      .join(broadcast(rowTot), Seq("_a"))
      .join(broadcast(colTot), Seq("_b"))
      .crossJoin(broadcast(tot))
      .select(Num.fpRound(miTerm, 6).as("_t"))
      .agg(Num.dsum(col("_t")).as("mi_nats"))
    def entropy(margin: DataFrame, cnt: String) = margin
      .crossJoin(broadcast(tot))
      .select(Num.fpRound((col(cnt).cast("double") / col("_n")) *
        log(col("_n").cast("double") / col(cnt)), 6).as("_t"))
      .agg(Num.dsum(col("_t")))
    tot.crossJoin(broadcast(mi))
      .crossJoin(broadcast(entropy(rowTot, "_r").toDF("h_a")))
      .crossJoin(broadcast(entropy(colTot, "_c").toDF("h_b")))
      .select(col("_n").cast("long").as("n"), col("mi_nats"),
        col("h_a"), col("h_b"))
  }

  /** PARETO FRONTIER / skyline (x160) — the non-dominated parts under
    * (minimize `p_size`, maximize `p_retailprice`): a part is dominated
    * iff some part is no larger AND no cheaper-to-retail, strictly
    * better on at least one axis. The textbook skyline needs an
    * all-pairs dominance test; under a total order on one axis it
    * collapses to a running max — a part is on the frontier iff its
    * price equals its size's best price AND strictly exceeds every
    * smaller size's best.
    *
    * Scale shape: one corpus aggregate to `(size, best_price)` — a
    * DICTIONARY-bounded frame (≤ the distinct-size count, ~50 here;
    * sizes are a small-int domain at any corpus scale) — so the running
    * max is a window over a dictionary-sized frame (documented
    * single-partition, like the x111 Zipf rank), and the frontier
    * filter joins back BROADCAST. No pair join anywhere. */
  def paretoFront(part: DataFrame, keyCol: String = "p_partkey",
                  sizeCol: String = "p_size",
                  priceCol: String = "p_retailprice"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val best = part.groupBy(col(sizeCol).as("_sz"))
      .agg(max(col(priceCol)).as("_best"))
    // strictly-smaller sizes' best price (NULL for the smallest size)
    val wPrev = Window.orderBy(col("_sz"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierSizes = best
      .withColumn("_prevBest", max(col("_best")).over(wPrev))
      .filter(col("_prevBest").isNull || col("_best") > col("_prevBest"))
      .select(col("_sz"), col("_best"))
    part.join(broadcast(frontierSizes),
        col(sizeCol) === col("_sz") && col(priceCol) === col("_best"))
      .select(col(keyCol), col(sizeCol), col(priceCol))
  }
}
