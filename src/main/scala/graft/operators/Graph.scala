package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
object Graph {

  /** Mass unit: ranks are integers in units of 1e-9 of total mass. */
  val Unit: Long = 1000000000L

  /** CO-PURCHASE EDGE LIST — directed both ways: for each unordered
    * brand pair sharing an order, `(src, dst, w)` with w = the number
    * of co-occurring orders, emitted in both directions (PageRank
    * treats co-purchase as a symmetric endorsement).
    *
    * Scale shape: the corpus collapses to the DISTINCT (order, brand)
    * frame first; the self-join on the order key is co-partitioned
    * and its per-order fanout is bounded by the brand DICTIONARY
    * (x164's law — ≤ B(B−1) ordered pairs per order however many
    * lines it has); the edge aggregate is dictionary²-bounded. */
  def coPurchaseEdges(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val ob = lineitem.select(col("l_orderkey").as("_ok"),
        col("l_partkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("_ok"), col("p_brand").as("_b"))
      .distinct()
    val l = ob.select(col("_ok"), col("_b").as("src"))
    val r = ob.select(col("_ok"), col("_b").as("dst"))
    l.join(r, Seq("_ok"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** AFFINITY EDGE LIST — [[coPurchaseEdges]] cut to pairs whose
    * co-occurrence exceeds independence (lift > 1, decided as the
    * exact integer cross-product `cb·N > cu1·cu2` — x164's lift with
    * no division): the co-purchase graph keeps every pair two big
    * brands share BY CHANCE; the affinity graph keeps actual
    * association structure, which is what community detection
    * ([[labelPropagation]]) and cohesion audits ([[triangleStats]])
    * are about. Still symmetric, still dictionary-bounded; the only
    * additions are the per-brand totals (dictionary-sized,
    * broadcast) and the 1-row basket count. */
  def affinityEdges(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val ob = lineitem.select(col("l_orderkey").as("_ok"),
        col("l_partkey"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("_ok"), col("p_brand").as("_b"))
      .distinct()
    val totals = ob.groupBy(col("_b")).agg(count(lit(1)).as("_cu"))
    val baskets = ob.agg(countDistinct(col("_ok")).as("_nn"))
    val l = ob.select(col("_ok"), col("_b").as("src"))
    val r = ob.select(col("_ok"), col("_b").as("dst"))
    l.join(r, Seq("_ok"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
      .join(broadcast(totals.select(col("_b").as("src"),
        col("_cu").as("_cu1"))), Seq("src"))
      .join(broadcast(totals.select(col("_b").as("dst"),
        col("_cu").as("_cu2"))), Seq("dst"))
      .crossJoin(broadcast(baskets))
      .filter(col("w").cast("decimal(38,0)") * col("_nn") >
        col("_cu1").cast("decimal(38,0)") * col("_cu2"))
      .select(col("src"), col("dst"), col("w"))
  }

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
    * same precondition as [[pageRank]]). */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var lbl = nodes.withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val next = edges
        .join(lbl.select(col("node").as("src"), col("label").as("_l")),
          Seq("src"))
        .groupBy(col("dst").as("node"), col("_l"))
        .agg(sum(col("w")).as("_w"))
        .groupBy(col("node"))
        .agg(min(struct((-col("_w")).as("nw"), col("_l").as("l")))
          .as("_m"))
        .select(col("node"), col("_m.l").as("_nl"))
      lbl = lbl.join(next, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("_nl"), col("label")).as("label"))
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
    *
    * Scale shape: triangles enumerate ORIENTED — the symmetric list
    * collapses to `src < dst` edges, wedges extend only upward
    * (`a < b < c`), and each triangle is produced exactly once by
    * construction (no count-then-divide). Both joins are equi-joins
    * of the oriented edge list with itself; at million-node scale
    * the standard refinement (orient by degree, not id) bounds
    * wedge fanout by √|E| — same plan, different orientation key.
    * Here every frame is dictionary-bounded. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).distinct()
    val wedges = und
      .join(und.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    val tris = wedges.join(
      und.select(col("a"), col("b").as("c"), lit(1).as("_hit")),
      Seq("a", "c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val degree = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
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
    * aggregate built the edges ([[coPurchaseEdges]]). For
    * million-node graphs the same plan holds with the joins
    * shuffling on node keys instead of broadcasting — the rounds
    * are still linear in |E|. Nodes with no in-edges keep the
    * teleport base (the LEFT join); nodes with no out-edges cannot
    * occur in a symmetric edge list (documented precondition —
    * [[coPurchaseEdges]] emits both directions). */
  def pageRank(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
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
    var pr = base.select(col("node"), col("_pr0").as("pr_units"))
    for (_ <- 1 to iterations) {
      val acc = shares
        .join(pr.select(col("node").as("src"), col("pr_units")), Seq("src"))
        .select(col("dst").as("node"),
          expr(s"(pr_units * share) div ${Unit}L").as("_c"))
        .groupBy(col("node")).agg(sum(col("_c")).as("_acc"))
      pr = base.join(acc, Seq("node"), "left")
        .select(col("node"),
          expr("_base + (85 * coalesce(_acc, 0L)) div 100")
            .as("pr_units"))
    }
    pr
  }
}
