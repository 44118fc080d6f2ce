package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns near-dup
  * PAIRS (x2/x8/x9 output) into canonical dedup GROUPS: each document is
  * labeled with the minimum id reachable through duplicate edges, so
  * "keep cluster_rep, drop the rest" is one filter.
  *
  * Algorithm: iterative min-label propagation WITH pointer-jumping (the
  * shortcutting step of the star-contraction family, Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"): each round every
  * node takes the min of its own label, its neighbors' labels, AND its
  * label's label (one edge-labels join + one label self-join + one
  * groupBy min). The label-of-label hop doubles the propagation distance
  * each round, so convergence is O(log diameter) — a path graph of
  * diameter 1M settles in ~20 rounds — while dedup graphs (short
  * diameter by construction: near-dup similarity is close to transitive)
  * still settle in 2-4 rounds, now often one fewer than plain
  * propagation. Each round shuffles only (node, label) pairs — at 100 TB
  * the label table is ~1/1000th of the corpus, and the extra self-join
  * is on that small table, not the edges.
  */
object Components {

  /** (node, component) for every node that appears in `edges`;
    * `component` = min node id of the connected component.
    *
    * Each round ends in `localCheckpoint` (eager): iterative plans
    * otherwise NEST the previous round's plan, and lineage grows until
    * plan construction itself dominates (or OOMs) — checkpointing makes
    * every round's cost flat. Convergence is detected by the label-sum
    * probe: the min-label sum strictly decreases on every round that
    * changes anything, so an unchanged sum IS the fixpoint — one tiny
    * aggregate per round instead of a join against the previous state. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 20): DataFrame = {
    // the label-sum convergence probe needs numeric node ids (a null sum
    // would otherwise silently skip propagation for, e.g., string ids)
    Seq(srcCol, dstCol).foreach { c =>
      val dt = edges.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"connectedComponents needs numeric node ids; '$c' is $dt")
    }
    // LAZY checkpoints throughout: the convergence probe (labelSum) is an
    // action over every new generation anyway, so it materializes the
    // checkpoint — one Spark job per round instead of two (eager
    // checkpoint + probe). Lineage is still truncated at materialization.
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .localCheckpoint(false)
    try {
      // init = min(self, direct neighbors): fuses the first propagation
      // round into the same shuffle the plain `distinct` init would pay
      var labels = und.select(col("a").as("node"), col("a").as("lab"))
        .union(und.select(col("a").as("node"), col("b").as("lab")))
        .groupBy(col("node")).agg(min(col("lab")).as("lab"))
        .localCheckpoint(false)
      // null sum <=> empty node set (or non-numeric ids, which the sum
      // probe cannot track) — an empty edge list is just already converged
      def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
        Option(df.agg(sum(col("lab").cast("decimal(38,0)"))).head()
          .getDecimal(0))
      var prevSum = labelSum(labels)
      if (prevSum.isEmpty)
        return labels.select(col("node"), col("lab").as("component"))
      var converged = false
      var i = 0
      while (!converged && i < maxIters) {
        val viaNeighbors = und.join(labels, und("b") === labels("node"))
          .select(und("a").as("node"), col("lab"))
        // pointer jumping: adopt the label OF the current label (labels
        // is keyed by node and every label is a node id, so this is a
        // self-join of the small label table) — propagation distance
        // doubles per round instead of advancing one hop. Engaged from
        // round 3 only: dedup graphs are diameter ≤ 2 by construction
        // and converge before the shortcut could help, so they never pay
        // the extra join (~13% on the x32/x36 benches); an adversarially
        // deep graph still converges in O(log diameter) total rounds.
        val base = labels.select(col("node"), col("lab")).union(viaNeighbors)
        val withHop =
          if (i < 2) base
          else base.union(
            labels.select(col("node"), col("lab").as("_hop"))
              .join(labels.select(col("node").as("_hop"), col("lab")), "_hop")
              .select(col("node"), col("lab")))
        val next = withHop
          .groupBy(col("node")).agg(min(col("lab")).as("lab"))
          .localCheckpoint(false)
        val nextSum = labelSum(next)
        labels.unpersist() // keep exactly one live label generation
        labels = next
        converged = nextSum == prevSum
        prevSum = nextSum
        i += 1
      }
      // exhausting maxIters without a fixpoint would silently report one
      // component as several clusters — fail loudly instead (with
      // pointer jumping, maxIters rounds cover diameter ~2^maxIters, so
      // hitting this means maxIters was set very low)
      if (!converged) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          s"(pointer-jumped propagation covers diameter ~2^$maxIters); " +
          "raise maxIters")
      labels.select(col("node"), col("lab").as("component"))
    } finally und.unpersist()
  }
}
