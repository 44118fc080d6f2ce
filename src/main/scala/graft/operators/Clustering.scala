package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

import graft.functions.Par

/** Centroid fitting for the IVF similarity/near-dup path (SURVEY §2.4 X3
  * scale path): Lloyd's k-means over an `array<float>` embedding column.
  *
  * The loop is driver-iterative but each iteration is fully distributed
  * and cheap in data movement:
  *  - assignment is the per-row NearestCentroid kernel (scan-side, no
  *    shuffle, no k-fold row blowup);
  *  - the mean recompute shuffles only (centroid, dim) partial sums —
  *    k x dim groups after map-side partial aggregation, independent of
  *    corpus size;
  *  - only the k x dim centroid table (a few KB) ever reaches the driver.
  *
  * Initialization is deterministic (the k lowest-id vectors), so a fit is
  * reproducible run-to-run up to floating-point summation order.
  */
object Clustering {

  final case class KMeansModel(ids: Array[Long], centroids: Array[Array[Float]]) {
    /** Scan-side bucket assignment using the fitted centroids. An empty
      * model (fit on an empty corpus) assigns nothing. */
    def assign(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
      if (ids.isEmpty)
        corpus.withColumn("centroid_id", lit(null).cast("long")).limit(0)
      else corpus.withColumn("centroid_id",
        VectorExpressions.nearestCentroid(col(vecCol), ids, centroids))
  }

  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int): KMeansModel = {
    val spark = corpus.sparkSession
    val corp = Par.spread(corpus.select(col(idCol).as("_id"),
      col(vecCol).as("_v"))).cache()
    try {
      // deterministic init: the k lowest-id vectors
      val init = corp.orderBy(col("_id")).limit(k).collect()
        .map(r => (Similarity.integralId(r.get(0), idCol),
          r.getSeq[Float](1).toArray))
      if (init.isEmpty) return KMeansModel(Array.empty, Array.empty)
      var ids = init.map(_._1)
      var cents = init.map(_._2)
      var it = 0
      while (it < iters) {
        // assign (scan-side kernel) then recompute per-dimension means;
        // the shuffle carries k*dim partial sums, not corpus rows
        val means = corp
          .withColumn("_c", VectorExpressions.nearestCentroid(col("_v"), ids, cents))
          .select(col("_c"), posexplode(col("_v")).as(Seq("_d", "_x")))
          .groupBy(col("_c"), col("_d"))
          .agg(avg(col("_x")).as("_m"))
          .collect()
        val byCentroid = means.groupBy(_.getLong(0))
        val next = ids.zipWithIndex.map { case (cid, i) =>
          byCentroid.get(cid) match {
            case Some(rows) =>
              val dims = rows.map(r => (r.getInt(1), r.getDouble(2).toFloat))
                .sortBy(_._1).map(_._2)
              dims
            case None => cents(i) // empty cluster keeps its centroid
          }
        }
        // re-key centroids 0..k-1 after the first recompute: buckets are
        // positions now, not corpus vector ids (next.length <= k when the
        // corpus has fewer than k vectors)
        ids = Array.tabulate(next.length)(_.toLong)
        cents = next
        it += 1
      }
      KMeansModel(ids, cents)
    } finally corp.unpersist()
  }
}
