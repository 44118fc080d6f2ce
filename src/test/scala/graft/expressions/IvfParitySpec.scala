package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

import graft.{SparkSpec, Tables}
import graft.functions.Vectors

/** Pins the per-row IVF kernels (nearestCentroid / probeCentroids) to the
  * round-1 cross-join + ranking-window formulation on REAL embeddings —
  * same argmax, same (cosine desc, id asc) tie-break, else x10/x22 bucket
  * contents silently drift from the DuckDB oracle. */
class IvfParitySpec extends SparkSpec {

  private lazy val emb =
    Tables(spark, "/root/testdata/sf0.001", "embeddings")

  private lazy val centDf = emb.filter(col("vec_id") < 16)

  private lazy val collected = {
    val rows = centDf.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  test("nearestCentroid kernel == cross-join + ranking window argmax") {
    val (ids, vecs) = collected
    val kernel = emb.select(col("vec_id"),
      VectorExpressions.nearestCentroid(col("embedding"), ids, vecs)
        .as("centroid_id"))
    val cent = centDf.select(col("vec_id").as("centroid_id"),
      col("embedding").as("centv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(Vectors.cosine(col("embedding"), col("centv")).desc,
        col("centroid_id"))
    val ref = emb.join(broadcast(cent), lit(true))
      .withColumn("arn", row_number().over(w))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("centroid_id"))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("probeCentroids kernel == ranking window top-nprobe") {
    val (ids, vecs) = collected
    val nprobe = 3
    val kernel = emb.select(col("vec_id"),
        explode(VectorExpressions.probeCentroids(
          col("embedding"), ids, vecs, nprobe)).as("centroid_id"))
    val cent = centDf.select(col("vec_id").as("centroid_id"),
      col("embedding").as("centv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(Vectors.cosine(col("embedding"), col("centv")).desc,
        col("centroid_id"))
    val ref = emb.join(broadcast(cent), lit(true))
      .withColumn("prn", row_number().over(w))
      .filter(col("prn") <= nprobe)
      .select(col("vec_id"), col("centroid_id"))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }
}
