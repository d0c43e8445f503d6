package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline (and is exact); IVF is the
  * scale path: cluster the corpus into cells around deterministic seed
  * centroids, search only the `nProbe` closest cells per query. Both are
  * pure DataFrame plans — the "index" is just a bucketed table, which is
  * exactly how an IVF index looks as a lakehouse artifact (cell id =
  * partition key; at 100 TB the cell assignment table is written once,
  * bucketed by cell, and queries join against only the probed cells).
  */
object SimilaritySearch {

  /** Exact top-k neighbors by cosine for each query vector.
    * queries is expected to be small (broadcast side of the join).
    * Deterministic ordering: (rounded sim desc, corpus id) so float
    * noise in the last ulp cannot reorder results across engines.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", round(cosine_sim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("nbr_id"), col("cosine"), col("rnk"))
  }

  /** IVF cell assignment: nearest of `nCells` seed centroids (the first
    * nCells corpus vectors by id — deterministic, no trained k-means in
    * v1). Returns corpus rows + cell id.
    *
    * The centroid matrix is tiny (it is the index artifact — on a real
    * cluster a trained k-means codebook), so it is collected once,
    * L2-normalized, and carried into generated code as a reference object:
    * assignment is a per-row argmax — zero fan-out, zero shuffle, one
    * narrow pass over the corpus. (Round 1 exploded corpus×nCells rows
    * through a per-id window: a full shuffle of the fan-out, fatal at
    * 100× corpus.)
    */
  def ivfAssign(corpus: DataFrame, nCells: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = collectNormalizedCentroids(corpus, nCells, idCol, vecCol)
    corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      .withColumn("cell", nearest_centroid(col("cv"), cents))
  }

  /** IVF top-k: probe the `nProbe` closest cells per query, exact cosine
    * within probed cells. Recall < 1 by construction; the bench compares
    * it against bruteForceTopK.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int, nProbe: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids(corpus, nCells, idCol, vecCol)
    val assigned = ivfAssign(corpus, nCells, idCol, vecCol)

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cent_sim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("cent_sim", cosine_sim(col("qv"), col("centroid")))
      .withColumn("r", row_number().over(wProbe))
      .where(col("r") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("nbr_id"))
    probes.join(assigned, "cell")
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", round(cosine_sim(col("qv"), col("cv")), 6))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("nbr_id"), col("cosine"), col("rnk"))
  }

  private def centroids(corpus: DataFrame, nCells: Int, idCol: String, vecCol: String) = {
    val w = Window.orderBy(col(idCol))
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol), col(vecCol).as("centroid"))
      .withColumn("cell", row_number().over(w))
      .select(col("cell"), col("centroid"))
  }

  /** Driver-side codebook: first nCells vectors by id, L2-normalized so
    * dot-product argmax equals cosine argmax. Cell j ↔ matrix row j-1 —
    * the same numbering [[centroids]] produces for the probe side.
    */
  private def collectNormalizedCentroids(corpus: DataFrame, nCells: Int,
                                         idCol: String, vecCol: String): Array[Array[Double]] =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map { row =>
        val v = row.getSeq[Double](0).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0.0) v else v.map(_ / n)
      }
}
