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
    *
    * Top-k via the bounded [[graft.functions.TopKByScore]] aggregate, NOT
    * a per-query window: the aggregate reduces to ≤ k entries per
    * partition map-side, so the shuffle moves k·partitions entries per
    * query — the window plan shuffled all corpus×|q| scored rows into one
    * task per query, a guaranteed straggler at 100× corpus.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", round(cosine_sim(col("qv"), col("cv")), 6))
    topKPerQuery(scored, k, corpus.schema(idCol).dataType)
  }

  /** scored(query_id, nbr_id, cosine) → per-query top-k with dense 1-based
    * ranks, ordered (cosine desc, nbr_id) — the shared reduction tail of
    * brute-force and IVF search. Ids ride through the aggregator as longs;
    * `idType` restores the caller's id type on the way out.
    */
  private def topKPerQuery(scored: DataFrame, k: Int,
                           idType: org.apache.spark.sql.types.DataType): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKByScore.topk(k,
        col("cosine"), col("nbr_id").cast("long")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col._2").cast(idType).as("nbr_id"),
        col("col._1").as("cosine"), (col("pos") + 1).as("rnk"))

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

    val scored = probes.join(assigned, "cell")
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", round(cosine_sim(col("qv"), col("cv")), 6))
    topKPerQuery(scored, k, corpus.schema(idCol).dataType)
  }

  /** Spherical k-means codebook: `iters` Lloyd rounds over the corpus —
    * assign each vector to its cosine-argmax cell ([[ivfAssign]]'s exact
    * expression), new centroid = per-cell mean renormalized; cells left
    * empty keep their previous centroid. Seeds are the first nCells
    * vectors by id, so the whole procedure is deterministic.
    *
    * Every centroid coordinate is rounded to 1e-6 after each round: the
    * per-cell mean is a shuffle aggregate whose summation order is not
    * deterministic, and an unrounded codebook would let float noise flip
    * argmax assignments between runs (and against the DuckDB oracle).
    *
    * Each round is one narrow pass over the corpus (per-row argmax, no
    * fan-out) plus a (cell, dim)-sized aggregate — the codebook is the
    * driver-side index artifact, exactly how an IVF index is trained on a
    * real cluster (the codebook is tiny; the corpus never moves).
    */
  def kmeansCentroids(corpus: DataFrame, nCells: Int, iters: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    def roundArr(v: Array[Double]) = v.map(x => math.rint(x * 1e6) / 1e6)
    def normalize(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var cents = collectNormalizedCentroids(corpus, nCells, idCol, vecCol).map(roundArr)
    for (_ <- 1 to iters) {
      val means = corpus
        .select(col(vecCol).cast("array<double>").as("cv"))
        .withColumn("cell", nearest_centroid(col("cv"), cents))
        .select(col("cell"), posexplode(col("cv")))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (prev, i) =>
        byCell.get(i + 1) match { // cells are 1-based
          case Some(rows) =>
            val v = new Array[Double](prev.length)
            rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
            roundArr(normalize(roundArr(v)))
          case None => prev
        }
      }
    }
    cents
  }

  /** IVF with a k-means-trained codebook: train via [[kmeansCentroids]],
    * assign corpus rows by per-row argmax, probe the nProbe best cells per
    * query, exact cosine within probed cells. `iters` = 0 degrades to the
    * seed codebook (≡ [[ivfTopK]] cells).
    */
  def ivfTopKTrained(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int,
                     nProbe: Int, iters: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val cents = kmeansCentroids(corpus, nCells, iters, idCol, vecCol)
    val assigned = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      .withColumn("cell", nearest_centroid(col("cv"), cents))
    val centDf = spark.createDataFrame(
      cents.toIndexedSeq.zipWithIndex.map { case (v, i) => (i + 1, v.toSeq) })
      .toDF("cell", "centroid")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cent_sim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("cent_sim", round(cosine_sim(col("qv"), col("centroid")), 6))
      .withColumn("r", row_number().over(wProbe))
      .where(col("r") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = probes.join(assigned, "cell")
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", round(cosine_sim(col("qv"), col("cv")), 6))
    topKPerQuery(scored, k, corpus.schema(idCol).dataType)
  }

  private def centroids(corpus: DataFrame, nCells: Int, idCol: String, vecCol: String) = {
    // unpartitioned Window is safe HERE only: it runs over the
    // limit(nCells) result (≤ codebook size, driver-bounded by design),
    // never over the corpus
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
