package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-comparison metrics between two assignments of the same
  * universe — pairwise precision/recall/F1 (the same pair-counting
  * family as `pipeline.PairEval`, but cluster-vs-cluster instead of
  * cluster-vs-labeled-pairs) plus the split/merge/stable census.
  *
  * This is the monitoring view for the engine's maintenance surfaces:
  * run it between the clusters snapshot before and after an
  * [[graft.pipeline.IncrementalPipeline]] delta ingest (how much did
  * the delta move?), after a retraction (did healing stay local?), or
  * between a streaming backfill and its batch recompute. The
  * incremental/retract specs assert exact parity; this operator
  * quantifies NON-parity when drift is the expected outcome (e.g. the
  * documented retained-recall divergence window).
  *
  * Scale shape: one inner join on the id + aggregations over cluster
  * ids and (old, new) overlap cells. Pair counts come from Σ C(size, 2)
  * per group — no pair materialization anywhere, so the quadratic
  * pairwise metrics cost a groupBy even on billion-row clusterings.
  */
object ClusterDiff {

  /** One-row comparison of `oldAssign` vs `newAssign`, both
    * (idCol, clusterCol). Metrics are computed over the ids present in
    * BOTH inputs (n_ids); ids_only_old / ids_only_new report the
    * universe drift (e.g. deleted or newly ingested conversations).
    *
    * Pairwise metrics treat the old assignment as reference:
    * precision = co-clustered-in-both / co-clustered-in-new,
    * recall = co-clustered-in-both / co-clustered-in-old.
    * Census: a stable cluster is an old cluster whose member set IS a
    * new cluster (one overlap cell covering both sides entirely);
    * n_split counts old clusters scattered over >1 new cluster;
    * n_merged counts new clusters drawing from >1 old cluster.
    * Ratios rounded to 6 places for bit-exact oracle replay.
    */
  def summarize(oldAssign: DataFrame, newAssign: DataFrame,
                idCol: String = "conv_id",
                clusterCol: String = "cluster_id"): DataFrame = {
    val o = oldAssign.select(col(idCol).as("id"), col(clusterCol).as("ocid"))
    val n = newAssign.select(col(idCol).as("id"), col(clusterCol).as("ncid"))

    val joined = o.join(n, Seq("id"))
    // four aggregate branches read the overlap cells (old/new sizes,
    // stable census, pair totals): materialize the join + groupBy once —
    // cells are at most one row per id, so this is always small
    val cells = joined.groupBy("ocid", "ncid").agg(count(lit(1)).as("nv"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

    val oldSizes = cells.groupBy("ocid").agg(
      sum("nv").as("so"), count(lit(1)).as("fanout"))
    val newSizes = cells.groupBy("ncid").agg(
      sum("nv").as("sn"), count(lit(1)).as("fanin"))

    // stable: the cell covers its whole old cluster AND whole new cluster
    val stable = cells
      .join(oldSizes.select(col("ocid"), col("so")), Seq("ocid"))
      .join(newSizes.select(col("ncid"), col("sn")), Seq("ncid"))
      .where(col("nv") === col("so") && col("nv") === col("sn"))
      .agg(count(lit(1)).as("n_stable"))

    val oldAgg = oldSizes.agg(
      count(lit(1)).as("n_clusters_old"),
      sum(col("so") * (col("so") - 1) / 2).cast("long").as("pairs_old"),
      sum(when(col("fanout") > 1, 1L).otherwise(0L)).as("n_split"))
    val newAgg = newSizes.agg(
      count(lit(1)).as("n_clusters_new"),
      sum(col("sn") * (col("sn") - 1) / 2).cast("long").as("pairs_new"),
      sum(when(col("fanin") > 1, 1L).otherwise(0L)).as("n_merged"))
    val bothAgg = cells.agg(
      sum(col("nv") * (col("nv") - 1) / 2).cast("long").as("pairs_both"),
      sum("nv").as("n_ids"))

    val onlyOld = o.join(n, Seq("id"), "left_anti")
      .agg(count(lit(1)).as("ids_only_old"))
    val onlyNew = n.join(o, Seq("id"), "left_anti")
      .agg(count(lit(1)).as("ids_only_new"))

    val p = col("pairs_both").cast("double") /
      greatest(col("pairs_new"), lit(1L)).cast("double")
    val r = col("pairs_both").cast("double") /
      greatest(col("pairs_old"), lit(1L)).cast("double")
    bothAgg.crossJoin(oldAgg).crossJoin(newAgg).crossJoin(stable)
      .crossJoin(onlyOld).crossJoin(onlyNew)
      .withColumn("pairwise_precision", round(p, 6))
      .withColumn("pairwise_recall", round(r, 6))
      .withColumn("pairwise_f1",
        round(when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6))
      .select(col("n_ids"), col("ids_only_old"), col("ids_only_new"),
        col("n_clusters_old"), col("n_clusters_new"), col("n_stable"),
        col("n_split"), col("n_merged"),
        col("pairs_old"), col("pairs_new"), col("pairs_both"),
        col("pairwise_precision"), col("pairwise_recall"), col("pairwise_f1"))
  }
}
