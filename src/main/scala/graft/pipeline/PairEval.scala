package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise precision / recall / F1 against the labeled-pairs table —
  * strict semantics adapted from the reference evaluator
  * (scripts/evaluator_strict.py:124-158): a labeled positive pair counts
  * iff both members land in the *same* predicted cluster; a labeled
  * negative pair counts against precision iff they are linked.
  *
  * Joined per-member, so it never enumerates cluster cross-products —
  * evaluation cost is O(|labels|), independent of cluster sizes.
  */
object PairEval {

  case class Result(tp: Long, fp: Long, fn: Long, tn: Long) {
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
  }

  /** assignment(conv_id, cluster_id) × labels(conv_a, conv_b, label) */
  def pairwise(assignment: DataFrame, labels: DataFrame): Result = {
    val a = assignment.select(col("conv_id").as("conv_a"), col("cluster_id").as("cl_a"))
    val b = assignment.select(col("conv_id").as("conv_b"), col("cluster_id").as("cl_b"))
    val joined = labels
      .join(a, Seq("conv_a"), "left")
      .join(b, Seq("conv_b"), "left")
      .withColumn("same",
        col("cl_a").isNotNull && col("cl_b").isNotNull && col("cl_a") === col("cl_b"))
    // coalesce: sum over zero labeled rows is NULL, not 0
    def cnt(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val row = joined.agg(
      cnt(col("label") === 1 && col("same")).as("tp"),
      cnt(col("label") === 0 && col("same")).as("fp"),
      cnt(col("label") === 1 && !col("same")).as("fn"),
      cnt(col("label") === 0 && !col("same")).as("tn")).head()
    Result(row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }
}
