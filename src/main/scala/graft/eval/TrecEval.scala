package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranked-retrieval evaluation over TREC-format runs — MAP / P@5 / MRR /
  * recall, macro-averaged over the qrels queries (the computation behind
  * BASELINE.md's candidate-ranking table; run format
  * nordlys/erd/ml/cer_instances.py:118-131, qrels `qid 0 entity 1`).
  *
  * Windows do the per-query scan: cumulative hits over rank order give
  * P@k at every relevant hit; one groupBy finishes each query; one
  * aggregate macro-averages. No per-query driver loop.
  */
object TrecEval {

  case class Result(map: Double, p5: Double, mrr: Double, recall: Double,
                    nQueries: Long)

  /** qrels: whitespace-separated `qid 0 entity rel`; keeps rel == 1 rows. */
  def readQrels(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(trim(col("value")) =!= "")
      .select(split(trim(col("value")), "\\s+").as("c"))
      .where(col("c")(3) === "1")
      .select(col("c")(0).as("qid"), col("c")(2).as("entity"))
      .distinct()

  /** run: tab-separated `qid Q0 entity rank score run_id`. */
  def readRun(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(trim(col("value")) =!= "")
      .select(split(col("value"), "\t").as("c"))
      .select(col("c")(0).as("qid"), col("c")(2).as("entity"),
        col("c")(3).cast("int").as("rank"), col("c")(4).cast("double").as("score"))

  def evaluate(qrels: DataFrame, run: DataFrame): Result = {
    val rel = qrels.withColumn("rel", lit(1))
    val nRel = qrels.groupBy("qid").agg(count(lit(1)).as("n_rel"))

    val w = Window.partitionBy("qid").orderBy(col("rank"), col("score").desc, col("entity"))
    val scan = run
      .join(rel, Seq("qid", "entity"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
      .withColumn("pos", row_number().over(w))
      .withColumn("hits", sum(col("rel")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val perQuery = scan.groupBy("qid").agg(
      sum(when(col("rel") === 1, col("hits").cast("double") / col("pos"))
        .otherwise(0d)).as("ap_num"),
      (sum(when(col("rel") === 1 && col("pos") <= 5, 1).otherwise(0))
        .cast("double") / 5.0).as("p5"),
      coalesce(max(when(col("rel") === 1, lit(1.0) / col("pos"))), lit(0d)).as("rr"),
      sum(col("rel")).cast("double").as("n_hits"))

    // macro-average over the qrels-query universe (a query missing from
    // the run scores 0 across the board)
    val row = nRel
      .join(perQuery, Seq("qid"), "left")
      .select(
        (coalesce(col("ap_num"), lit(0d)) / col("n_rel")).as("ap"),
        coalesce(col("p5"), lit(0d)).as("p5"),
        coalesce(col("rr"), lit(0d)).as("rr"),
        (coalesce(col("n_hits"), lit(0d)) / col("n_rel")).as("recall"))
      .agg(avg("ap"), avg("p5"), avg("rr"), avg("recall"), count(lit(1)))
      .head()
    Result(row.getDouble(0), row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getLong(4))
  }
}
