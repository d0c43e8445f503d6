package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strict macro interpretation-set evaluator — the Spark re-expression of
  * the reference evaluator (scripts/evaluator_strict.py:83-175):
  *
  *  - a query's interpretation sets match by exact set equality
  *    (entities deduped, order-insensitive; :161-175);
  *  - per-query P/R; a query with empty qrels scores P=R=1 iff its
  *    results are also empty, else 0 (:137-140);
  *  - macro average over the *qrels* queries, F1 of the averaged P and R
  *    (:96-101) — not the average of per-query F1s;
  *  - duplicate identical sets for one query are rejected loudly
  *    (:72-81, the reference exits).
  *
  * Relational shape: sets normalize to sorted deduped arrays, the match
  * is one (qid, entities) semi-join — evaluation cost is O(|sets|),
  * never a per-query cross-product.
  */
object StrictEval {

  case class Result(precision: Double, recall: Double, f1: Double, nQueries: Long)

  /** Parse a qrels or erdeval-format file: `qid[<TAB>label/score<TAB>e1...]`.
    * A bare `qid` line registers the query with zero sets. Returns
    * (qids, sets(qid, entities: sorted deduped array)).
    */
  def readSetsFile(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val lines = spark.read.text(path)
      .where(trim(col("value")) =!= "")
      .select(split(col("value"), "\t").as("cols"))
    val qids = lines.select(col("cols")(0).as("qid")).distinct()
    val sets = lines.where(size(col("cols")) > 2)
      .select(col("cols")(0).as("qid"),
        sort_array(array_distinct(slice(col("cols"), 3, Int.MaxValue))).as("entities"))
    (qids, sets)
  }

  private def rejectDuplicates(sets: DataFrame, what: String): Unit = {
    val dups = sets.groupBy("qid", "entities").count().where(col("count") > 1)
    val bad = dups.select("qid").limit(1).collect()
    require(bad.isEmpty,
      s"identical interpretations for query [${bad.head.getString(0)}] in $what " +
        "(evaluator_strict.py:72-81 rejects this)")
  }

  /** Per-query precision/recall frame: (qid, nq, nr, tp, prec, rec) over
    * the qrels-query universe.
    */
  def perQuery(qrelQids: DataFrame, qrelSets: DataFrame, resSets: DataFrame): DataFrame = {
    rejectDuplicates(qrelSets, "qrels")
    rejectDuplicates(resSets, "results")
    val tp = qrelSets.join(resSets, Seq("qid", "entities"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("tp"))
    val nq = qrelSets.groupBy("qid").agg(count(lit(1)).as("nq"))
    val nr = resSets.groupBy("qid").agg(count(lit(1)).as("nr"))
    qrelQids
      .join(nq, Seq("qid"), "left")
      .join(nr, Seq("qid"), "left")
      .join(tp, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("nq"), lit(0L)).as("nq"),
        coalesce(col("nr"), lit(0L)).as("nr"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      // sets are deduped, so every matched result set equals exactly one
      // qrel set: fp = nr - tp and prec = tp/(tp+fp) = tp/nr
      .withColumn("prec",
        when(col("nq") === 0, when(col("nr") === 0, 1.0).otherwise(0.0))
          .otherwise(when(col("nr") === 0, 0.0)
            .otherwise(col("tp").cast("double") / col("nr"))))
      .withColumn("rec",
        when(col("nq") === 0, when(col("nr") === 0, 1.0).otherwise(0.0))
          .otherwise(col("tp").cast("double") / col("nq")))
  }

  /** Evaluate a results file against a qrels file (both set-format). */
  def evaluate(spark: SparkSession, qrelsPath: String, resultsPath: String): Result = {
    val (qQids, qSets) = readSetsFile(spark, qrelsPath)
    val (rQids, rSets) = readSetsFile(spark, resultsPath)
    require(!qQids.join(rQids, Seq("qid"), "left_semi").isEmpty,
      "query mismatch between qrel and result file (no qid overlap)")
    val per = perQuery(qQids, qSets, rSets)
    val row = per.agg(avg("prec"), avg("rec"), count(lit(1))).head()
    val (p, r, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    val f = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    Result(p, r, f, n)
  }
}
