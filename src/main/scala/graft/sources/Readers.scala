package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources and sinks of the reference's file formats (SURVEY.md §2.1),
  * re-expressed as Spark readers/writers.
  */
object Readers {

  /** Y-ERD-style ground-truth TSV (7 cols, header; reference:
    * nordlys/erd/groundtruth/ysqle_erd_gt.py:16-71, fixture
    * data/Y-ERD.tsv:1-4).
    */
  val YerdSchema: StructType = StructType(Seq(
    StructField("difficulty", StringType),
    StructField("qid", StringType),
    StructField("query", StringType),
    StructField("mention", StringType),
    StructField("entity", StringType),
    StructField("set_id", StringType),
    StructField("freebase_id", StringType)))

  def readYerdTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .schema(YerdSchema)
      .csv(path)

  /** ERD challenge query file: 2 cols (qid, query text), no header
    * (reference: nordlys/erd/groundtruth/erd_gt.py:58-78).
    */
  def readErdQueries(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t")
      .schema(StructType(Seq(
        StructField("qid", StringType), StructField("query", StringType))))
      .csv(path)

  /** ERD challenge annotation file: 5 cols (qid, set_id, freebase_id,
    * mention, label), no header (reference:
    * nordlys/erd/groundtruth/erd_gt.py:15-57, fixture
    * data/Trec_beta.annotation.txt). Mention/query preprocessing is the
    * caller's concern (erd_gt applies Query.preprocess — our norm_text).
    */
  def readErdAnnotations(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t")
      .schema(StructType(Seq(
        StructField("qid", StringType), StructField("set_id", StringType),
        StructField("freebase_id", StringType), StructField("mention", StringType),
        StructField("label", StringType))))
      .csv(path)

  /** TREC run sink: `qid Q0 entity rank score run_id`, rank-ordered
    * (reference: nordlys/erd/ml/cer_instances.py:118-131, 223-253).
    * Deterministic ordering via (qid, rank, entity).
    */
  def writeTrecRun(ranked: DataFrame, path: String, runId: String): Unit =
    ranked
      .orderBy(col("qid"), col("rnk"), col("entity"))
      .select(concat_ws("\t", col("qid"), lit("Q0"), col("entity"),
        col("rnk").cast("long"), col("score"), lit(runId)).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(path)

  /** ERD-eval sink: `qid score e1 e2 ...` — one row per emitted set,
    * entities sorted, duplicate sets dropped (reference:
    * nordlys/erd/ml/isf_instances.py:99-110, 139-160;
    * erd_app.py:143-184).
    */
  def writeErdEval(clusters: DataFrame, path: String): Unit =
    clusters
      .groupBy("qid", "set_id")
      .agg(max(col("score")).as("score"),
        array_join(sort_array(collect_set(col("entity"))), "\t").as("entities"))
      .dropDuplicates("qid", "entities")
      .orderBy(col("qid"), col("score").desc)
      // tab-joined line format — text sink, not csv (a csv writer would
      // quote the tab-embedded entities field)
      .select(concat_ws("\t", col("qid"), col("score"), col("entities")).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(path)
}
