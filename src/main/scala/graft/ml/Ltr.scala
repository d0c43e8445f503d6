package graft.ml

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier, RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions._

/** Learning-to-rank over the engine's feature families — the reference's
  * LTR stack re-expressed on Spark MLlib:
  *
  *  - model: Random Forest classifier, score = P(target = 1)
  *    (nordlys/ml/ml.py:105-117 RF branch + ml.py:189-193 predict_proba;
  *    the shipped best runs use `-ltr-t1000-m3` = 1000 trees, 3 features
  *    per split — runs/cer/yerd-ltr.run header);
  *  - k-fold cross-validation GROUPED BY SESSION so queries from one
  *    session never straddle a train/test boundary
  *    (nordlys/ml/cross_validation.py:38-70 with group_by="session");
  *  - session = the query-id prefix before the LAST '_', the id itself
  *    when it has none (nordlys/ml/instance.py:174-183);
  *  - CV instances: generated candidates only, label flipped to 1 when
  *    (qid, entity) appears in the groundtruth — the reference
  *    deliberately does NOT add gt-only instances to the CV set
  *    (train_set_cer.py:92-119 gen_cv_set and its recall note).
  *
  * Training runs wherever `fit` runs (MLlib distributes the tree
  * induction); scoring is a `model.transform` — a per-row codegen'd pass,
  * no shuffle — so applying the model at lake scale is embarrassingly
  * parallel.
  */
object Ltr {

  /** Session key of a query id (instance.py:174-183): prefix before the
    * last '_'; ids without '_' are their own session.
    */
  def session(qid: Column): Column =
    when(qid.contains("_"), regexp_extract(qid, "^(.*)_[^_]*$", 1)).otherwise(qid)

  /** Deterministic session-grouped fold assignment
    * (cross_validation.py:38-70): distinct sessions are shuffled (seeded
    * hash order replaces the reference's `random.shuffle`) and dealt
    * round-robin into k folds, so every instance of a session lands in
    * the same fold and fold sizes differ by at most one session. Adds
    * `session` and `fold` columns.
    *
    * The deal runs distributed: a range-partitioned sort on (hash,
    * session) + `zipWithIndex` — identical ordering (and therefore
    * identical folds) to a global `row_number` Window, without funnelling
    * every session through one task. The broadcast of the session→fold
    * map is the remaining bound: fine for any realistic training set
    * (sessions ≪ instances); at billions of sessions swap the broadcast
    * for a shuffled join.
    */
  def assignFolds(instances: DataFrame, k: Int, seed: Long,
                  qidCol: String = "qid"): DataFrame = {
    val spark = instances.sparkSession
    import spark.implicits._
    val sorted = instances.select(session(col(qidCol)).as("session")).distinct()
      .sort(xxhash64(col("session"), lit(seed)), col("session"))
    val folds = sorted.select("session").as[String].rdd.zipWithIndex()
      .map { case (s, i) => (s, (i % k).toInt) }
      .toDF("session", "fold")
    instances.withColumn("session", session(col(qidCol)))
      .join(broadcast(folds), "session")
  }

  /** t=1000/m=3 mirrors the reference's shipped best runs; maxDepth
    * approximates sklearn's unbounded trees within MLlib's bound.
    */
  case class RfConfig(numTrees: Int = 1000, featuresPerSplit: Int = 3,
                      maxDepth: Int = 15, seed: Long = 42L)

  private def assembler(featureCols: Seq[String]) = new VectorAssembler()
    .setInputCols(featureCols.toArray).setOutputCol("features")

  /** Train the RF classifier (ml.py:105-117; features are assembled in
    * sorted-name order like the reference's `sorted(features.keys())`,
    * ml.py:122-125, so importances line up across runs).
    */
  def trainRf(train: DataFrame, featureCols: Seq[String], labelCol: String,
              cfg: RfConfig = RfConfig()): RandomForestClassificationModel = {
    val cols = featureCols.sorted
    new RandomForestClassifier()
      .setNumTrees(cfg.numTrees)
      .setFeatureSubsetStrategy(cfg.featuresPerSplit.toString)
      .setMaxDepth(cfg.maxDepth)
      .setSeed(cfg.seed)
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .fit(assembler(cols).transform(train))
  }

  /** GBRT train — the reference's other model family (ml.py:88-103:
    * learning rate α, t trees, depth ≈ |features|/10). MLlib's GBT is a
    * binary classifier with logistic loss — the closest analog of
    * sklearn's GradientBoostingClassifier.
    */
  case class GbtConfig(numTrees: Int = 1000, alpha: Double = 0.1,
                       maxDepth: Int = 2, seed: Long = 42L)

  def trainGbt(train: DataFrame, featureCols: Seq[String], labelCol: String,
               cfg: GbtConfig = GbtConfig()): GBTClassificationModel =
    new GBTClassifier()
      .setMaxIter(cfg.numTrees)
      .setStepSize(cfg.alpha)
      .setMaxDepth(cfg.maxDepth)
      .setSeed(cfg.seed)
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .fit(assembler(featureCols.sorted).transform(train))

  /** Apply a trained model: `score` = P(class 1) (ml.py:189-193
    * predict_proba[0][1]). Input columns ride through unchanged.
    * Accepts either family (both expose a probability vector).
    */
  def applyRf(model: org.apache.spark.ml.Model[_] with org.apache.spark.ml.param.shared.HasFeaturesCol,
              df: DataFrame, featureCols: Seq[String]): DataFrame =
    // copy() strips the trainingSummary a fresh fit() attaches (verified:
    // RF/GBT copy = copyValues + setParent only). The summary holds a
    // SparkSession reference, so transform's prediction UDF would drag
    // the session into the task closure — which java-serializes only
    // while every lazy session field happens to be null (touching
    // Dataset.observe anywhere in the JVM materializes the non-
    // serializable ObservationManager and breaks it). A model shipped to
    // executors must never reference the session.
    model.asInstanceOf[org.apache.spark.ml.Transformer]
      .copy(org.apache.spark.ml.param.ParamMap.empty)
      .transform(assembler(featureCols.sorted).transform(df))
      .withColumn("score", vector_to_array(col("probability"))(1))
      .drop("features", "rawPrediction", "probability", "prediction")

  /** Gini feature importances, sorted descending (ml.py:153-174). */
  def featureImportances(model: RandomForestClassificationModel,
                         featureCols: Seq[String]): Seq[(String, Double)] =
    featureCols.sorted.zip(model.featureImportances.toArray)
      .sortBy(-_._2).toSeq

  /** k-fold session-grouped cross-validation (cross_validation.py:109-127):
    * every instance is scored by the model whose training folds excluded
    * its session. Returns all instances with a `score` column.
    */
  def crossValidate(instances: DataFrame, featureCols: Seq[String],
                    labelCol: String, k: Int,
                    cfg: RfConfig = RfConfig(), qidCol: String = "qid"): DataFrame =
    crossValidateWith(instances, featureCols, k, cfg.seed, qidCol)(
      trainRf(_, featureCols, labelCol, cfg))

  /** GBT-family CV — the model family of the reference's set detector
    * (set_detector.py main: -t/-d → "gbrt").
    */
  def crossValidateGbt(instances: DataFrame, featureCols: Seq[String],
                       labelCol: String, k: Int,
                       cfg: GbtConfig = GbtConfig(), qidCol: String = "qid"): DataFrame =
    crossValidateWith(instances, featureCols, k, cfg.seed, qidCol)(
      trainGbt(_, featureCols, labelCol, cfg))

  private def crossValidateWith(instances: DataFrame, featureCols: Seq[String],
                                k: Int, seed: Long, qidCol: String)(
      train: DataFrame => org.apache.spark.ml.Model[_]
        with org.apache.spark.ml.param.shared.HasFeaturesCol): DataFrame = {
    val folded = assignFolds(instances, k, seed, qidCol)
      .localCheckpoint(true) // k models re-read it; folds must not recompute
    // The k fits are independent (disjoint test folds, fixed seed), so
    // submit them from concurrent driver threads — SparkContext job
    // submission is thread-safe, and tree induction leaves scheduling
    // gaps between its many small jobs that a second fold's jobs fill.
    // Results are identical to the serial loop (each model sees the same
    // train split + seed regardless of order; unionByName keeps fold
    // order). Pool capped below k: each extra concurrent fit adds driver
    // memory for its tree aggregates, and 2-3 in flight already close
    // most of the scheduling gaps.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(k, 3))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val parts =
      try Await.result(
        Future.sequence((0 until k).map { f => Future {
          val model = train(folded.where(col("fold") =!= f))
          applyRf(model, folded.where(col("fold") === f), featureCols)
        }}), Duration.Inf)
      catch {
        // first failure: abandon the sibling fits (interrupt pool threads)
        // instead of letting them run to completion on non-daemon threads
        case e: Throwable => pool.shutdownNow(); throw e
      }
      finally pool.shutdown()
    parts.reduce(_ unionByName _).drop("fold", "session")
  }

  /** CER cross-validation instances from a Y-ERD-style gt table
    * (train_set_cer.py:92-119): candidate generation from a gt-derived
    * surface-form dictionary (all query n-grams ⋈ dict at commonness ≥
    * `cmnTh` — query.py:88-108 without the CMNS back-off), the
    * dictionary-computable slice of the reference's feature families
    * (ranker_ltr.py:157-190), and label = 1 iff (qid, entity) is a gt
    * positive. Features, with their reference rows:
    *
    *   cmn        commonness prior               (query.py:309-330)
    *   len        mention word count             (mention_feat.py:26-31)
    *   len_ratio  len / query word count         (mention_feat.py:60-68)
    *   matches    dictionary hits for mention    (mention_feat.py:33-41)
    *   ntem       titles equal to mention        (mention_feat.py:43-49)
    *   smil       titles inside mention n-grams  (mention_feat.py:51-58)
    *   mct/tcm/tem  mention vs entity title      (entity_mention_feat.py:27-54)
    *   qct/tcq/teq  QUERY vs entity title        (ranker_ltr.py:184-187)
    *
    * The title dimension is `uri_to_name` over the gt's own DBpedia URIs
    * (indexer.py:27-35) — the LM/abstract/graph features need entity
    * documents the repo does not ship and are absent here.
    */
  def yerdCvInstances(gt: DataFrame, cmnTh: Double = 0.1,
                      maxNgram: Int = 8): DataFrame = {
    val queries = gt.select(col("qid"), norm_text(col("query")).as("qtext")).distinct()
    val annotated = gt.where(col("mention").isNotNull && col("freebase_id").isNotNull)

    val counts = annotated
      .select(norm_text(col("mention")).as("surface"), col("freebase_id").as("entity"))
      .groupBy("surface", "entity").agg(count(lit(1)).as("cnt"))
    val wSurf = Window.partitionBy("surface")
    val dict = counts
      .withColumn("cmn", col("cnt").cast("double") / sum("cnt").over(wSurf).cast("double"))
      .where(col("cmn") >= cmnTh)
      .select("surface", "entity", "cmn")

    val titles = annotated
      .select(col("freebase_id").as("entity"),
        norm_text(uri_to_name(col("entity"))).as("title"))
      .groupBy("entity").agg(min("title").as("title"))

    // four consumers below (ntem, smil, the final join chain's base and
    // its len/len_ratio exprs): materialize the ngram explode + dedup
    // once instead of re-shuffling it per branch
    val mentions = queries
      .select(col("qid"), col("qtext"),
        explode(ngrams_up_to(split(col("qtext"), " "), maxNgram)).as("mention"))
      .dropDuplicates("qid", "mention")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val perMention = dict.groupBy(col("surface").as("mention"))
      .agg(count(lit(1)).as("matches"))
    val ntem = mentions.select(col("qid"), col("mention"))
      .join(titles.select(col("title").as("mention")), Seq("mention"))
      .groupBy("qid", "mention").agg(count(lit(1)).as("ntem"))
    val smil = mentions.select(col("qid"), col("mention"),
      explode(ngrams_up_to(split(col("mention"), " "), maxNgram)).as("ng"))
      .join(titles.select(col("title").as("ng")), Seq("ng"))
      .groupBy("qid", "mention").agg(count(lit(1)).as("smil"))

    val positives = annotated
      .select(col("qid"), col("freebase_id").as("entity")).distinct()
      .withColumn("label", lit(1.0))

    mentions
      .join(dict.select(col("surface").as("mention"), col("entity"), col("cmn")), "mention")
      .join(broadcast(titles), Seq("entity"), "left")
      .na.fill("", Seq("title"))
      .join(perMention, Seq("mention"), "left")
      .join(ntem, Seq("qid", "mention"), "left")
      .join(smil, Seq("qid", "mention"), "left")
      .join(positives, Seq("qid", "entity"), "left")
      .na.fill(0L, Seq("matches", "ntem", "smil")).na.fill(0.0, Seq("label"))
      .withColumn("len", size(split(col("mention"), " ")).cast("double"))
      .withColumn("len_ratio", col("len") / size(split(col("qtext"), " ")).cast("double"))
      .withColumn("mct", (col("title") =!= "" && col("mention").contains(col("title"))).cast("double"))
      .withColumn("tcm", col("title").contains(col("mention")).cast("double"))
      .withColumn("tem", (col("title") === col("mention")).cast("double"))
      .withColumn("qct", (col("title") =!= "" && col("qtext").contains(col("title"))).cast("double"))
      .withColumn("tcq", col("title").contains(col("qtext")).cast("double"))
      .withColumn("teq", (col("title") === col("qtext")).cast("double"))
      .select(col("qid"), col("mention"), col("entity"), col("label"),
        col("cmn"), col("len"), col("len_ratio"),
        col("matches").cast("double").as("matches"),
        col("ntem").cast("double").as("ntem"), col("smil").cast("double").as("smil"),
        col("mct"), col("tcm"), col("tem"), col("qct"), col("tcq"), col("teq"))
  }

  /** The feature columns [[yerdCvInstances]] emits. */
  val YerdFeatures: Seq[String] = Seq("cmn", "len", "len_ratio", "matches",
    "ntem", "smil", "mct", "tcm", "tem", "qct", "tcq", "teq")
}
