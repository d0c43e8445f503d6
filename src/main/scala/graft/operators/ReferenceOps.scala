package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions._

/** Reference-shaped relational operators, re-expressed Spark-first.
  * Each maps to a row of SURVEY.md §2 and has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  */
object ReferenceOps {

  /** Commonness: P(entity | surface) = count(surface→e) / Σ_e count
    * (reference: nordlys/erd/query/query.py:309-330, merge at 169-188).
    * Here surface = token, entity = the doc's `entityCol` value.
    * One shuffle (groupBy) + one window over the same key — the window
    * reuses the groupBy partitioning, so no second exchange.
    */
  def commonness(docs: DataFrame, textCol: String, entityCol: String,
                 threshold: Double): DataFrame = {
    val counts = docs
      .select(explode(tokens(col(textCol))).as("surface"), col(entityCol).as("entity"))
      .groupBy("surface", "entity").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("surface")
    counts
      .withColumn("cmn", col("cnt").cast("double") / sum("cnt").over(w).cast("double"))
      .where(col("cmn") >= threshold)   // threshold pushdown analog (query.py:249-256)
      .select(col("surface"), col("entity"), col("cnt"),
        round(col("cmn"), 4).as("cmn"))
  }

  /** Candidate generation join: n-grams of "query" docs ⋈ surface
    * dictionary (reference: query.py:161-167 → surfaceforms.py:42-56).
    * The dictionary side is broadcast when small — the Mongo point-lookup
    * becomes a broadcast hash join.
    */
  def surfaceFormJoin(queries: DataFrame, dictionary: DataFrame,
                      maxN: Int): DataFrame = {
    val ngrams = queries.select(col("qid"),
      explode(ngrams_up_to(tokens(col("qtext")), maxN)).as("surface"))
    ngrams.join(broadcast(dictionary), "surface")
  }

  /** Rank with the reference's tie semantics: rank increments only on a
    * new score value — duplicate scores share a rank (dense_rank;
    * reference: cer_instances.py:201-221), after keep-max-score dedup of
    * (qid, entity) (cer_instances.py:229-237).
    */
  def rankCandidates(scored: DataFrame, qidCol: String, entityCol: String,
                     scoreCol: String, topK: Int): DataFrame = {
    val dedupW = Window.partitionBy(col(qidCol), col(entityCol))
      .orderBy(col(scoreCol).desc)
    val rankW = Window.partitionBy(col(qidCol)).orderBy(col(scoreCol).desc)
    scored
      .withColumn("rn", row_number().over(dedupW))
      .where(col("rn") === 1)
      .withColumn("rnk", dense_rank().over(rankW))
      .where(col("rnk") <= topK)
      .drop("rn")
  }

  /** CMNS longest-match back-off (nordlys/erd/baselines/commonness.py:59-75):
    * the baseline tries all n-grams of length n and recurses to n−1 only
    * when none matched the dictionary. Distributed form: generate all
    * lengths at once, keep each query's candidates at its LONGEST matched
    * length — one join + one window instead of a sequential loop (the
    * commonness threshold lives in the dictionary, applied before the
    * length decision exactly like get_men_candidate_ens).
    * queries(qid, qtext) × dict(surface, ...) → matched n-grams at the
    * back-off length, with `surface` (the mention) and `len` attached.
    */
  def commonnessBackoff(queries: DataFrame, dict: DataFrame, maxN: Int): DataFrame = {
    val ngrams = queries.select(col("qid"),
      explode(ngrams_up_to(tokens(col("qtext")), maxN)).as("surface"))
      .withColumn("len", size(split(col("surface"), " ")))
    val w = Window.partitionBy("qid")
    ngrams.join(broadcast(dict), "surface")
      .withColumn("max_len", max(col("len")).over(w))
      .where(col("len") === col("max_len"))
      .drop("max_len")
  }

  /** Per-group min-max score normalization, 0.5 when constant
    * (reference: set_generator.py:40-57 — the reference's only window
    * analog).
    */
  def minMaxNormalize(df: DataFrame, groupCol: String, scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    val mn = min(col(scoreCol)).over(w)
    val mx = max(col(scoreCol)).over(w)
    df.withColumn("norm_score",
      when(mx === mn, 0.5).otherwise((col(scoreCol) - mn) / (mx - mn)))
  }

  /** sameAs id map (nordlys/entity/entity.py:79-119): left-join the
    * `mapping(id, same_as: array<string>)` dimension, then take the FIRST
    * array entry of the target collection (prefix match) in stored order —
    * NULL when the id is unmapped or no entry matches. The reference's
    * Mongo k/v lookup re-expressed as a broadcast left join + ordered
    * array scan; output adds `mapped`.
    */
  def sameAsMap(df: DataFrame, idCol: String, mapping: DataFrame,
                targetPrefix: String): DataFrame = {
    val m = mapping.select(col("id").as("__sameas_id"), col("same_as"))
    df.join(broadcast(m), col(idCol) === col("__sameas_id"), "left")
      .withColumn("mapped",
        try_element_at(filter(col("same_as"),
          u => u.startsWith(lit(targetPrefix))), lit(1)))
      .drop("__sameas_id", "same_as")
  }

  /** Sessionize events by user with an inactivity gap — the generic
    * "interpretation set" of an event stream; lag + conditional running
    * sum, two windows over one partitioning.
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts").cast("timestamp")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts").cast("timestamp")) - col("prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_us", "new_sess")
  }
}
