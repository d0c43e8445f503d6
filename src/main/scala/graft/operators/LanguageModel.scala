package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The generative scoring stack: term-frequency tables, smoothed language
  * models, MLM field mixtures, and NLLR normalization — the Spark
  * re-expression of the reference's Lucene-backed scorers.
  *
  * Reference:
  *  - index build → tf tables: nordlys/entity/dbpedia/indexer.py:75-155,
  *    term stats nordlys/retrieval/lucene_tools.py:300-388
  *  - JM / Dirichlet smoothing: nordlys/retrieval/scorer.py:65-99
  *  - LM / MLM doc score (Σ log p, zero-skip, None if all-zero):
  *    scorer.py:162-236
  *  - NLLR: nordlys/erd/features/query_sim_feat.py:89-147
  *  - ×commonness combine in log space: nordlys/erd/cer/ranker_mlm.py:64-68
  *
  * The Lucene inverted index becomes three aggregate tables — doc_tf
  * (doc, field, term, tf), doc_len (doc, field, len), and broadcastable
  * collection stats (field, term, cf) + (field, coll_len). At 100 TB the
  * doc-side tables shuffle once at build time and are bucketed by doc;
  * collection stats are tiny (|vocab| × |fields|) and always broadcast —
  * exactly the reference's index_cache memoization as a materialized
  * dimension.
  */
object LanguageModel {

  // ---------- index build (the Lucene-indexer analog) ----------

  /** Long-format fielded token occurrences: docs × field definitions →
    * (doc, field, term), one row per token occurrence.
    *
    * One scan: the field token arrays are packed into an array of
    * (field, toks) structs and exploded twice, instead of one
    * scan + tokenize pass per field union branch (row multiset is
    * identical — downstream is always an aggregation).
    */
  def fieldedTokens(docs: DataFrame, docIdCol: String,
                    fields: Seq[(String, Column)]): DataFrame = {
    val packed = array(fields.map { case (name, toksCol) =>
      struct(lit(name).as("field"), toksCol.as("toks"))
    }: _*)
    docs.select(col(docIdCol).as("doc"), explode(packed).as("f"))
      .select(col("doc"), col("f.field").as("field"),
        explode(col("f.toks")).as("term"))
  }

  /** doc_tf(doc, field, term, tf) — lucene_tools.get_doc_termfreqs analog. */
  def docTermFreqs(fielded: DataFrame): DataFrame =
    fielded.groupBy("doc", "field", "term").agg(count(lit(1)).as("tf"))

  /** doc_len(doc, field, len_d) = Σ_t tf. */
  def docFieldLen(docTf: DataFrame): DataFrame =
    docTf.groupBy("doc", "field").agg(sum("tf").as("len_d"))

  /** coll_tf(field, term, cf) — lucene_tools.get_coll_termfreq analog. */
  def collTermFreqs(docTf: DataFrame): DataFrame =
    docTf.groupBy("field", "term").agg(sum("tf").as("cf"))

  /** coll_stats(field, coll_len, n_docs, avg_len) —
    * lucene_tools.get_coll_length / get_avg_len analog.
    */
  def collFieldStats(docTf: DataFrame): DataFrame =
    docTf.groupBy("field").agg(
      sum("tf").as("coll_len"),
      countDistinct("doc").as("n_docs"))
      .withColumn("avg_len", col("coll_len").cast("double") / col("n_docs"))

  // ---------- smoothed term probabilities (scorer.py:65-99) ----------

  /** JM: p(t|θ_{d,f}) = (1−λ)·tf/|d_f| + λ·cf/|C_f|, zero-guarded like
    * scorer.py:76-79 (len 0 → that component is 0).
    */
  def jm_prob(tf: Column, lenD: Column, cf: Column, collLen: Column,
              lambda: Double): Column = {
    val pTd = when(lenD > 0, tf.cast("double") / lenD.cast("double")).otherwise(0d)
    val pTC = when(collLen > 0, cf.cast("double") / collLen.cast("double")).otherwise(0d)
    lit(1.0 - lambda) * pTd + lit(lambda) * pTC
  }

  /** Dirichlet: p(t|θ_{d,f}) = (tf + μ·p(t|C_f)) / (|d_f| + μ); μ = 0 → 0
    * (scorer.py:82-99 — "field does not have any content").
    */
  def dirichlet_prob(tf: Column, lenD: Column, cf: Column, collLen: Column,
                     mu: Column): Column = {
    val pTC = when(collLen > 0, cf.cast("double") / collLen.cast("double")).otherwise(0d)
    when(mu === 0d, 0d)
      .otherwise((tf.cast("double") + mu * pTC) / (lenD.cast("double") + mu))
  }

  // ---------- MLM term probabilities over candidates ----------

  /** Per-(candidate, query-term) MLM probability
    * p(t|θ_d) = Σ_f μ_f·p(t|θ_{d,f}) (scorer.py:203-221) plus the NLLR
    * collection mixture p(t|C) = Σ_f μ_f·cf_f/|C_f|
    * (query_sim_feat.py:124-138).
    *
    * Inputs:
    *  - cands(qid, entity): candidate pairs (any upstream generation)
    *  - qterms(qid, term, qtf, qlen): DISTINCT query terms with
    *    occurrence counts and total query length
    *  - docTf from [[docTermFreqs]] (its doc column matched to `entity`)
    *
    * Plan: the (qid×term×field) grid joins docTf/docLen on (entity,
    * field[, term]) — the only data-sized shuffles; collection stats are
    * broadcast. Output: (qid, entity, term, qtf, qlen, p, p_t_c).
    */
  def mlmTermProbs(cands: DataFrame, qterms: DataFrame, docTf: DataFrame,
                   weights: Map[String, Double],
                   lambda: Double = 0.1): DataFrame = {
    val docLen = docFieldLen(docTf)
    val collTf = collTermFreqs(docTf)
    val collStats = collFieldStats(docTf)

    val fieldRows = array(weights.toSeq.sortBy(_._1).map { case (f, mu) =>
      struct(lit(f).as("field"), lit(mu).as("mu"))
    }: _*)

    val grid = cands.join(qterms, "qid")
      .select(col("qid"), col("entity"), col("term"), col("qtf"), col("qlen"),
        explode(fieldRows).as("fm"))
      .select(col("qid"), col("entity"), col("term"), col("qtf"), col("qlen"),
        col("fm.field").as("field"), col("fm.mu").as("mu"))

    grid
      .join(docTf.select(col("doc").as("entity"), col("field"), col("term"),
        col("tf")), Seq("entity", "field", "term"), "left")
      .join(docLen.select(col("doc").as("entity"), col("field"), col("len_d")),
        Seq("entity", "field"), "left")
      .join(broadcast(collTf), Seq("field", "term"), "left")
      .join(broadcast(collStats.select(col("field"), col("coll_len"))), Seq("field"))
      .withColumn("p_f",
        jm_prob(coalesce(col("tf"), lit(0L)), coalesce(col("len_d"), lit(0L)),
          coalesce(col("cf"), lit(0L)), col("coll_len"), lambda))
      .withColumn("p_c_f",
        when(col("coll_len") > 0,
          coalesce(col("cf"), lit(0L)).cast("double") / col("coll_len").cast("double"))
          .otherwise(0d))
      .groupBy("qid", "entity", "term", "qtf", "qlen")
      .agg(sum(col("mu") * col("p_f")).as("p"),
        sum(col("mu") * col("p_c_f")).as("p_t_c"))
  }

  // ---------- doc scores (scorer.py:162-236, query_sim_feat.py:89-147) ----------

  /** LM/MLM doc score: Σ_{t∈q} log p(t|θ_d) — query terms counted with
    * multiplicity (qtf·log p), zero-prob terms skipped, NULL when every
    * term has zero probability (the reference's None; scorer.py:178-194).
    */
  def lmDocScore(termProbs: DataFrame): DataFrame =
    termProbs.groupBy("qid", "entity")
      .agg(
        when(sum(col("p")) === 0d, lit(null).cast("double"))
          .otherwise(sum(when(col("p") > 0d,
            col("qtf").cast("double") * log(col("p"))).otherwise(0d)))
          .as("score"))

  /** NLLR (query_sim_feat.py:89-138), exp'd like nllr_mlm_score:
    * exp( Σ_{t: p>0} p(t|q)·(log p(t|θ_d) − log p(t|C)) ),
    * p(t|q) = qtf/|q|; NULL when every term has zero probability.
    */
  def nllrScore(termProbs: DataFrame): DataFrame =
    termProbs.groupBy("qid", "entity")
      .agg(
        when(sum(col("p")) === 0d, lit(null).cast("double"))
          .otherwise(exp(sum(when(col("p") > 0d,
            (col("qtf").cast("double") / col("qlen").cast("double"))
              * (log(col("p")) - log(col("p_t_c")))).otherwise(0d))))
          .as("nllr"))

  /** MLM×commonness combine in log space (ranker_mlm.py:64-68):
    * exp(log score + log max(cmn, 1e-5)).
    */
  def combine_commonness(score: Column, cmn: Column): Column =
    exp(log(score) + log(greatest(cmn, lit(1e-5))))

  /** None-score convention (ranker_mlm.py:60-62): a candidate whose
    * retrieval score is None (entity absent from the index → [[lmDocScore]]/
    * [[nllrScore]] NULL) is KEPT with score 0, not dropped.
    */
  def none_score_zero(score: Column): Column = coalesce(score, lit(0d))
}
