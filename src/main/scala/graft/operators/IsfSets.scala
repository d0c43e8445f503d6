package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Candidate interpretation-set enumeration + set-detector wiring — the
  * reference's MLMcg+LTR / LTR+LTR disambiguation path (the one §2.8
  * capability the north rule's connected-components replacement did not
  * cover):
  *
  *  - enumeration (nordlys/erd/query/segmentation.py:14-88 via
  *    set_generator.py:75-115): every subset of non-overlapping mentions,
  *    each mention assigned one candidate entity, entity choices collapse-
  *    checked (an iset that assigns one entity to two mentions shrinks
  *    under the reference's {entity: mention} dict and is dropped by the
  *    `len(iset) == len(seg)` completeness filter);
  *  - CER-attribute attach (set_generator.py:117-149): score / rank /
  *    commonness (and mlm-tc when present) ride along — here they ride the
  *    enumerated member rows directly, no second join;
  *  - set-level feature aggregation (isf/aggregator.py:20-44 +
  *    set_detector.py:160-198): min/max/avg over the per-entity features,
  *    len_ratio_set, with the graph/FACC set features of
  *    [[Features.graphSetFeatures]]/[[Features.faccSetFeatures]] joined in
  *    when the dimensions exist;
  *  - GBRT/RF classification via [[graft.ml.Ltr]].
  *
  * Scale shape: the enumeration is a per-query `flatMapGroups` — the only
  * distribution unit the semantics allow (subset enumeration is
  * intra-query) and the same unit the reference uses. Its cost is bounded
  * by the top-k cut (set_generator.py:59-73, k=5 in every published run):
  * ≤ k ranked entities × the mentions of one short query. Queries are
  * independent, so the stage is embarrassingly parallel across any number
  * of executors.
  */
object IsfSets {

  case class Cand(qid: String, qtext: String, mention: String, entity: String,
                  score: Double, rnk: Int, cmn: Double)
  case class Member(qid: String, qtext: String, iset_id: Int,
                    entity: String, mention: String,
                    score: Double, rnk: Int, cmn: Double)

  /** Word-overlap guard (segmentation.py:91-110 semantics, via
    * [[GreedyIsf.isOverlapping]]): each mention contributes its word SET.
    */
  private def compatible(takenWords: Set[String], takenEntities: Set[String],
                         c: Cand): Boolean =
    !takenEntities.contains(c.entity) &&
      c.mention.split(" ").toSet.forall(w => !takenWords.contains(w))

  /** All valid interpretation sets per query.
    *
    * Equivalence with the reference's segment → segment_to_iset → gen_iset
    * pipeline: a valid iset is exactly a subset S of candidate
    * (mention, entity) pairs with (a) pairwise word-disjoint mentions and
    * (b) pairwise distinct entities — (a) is `is_overlapping` over the
    * segmentation (and makes the reference's |S| ≤ |query words| bound
    * redundant: disjoint query-n-gram mentions each consume ≥1 distinct
    * query word), (b) is the completeness filter (segmentation.py:80-86).
    * Enumerated here by one include/exclude pass per candidate (each
    * subset built exactly once), not by materializing all mention subsets
    * first.
    *
    * `iset_id` is 0-based per query in canonical order (sorted
    * "entity=mention" member lists), so output is deterministic under any
    * partitioning. `maxIsetsPerQuery` is a loud guard, not a silent cap:
    * exceeding it throws — the intended bound is the upstream top-k cut.
    */
  def enumerate(cands: DataFrame, maxIsetsPerQuery: Int = 200000): Dataset[Member] = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands.select(col("qid").cast("string"), col("qtext").cast("string"),
      col("mention").cast("string"), col("entity").cast("string"),
      col("score").cast("double"), col("rnk").cast("int"), col("cmn").cast("double"))
      .where(col("score").isNotNull) // None-score filter (set_generator.py:160-168)
      .as[Cand]
      .groupByKey(_.qid)
      .flatMapGroups { (qid, it) =>
        val cs = it.toArray.sortBy(c => (c.mention, c.entity))
        var isets = List(List.empty[Cand])
        cs.foreach { c =>
          val grown = isets.flatMap { s =>
            val words = s.iterator.flatMap(_.mention.split(" ")).toSet
            val ents = s.iterator.map(_.entity).toSet
            if (compatible(words, ents, c)) Some(c :: s) else None
          }
          isets = isets ++ grown
          require(isets.size <= maxIsetsPerQuery,
            s"query $qid enumerates > $maxIsetsPerQuery interpretation sets — " +
              "tighten the top-k cut (set_generator.py:59-73) before enumeration")
        }
        isets.filter(_.nonEmpty)
          .map(s => s.sortBy(m => (m.entity, m.mention)))
          .sortBy(_.map(m => s"${m.entity}=${m.mention}").mkString(""))
          .zipWithIndex
          .flatMap { case (members, idx) =>
            members.map(m =>
              Member(qid, m.qtext, idx, m.entity, m.mention, m.score, m.rnk, m.cmn))
          }.iterator
      }
  }

  /** Min-max normalize (MLM-ranked candidates only; set_generator.py:40-57)
    * + CER-rank top-k cut (set_generator.py:59-73 over the rank semantics
    * of cer_instances.py:201-221): the rank belongs to the (qid, entity)
    * pair at its max score; every (mention, entity) instance of a ranked
    * entity survives the cut.
    */
  def topKCandidates(cands: DataFrame, k: Int, normalizeMlm: Boolean): DataFrame = {
    val scored =
      if (normalizeMlm)
        ReferenceOps.minMaxNormalize(cands, "qid", "score")
          .drop("score").withColumnRenamed("norm_score", "score")
      else cands
    val entityRank = ReferenceOps.rankCandidates(
      scored.select(col("qid"), col("entity"), col("score")),
      "qid", "entity", "score", k)
      .select(col("qid"), col("entity"), col("rnk"))
    scored.drop("rnk").join(entityRank, Seq("qid", "entity"))
  }

  /** Aggregated set-level features (aggregator.py:20-44 over the CER
    * attributes + len_ratio_set, set_detector.py:176-186/200-207):
    * one aggregation per (qid, iset_id). `mlm-tc`-style extra attribute
    * columns aggregate the same way when listed in `extraAttrs`.
    */
  def setFeatures(members: DataFrame, extraAttrs: Seq[String] = Nil): DataFrame = {
    val irank = lit(1.0) / col("rnk").cast("double")
    val menLen = size(split(col("mention"), " ")).cast("double")
    val qLen = size(split(col("qtext"), " ")).cast("double")
    val base = Seq(
      count(lit(1)).cast("double").as("n"),
      (sum(menLen) / first(qLen)).as("len_ratio_set"),
      min(col("cmn")).as("commonness_min"), max(col("cmn")).as("commonness_max"),
      avg(col("cmn")).as("commonness_avg"),
      min(col("score")).as("score_min"), max(col("score")).as("score_max"),
      avg(col("score")).as("score_avg"),
      min(irank).as("irank_min"), max(irank).as("irank_max"),
      avg(irank).as("irank_avg"))
    val extra = extraAttrs.flatMap(a => Seq(
      min(col(a)).as(s"${a}_min"), max(col(a)).as(s"${a}_max"),
      avg(col(a)).as(s"${a}_avg")))
    members.groupBy("qid", "iset_id").agg(base.head, (base.tail ++ extra): _*)
  }

  /** Full feature assembly: aggregates + (optionally) the wikilink-graph
    * and FACC-co-occurrence set features over the same member sets —
    * exactly the set_detector.py:160-175 block, re-expressed as the two
    * existing set-feature operators keyed by a composite set key.
    * `entityLinks(entity, links: array<string>)`;
    * `facc(doc_id, entity)` with `numDocs` the corpus size.
    */
  def fullFeatures(members: DataFrame,
                   entityLinks: Option[DataFrame] = None,
                   facc: Option[(DataFrame, Long)] = None,
                   extraAttrs: Seq[String] = Nil): DataFrame = {
    val keyed = members.withColumn("set_key",
      concat_ws("#", col("qid"), col("iset_id")))
    var out = setFeatures(members, extraAttrs)
      .withColumn("set_key", concat_ws("#", col("qid"), col("iset_id")))
    entityLinks.foreach { links =>
      val g = Features.graphSetFeatures(
        keyed.select(col("set_key").as("cluster_id"), col("entity"))
          .join(links.select(col("entity"), col("links")), Seq("entity"), "left"))
        .select(col("cluster_id").as("set_key"),
          col("common_neighbors").cast("double").as("common_links"),
          col("all_neighbors").cast("double").as("total_links"),
          col("jc").as("j_kb"), col("completeness"))
      out = out.join(g, Seq("set_key"), "left")
    }
    facc.foreach { case (co, numDocs) =>
      val f = Features.faccSetFeatures(
        keyed.select(col("set_key").as("set_id"), col("entity")), co, numDocs)
        .select(col("set_id").as("set_key"), col("jc").as("j_corpora"),
          col("mw_rel").as("rel_mw"), col("joint_prob").as("p_joint"),
          col("entropy").as("h_joint"))
      out = out.join(f, Seq("set_key"), "left")
    }
    out.drop("set_key")
  }

  /** Label enumerated isets against groundtruth interpretation sets
    * (train_set_isf.py:60-89 gen_cv_set): label 1.0 iff the iset's
    * {(entity, mention)} set EQUALS a gt set of the same query
    * (train_set_isf.py:176-194 — both entity and mention must match).
    * `gtIsf` is [[Features.gtToIsfInstances]] output.
    */
  def labelByGt(members: DataFrame, gtIsf: DataFrame): DataFrame = {
    val key = sort_array(collect_list(struct(col("entity"), col("mention"))))
    val candKeys = members.groupBy("qid", "iset_id").agg(key.as("iset_key"))
    val gtKeys = gtIsf
      .select(col("qid"), sort_array(map_entries(col("inter_set"))).as("iset_key"))
      .distinct()
      .withColumn("label", lit(1.0))
    candKeys.join(gtKeys, Seq("qid", "iset_key"), "left")
      .na.fill(0.0, Seq("label"))
      .select(col("qid"), col("iset_id"), col("label"))
  }

  /** The classifier's feature columns for the dictionary-only regime (no
    * entity/FACC dims): the aggregate families of [[setFeatures]].
    */
  val BaseFeatures: Seq[String] = Seq("n", "len_ratio_set",
    "commonness_min", "commonness_max", "commonness_avg",
    "score_min", "score_max", "score_avg",
    "irank_min", "irank_max", "irank_avg")

  /** set_sim (query_set_sim, query_sim_feat.py:186-199): NLLR of the whole
    * query against the set-level term model p(t|S) = Σ_{e∈S} p(t|θ_e) —
    * member MLM term probabilities SUMMED per term, then the standard
    * NLLR combine; None → 0.
    *
    * Shape: term probabilities are computed once per DISTINCT
    * (qid, entity) — members repeat across the enumerated isets, so the
    * expensive tf joins never multiply with the iset count; the per-iset
    * work is one sum aggregate.
    *
    * members(qid, iset_id, entity) × qterms(qid, term, qtf, qlen) ×
    * docTf → (qid, iset_id, set_sim).
    */
  def querySetSim(members: DataFrame, qterms: DataFrame, docTf: DataFrame,
                  weights: Map[String, Double]): DataFrame = {
    val pairs = members.select("qid", "entity").distinct()
    val tp = LanguageModel.mlmTermProbs(pairs, qterms, docTf, weights)
    val setTp = members.select("qid", "iset_id", "entity")
      .join(tp, Seq("qid", "entity"))
      .groupBy("qid", "iset_id", "term", "qtf", "qlen")
      // p_t_c is entity-independent: first() is exact, not arbitrary
      .agg(sum("p").as("p"), first("p_t_c").as("p_t_c"))
    LanguageModel.nllrScore(setTp.withColumnRenamed("iset_id", "entity"))
      .select(col("qid"), col("entity").as("iset_id"),
        LanguageModel.none_score_zero(col("nllr")).as("set_sim"))
  }

  /** context_sim (query_sim_feat.py:150-176): NLLR of the query CONTEXT —
    * the query with the first occurrence of the mention sliced out, raw
    * substring semantics exactly like the reference's `re.search` span
    * removal — against the entity's single-field LM (weight 1). A
    * mention absent from the query (the reference raises) or an
    * all-zero-probability context scores 0.
    *
    * cands(qid, qtext, mention, entity) × docTf →
    * (qid, entity, mention, context_sim).
    */
  def contextSim(cands: DataFrame, docTf: DataFrame,
                 field: String = "contents"): DataFrame = {
    // base feeds the context-term explode AND the final attach join:
    // materialize the distinct + context slicing once
    val base = cands.select("qid", "qtext", "mention", "entity").distinct()
      .withColumn("_pos", call_function("instr", col("qtext"), col("mention")))
      .withColumn("context", when(col("_pos") > 0, trim(concat(
        call_function("substring", col("qtext"), lit(1), col("_pos") - 1),
        call_function("substring", col("qtext"),
          col("_pos") + length(col("mention")), length(col("qtext")))))))
      .withColumn("ckey", concat_ws("#", col("qid"), col("entity"), col("mention")))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val terms = base
      .select(col("ckey"), explode(split(col("context"), " ")).as("term"))
      .where(col("term") =!= "")
      .groupBy("ckey", "term").agg(count(lit(1)).as("qtf"))
    val qlen = terms.groupBy("ckey").agg(sum("qtf").as("qlen"))
    val cterms = terms.join(qlen, "ckey")
      .select(col("ckey").as("qid"), col("term"), col("qtf"), col("qlen"))
    val tp = LanguageModel.mlmTermProbs(
      base.select(col("ckey").as("qid"), col("entity")).distinct(),
      cterms, docTf, Map(field -> 1.0))
    val scored = LanguageModel.nllrScore(tp)
      .select(col("qid").as("ckey"), col("entity"), col("nllr"))
    base.join(scored, Seq("ckey", "entity"), "left")
      .select(col("qid"), col("entity"), col("mention"),
        LanguageModel.none_score_zero(col("nllr")).as("context_sim"))
  }

  /** Emission shape for [[graft.sources.Readers.writeErdEval]]: members of
    * the isets the classifier kept (predicted P(1) ≥ 0.5 — the reference
    * uses the classifier's own predicted label, erd_app.py:110 →
    * ml.py:176-194), with the set's classifier score.
    */
  def keptMembers(members: DataFrame, classified: DataFrame): DataFrame =
    members.join(
      classified.where(col("score") >= 0.5)
        .select(col("qid"), col("iset_id"), col("score").as("set_score")),
      Seq("qid", "iset_id"))
      .select(col("qid"), col("iset_id").as("set_id"),
        col("set_score").as("score"), col("entity"), col("mention"))
}
