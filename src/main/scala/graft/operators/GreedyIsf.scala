package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Greedy interpretation-set formation — the reference's order-sensitive
  * per-query fold (nordlys/erd/isf/greedy.py:22-97), kept *per-key* inside
  * `flatMapGroups` (SURVEY §2.11 item 3): the sequential semantics are
  * intrinsic (each decision depends on previously kept rows), so the
  * distribution unit is the query, never the candidate.
  *
  * Stages, faithful to the reference:
  *  1. score-threshold prune (greedy.py:68-74);
  *  2. containment-mention prune (greedy.py:76-97): scan by descending
  *     score, drop a candidate whose mention contains or is contained in
  *     an already-kept mention (equal mentions contain each other → the
  *     best-scored entity per mention survives);
  *  3. first-fit set assembly (greedy.py:48-66): scan kept candidates in
  *     order, adding each to EVERY existing interpretation whose mention
  *     set stays word-disjoint (is_overlapping, segmentation.py:91-110);
  *     if none accepts, open a new interpretation;
  *  4. set score = mean member score (greedy.py:40).
  *
  * The reference iterates Python-2.7 dict order (arbitrary); here ties
  * order deterministically by (score desc, mention, entity) so results
  * are stable across partitionings.
  */
object GreedyIsf {

  case class Cand(qid: String, mention: String, entity: String, score: Double)
  case class Member(qid: String, set_id: Int, score: Double,
                    entity: String, mention: String)

  /** Word-overlap test (segmentation.py:91-110): a term appearing in two
    * different mentions ⇒ overlapping (within-mention duplicates don't
    * count — each mention contributes its word *set*).
    */
  def isOverlapping(mentions: Iterable[String]): Boolean = {
    val words = mentions.toSeq.flatMap(_.split(" ").toSet)
    words.size != words.distinct.size
  }

  /** Containment prune over one query's score-sorted candidates. */
  private[graft] def pruneContainment(sorted: Seq[Cand]): Seq[Cand] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[Cand]
    val mens = scala.collection.mutable.Set.empty[String]
    sorted.foreach { c =>
      val contained = mens.exists(m => m.contains(c.mention) || c.mention.contains(m))
      if (!contained) { kept += c; mens += c.mention }
    }
    kept.toSeq
  }

  /** First-fit assembly over one query's pruned candidates (in order). */
  private[graft] def firstFit(kept: Seq[Cand]): Seq[Seq[Cand]] = {
    val inters = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.LinkedHashMap.empty[String, Cand])
    kept.foreach { c =>
      var added = false
      inters.foreach { inter =>
        if (!isOverlapping(inter.keys.toSeq :+ c.mention)) {
          inter(c.mention) = c
          added = true
        }
      }
      if (!added)
        inters += scala.collection.mutable.LinkedHashMap(c.mention -> c)
    }
    inters.toSeq.map(_.values.toSeq).filter(_.nonEmpty)
  }

  /** candidates(qid, mention, entity, score) → interpretation-set members
    * (qid, set_id, score, entity, mention); set ids are 0-based in
    * first-creation order within each query.
    */
  def interpretations(cands: DataFrame, scoreThreshold: Double): Dataset[Member] = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .where(col("score") >= scoreThreshold)
      .select(col("qid").cast("string").as("qid"),
        col("mention").cast("string").as("mention"),
        col("entity").cast("string").as("entity"),
        col("score").cast("double").as("score"))
      .as[Cand]
      .groupByKey(_.qid)
      .flatMapGroups { (qid, it) =>
        val sorted = it.toSeq.sortBy(c => (-c.score, c.mention, c.entity))
        firstFit(pruneContainment(sorted)).zipWithIndex.flatMap { case (members, idx) =>
          val setScore = members.map(_.score).sum / members.size
          members.map(m => Member(qid, idx, setScore, m.entity, m.mention))
        }.iterator
      }
  }
}
