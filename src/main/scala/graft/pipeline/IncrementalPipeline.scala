package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (delta) record linkage: link a batch of NEW transcripts
  * against an already-clustered corpus without re-running the full
  * pipeline over the lake.
  *
  * Reference analog: the reference processes query batches against a
  * fixed KB snapshot (nordlys/erd/query/query.py:72-108 — candidates come
  * from an index built once); the graft generalizes that to cluster
  * MAINTENANCE — yesterday's clusters plus today's ingest must equal what
  * a from-scratch run over the combined corpus would produce.
  *
  * Equivalence argument (the property `IncrementalPipelineSpec` pins):
  * a full run's clusters are the connected components of its matched-edge
  * set. Splitting that edge set by ingest batch,
  *   - old-old edges: the prior run matched exactly these (scoring is
  *     deterministic), and `priorClusters` is their transitive closure —
  *     so (conv_id → cluster_id) membership edges reproduce their
  *     connectivity exactly (cluster_id is itself a member, the
  *     min-member convention);
  *   - new-new and new-old edges: re-derived here from the same block
  *     keys ([[Pipeline.blocksPayload]] is ingest-time-invariant) and the
  *     same scoring kernels.
  * Components of (membership ∪ re-derived delta edges) therefore equal
  * components of the full edge set, and cluster ids agree because both
  * use min-member labeling. The one divergence window is the block-size
  * cap: a combined block pushed over `maxBlockSize` only by the union of
  * batches is dropped here by the same combined-count rule the full run
  * applies, so drop decisions agree too (counts are per-doc-distinct by
  * kernel construction — every block kernel dedups keys per doc).
  *
  * Scale shape (the 100-TB deployment this is for):
  *  - the prior corpus is never re-blocked when `priorBlocks` (the blocks
  *    snapshot a [[Pipeline.runCheckpointed]] run already materializes) is
  *    passed; bucket it by block_key and the delta probe is a co-located
  *    join;
  *  - the old side is semi-join-pruned to the delta's block keys BEFORE
  *    any aggregation — per-key counts and the pair join touch only keys
  *    the delta actually emits (AQE broadcasts the delta key set when the
  *    delta is small);
  *  - per-key fanout is capped by the SAME combined-size rule as the
  *    batch path, reported, never silent;
  *  - scoring attaches doc features via the inner equi-join of
  *    [[Scoring.scorePairs]] — one pass over the corpus docs snapshot
  *    (bucket it by hid to make that co-located too);
  *  - the final CC runs over membership edges (|corpus| rows, narrow) +
  *    delta matched edges; the driver finisher bounds apply unchanged.
  */
object IncrementalPipeline {

  /** `clusters`: every id in prior ∪ new with its (possibly re-labeled)
    * cluster id. `matchedEdges`: the delta's new matched pairs with
    * scores (the audit trail of WHY clusters merged). `droppedKeys`:
    * block keys whose combined size exceeded the cap (block_key,
    * block_size) — the no-silent-caps artifact.
    */
  case class Result(clusters: DataFrame, matchedEdges: DataFrame,
                    droppedKeys: DataFrame)

  /** @param newTranscripts the delta ingest (conv_id, turn_idx, role,
    *                       text, tool, ts) — conv_ids disjoint from the
    *                       prior corpus (re-ingested ids would need a
    *                       retract-and-replay, out of scope here)
    * @param priorDocs      the prior corpus docs payload
    *                       (conv_id, tokh, prefix, hid) — the `docs`
    *                       snapshot of the prior run
    * @param priorClusters  (conv_id, cluster_id) from the prior run
    * @param priorBlocks    the prior `blocks` snapshot (block_key,
    *                       conv_id = hid); recomputed from `priorDocs`
    *                       when absent (tests / one-off runs)
    */
  def run(newTranscripts: DataFrame, priorDocs: DataFrame,
          priorClusters: DataFrame, cfg: Pipeline.Config = Pipeline.Config(),
          priorBlocks: Option[DataFrame] = None): Result = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    // eager checkpoint: the delta docs feed blocking AND the scoring join
    val newDocs = Pipeline.docsPayload(newTranscripts, cfg)
      .localCheckpoint(true, ser)
    val newBlocks = Pipeline.blocksPayload(newDocs, cfg)
      .localCheckpoint(true, ser)

    // prune the corpus side to keys the delta emits before counting:
    // a key with no new member can produce no delta pair, and at corpus
    // scale this semi-join is the difference between aggregating the
    // whole blocks table and aggregating the delta's neighborhood
    val newKeys = newBlocks.select("block_key").distinct()
    val oldRelevant = priorBlocks.getOrElse(Pipeline.blocksPayload(priorDocs, cfg))
      .join(newKeys, Seq("block_key"), "left_semi")
      .localCheckpoint(true, ser)

    // combined-size cap, same rule as the batch path (blocks kernels emit
    // per-doc-distinct keys, so row counts ARE distinct member counts)
    val newCnt = newBlocks.groupBy("block_key").agg(count(lit(1)).as("n_new"))
    val oldCnt = oldRelevant.groupBy("block_key").agg(count(lit(1)).as("n_old"))
    val counts = newCnt.join(oldCnt, Seq("block_key"), "left")
      .na.fill(0L, Seq("n_old"))
    // lazy checkpoint: consumed by the two anti-joins below and by the
    // caller's drop audit — one evaluation of the count aggregates
    val droppedKeys = counts
      .where(col("n_new") + col("n_old") > cfg.maxBlockSize)
      .select(col("block_key"),
        (col("n_new") + col("n_old")).cast("long").as("block_size"))
      .localCheckpoint(false)

    val keptNew = newBlocks.join(
      broadcast(droppedKeys.select("block_key")), Seq("block_key"), "left_anti")
    val keptOld = oldRelevant.join(
      broadcast(droppedKeys.select("block_key")), Seq("block_key"), "left_anti")

    // new-new pairs: the batch fused path over the delta's kept blocks
    // (every kept key's combined size ≤ cap, so its delta-only subset is
    // under the cap too — pairsFromBlocks will drop nothing here)
    val (nnPairs, _) = Blocking.pairsFromBlocks(keptNew, cfg.maxBlockSize)
    // new-old pairs: one equi-join on block_key, fanout ≤ cap²/4 per key
    val noPairs = keptNew.select(col("block_key"), col("conv_id").as("h_new"))
      .join(keptOld.select(col("block_key"), col("conv_id").as("h_old")),
        "block_key")
      // same-hid guard: a delta doc colliding with a corpus doc on hid
      // would self-pair; mirrors the batch path's conv_a < conv_b
      .where(col("h_new") =!= col("h_old"))
      .select(least(col("h_new"), col("h_old")).as("conv_a"),
        greatest(col("h_new"), col("h_old")).as("conv_b"))
      .distinct()

    val pairs = nnPairs.select("conv_a", "conv_b")
      .unionByName(noPairs)

    // features for both sides ride the scoring join's own doc lookup
    val allDocs = newDocs.unionByName(
      priorDocs.select("conv_id", "tokh", "prefix", "hid"))
    val scored = Scoring.scorePairs(pairs, allDocs, cfg.weights,
      cfg.prefixChars, cfg.levMaxDist, pairIdCol = "hid")
    val matched = Scoring.matchedPairs(scored, cfg.scoreThreshold)
      .localCheckpoint(true, ser)

    // prior connectivity as membership edges; min-member labeling makes
    // cluster_id itself a member, so (id — cluster_id) edges regenerate
    // each old component exactly
    val memberEdges = priorClusters
      .where(col("conv_id") =!= col("cluster_id"))
      .select(col("conv_id").as("src"), col("cluster_id").as("dst"))
    val edges = matched.select(col("conv_a").as("src"), col("conv_b").as("dst"))
      .unionByName(memberEdges)

    val universe = priorClusters.select("conv_id")
      .unionByName(newDocs.select("conv_id"))
    // a matched pair can coincide with a membership edge (a new doc never
    // can, but src/dst orientation across the two sources may), so let CC
    // dedup (edgesDistinct = false)
    val clusters = ConnectedComponents.runWithUniverse(edges, universe,
      localMaxEdges = ConnectedComponents.defaultLocalMaxEdges)

    Result(clusters, matched, droppedKeys)
  }
}
