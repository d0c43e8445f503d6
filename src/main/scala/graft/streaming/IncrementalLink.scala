package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Blocking

/** Streaming incremental record linkage: the batch pipeline's blocking
  * semantics (hybrid MinHash-LSH + winnowed exact shingles,
  * [[graft.pipeline.Blocking]]) recast over an unbounded transcript
  * stream. New conversations are linked against previously-seen ones the
  * moment they arrive, instead of waiting for the next batch recompute —
  * the continuous-ingest complement to `Pipeline.run` at 10^12-turn scale
  * (reference analog: the per-query online linking loop of
  * nordlys/erd/app/erd_app.py:60-118, which links one incoming query
  * against a fixed dictionary; here the "dictionary" is the stream's own
  * past, held as bounded per-block state).
  *
  * Scale design:
  *   - Per-block state is BOUNDED: at most `maxBlockSize` member ids.
  *     A key that exceeds the cap collapses its state to a single
  *     oversize flag (O(1) for hot keys — stopword shingles / dense LSH
  *     bands stay cheap forever after they trip the cap).
  *   - State ages out by EVENT TIME: a block idle past `idleGap` (by
  *     watermark) is dropped, so total state is bounded by the active
  *     window's key count, not the stream's history.
  *   - Pair dedup is watermark-bounded (`dropDuplicatesWithinWatermark`).
  *
  * Semantics vs batch ([[Blocking.pairsFromBlocks]]): identical pair SET
  * for any block whose final size stays ≤ cap (verified in
  * `IncrementalLinkSpec`). Divergence on oversize blocks is inherent to
  * append-mode streaming: batch drops the whole block retroactively,
  * while the stream cannot retract pairs emitted before the cap tripped —
  * the first `maxBlockSize` members' pairs stand, later members are
  * dropped. Both directions are recall-safe for downstream exact verify
  * (extra candidates are scored and filtered, as in the batch scorer).
  */
object IncrementalLink {

  /** One doc's membership in one block. */
  case class BlockedDoc(block_key: Long, conv_id: String, ts: java.sql.Timestamp)

  /** A candidate pair emitted by a shared block; `ts` is the later
    * member's event time (drives the downstream dedup watermark).
    */
  case class PairHit(conv_a: String, conv_b: String, block_key: Long,
                     ts: java.sql.Timestamp)

  /** Per-block state: sorted member ids, collapsed when oversize. */
  case class BlockState(members: List[String], oversize: Boolean)

  /** Stateless block-key derivation — the SAME kernels and hash-family
    * seeds as the batch pipeline ([[Blocking.hybridBlocks]] defaults), so
    * a streaming deployment blocks identically to its batch backfill.
    * Input: streaming or batch DataFrame with (conv_id, ts) and either
    * `tokens: array<string>` or `text: string`.
    */
  def blockKeys(docs: DataFrame, exactK: Int = 8, lshShingleK: Int = 5,
                numHashes: Int = 64, bands: Int = 16,
                winnowW: Int = 4): DataFrame = {
    val toks =
      if (docs.columns.contains("tokens")) col("tokens")
      else graft.functions.tokens(col("text"))
    // array_union dedups (block_key, conv_id) repeats inline — the batch
    // path gets the same dedup from its bounded-collect aggregate
    val keys = array_union(
      graft.functions.minhash_band_keys(toks, lshShingleK, numHashes, bands),
      graft.functions.winnowed_shingle_hashes(toks, exactK, winnowW,
        Blocking.ExactShingleSeed))
    docs.where(size(toks) > 0)
      .select(col("conv_id"), col("ts").cast("timestamp").as("ts"),
        explode(keys).as("block_key"))
  }

  /** Stateful incremental pair emission. Each arriving member pairs with
    * every member already in its block's state (canonical a < b), then
    * joins the state; a member that would push the block past
    * `maxBlockSize` trips the oversize collapse instead. Within a
    * micro-batch, members are processed in (ts, conv_id) order so output
    * is deterministic for a given batch decomposition.
    *
    * `watermark` bounds event-time lateness; a block idle for `idleGap`
    * beyond the watermark drops its state (idleGap ≤ 0 → state never
    * expires; only sensible for tests and bounded backfills).
    */
  def incrementalPairs(blocked: DataFrame, maxBlockSize: Int,
                       watermark: String = "1 hour",
                       idleGapMs: Long = 3600000L): Dataset[PairHit] = {
    val spark = blocked.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleGapMs > 0) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    blocked
      .withWatermark("ts", watermark)
      .as[BlockedDoc]
      .groupByKey(_.block_key)
      .flatMapGroupsWithState[BlockState, PairHit](
        OutputMode.Append(), timeoutConf) {
        case (_, _, state: GroupState[BlockState]) if state.hasTimedOut =>
          state.remove()
          Iterator.empty
        case (key, rows, state: GroupState[BlockState]) =>
          var s = state.getOption.getOrElse(BlockState(Nil, oversize = false))
          val out = List.newBuilder[PairHit]
          var maxTs = 0L
          // deterministic intra-batch order; the buffer is one micro-batch
          // of one block key, itself cap-bounded in effect (everything past
          // the cap is skipped in O(1) after the collapse)
          val batch = rows.toSeq.sortBy(r => (r.ts.getTime, r.conv_id))
          batch.foreach { r =>
            maxTs = math.max(maxTs, r.ts.getTime)
            if (!s.oversize && !s.members.contains(r.conv_id)) {
              if (s.members.sizeIs >= maxBlockSize) {
                // collapse: hot-key state becomes O(1), like the batch
                // path's cap+1-bounded collect (Blocking.pairsFromBlocks)
                s = BlockState(Nil, oversize = true)
              } else {
                s.members.foreach { m =>
                  val (a, b) =
                    if (m < r.conv_id) (m, r.conv_id) else (r.conv_id, m)
                  out += PairHit(a, b, key, r.ts)
                }
                s = s.copy(members = r.conv_id :: s.members)
              }
            }
          }
          state.update(s)
          if (idleGapMs > 0)
            // must exceed the current watermark or Spark rejects the
            // timestamp; the max() keeps late-data batches legal
            state.setTimeoutTimestamp(
              math.max(maxTs + idleGapMs, state.getCurrentWatermarkMs() + 1))
          out.result().iterator
      }
  }

  /** Cross-block pair dedup, watermark-bounded (the streaming analog of
    * the batch path's groupBy(conv_a, conv_b) dedup shuffle): a pair
    * re-emitted by another shared block inside the watermark window is
    * dropped; state for old pairs ages out with the watermark.
    */
  def dedupedPairs(pairs: Dataset[PairHit],
                   watermark: String = "1 hour"): Dataset[PairHit] =
    pairs
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("conv_a", "conv_b")

  // --------------------------------------------------------------------
  // Stream-static linkage: link incoming docs against a STATIC corpus
  // snapshot (yesterday's lake) instead of the stream's own past. The
  // whole path is STATELESS except the watermarked candidate dedup —
  // blocking is a stream-static equi-join on block_key (no state), and
  // scoring runs the batch kernels inline on the joined row. This is the
  // deployment shape for "dedup the day's ingest against the 100-TB
  // corpus": the index is built once per snapshot (bucket it by
  // block_key in production so the per-batch join probes co-located
  // buckets), the stream pays one narrow join per micro-batch.
  // --------------------------------------------------------------------

  /** Per-doc linkage features: the scoring payload of
    * [[graft.pipeline.Scoring.scorePairs]] (distinct 64-bit token hashes +
    * a bounded normalized prefix) plus one row per hybrid block key.
    */
  private def docFeatures(docs: DataFrame, exactK: Int, lshShingleK: Int,
                          numHashes: Int, bands: Int, winnowW: Int,
                          prefixChars: Int): DataFrame = {
    val toks =
      if (docs.columns.contains("tokens")) col("tokens")
      else graft.functions.tokens(col("text"))
    val prefix =
      if (docs.columns.contains("text"))
        substring(graft.functions.norm_text(col("text")), 1, prefixChars)
      else substring(concat_ws(" ", col("tokens")), 1, prefixChars)
    val keys = array_union(
      graft.functions.minhash_band_keys(toks, lshShingleK, numHashes, bands),
      graft.functions.winnowed_shingle_hashes(toks, exactK, winnowW,
        Blocking.ExactShingleSeed))
    val base = docs.where(size(toks) > 0)
      .withColumn("tok_set", graft.functions.shingle_hashes(toks, 1))
      .withColumn("prefix", prefix)
    base.select(
      (base.columns.filterNot(Set("text", "tokens")).map(col) :+
        explode(keys).as("block_key")).toIndexedSeq: _*)
  }

  /** Build the static side of the stream-static join from a corpus
    * snapshot (conv_id + text|tokens): (block_key, corpus_id,
    * corpus_tok_set, corpus_prefix), with keys shared by more than
    * `maxKeyFanout` corpus docs dropped (the batch cap's analog — a hot
    * stopword-shingle key would fan every incoming doc out against
    * thousands of corpus rows; recall rides the doc's other keys).
    * Persist (or write bucketed by block_key) before serving: a streaming
    * query re-evaluates an unpersisted static plan every micro-batch.
    */
  def corpusIndex(corpus: DataFrame, exactK: Int = 8, lshShingleK: Int = 5,
                  numHashes: Int = 64, bands: Int = 16, winnowW: Int = 4,
                  maxKeyFanout: Int = 64, prefixChars: Int = 256): DataFrame = {
    val feat = docFeatures(
      corpus.select(col("conv_id").as("corpus_id"),
        col(if (corpus.columns.contains("text")) "text" else "tokens")),
      exactK, lshShingleK, numHashes, bands, winnowW, prefixChars)
      .withColumnRenamed("tok_set", "corpus_tok_set")
      .withColumnRenamed("prefix", "corpus_prefix")
    val hot = feat.groupBy("block_key").agg(count(lit(1)).as("n"))
      .where(col("n") > maxKeyFanout)
    feat.join(broadcast(hot.select("block_key")), Seq("block_key"), "left_anti")
  }

  /** Link a stream of new docs (conv_id, ts, text|tokens) against a
    * [[corpusIndex]]: stream-static join on block_key, watermarked
    * candidate dedup (a pair sharing several keys is scored once per
    * watermark window), then the batch scoring mixture inline
    * (token-Jaccard + Jaro-Winkler + bounded-Levenshtein, identical
    * kernels and weights to [[graft.pipeline.Scoring.scorePairs]]).
    * Returns matches at `threshold` — append-mode, no retractions.
    */
  def linkAgainstCorpus(stream: DataFrame, index: DataFrame,
                        w: graft.pipeline.Scoring.Weights =
                          graft.pipeline.Scoring.Weights(),
                        threshold: Double = 0.55, levMaxDist: Int = 128,
                        watermark: String = "1 hour", exactK: Int = 8,
                        lshShingleK: Int = 5, numHashes: Int = 64,
                        bands: Int = 16, winnowW: Int = 4,
                        prefixChars: Int = 256): DataFrame =
    docFeatures(stream, exactK, lshShingleK, numHashes, bands, winnowW,
      prefixChars)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .join(index, "block_key")
      // dedup BEFORE the kernels: candidates duplicated by shared keys
      // must not pay the O(prefix²) string kernels more than once
      .dropDuplicatesWithinWatermark("conv_id", "corpus_id")
      .withColumn("jaccard",
        graft.functions.token_jaccard(col("tok_set"), col("corpus_tok_set")))
      .withColumn("jw",
        graft.functions.jaro_winkler(col("prefix"), col("corpus_prefix")))
      .withColumn("lev_sim", graft.functions.levenshtein_sim(
        col("prefix"), col("corpus_prefix"), levMaxDist))
      .withColumn("score",
        lit(w.jaccard) * col("jaccard") + lit(w.jaroWinkler) * col("jw") +
          lit(w.levenshtein) * col("lev_sim"))
      .where(col("score") >= threshold)
      .select(col("conv_id"), col("corpus_id"), col("ts"),
        col("jaccard"), col("jw"), col("lev_sim"), col("score"))
}
