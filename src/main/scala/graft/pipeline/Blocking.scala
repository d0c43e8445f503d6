package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Candidate-pair generation (blocking).
  *
  * Reference analog: the n-gram ⋈ surface-form-dictionary join
  * (nordlys/erd/query/query.py:72-108, 161-167) — candidates share a key.
  * The graft replaces exact surface equality with (a) exact word-shingle
  * blocks and (b) MinHash-LSH band blocks over token shingles.
  *
  * Skew is handled *explicitly* (north rule): hot keys (stopword shingles /
  * dense LSH bands) blow up pair counts quadratically, which AQE cannot fix
  * — AQE only re-splits shuffle partitions, it cannot stop a 1M-row block
  * from emitting 5·10^11 pairs. So blocks above `maxBlockSize` are dropped
  * *before* the self-join, and the drop is surfaced in the returned
  * metrics, never silent. Oversize-block recall is recovered by the other
  * bands (LSH uses `bands` independent keys per doc).
  */
object Blocking {

  /** Exact shingle blocking: docs(conv_id, tokens) → (block_key, conv_id),
    * deduplicated. k-token shingles, hashed to long keys (tagged so exact
    * keys never collide with LSH band keys in hybrid mode).
    */
  def exactShingleBlocks(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("conv_id"), explode(word_shingles(col("tokens"), k)).as("shingle"))
      .select(col("conv_id"), xxhash64(lit("exact"), col("shingle")).as("block_key"))
      .dropDuplicates("conv_id", "block_key")

  /** Hybrid blocking: union of LSH band keys and exact shingle keys.
    * LSH gives sub-quadratic candidate generation on near-duplicates; the
    * exact-shingle side restores recall on heavily-noised pairs whose
    * shingle-Jaccard sits below the LSH S-curve knee (they still share
    * individual intact shingles). Hot exact keys are bounded by the
    * downstream block cap, so the union stays sub-quadratic.
    */
  def hybridBlocks(docs: DataFrame, exactK: Int, lshShingleK: Int,
                   numHashes: Int, bands: Int): DataFrame =
    minhashLshBlocks(docs, lshShingleK, numHashes, bands)
      .unionByName(exactShingleBlocks(docs, exactK))

  /** MinHash-LSH blocking: docs(conv_id, tokens) → (block_key, conv_id).
    * Signature of `numHashes` min-hashes over k-shingles, cut into `bands`
    * band keys (rowsPerBand = numHashes / bands). Two docs share a block
    * key iff one band of their signatures agrees — the standard LSH
    * S-curve; with 64 hashes / 16 bands (r=4), p(match) ≈ 1-(1-s^4)^16,
    * ≈ .97 at s=.7, ≈ .04 at s=.2.
    */
  def minhashLshBlocks(docs: DataFrame, shingleK: Int, numHashes: Int,
                       bands: Int): DataFrame = {
    require(numHashes % bands == 0, s"numHashes $numHashes % bands $bands != 0")
    val r = numHashes / bands
    // native codegen'd kernel: one hash per shingle + long-remix per slot.
    // (The first cut composed transform/aggregate HOFs — interpreted,
    // boxed, and with the signature re-evaluated per band: 20×+ slower and
    // GC-bound. See HashingKernels.)
    val _ = r
    docs
      .where(size(col("tokens")) > 0)
      .select(col("conv_id"),
        explode(minhash_band_keys(col("tokens"), shingleK, numHashes, bands))
          .as("block_key"))
  }

  /** Pairs from blocks with an explicit oversize cap.
    * Returns (pairs(conv_a, conv_b, n_blocks), droppedBlocks metrics DF
    * (block_key, block_size) — every dropped block is reported).
    *
    * Plan shape: count per key (1 shuffle, partial agg) → semi-filter keys
    * → self-join on block_key (1 shuffle each side) → distinct pairs
    * (1 shuffle). conv_a < conv_b canonicalizes.
    */
  def pairsFromBlocks(blocks: DataFrame, maxBlockSize: Int): (DataFrame, DataFrame) = {
    val sizes = blocks.groupBy("block_key").agg(count(lit(1)).as("block_size"))
    val dropped = sizes.where(col("block_size") > maxBlockSize)
    val keep = sizes.where(col("block_size").between(2, maxBlockSize)).select("block_key")

    val b = blocks.join(keep, Seq("block_key"))
    val pairs = b.as("x").join(b.as("y"), "block_key")
      .where(col("x.conv_id") < col("y.conv_id"))
      .groupBy(col("x.conv_id").as("conv_a"), col("y.conv_id").as("conv_b"))
      .agg(count(lit(1)).as("n_blocks"))
    (pairs, dropped)
  }
}
