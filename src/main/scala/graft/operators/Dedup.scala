package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._
import graft.pipeline.Blocking

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators follow the same scale shape as the ER pipeline
  * (SURVEY.md §7): candidate generation by shared key (never a cross
  * join), bounded block sizes with explicit caps, then an exact verify
  * stage on the candidates only. Each is a `queries()` entry in
  * [[graft.SparkEntry]].
  */
object Dedup {

  /** Exact dedup on normalized text: one keeper (min id) per group.
    * Returns (doc_id, keeper_id, is_dup). Single shuffle on the 64-bit
    * text hash + a window — at 100 TB the hash groups are tiny, no skew
    * beyond genuinely identical hot documents.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"))
    docs
      .select(col(idCol), xxhash64(norm_text(col(textCol))).as("grp"))
      .withColumn("keeper_id", min(col(idCol)).over(w))
      .select(col(idCol), col("keeper_id"), (col(idCol) =!= col("keeper_id")).as("is_dup"))
  }

  /** N-gram (shingle) Jaccard near-dup pairs via exact-shingle blocking.
    * (a, b, jaccard) with jaccard ≥ minJaccard; blocks above `cap` dropped
    * (and surfaced by the pipeline metrics path).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, minJaccard: Double, cap: Int): DataFrame = {
    // materialize the tokenized base once: blocks + both sides of the
    // verify join consume it, and re-evaluating the tokenizer tree per
    // consumer multiplies the dominant cost
    val base = docs.select(col(idCol).as("conv_id"), tokens(col(textCol)).as("tokens"))
      .localCheckpoint(true)
    val blocks = Blocking.exactShingleBlocks(base, shingleK).localCheckpoint(true)
    val (pairs, _) = Blocking.pairsFromBlocks(blocks, cap)
    val sh = base.select(col("conv_id"),
      array_distinct(word_shingles(col("tokens"), shingleK)).as("sh"))
    pairs
      .join(sh.select(col("conv_id").as("conv_a"), col("sh").as("sh_a")), "conv_a")
      .join(sh.select(col("conv_id").as("conv_b"), col("sh").as("sh_b")), "conv_b")
      .withColumn("jaccard", token_jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= minJaccard)
      .select(col("conv_a").as("a"), col("conv_b").as("b"), col("jaccard"))
  }

  /** MinHash-LSH near-dup pairs: sub-quadratic candidate generation, exact
    * shingle-Jaccard verify. The scale path for 100 TB dedup (candidates
    * per doc bounded by bands × cap).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleK: Int, numHashes: Int, bands: Int,
                      minJaccard: Double, cap: Int): DataFrame = {
    val base = docs.select(col(idCol).as("conv_id"), tokens(col(textCol)).as("tokens"))
      .localCheckpoint(true)
    val blocks = Blocking.minhashLshBlocks(base, shingleK, numHashes, bands)
      .localCheckpoint(true)
    val (pairs, _) = Blocking.pairsFromBlocks(blocks, cap)
    val sh = base.select(col("conv_id"),
      array_distinct(word_shingles(col("tokens"), shingleK)).as("sh"))
    pairs
      .join(sh.select(col("conv_id").as("conv_a"), col("sh").as("sh_a")), "conv_a")
      .join(sh.select(col("conv_id").as("conv_b"), col("sh").as("sh_b")), "conv_b")
      .withColumn("jaccard", token_jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= minJaccard)
      .select(col("conv_a").as("a"), col("conv_b").as("b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash, blocked on its four 16-bit
    * chunks (any pair within Hamming distance ≤ 3·16-bit-chunk corruption
    * shares at least one intact chunk — the standard Charikar banding),
    * then exact Hamming verify.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, cap: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("conv_id"),
      simhash64(tokens(col(textCol))).as("sim"))
      .localCheckpoint(true)
    val blocks = sh.select(col("conv_id"),
      explode(transform(sequence(lit(0), lit(3)), i =>
        // chunk i of 16 bits, tagged with the chunk index
        xxhash64(i, call_function("shiftright", col("sim"), i * 16).bitwiseAND(0xFFFF))))
        .as("block_key"))
    val (pairs, _) = Blocking.pairsFromBlocks(blocks, cap)
    pairs
      .join(sh.select(col("conv_id").as("conv_a"), col("sim").as("sim_a")), "conv_a")
      .join(sh.select(col("conv_id").as("conv_b"), col("sim").as("sim_b")), "conv_b")
      .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("conv_a").as("a"), col("conv_b").as("b"), col("hamming"))
  }

  /** Embedding cosine near-dup pairs: random-hyperplane sign-bucket LSH
    * (deterministic hash-derived hyperplanes, built-in exprs only), exact
    * cosine verify inside buckets.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                           signBits: Int, minCosine: Double, cap: Int): DataFrame = {
    val bucketed = emb.select(col(idCol).cast("string").as("conv_id"),
      signBucket(col(vecCol), signBits).as("block_key"))
      .localCheckpoint(true)
    val (pairs, _) = Blocking.pairsFromBlocks(bucketed, cap)
    val v = emb.select(col(idCol).cast("string").as("conv_id"), col(vecCol).as("vec"))
    pairs
      .join(v.select(col("conv_id").as("conv_a"), col("vec").as("vec_a")), "conv_a")
      .join(v.select(col("conv_id").as("conv_b"), col("vec").as("vec_b")), "conv_b")
      .withColumn("cosine", cosine_sim(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= minCosine)
      .select(col("conv_a").as("a"), col("conv_b").as("b"), col("cosine"))
  }

  /** Sign-bit bucket key: bit j = sign of ⟨vec, h_j⟩ where hyperplane
    * h_j's components are hash-derived pseudo-random weights in [-1, 1].
    * Fully codegen'd (transform with element index + aggregate).
    */
  private[operators] def signBucket(vec: org.apache.spark.sql.Column, signBits: Int) = {
    val bits = transform(sequence(lit(0), lit(signBits - 1)), j => {
      val dotj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) =>
          x.cast("double") * (pmod(xxhash64(j, d), lit(2001)).cast("double") - 1000.0) / 1000.0),
        lit(0.0d), (acc, t) => acc + t)
      when(dotj > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
  }
}
