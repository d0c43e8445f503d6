package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-defusing utilities (north rule: "partitioning / shuffle /
  * skew handled explicitly").
  *
  * AQE's skew-join handling re-splits oversized *shuffle partitions*; it
  * cannot help when a single join *key* is hot (all its rows still meet in
  * one task) or when a hot blocking key would emit O(n²) pairs. These two
  * utilities cover those cases:
  *
  *  - [[saltedEquiJoin]]: fact⋈dimension with a hot key — fact side gets a
  *    deterministic salt in [0, S), dimension side is replicated S ways, the
  *    join key becomes (key, salt) so a hot key spreads over S tasks.
  *  - [[saltSplitBlocks]]: blocking tables — keys above a size cap are
  *    *split* into S sub-blocks instead of dropped; within-sub-block pairs
  *    survive (bounded cost, documented recall loss on the hot key),
  *    and the split is reported, never silent.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, with `right` (the smaller /
    * dimension side) replicated `salts` ways. Result equals the plain join
    * (salting never changes the pair set — each left row meets exactly the
    * one replica matching its salt).
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1)
    // right/full-outer would emit each unmatched right row once per
    // replica (S duplicates) — only join types that never surface
    // unmatched *right* rows are sound under right-side replication
    val jt = joinType.toLowerCase.replaceAll("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")(jt),
      s"saltedEquiJoin replicates the right side; joinType '$joinType' would " +
        "duplicate unmatched right rows")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    saltedLeft.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Split oversized blocks: blocks(block_key, conv_id) → same schema with
    * hot keys re-keyed to (key, sub) sub-blocks of ≈ cap rows. Returns the
    * re-keyed blocks and a report of (block_key, block_size, n_subblocks).
    */
  def saltSplitBlocks(blocks: DataFrame, maxBlockSize: Int): (DataFrame, DataFrame) = {
    val sizes = blocks.groupBy("block_key").agg(count(lit(1)).as("block_size"))
    val hot = sizes.where(col("block_size") > maxBlockSize)
      .withColumn("n_subblocks",
        ceil(col("block_size").cast("double") / maxBlockSize).cast("int"))
    val rekeyed = blocks
      .join(hot.select(col("block_key"), col("n_subblocks")), Seq("block_key"), "left")
      .withColumn("block_key",
        when(col("n_subblocks").isNull, col("block_key"))
          .otherwise(xxhash64(col("block_key"),
            pmod(xxhash64(col("conv_id")), col("n_subblocks").cast("long")))))
      .drop("n_subblocks")
    (rekeyed, hot)
  }
}
