package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Extra (non-driver) benchmark: noop-sink isolation of sub-fragments of
  * the most expensive declared queries (optimization guide §1.4), so a
  * change can be attributed to the stage it touches. NOT part of the
  * frozen driver contract — Bench.scala is the measurement harness; this
  * main only exists to locate seconds inside individual query plans.
  * Usage: runMain graft.BenchExtra <sfDir> [fragment...]
  */
object BenchExtra {

  private def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"FRAG $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val only = args.tail.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // same session shape as Bench.session
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (4 * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def want(s: String) = only.isEmpty || only.exists(s.startsWith)
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // q15 decomposition: tokenize → shingle explode → bounded collect →
    // pair explode + dedup → verify
    if (want("q15")) {
      val base = docs.select(col("doc_id").as("conv_id"), tokens(col("text")).as("tokens"))
      time("q15.tokenize")(base)
      time("q15.blocks")(pipeline.Blocking.exactShingleBlocks(base, 3))
      val blocks = pipeline.Blocking.exactShingleBlocks(base, 3)
      time("q15.agg")(blocks.where(col("conv_id").isNotNull).groupBy("block_key")
        .agg(graft.functions.BoundedCollectSet.bounded(65, col("conv_id").cast("long")).as("members")))
      time("q15.pairs")(pipeline.Blocking.pairsFromBlocks(blocks, 64)._1)
      val (p15, _) = pipeline.Blocking.pairsFromBlocks(blocks, 64)
      println("q15 pair count = " + p15.count())
      val sh15 = base.select(col("conv_id"), shingle_hashes(col("tokens"), 3).as("sh"))
      time("q15.verify.joinonly")(p15.select("conv_a", "conv_b")
        .repartition(32, col("conv_a"), col("conv_b"))
        .join(sh15.select(col("conv_id").as("conv_a"), col("sh").as("sh_a")), "conv_a")
        .join(sh15.select(col("conv_id").as("conv_b"), col("sh").as("sh_b")), "conv_b"))
      time("q15.verify.kernel")(p15.select("conv_a", "conv_b")
        .repartition(32, col("conv_a"), col("conv_b"))
        .join(sh15.select(col("conv_id").as("conv_a"), col("sh").as("sh_a")), "conv_a")
        .join(sh15.select(col("conv_id").as("conv_b"), col("sh").as("sh_b")), "conv_b")
        .withColumn("jaccard", token_jaccard(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= 0.5))
      time("q15.full")(operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 64))
    }

    // q13 decomposition
    if (want("q13")) {
      val blocks = docs.select(col("doc_id").as("conv_id"),
        explode(shingle_hashes(tokens(col("text")), 3)).as("block_key"))
      time("q13.blocks")(blocks)
      val (allPairs, _) = pipeline.Blocking.pairsFromBlocks(blocks, 64)
      time("q13.pairs")(allPairs)
      time("q13.full")(SparkEntry.queries("q13_pair_scores")(spark, sfDir))
    }

    // q54 decomposition
    if (want("q54")) {
      val sh = docs.select(col("doc_id"),
        explode(array_distinct(word_shingles(tokens(col("text")), 3))).as("block_key"))
      time("q54.sh")(sh)
      val kept = sh.groupBy("block_key").agg(count(lit(1)).as("c"))
        .where(col("c").between(2, 64)).select("block_key")
      val blocks = sh.join(kept, Seq("block_key"))
      time("q54.blocks")(blocks)
      val b = blocks.select(col("doc_id").as("id"), col("block_key").as("key"))
      time("q54.selfjoin")(b.as("x").join(b.as("y"),
        col("x.key") === col("y.key") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct())
      val norm = docs.select(col("doc_id"), norm_text(col("text")).as("norm"))
      time("q54.gt")(norm.as("x").join(norm.as("y"),
        col("x.norm") === col("y.norm") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")))
      time("q54.full")(SparkEntry.queries("q54_blocking_metrics")(spark, sfDir))
    }

    // q53 decomposition
    if (want("q53")) {
      val corpus = docs.where(pmod(col("doc_id"), lit(17)) =!= 0)
        .select(col("doc_id").cast("string").as("conv_id"), col("text"))
      time("q53.index")(graft.streaming.IncrementalLink.corpusIndex(corpus))
      time("q53.full")(SparkEntry.queries("q53_stream_static_link")(spark, sfDir))
    }

    spark.stop()
  }
}
