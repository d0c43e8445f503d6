package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end record-linkage pipeline (the north rule):
  *
  *   transcripts → docs → blocks → candidate pairs → scored pairs
  *              → matched edges → connected components → clusters
  *
  * Each stage optionally materializes to a [[TableIO]] snapshot table with
  * per-partition lineage/metrics rows; a re-run with the same config skips
  * stages whose snapshot already exists (resume-from-checkpoint, the
  * formalized version of the reference's stage JSON files,
  * ranker_mlm.py:174-180).
  */
object Pipeline {

  /** blocking strategies */
  sealed trait BlockingMode
  case object ExactBlocking extends BlockingMode
  case object LshBlocking extends BlockingMode
  case object HybridBlocking extends BlockingMode

  case class Config(
      shingleK: Int = 3,
      blocking: BlockingMode = HybridBlocking,
      lshShingleK: Int = 2,
      numHashes: Int = 96,
      bands: Int = 24,
      maxBlockSize: Int = 64,
      weights: Scoring.Weights = Scoring.Weights(),
      scoreThreshold: Double = 0.55,
      prefixChars: Int = 256,
      levMaxDist: Int = 128)

  case class StageResult(clusters: DataFrame, droppedBlocks: DataFrame)

  /** Run without checkpointing (tests / small inputs). */
  def run(transcripts: DataFrame, cfg: Config = Config()): StageResult =
    runStages(transcripts, cfg, None)

  /** Run with TableIO checkpoints; stages present in `io` are reused. */
  def runCheckpointed(transcripts: DataFrame, cfg: Config, io: TableIO): StageResult =
    runStages(transcripts, cfg, Some(io))

  private def runStages(transcripts: DataFrame, cfg: Config,
                        io: Option[TableIO]): StageResult = {
    def stage(name: String)(build: => DataFrame): DataFrame = io match {
      case Some(t) if t.exists(name) => t.read(name)
      case Some(t) =>
        val df = build
        t.write(df, name)
        val out = t.read(name)
        t.appendMetrics(out, name, name)
        out
      case None => build
    }

    val docs = stage("docs")(DocAssembly.assemble(transcripts))

    val blocks = stage("blocks") {
      cfg.blocking match {
        case ExactBlocking => Blocking.exactShingleBlocks(docs, cfg.shingleK)
        case LshBlocking =>
          Blocking.minhashLshBlocks(docs, cfg.lshShingleK, cfg.numHashes, cfg.bands)
        case HybridBlocking =>
          Blocking.hybridBlocks(docs, cfg.shingleK, cfg.lshShingleK, cfg.numHashes, cfg.bands)
      }
    }

    val (pairsDf, droppedDf) = Blocking.pairsFromBlocks(blocks, cfg.maxBlockSize)
    val pairs = stage("pairs")(pairsDf)
    val dropped = stage("dropped_blocks")(droppedDf)

    val scored = stage("scored")(
      Scoring.scorePairs(pairs, docs, cfg.weights, cfg.prefixChars, cfg.levMaxDist))
    val edges = stage("edges")(
      Scoring.matchedPairs(scored, cfg.scoreThreshold)
        .select(col("conv_a").as("src"), col("conv_b").as("dst")))

    val clusters = stage("clusters") {
      val checkpointFn: (DataFrame, Int) => DataFrame = io match {
        case Some(t) => (df, i) => { t.write(df, s"cc_round"); t.read(s"cc_round") }
        case None => (df, _) => df.localCheckpoint(true)
      }
      val assignment = ConnectedComponents.run(edges, checkpointFn)
      // attach singletons: every conversation is its own cluster unless linked
      docs.select(col("conv_id")).join(assignment, Seq("conv_id"), "left")
        .select(col("conv_id"), coalesce(col("cluster_id"), col("conv_id")).as("cluster_id"))
    }

    StageResult(clusters, dropped)
  }
}
