package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Pipeline, TranscriptGen}

/** Quick pipeline timing probe: runMain graft.BenchPipeline [nBase] [cores] */
object BenchPipeline {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 2000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(sys.env.getOrElse("GRAFT_MASTER", s"local[$cores]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = TranscriptGen.transcripts(spark, nBase, 2).localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val turns = t.count() // materialize input; bench measures the pipeline
    val t0 = System.nanoTime()
    Pipeline.run(t).clusters.write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PIPELINE turns=$turns sec=$sec%.2f turns_per_sec=${turns / sec}%.1f cores=$cores")
    spark.stop()
  }
}
