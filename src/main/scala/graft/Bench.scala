package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Pipeline, TranscriptGen}

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "pipeline":{...}} where "pipeline" carries the north-rule scaling
  * evidence: the same end-to-end record-linkage job at two parallelism
  * levels (local[N] and local[4N] as the sandbox proxy for N vs 4N
  * executors), throughput in turns/sec at both, and the normalized
  * scaling efficiency (speedup / 4).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      // constant across parallelism levels: partitioning is data layout,
      // not a resource knob — the N vs 4N comparison must only vary cores
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One full pipeline run; returns (turns, seconds). */
  private def pipelineRun(spark: SparkSession, nBase: Long): (Long, Double) = {
    val t = TranscriptGen.transcripts(spark, nBase, dupsPerBase = 2)
    val t0 = System.nanoTime()
    val turns = t.count()
    val clusters = Pipeline.run(t).clusters
    clusters.write.mode("overwrite").format("noop").save()
    (turns, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_NBASE", "20000").toLong

    // --- operator queries at the requested parallelism ---
    val spark = session(cpus)
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          failed ::= name; false
        }
      // drop cached blocks between queries: pinned intermediates from one
      // query must not distort the next query's memory budget
      spark.catalog.clearCache()
      // a failed query is reported as negative elapsed, never as a timing
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    spark.stop()

    // --- north-rule scaling: same job, two parallelism levels ---
    // min of 2 measured runs per level: the sandbox VM shows heavy external
    // timing interference, min filters it out (both levels get identical
    // treatment)
    val loCores = math.max(cpus / 4, 2)
    def measure(cores: Int): (Long, Double) = {
      val s = session(cores)
      pipelineRun(s, math.min(scaleBase, 500L)) // warmup (JIT, codegen cache)
      val runs = Seq(pipelineRun(s, scaleBase), pipelineRun(s, scaleBase))
      s.stop()
      runs.minBy(_._2)
    }
    val (turnsLo, tLo) = measure(loCores)
    val (turnsHi, tHi) = measure(cpus)

    val thrLo = turnsLo / tLo
    val thrHi = turnsHi / tHi
    val eff = (thrHi / thrLo) / (cpus.toDouble / loCores)

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val pipeline =
      f"""{"turns":$turnsHi,"cores_lo":$loCores,"cores_hi":$cpus,""" +
        f""""sec_lo":$tLo%.2f,"sec_hi":$tHi%.2f,""" +
        f""""turns_per_sec_lo":$thrLo%.1f,"turns_per_sec_hi":$thrHi%.1f,""" +
        f""""scaling_efficiency":$eff%.3f}"""
    println(
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","pipeline":$pipeline}""")
  }
}
