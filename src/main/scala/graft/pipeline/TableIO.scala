package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Iceberg-contract table layer, Parquet-backed in-sandbox.
  *
  * The sandbox ships no Iceberg runtime (/opt/spark/jars has none), so this
  * trait carries the Iceberg *semantics* the pipeline depends on — atomic
  * snapshot overwrite, snapshot history, readable latest pointer — over
  * plain Parquet paths. Swapping in real Iceberg on a cluster is a one-class
  * change (`CREATE TABLE ... USING iceberg` + `overwritePartitions`).
  *
  * Reference analog: the stage-to-stage JSON checkpoint files
  * (nordlys/erd/cer/ranker_mlm.py:174-180, isf/set_generator.py:171-183) —
  * formalized as versioned tables with per-partition lineage + metrics rows
  * (north-rule resumability).
  */
trait TableIO {
  def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit
  def read(table: String): DataFrame
  def exists(table: String): Boolean
  /** Append stage metrics rows: (table, stage, partition_id, rows, checksum). */
  def appendMetrics(df: DataFrame, table: String, stage: String): Unit
  def readMetrics(): Option[DataFrame]
  /** Drop all but the newest `keepLast` snapshots of `table`; returns the
    * expired snapshot ids. Default no-op for backends without snapshot
    * history. Part of the trait because the maintenance loop
    * ([[IncrementalPipeline.commitSnapshots]]) must be able to bound
    * snapshot accretion through the same handle it commits through.
    */
  def expireSnapshots(table: String, keepLast: Int): Seq[Int] = Nil
}

/** Parquet snapshot layout:
  *   root/<table>/snapshot=<n>/   (data)
  *   root/<table>/_latest         (text file: committed snapshot id)
  * Writes go to a new snapshot dir, then the pointer moves atomically —
  * readers never observe a half-written table, and old snapshots remain
  * for time-travel / resume.
  */
final class ParquetTableIO(spark: SparkSession, root: String) extends TableIO {
  private def dir(table: String) = s"$root/$table"
  private def pointer(table: String) = Paths.get(dir(table), "_latest")

  private def latestSnapshot(table: String): Option[Int] = {
    val p = pointer(table)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  override def exists(table: String): Boolean = latestSnapshot(table).isDefined

  override def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val next = latestSnapshot(table).getOrElse(-1) + 1
    val path = s"${dir(table)}/snapshot=$next"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    // atomic pointer flip = snapshot commit
    Files.createDirectories(Paths.get(dir(table)))
    val tmp = Paths.get(dir(table), "_latest.tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def read(table: String): DataFrame = {
    val snap = latestSnapshot(table).getOrElse(
      throw new IllegalStateException(s"table $table has no committed snapshot under $root"))
    spark.read.parquet(s"${dir(table)}/snapshot=$snap")
  }

  override def appendMetrics(df: DataFrame, table: String, stage: String): Unit = {
    val m = df
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"),
        coalesce(bit_xor(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*))), lit(0L)).as("checksum"))
      .withColumn("table", lit(table))
      .withColumn("stage", lit(stage))
    m.write.mode("append").parquet(s"$root/_metrics")
  }

  override def readMetrics(): Option[DataFrame] =
    if (Files.exists(Paths.get(s"$root/_metrics")))
      Some(spark.read.parquet(s"$root/_metrics"))
    else None

  /** Iceberg-style snapshot expiry: delete all but the newest `keepLast`
    * snapshots of `table` (the committed one always survives — `keepLast`
    * is clamped to ≥ 1). Old snapshots are the time-travel / resume
    * sources, but on a lake they accumulate a full table copy per commit;
    * periodic expiry is the maintenance half of every snapshot write this
    * layer does (the real-Iceberg swap-in is `expireSnapshots`).
    * Returns the ids of the snapshots deleted.
    */
  override def expireSnapshots(table: String, keepLast: Int): Seq[Int] = {
    val latest = latestSnapshot(table).getOrElse(return Nil)
    val cutoff = latest - math.max(1, keepLast) + 1
    val dirPath = Paths.get(dir(table))
    if (!Files.isDirectory(dirPath)) return Nil
    // Files.list / Files.walk hold an open directory handle until closed —
    // leak-free via try/finally (ADVICE r4); stray non-numeric
    // "snapshot=…" names are skipped, not a NumberFormatException.
    val listing = Files.list(dirPath)
    val expired =
      try listing.toArray.toSeq.map(_.toString).flatMap { p =>
        val name = Paths.get(p).getFileName.toString
        if (name.startsWith("snapshot="))
          scala.util.Try(name.stripPrefix("snapshot=").toInt).toOption
            .filter(_ < cutoff)
        else None
      }.sorted
      finally listing.close()
    expired.foreach { id =>
      val snap = Paths.get(dir(table), s"snapshot=$id")
      // delete children depth-first, then the snapshot dir itself
      val walk = Files.walk(snap)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
    expired
  }
}
