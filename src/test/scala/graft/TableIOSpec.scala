package graft

import graft.pipeline.ParquetTableIO
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class TableIOSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot overwrite: readers see the latest commit, history retained") {
    val root = Files.createTempDirectory("tio").toString
    val io = new ParquetTableIO(spark, root)
    assert(!io.exists("t"))

    io.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    assert(io.exists("t"))
    assert(io.read("t").count() == 2)

    io.write(Seq((3, "c")).toDF("id", "v"), "t")
    assert(io.read("t").as[(Int, String)].collect().toSeq == Seq((3, "c")))

    // both snapshots on disk (time travel / resume source)
    assert(Files.exists(Paths.get(s"$root/t/snapshot=0")))
    assert(Files.exists(Paths.get(s"$root/t/snapshot=1")))
    // pointer names the committed snapshot
    assert(new String(Files.readAllBytes(Paths.get(s"$root/t/_latest"))).trim == "1")
  }

  test("partitioned write + metrics rows per partition") {
    val root = Files.createTempDirectory("tio2").toString
    val io = new ParquetTableIO(spark, root)
    val df = (1 to 100).map(i => (i.toLong, s"k${i % 4}")).toDF("id", "k")
    io.write(df, "p", partitionBy = Seq("k"))
    assert(io.read("p").count() == 100)
    assert(Files.list(Paths.get(s"$root/p/snapshot=0")).toArray
      .exists(_.toString.contains("k=k1")))

    io.appendMetrics(io.read("p"), "p", "stage-p")
    val m = io.readMetrics().get
    assert(m.columns.toSet == Set("partition_id", "rows", "checksum", "table", "stage"))
    assert(m.agg(sum("rows")).as[Long].head() == 100)
  }

  test("reading a never-committed table fails loudly") {
    val io = new ParquetTableIO(spark, Files.createTempDirectory("tio3").toString)
    intercept[IllegalStateException](io.read("nope"))
  }

  test("expireSnapshots keeps the newest keepLast, never the committed one") {
    val root = Files.createTempDirectory("tio4").toString
    val io = new ParquetTableIO(spark, root)
    (0 to 3).foreach(i => io.write(Seq((i, s"v$i")).toDF("id", "v"), "t"))

    assert(io.expireSnapshots("t", keepLast = 2) == Seq(0, 1))
    assert(!Files.exists(Paths.get(s"$root/t/snapshot=1")))
    assert(Files.exists(Paths.get(s"$root/t/snapshot=2")))
    // committed snapshot untouched, reads keep working
    assert(io.read("t").as[(Int, String)].collect().toSeq == Seq((3, "v3")))

    // keepLast is clamped to >= 1: the committed snapshot survives
    assert(io.expireSnapshots("t", keepLast = 0) == Seq(2))
    assert(io.read("t").count() == 1)
    // idempotent; unknown table is a no-op
    assert(io.expireSnapshots("t", keepLast = 1).isEmpty)
    assert(io.expireSnapshots("nope", keepLast = 1).isEmpty)
  }
}
