package graft

import graft.sources.Readers
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("Y-ERD TSV reader parses the reference fixture shape") {
    val dir = Files.createTempDirectory("yerd").toString
    val f = s"$dir/yerd.tsv"
    Files.writeString(java.nio.file.Paths.get(f),
      "difficulty\tqid\tquery\tmention\tentity\tset_id\tfreebase_id\n" +
        "easy\ttrec-1\tjon gruden rumors\tjon gruden\t<dbpedia:Jon_Gruden>\t1\t/m/01x6brc\n" +
        "hard\ttrec-2\tthe music man\t\t\t\t\n")
    val df = Readers.readYerdTsv(spark, f)
    assert(df.columns.toSeq == Readers.YerdSchema.map(_.name))
    val rows = df.orderBy("qid").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("mention") == "jon gruden")
    assert(rows(1).getAs[String]("entity") == null) // bare-qid convention
  }

  test("TREC run sink writes rank-ordered 6-column rows") {
    val dir = Files.createTempDirectory("trec").toString + "/run"
    val ranked = Seq(
      ("q1", "<e1>", 1L, 0.9), ("q1", "<e2>", 2L, 0.5), ("q2", "<e3>", 1L, 0.7))
      .toDF("qid", "entity", "rnk", "score")
    Readers.writeTrecRun(ranked, dir, "graft-test")
    val back = spark.read.option("sep", "\t").csv(dir).collect()
    assert(back.length == 3)
    assert(back.forall(_.getString(1) == "Q0"))
    assert(back.forall(_.getString(5) == "graft-test"))
  }

  test("ERD-eval sink dedups identical entity sets and sorts entities") {
    val dir = Files.createTempDirectory("erde").toString + "/run"
    val clusters = Seq(
      ("q1", "s1", "<b>", 0.9), ("q1", "s1", "<a>", 0.8),
      ("q1", "s2", "<a>", 0.7), ("q1", "s2", "<b>", 0.6), // same set as s1 → dropped
      ("q2", "s3", "<c>", 0.5))
      .toDF("qid", "set_id", "entity", "score")
    Readers.writeErdEval(clusters, dir)
    val back = spark.read.option("sep", "\t").csv(dir).collect()
    assert(back.length == 2) // q1 deduped to one set + q2
    val q1 = back.filter(_.getString(0) == "q1").head
    assert(q1.getString(2) == "<a>" && q1.getString(3) == "<b>") // sorted
  }
}
