package graft

import graft.functions._
import graft.operators.Features
import graft.sources.Readers
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("faccPairFeatures hand-computed (facc_feat.py formulas)") {
    // 4 docs: e1 in {1,2,3}, e2 in {2,3}, e3 in {4}
    val facc = Seq((1L, "e1"), (2L, "e1"), (3L, "e1"), (2L, "e2"), (3L, "e2"), (4L, "e3"))
      .toDF("doc_id", "entity")
    val pairs = Seq(("e1", "e2"), ("e1", "e3")).toDF("e1", "e2")
    val out = Features.faccPairFeatures(pairs, facc, 4)
      .select("e1", "e2", "and_freq", "or_freq", "joint_prob", "entropy", "jc", "mw_rel")
      .as[(String, String, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val a = out(("e1", "e2"))
    assert(a._3 == 2 && a._4 == 3)                       // and=2, or=3+2-2
    assert(math.abs(a._5 - 0.5) < 1e-12)                 // p = 2/4
    assert(math.abs(a._6 - math.log(2)) < 1e-12)         // H(0.5) = ln 2
    assert(math.abs(a._7 - 2.0 / 3) < 1e-12)
    // mw = 1 - (ln max - ln and)/(ln N - ln min) = 1 - (ln3-ln2)/(ln4-ln2)
    assert(math.abs(a._8 - (1 - (math.log(3) - math.log(2)) / (math.log(4) - math.log(2)))) < 1e-12)
    val b = out(("e1", "e3")) // disjoint: and=0
    assert(b._3 == 0 && b._7 == 0.0 && b._8 == 0.0 && b._6 == 0.0)
  }

  test("graphSetFeatures on a hand graph (graph_feat.py conventions)") {
    // cluster c1: a-b linked, c isolated; common neighbor of all three = x
    val members = Seq(
      ("c1", "a", Seq("b", "x")),
      ("c1", "b", Seq("x")),
      ("c1", "c", Seq("x", "y")),
      ("c2", "solo", Seq("z")))
      .toDF("cluster_id", "entity", "links")
    val out = Features.graphSetFeatures(members)
      .select("cluster_id", "n", "n_edges", "common_neighbors", "all_neighbors",
        "completeness", "jc")
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val c1 = out("c1")
    assert(c1._2 == 3 && c1._3 == 1)                  // edge a-b only
    assert(c1._4 == 1 && c1._5 == 3)                  // common {x}; all {b,x,y}
    assert(math.abs(c1._6 - 1.0 / 3) < 1e-12)         // 1 edge / 3 possible
    assert(math.abs(c1._7 - 1.0 / 3) < 1e-12)
    val c2 = out("c2")                                // singleton conventions
    assert(c2._2 == 1 && c2._4 == -1 && c2._6 == 1.0 && c2._7 == -1.0)
  }

  test("pruneLargestDelta matches the sequential reference loop on fuzz inputs (pruner.py:11-42)") {
    // scalar re-implementation of the loop
    def oracle(scores: Seq[Double]): Seq[Double] = {
      val s = scores.sorted(Ordering[Double].reverse)
      if (s.length <= 2) return s
      val valid = scala.collection.mutable.ArrayBuffer(s(0))
      var maxDelta = s(0) - s(1)
      var i = 1
      while (i < s.length) {
        if (i == s.length - 1) { valid += s(i); return valid.toSeq }
        val d = s(i) - s(i + 1)
        if (d >= maxDelta) { valid += s(i); maxDelta = d; i += 1 }
        else return valid.toSeq
      }
      valid.toSeq
    }
    val rnd = new scala.util.Random(3)
    val groups = (0 until 40).map { q =>
      val n = 1 + rnd.nextInt(8)
      // distinct scores (the reference orders by score only)
      q.toString -> rnd.shuffle((1 to 30).toList).take(n).map(_.toDouble)
    }
    val df = groups.flatMap { case (q, ss) => ss.map(s => (q, s)) }.toDF("qid", "score")
    val got = Features.pruneLargestDelta(df, "qid", "score")
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted(Ordering[Double].reverse).toSeq).toMap
    groups.foreach { case (q, ss) =>
      assert(got.getOrElse(q, Nil) == oracle(ss), s"group $q scores $ss")
    }
  }

  test("entityMentionFeatures booleans and pos1 (entity_mention_feat.py:27-63)") {
    val df = Seq(
      ("new york city", "New_York", "visit new york city today"),
      ("ny", "New_York", "big apple"),
      ("new york", "New York", "x"))
      .toDF("mention", "title", "abs")
    val out = Features.entityMentionFeatures(df, $"mention", $"title", $"abs")
      .select("mention", "mct", "tcm", "tem", "pos1")
      .as[(String, Int, Int, Int, Int)].collect()
    assert(out(0) == (("new york city", 1, 0, 0, 6)))  // mention ⊇ title; pos 0-based
    assert(out(1) == (("ny", 0, 0, 0, 1000)))          // absent from abstract
    assert(out(2) == (("new york", 1, 1, 1, 1000)))
  }

  test("concatInstances: sequential ids across frames (instances.py:268-283)") {
    val a = Seq(10L, 30L).toDF("doc_id")
    val b = Seq(20L).toDF("doc_id")
    val out = Features.concatInstances(Seq(a, b), Seq("doc_id"))
      .orderBy("ins_id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((10L, 0L), (30L, 1L), (20L, 2L)))
  }

  test("ERD annotation reader parses the 5-col reference fixture") {
    val ann = Readers.readErdAnnotations(spark, "/root/reference/data/Trec_beta.annotation.txt")
    assert(ann.columns.toSeq == Seq("qid", "set_id", "freebase_id", "mention", "label"))
    val first = ann.where($"qid" === "TREC-7").head
    assert(first.getString(2) == "/m/04cnvy" && first.getString(3) == "bowflex")
    assert(ann.count() > 50)
  }

  test("id/URI scalar functions (freebase/utils.py, indexer.py:27-35)") {
    val out = Seq("/m/02_286").toDF("id").select(
      fb_id_to_uri($"id").as("uri"),
      fb_uri_to_id(fb_id_to_uri($"id")).as("back"),
      uri_to_name(lit("<dbpedia:Charleston,_South_Carolina>")).as("n1"),
      uri_to_name(lit("<dbpedia:Category:Some_Thing>")).as("n2"),
      uri_to_name(lit("plain text")).as("n3"),
      percent_decode(lit("a%2Fb%20c")).as("dec")).head
    assert(out.getString(0) == "<fb:m.02_286>")
    assert(out.getString(1) == "/m/02_286")
    assert(out.getString(2) == "Charleston, South Carolina")
    assert(out.getString(3) == "Some Thing")   // last ':' wins
    assert(out.getString(4) == "plain text")
    assert(out.getString(5) == "a/b c")
    // invalid ids → null (the reference raises)
    val bad = Seq("x/02").toDF("id").select(fb_id_to_uri($"id")).head
    assert(bad.isNullAt(0))
  }

  test("word_overlap column predicate agrees with GreedyIsf.isOverlapping") {
    val cases = Seq(("the", "music man"), ("the man", "man"), ("a a", "b"), ("yx", "xz"))
    val got = cases.toDF("a", "b").select(word_overlap($"a", $"b")).as[Boolean].collect()
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == graft.operators.GreedyIsf.isOverlapping(Seq(a, b)), s"($a, $b)")
    }
  }
}
