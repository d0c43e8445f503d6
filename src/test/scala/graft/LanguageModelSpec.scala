package graft

import graft.functions._
import graft.operators.LanguageModel
import graft.operators.LanguageModel._
import org.apache.spark.sql.functions._

/** The generative scoring stack against hand-computed values
  * (reference semantics: scorer.py:65-236, query_sim_feat.py:89-147).
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // d1 = "a a b", d2 = "b c" (single field "f")
  private lazy val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
  private lazy val docTf = docTermFreqs(
    fieldedTokens(docs, "doc_id", Seq("f" -> tokens(col("text")))))

  test("docTermFreqs / docFieldLen / collection stats") {
    val tf = docTf.as[(Long, String, String, Long)].collect().toSet
    assert(tf == Set((1L, "f", "a", 2L), (1L, "f", "b", 1L),
      (2L, "f", "b", 1L), (2L, "f", "c", 1L)))
    val lens = docFieldLen(docTf).as[(Long, String, Long)].collect().toSet
    assert(lens == Set((1L, "f", 3L), (2L, "f", 2L)))
    val cf = collTermFreqs(docTf).as[(String, String, Long)].collect().toSet
    assert(cf == Set(("f", "a", 2L), ("f", "b", 2L), ("f", "c", 1L)))
    val cs = collFieldStats(docTf).as[(String, Long, Long, Double)].collect()
    assert(cs.toSeq == Seq(("f", 5L, 2L, 2.5)))
  }

  test("jm_prob and dirichlet_prob hand-computed (scorer.py:65-99)") {
    val rows = Seq((2L, 3L, 2L, 5L), (0L, 0L, 1L, 5L), (1L, 2L, 1L, 0L))
      .toDF("tf", "len_d", "cf", "coll_len")
    val jm = rows.select(jm_prob(col("tf"), col("len_d"), col("cf"),
      col("coll_len"), 0.1)).as[Double].collect()
    assert(math.abs(jm(0) - 0.64) < 1e-12)           // 0.9·(2/3)+0.1·(2/5)
    assert(math.abs(jm(1) - 0.02) < 1e-12)           // empty doc → collection only
    assert(math.abs(jm(2) - 0.45) < 1e-12)           // empty collection → doc only
    val dir = rows.select(dirichlet_prob(col("tf"), col("len_d"), col("cf"),
      col("coll_len"), lit(10.0))).as[Double].collect()
    assert(math.abs(dir(0) - 6.0 / 13.0) < 1e-12)    // (2+10·0.4)/(3+10)
    val dir0 = rows.limit(1).select(dirichlet_prob(col("tf"), col("len_d"),
      col("cf"), col("coll_len"), lit(0.0))).as[Double].head()
    assert(dir0 == 0.0)                              // μ=0 → 0 (empty field)
  }

  test("MLM term probs + LM doc score: qtf multiplicity, zero-skip, all-zero → null") {
    // query "a c a": qterms (a, qtf=2), (c, qtf=1), qlen=3; plus an
    // out-of-collection term variant
    val cands = Seq(("q1", 1L), ("q1", 2L)).toDF("qid", "entity")
    val qterms = Seq(("q1", "a", 2L, 3L), ("q1", "c", 1L, 3L))
      .toDF("qid", "term", "qtf", "qlen")
    val tp = mlmTermProbs(cands, qterms, docTf, Map("f" -> 1.0), 0.1)
    val p = tp.select($"entity", $"term", $"p").as[(Long, String, Double)]
      .collect().map { case (e, t, v) => (e, t) -> v }.toMap
    assert(math.abs(p((1L, "a")) - 0.64) < 1e-12)
    assert(math.abs(p((1L, "c")) - 0.02) < 1e-12)
    assert(math.abs(p((2L, "a")) - 0.04) < 1e-12)
    assert(math.abs(p((2L, "c")) - 0.47) < 1e-12)

    val scores = lmDocScore(tp).as[(String, Long, Double)].collect()
      .map { case (_, e, s) => e -> s }.toMap
    assert(math.abs(scores(1L) - (2 * math.log(0.64) + math.log(0.02))) < 1e-12)
    assert(math.abs(scores(2L) - (2 * math.log(0.04) + math.log(0.47))) < 1e-12)

    // zero-skip: term "z" absent from the collection contributes nothing
    val qz = Seq(("q1", "a", 2L, 3L), ("q1", "z", 1L, 3L))
      .toDF("qid", "term", "qtf", "qlen")
    val sz = lmDocScore(mlmTermProbs(cands, qz, docTf, Map("f" -> 1.0), 0.1))
      .where($"entity" === 1L).select("score").as[Double].head()
    assert(math.abs(sz - 2 * math.log(0.64)) < 1e-12)

    // all terms absent → None (reference returns None, we return NULL)
    val qnone = Seq(("q1", "z", 1L, 1L)).toDF("qid", "term", "qtf", "qlen")
    val none = lmDocScore(mlmTermProbs(cands, qnone, docTf, Map("f" -> 1.0), 0.1))
      .select("score").collect()
    assert(none.forall(_.isNullAt(0)))
  }

  test("MLM mixes fields by weight (scorer.py:203-221)") {
    val d2f = Seq((1L, "a b", "x"), (2L, "b", "a x"))
      .toDF("doc_id", "text", "name")
    val tf2 = docTermFreqs(fieldedTokens(d2f, "doc_id", Seq(
      "contents" -> tokens(col("text")), "names" -> tokens(col("name")))))
    val cands = Seq(("q", 1L)).toDF("qid", "entity")
    val qterms = Seq(("q", "a", 1L, 1L)).toDF("qid", "term", "qtf", "qlen")
    val p = mlmTermProbs(cands, qterms, tf2, Map("contents" -> 0.8, "names" -> 0.2), 0.1)
      .select("p").as[Double].head()
    // contents: len_d1=2, tf(a)=1, cf=1, coll_len=3 → 0.9·0.5 + 0.1·(1/3)
    // names:    len_d1=1, tf(a)=0, cf=1, coll_len=3 → 0.1·(1/3)
    val expected = 0.8 * (0.9 * 0.5 + 0.1 * (1.0 / 3)) + 0.2 * (0.1 * (1.0 / 3))
    assert(math.abs(p - expected) < 1e-12)
  }

  test("NLLR matches scalar computation; combine_commonness clamps (query_sim_feat.py, ranker_mlm.py)") {
    val cands = Seq(("q1", 1L)).toDF("qid", "entity")
    val qterms = Seq(("q1", "a", 2L, 3L), ("q1", "c", 1L, 3L))
      .toDF("qid", "term", "qtf", "qlen")
    val tp = mlmTermProbs(cands, qterms, docTf, Map("f" -> 1.0), 0.1)
    val nllr = nllrScore(tp).select("nllr").as[Double].head()
    val expected = math.exp(
      (2.0 / 3) * (math.log(0.64) - math.log(0.4)) +
        (1.0 / 3) * (math.log(0.02) - math.log(0.2)))
    assert(math.abs(nllr - expected) < 1e-12)

    val c = Seq((2.0, 0.5), (2.0, 0.0)).toDF("s", "cmn")
      .select(LanguageModel.combine_commonness(col("s"), col("cmn"))).as[Double].collect()
    assert(math.abs(c(0) - 1.0) < 1e-12)             // 2 · 0.5
    assert(math.abs(c(1) - 2.0 * 1e-5) < 1e-15)      // clamp at 1e-5
  }

  test("none_score_zero keeps null-scored candidates at 0 (ranker_mlm.py:60-62)") {
    val scored = Seq(("q1", 1L, Some(0.7)), ("q1", 2L, None))
      .toDF("qid", "entity", "score")
    val out = scored.select(col("entity"),
      LanguageModel.none_score_zero(col("score")).as("score"))
      .orderBy("entity").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 0.7), (2L, 0.0))) // kept, zeroed — not dropped
  }
}
