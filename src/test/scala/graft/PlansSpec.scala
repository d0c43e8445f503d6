package graft

import graft.plans.{GraftExtensions, Skew}
import graft.functions._
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join preserves the plain-join result exactly") {
    val fact = (1 to 500).map(i => (s"k${i % 3}", i)).toDF("key", "v")
    val dim = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k9", "z")).toDF("key", "tag")
    val plain = fact.join(dim, Seq("key")).orderBy("v").collect()
    val salted = Skew.saltedEquiJoin(fact, dim, "key", 8).orderBy("v").collect()
    assert(plain.length == salted.length)
    assert(plain.map(_.toString).sorted.sameElements(salted.map(_.toString).sorted))
  }

  test("salt-split re-keys hot blocks into bounded sub-blocks and reports them") {
    val blocks = ((1 to 200).map(i => ("hot", s"c$i")) ++
      (1 to 5).map(i => ("cold", s"c$i"))).toDF("block_key", "conv_id")
    val (rekeyed, report) = Skew.saltSplitBlocks(
      blocks.select(xxhash64($"block_key").as("block_key"), $"conv_id"), 50)
    val rep = report.collect()
    assert(rep.length == 1 && rep(0).getAs[Long]("block_size") == 200)
    val sizes = rekeyed.groupBy("block_key").count().as[(Long, Long)].collect()
    assert(sizes.map(_._2).max <= 60) // ≈ cap (hash split is approximate)
    assert(rekeyed.count() == 205)    // no rows lost
  }

  test("jaro_winkler is callable from SQL after install") {
    GraftExtensions.install(spark)
    val v = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw").as[Double].head()
    assert(math.abs(v - SimilarityKernels.jaroWinkler("martha", "marhta")) < 1e-12)
  }

  test("length-prune rule strengthens jw >= tau filters and preserves results") {
    GraftExtensions.install(spark)
    // file-backed relation so the filter survives into the optimized plan
    // (local Seqs get constant-folded away, predicate and all)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", norm_text($"text").as("a"),
        concat(norm_text($"text"), lit("x")).as("b"))
    val q = df.where(jaro_winkler($"a", $"b") >= 0.9)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least(length"), optimized)
    // the rule must not change results: every row here has jw ≈ 1 > 0.9
    val expected = df.collect().count(r =>
      SimilarityKernels.jaroWinkler(r.getString(1), r.getString(2)) >= 0.9)
    assert(q.count() == expected)
    // idempotence: exactly one bound injected despite the fixed-point batch
    assert("least\\(length".r.findAllIn(optimized).size == 1, optimized)
  }

  test("length bound is conservative (never drops a qualifying pair)") {
    val rnd = new scala.util.Random(3)
    def s() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (0 until 2000).foreach { _ =>
      val (a, b) = (s(), s())
      val jw = SimilarityKernels.jaroWinkler(a, b)
      val (mn, mx) = (math.min(a.length, b.length), math.max(a.length, b.length))
      Seq(0.85, 0.9, 0.95).foreach { tau =>
        if (jw >= tau) assert(mn.toDouble >= mx * (5 * tau - 4) - 1e-9,
          s"bound violated: '$a' '$b' jw=$jw tau=$tau")
      }
    }
  }
}
