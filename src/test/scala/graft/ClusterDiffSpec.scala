package graft

import graft.operators.ClusterDiff

/** Hand-computed fixture:
  *   old: c1 = {1,2,3}, c2 = {4,5}, c3 = {6}
  *   new: d1 = {1,2},   d2 = {3},   d3 = {4,5}, d4 = {7}
  *
  * Common ids {1..5}; 6 only-old, 7 only-new. Overlap cells:
  * (c1,d1,2), (c1,d2,1), (c2,d3,2). c2→d3 is the one stable cluster;
  * c1 split over two; no merges. Pairs: old 3+1 = 4, new 1+0+1 = 2,
  * both 1+0+1 = 2 → precision 1.0, recall 0.5, F1 = 2/3.
  */
class ClusterDiffSpec extends SparkSpec {
  import spark.implicits._

  test("summarize matches the hand computation") {
    val o = Seq((1L, "c1"), (2L, "c1"), (3L, "c1"), (4L, "c2"), (5L, "c2"),
      (6L, "c3")).toDF("conv_id", "cluster_id")
    val n = Seq((1L, "d1"), (2L, "d1"), (3L, "d2"), (4L, "d3"), (5L, "d3"),
      (7L, "d4")).toDF("conv_id", "cluster_id")
    val r = ClusterDiff.summarize(o, n).head()
    assert(r.getLong(0) == 5L)   // n_ids
    assert(r.getLong(1) == 1L)   // ids_only_old
    assert(r.getLong(2) == 1L)   // ids_only_new
    assert(r.getLong(3) == 2L)   // n_clusters_old (common universe)
    assert(r.getLong(4) == 3L)   // n_clusters_new
    assert(r.getLong(5) == 1L)   // n_stable
    assert(r.getLong(6) == 1L)   // n_split
    assert(r.getLong(7) == 0L)   // n_merged
    assert(r.getLong(8) == 4L)   // pairs_old
    assert(r.getLong(9) == 2L)   // pairs_new
    assert(r.getLong(10) == 2L)  // pairs_both
    assert(r.getDouble(11) == 1.0)
    assert(r.getDouble(12) == 0.5)
    assert(r.getDouble(13) == 0.666667)
  }

  test("identical assignments read as all-stable, F1 = 1") {
    val a = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("conv_id", "cluster_id")
    val r = ClusterDiff.summarize(a, a).head()
    assert(r.getLong(5) == 2L && r.getLong(6) == 0L && r.getLong(7) == 0L)
    assert(r.getDouble(13) == 1.0)
  }

  test("all-singletons vs one-cluster: zero precision pairs, full merge") {
    val o = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("conv_id", "cluster_id")
    val n = Seq((1L, "z"), (2L, "z"), (3L, "z")).toDF("conv_id", "cluster_id")
    val r = ClusterDiff.summarize(o, n).head()
    assert(r.getLong(8) == 0L && r.getLong(9) == 3L && r.getLong(10) == 0L)
    assert(r.getLong(7) == 1L)      // the one new cluster merges 3 old
    assert(r.getDouble(11) == 0.0)  // precision 0/3
    assert(r.getDouble(13) == 0.0)  // f1 guarded at p+r = 0 edge
  }

  test("quantifies incremental-pipeline churn: recompute parity diffs as identity") {
    // the maintenance-monitor use: diffing a pipeline run against itself
    // must read as exact identity (the incremental specs assert parity;
    // this is the operator-level view of the same statement)
    val docs = pipeline.TranscriptGen.transcripts(spark, nBase = 30, dupsPerBase = 2)
    val clusters = pipeline.Pipeline.run(docs).clusters
    val r = ClusterDiff.summarize(clusters, clusters).head()
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getLong(5) == r.getLong(3) && r.getLong(3) == r.getLong(4))
    assert(r.getDouble(13) == (if (r.getLong(8) > 0) 1.0 else 0.0))
  }
}
