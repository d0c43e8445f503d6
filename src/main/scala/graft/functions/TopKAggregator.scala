package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation over (score, id) rows — the scalable
  * replacement for the per-query `row_number().over(Window)` top-k: a
  * window shuffles EVERY scored row into one task per partition key (at
  * ANN scale, corpus × |queries| rows through single-task partitions — a
  * guaranteed straggler at 100× corpus), while this aggregator reduces to
  * at most k entries per partition map-side, so the shuffle carries
  * k·numPartitions entries per query instead of the whole scored corpus.
  *
  * Ordering matches the window it replaces: score DESC, then id ASC on
  * ties — results are byte-identical to the window plan.
  *
  * The buffer is a sorted Seq bounded at k (k is small — top-k search);
  * reduce does one binary-free linear insert, merge does a bounded merge.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // "better than"

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    if (b.size >= k && !lt(a, b.last)) return b
    val (before, after) = b.span(lt(_, a))
    (before :+ a) ++ after.take(k - before.size - 1)
  }

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var (i, j) = (0, 0)
    while (out.size < k && (i < x.size || j < y.size)) {
      if (j >= y.size || (i < x.size && lt(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKByScore {
  /** top_k_by_score(score, id) → array<struct<_1: score, _2: id>> sorted
    * (score desc, id asc), bounded at k, with map-side partial aggregation.
    */
  def topk(k: Int, score: Column, id: Column): Column =
    udaf(new TopKByScore(k)).apply(score, id)
}
