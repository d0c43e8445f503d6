package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded distinct-collect for pair generation (long ids).
  *
  * Replaces the two-pass hot-key protocol of `Blocking.pairsFromBlocks`
  * (count aggregate over the whole block table → broadcast anti-join →
  * unbounded `collect_set`) with ONE aggregation: the buffer keeps at most
  * `cap + 1` distinct members — a block that reaches `cap + 1` is already
  * known oversize (the downstream filter drops it), so no state ever holds
  * more than `cap + 1` longs even for a 100-TB hot key with millions of
  * members (stopword shingles / dense LSH bands). Saves a full pass over
  * the block table plus a broadcast barrier per run, and makes the
  * aggregation state provably bounded — the property the old count-first
  * pass existed to guarantee.
  *
  * The buffer is a sorted distinct Vector: reduce = binary-search insert
  * (saturates at cap + 1, then short-circuits), merge = bounded sorted
  * merge. Output order is ascending — callers that enumerate pairs sort
  * members anyway (canonical conv_a < conv_b).
  */
class BoundedCollectSet(capPlusOne: Int)
    extends Aggregator[Long, Vector[Long], Seq[Long]] {

  override def zero: Vector[Long] = Vector.empty

  override def reduce(b: Vector[Long], a: Long): Vector[Long] = {
    if (b.length >= capPlusOne) return b // saturated: block already oversize
    val i = binSearch(b, a)
    if (i >= 0) b else b.patch(-i - 1, Vector(a), 0)
  }

  override def merge(x: Vector[Long], y: Vector[Long]): Vector[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = Vector.newBuilder[Long]
    var n = 0
    var (i, j) = (0, 0)
    while (n < capPlusOne && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length) { val v = x(i); i += 1; v }
        else if (i >= x.length) { val v = y(j); j += 1; v }
        else if (x(i) < y(j)) { val v = x(i); i += 1; v }
        else if (x(i) > y(j)) { val v = y(j); j += 1; v }
        else { val v = x(i); i += 1; j += 1; v }
      out += v
      n += 1
    }
    out.result()
  }

  override def finish(r: Vector[Long]): Seq[Long] = r

  private def binSearch(b: Vector[Long], a: Long): Int = {
    var lo = 0
    var hi = b.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = b(mid)
      if (v == a) return mid
      else if (v < a) lo = mid + 1
      else hi = mid - 1
    }
    -(lo + 1)
  }

  override def bufferEncoder: Encoder[Vector[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BoundedCollectSet {
  /** bounded_collect_set(id) → array<bigint> of ≤ capPlusOne distinct ids,
    * ascending; exactly capPlusOne entries ⇒ the group exceeded the cap.
    */
  def bounded(capPlusOne: Int, id: Column): Column =
    udaf(new BoundedCollectSet(capPlusOne)).apply(id)
}
