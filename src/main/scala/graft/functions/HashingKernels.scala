package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Tight-loop hashing kernels called from the codegen'd expressions in
  * [[HashingExprs]]. These replace interpreted higher-order-function
  * compositions (transform/aggregate over sequence) on the blocking hot
  * path: the HOF tree allocates boxed rows per lambda call and does a full
  * 8-byte-string hash per (shingle × hash-function) pair; these kernels
  * hash each shingle once and derive the `numHashes` MinHash slots by
  * long-remixing (XXH64.hashLong) — measured 2 orders of magnitude less
  * CPU at 10^4 docs, and allocation-free except the output array (which is
  * what lets the stage scale across executor threads instead of
  * serializing on GC).
  */
object HashingKernels {

  private val ShingleSeed = 42L

  /** MinHash signature over k-token shingles, folded straight into `bands`
    * LSH band keys. Semantics mirror
    * `band_keys(minhash_signature(word_shingles(tokens, k), H), B, H/B)`
    * modulo the hash family (different constants, same S-curve).
    */
  def minhashBandKeys(toks: ArrayData, k: Int, numHashes: Int, bands: Int): ArrayData = {
    val n = toks.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val nSh = if (n <= k) 1 else n - k + 1 // short docs: one whole-doc shingle
    var i = 0
    while (i < nSh) {
      var h = ShingleSeed
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        val t = toks.getUTF8String(j)
        h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, h)
        j += 1
      }
      var s = 0
      while (s < numHashes) {
        val g = XXH64.hashLong(h, s)
        if (g < mins(s)) mins(s) = g
        s += 1
      }
      i += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashLong(b, 777L)
      var s = b * r
      val end = (b + 1) * r
      while (s < end) { h = XXH64.hashLong(mins(s), h); s += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over token hashes (one XXH64 per token, bit votes). */
  def simhash64(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
