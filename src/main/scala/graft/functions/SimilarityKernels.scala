package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Scalar similarity kernels invoked from codegen'd Catalyst expressions.
  *
  * Spark-native re-expression of the reference's pairwise scoring stage
  * (reference: nordlys/retrieval/scorer.py:197-269 — mixture-of-field LM
  * scoring of (mention, entity) candidates). The graft scores candidate
  * *pairs* with batched string-similarity kernels instead; Jaro-Winkler is
  * the one kernel Spark lacks as a built-in (levenshtein exists).
  *
  * The Jaro-Winkler definition matches the standard Winkler variant
  * (prefix scale p=0.1, max prefix 4, boost only when jaro > 0.7), which is
  * also what DuckDB's `jaro_winkler_similarity` (rapidfuzz) computes — that
  * equivalence is what the oracle harness checks.
  */
object SimilarityKernels {

  /** Jaro similarity in [0,1] over unicode *code points* — the same unit
    * Catalyst's `Length` counts, so [[graft.plans.JaroWinklerLengthPrune]]'s
    * injected length-ratio bound is semantics-preserving on
    * supplementary-plane text (UTF-16 `charAt` iteration was not: a pair
    * with jw ≥ τ could fail the bound and be wrongly filtered).
    */
  def jaro(s1: String, s2: String): Double = {
    val a = s1.codePoints().toArray
    val b = s2.codePoints().toArray
    jaroCp(a, b)
  }

  private def jaroCp(a: Array[Int], b: Array[Int]): Double = {
    val len1 = a.length
    val len2 = b.length
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    val matchDist = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(len2 - 1, i + matchDist)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && a(i) == b(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = m.toDouble
    (mm / len1 + mm / len2 + (mm - t / 2) / mm) / 3.0
  }

  /** Jaro-Winkler: jaro boosted by shared prefix (≤4) when jaro > 0.7. */
  def jaroWinkler(s1: String, s2: String): Double = {
    val a = s1.codePoints().toArray
    val b = s2.codePoints().toArray
    val j = jaroCp(a, b)
    if (j > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(a.length, b.length))
      while (l < maxL && a(l) == b(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  /** Entry point used by generated code (UTF8String in the codegen path). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)

  /** 64-bit SimHash over token hashes: bit b of the result is 1 iff the
    * sum over tokens of (+1 / -1 for bit b of the token's hash) is > 0.
    * Token hash = xxHash64-compatible via Spark's hash of the UTF8 bytes is
    * not needed here — any stable 64-bit mix works; we use the same mix in
    * tests. Used by [[graft.operators.Dedup.simhash]].
    */
  def simhash64(tokenHashes: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
