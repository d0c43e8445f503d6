package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop vector kernels for the embedding operators (ANN, cosine
  * near-dup). These replace zip_with/aggregate HOF compositions — HOFs are
  * interpreted (boxed lambda per element); at corpus×query scale the dot
  * products are the hot loop and must stay primitive.
  */
object VectorKernels {

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Cosine similarity in double precision; 0.0 on zero norms or length
    * mismatch (defensive — mismatched dims indicate corrupt input, and the
    * HOF reference implementation's zip_with also truncates to the shorter).
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aFloat)
      val y = get(b, i, bFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** 1-based index of the centroid with the largest dot product against
    * `vec`; ties resolve to the smallest index. Centroids are expected
    * L2-normalized (then dot-argmax == cosine-argmax for any |vec| > 0).
    */
  def nearestCentroid(vec: ArrayData, cents: Array[Array[Double]],
                      isFloat: Boolean): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(vec.numElements(), c.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += get(vec, i, isFloat) * c(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = j }
      j += 1
    }
    best + 1
  }
}
