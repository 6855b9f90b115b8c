package graft.ml

/** Minimal dense linear algebra used by the online learners. Plain arrays
  * and while-loops: these run inside `mapPartitions` on the hot path, so no
  * boxing, no Breeze (reference uses Breeze internally — see SURVEY §1.2 —
  * but nothing in the public contract requires it).
  */
object La {

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** y += alpha * x */
  def axpy(alpha: Double, x: Array[Double], y: Array[Double]): Unit = {
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { y(i) += alpha * x(i); i += 1 }
  }

  def scal(alpha: Double, x: Array[Double]): Unit = {
    var i = 0
    while (i < x.length) { x(i) *= alpha; i += 1 }
  }

  def norm2sq(x: Array[Double]): Double = dot(x, x)

  def sqdist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Solve A x = b for symmetric positive-definite A (row-major n*n),
    * Gaussian elimination with partial pivoting. A and b are copied.
    */
  def solve(aIn: Array[Double], bIn: Array[Double], n: Int): Array[Double] = {
    val a = aIn.clone(); val b = bIn.clone()
    var col = 0
    while (col < n) {
      var piv = col; var maxAbs = math.abs(a(col * n + col))
      var r = col + 1
      while (r < n) {
        val v = math.abs(a(r * n + col)); if (v > maxAbs) { maxAbs = v; piv = r }; r += 1
      }
      if (piv != col) {
        var j = 0
        while (j < n) {
          val t = a(col * n + j); a(col * n + j) = a(piv * n + j); a(piv * n + j) = t; j += 1
        }
        val t = b(col); b(col) = b(piv); b(piv) = t
      }
      val d = a(col * n + col)
      r = col + 1
      while (r < n) {
        val f = a(r * n + col) / d
        if (f != 0.0) {
          var j = col
          while (j < n) { a(r * n + j) -= f * a(col * n + j); j += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i); var j = i + 1
      while (j < n) { s -= a(i * n + j) * x(j); j += 1 }
      x(i) = s / a(i * n + i)
      i -= 1
    }
    x
  }

  /** Inverse of symmetric positive-definite A (row-major n*n) via
    * Gauss-Jordan; used once per protocol merge round, not per record.
    */
  def inverse(aIn: Array[Double], n: Int): Array[Double] = {
    val a = aIn.clone()
    val inv = new Array[Double](n * n)
    var i = 0
    while (i < n) { inv(i * n + i) = 1.0; i += 1 }
    var col = 0
    while (col < n) {
      var piv = col; var maxAbs = math.abs(a(col * n + col))
      var r = col + 1
      while (r < n) {
        val v = math.abs(a(r * n + col)); if (v > maxAbs) { maxAbs = v; piv = r }; r += 1
      }
      if (piv != col) {
        var j = 0
        while (j < n) {
          var t = a(col * n + j); a(col * n + j) = a(piv * n + j); a(piv * n + j) = t
          t = inv(col * n + j); inv(col * n + j) = inv(piv * n + j); inv(piv * n + j) = t
          j += 1
        }
      }
      val d = a(col * n + col)
      var j = 0
      while (j < n) { a(col * n + j) /= d; inv(col * n + j) /= d; j += 1 }
      r = 0
      while (r < n) {
        if (r != col) {
          val f = a(r * n + col)
          if (f != 0.0) {
            j = 0
            while (j < n) {
              a(r * n + j) -= f * a(col * n + j); inv(r * n + j) -= f * inv(col * n + j); j += 1
            }
          }
        }
        r += 1
      }
      col += 1
    }
    inv
  }

  /** Standard normal CDF via the Abramowitz–Stegun erf approximation
    * (public-domain formula 7.1.26); used by the Hoeffding tree's Gaussian
    * attribute observers.
    */
  def normCdf(x: Double, mean: Double, std: Double): Double = {
    if (std <= 0.0) return if (x >= mean) 1.0 else 0.0
    val z = (x - mean) / (std * math.sqrt(2.0))
    0.5 * (1.0 + erf(z))
  }

  private def erf(xIn: Double): Double = {
    val sign = if (xIn < 0) -1.0 else 1.0
    val x = math.abs(xIn)
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t -
      0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    sign * y
  }
}
