package graft.etl

/** Deterministic top-k eigenpairs of a small symmetric matrix (the embedding
  * covariance) via power iteration with deflation — bounded DRIVER-side
  * metadata math, the same class as the IVF centroid / PQ codebook training
  * in [[AnnIndex]] (FAISS makes the identical split: data-scaled passes stay
  * distributed, d×d model math runs locally). d is the embedding dimension
  * (64 here), never data-scaled: one iteration is O(d²), the whole solve is
  * microseconds.
  *
  * Determinism contract (DeterminismSpec class of guarantees): no RNG — a
  * fixed perturbed-uniform start vector (the perturbation breaks the
  * "start exactly orthogonal to the principal axis" pathology without
  * randomness), a fixed iteration count rather than a convergence test, and
  * sign canonicalization (largest-|component| entry made positive), so the
  * returned basis is bit-stable across runs, JVMs, and partitionings of the
  * upstream covariance pass. */
object Pca {

  def topComponents(cov: Array[Array[Double]], k: Int, iters: Int = 300)
      : (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val c = cov.map(_.clone())
    val vals = new Array[Double](k)
    val vecs = Array.ofDim[Double](k, d)
    var m = 0
    while (m < k) {
      var v = Array.tabulate(d)(i => 1.0 + i * 1e-3)
      normalize(v)
      var it = 0
      while (it < iters) { v = matVec(c, v); normalize(v); it += 1 }
      val lam = dot(v, matVec(c, v))
      var bi = 0
      var i = 1
      while (i < d) { if (math.abs(v(i)) > math.abs(v(bi))) bi = i; i += 1 }
      if (v(bi) < 0) { var j = 0; while (j < d) { v(j) = -v(j); j += 1 } }
      vals(m) = lam
      vecs(m) = v
      // deflate: C ← C − λ v vᵀ, so the next pass converges to the runner-up
      var a = 0
      while (a < d) {
        var b = 0
        while (b < d) { c(a)(b) -= lam * v(a) * v(b); b += 1 }
        a += 1
      }
      m += 1
    }
    (vals, vecs)
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = v.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += m(i)(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def normalize(v: Array[Double]): Unit = {
    val n = math.sqrt(dot(v, v))
    if (n > 0) { var i = 0; while (i < v.length) { v(i) /= n; i += 1 } }
  }
}
