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
  * randomness), a fixed iteration count rather than a convergence test,
  * in-loop re-orthogonalization against every previously returned component
  * (so the basis is orthonormal by construction even on near-degenerate
  * spectra, where deflation alone leaves a residual), and sign
  * canonicalization (largest-|component| entry made positive), so the
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
      projectOut(v, vecs, m)
      normalize(v)
      var it = 0
      while (it < iters) {
        v = matVec(c, v)
        // Deflated (orthogonal) iteration: confine the iterate to the
        // orthogonal complement of every component already returned. A
        // near-degenerate spectrum (λ₁/λ₂ gap ≲ 2%) leaves v₁ slightly
        // unconverged after any fixed iteration count, so the λ₁v₁v₁ᵀ
        // deflation alone leaves a residual along the true axis that the
        // next pass re-amplifies past orthogonality tolerance; projecting
        // inside the loop makes orthogonality exact by construction.
        projectOut(v, vecs, m)
        if (!normalize(v)) {
          // iterate annihilated (start vector in the span of earlier
          // components, or a rank-deficient deflated matrix): restart from a
          // deterministic alternative direction in the complement
          v = Array.tabulate(d)(i => math.cos(1.0 + i + m))
          projectOut(v, vecs, m)
          normalize(v)
        }
        it += 1
      }
      projectOut(v, vecs, m) // belt-and-braces Gram-Schmidt before returning
      normalize(v)
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
    // On a (near-)degenerate dominant subspace the two Rayleigh quotients can
    // come out swapped by up to the eigen-gap; sort pairs so the descending
    // contract is exact (a permutation preserves orthonormality).
    val order = (0 until k).sortBy(i => -vals(i)).toArray
    (order.map(vals), order.map(vecs))
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

  /** Normalizes in place; returns false when the vector is numerically zero
    * (nothing to normalize), so callers can restart from a fresh direction. */
  private def normalize(v: Array[Double]): Boolean = {
    val n = math.sqrt(dot(v, v))
    if (n > 1e-12) { var i = 0; while (i < v.length) { v(i) /= n; i += 1 }; true }
    else false
  }

  /** Subtracts from v its projection onto each of vecs(0 until m), in place. */
  private def projectOut(v: Array[Double], vecs: Array[Array[Double]], m: Int): Unit = {
    var p = 0
    while (p < m) {
      val w = vecs(p)
      val proj = dot(v, w)
      var i = 0
      while (i < v.length) { v(i) -= proj * w(i); i += 1 }
      p += 1
    }
  }
}
