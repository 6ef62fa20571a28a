package graft.calib

import breeze.linalg.{DenseMatrix, DenseVector, inv, pinv}

/** Nonlinear weighted least squares (SURVEY K6/K7) — driver-side Breeze
  * math over already-aggregated inputs (histograms, mean templates; a few
  * KB), mirroring `scipy.optimize.least_squares` usage in
  * `photon_calibration.py:516-581,1803-1919`.
  *
  * Levenberg-Marquardt with numeric Jacobian and box bounds (projection).
  * Returns best-fit params plus covariance ≈ (JᵀWJ)⁻¹ (K7,
  * `photon_calibration.py:653-672`).
  */
object Fitting {

  final case class FitResult(
      params: Array[Double],
      covariance: DenseMatrix[Double],
      chi2: Double,
      iterations: Int,
      converged: Boolean) {
    def paramErrors: Array[Double] =
      Array.tabulate(params.length)(i =>
        math.sqrt(math.max(covariance(i, i), 0.0)))
  }

  /** residuals(p) must return (model - data)/sigma; minimizes Σ r². */
  def leastSquares(
      residuals: Array[Double] => Array[Double],
      p0: Array[Double],
      lower: Option[Array[Double]] = None,
      upper: Option[Array[Double]] = None,
      maxIter: Int = 200,
      tol: Double = 1e-10): FitResult = {

    val nP = p0.length
    def clamp(p: Array[Double]): Array[Double] =
      Array.tabulate(nP) { i =>
        var v = p(i)
        lower.foreach(lo => v = math.max(v, lo(i)))
        upper.foreach(hi => v = math.min(v, hi(i)))
        v
      }

    def jacobian(p: Array[Double], r0: Array[Double]): DenseMatrix[Double] = {
      val j = DenseMatrix.zeros[Double](r0.length, nP)
      var c = 0
      while (c < nP) {
        val h = math.max(1e-8, math.abs(p(c)) * 1e-7)
        val pp = p.clone(); pp(c) += h
        val r1 = residuals(clamp(pp))
        var rIdx = 0
        while (rIdx < r0.length) {
          j(rIdx, c) = (r1(rIdx) - r0(rIdx)) / h
          rIdx += 1
        }
        c += 1
      }
      j
    }

    var p = clamp(p0.clone())
    var r = residuals(p)
    var chi2 = r.map(x => x * x).sum
    var lambda = 1e-3
    var iter = 0
    var converged = false
    var jMat: DenseMatrix[Double] = null

    while (iter < maxIter && !converged) {
      jMat = jacobian(p, r)
      val jtj = jMat.t * jMat
      val jtr = jMat.t * DenseVector(r)
      var improved = false
      var tries = 0
      while (!improved && tries < 12) {
        val damped = jtj.copy
        var d = 0
        while (d < nP) { damped(d, d) += lambda * jtj(d, d) + 1e-300; d += 1 }
        val step =
          try inv(damped) * jtr
          catch { case _: Throwable => pinv(damped) * jtr }
        val pNew = clamp(Array.tabulate(nP)(i => p(i) - step(i)))
        val rNew = residuals(pNew)
        val chi2New = rNew.map(x => x * x).sum
        if (chi2New < chi2) {
          if (chi2 - chi2New < tol * math.max(chi2, 1.0)) converged = true
          p = pNew; r = rNew; chi2 = chi2New
          lambda = math.max(lambda / 3.0, 1e-12)
          improved = true
        } else {
          lambda *= 10.0
          tries += 1
        }
      }
      if (!improved) converged = true // stuck in a minimum
      iter += 1
    }

    val jF = if (jMat != null) jMat else jacobian(p, r)
    val cov =
      try inv(jF.t * jF)
      catch { case _: Throwable => pinv(jF.t * jF) }
    FitResult(p, cov, chi2, iter, converged)
  }

  /** K7: first-order error propagation var(f) = g·C·gᵀ with numeric
    * gradient (`photon_calibration.py:2098-2110` `approx_fprime`). */
  def propagateError(
      f: Array[Double] => Double,
      p: Array[Double],
      cov: DenseMatrix[Double]): Double = {
    val n = p.length
    val g = DenseVector.tabulate(n) { i =>
      val h = math.max(1e-8, math.abs(p(i)) * 1e-7)
      val pp = p.clone(); pp(i) += h
      val pm = p.clone(); pm(i) -= h
      (f(pp) - f(pm)) / (2 * h)
    }
    val v = g.t * (cov * g)
    math.max(v, 0.0)
  }

  /** K15: correlation matrix from covariance
    * (`photon_calibration.py:2147-2188`). */
  def correlationMatrix(cov: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = cov.rows
    DenseMatrix.tabulate(n, n) { (i, j) =>
      val d = math.sqrt(cov(i, i) * cov(j, j))
      if (d > 0) cov(i, j) / d else 0.0
    }
  }
}
