package graft

import graft.calib.{Fitting, Models, PhotonCalib}

/** K4-K8, K13-K15 calibration numerics. */
class FittingSpec extends SparkSpec {

  test("LM recovers single-gaussian parameters from clean samples") {
    val xs = (-50 to 50).map(_ * 0.2)
    val truth = Array(10.0, 1.5, 2.0) // a, mu, sigma
    val ys = xs.map(x => Models.gaussian(x, truth(0), truth(1), truth(2)))
    def resid(p: Array[Double]) =
      xs.zip(ys).map { case (x, y) =>
        Models.gaussian(x, p(0), p(1), p(2)) - y
      }.toArray
    val fit = Fitting.leastSquares(resid, Array(5.0, 0.0, 1.0))
    truth.zip(fit.params).foreach { case (t, p) =>
      assert(math.abs(t - p) < 1e-6, s"$t vs $p")
    }
    assert(fit.chi2 < 1e-10)
  }

  test("spectrum fit recovers comb spacing and width") {
    val p0 = Array(1000.0, 0.0, 5.0, 0.4, 1.2) // norm offset spacing sigma λ
    val centers = (0 until 200).map(i => -2.0 + i * 0.12).toArray
    val counts = centers.map(x =>
      Models.poissonComb(x, p0(0), p0(1), p0(2), p0(3), p0(4), 6))
    val fit = PhotonCalib.fitSpectrum(centers, counts,
      Array(800.0, 0.2, 4.5, 0.6, 1.0), 6)
    assert(math.abs(fit.params(2) - 5.0) < 1e-3) // spacing
    assert(math.abs(math.abs(fit.params(3)) - 0.4) < 1e-3) // width
    // K14: resolution = E_photon · width/spacing
    val (res, resErr) = PhotonCalib.energyResolution(fit, 3.06)
    assert(math.abs(res - 3.06 * 0.4 / 5.0) < 1e-3)
    assert(resErr >= 0)
  }

  test("two-pole template fit recovers time constants") {
    val fs = 1e5
    val n = 512
    val tpl = Models.twoPole(n, fs, 5e-4, 2e-4, 1e-3)
    val pulse = tpl.map(_ * 7.5)
    val fit = PhotonCalib.fitTwoPoleTemplate(pulse, fs,
      Array(5.0, 4e-4, 1e-4, 8e-4))
    assert(math.abs(fit.params(0) - 7.5) < 1e-2)
    assert(math.abs(math.abs(fit.params(3)) - 1e-3) < 5e-5)
  }

  test("dPdI deconvolution with unit response is identity") {
    val n = 64
    val tpl = Models.twoPole(n, 1e4, 1e-3, 3e-4, 2e-3)
    val dpdi = Array.tabulate(2 * (n / 2 + 1))(i => if (i % 2 == 0) 1.0 else 0.0)
    val out = PhotonCalib.deconvolveDpdi(tpl, dpdi)
    tpl.zip(out).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("error propagation: var of linear combo matches closed form") {
    import breeze.linalg.DenseMatrix
    val cov = DenseMatrix((0.04, 0.0), (0.0, 0.09))
    val v = Fitting.propagateError(p => 2 * p(0) + 3 * p(1),
      Array(1.0, 1.0), cov)
    assert(math.abs(v - (4 * 0.04 + 9 * 0.09)) < 1e-6)
  }

  test("correlation matrix has unit diagonal and bounded off-diagonals") {
    import breeze.linalg.DenseMatrix
    val cov = DenseMatrix((4.0, 1.2), (1.2, 9.0))
    val c = Fitting.correlationMatrix(cov)
    assert(math.abs(c(0, 0) - 1.0) < 1e-12)
    assert(math.abs(c(1, 1) - 1.0) < 1e-12)
    assert(math.abs(c(0, 1) - 1.2 / 6.0) < 1e-12)
  }

  test("template energy and collection efficiency (K13)") {
    val fs = 1000.0
    val tpl = Array.fill(100)(2.0)
    assert(math.abs(Models.templateEnergy(tpl, fs) - 0.2) < 1e-12)
    assert(math.abs(
      Models.collectionEfficiency(30.0, 5.0, 3.0) - 2.0) < 1e-12)
  }

  test("crosstalk template windows and subtracts") {
    val victim = Array(1.0, 1.0, 1.0, 1.0, 5.0, 9.0, 1.0, 1.0)
    val tpl = PhotonCalib.buildCrosstalkTemplate(victim, (4, 6))
    assert(tpl.toSeq == Seq(0.0, 0.0, 0.0, 0.0, 4.0, 8.0, 0.0, 0.0))
    val cleaned = PhotonCalib.subtractCrosstalk(victim, tpl, 1.0)
    assert(cleaned.toSeq == Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
  }
}
