package graft.calib

import graft.traces.Dsp

/** Photon-calibration pipeline pieces beyond the raw models: spectrum
  * fitting, energy resolution, dPdI deconvolution, crosstalk handling
  * (SURVEY K5-K9, K13-K15). All operate on already-aggregated data
  * (histograms, mean pulses) on the driver — the cluster reduces, the
  * driver fits. */
object PhotonCalib {

  /** S9: load a per-channel dPdI half-spectrum from a small "filter file"
    * table `(channel, dpdi_re: array<double>, dpdi_im: array<double>)` —
    * the `_extract_dPdI` path (`photon_calibration.py:1301-1326`).
    * Driver-side read of a KB-scale artifact; returns interleaved
    * [re, im, …] for [[deconvolveDpdi]]. */
  def loadDpdi(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      channel: String): Array[Double] = {
    import org.apache.spark.sql.functions.col
    val row = spark.read.parquet(path)
      .filter(col("channel") === channel)
      .select("dpdi_re", "dpdi_im")
      .head()
    val re = row.getSeq[Double](0)
    val im = row.getSeq[Double](1)
    Array.tabulate(2 * re.length)(i => if (i % 2 == 0) re(i / 2) else im(i / 2))
  }

  /** Fit an N-peak Poisson comb to a (binCenters, counts) histogram with
    * 1/√counts weights (`fit_spectrum`, `photon_calibration.py:516-581`;
    * empty bins get weight 1). Params: (norm, offset, spacing, sigma,
    * lambda). */
  def fitSpectrum(
      centers: Array[Double],
      counts: Array[Double],
      p0: Array[Double],
      nPeaks: Int): Fitting.FitResult = {
    require(p0.length == 5, "(norm, offset, spacing, sigma, lambda)")
    val sigma = counts.map(c => if (c > 0) math.sqrt(c) else 1.0)
    def residuals(p: Array[Double]): Array[Double] =
      Array.tabulate(centers.length) { i =>
        (Models.poissonComb(centers(i), p(0), p(1), p(2),
          math.abs(p(3)), math.abs(p(4)), nPeaks) - counts(i)) / sigma(i)
      }
    Fitting.leastSquares(residuals, p0,
      lower = Some(Array(0.0, Double.MinValue, 1e-12, 1e-12, 1e-12)))
  }

  /** K14: energy resolution from a comb fit: σ_E = E_photon · width /
    * spacing, with 1σ from the fit covariance
    * (`get_spectrum_energy_res`, `photon_calibration.py:614-689`). */
  def energyResolution(
      fit: Fitting.FitResult,
      photonEnergyEv: Double): (Double, Double) = {
    def f(p: Array[Double]): Double =
      photonEnergyEv * math.abs(p(3)) / math.abs(p(2))
    val v = Fitting.propagateError(f, fit.params, fit.covariance)
    (f(fit.params), math.sqrt(v))
  }

  /** Fit a 2-pole template to a mean pulse in the time domain with
    * uniform weights (`fit_template`, `photon_calibration.py:1803-1919`
    * simplified to the time-domain branch). Params: (amp, t0, tauRise,
    * tauFall). */
  def fitTwoPoleTemplate(
      meanPulse: Array[Double],
      fs: Double,
      p0: Array[Double],
      tol: Double = 1e-10): Fitting.FitResult = {
    require(p0.length == 4, "(amp, t0, tauRise, tauFall)")
    def residuals(p: Array[Double]): Array[Double] = {
      val tpl = Models.twoPole(meanPulse.length, fs, p(1),
        math.abs(p(2)), math.abs(p(3)))
      Array.tabulate(meanPulse.length)(i => p(0) * tpl(i) - meanPulse(i))
    }
    Fitting.leastSquares(residuals, p0,
      lower = Some(Array(Double.MinValue, 0.0, 1e-9, 1e-9)), tol = tol)
  }

  /** K8: dPdI deconvolution — power-domain template from a current-domain
    * one: temp_i(f) = temp_p(f) / dpdi(f), back to time domain
    * (`photon_calibration.py:1395-1408,1728-1750`). dpdi as interleaved
    * complex [re,im] per rfft bin. */
  def deconvolveDpdi(
      templateP: Array[Double],
      dpdi: Array[Double]): Array[Double] = {
    val n = templateP.length
    val (re, im) = Dsp.rfft(templateP)
    val m = re.length
    require(dpdi.length >= 2 * m, "dpdi must cover the half spectrum")
    val or = Array.ofDim[Double](m)
    val oi = Array.ofDim[Double](m)
    var k = 0
    while (k < m) {
      val dr = dpdi(2 * k); val di = dpdi(2 * k + 1)
      val d2 = dr * dr + di * di
      if (d2 > 0) {
        or(k) = (re(k) * dr + im(k) * di) / d2
        oi(k) = (im(k) * dr - re(k) * di) / d2
      }
      k += 1
    }
    Dsp.irfft(or, oi, n)
  }

  /** K9: crosstalk template — baseline-relative mean in a window around
    * the trigger, then subtract a scaled copy from each trace
    * (`photon_calibration.py:1044-1140,1192-1226`). */
  def buildCrosstalkTemplate(
      meanVictim: Array[Double],
      window: (Int, Int)): Array[Double] = {
    val (w0, w1) = window
    val base = meanVictim.slice(0, w0)
    val b = if (base.nonEmpty) base.sum / base.length else 0.0
    Array.tabulate(meanVictim.length) { i =>
      if (i >= w0 && i < w1) meanVictim(i) - b else 0.0
    }
  }

  def subtractCrosstalk(
      trace: Array[Double],
      template: Array[Double],
      scale: Double): Array[Double] =
    Array.tabulate(trace.length)(i => trace(i) - scale * template(i))
}
