package graft.calib

/** Spectrum and pulse-shape models (SURVEY K4/K5) — pure functions used
  * inside driver-side fits. */
object Models {

  // ------------------------------------------------------------- spectra

  /** Single gaussian: A·exp(−(x−μ)²/2σ²) (`photon_calibration.py:143-170`). */
  def gaussian(x: Double, a: Double, mu: Double, sigma: Double): Double =
    a * math.exp(-(x - mu) * (x - mu) / (2 * sigma * sigma))

  /** N free gaussians: params = [a0, mu0, s0, a1, mu1, s1, …]
    * (`photon_calibration.py:172-238`). */
  def nGaussians(x: Double, params: Array[Double]): Double = {
    var out = 0.0
    var i = 0
    while (i + 2 < params.length) {
      out += gaussian(x, params(i), params(i + 1), params(i + 2))
      i += 3
    }
    out
  }

  /** Photon-peak comb: N equally spaced gaussians with Poisson-weighted
    * heights — params = (norm, offset, spacing, sigma, lambda)
    * (`photon_calibration.py:247-366`): peak k at offset + k·spacing with
    * height norm·P(k; lambda) = norm·λ^k e^{-λ}/k!. */
  def poissonComb(
      x: Double,
      norm: Double,
      offset: Double,
      spacing: Double,
      sigma: Double,
      lambda: Double,
      nPeaks: Int): Double = {
    var out = 0.0
    var fact = 1.0
    var k = 0
    while (k < nPeaks) {
      if (k > 0) fact *= k
      val w = math.exp(-lambda + k * math.log(lambda)) / fact
      out += gaussian(x, norm * w, offset + k * spacing, sigma)
      k += 1
    }
    out
  }

  // ----------------------------------------------------- pulse templates

  /** Two-pole analytic pulse: (1−e^{−t/τr})·e^{−t/τf}, normalized to
    * unit peak (`photon_calibration.py:1473-1523` via qetpy
    * `make_template_twopole`). t ≤ t0 → 0. */
  def twoPole(
      n: Int,
      fs: Double,
      t0: Double,
      tauRise: Double,
      tauFall: Double): Array[Double] = {
    val raw = Array.tabulate(n) { i =>
      val t = i / fs - t0
      if (t < 0) 0.0
      else (1.0 - math.exp(-t / tauRise)) * math.exp(-t / tauFall)
    }
    normalizePeak(raw)
  }

  /** Three-pole: (1−e^{−t/τr})·(A·e^{−t/τf1} + (1−A)·e^{−t/τf2})
    * (`photon_calibration.py:1525-1551`). */
  def threePole(
      n: Int,
      fs: Double,
      t0: Double,
      tauRise: Double,
      tauFall1: Double,
      tauFall2: Double,
      frac: Double): Array[Double] = {
    val raw = Array.tabulate(n) { i =>
      val t = i / fs - t0
      if (t < 0) 0.0
      else (1.0 - math.exp(-t / tauRise)) *
        (frac * math.exp(-t / tauFall1) + (1 - frac) * math.exp(-t / tauFall2))
    }
    normalizePeak(raw)
  }

  /** Four-pole: rise × three falls (`photon_calibration.py:1554-1642`
    * dispatch). weights must sum to 1. */
  def fourPole(
      n: Int,
      fs: Double,
      t0: Double,
      tauRise: Double,
      tauFalls: Array[Double],
      weights: Array[Double]): Array[Double] = {
    require(tauFalls.length == 3 && weights.length == 3)
    val raw = Array.tabulate(n) { i =>
      val t = i / fs - t0
      if (t < 0) 0.0
      else {
        var fall = 0.0
        var j = 0
        while (j < 3) { fall += weights(j) * math.exp(-t / tauFalls(j)); j += 1 }
        (1.0 - math.exp(-t / tauRise)) * fall
      }
    }
    normalizePeak(raw)
  }

  private def normalizePeak(x: Array[Double]): Array[Double] = {
    val peak = x.map(math.abs).max
    if (peak > 0) x.map(_ / peak) else x
  }

  /** K13: template energy Σ p(t)/fs (`photon_calibration.py:2063-2073`). */
  def templateEnergy(template: Array[Double], fs: Double): Double =
    template.sum / fs

  /** K13: phonon collection efficiency E/(n·E_photon)
    * (`photon_calibration.py:2118-2145`). */
  def collectionEfficiency(
      energyAbsorbed: Double,
      nPhotons: Double,
      photonEnergyEv: Double): Double =
    energyAbsorbed / (nPhotons * photonEnergyEv)
}
