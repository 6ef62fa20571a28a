package graft

import org.apache.spark.sql.functions._
import graft.calib.{Models, PhotonCalib}
import graft.core.{Cut, EventTable}
import graft.stats.{Hist, VectorStats}
import graft.traces.TraceStore

/** End-to-end photon-calibration flow (the reference's
  * `photon_calib_demo.ipynb` distilled): events with a Poisson-comb
  * amplitude RQ + a traces table of 2-pole pulses scaled by that RQ →
  * peak cut → trace fetch (J2) → mean pulse (A13) → template fit (K6)
  * recovers the generator's time constants → spectrum fit (K5/K6) on the
  * amplitude histogram recovers peak spacing → energy resolution (K14).
  */
class CalibrationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val fs = 1e5
  private val nSamp = 256
  private val tauRise = 3e-4
  private val tauFall = 1.2e-3
  private val t0 = 5e-4
  private val spacing = 2.0
  private val sigma = 0.08

  // deterministic "random" in [0,1)
  private def u(i: Int, salt: Int): Double = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + salt * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z >>> 11).toDouble / (1L << 53).toDouble)
  }
  // Box-Muller gaussian
  private def gauss(i: Int, salt: Int): Double =
    math.sqrt(-2 * math.log(u(i, salt) + 1e-12)) *
      math.cos(2 * math.Pi * u(i, salt + 7))

  private lazy val template = Models.twoPole(nSamp, fs, t0, tauRise, tauFall)

  /** events: amp drawn near peak k ∈ {1,2,3} at k·spacing with width
    * sigma; traces: amp-scaled template + small noise. */
  private lazy val (events, traces) = {
    val evs = (0 until 600).map { i =>
      val k = 1 + i % 3
      val amp = k * spacing + sigma * gauss(i, 1)
      (1L, i.toLong, 0L, amp)
    }
    val evDf = evs.toDF("series_number", "event_number", "dump_number",
      "amp_of1x1_nodelay_ch1")
    val trDf = evs.map { case (s, e, d, amp) =>
      val tr = template.zipWithIndex.map { case (v, j) =>
        amp * v + 0.01 * gauss(e.toInt * nSamp + j, 2)
      }
      (s, e, d, "ch1", tr.toSeq, fs, (t0 * fs).toInt)
    }.toDF("series_number", "event_number", "dump_number", "channel",
      "trace", "sample_rate", "pretrigger_samples")
    (evDf, trDf)
  }

  test("cut → fetch → mean pulse → template fit recovers time constants") {
    // select the k=2 peak (amp ≈ 4): T1 value cut around it
    val table = EventTable(events)
      .registerCut("cut_peak2",
        Cut.Pred(col("amp_of1x1_nodelay_ch1").between(
          2 * spacing - 3 * sigma, 2 * spacing + 3 * sigma)))
    val keys = table.filter(Cut.Named("cut_peak2"))
      .select("series_number", "event_number")
    val fetched = TraceStore.fetch(traces, keys, channels = Seq("ch1"),
      nbEventsLimit = 1000)
    val nFetched = fetched.count()
    assert(nFetched > 100 && nFetched < 300) // ~1/3 of 600, peak-selected

    // A13 mean pulse via the vector-mean aggregator
    val meanPulse = fetched.select(col("trace").as("value"))
      .as[Seq[Double]]
      .select(udaf(new VectorStats.VectorMean(nSamp)).apply(col("value"))
        .as("mp"))
      .as[Array[Double]].head()

    // K6 template fit on the ensemble mean recovers amp and tauFall
    val fit = PhotonCalib.fitTwoPoleTemplate(meanPulse, fs,
      Array(3.0, 4e-4, 2e-4, 1e-3))
    assert(fit.converged)
    assert(math.abs(fit.params(0) - 2 * spacing) < 0.1) // mean peak amp ≈ 4
    assert(math.abs(math.abs(fit.params(3)) - tauFall) / tauFall < 0.05)
    assert(math.abs(math.abs(fit.params(2)) - tauRise) / tauRise < 0.15)
  }

  test("amp histogram → comb fit recovers spacing; K14 resolution ≈ sigma") {
    val hist = Hist.hist1d(events, col("amp_of1x1_nodelay_ch1"),
      120, 0.0, 8.0).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centers = Array.tabulate(120)(b => (b + 0.5) * 8.0 / 120)
    val counts = Array.tabulate(120)(b => hist.getOrElse(b.toLong, 0L).toDouble)
    val fit = PhotonCalib.fitSpectrum(centers, counts,
      Array(counts.max * 2, 0.1, 1.8, 0.1, 2.0), nPeaks = 4)
    assert(math.abs(fit.params(2) - spacing) < 0.05)
    assert(math.abs(math.abs(fit.params(3)) - sigma) < 0.02)
    val photonEv = 3.06
    val (res, resErr) = PhotonCalib.energyResolution(fit, photonEv)
    assert(math.abs(res - photonEv * sigma / spacing) < 0.02)
    assert(resErr > 0 && resErr < res)
  }
}
