package graft

import graft.vibration.{Estimators, MomentAggregator, Moments}

/** A16 moment aggregator: serial-reference equivalence, merge
  * associativity under arbitrary partition splits (SURVEY §7.3 item 1),
  * estimator sanity. */
class MomentsSpec extends SparkSpec {

  private val nCh = 2
  private val nFreq = 4

  private def mkEvent(seed: Int): Seq[Seq[Double]] =
    (0 until nCh).map { c =>
      (0 until 2 * nFreq).map { i =>
        math.sin(seed * 0.7 + c * 1.3 + i * 0.41) // deterministic
      }
    }

  /** Serial single-threaded reference accumulation
    * (mirrors `vibration_analyzer.py:326-372`). */
  private def serialMoments(events: Seq[Seq[Seq[Double]]]): Moments = {
    val agg = new MomentAggregator(nCh, nFreq)
    agg.finish(events.foldLeft(agg.zero)(agg.reduce))
  }

  test("aggregator over Dataset equals serial reference") {
    import spark.implicits._
    val events = (0 until 100).map(mkEvent)
    val serial = serialMoments(events)
    val agg = new MomentAggregator(nCh, nFreq)
    val dist = spark.createDataset(events)
      .repartition(7) // force multi-partition partial aggregation
      .select(org.apache.spark.sql.functions.udaf(agg).apply(
        org.apache.spark.sql.functions.col("value")).as("mo"))
      .select("mo.*").as[Moments].head()
    assert(dist.n == serial.n)
    serial.s.zip(dist.s).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
    serial.r.zip(dist.r).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
    serial.m.zip(dist.m).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }

  test("merge is associative/commutative under every split and order") {
    val agg = new MomentAggregator(nCh, nFreq)
    val events = (0 until 60).map(mkEvent)
    val serial = serialMoments(events)
    for (split <- 1 until 60; order <- 0 to 1) {
      val (l, r) = events.splitAt(split)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      val merged =
        if (order == 0) agg.merge(bl, br) else agg.merge(br, bl)
      val out = agg.finish(merged)
      serial.s.zip(out.s).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9)
      }
    }
  }

  test("PSD estimator: S_ii of a constant-amplitude phasor = |a|²") {
    // every event: channel 0 has a = 3+4i at every bin → S_00 = 25
    val events = (0 until 20).map { _ =>
      Seq(
        (0 until nFreq).flatMap(_ => Seq(3.0, 4.0)),
        (0 until nFreq).flatMap(_ => Seq(1.0, 0.0)))
    }
    val mo = serialMoments(events)
    val p = Estimators.psd(mo, 0)
    p.foreach(v => assert(math.abs(v - 25.0) < 1e-9))
    // zero variance for a constant ensemble
    Estimators.psdVariance(mo, 0).foreach(v => assert(math.abs(v) < 1e-9))
    // rms-ratio TF channel0/channel1 = sqrt(25/1) = 5
    val (h, err) = Estimators.tfRmsRatio(mo, 0, 1)
    h.foreach(v => assert(math.abs(v - 5.0) < 1e-9))
    err.foreach(v => assert(math.abs(v) < 1e-6))
    // phase-locked: ⟨a0⟩/⟨a1⟩ = 3+4i → magnitude 5, phase atan2(4,3)
    val (mag, ph, _) = Estimators.tfPhaseLocked(mo, 0, 1)
    mag.foreach(v => assert(math.abs(v - 5.0) < 1e-9))
    ph.foreach(v => assert(math.abs(v - math.atan2(4, 3)) < 1e-9))
    // cross (H1): S_01/S_11 = (3+4i)(1-0i)/1 → magnitude 5
    val (m1, _, _) = Estimators.tfCross(mo, 0, 1)
    m1.foreach(v => assert(math.abs(v - 5.0) < 1e-9))
  }

  test("injected transfer function recovered by all three estimators") {
    // drive-locked sweep: in = 1 + noise, out = H·in + noise, H = 2·e^{iπ/6}
    val hMag = 2.0
    val hPh = math.Pi / 6
    val hRe = hMag * math.cos(hPh)
    val hIm = hMag * math.sin(hPh)
    def n(i: Int, s: Int): Double = 0.02 * math.sin(i * 1.7 + s * 0.9)
    val events = (0 until 400).map { i =>
      val ir = 1.0 + n(i, 1); val ii = n(i, 2)
      val or = hRe * ir - hIm * ii + n(i, 3)
      val oi = hRe * ii + hIm * ir + n(i, 4)
      Seq(Seq(or, oi), Seq(ir, ii)) // ch0 = out, ch1 = in
    }
    val agg = new MomentAggregator(2, 1)
    val mo = agg.finish(events.foldLeft(agg.zero)(agg.reduce))
    val (rms, _) = Estimators.tfRmsRatio(mo, 0, 1)
    assert(math.abs(rms(0) - hMag) < 0.05)
    val (xMag, xPh, xErr) = Estimators.tfCross(mo, 0, 1)
    assert(math.abs(xMag(0) - hMag) < 0.05)
    assert(math.abs(xPh(0) - hPh) < 0.05)
    assert(xErr(0) < 0.05)
    val (pMag, pPh, _) = Estimators.tfPhaseLocked(mo, 0, 1)
    assert(math.abs(pMag(0) - hMag) < 0.05)
    assert(math.abs(pPh(0) - hPh) < 0.05)
  }

  test("hermitian symmetry: S accessors for i > j return conjugate") {
    val events = (0 until 10).map(mkEvent)
    val mo = serialMoments(events)
    for (k <- 0 until nFreq) {
      assert(math.abs(mo.sRe(1, 0, k) - mo.sRe(0, 1, k)) < 1e-12)
      assert(math.abs(mo.sImRaw(1, 0, k) + mo.sImRaw(0, 1, k)) < 1e-12)
    }
  }
}
