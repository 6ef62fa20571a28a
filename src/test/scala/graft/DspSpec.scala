package graft

import graft.traces.Dsp

/** K1-K3 signal kernels vs analytic expectations. */
class DspSpec extends SparkSpec {

  private val n = 256
  private val fs = 1000.0

  test("rfft of a pure sinusoid peaks at its bin with amplitude n/2") {
    val f0 = 10 // cycles in the window → bin 10
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * f0 * i / n))
    val (re, im) = Dsp.rfft(x)
    val mag = re.zip(im).map { case (r, i) => math.hypot(r, i) }
    assert(math.abs(mag(f0) - n / 2.0) < 1e-6)
    mag.zipWithIndex.filterNot(_._2 == f0).foreach { case (m, _) =>
      assert(m < 1e-6)
    }
  }

  test("irfft inverts rfft") {
    val x = Array.tabulate(n)(i => math.cos(0.1 * i) + 0.3 * math.sin(0.7 * i))
    val (re, im) = Dsp.rfft(x)
    val back = Dsp.irfft(re, im, n)
    x.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("one-sided PSD satisfies Parseval: sum(psd)·fs/n ≈ mean power") {
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * 17 * i / n))
    val p = Dsp.psd(x, fs)
    val meanPower = x.map(v => v * v).sum / n
    val integrated = p.sum * fs / n
    assert(math.abs(integrated - meanPower) < 1e-9)
  }

  test("PSD of unit-amplitude sine concentrates A²/2 of power in its bin") {
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * 17 * i / n))
    val p = Dsp.psd(x, fs)
    assert(math.abs(p(17) * fs / n - 0.5) < 1e-9)
  }

  test("Butterworth low-pass: passes DC, attenuates high frequency") {
    val dc = Array.fill(2048)(1.0)
    val yDc = Dsp.butterworthLowpass(dc, 50.0, fs)
    assert(math.abs(yDc.last - 1.0) < 1e-3)

    val hf = Array.tabulate(2048)(i => math.sin(2 * math.Pi * 400 * i / fs))
    val yHf = Dsp.butterworthLowpass(hf, 50.0, fs)
    val rmsIn = math.sqrt(hf.drop(1024).map(v => v * v).sum / 1024)
    val rmsOut = math.sqrt(yHf.drop(1024).map(v => v * v).sum / 1024)
    // 2nd order at 8× cutoff → ≥ ~36 dB down
    assert(rmsOut / rmsIn < 0.02)
  }

  test("rfftfreq matches k·fs/n") {
    val f = Dsp.rfftfreq(8, 1000.0)
    assert(f.toSeq == Seq(0.0, 125.0, 250.0, 375.0, 500.0))
  }

  test("baseline subtraction via higher-order functions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Tuple1(Array(2.0, 2.0, 2.0, 2.0, 5.0, 7.0)))
      .toDF("trace")
    val out = df.select(
      Dsp.baselineSubtract(col("trace"), 0, 4).as("t")).head.getSeq[Double](0)
    assert(out.take(4).forall(v => math.abs(v) < 1e-12))
    assert(math.abs(out(4) - 3.0) < 1e-12)
  }
}
