package graft

import org.apache.spark.sql.functions._
import graft.stats.{Hist, Quantiles}

/** A4-A9, W1-W3: histograms + quantiles vs hand computation. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val xs = (0 until 1000).map(i => (i * 7 % 1000) / 10.0)
  private lazy val df = xs.map(Tuple1(_)).toDF("x")

  test("hist1d counts sum to in-range rows; bins match numpy convention") {
    val h = Hist.hist1d(df, col("x"), 10, 0.0, 99.9)
    val total = h.agg(sum("cnt")).head.getLong(0)
    assert(total == xs.count(x => x >= 0.0 && x <= 99.9))
    // top edge value falls in last bin
    val last = Hist.hist1d(Seq(Tuple1(99.9)).toDF("x"), col("x"), 10, 0.0, 99.9)
      .head()
    assert(last.getLong(0) == 9L)
  }

  test("hist2d counts sum to total") {
    val d2 = xs.zipWithIndex.map { case (x, i) => (x, i.toDouble) }
      .toDF("x", "y")
    val h = Hist.hist2d(d2, col("x"), col("y"), 8, 8,
      (0.0, 100.0), (0.0, 1000.0))
    assert(h.agg(sum("cnt")).head.getLong(0) == 1000L)
  }

  test("single-pass Histogram2D aggregate equals groupBy formulation") {
    val d2 = xs.zipWithIndex.map { case (x, i) => (x, i.toDouble) }
      .toDF("x", "y").repartition(6)
    val dense = d2.select(graft.functions.Histogram2D(
        col("x"), col("y"), (0.0, 100.0), 8, (0.0, 1000.0), 8).as("h"))
      .head.getSeq[Long](0)
    val sparse = Hist.hist2d(d2, col("x"), col("y"), 8, 8,
        (0.0, 100.0), (0.0, 1000.0))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- 0 until 8; j <- 0 until 8)
      assert(dense(i * 8 + j) == sparse.getOrElse((i.toLong, j.toLong), 0L),
        s"cell ($i,$j)")
    assert(dense.sum == 1000L)
  }

  test("exact percentile matches sorted-array linear interpolation") {
    val sorted = xs.sorted
    def npPercentile(p: Double): Double = {
      val pos = p * (sorted.size - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < sorted.size) sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
      else sorted(lo)
    }
    for (p <- Seq(0.1, 0.25, 0.5, 0.9, 0.99)) {
      val got = Quantiles.exact1(df, col("x"), p)
      assert(math.abs(got - npPercentile(p)) < 1e-9, s"p=$p")
    }
  }

  test("robust sigma equals hand-computed IQR-ish sigma") {
    val (med, sig) = Quantiles.medianRobustSigma(df, col("x"))
    val q = Quantiles.exact(df, col("x"), Seq(0.15865, 0.5, 0.84135))
    assert(math.abs(med - q(1)) < 1e-12)
    assert(math.abs(sig - ((q(1) - q(0)) + (q(2) - q(1))) / 2) < 1e-12)
  }

  test("equal-count edges produce balanced buckets") {
    val edges = Quantiles.equalCountEdges(df, col("x"), 4)
    val binned = df.withColumn("b", Quantiles.bucketByEdges(col("x"), edges))
      .groupBy("b").count().collect().map(r => r.getLong(1))
    assert(binned.sum == 1000)
    assert(binned.forall(c => math.abs(c - 250) <= 13)) // ties at edges
  }

  test("time-binned count matches filtered counts per bin") {
    val d = (0 until 300).map(i => (i.toDouble, (i % 7).toDouble))
      .toDF("t", "v")
    val tb = Hist.timeBinnedCount(d, col("t"), 0.0, 299.0, 3,
      col("v") >= 3.0).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // hand recompute
    val w = 299.0 / 3
    val expected = (0 until 300).groupBy(i =>
        math.min(math.floor(i / w).toLong, 2L))
      .view.mapValues(_.count(i => i % 7 >= 3).toLong).toMap
    assert(tb == expected)
  }

  test("exact percentile on an empty sample fails with a clear message") {
    val empty = df.filter(col("x") < -1)
    val e = intercept[IllegalArgumentException] {
      Quantiles.exact(empty, col("x"), Seq(0.5))
    }
    assert(e.getMessage.contains("empty estimation sample"))
  }

  test("histogram sketch quantiles: merge ≡ direct, error ≤ one width") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(3000)(rnd.nextDouble() * 200.0)
    val d = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    val width = 2.5
    // three-way split sketched independently, merged — must equal the
    // direct single sketch bucket-for-bucket
    val parts = (0 until 3).map(k =>
      Quantiles.histogramSketch(
        d.filter(pmod(col("id"), lit(3)) === k), col("x"), width))
    val merged = Quantiles.mergeHistogramSketches(
      parts.reduce(_ unionByName _))
    val direct = Quantiles.histogramSketch(d, col("x"), width)
    assert(merged.orderBy("bucket").collect().toSeq
      == direct.orderBy("bucket").collect().toSeq)
    // error contract: upper-edge estimate covers the exact quantile by
    // at most one bucket width
    val ps = Seq(0.1, 0.5, 0.9, 0.99)
    val est = Quantiles.sketchQuantiles(merged, ps, width)
      .orderBy("p").collect().map(_.getDouble(2))
    val exact = Quantiles.exact(d, col("x"), ps)
    ps.indices.foreach { i =>
      assert(est(i) >= exact(i) - 1e-9,
        s"p=${ps(i)}: est ${est(i)} below exact ${exact(i)}")
      assert(est(i) - exact(i) <= width + 1e-9,
        s"p=${ps(i)}: est ${est(i)} over exact ${exact(i)} by > width")
    }
  }
}
