package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned aggregations: 1-D/2-D histograms and binning expressions.
  *
  * Reference: `Analyzer.hist` (`detanalysis/analyzer.py:579-662`),
  * `Analyzer.heatmap` (`analyzer.py:664-715`), time/amplitude binning in
  * `Semiautocut.__init__` (`semiautocuts.py:244-292`).
  *
  * Spark-first shape: a histogram is `groupBy(bucket).count()` over a
  * closed-form bucket expression — one shuffle of at most `bins` rows after
  * map-side partial aggregation, so it scales to any input size. Bin
  * limits, when not given, come from a first `agg(min, max)` pass
  * (two-pass, like vaex's `limits='minmax'`).
  */
object Hist {

  /** W1/W3: equal-width bucket index in [0, bins-1]; values exactly at the
    * upper edge fall in the last bin (numpy half-open-except-last
    * convention, matching `np.histogram`). Out-of-range values are
    * clamped out by callers' range predicate. */
  def bucket(x: Column, lo: Double, hi: Double, bins: Int): Column = {
    val w = (hi - lo) / bins
    least(floor((x - lo) / w), lit(bins - 1L)).cast("long")
  }

  /** Equal-width binning where edges are data-driven (two-pass). Returns
    * (lo, hi) from one min/max aggregation (`semiautocuts.py:257-259`). */
  def minmax(df: DataFrame, c: String): (Double, Double) = {
    val r = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** A7: 1-D histogram as a (bin, count) DataFrame. Values outside
    * [lo, hi] are dropped (numpy `range=` semantics). */
  def hist1d(
      df: DataFrame,
      c: Column,
      bins: Int,
      lo: Double,
      hi: Double): DataFrame =
    df.filter(c >= lo && c <= hi)
      .groupBy(bucket(c, lo, hi, bins).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** A7 with data-driven limits (`limits='minmax'`,
    * `analyzer.py:592-596`). */
  def hist1dAuto(df: DataFrame, column: String, bins: Int): DataFrame = {
    val (lo, hi) = minmax(df, column)
    hist1d(df, col(column), bins, lo, hi)
  }

  /** A8: 2-D histogram (heatmap backing table) as (xbin, ybin, count)
    * (`analyzer.py:664-715`). One shuffle of ≤ xbins·ybins rows. */
  def hist2d(
      df: DataFrame,
      x: Column,
      y: Column,
      xbins: Int,
      ybins: Int,
      xlim: (Double, Double),
      ylim: (Double, Double)): DataFrame =
    df.filter(
        x >= xlim._1 && x <= xlim._2 && y >= ylim._1 && y <= ylim._2)
      .groupBy(
        bucket(x, xlim._1, xlim._2, xbins).as("xbin"),
        bucket(y, ylim._1, ylim._2, ybins).as("ybin"))
      .agg(count(lit(1)).as("cnt"))

  /** Collect a (bin,count) result into a dense Array[Long] of length
    * `bins` (driver-side plot prep; the distributed result is ≤bins rows
    * so this collect is bounded, never data-sized). */
  def dense1d(histDf: DataFrame, bins: Int): Array[Long] = {
    val out = Array.ofDim[Long](bins)
    histDf.collect().foreach { r =>
      val b = r.getLong(histDf.columns.indexOf("bin"))
      if (b >= 0 && b < bins) out(b.toInt) = r.getLong(histDf.columns.indexOf("cnt"))
    }
    out
  }

  /** A7 overlay variant: one histogram pass yielding counts per named
    * cut simultaneously (`hist(..., cut=[c1, c2, …])` overlays,
    * `analyzer.py:605-636`) — one scan + one ≤bins-row shuffle for N
    * overlays instead of N passes. */
  def hist1dOverlay(
      df: DataFrame,
      c: Column,
      bins: Int,
      lo: Double,
      hi: Double,
      cuts: Map[String, Column]): DataFrame = {
    val aggs = cuts.toSeq.sortBy(_._1).map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"cnt_$name")
    }
    df.filter(c >= lo && c <= hi)
      .groupBy(bucket(c, lo, hi, bins).as("bin"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** A8 `what=` variant: any aggregation per 2-D cell instead of a bare
    * count (`heatmap(..., what=…)`, `analyzer.py:664-715`). */
  def hist2dAgg(
      df: DataFrame,
      x: Column,
      y: Column,
      xbins: Int,
      ybins: Int,
      xlim: (Double, Double),
      ylim: (Double, Double),
      what: Column): DataFrame =
    df.filter(
        x >= xlim._1 && x <= xlim._2 && y >= ylim._1 && y <= ylim._2)
      .groupBy(
        bucket(x, xlim._1, xlim._2, xbins).as("xbin"),
        bucket(y, ylim._1, ylim._2, ybins).as("ybin"))
      .agg(what.as("what"))

  /** A9: per-time-bin count of events whose `value` falls in [vlo, vhi] —
    * the rate-estimation histogram
    * (`_do_time_binned_count_cut`, `semiautocuts.py:738-811`). Returns
    * (bin, cnt) with empty bins absent (callers treat absent as 0). */
  def timeBinnedCount(
      df: DataFrame,
      time: Column,
      tlo: Double,
      thi: Double,
      bins: Int,
      inRange: Column): DataFrame =
    df.filter(time >= tlo && time <= thi)
      .groupBy(bucket(time, tlo, thi, bins).as("bin"))
      .agg(sum(when(inRange, 1L).otherwise(0L)).as("cnt"))
}
