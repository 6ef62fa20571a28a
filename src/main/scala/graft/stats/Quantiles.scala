package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile/robust-scale estimators.
  *
  * Reference mixes exact `np.percentile` in threshold paths
  * (`detanalysis/semiautocuts.py:565-585`) with vaex `percentile_approx`
  * for equal-count time bins (`semiautocuts.py:253`). Thresholds feed cut
  * predicates, so the exact form matters for oracle hash-equality
  * (SURVEY.md §7.3 item 3): we use Spark's exact `percentile` aggregate in
  * every threshold path and reserve `percentile_approx` for bin-edge
  * estimation where the reference itself was approximate.
  */
object Quantiles {

  /** A4: exact percentiles (linear interpolation, numpy-compatible).
    * `ps` in [0,1]. Returns one array column. */
  def exact(df: DataFrame, c: Column, ps: Seq[Double]): Seq[Double] = {
    val r = df
      .agg(percentile(c, array(ps.map(lit): _*)).as("q"))
      .head()
    if (r.isNullAt(0))
      throw new IllegalArgumentException(
        s"empty estimation sample for quantile over $c — the source " +
          "DataFrame (or estimation condition) matched zero non-null rows")
    r.getSeq[Double](0)
  }

  def exact1(df: DataFrame, c: Column, p: Double): Double =
    exact(df, c, Seq(p)).head

  /** Above this estimation-sample row count, THRESHOLD estimation
    * (T2/T3) switches from the exact percentile — which shuffles the
    * full per-group value multiset — to the GK sketch (rank error
    * ≤ 1/[[approxAcc]] of the sample size). The reference's regime keeps
    * estimation samples conditioned and small, so the exact path is the
    * default; this guard is the 100×-scale escape hatch VERDICT r05
    * flagged: nothing used to steer a caller off the exact path when the
    * estimation sample was a billion rows. */
  val defaultMaxExactRows: Int = 100000000
  val approxAcc: Int = 10000

  /** Result of a guarded estimation: the quantile values plus whether
    * the cardinality guard routed to the sketch. */
  final case class GuardedQuantiles(values: Seq[Double], approximated: Boolean)

  /** T2/T3 cardinality guard: exact percentiles while the estimation
    * sample is at most `maxExactRows` rows, GK sketch above. The size
    * probe is LIMIT-bounded — it scans at most maxExactRows+1 rows and
    * stops, so the check itself never pays a full pass at scale. */
  /** True when `df` MAY exceed `maxExactRows` rows. The r06 byte-size
    * shortcut (`sizeInBytes ≤ 8·maxExactRows ⇒ small`) was UNSOUND for
    * parquet scans — `sizeInBytes` there is COMPRESSED file size, so a
    * highly compressed sample far above the row limit could be declared
    * "provably small" and routed to the exact percentile, defeating the
    * guard (ADVICE r06). Only the plan's `rowCount` statistic is trusted
    * now — when Catalyst reports one (LocalRelation, Range, cached
    * relations) it is a real row count, not a byte guess. Otherwise a
    * LIMIT-bounded count probe decides — it scans at most
    * maxExactRows+1 rows and stops, so the check never pays a full
    * pass at scale. */
  def exceedsExactLimit(df: DataFrame, maxExactRows: Int): Boolean = {
    if (maxExactRows == Int.MaxValue) return false
    df.queryExecution.optimizedPlan.stats.rowCount match {
      case Some(n) => n > maxExactRows
      case None    => df.limit(maxExactRows + 1).count() > maxExactRows
    }
  }

  def thresholdQuantiles(
      df: DataFrame,
      c: Column,
      ps: Seq[Double],
      maxExactRows: Int = defaultMaxExactRows): GuardedQuantiles = {
    val sample = df.filter(c.isNotNull)
    if (exceedsExactLimit(sample, maxExactRows))
      GuardedQuantiles(approx(sample, c, ps, approxAcc), approximated = true)
    else GuardedQuantiles(exact(sample, c, ps), approximated = false)
  }

  /** A5: approximate percentile (t-digest-free Greenwald-Khanna in Spark)
    * — direct equivalent of vaex `percentile_approx`
    * (`semiautocuts.py:253`). */
  def approx(df: DataFrame, c: Column, ps: Seq[Double], acc: Int = 10000)
      : Seq[Double] = {
    val r = df
      .agg(percentile_approx(c, array(ps.map(lit): _*), lit(acc)).as("q"))
      .head()
    r.getSeq[Double](0)
  }

  /** A6: median + robust sigma from the 15.865/50/84.135 percentiles —
    * sigma = mean of the two one-sided distances
    * (`_get_cut_mask` sigma branch, `semiautocuts.py:588-627`).
    * One exact-percentile pass. */
  def medianRobustSigma(df: DataFrame, c: Column): (Double, Double) = {
    val Seq(q1, med, q3) = exact(df, c, Seq(0.15865, 0.5, 0.84135))
    val sigma = ((med - q1) + (q3 - med)) / 2.0
    (med, sigma)
  }

  /** [[medianRobustSigma]] behind the T3 cardinality guard. */
  def medianRobustSigmaGuarded(
      df: DataFrame,
      c: Column,
      maxExactRows: Int = defaultMaxExactRows): (Double, Double) = {
    val g = thresholdQuantiles(df, c, Seq(0.15865, 0.5, 0.84135), maxExactRows)
    val Seq(q1, med, q3) = g.values
    (med, ((med - q1) + (q3 - med)) / 2.0)
  }

  /** W2: equal-count bin edges at percentiles of `c`
    * (`semiautocuts.py:244-255`) — returns bins+1 edges including min/max. */
  def equalCountEdges(df: DataFrame, c: Column, bins: Int): Seq[Double] = {
    val ps = (0 to bins).map(i => i.toDouble / bins)
    exact(df, c, ps)
  }

  /** Bucketize by explicit (sorted) edges: index of the right-open
    * interval, last interval closed — SQL `width_bucket`-style but with
    * numpy's last-bin-closed convention. */
  def bucketByEdges(x: Column, edges: Seq[Double]): Column = {
    val n = edges.size - 1
    val base = (0 until n).map { i =>
      when(x >= edges(i) && (if (i == n - 1) x <= edges(i + 1)
                             else x < edges(i + 1)), i.toLong)
    }
    coalesce(base :+ lit(null.asInstanceOf[java.lang.Long]): _*)
  }

  /** Mergeable equi-width histogram sketch of `c`: `(bucket, cnt)` rows
    * with bucket = floor(c / width). The HdrHistogram-style incremental
    * quantile path at 100 TB: sketch each partition/day once (ONE
    * map-side-combined aggregation — the sketch exchange is bounded by
    * value-range/width, not rows), persist the KB-scale rows, and
    * answer quantiles over any window of sketches by summing counts.
    * Null values are excluded, like `percentile_approx`. */
  def histogramSketch(df: DataFrame, c: Column, width: Double): DataFrame = {
    require(width > 0, "width must be positive")
    df.filter(c.isNotNull)
      .select(floor(c / width).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Merge persisted [[histogramSketch]] rows (any number of sketches
    * unioned together): counts sum by bucket. */
  def mergeHistogramSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy("bucket").agg(sum("cnt").as("cnt"))

  /** Quantiles from a merged sketch: for each p, the smallest bucket
    * whose cumulative count reaches ceil(p·N), reported as the bucket's
    * UPPER edge — so the estimate is ≥ the true quantile by at most
    * `width` (the sketch's whole error contract: one bucket). Runs on
    * the driver: a merged sketch is range/width rows (KB) by
    * construction. */
  def sketchQuantiles(
      sketch: DataFrame,
      ps: Seq[Double],
      width: Double): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val rows = sketch.orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.map(_._2).sum
    val out = ps.map { p =>
      val rank = math.ceil(p * n).toLong
      var cum = 0L
      var i = 0
      while (i < rows.length && cum + rows(i)._2 < rank) {
        cum += rows(i)._2; i += 1
      }
      val b = if (rows.isEmpty) 0L else rows(math.min(i, rows.length - 1))._1
      (p, b, (b + 1) * width)
    }
    out.toDF("p", "bucket", "est")
  }
}
