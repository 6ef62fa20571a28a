package graft.cuts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.stats.{Hist, Quantiles}

/** Data-driven cut parameters — the `cut_pars` dict of the reference
  * (`detanalysis/semiautocuts.py:294-306`), with `Option[Double]` replacing
  * the −1e8 "unset" sentinel. Exactly one family (value / percentile /
  * sigma) should be populated; `percent` / `sigma` are the symmetric
  * shorthands expanded in `_get_cut_mask` (`semiautocuts.py:548-627`). */
final case class CutPars(
    valLower: Option[Double] = None,
    valUpper: Option[Double] = None,
    percentLower: Option[Double] = None,
    percentUpper: Option[Double] = None,
    percent: Option[Double] = None,
    sigmaLower: Option[Double] = None,
    sigmaUpper: Option[Double] = None,
    sigma: Option[Double] = None) {

  def isValue: Boolean = valLower.isDefined || valUpper.isDefined
  def isPercentile: Boolean =
    percentLower.isDefined || percentUpper.isDefined || percent.isDefined
  def isSigma: Boolean =
    sigmaLower.isDefined || sigmaUpper.isDefined || sigma.isDefined
}

/** Resolved numeric thresholds for one cut (optionally per bin). */
final case class Thresholds(lower: Option[Double], upper: Option[Double]) {
  /** The pass predicate `lower < x < hi` — strict on both sides, matching
    * the reference (`semiautocuts.py:554-561`). */
  def predicate(x: Column): Column = (lower, upper) match {
    case (Some(lo), Some(hi)) => x > lo && x < hi
    case (Some(lo), None)     => x > lo
    case (None, Some(hi))     => x < hi
    case (None, None)         => lit(true)
  }
}

/** Semi-automatic, data-driven threshold cuts — the Spark re-expression of
  * `Semiautocut` (`detanalysis/semiautocuts.py:83-873`).
  *
  * The estimation sample (events used to COMPUTE thresholds) and the
  * application set (events the cut is APPLIED to) are distinct: thresholds
  * come from the estimation `DataFrame` (typically conditioned on previous
  * cuts and bin limits, T4, `semiautocuts.py:508-541`) but the returned
  * predicate applies to any row (T1-T3 return plain `Column`s).
  *
  * Binned variants (T6/T7) replace the reference's serial per-bin Python
  * loops (`semiautocuts.py:696-716,835-855`) with one
  * `groupBy(bin).agg(percentile)` plus a broadcast join of the ≤bins-row
  * threshold table back onto the events — the scale-safe shape (J3/J4).
  */
object SemiAutoCut {

  /** T1-T3 dispatch: resolve thresholds for `rq` from the estimation
    * sample (`_get_cut_mask`, `semiautocuts.py:491-647`). Exact
    * percentiles (SURVEY §7.3 item 3) while the estimation sample is at
    * most `maxExactRows` rows — above that the cardinality guard routes
    * to the GK sketch (rank error ≤ 1/`Quantiles.approxAcc`): an exact
    * percentile over a billion-row estimation sample shuffles the full
    * value multiset, and the reference's conditioned-sample regime never
    * intended that (VERDICT r05 §6). Pass `Int.MaxValue` to force the
    * exact path regardless of size. */
  def thresholds(
      est: DataFrame,
      rq: String,
      pars: CutPars,
      maxExactRows: Int = Quantiles.defaultMaxExactRows): Thresholds = {
    val x = col(rq)
    def quantiles(ps: Seq[Double]): Seq[Double] =
      Quantiles.thresholdQuantiles(est, x, ps, maxExactRows).values
    if (pars.isValue) {
      Thresholds(pars.valLower, pars.valUpper) // T1 (`:548-561`)
    } else if (pars.isPercentile) {            // T2 (`:563-586`)
      pars.percent match {
        case Some(p) =>
          // symmetric about the median: keep the central p percent
          val half = p / 2.0
          val Seq(lo, hi) =
            quantiles(Seq(0.5 - half / 100.0, 0.5 + half / 100.0))
          Thresholds(Some(lo), Some(hi))
        case None =>
          // resolve both bounds in ONE estimation pass when both are set
          val ps = pars.percentLower.toSeq ++ pars.percentUpper.toSeq
          val vs = if (ps.isEmpty) Nil else quantiles(ps.map(_ / 100.0))
          val lo = pars.percentLower.map(_ => vs.head)
          val hi = pars.percentUpper.map(_ => vs.last)
          Thresholds(lo, hi)
      }
    } else if (pars.isSigma) {                 // T3 (`:588-627`)
      val (med, sig) = Quantiles.medianRobustSigmaGuarded(est, x, maxExactRows)
      pars.sigma match {
        case Some(k) =>
          Thresholds(Some(med - k * sig), Some(med + k * sig))
        case None =>
          Thresholds(
            pars.sigmaLower.map(k => med - k * sig),
            pars.sigmaUpper.map(k => med + k * sig))
      }
    } else Thresholds(None, None)
  }

  /** T1-T4 in one step: estimation-conditioned cut predicate. */
  def cut(
      df: DataFrame,
      rq: String,
      pars: CutPars,
      estimationCondition: Column = lit(true),
      maxExactRows: Int = Quantiles.defaultMaxExactRows): Column =
    thresholds(df.filter(estimationCondition), rq, pars, maxExactRows)
      .predicate(col(rq))

  /** T4 helper: previous-cut discovery — all boolean `cut_*` columns whose
    * name contains the channel (`_get_previous_cut_names`,
    * `semiautocuts.py:384-397`), AND-folded
    * (`_combine_cut_columns`, `:399-409`). */
  def previousCutsCondition(df: DataFrame, channel: String): Column = {
    val cuts = df.schema.fields
      .filter(f =>
        f.name.startsWith("cut_") && f.name.contains(channel) &&
          f.dataType == org.apache.spark.sql.types.BooleanType)
      .map(f => col(f.name))
    if (cuts.isEmpty) lit(true) else cuts.reduce(_ && _)
  }

  /** T5: time-interval cut — pass events inside ANY [lo,hi] pair.
    *
    * Divergence from the reference, deliberate: `_do_time_cut`
    * (`semiautocuts.py:461-489`) initializes the mask to zeros and ANDs
    * per-interval masks (`:206-207,488`), so two disjoint intervals yield
    * the empty cut — a bug. We implement the evident intent (OR), as
    * documented in SURVEY.md §2.5. */
  def timeIntervalCut(time: Column, pairs: Seq[(Double, Double)]): Column =
    pairs.map { case (lo, hi) => time >= lo && time <= hi }.reduce(_ || _)

  /** T6: binned cut — per-bin thresholds, one grouped aggregation + a
    * broadcast join back (J3). `bin` must be a deterministic bucket
    * expression (see [[graft.stats.Hist.bucket]]). Rows with a null bin
    * (out of range) fail the cut. Per-bin `exceptions` override the
    * estimated thresholds (`exceptions_dict`, `semiautocuts.py:675-736`).
    *
    * Returns the cut DataFrame: `df` plus boolean `cutName`.
    */
  def binnedCut(
      df: DataFrame,
      rq: String,
      bin: Column,
      pars: CutPars,
      cutName: String,
      exceptions: Map[Long, Thresholds] = Map.empty,
      estimationCondition: Column = lit(true),
      maxExactRows: Int = graft.stats.Quantiles.defaultMaxExactRows)
      : DataFrame = {
    val binned = df.withColumn("__bin__", bin)
    val x = col(rq)

    // per-bin threshold aggregation over the estimation sample.
    // Same cardinality guard as the global thresholds (T2/T3): exact
    // per-bin percentile shuffles every bin's full value multiset, so
    // past maxExactRows estimation rows the aggregation switches to the
    // GK sketch (rank error ≤ 1/approxAcc per bin).
    val est = binned.filter(estimationCondition && col("__bin__").isNotNull)
    val useApprox = (pars.isPercentile || pars.isSigma) &&
      graft.stats.Quantiles.exceedsExactLimit(est, maxExactRows)
    def pct(p: Column): Column =
      if (useApprox)
        percentile_approx(x, p, lit(graft.stats.Quantiles.approxAcc))
      else percentile(x, p)
    val thr: DataFrame =
      if (pars.isValue) {
        est.select(col("__bin__")).distinct()
          .withColumn("__lo__",
            pars.valLower.map(lit).getOrElse(lit(null)).cast("double"))
          .withColumn("__hi__",
            pars.valUpper.map(lit).getOrElse(lit(null)).cast("double"))
      } else if (pars.isPercentile) {
        val (pl, pu) = pars.percent match {
          case Some(p) => (Some(0.5 - p / 200.0), Some(0.5 + p / 200.0))
          case None    => (pars.percentLower.map(_ / 100.0),
                           pars.percentUpper.map(_ / 100.0))
        }
        est.groupBy(col("__bin__")).agg(
          pl.map(p => pct(lit(p))).getOrElse(lit(null).cast("double"))
            .as("__lo__"),
          pu.map(p => pct(lit(p))).getOrElse(lit(null).cast("double"))
            .as("__hi__"))
      } else { // sigma family
        val qs = pct(array(lit(0.15865), lit(0.5), lit(0.84135)))
        val base = est.groupBy(col("__bin__")).agg(qs.as("__q__"))
          .withColumn("__med__", col("__q__").getItem(1))
          .withColumn("__sig__",
            ((col("__q__").getItem(1) - col("__q__").getItem(0)) +
              (col("__q__").getItem(2) - col("__q__").getItem(1))) / 2.0)
        val (kl, ku) = pars.sigma match {
          case Some(k) => (Some(k), Some(k))
          case None    => (pars.sigmaLower, pars.sigmaUpper)
        }
        base.select(
          col("__bin__"),
          kl.map(k => col("__med__") - lit(k) * col("__sig__"))
            .getOrElse(lit(null).cast("double")).as("__lo__"),
          ku.map(k => col("__med__") + lit(k) * col("__sig__"))
            .getOrElse(lit(null).cast("double")).as("__hi__"))
      }

    // apply per-bin exception overrides (small driver map). FULL outer:
    // an exception for a bin absent from the estimation sample must still
    // apply (the reference's exceptions_dict is unconditional,
    // `semiautocuts.py:696-716`).
    val thrMarked = thr.withColumn("__est__", lit(true))
    val thrFinal =
      if (exceptions.isEmpty) thrMarked
      else {
        val spark = df.sparkSession
        import spark.implicits._
        val ex = exceptions.toSeq
          .map { case (b, t) =>
            (b, t.lower.map(Double.box).orNull, t.upper.map(Double.box).orNull)
          }
          .toDF("__bin__", "__exlo__", "__exhi__")
          .withColumn("__exc__", lit(true))
        thrMarked.join(broadcast(ex), Seq("__bin__"), "full_outer")
          .select(
            col("__bin__"),
            when(col("__exc__").isNotNull, col("__exlo__"))
              .otherwise(col("__lo__")).as("__lo__"),
            when(col("__exc__").isNotNull, col("__exhi__"))
              .otherwise(col("__hi__")).as("__hi__"),
            coalesce(col("__est__"), col("__exc__")).as("__est__"))
      }

    // broadcast join thresholds back; pass = strict inside (lo, hi).
    // Bins with NO threshold row (estimation sample empty there and no
    // exception) FAIL the cut — matching the reference, where an empty
    // estimation slice yields nan thresholds and an all-false mask.
    val pass =
      (col("__lo__").isNull || x > col("__lo__")) &&
        (col("__hi__").isNull || x < col("__hi__"))
    binned
      .join(broadcast(thrFinal), Seq("__bin__"), "left")
      .withColumn(
        cutName,
        when(col("__bin__").isNull || col("__est__").isNull, lit(false))
          .otherwise(coalesce(pass, lit(false))))
      .drop("__bin__", "__lo__", "__hi__", "__est__")
  }

  /** T7: rate cut — count events with `inRange` per time bin; cut WHOLE
    * bins whose count exceeds a threshold; events keep/lose by their bin's
    * verdict (J4 broadcast join — the reference does an O(events×bins)
    * Python loop, `semiautocuts.py:800-811`).
    *
    * `limit` semantics (`_do_time_binned_count_cut`, `semiautocuts.py:
    * 738-811`): Left(absolute count) | Right((mode, k)) where mode is
    * "percent" (percentile of bin counts) or "sigma" (median + k·robust
    * sigma of bin counts).
    */
  def rateCut(
      df: DataFrame,
      time: Column,
      tlo: Double,
      thi: Double,
      bins: Int,
      inRange: Column,
      limit: Either[Double, (String, Double)],
      cutName: String): DataFrame = {
    val spark = df.sparkSession
    // ALL bins participate in the threshold estimation, empty ones with
    // count 0 — the reference allocates a zeros array of nbins and takes
    // the percentile over it (`semiautocuts.py:744,788`); dropping empty
    // bins would bias the threshold upward.
    val counts = spark.range(bins).toDF("bin")
      .join(Hist.timeBinnedCount(df, time, tlo, thi, bins, inRange),
        Seq("bin"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val threshold: Double = limit match {
      case Left(abs) => abs
      case Right(("percent", p)) =>
        Quantiles.exact1(counts, col("cnt").cast("double"), p / 100.0)
      case Right(("sigma", k)) =>
        val (med, sig) =
          Quantiles.medianRobustSigma(counts, col("cnt").cast("double"))
        med + k * sig
      case Right((m, _)) =>
        throw new IllegalArgumentException(s"unknown rate-cut mode $m")
    }
    val verdict = counts
      .select(col("bin"), (col("cnt") <= threshold).as("__keep__"))
    // events OUTSIDE [tlo, thi] belong to no bin and always keep (the
    // reference flips only events strictly inside a bin's window) — so
    // the bucket is null out of range, never clamped into an edge bin.
    val binCol = when(time >= tlo && time <= thi,
      Hist.bucket(time, tlo, thi, bins)).otherwise(lit(null))
    df.withColumn("__bin__", binCol)
      .join(
        broadcast(verdict.withColumnRenamed("bin", "__bin__")),
        Seq("__bin__"), "left")
      .withColumn(cutName, coalesce(col("__keep__"), lit(true)))
      .drop("__bin__", "__keep__")
  }
}

/** Master combination of per-channel cuts — `MasterSemiautocuts`
  * (`detanalysis/semiautocuts.py:2066-2101`): AND-fold all cuts, with an
  * optional saturation override `OR (ofampRq > satThreshold)`
  * (`:2085-2090`). */
object MasterCuts {
  def combined(
      cutCols: Seq[Column],
      saturation: Option[(Column, Double)] = None): Column = {
    val allCuts = cutCols.reduce(_ && _)
    saturation match {
      case Some((ofamp, thr)) => allCuts || (ofamp > thr)
      case None               => allCuts
    }
  }

  /** A11: cumulative pass-fraction matrix over randoms — for each i, the
    * fraction of condition-rows passing cuts j..i for every j ≤ i
    * (`get_randoms_passfrac_table`, `semiautocuts.py:2471-2531`). One
    * aggregation with N(N+1)/2 avg expressions — a single pass. */
  def cumulativePassFractions(
      df: DataFrame,
      cutNames: Seq[String],
      condition: Column): DataFrame = {
    val aggs = for {
      i <- cutNames.indices
      j <- 0 to i
    } yield avg(
      cutNames.slice(j, i + 1).map(col).reduce(_ && _).cast("double"))
      .as(s"frac_${j}_$i")
    df.filter(condition).agg(aggs.head, aggs.tail: _*)
  }
}
