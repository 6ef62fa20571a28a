package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal relational operators the reference lacks but a
  * detector-event / training-data pipeline wants: as-of join, interval
  * (range) join, and gap sessionization.
  *
  * All three are built to shuffle ONCE on the join/group key and never
  * materialize a per-key pair list:
  *
  *   - [[asofJoin]] is the union-tag formulation: tag and union the two
  *     inputs, ONE hash exchange on the key, ONE sort by (ts, tag), and
  *     a running `last(payload, ignoreNulls)` carries the most recent
  *     right row forward onto each left row. The naive formulation
  *     (equi-join on key + `ts <= ts'` filter + per-left max) builds
  *     O(|L_k|·|R_k|) intermediate pairs per key; this one is
  *     O(|L_k|+|R_k|) — the difference between a dead executor and a
  *     flat curve on a 100 TB key-skewed feed.
  *   - [[intervalJoin]] grids intervals onto fixed-width buckets
  *     (`sequence` + `explode`, bounded by interval length / width) so
  *     the pair generator is a bucket equi-join, never a cross product;
  *     the exact `[lo, hi)` predicate then prunes the candidates.
  *   - [[sessionize]] is lag + running sum over one keyed sort — the
  *     standard gaps-and-islands decomposition, one exchange.
  *
  * Timestamps are plain numeric columns (the engine's convention:
  * integer microseconds, `queries/Q.tsUs`), so the operators are
  * unit-agnostic — gaps/widths/tolerances are in the caller's units.
  * Gap/tolerance/slice arithmetic runs in doubles, so timestamps must
  * be double-exact: |t| < 2^53 (for µs since epoch, the 23rd century).
  *
  * Null keys: the window-based operators (asofJoin, asofJoinSliced,
  * sessionize) PARTITION on the key, so null keys group together and
  * can match each other — unlike SQL join equality, where null never
  * equals null ([[intervalJoin]] and [[asofJoinBroadcast]] use real
  * joins and follow SQL semantics). Filter null keys out beforehand
  * when SQL-equivalent behavior matters. Null timestamps sort first
  * in the window frame and therefore never match (backward) /
  * match nothing (forward) — drop them for a fully specified result.
  */
object Temporal {

  sealed trait AsOfDirection
  /** Match the latest right row with `rightTs <= leftTs`. */
  case object Backward extends AsOfDirection
  /** Match the earliest right row with `rightTs >= leftTs`. */
  case object Forward extends AsOfDirection

  /** As-of join: for every left row, attach the payload of the single
    * right row closest in time (per [[AsOfDirection]], inclusive) with
    * equal `keys`. Right payload columns come back as
    * `prefix + name`; the matched right timestamp as `prefix + rightTs`.
    *
    * @param tolerance max |leftTs - rightTs| to accept, in ts units —
    *                  farther matches are dropped (inner) or nulled
    *                  (left outer)
    * @param leftOuter keep unmatched left rows with null payload
    *
    * Ties on `rightTs` within a key are broken by the right row's
    * sort order on the payload struct (first field ascending), so
    * results are deterministic when payloads differ; pre-dedup the
    * right side on (keys, ts) for a fully specified contract.
    *
    * Skew: the keyed window processes one key in one task, so a single
    * pathologically hot key serializes (the TemporalStress `hot`
    * curve measures that axis). For such feeds use [[asofJoinSliced]],
    * which partitions by (key, time-slice) and carries each slice's
    * boundary state through a tiny per-slice aggregate instead.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      direction: AsOfDirection = Backward,
      tolerance: Option[Long] = None,
      leftOuter: Boolean = false,
      prefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equality key")
    require(rightPayload.nonEmpty, "asofJoin needs right payload columns")
    val leftCols = left.columns.toSeq
    // payload struct leads with the right timestamp so tolerance and
    // output both read it back; `last` over the ordered frame picks the
    // time-closest right row
    val rStruct = struct(
      (col(rightTs).as("__rt") +: rightPayload.map(col)): _*)
    val rightPrep = right.select(
      keys.map(col) :+ col(rightTs).as("__t") :+ rStruct.as("__r"): _*)
      .withColumn("__tag", lit(0))
    val leftPrep = left
      .withColumn("__t", col(leftTs))
      .withColumn("__tag", lit(1))
    // right rows order before left at equal __t (tag 0 < 1) in the
    // ascending frame, so "inclusive" holds in both directions
    val unioned = leftPrep.unionByName(rightPrep, allowMissingColumns = true)
    val ord: Seq[Column] = direction match {
      case Backward => Seq(col("__t").asc, col("__tag").asc, col("__r").asc)
      case Forward  => Seq(col("__t").desc, col("__tag").asc, col("__r").desc)
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val withinTol = tolerance match {
      case Some(tol) =>
        matched.withColumn("__last",
          when(abs(col("__t").cast("double") -
            col("__last.__rt").cast("double")) <= tol.toDouble,
            col("__last")))
      case None => matched
    }
    val base = if (leftOuter) withinTol
      else withinTol.filter(col("__last").isNotNull)
    base.select(
      leftCols.map(col) ++
        (col("__last.__rt").as(prefix + rightTs) +:
          rightPayload.map(p => col("__last").getField(p).as(prefix + p))): _*)
  }

  /** Skew-immune as-of join: identical contract to [[asofJoin]], but
    * partitioned by (keys, time-slice of width `sliceWidth`) so a hot
    * key spreads across ⌈range/width⌉ tasks instead of serializing
    * into one. Carry-in state (the latest right row before each
    * slice) is computed over a per-(key, slice) aggregate — map-side
    * combined, so the extra exchange moves one row per (key, slice),
    * not the data — and injected into each slice as a synthetic right
    * row whose timestamp (strictly below every in-slice timestamp)
    * makes the in-slice running `last` equal the global one.
    *
    * Cost: the full data crosses two exchanges instead of one. Use
    * [[asofJoin]] unless a key can dominate a partition.
    * Forward direction delegates to the backward plan on negated
    * timestamps (forward-inclusive ≡ backward-inclusive on −t).
    */
  def asofJoinSliced(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      sliceWidth: Long,
      direction: AsOfDirection = Backward,
      tolerance: Option[Long] = None,
      leftOuter: Boolean = false,
      prefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asofJoinSliced needs at least one equality key")
    require(rightPayload.nonEmpty, "asofJoinSliced needs payload columns")
    require(sliceWidth > 0, "sliceWidth must be positive")
    direction match {
      case Forward =>
        val out = asofJoinSliced(
          left.withColumn(leftTs, -col(leftTs)),
          right.withColumn(rightTs, -col(rightTs)),
          keys, leftTs, rightTs, rightPayload, sliceWidth,
          Backward, tolerance, leftOuter, prefix)
        out.withColumn(leftTs, -col(leftTs))
          .withColumn(prefix + rightTs, -col(prefix + rightTs))
      case Backward =>
        val leftCols = left.columns.toSeq
        // floor division: pmod (≥ 0) makes the numerator an exact
        // multiple of the width, so the double quotient is exact for
        // any double-representable timestamp (module contract)
        def sliceOf(c: Column): Column =
          ((c - pmod(c, lit(sliceWidth))) / sliceWidth).cast("long")
        val rStruct = struct(
          (col(rightTs).as("__rt") +: rightPayload.map(col)): _*)
        val rightPrep = right.select(
          keys.map(col) :+ col(rightTs).as("__t") :+ rStruct.as("__r"): _*)
          .withColumn("__slice", sliceOf(col("__t")))
          .withColumn("__tag", lit(0))
        val leftPrep = left
          .withColumn("__t", col(leftTs))
          .withColumn("__slice", sliceOf(col("__t")))
          .withColumn("__tag", lit(1))
        // latest right row per (key, slice) — map-side combined
        val perSlice = rightPrep
          .groupBy((keys :+ "__slice").map(col): _*)
          .agg(max_by(col("__r"), struct(col("__t"), col("__r")))
            .as("__sliceLast"))
        // spine = every (key, slice) either side touches; carry-in =
        // latest right row over STRICTLY earlier slices. Window input
        // is one row per (key, slice) — tiny even for a hot key.
        val leftSlices = leftPrep
          .select((keys :+ "__slice").map(col): _*).distinct()
          .withColumn("__hasLeft", lit(true))
        val spine = leftSlices.join(perSlice, keys :+ "__slice", "full_outer")
        val wS = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__slice").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carries = spine
          .withColumn("__carry",
            last(col("__sliceLast"), ignoreNulls = true).over(wS))
          .filter(col("__carry").isNotNull && col("__hasLeft"))
          .select(keys.map(col) :+ col("__slice") :+
            col("__carry").as("__r"): _*)
          // the carried row's true timestamp lies in an earlier slice,
          // so it sorts before every in-slice row — global `last` ≡
          // in-slice `last` with the carry seeded first
          .withColumn("__t", col("__r").getField("__rt"))
          .withColumn("__tag", lit(0))
        val unioned = leftPrep
          .unionByName(rightPrep, allowMissingColumns = true)
          .unionByName(carries, allowMissingColumns = true)
        val w = Window.partitionBy((keys :+ "__slice").map(col): _*)
          .orderBy(col("__t").asc, col("__tag").asc, col("__r").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val matched = unioned
          .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
          .filter(col("__tag") === 1)
        val withinTol = tolerance match {
          case Some(tol) =>
            matched.withColumn("__last",
              when(abs(col("__t").cast("double") -
                col("__last.__rt").cast("double")) <= tol.toDouble,
                col("__last")))
          case None => matched
        }
        val base = if (leftOuter) withinTol
          else withinTol.filter(col("__last").isNotNull)
        base.select(
          leftCols.map(col) ++
            (col("__last.__rt").as(prefix + rightTs) +:
              rightPayload.map(p =>
                col("__last").getField(p).as(prefix + p))): _*)
    }
  }

  /** Broadcast as-of join: identical contract to [[asofJoin]], for the
    * small-right-side case (calibration tables, sensor state feeds —
    * dimensions, not events). The right side is grouped per key into a
    * sorted struct array and BROADCAST, so the left side crosses ZERO
    * exchanges: the probe is a map-only BroadcastHashJoin plus a
    * higher-order `filter` + `array_max`/`array_min` pick — the plan
    * you want when the left side is the 100 TB fact stream. Per-left-
    * row cost is O(|right rows for the key|); keep the right side
    * dimension-sized (it must fit in a broadcast either way).
    *
    * Tie-break matches [[asofJoin]]: lexicographic on
    * (rightTs, payload...) — max for Backward, min for Forward.
    */
  def asofJoinBroadcast(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      direction: AsOfDirection = Backward,
      tolerance: Option[Long] = None,
      leftOuter: Boolean = false,
      prefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asofJoinBroadcast needs an equality key")
    require(rightPayload.nonEmpty, "asofJoinBroadcast needs payload columns")
    val leftCols = left.columns.toSeq
    val rStruct = struct(
      (col(rightTs).as("__rt") +: rightPayload.map(col)): _*)
    val grouped = right
      .groupBy(keys.map(col): _*)
      .agg(collect_list(rStruct).as("__arr"))
    val joined = left.join(broadcast(grouped), keys,
      if (leftOuter) "left" else "inner")
    val cand = direction match {
      case Backward =>
        filter(col("__arr"), x => x.getField("__rt") <= col(leftTs))
      case Forward =>
        filter(col("__arr"), x => x.getField("__rt") >= col(leftTs))
    }
    val pick = direction match {
      case Backward => array_max(cand)
      case Forward  => array_min(cand)
    }
    val matched = joined.withColumn("__last", pick)
    val withinTol = tolerance match {
      case Some(tol) =>
        matched.withColumn("__last",
          when(abs(col(leftTs).cast("double") -
            col("__last.__rt").cast("double")) <= tol.toDouble,
            col("__last")))
      case None => matched
    }
    val base = if (leftOuter) withinTol
      else withinTol.filter(col("__last").isNotNull)
    base.select(
      leftCols.map(col) ++
        (col("__last.__rt").as(prefix + rightTs) +:
          rightPayload.map(p =>
            col("__last").getField(p).as(prefix + p))): _*)
  }

  /** Interval (range) join: rows whose `rowTs` falls in `[lo, hi)` of
    * an interval, with optional extra equality `keys`. Both sides are
    * gridded onto `bucketWidth`-sized buckets so the join is an
    * equi-join on (keys, bucket); each interval expands to
    * `⌈length / bucketWidth⌉ + 1` rows — choose the width near the
    * typical interval length to bound the blow-up. A row lands in
    * exactly one bucket, so no post-join dedup is needed.
    *
    * All of `rowTs`, `lo`, `hi` are numeric in the same units. Output =
    * all row columns + all interval columns (caller keeps names
    * disjoint apart from `keys`).
    */
  def intervalJoin(
      rows: DataFrame,
      rowTs: String,
      intervals: DataFrame,
      lo: String,
      hi: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val rPrep = rows.withColumn("__bucket",
      floor(col(rowTs).cast("double") / bucketWidth).cast("long"))
    // degenerate intervals (hi <= lo, i.e. empty [lo, hi)) are dropped
    // up front: `sequence` would grid them DESCENDING (wasted explode
    // work for candidates the exact predicate then prunes)
    val iPrep = intervals
      .filter(col(lo) < col(hi))
      .withColumn("__bucket",
        explode(sequence(
          floor(col(lo).cast("double") / bucketWidth).cast("long"),
          floor(col(hi).cast("double") / bucketWidth).cast("long"))))
    rPrep.join(iPrep, keys :+ "__bucket")
      .filter(col(rowTs) >= col(lo) && col(rowTs) < col(hi))
      .drop("__bucket")
  }

  /** LOCF resampling: lay a regular time grid over each key's observed
    * span and carry the last observation forward onto every grid point
    * (pandas `resample().ffill()`; TimescaleDB `time_bucket_gapfill` +
    * `locf`). Grid points are the multiples of `step` inside
    * `[min(ts), max(ts)]` per key — the first grid point is the
    * smallest multiple ≥ the key's first observation, so every point
    * has a backward match and the output carries no nulls. Keys whose
    * span contains no multiple of `step` produce no rows.
    *
    * Output: `keys ++ (ts at grid points) ++ prefix+valueCols` (the
    * carried values) + `prefix+ts` (the matched observation time).
    * Built as bounds-aggregate → `sequence` explode → [[asofJoin]], so
    * the cost is one small per-key aggregate plus the single-exchange
    * as-of; per-key expansion is span/step rows — pick `step`
    * accordingly. Observation-time ties resolve like [[asofJoin]]
    * (lexicographic max payload); pre-dedup for a fixed contract.
    */
  def resampleLocf(
      df: DataFrame,
      keys: Seq[String],
      ts: String,
      valueCols: Seq[String],
      step: Long,
      prefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "resampleLocf needs at least one key")
    require(step > 0, "step must be positive")
    require(valueCols.nonEmpty, "resampleLocf needs value columns")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(min(col(ts)).as("__lo"), max(col(ts)).as("__hi"))
    // smallest multiple of step ≥ lo; largest multiple ≤ hi (exact
    // integer arithmetic via pmod — no double floor)
    val gStart = col("__lo") + pmod(lit(step) - pmod(col("__lo"), lit(step)),
      lit(step))
    val gEnd = col("__hi") - pmod(col("__hi"), lit(step))
    val grid = bounds
      .filter(gStart <= gEnd)
      .select(keys.map(col) :+
        explode(sequence(gStart, gEnd, lit(step))).as(ts): _*)
    asofJoin(grid, df.select((keys :+ ts).map(col) ++ valueCols.map(col): _*),
      keys, ts, ts, valueCols, Backward, prefix = prefix)
  }

  /** Linear trailing-window sum/count: for every row, the sum and
    * count of `valueCol` over `[ts - window, ts]` (peer-inclusive,
    * RANGE semantics) per key — computed as prefix aggregates minus an
    * as-of lookup instead of a sliding RANGE frame.
    *
    * Why not `rangeBetween(-window, 0)` directly: Spark's sliding
    * window frame has NO aggregate retraction — every time the lower
    * bound moves it re-aggregates the rows still in frame, so a key's
    * cost is O(rows × rows-per-frame) in ONE task. Measured on a
    * 1.3M-row hot key with ~4.6k-row frames: the RANGE-frame plan ran
    * 25+ minutes single-threaded before being killed (TemporalStress
    * hot axis); this formulation is three linear passes: an EXPANDING
    * RANGE frame (incremental in Spark — no retraction needed), a
    * per-(key, ts) projection of the prefix table, and the
    * single-exchange [[asofJoin]] fetching the prefix just BEFORE the
    * window start (`ts - window - 1`, so the subtraction leaves
    * exactly `[ts - window, ts]`). Integer timestamps required.
    *
    * Adds `sumCol` and `cntCol` to the input columns. Use the plain
    * RANGE frame for small per-key row counts; use this once keys can
    * hold thousands of in-frame rows.
    */
  def rollingSumLinear(
      df: DataFrame,
      keys: Seq[String],
      ts: String,
      valueCol: String,
      window: Long,
      sumCol: String = "rolling_sum",
      cntCol: String = "rolling_cnt"): DataFrame = {
    require(keys.nonEmpty, "rollingSumLinear needs at least one key")
    require(window >= 0, "window must be non-negative")
    // expanding RANGE frame: peer rows (equal ts) share the same
    // prefix, and Spark evaluates it incrementally — one linear pass
    val wCum = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = df
      .withColumn("__cs", sum(col(valueCol)).over(wCum))
      .withColumn("__cn", count(lit(1)).over(wCum))
    // peers carry identical prefixes → one row per (key, ts)
    val prefixes = withCum
      .groupBy((keys :+ ts).map(col): _*)
      .agg(max(col("__cs")).as("__ps"), max(col("__cn")).as("__pn"))
    val probed = asofJoin(
      withCum.withColumn("__target", col(ts) - window - 1),
      prefixes, keys,
      leftTs = "__target", rightTs = ts,
      rightPayload = Seq("__ps", "__pn"),
      leftOuter = true, prefix = "__b_")
    probed
      .withColumn(sumCol, col("__cs") - coalesce(col("__b___ps"), lit(0)))
      .withColumn(cntCol, col("__cn") - coalesce(col("__b___pn"), lit(0L)))
      .drop("__cs", "__cn", "__target", s"__b_$ts", "__b___ps", "__b___pn")
  }

  /** Gap sessionization: assign each row a per-key `session_id`
    * (1-based, in time order) that increments whenever the gap from the
    * previous row exceeds `gap` (same units as the numeric `ts`).
    * Rows with equal (keys, ts) always share a session, whatever their
    * sort order, so downstream per-session aggregates are
    * deterministic. One exchange + sort on `keys`.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      ts: String,
      gap: Long,
      sessionCol: String = "session_id"): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key")
    require(gap >= 0, "gap must be non-negative")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts).asc)
    val newSession = when(
      col(ts).cast("double") -
        lag(col(ts), 1).over(w).cast("double") > gap.toDouble, 1L)
      .otherwise(when(lag(col(ts), 1).over(w).isNull, 1L).otherwise(0L))
    df.withColumn("__ns", newSession)
      .withColumn(sessionCol,
        sum(col("__ns")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__ns")
  }
}
