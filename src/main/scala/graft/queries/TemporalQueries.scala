package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Temporal
import Q._

/** Temporal operator surface (engine extensions — the reference has no
  * join-shaped temporal ops; see `core/Temporal.scala` for the
  * single-exchange designs). Event times are integer microseconds
  * (`Q.tsUs`); money sums go through exact integer cents.
  *
  * Determinism notes:
  *   - asof right side is pre-deduped on (user_id, us) with
  *     min(event_id), so the closest-match row is fully specified in
  *     both engines (DuckDB ASOF JOIN picks an arbitrary row among
  *     exact ts ties otherwise);
  *   - session ids are 1-based in time order; rows with equal
  *     (user_id, us) share a session whatever the tie order, so the
  *     per-session aggregates are stable.
  */
object TemporalQueries {

  private val usPerDay = 86400000000L

  val queries: Map[String, QFn] = Map(
    // as-of join: each purchase ⇒ most recent click at-or-before it,
    // per user. Union-tag + running last(): ONE hash exchange on
    // user_id, no per-key pair list (`core/Temporal.asofJoin`).
    "asof_join_clicks" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("us", tsUs)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "us").agg(min("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      Temporal.asofJoin(purchases, clicks, Seq("user_id"),
          leftTs = "us", rightTs = "us", rightPayload = Seq("click_id"),
          prefix = "c_")
        .select(col("event_id"), col("user_id"), col("us").as("pts"),
          col("c_us").as("click_us"), col("c_click_id").as("click_id"))
        .orderBy("event_id")
    }),

    // same contract, broadcast physical strategy: right side grouped +
    // broadcast, left side crosses zero exchanges (the 100 TB-fact
    // plan). Same oracle as the windowed form — one semantics, two
    // physical strategies, both gated.
    "asof_join_bcast" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("us", tsUs)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "us").agg(min("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      Temporal.asofJoinBroadcast(purchases, clicks, Seq("user_id"),
          leftTs = "us", rightTs = "us", rightPayload = Seq("click_id"),
          prefix = "c_")
        .select(col("event_id"), col("user_id"), col("us").as("pts"),
          col("c_us").as("click_us"), col("c_click_id").as("click_id"))
        .orderBy("event_id")
    }),

    // interval join: purchases inside [signup, signup + 7 days) per
    // user, aggregated per signup. Intervals grid onto 1-day buckets →
    // bucket equi-join + exact range predicate, never a cross product.
    "interval_join_signup" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("us", tsUs)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("us").as("lo"), (col("us") + lit(7 * usPerDay)).as("hi"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), col("value"))
      Temporal.intervalJoin(purchases, "us", signups, "lo", "hi",
          bucketWidth = usPerDay, keys = Seq("user_id"))
        .groupBy("signup_id")
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("value"))).cast("double") / 100.0)
            .as("sum_value"))
        .orderBy("signup_id")
    }),

    // LOCF resampling: each user's value carried forward onto a daily
    // grid over their observed span (bounds agg → sequence explode →
    // the single-exchange as-of); observation ties pre-deduped to
    // max(value) in both engines
    "resample_locf" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), tsUs.as("us"), col("value"))
        .groupBy("user_id", "us").agg(max("value").as("value"))
      Temporal.resampleLocf(ev, Seq("user_id"), "us", Seq("value"),
          step = usPerDay)
        .select(col("user_id"), col("us"), col("r_us").as("obs_us"),
          col("r_value").as("value_locf"))
        .orderBy("user_id", "us")
    }),

    // trailing 7-day rolling aggregates per user. Runs the LINEAR
    // prefix+as-of formulation (Temporal.rollingSumLinear), not the
    // sliding RANGE frame: Spark re-aggregates a sliding frame on
    // every lower-bound move (no retraction), which is O(rows × frame)
    // per key — measured 25+ min single-threaded on a 1.3M-row hot
    // key. Equivalence with the RANGE frame is spec-pinned
    // (TemporalSpec); the oracle mirrors the frame semantics directly.
    // Sums in exact integer cents so float order can't perturb hashes.
    "rolling_7d_user" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), tsUs.as("us"),
          cents(col("value")).as("vc"))
      Temporal.rollingSumLinear(ev, Seq("user_id"), "us", "vc",
          window = 7 * usPerDay,
          sumCol = "sum_7d_cents", cntCol = "n_7d")
        .select(col("event_id"), col("user_id"), col("us"),
          col("n_7d"), col("sum_7d_cents"))
        .orderBy("event_id")
    }),

    // trailing 7-day rolling min/max per user. Runs the LINEAR block
    // decomposition (Temporal.rollingMinMaxLinear) — min/max has no
    // prefix-difference form, and the sliding RANGE frame is the same
    // measured retraction hazard as the sum case. Equivalence with the
    // RANGE frame is spec-pinned (TemporalSpec); the oracle mirrors
    // the frame directly. Exact integer cents.
    "rolling_7d_minmax" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), tsUs.as("us"),
          cents(col("value")).as("vc"))
      Temporal.rollingMinMaxLinear(ev, Seq("user_id"), "us", "vc",
          window = 7 * usPerDay,
          minCol = "min_7d_cents", maxCol = "max_7d_cents")
        .select(col("event_id"), col("user_id"), col("us"),
          col("min_7d_cents"), col("max_7d_cents"))
        .orderBy("event_id")
    }),

    // same result as interval_join_signup, via the AGGREGATING
    // interval join: interior buckets fold pre-aggregated (never
    // materializing row-level candidates), only the ≤2 boundary
    // buckets per signup join row-level. Same oracle — one semantics,
    // two physical strategies, both gated.
    "interval_join_agg" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("us", tsUs)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("us").as("lo"), (col("us") + lit(7 * usPerDay)).as("hi"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), cents(col("value")).as("vc"))
      Temporal.intervalJoinAgg(purchases, "us", Seq("vc"), signups,
          "lo", "hi", bucketWidth = usPerDay, keys = Seq("user_id"))
        .select(col("signup_id"), col("n"),
          (col("sum_vc").cast("double") / 100.0).as("sum_value"))
        .orderBy("signup_id")
    }),

    // gap sessionization: 12-hour-gap sessions per user → per-session
    // event count, start, duration. One exchange + sort on user_id.
    "sessionize_gap" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), tsUs.as("us"))
      Temporal.sessionize(ev, Seq("user_id"), "us", gap = 12L * 3600000000L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min("us").as("start_us"),
          (max("us") - min("us")).as("dur_us"))
        .orderBy("user_id", "session_id")
    }),

    // funnel analysis: earliest signup → click → purchase chain within
    // 7 days of the first signup, per user (nested-min semantics; see
    // Temporal.funnel). Prune → one exchange → streaming automaton.
    "funnel_signup_purchase" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), tsUs.as("us"), col("event_type"))
      Temporal.funnel(ev, "user_id", col("us"), "event_type",
          Seq("signup", "click", "purchase"), withinUs = 604800000000L)
        .orderBy("user_id")
    }),

    // cohort conversion: the funnel rolled up by signup week — the
    // reporting shape every funnel feeds (per-cohort entered /
    // mid-stage / completed counts). Same operator, one extra
    // KB-scale aggregation on its bounded output.
    "funnel_cohorts" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), tsUs.as("us"), col("event_type"))
      Temporal.funnel(ev, "user_id", col("us"), "event_type",
          Seq("signup", "click", "purchase"), withinUs = 604800000000L)
        .filter(col("stages") >= 1)
        .withColumn("cohort_week", expr("t_first div 604800000000"))
        .groupBy("cohort_week")
        .agg(count(lit(1)).as("n_entered"),
          sum(when(col("stages") >= 2, 1L).otherwise(0L)).as("n_stage2"),
          sum(when(col("completed"), 1L).otherwise(0L)).as("n_completed"))
        .orderBy("cohort_week")
    }),

    // funnel drop-off (r09): per-step entered / converted / rate /
    // exact-median time-to-next — the third member of the funnel
    // reporting family (per-user rows → ≤k-way stage explode → one
    // KB-scale aggregate)
    "funnel_dropoff" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), tsUs.as("us"), col("event_type"))
      Temporal.funnelDropoff(ev, "user_id", col("us"), "event_type",
        Seq("signup", "click", "purchase"), withinUs = 604800000000L)
    }),

    // cohort retention: users active in week cohort+k, per signup-week
    // cohort — the other half of the product-analytics pair with the
    // funnel. Shape: two aggregates (cohort dim = one row per signed-up
    // user; activity = distinct (user, week) — both ONE exchange) and
    // a user-keyed join; the cohort dim broadcasts while users fit an
    // executor and degrades to a co-partitioned shuffle join beyond.
    "retention_cohorts" -> ((s, dir) => {
      val weekUs = 604800000000L
      val ev = events(s, dir)
        .select(col("user_id"), tsUs.as("us"), col("event_type"))
        .withColumn("w", expr(s"us div $weekUs"))
      val cohorts = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("w").as("cohort_week"))
      val activity = ev.select(col("user_id"), col("w")).distinct()
      activity.join(cohorts, "user_id")
        .filter(col("w") >= col("cohort_week"))
        .groupBy(col("cohort_week"),
          (col("w") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_week", "week_offset")
    }))

  val oracle: Map[String, String] = Map(
    // nested-min mirror of the funnel automaton: t1 = earliest signup,
    // t2 = earliest later click within the window, t3 = earliest
    // later purchase within the window of t1
    "funnel_signup_purchase" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS s FROM events
        |  WHERE event_type IN ('signup', 'click', 'purchase') AND ts IS NOT NULL),
        |u1 AS (SELECT u, min(t) AS t1 FROM e WHERE s = 'signup' GROUP BY u),
        |u2 AS (SELECT e.u, min(t) AS t2, any_value(t1) AS t1b FROM e JOIN u1 USING (u)
        |  WHERE s = 'click' AND t > t1 AND t <= t1 + 604800000000 GROUP BY e.u),
        |u3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN u2 USING (u)
        |  WHERE s = 'purchase' AND t > t2 AND t <= t1b + 604800000000 GROUP BY e.u),
        |allu AS (SELECT DISTINCT u FROM e)
        |SELECT a.u AS user_id,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stages,
        |  t1 AS t_first, coalesce(t3, t2, t1) AS t_last,
        |  t3 IS NOT NULL AS completed
        |FROM allu a
        |LEFT JOIN u1 ON u1.u = a.u
        |LEFT JOIN u2 ON u2.u = a.u
        |LEFT JOIN u3 ON u3.u = a.u
        |ORDER BY user_id""".stripMargin,
    "funnel_cohorts" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS s FROM events
        |  WHERE event_type IN ('signup', 'click', 'purchase') AND ts IS NOT NULL),
        |u1 AS (SELECT u, min(t) AS t1 FROM e WHERE s = 'signup' GROUP BY u),
        |u2 AS (SELECT e.u, min(t) AS t2, any_value(t1) AS t1b FROM e JOIN u1 USING (u)
        |  WHERE s = 'click' AND t > t1 AND t <= t1 + 604800000000 GROUP BY e.u),
        |u3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN u2 USING (u)
        |  WHERE s = 'purchase' AND t > t2 AND t <= t1b + 604800000000 GROUP BY e.u)
        |SELECT t1 // 604800000000 AS cohort_week,
        |  count(*) AS n_entered,
        |  CAST(sum(CASE WHEN u2.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_stage2,
        |  CAST(sum(CASE WHEN u3.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_completed
        |FROM u1
        |LEFT JOIN u2 ON u2.u = u1.u
        |LEFT JOIN u3 ON u3.u = u1.u
        |GROUP BY cohort_week ORDER BY cohort_week""".stripMargin,
    // drop-off mirror: the nested-min CTE chain extended to carry each
    // stage's predecessor time, then three per-stage aggregate rows;
    // median = quantile_cont ≡ Spark's exact percentile (A4 contract)
    "funnel_dropoff" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS s FROM events
        |  WHERE event_type IN ('signup', 'click', 'purchase') AND ts IS NOT NULL),
        |u1 AS (SELECT u, min(t) AS t1 FROM e WHERE s = 'signup' GROUP BY u),
        |u2 AS (SELECT e.u, min(t) AS t2, any_value(t1) AS t1b FROM e JOIN u1 USING (u)
        |  WHERE s = 'click' AND t > t1 AND t <= t1 + 604800000000 GROUP BY e.u),
        |u3 AS (SELECT e.u, min(t) AS t3, any_value(t2) AS t2b FROM e JOIN u2 USING (u)
        |  WHERE s = 'purchase' AND t > t2 AND t <= t1b + 604800000000 GROUP BY e.u)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS step,
        |    (SELECT count(*) FROM u1) AS n_entered,
        |    (SELECT count(*) FROM u2) AS n_converted,
        |    CAST((SELECT count(*) FROM u2) AS DOUBLE) / (SELECT count(*) FROM u1) AS conversion_rate,
        |    (SELECT quantile_cont(t2 - t1b, 0.5) FROM u2) AS median_us_to_next
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'click',
        |    (SELECT count(*) FROM u2),
        |    (SELECT count(*) FROM u3),
        |    CAST((SELECT count(*) FROM u3) AS DOUBLE) / (SELECT count(*) FROM u2),
        |    (SELECT quantile_cont(t3 - t2b, 0.5) FROM u3)
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase',
        |    (SELECT count(*) FROM u3),
        |    CAST(0 AS BIGINT),
        |    0.0,
        |    NULL
        |) ORDER BY stage""".stripMargin,
    "retention_cohorts" ->
      """WITH s AS (SELECT user_id AS u, min(epoch_us(ts) // 604800000000) AS cw
        |  FROM events WHERE event_type = 'signup' GROUP BY u),
        |a AS (SELECT DISTINCT user_id AS u, epoch_us(ts) // 604800000000 AS w FROM events)
        |SELECT s.cw AS cohort_week, a.w - s.cw AS week_offset,
        |  count(DISTINCT s.u) AS n_active
        |FROM s JOIN a ON a.u = s.u WHERE a.w >= s.cw
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "asof_join_clicks" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |c AS (SELECT user_id, us, min(event_id) AS click_id FROM e WHERE event_type = 'click' GROUP BY user_id, us),
        |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.us AS pts, c.us AS click_us, c.click_id
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.us >= c.us
        |ORDER BY p.event_id""".stripMargin,
    "asof_join_bcast" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |c AS (SELECT user_id, us, min(event_id) AS click_id FROM e WHERE event_type = 'click' GROUP BY user_id, us),
        |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.us AS pts, c.us AS click_us, c.click_id
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.us >= c.us
        |ORDER BY p.event_id""".stripMargin,
    "interval_join_signup" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
        |s AS (SELECT event_id AS signup_id, user_id, us AS lo, us + 604800000000 AS hi FROM e WHERE event_type = 'signup'),
        |p AS (SELECT user_id, us, value FROM e WHERE event_type = 'purchase')
        |SELECT s.signup_id, count(*) AS n, CAST(sum(CAST(round(p.value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM p JOIN s ON p.user_id = s.user_id AND p.us >= s.lo AND p.us < s.hi
        |GROUP BY s.signup_id ORDER BY s.signup_id""".stripMargin,
    "resample_locf" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |d AS (SELECT user_id, us, max(value) AS value FROM e GROUP BY user_id, us),
        |b AS (SELECT user_id, min(us) AS lo, max(us) AS hi FROM d GROUP BY user_id),
        |g AS (SELECT user_id, unnest(generate_series(lo + (86400000000 - lo % 86400000000) % 86400000000, hi - hi % 86400000000, 86400000000)) AS us FROM b)
        |SELECT g.user_id, g.us, d.us AS obs_us, d.value AS value_locf
        |FROM g ASOF JOIN d ON g.user_id = d.user_id AND g.us >= d.us
        |ORDER BY g.user_id, g.us""".stripMargin,
    "rolling_7d_user" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, CAST(round(value*100) AS BIGINT) AS vc FROM events)
        |SELECT event_id, user_id, us, count(*) OVER w AS n_7d, CAST(sum(vc) OVER w AS BIGINT) AS sum_7d_cents
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "rolling_7d_minmax" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, CAST(round(value*100) AS BIGINT) AS vc FROM events)
        |SELECT event_id, user_id, us, min(vc) OVER w AS min_7d_cents, max(vc) OVER w AS max_7d_cents
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "interval_join_agg" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
        |s AS (SELECT event_id AS signup_id, user_id, us AS lo, us + 604800000000 AS hi FROM e WHERE event_type = 'signup'),
        |p AS (SELECT user_id, us, value FROM e WHERE event_type = 'purchase')
        |SELECT s.signup_id, count(*) AS n, CAST(sum(CAST(round(p.value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM p JOIN s ON p.user_id = s.user_id AND p.us >= s.lo AND p.us < s.hi
        |GROUP BY s.signup_id ORDER BY s.signup_id""".stripMargin,
    "sessionize_gap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |l AS (SELECT user_id, us, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 43200000000 THEN 1 ELSE 0 END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sj AS (SELECT user_id, us, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM l)
        |SELECT user_id, session_id, count(*) AS n_events, min(us) AS start_us, max(us) - min(us) AS dur_us
        |FROM sj GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)
}
