package graft.queries

import org.apache.spark.sql.functions._
import graft.core._
import Q._

/** M0 core surface: cut algebra (F1-F12), derived features (D1-D4),
  * sampling/limits (L2-L3). Each query exercises the library operator
  * (not a hand-inlined expression) and has an exact DuckDB oracle. */
object CoreQueries {

  val queries: Map[String, QFn] = Map(
    // F1: expression filter through the unified cut input (Sql form)
    "f1_filter_expr" -> ((s, dir) =>
      EventTable(events(s, dir))
        .filter(Cut.Sql("value > 400 AND event_type = 'click'"))
        .select(col("event_id"), col("value"))
        .orderBy("event_id")),

    // F3/F4: register a named boolean cut column, then filter by name
    "f3_named_cut" -> ((s, dir) =>
      EventTable(events(s, dir))
        .registerCut("cut_high", Cut.Pred(col("value") > 450))
        .filter(Cut.Named("cut_high"))
        .select(col("event_id"), col("value"))
        .orderBy("event_id")),

    // F4: cut registration materializes a full-length boolean column
    "f4_cut_registration" -> ((s, dir) =>
      EventTable(events(s, dir))
        .registerCut("c_hi", Cut.Pred(col("value") > 300))
        .full.select(col("event_id"), col("c_hi"))
        .orderBy("event_id")),

    // F2/J1: mask as a key set, applied as broadcast left-semi join
    "f2_mask_semijoin" -> ((s, dir) => {
      val ev = events(s, dir)
      val keys = ev.filter(col("event_type") === "error" && col("value") > 440)
        .select(col("event_id"))
      EventTable(ev)
        .filter(Cut.KeyTable(keys, "event_id"))
        .select(col("event_id"))
        .orderBy("event_id")
    }),

    // F5: rectangular box cut
    "f5_box_cut" -> ((s, dir) =>
      EventTable(events(s, dir))
        .filter(Cut.box(Seq(("value", 100.0, 200.0), ("user_id", 10.0, 40.0))))
        .select(col("event_id"))
        .orderBy("event_id")),

    // F6: combine registered cuts with and/xor/subtract
    "f6_combine_cuts" -> ((s, dir) =>
      EventTable(events(s, dir))
        .registerCut("c1", Cut.Pred(col("value") > 250))
        .registerCut("c2", Cut.Pred(col("event_type").isin("click", "view")))
        .combineCuts("c_and", Seq("c1", "c2"), CombineMode.And)
        .combineCuts("c_xor", Seq("c1", "c2"), CombineMode.Xor)
        .combineCuts("c_sub", Seq("c1", "c2"), CombineMode.Subtract)
        .full.select(col("event_id"), col("c_and"), col("c_xor"), col("c_sub"))
        .orderBy("event_id")),

    // F7: global filter (replace, then AND-composed refinement)
    "f7_global_filter" -> ((s, dir) =>
      EventTable(events(s, dir))
        .applyGlobalFilter(Cut.Pred(tsUs < 1704931200000000L))
        .applyGlobalFilter(Cut.Pred(col("value") <= 450), CombineMode.And)
        .view.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // F10: trigger-class predicate (randoms/triggers analogue)
    "f10_trigger_class" -> ((s, dir) =>
      EventTable(events(s, dir))
        .filter(Cut.Pred(col("event_type").isin("view", "click")))
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // F11: every-Nth-event stride downsample
    "f11_stride" -> ((s, dir) =>
      events(s, dir).filter(col("event_id") % 10 === 0)
        .agg(count(lit(1)).as("cnt"),
          min("event_id").as("mn"), max("event_id").as("mx"))),

    // F12/D3/D4: versioned plugin registry applying a polyval cut and a
    // difference feature (slope analogue)
    "f12_plugin_cuts" -> ((s, dir) => {
      val reg = PluginRegistry(
        Plugin.feature("slope", 1.0, "graft")(df =>
          col("value") - col("user_id")),
        Plugin.cut("cut_chi2poly", 2.0, "graft")(df =>
          PluginRegistry.polyval(Seq(0.5, 3.0, 2.0), col("value"))
            > col("value") * col("value"))
      )
      reg.applyAll(EventTable(events(s, dir)))
        .filter(Cut.Named("cut_chi2poly"))
        .select(col("event_id"), col("slope"))
        .orderBy("event_id")
    }),

    // D1: lazy virtual column
    "d1_virtual_column" -> ((s, dir) =>
      EventTable(events(s, dir))
        .addFeatureSql("value_x2", "value * 2")
        .view.select(col("event_id"), col("value_x2"))
        .orderBy("event_id")),

    // D2: difference RQ (delta-chi2 / slope shape)
    "d2_diff_feature" -> ((s, dir) =>
      EventTable(events(s, dir))
        .addFeature("diff", col("value") - col("user_id"))
        .view.select(col("event_id"), col("diff"))
        .orderBy("event_id")),

    // D3: Horner polynomial evaluation (np.polyval)
    "d3_polyval" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          PluginRegistry.polyval(Seq(0.5, 3.0, 2.0), col("value"))
            .as("chi2_model"))
        .orderBy("event_id")),

    // F9: column drop + overwrite (withColumn replace semantics)
    "f9_drop_overwrite" -> ((s, dir) =>
      EventTable(events(s, dir))
        .dropColumns("props", "user_id")
        .addFeature("value", col("value") * 2)
        .view.select(col("event_id"), col("value"))
        .orderBy("event_id")),

    // L2: deterministic limit
    "l2_limit" -> ((s, dir) =>
      events(s, dir).select(col("event_id"), col("value"))
        .orderBy("event_id").limit(100)),

    // L3: deterministic hash-stride sample (seeded rand sampling exists in
    // the API; the oracle-checkable form is modular)
    "l3_sample_hash" -> ((s, dir) =>
      events(s, dir).filter(col("event_id") % 97 === 0)
        .select(col("event_id"), col("value"))
        .orderBy("event_id")),

    // S3/L1: file/series glob pruning over a deterministic synthetic
    // listing (one name per distinct user), exercising the series
    // substring + parity-prefix selection and the sorted-distinct load
    // order. Driver-side over the listing, like the reference — the
    // file list is metadata-scale even at 100 TB.
    "s3_file_pruning" -> ((s, dir) => {
      val users = events(s, dir).select(col("user_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val names = users.map { u =>
        val par = if (u % 2 == 0) "even" else "odd"
        s"${par}_series_${u}_dump.parquet"
      }
      val pruned = EventTable.pruneFiles(
        names, series = Seq("series_1"), parity = Some("even"))
      import s.implicits._
      pruned.toDF("fname").orderBy("fname")
    }),

    // S8: reload/reset — two independent loads of the same path must be
    // identical INCLUDING the derived positional event_uid (the
    // reference's __event_index__). The scale-shaped witness: an
    // order-independent row-checksum aggregate per load (ONE map-only
    // pass each, no shuffle — the full-row exceptAll mirror shuffles
    // the table twice and is kept as the exact check in IngestSpec).
    // pmod keeps addends < 1e9 so the ANSI long sum cannot overflow.
    "s8_reload_consistency" -> ((s, dir) => {
      val p = s"$dir/events.parquet"
      def loadSig(): (Long, Long) = {
        val df = EventTable.load(s, Seq(p)).full
        val r = df.agg(
          sum(pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
            lit(1000000007L))).as("cks"),
          count(lit(1)).as("n")).head()
        df.unpersist()
        (r.getLong(0), r.getLong(1))
      }
      val (c1, n1) = loadSig()
      val (c2, n2) = loadSig()
      val diff = if (c1 == c2 && n1 == n2) 0L else 1L
      import s.implicits._
      Seq((diff, n1)).toDF("diff_count", "n")
    }),

    // L5: log-spaced downsample indices for an axis of length n =
    // count(events); driver-side plot-index preparation, oracle
    // replicates the exact exp/ln grid arithmetic.
    "l5_log_downsample" -> ((s, dir) => {
      val n = events(s, dir).count().toInt
      val idx = graft.stats.Sampling.logDownsampleIndices(n, points = 256)
      import s.implicits._
      idx.toSeq.map(_.toLong).toDF("idx").orderBy("idx")
    })
  )

  val oracle: Map[String, String] = Map(
    "f1_filter_expr" ->
      "SELECT event_id, value FROM events WHERE value > 400 AND event_type = 'click' ORDER BY event_id",
    "f3_named_cut" ->
      "SELECT event_id, value FROM events WHERE value > 450 ORDER BY event_id",
    "f4_cut_registration" ->
      "SELECT event_id, value > 300 AS c_hi FROM events ORDER BY event_id",
    "f2_mask_semijoin" ->
      "SELECT event_id FROM events WHERE event_id IN (SELECT event_id FROM events WHERE event_type = 'error' AND value > 440) ORDER BY event_id",
    "f5_box_cut" ->
      "SELECT event_id FROM events WHERE value >= 100.0 AND value <= 200.0 AND user_id >= 10.0 AND user_id <= 40.0 ORDER BY event_id",
    "f6_combine_cuts" ->
      "SELECT event_id, (value > 250) AND (event_type IN ('click','view')) AS c_and, (value > 250) <> (event_type IN ('click','view')) AS c_xor, (value > 250) AND NOT (event_type IN ('click','view')) AS c_sub FROM events ORDER BY event_id",
    "f7_global_filter" ->
      "SELECT event_type, count(*) AS cnt FROM events WHERE epoch_us(ts) < 1704931200000000 AND value <= 450 GROUP BY event_type ORDER BY event_type",
    "f10_trigger_class" ->
      "SELECT event_type, count(*) AS cnt FROM events WHERE event_type IN ('view','click') GROUP BY event_type ORDER BY event_type",
    "f11_stride" ->
      "SELECT count(*) AS cnt, min(event_id) AS mn, max(event_id) AS mx FROM events WHERE event_id % 10 = 0",
    "f12_plugin_cuts" ->
      "SELECT event_id, value - user_id AS slope FROM events WHERE ((0.5*value + 3.0)*value + 2.0) > value*value ORDER BY event_id",
    "d1_virtual_column" ->
      "SELECT event_id, value * 2 AS value_x2 FROM events ORDER BY event_id",
    "d2_diff_feature" ->
      "SELECT event_id, value - user_id AS diff FROM events ORDER BY event_id",
    "d3_polyval" ->
      "SELECT event_id, (0.5*value + 3.0)*value + 2.0 AS chi2_model FROM events ORDER BY event_id",
    "f9_drop_overwrite" ->
      "SELECT event_id, value * 2 AS value FROM events ORDER BY event_id",
    "l2_limit" ->
      "SELECT event_id, value FROM events ORDER BY event_id LIMIT 100",
    "l3_sample_hash" ->
      "SELECT event_id, value FROM events WHERE event_id % 97 = 0 ORDER BY event_id",
    "s3_file_pruning" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |n AS (SELECT (CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END)
        |  || '_series_' || CAST(user_id AS VARCHAR) || '_dump.parquet' AS fname FROM u)
        |SELECT fname FROM n
        |WHERE fname LIKE '%series_1%' AND fname LIKE 'even\_%' ESCAPE '\'
        |ORDER BY fname""".stripMargin,
    "s8_reload_consistency" ->
      "SELECT CAST(0 AS BIGINT) AS diff_count, count(*) AS n FROM events",
    "l5_log_downsample" ->
      """WITH c AS (SELECT count(*) AS n FROM events),
        |raw AS (SELECT LEAST(n - 1,
        |    CAST(floor(exp((i / 255.0) * ln(n))) AS BIGINT) - 1
        |    + CASE WHEN i = 0 THEN 1 ELSE 0 END) AS idx
        |  FROM generate_series(0, 255) AS t(i), c),
        |allidx AS (SELECT CAST(0 AS BIGINT) AS idx UNION SELECT idx FROM raw)
        |SELECT DISTINCT idx FROM allidx ORDER BY idx""".stripMargin
  )
}
