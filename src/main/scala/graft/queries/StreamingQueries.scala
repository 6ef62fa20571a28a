package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamingDedup, StreamingRechunk}
import Q._

/** End-to-end Structured Streaming driver queries — the streaming
  * operators (S7 family, `streaming/`) exercised through the REAL
  * `readStream → transform → writeStream` path, not just unit tests:
  * a file stream over the same parquet tables, `Trigger.AvailableNow`
  * (process-everything-then-stop — the bounded-backfill form of an
  * unbounded ingest), a memory sink, and the accumulated result
  * returned as the query's DataFrame so the DuckDB oracle gates it
  * like every batch query.
  *
  * Determinism: `AvailableNow` over a single parquet file processes
  * all rows in one micro-batch, so first-seen-wins dedup resolves to
  * smallest-doc_id-wins (the in-batch tiebreak) — exactly the batch
  * oracle. Windowed counts are complete-mode aggregates — batch-equal
  * by construction. Both results are ORDER BY'd deterministic keys.
  *
  * At production scale the same pipelines run unbounded (no
  * AvailableNow) with the TTL'd state / watermark variants already in
  * `streaming/` — the driver queries pin the semantics the unbounded
  * form degenerates to on a bounded replay.
  */
object StreamingQueries {

  // memory-sink names must be unique per invocation (Bench runs each
  // query 6×/session); monotonically counted, never reused
  private val runSeq = new AtomicInteger(0)

  /** Run `build`'s streaming query to completion (AvailableNow) into a
    * uniquely-named memory sink and return the sink's contents.
    *
    * Shuffle partitions are dropped to 8 for the streaming execution:
    * every stateful streaming operator instantiates ONE state store per
    * shuffle partition per stateful sub-operator (a stream-stream join
    * carries four), and each pays per-batch snapshot/commit overhead
    * regardless of row count — at 32 partitions that fixed cost
    * dominated these bounded replays (stream_interval_join: 5.4 s →
    * 2.5 s at 8; window/dedup/as-of −15-30%). Per-key semantics are
    * partitioning-independent, so
    * results are unchanged (the full t2 gate re-verified). On a real
    * unbounded deployment size partitions to state VOLUME instead —
    * this override models the same tuning decision, made per query. */
  private def runToMemory(
      spark: SparkSession,
      prefix: String,
      build: String => org.apache.spark.sql.streaming.DataStreamWriter[_])
      : DataFrame = {
    val name = s"${prefix}_${runSeq.incrementAndGet()}"
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try {
      val q = build(name).start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
    spark.table(name)
  }

  val queries: Map[String, QFn] = Map(
    // streaming exact dedup, end to end: parquet file stream →
    // flatMapGroupsWithState first-seen-wins on md5(text) → append-mode
    // memory sink; survivors = min doc_id per content hash
    "stream_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      // file-stream sources accept directories or globs, not bare file
      // paths — glob the single table file (one-char class = a glob)
      val docs = s.readStream.schema(schema)
        .parquet(s"$dir/documents.parque[t]")
        .select(col("doc_id").as("docId"), col("text"))
        .as[StreamingDedup.Doc]
      val survivors = StreamingDedup.exactDedupStream(docs)
      runToMemory(s, "stream_dedup", name =>
        survivors.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select(col("docId").as("doc_id")).orderBy("doc_id")
    }),

    // streaming event-time windowed counts, end to end: parquet file
    // stream over events → 1-hour tumbling-window count per event_type
    // (complete mode — every window in the bounded replay) → memory
    // sink; win_start reported as epoch microseconds
    "stream_window_counts" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val ev = s.readStream.schema(schema)
        .parquet(s"$dir/events.parque[t]") // glob form, see above
        .withColumn("tstamp", timestamp_micros(tsUs))
      val counts = ev
        .groupBy(window(col("tstamp"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      runToMemory(s, "stream_windows", name =>
        counts.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()))
        .select(unix_micros(col("window.start")).as("win_start"),
          col("event_type"), col("cnt"))
        .orderBy("win_start", "event_type")
    }),

    // native stream-stream interval join: purchases ⋈ signups of the
    // same user within [signup, signup + 7 days), both sides file
    // streams with event-time watermarks (the state-bounding pattern;
    // the bounded replay completes in one batch regardless). Spark's
    // built-in time-bound join — no custom state needed for this shape
    "stream_interval_join" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def ev = s.readStream.schema(schema)
        .parquet(s"$dir/events.parque[t]") // glob form, see above
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id").as("su"),
          timestamp_micros(tsUs).as("sts"))
        .withWatermark("sts", "1 hour")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("pu"), timestamp_micros(tsUs).as("pts"))
        .withWatermark("pts", "1 hour")
      val joined = purchases.join(signups, expr(
        "pu = su AND pts >= sts AND pts < sts + interval 7 days"))
      runToMemory(s, "stream_ivj", name =>
        joined.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select(col("signup_id"), col("purchase_id"))
        .orderBy("signup_id", "purchase_id")
    }),

    // streaming heavy hitters: the mergeable Misra-Gries summary
    // (functions/MisraGriesTerms) as STREAMING STATE — the sketch
    // buffer serializes into the state store per group and absorbs
    // each micro-batch's partials, so an unbounded feed keeps one
    // bounded summary per key forever (the streaming twin of
    // llm_heavy_hitters' batch sketch pass). Complete mode; top-5
    // prop-tokens per event_type ranked from the sink in batch.
    // Capacity 256 exceeds the per-type token vocabulary here, so the
    // summary is EXACT and the oracle can gate counts; on a real feed
    // the MG undercount bound N/(cap+1) governs instead.
    "stream_heavy_hitters" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val ev = s.readStream.schema(schema)
        .parquet(s"$dir/events.parque[t]") // glob form, see above
      val sketches = ev.groupBy(col("event_type"))
        .agg(graft.functions.MisraGriesTerms(col("props"), 256)
          .as("sketch"))
      val ranked = runToMemory(s, "stream_hh", name =>
        sketches.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()))
        .select(col("event_type"), explode(col("sketch")).as("e"))
        .select(col("event_type"), col("e.term").as("term"),
          col("e.count").as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("cnt").desc, col("term").asc)
      ranked.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("event_type"), col("rk"), col("term"), col("cnt"))
        .orderBy("event_type", "rk")
    }),

    // streaming funnel: the Temporal.funnel automaton as keyed
    // streaming state — (stage, tFirst, tPrev) per user, three numbers,
    // independent of event volume; a row emits whenever a user's stage
    // advances (update semantics). Bounded single-batch replay ≡ batch
    // funnel exactly, so the batch nested-min oracle gates it.
    "stream_funnel" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val ev = s.readStream.schema(schema)
        .parquet(s"$dir/events.parque[t]") // glob form, see above
        .select(col("user_id").as("user"), tsUs.as("ts"),
          col("event_type").as("step"))
        .as[graft.streaming.StreamingFunnel.Ev]
      val progress = graft.streaming.StreamingFunnel.funnelStream(
        ev, Seq("signup", "click", "purchase"), withinUs = 604800000000L)
      // update mode emits one row per STAGE ADVANCE, so a multi-batch
      // replay leaves several rows per user in the sink; reduce to the
      // current funnel state (max `stages` — monotone per the automaton
      // contract) so the gate doesn't depend on the replay landing in
      // a single micro-batch (file-count / maxFilesPerTrigger layout)
      runToMemory(s, "stream_funnel", name =>
        progress.writeStream.format("memory").queryName(name)
          .outputMode("update").trigger(Trigger.AvailableNow()))
        .groupBy("user_id")
        .agg(max(struct(col("stages"), col("t_first"), col("t_last"),
          col("completed"))).as("m"))
        .select(col("user_id"), col("m.stages").as("stages"),
          col("m.t_first").as("t_first"), col("m.t_last").as("t_last"),
          col("m.completed").as("completed"))
        .orderBy("user_id")
    }),

    // streaming gap sessionization, end to end: Spark's native
    // session_window (state-merging session aggregation) over the
    // event file stream, 12-hour gap — the streaming twin of the
    // batch core/Temporal.sessionize query (complete mode: bounded
    // replay = every session final)
    "stream_sessionize" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val ev = s.readStream.schema(schema)
        .parquet(s"$dir/events.parque[t]") // glob form, see above
        .withColumn("tstamp", timestamp_micros(tsUs))
      val sessions = ev
        .groupBy(col("user_id"), session_window(col("tstamp"), "12 hours"))
        .agg(count(lit(1)).as("n_events"))
      runToMemory(s, "stream_sessions", name =>
        sessions.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    }),

    // stream-stream backward as-of enrichment: purchases enriched with
    // the latest click (value) at-or-before them per user, both sides
    // file streams through StreamingAsOf's O(1)-per-key state. On the
    // bounded single-batch replay the result equals the batch as-of
    // (equal-ts click ties resolve to max value — mirrored by the
    // oracle's pre-dedup GROUP BY)
    "stream_asof_enrich" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val ev = s.readStream.schema(schema)
        .parquet(s"$dir/events.parque[t]") // glob form, see above
        .withColumn("us", tsUs)
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("us").as("ts"),
          col("event_id").as("factId"))
        .as[graft.streaming.StreamingAsOf.Fact]
      val dims = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("key"), col("us").as("ts"), col("value"))
        .as[graft.streaming.StreamingAsOf.Dim]
      val enriched =
        graft.streaming.StreamingAsOf.asofEnrichStream(facts, dims)
      runToMemory(s, "stream_asof", name =>
        enriched.toDF().writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select(col("factId").as("event_id"),
          col("dimTs").as("click_us"), col("dimValue").as("click_val"))
        .orderBy("event_id")
    }),

    // streaming W4 re-chunk, end to end: the bounded-state
    // flatMapGroupsWithState chop (carry-over < chunkLen samples per
    // channel) over the same synthetic trace stream as w4_rechunk —
    // same oracle, byte-identical chunks (single AvailableNow batch =
    // the sorted bounded replay)
    "stream_rechunk" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val segs = s.readStream.schema(schema)
        .parquet(s"$dir/events.parque[t]")
        .filter(col("event_id") < 50)
        .select(col("event_id").as("eventIndex"),
          lit("ch1").as("channel"),
          transform(sequence(lit(0), (lit(2) + col("event_id") % 3).cast("int")),
            i => ((col("event_id") * 7 + i * 5) % 19).cast("double"))
            .as("trace"))
        .as[StreamingRechunk.TraceSeg]
      val chunks = StreamingRechunk.rechunkStream(segs, chunkLen = 7)
      runToMemory(s, "stream_rechunk", name =>
        chunks.toDF().writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select(col("chunkId").as("chunk_id"),
          aggregate(col("trace"), lit(0.0), (acc, x) => acc + x)
            .as("chunk_sum"))
        .orderBy("chunk_id")
    }),

    // streaming MinHash-LSH near-dup candidates, end to end: fused
    // map-side signatures → per-band-bucket keyed state emits a pair
    // per remembered bucket member. On the bounded single-batch replay
    // (no bucket near the cap at this sf) the emitted distinct pair
    // set equals the batch lshCandidates set — same oracle chain
    "stream_neardup_candidates" -> ((s, dir) => {
      import s.implicits._
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(s"$dir/documents.parque[t]")
        .select(col("doc_id").as("docId"), col("text"))
        .as[StreamingDedup.Doc]
      val pairs = StreamingDedup.nearDupCandidatesStream(docs)
      runToMemory(s, "stream_neardup", name =>
        pairs.toDF().writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select("ida", "idb").distinct().orderBy("ida", "idb")
    }),

    // streaming quality-gate monitor, end to end: the Gopher heuristic
    // rules (incl. the native top_token_ratio kernel) applied inside a
    // streaming pipeline, aggregated per language in complete mode —
    // integer pass/fail counts only, so the aggregate is
    // order-independent and batch-equal by construction
    "stream_quality_monitor" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(s"$dir/documents.parque[t]")
      val qm = graft.llm.TextAnalysis.gopherMetrics(docs, col("text"))
      val agg = qm.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("top_token_ratio") > 0.09, 1L).otherwise(0L))
          .as("n_repetitious"),
        sum(when(col("stopword_ratio") >= 0.04, 1L).otherwise(0L))
          .as("n_stopworded"))
      runToMemory(s, "stream_quality", name =>
        agg.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()))
        .orderBy("lang")
    }),

    // streaming sitemap frontier (r12): the DISCOVERY feed as a stream
    // — sitemap delta files (single-entry bodies, the sitemap-ping /
    // incremental-feed shape) arrive continuously, the declarative
    // parse explodes them map-only into frontier URLs, and the verdict
    // stamps against the STATIC per-host robots dim (stream-static
    // broadcast). State-free append mode, zero stream shuffle. Bounded
    // replay = one batch, so a closed-form mirror gates it
    "stream_sitemap_frontier" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val day = lpad(
        (pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0")
      val body = concat(lit("<urlset><url><loc> "),
        LlmQueries.robotsUrlCol,
        lit(" </loc><lastmod>2026-01-"), day,
        lit("</lastmod></url></urlset>"))
      val sitemaps = s.readStream.schema(schema)
        .parquet(s"$dir/documents.parque[t]")
        .select(col("doc_id"), body.as("sitemap_xml"))
      val frontier = graft.sources.Sitemap.parseSitemaps(sitemaps)
      val verdicts = graft.sources.Robots.politenessFilter(
        frontier, LlmQueries.robotsDim(s, dir), "GraftBot",
        urlCol = "loc")
      runToMemory(s, "stream_sitemap", name =>
        verdicts.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select(col("doc_id"), col("loc").as("url"), col("lastmod"),
          col("allowed"))
        .orderBy("doc_id")
    }),

    // streaming robots politeness (r11): the crawl-frontier shape — an
    // unbounded URL stream verdict-stamped map-only against the STATIC
    // per-host robots dimension (stream-static broadcast left join +
    // the codegen'd RobotsAllowed kernel; no stream shuffle, state-free
    // append mode). Bounded replay = one batch = the batch filter, so
    // the llm_robots_filter oracle gates it
    "stream_robots_filter" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val urls = s.readStream.schema(schema)
        .parquet(s"$dir/documents.parque[t]")
        .select(col("doc_id"), LlmQueries.robotsUrlCol.as("url"))
      val filtered = graft.sources.Robots.politenessFilter(
        urls, LlmQueries.robotsDim(s, dir), "GraftBot")
      runToMemory(s, "stream_robots", name =>
        filtered.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select("doc_id", "url", "allowed")
        .orderBy("doc_id")
    }),

    // streaming boilerplate removal (r12): the WET-extraction shape —
    // an unbounded page stream through the codegen'd html_main_text
    // kernel, map-only, state-free append mode, zero stream shuffle;
    // bounded replay = one batch = the batch extractor, so the
    // llm_html_main mirror gates it
    "stream_html_main" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val pages = s.readStream.schema(schema)
        .parquet(s"$dir/documents.parque[t]")
        .select(col("doc_id"),
          graft.functions.HtmlMainText(LlmQueries.htmlMainPage)
            .as("main_text"))
      runToMemory(s, "stream_html_main", name =>
        pages.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select("doc_id", "main_text")
        .orderBy("doc_id")
    }),

    // streaming C4 line+page stages (r13): the cleaning front of the
    // C4 pipeline is pure array functions over each row (filter over
    // split) — zero stream shuffle, state-free append mode; the
    // corpus-wide span dedup stays batch by design. Bounded replay =
    // one batch = the batch stages, so the pv half of the llm_c4_clean
    // mirror gates it
    "stream_c4_lines" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val pages = s.readStream.schema(schema)
        .parquet(s"$dir/documents.parque[t]")
        .select(col("doc_id"), LlmQueries.c4Page.as("text2"))
      val staged = graft.llm.C4.pageVerdict(
        graft.llm.C4.cleanLines(pages, "text2", "doc_id"),
        "text_lines", "doc_id", badWords = Seq("zorblax"))
      runToMemory(s, "stream_c4_lines", name =>
        staged.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
          col("n_sentences"), col("page_kept"),
          md5(col("text_lines")).as("lines_hash"))
        .orderBy("doc_id")
    }),

    // streaming DSIR scoring (r11): the importance-weight filter as a
    // stream — the log-ratio table is trained STATICALLY (two bounded
    // distribution aggs; the deployment shape: retrain daily, score
    // the firehose), the doc stream explodes to grams and
    // stream-static BROADCAST joins against the 4096-row table (no
    // stream shuffle by bucket — Zipf-hot buckets cost nothing),
    // per-doc update-mode integer sum. Bounded replay = one batch =
    // the batch weigher, so the llm_dsir_weights oracle gates it
    "stream_dsir_score" -> ((s, dir) => {
      val docsStatic = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
      val lr = graft.llm.Dsir.logRatios(
        docsStatic.filter(col("source") === "src0"),
        docsStatic.filter(col("source") =!= "src0"),
        "text", "doc_id", 4096)
      val docs = s.readStream.schema(docsStatic.schema)
        .parquet(s"$dir/documents.parque[t]")
        .filter(col("text").isNotNull)
        .filter(col("source") =!= "src0")
      val weights = graft.llm.Dsir.importanceWeights(
        docs, lr, "text", "doc_id", 4096)
      runToMemory(s, "stream_dsir", name =>
        weights.writeStream.format("memory").queryName(name)
          .outputMode("update").trigger(Trigger.AvailableNow()))
        .select("doc_id", "n_grams", "weight_micro")
        .orderBy("doc_id")
    }),

    // streaming LM scoring (r10): the perplexity filter as a stream —
    // model trained STATICALLY first (the reference-model deployment
    // shape), the doc stream explodes to bigrams and stream-static
    // BROADCAST joins score it (no stream shuffle by bigram — Zipf-hot
    // bigrams cost nothing), per-doc update-mode aggregation; bounded
    // replay = one batch = the batch scorer, so the llm_lm_perplexity
    // oracle gates it
    "stream_lm_score" -> ((s, dir) => {
      val docsStatic = s.read.parquet(s"$dir/documents.parquet")
      val cb = graft.llm.LanguageModel.bigramCounts(
        docsStatic, "text", "doc_id")
      val cu = cb.groupBy("w1").agg(sum("cb").as("cu"))
      val v = docsStatic
        .select(explode(graft.llm.TextAnalysis.tokens(col("text")))
          .as("__w"))
        .filter(length(col("__w")) > 0)
        .agg(countDistinct(col("__w"))).head().getLong(0)
      val docs = s.readStream.schema(docsStatic.schema)
        .parquet(s"$dir/documents.parque[t]")
      val scored = graft.llm.LanguageModel.scoreAgainstModel(
        docs, "text", "doc_id", cb, cu, v)
      runToMemory(s, "stream_lm", name =>
        scored.writeStream.format("memory").queryName(name)
          .outputMode("update").trigger(Trigger.AvailableNow()))
        .orderBy("doc_id")
    }),

    // streaming weighted sampling (r10): sequential-Poisson priorities
    // are a pure function of the id, so "the n smallest priorities
    // seen so far" is a replayable reservoir — the bounded TopKByScore
    // aggregate IS the streaming state (map-side combined, at most k
    // rows per partition cross the exchange, complete mode re-emits
    // the current sample each batch); single-batch replay equals the
    // batch weightedPriorityN selection exactly, ties and all
    "stream_weighted_sample" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val docs = s.readStream.schema(schema)
        .parquet(s"$dir/documents.parque[t]")
      val u = pmod(graft.functions.Fnv64(col("doc_id").cast("string")),
        lit(1L << 52)).cast("double")
      val agg = docs.filter(col("n_chars") > 0)
        .select((-(u / col("n_chars").cast("double"))).as("negp"),
          col("doc_id"))
        .agg(graft.functions.TopKByScore(col("negp"), col("doc_id"), 200)
          .as("top"))
      runToMemory(s, "stream_wsample", name =>
        agg.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()))
        .select(explode(col("top")).as("t"))
        .select(col("t.id").as("doc_id"))
        .orderBy("doc_id")
    }),

    // streaming WordPiece token accounting (r15): the vocabulary is
    // trained STATICALLY (the tokenizer-deployment shape — learn once,
    // score the firehose), the doc stream encodes through the greedy
    // map-only codegen kernel — zero stream shuffle, state-free append
    // mode. Bounded replay = one batch = the batch counter, so the
    // wordpiece CTE chain gates it per doc
    "stream_wordpiece_tokens" -> ((s, dir) => {
      val docsStatic = s.read.parquet(s"$dir/documents.parquet")
      val v = graft.llm.WordPiece.vocabFromMerges(
        graft.llm.WordPiece.learnMerges(docsStatic, "text", nMerges = 4))
      val docs = s.readStream.schema(docsStatic.schema)
        .parquet(s"$dir/documents.parque[t]")
      val counted = docs.select(col("doc_id"),
        coalesce(
          graft.llm.WordPiece.count(col("text"), v), lit(0L))
          .as("n_tokens"))
      runToMemory(s, "stream_wordpiece", name =>
        counted.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()))
        .orderBy("doc_id")
    }),

    // streaming T7 rate monitor, end to end: watermarked sliding-window
    // (2 h window, 1 h slide) in-range counts over the events stream —
    // complete mode emits every window of the bounded replay; each
    // event lands in exactly 2 windows
    "stream_rate_monitor" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val ev = s.readStream.schema(schema)
        .parquet(s"$dir/events.parque[t]")
        .select(timestamp_micros(tsUs).as("ts"), col("value"))
      val rates = StreamingRechunk.rateMonitor(ev,
        windowDur = "2 hours", slideDur = "1 hour", watermark = "1 hour",
        lo = 100.0, hi = 300.0)
      runToMemory(s, "stream_rates", name =>
        rates.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow()))
        .select(unix_micros(col("window.start")).as("win_start"),
          col("in_range_cnt"), col("total_cnt"))
        .orderBy("win_start")
    })
  )

  val oracle: Map[String, String] = Map(
    // single-batch bounded replay ≡ the batch LM scorer — the shared
    // perplexity mirror (one semantics, three execution shapes)
    "stream_lm_score" -> LlmQueries.lmPerplexityOracleSql,
    // stream-static broadcast verdict ≡ the batch politeness filter —
    // the shared closed-form mirror
    "stream_robots_filter" -> LlmQueries.robotsFilterOracleSql,
    // bounded replay ≡ the batch boilerplate extractor
    "stream_html_main" -> LlmQueries.htmlMainOracleSql,
    // bounded replay ≡ the batch C4 line+page stages (pv mirror)
    "stream_c4_lines" -> LlmQueries.c4LinesOracleSql,
    // bounded replay ≡ the batch wordpiece token counter — the shared
    // greedy-segmentation CTE chain, reduced to per-doc counts
    "stream_wordpiece_tokens" -> LlmQueries.wordpieceTokenCountOracleSql,
    // sitemap-delta frontier: parse + verdict closed forms per doc
    // (the llm_sitemap_ingest derivation, keyed by doc_id — single
    // entry per delta body, so no entry positions)
    "stream_sitemap_frontier" ->
      """SELECT doc_id,
        |  'https://d' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' ||
        |  CASE WHEN doc_id % 4 = 0 THEN '/private/x' || CAST(doc_id AS VARCHAR)
        |       WHEN doc_id % 4 = 1 THEN '/p/' || CAST(doc_id AS VARCHAR) || '.pdf'
        |       WHEN doc_id % 4 = 2 THEN '/p/' || CAST(doc_id AS VARCHAR)
        |       ELSE '/dl/' || CAST(doc_id AS VARCHAR) END AS url,
        |  '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    AS lastmod,
        |  CASE WHEN doc_id % 7 = 6 THEN TRUE
        |       WHEN doc_id % 7 IN (0, 2, 4) THEN doc_id % 4 IN (2, 3)
        |       ELSE doc_id % 4 <> 0 END AS allowed
        |FROM documents ORDER BY doc_id""".stripMargin,
    // single-batch bounded replay ≡ the batch DSIR weigher — the
    // shared gram/FNV/log-ratio mirror
    "stream_dsir_score" -> LlmQueries.dsirWeightsOracleSql(
      "SELECT doc_id, n_grams, weight_micro FROM w ORDER BY doc_id"),
    // streaming reservoir == the batch sequential-Poisson selection:
    // the llm_weighted_sample FNV/priority CTEs, ids only
    "stream_weighted_sample" ->
      """WITH RECURSIVE
        |ids AS (SELECT doc_id, n_chars, CAST(doc_id AS VARCHAR) AS s FROM documents),
        |hx AS (SELECT DISTINCT s FROM ids),
        |hh AS (SELECT s, hex(encode(s)) AS hs, octet_length(encode(s)) AS nb FROM hx),
        |fnv AS (
        |  SELECT s, hs, nb, 0 AS i, CAST(14695981039346656037 AS HUGEINT) AS h FROM hh
        |  UNION ALL
        |  SELECT s, hs, nb, i + 1,
        |    (xor(h, CAST((strpos('0123456789ABCDEF', substring(hs, 2*i+1, 1))-1)*16 + strpos('0123456789ABCDEF', substring(hs, 2*i+2, 1))-1 AS HUGEINT)) * 1099511628211) % 18446744073709551616
        |  FROM fnv WHERE i < nb),
        |sgn AS (SELECT s, CAST(h - CASE WHEN h >= 9223372036854775808 THEN CAST(18446744073709551616 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS hv
        |        FROM fnv WHERE i = nb),
        |pri AS (SELECT i.doc_id,
        |  CAST(((sg.hv % 4503599627370496) + 4503599627370496) % 4503599627370496 AS DOUBLE) / CAST(i.n_chars AS DOUBLE) AS p
        |  FROM ids i JOIN sgn sg ON sg.s = i.s WHERE i.n_chars > 0)
        |SELECT doc_id FROM
        |  (SELECT doc_id FROM pri ORDER BY p, doc_id LIMIT 200)
        |ORDER BY doc_id""".stripMargin,
    // single-batch bounded replay ≡ batch Temporal.funnel — same
    // nested-min mirror as funnel_signup_purchase
    "stream_funnel" ->
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
    // capacity (256) > per-type token vocabulary → the streaming MG
    // summary is exact, so plain count ranking mirrors it
    "stream_heavy_hitters" ->
      """WITH toks AS (SELECT event_type,
        |    unnest(regexp_split_to_array(trim(props), '\s+')) AS term
        |  FROM events),
        |c AS (SELECT event_type, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
        |r AS (SELECT event_type, term, cnt, row_number() OVER
        |    (PARTITION BY event_type ORDER BY cnt DESC, term) AS rk FROM c)
        |SELECT event_type, rk, term, cnt FROM r WHERE rk <= 5
        |ORDER BY event_type, rk""".stripMargin,
    // single-batch first-seen-wins = smallest doc_id per hash group
    "stream_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id FROM documents
        |GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "stream_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |s AS (SELECT event_id AS signup_id, user_id, us FROM e WHERE event_type = 'signup'),
        |p AS (SELECT event_id AS purchase_id, user_id, us FROM e WHERE event_type = 'purchase')
        |SELECT s.signup_id, p.purchase_id
        |FROM p JOIN s ON p.user_id = s.user_id AND p.us >= s.us AND p.us < s.us + 604800000000
        |ORDER BY signup_id, purchase_id""".stripMargin,
    // single-batch bounded replay ≡ batch backward as-of; ties on
    // (user, click ts) pre-deduped to max(value) in both engines
    "stream_asof_enrich" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
        |c AS (SELECT user_id, us, max(value) AS click_val FROM e WHERE event_type = 'click' GROUP BY user_id, us),
        |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, c.us AS click_us, c.click_val
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.us
        |ORDER BY p.event_id""".stripMargin,
    // session_window ≡ gaps-and-islands with the same 12h gap. NOTE
    // the boundary: windows [t, t+gap) merge only on strict overlap,
    // so Spark opens a new session when the gap is EXACTLY 12h (>=
    // split) — one tick stricter than core/Temporal.sessionize's
    // classic > split. The oracle mirrors session_window.
    "stream_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |l AS (SELECT user_id, us, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 43200000000 THEN 1 ELSE 0 END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sj AS (SELECT user_id, us, sum(ns) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM l)
        |SELECT user_id, min(us) AS start_us, count(*) AS n_events
        |FROM sj GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    // tumbling 1h windows aligned to the epoch (Spark default, UTC)
    "stream_window_counts" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS win_start,
        | event_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    // the streaming chop replays the exact batch-rechunk semantics on
    // a bounded sorted stream — the batch operator's oracle IS the
    // streaming oracle
    "stream_rechunk" -> TraceQueries.oracle("w4_rechunk"),
    // streaming near-dup candidates: the batch MinHash mirror's
    // signature→banding chain, stopping at the candidate set (the
    // bounded replay stays under the bucket cap → streaming ≡ batch)
    "stream_neardup_candidates" -> {
      val mixers = graft.functions.MinHashSig.mixers(64)
        .zipWithIndex.map { case (a, j) => s"($j, ${java.lang.Long.toUnsignedString(a)})" }.mkString(", ")
      s"""WITH RECURSIVE
        |tok0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l FROM documents),
        |tokx AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i FROM tok0),
        |sh3 AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s FROM tokx a JOIN tokx b ON b.doc_id = a.doc_id AND b.i = a.i + 1 JOIN tokx c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
        |shfew AS (SELECT doc_id, array_to_string(l, ' ') AS s FROM tok0 WHERE len(l) < 3),
        |shall AS (SELECT DISTINCT doc_id, s FROM (SELECT * FROM sh3 UNION ALL SELECT * FROM shfew)),
        |strs AS (SELECT DISTINCT s FROM shall),
        |hx AS (SELECT s, hex(encode(s)) AS hs, octet_length(encode(s)) AS nb FROM strs),
        |fnv AS (
        |  SELECT s, hs, nb, 0 AS i, CAST(14695981039346656037 AS HUGEINT) AS h FROM hx
        |  UNION ALL
        |  SELECT s, hs, nb, i + 1,
        |    (xor(h, CAST((strpos('0123456789ABCDEF', substring(hs, 2*i+1, 1))-1)*16 + strpos('0123456789ABCDEF', substring(hs, 2*i+2, 1))-1 AS HUGEINT)) * 1099511628211) % 18446744073709551616
        |  FROM fnv WHERE i < nb),
        |hfin AS (SELECT s, h FROM fnv WHERE i = nb),
        |mix AS (SELECT j, a FROM (VALUES $mixers) AS m(j, a)),
        |pmul AS (
        |  SELECT sa.doc_id, m.j, CAST(hf.h // 2147483648 AS BIGINT) AS hi,
        |    (CAST(hf.h % 2147483648 AS HUGEINT) * CAST(m.a AS HUGEINT)) % 18446744073709551616 AS p
        |  FROM shall sa JOIN hfin hf ON hf.s = sa.s CROSS JOIN mix m),
        |persig AS (
        |  SELECT doc_id, j,
        |    min(xor(CAST(p - CASE WHEN p >= 9223372036854775808 THEN CAST(18446744073709551616 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END AS BIGINT), hi)) AS v
        |  FROM pmul GROUP BY doc_id, j),
        |bnd AS (SELECT doc_id, j // 4 AS band, list(v ORDER BY j) AS sl FROM persig GROUP BY doc_id, j // 4),
        |bsz AS (SELECT band, sl, count(*) AS c FROM bnd GROUP BY band, sl),
        |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.sl = b.sl AND a.doc_id < b.doc_id
        |  JOIN bsz z ON z.band = a.band AND z.sl = a.sl AND z.c <= 1000)
        |SELECT ida, idb FROM cand ORDER BY ida, idb""".stripMargin
    },
    // quality monitor: the gopher CTE grouped by lang with the same
    // integer thresholds (bounded replay = one batch = the batch agg)
    "stream_quality_monitor" -> {
      val stops = graft.llm.TextAnalysis.stopwordUnion
        .map(w => s"'$w'").mkString(", ")
      s"""WITH tok0 AS (SELECT doc_id, lang,
        |  regexp_split_to_array(trim(lower(text)), '\\s+') AS ll,
        |  regexp_split_to_array(trim(text), '\\s+') AS l FROM documents),
        |cnt AS (SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(l) AS w FROM tok0) GROUP BY doc_id, w),
        |mx AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr
        |  FROM cnt GROUP BY doc_id),
        |m AS (SELECT t.doc_id, t.lang, mx.ttr,
        |  CAST(len(list_filter(t.ll, x -> list_contains([$stops], x))) AS DOUBLE) / len(t.ll) AS swr
        |  FROM tok0 t JOIN mx ON mx.doc_id = t.doc_id)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN ttr > 0.09 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitious,
        | CAST(sum(CASE WHEN swr >= 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_stopworded
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin
    },
    // sliding 2h/1h windows: each event contributes to exactly two
    // epoch-aligned windows (k = 0, 1 hours back)
    "stream_rate_monitor" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, value FROM events),
        |w AS (SELECT us - us % 3600000000 - k.k * 3600000000 AS win_start,
        |  us, value FROM e, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS k(k))
        |SELECT win_start,
        | CAST(sum(CASE WHEN value >= 100.0 AND value <= 300.0 THEN 1 ELSE 0 END) AS BIGINT) AS in_range_cnt,
        | CAST(count(*) AS BIGINT) AS total_cnt
        |FROM w GROUP BY win_start ORDER BY win_start""".stripMargin
  )
}
