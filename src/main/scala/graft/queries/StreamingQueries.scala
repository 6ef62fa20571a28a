package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingDedup
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
    * uniquely-named memory sink and return the sink's contents. */
  private def runToMemory(
      spark: SparkSession,
      prefix: String,
      build: String => org.apache.spark.sql.streaming.DataStreamWriter[_])
      : DataFrame = {
    val name = s"${prefix}_${runSeq.incrementAndGet()}"
    val q = build(name).start()
    q.awaitTermination()
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
    })
  )

  val oracle: Map[String, String] = Map(
    // single-batch first-seen-wins = smallest doc_id per hash group
    "stream_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id FROM documents
        |GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    // tumbling 1h windows aligned to the epoch (Spark default, UTC)
    "stream_window_counts" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS win_start,
        | event_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin
  )
}
