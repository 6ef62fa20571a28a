package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forms of the trace pipeline (SURVEY W4 streaming variant +
  * a watermarked rate monitor).
  *
  * The batch re-chunker ([[graft.traces.TraceStore.rechunk]], the
  * RechunkExec sorted-run chop) assumes a bounded input; unbounded
  * input needs bounded state instead: per
  * channel we keep only the carry-over samples (< chunkLen doubles) in
  * `flatMapGroupsWithState`, emitting every completed chunk as it fills
  * — the exact streaming analogue of the reference's sequential
  * concat-and-chop loop (`vibration_analyzer.py:406-437`).
  */
object StreamingRechunk {

  final case class TraceSeg(channel: String, eventIndex: Long,
      trace: Seq[Double])
  final case class Chunk(channel: String, chunkId: Long, trace: Seq[Double])
  final case class Carry(nextChunkId: Long, buffer: Seq[Double])

  /** Per-channel stateful re-chunk. Rows within a channel group must
    * arrive in `eventIndex` order per micro-batch (they are sorted
    * inside the group before appending — cross-batch order is the
    * source's responsibility, as in the reference's sequential read). */
  def rechunkStream(
      segments: Dataset[TraceSeg],
      chunkLen: Int): Dataset[Chunk] = {
    val spark = segments.sparkSession
    import spark.implicits._
    segments
      .groupByKey(_.channel)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (channel: String, rows: Iterator[TraceSeg],
            state: GroupState[Carry]) => {
          val carry = state.getOption.getOrElse(Carry(0L, Vector.empty))
          var buf = carry.buffer.toVector
          var nextId = carry.nextChunkId
          val out = Vector.newBuilder[Chunk]
          rows.toSeq.sortBy(_.eventIndex).foreach { seg =>
            buf = buf ++ seg.trace
            while (buf.length >= chunkLen) {
              out += Chunk(channel, nextId, buf.take(chunkLen))
              buf = buf.drop(chunkLen)
              nextId += 1
            }
          }
          state.update(Carry(nextId, buf)) // bounded: < chunkLen samples
          out.result().iterator
        })
  }

  /** Watermarked sliding-window event-rate monitor — the streaming form
    * of the T7 rate cut: per-window in-range counts with late data
    * bounded by the watermark. `events` needs an event-time column
    * `ts` (timestamp) and a `value` column. */
  def rateMonitor(
      events: DataFrame,
      windowDur: String,
      slideDur: String,
      watermark: String,
      lo: Double,
      hi: Double): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur))
      .agg(sum(when(col("value") >= lo && col("value") <= hi, 1L)
        .otherwise(0L)).as("in_range_cnt"),
        count(lit(1)).as("total_cnt"))
}
