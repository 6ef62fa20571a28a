package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.vibration.MomentAggregator

/** Structured-Streaming lift of the batch moment accumulation
  * (SURVEY §2.9): the reference's one stream-shaped computation is the
  * single-pass moment loop (`vibration_analyzer.py:374-427`); because
  * [[MomentAggregator]] is a mergeable `Aggregator`, the SAME code runs
  * over an unbounded source with `outputMode("update")` for a live
  * monitor — no custom state store, no watermark machinery (the
  * reference has none either: accumulation is order-insensitive).
  */
object StreamingMoments {

  /** Streaming (or batch — the plan is identical) grouped moment
    * accumulation: rows carry `chans: Seq[Seq[Double]]` interleaved
    * complex spectra per channel. */
  def moments(
      spectra: DataFrame,
      groupCol: Column,
      nCh: Int,
      nFreq: Int): DataFrame = {
    val agg = udaf(new MomentAggregator(nCh, nFreq))
    spectra.groupBy(groupCol).agg(agg(col("chans")).as("mo"))
  }

  /** Convenience: run a memory-sink streaming query over `spectra`
    * (must be a streaming DataFrame) and return the query handle. */
  def startToMemory(
      spectra: DataFrame,
      groupCol: Column,
      nCh: Int,
      nFreq: Int,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    moments(spectra, groupCol, nCh, nFreq).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()
}
