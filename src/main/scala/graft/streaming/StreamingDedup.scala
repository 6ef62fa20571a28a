package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication for document ingest — the streaming
  * form of [[graft.llm.Dedup.exactDedup]].
  *
  * Semantics: FIRST-seen-wins per content hash (streaming has no "min
  * id over the full corpus" — the arrival order IS the authority; the
  * batch form's min-id rule degenerates to this when ids are assigned
  * in arrival order). State per group is one boolean; with
  * `stateTtl`, groups expire after a processing-time TTL so state
  * stays bounded on an unbounded corpus (the standard windowed-dedup
  * trade-off: an exact copy arriving after the TTL is re-emitted).
  */
object StreamingDedup {

  final case class Doc(docId: Long, text: String)

  /** First-seen-wins exact dedup on md5(text). `stateTtl` e.g. "1 hour"
    * bounds state; empty string keeps state forever (only for bounded
    * backfills). */
  def exactDedupStream(docs: Dataset[Doc], stateTtl: String = "")
      : Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl.isEmpty) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    docs
      .withColumn("content_hash", md5(col("text")))
      .as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(
        OutputMode.Append(), timeout)(
        (hash: String, rows: Iterator[(Long, String, String)],
            state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val firstTime = !state.exists
            if (firstTime && stateTtl.nonEmpty)
              state.setTimeoutDuration(stateTtl)
            if (firstTime) {
              state.update(true)
              // emit only the first row of the group's first batch
              // (within a micro-batch, smallest docId wins for
              // determinism)
              val first = rows.minBy(_._1)
              Iterator.single(Doc(first._1, first._2))
            } else Iterator.empty
          }
        })
  }

  /** Streaming per-language document counts with token totals — the
    * streaming form of the llm_lang_dist/text-tokens queries (watermarked
    * update-mode aggregation; `docs` needs an event-time `ts` column). */
  def langThroughput(docs: DataFrame, watermark: String,
      windowDur: String): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(graft.llm.TextAnalysis.tokenCount(col("text"))).as("tokens"))
}
