package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream backward as-of enrichment — the streaming form of
  * [[graft.core.Temporal.asofJoin]] (Spark has no native streaming
  * as-of join; its stream-stream joins are equi/interval only).
  *
  * Semantics: each fact is enriched with the latest dimension row for
  * its key whose timestamp is ≤ the fact's (backward-inclusive), among
  * the dims RETAINED so far. Keyed state is the last `dimHistory`
  * (ts, value) pairs per key — O(keys × K), never data-sized:
  *
  *   - within a micro-batch, carried dims re-enter the sorted
  *     (ts, tag[, value]) walk as synthetic rows, so matching is EXACT
  *     with respect to every retained dim, whatever the arrival order —
  *     on a bounded single-batch replay the output EQUALS
  *     `asofJoin(leftOuter = true)` for any `dimHistory ≥ 1`;
  *   - across batches the history carries forward: dims from batch N
  *     enrich facts of batch N+1 (the slowly-changing dimension feed),
  *     and a LATE fact — event-time older than the newest consumed
  *     dim — still matches exactly if its dim is within the retained
  *     history, and emits unmatched otherwise (never a future dim).
  *     Unbounded-history exactness would need watermark-bounded
  *     buffering; this trades the tail of that guarantee for fixed
  *     state, like the capped/TTL'd streaming dedups.
  *
  * `stateTtl` (processing-time) expires idle keys for unbounded
  * ingest; empty string keeps state forever (bounded backfills only).
  */
object StreamingAsOf {

  final case class Fact(key: Long, ts: Long, factId: Long)
  final case class Dim(key: Long, ts: Long, value: Double)
  final case class Enriched(key: Long, ts: Long, factId: Long,
    dimTs: Option[Long], dimValue: Option[Double])

  // private[streaming], not private: the encoder's generated
  // deserializer needs bytecode-public access to the class
  private[streaming] final case class Tagged(key: Long, ts: Long, tag: Int,
    factId: Long, value: Double)

  def asofEnrichStream(
      facts: Dataset[Fact],
      dims: Dataset[Dim],
      dimHistory: Int = 64,
      stateTtl: String = ""): Dataset[Enriched] = {
    require(dimHistory >= 1, "dimHistory must be at least 1")
    val spark = facts.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl.isEmpty) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    val tagged = dims.map(d => Tagged(d.key, d.ts, 0, 0L, d.value))
      .union(facts.map(f => Tagged(f.key, f.ts, 1, f.factId, 0.0)))
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        (key: Long, rows: Iterator[Tagged],
            state: GroupState[List[(Long, Double)]]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // carried history re-enters the walk as dim rows, so the
            // ascending (ts, tag, value) order makes "the last dim seen
            // so far" the exact backward match for every fact: dim
            // before fact at equal ts (inclusive), equal-ts dims
            // tie-break on value like the batch operator
            val carried = state.getOption.getOrElse(Nil)
              .map(d => Tagged(key, d._1, 0, 0L, d._2))
            val sorted = (rows.toSeq ++ carried)
              .sortBy(r => (r.ts, r.tag, r.value))
            val hist = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Double)]
            val out = Seq.newBuilder[Enriched]
            sorted.foreach { r =>
              if (r.tag == 0) {
                // walk is ts-ascending → append keeps hist sorted;
                // skip exact duplicates (a carried dim meeting itself
                // cannot happen, but identical dims across batches can)
                if (hist.isEmpty || (hist.last._1, hist.last._2) !=
                    ((r.ts, r.value)))
                  hist += ((r.ts, r.value))
              } else {
                hist.lastOption match {
                  case Some((dt, dv)) =>
                    out += Enriched(key, r.ts, r.factId, Some(dt), Some(dv))
                  case None =>
                    out += Enriched(key, r.ts, r.factId, None, None)
                }
              }
            }
            state.update(hist.takeRight(dimHistory).toList)
            if (stateTtl.nonEmpty) state.setTimeoutDuration(stateTtl)
            out.result().iterator
          }
        })
  }
}
