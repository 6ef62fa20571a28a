package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream backward as-of enrichment — the streaming form of
  * [[graft.core.Temporal.asofJoin]] (Spark has no native streaming
  * as-of join; its stream-stream joins are equi/interval only).
  *
  * Semantics: each fact is enriched with the latest dimension row for
  * its key whose timestamp is ≤ the fact's (backward-inclusive), among
  * the dims CONSUMED SO FAR. Keyed state is ONE (ts, value) tuple per
  * key — the max-ts dim seen — so state is O(keys), never a buffer:
  *
  *   - within a micro-batch, rows sort by (ts, tag[, value]) and walk
  *     with the carried state, so any arrival order inside a batch
  *     matches the batch operator exactly — on a bounded single-batch
  *     replay the output EQUALS `asofJoin(leftOuter = true)`;
  *   - across batches the state carries forward: a dim from batch N
  *     enriches facts of batch N+1 (the standard slowly-changing
  *     dimension feed);
  *   - a LATE fact — event-time older than the newest consumed dim —
  *     emits unmatched rather than matching a future dim (the guard
  *     keeps backward semantics honest). Exact late-data replay would
  *     need watermark-bounded dim buffering; this operator trades that
  *     for O(1) per-key state, like the capped/TTL'd streaming dedups.
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
      stateTtl: String = ""): Dataset[Enriched] = {
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
            state: GroupState[(Long, Double)]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // dim before fact at equal ts (backward-inclusive); equal-ts
            // dims tie-break on value like the batch operator's
            // lexicographic (rt, payload) max
            val sorted = rows.toSeq.sortBy(r => (r.ts, r.tag, r.value))
            var last = state.getOption
            val out = Seq.newBuilder[Enriched]
            sorted.foreach { r =>
              if (r.tag == 0) {
                val keep = last.exists(l =>
                  l._1 > r.ts || (l._1 == r.ts && l._2 >= r.value))
                if (!keep) last = Some((r.ts, r.value))
              } else {
                // guard: never match a dim from the fact's future (a
                // late fact behind the carried state goes unmatched)
                last match {
                  case Some((dt, dv)) if dt <= r.ts =>
                    out += Enriched(key, r.ts, r.factId, Some(dt), Some(dv))
                  case _ =>
                    out += Enriched(key, r.ts, r.factId, None, None)
                }
              }
            }
            last.foreach(state.update)
            if (stateTtl.nonEmpty) state.setTimeoutDuration(stateTtl)
            out.result().iterator
          }
        })
  }
}
