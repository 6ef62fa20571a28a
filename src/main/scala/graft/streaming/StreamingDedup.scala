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

  final case class CandPair(ida: Long, idb: Long)

  /** Streaming MinHash-LSH near-duplicate CANDIDATE detection — the
    * streaming form of [[graft.llm.Dedup.lshCandidates]]: each arriving
    * doc computes its fused signature map-side
    * ([[graft.functions.MinHashTextSig]]), explodes into its b band
    * buckets, and per-bucket keyed state (the ids seen in that bucket)
    * emits a candidate pair for every remembered member. Downstream
    * verification (exact Jaccard over the pair stream) is a batch join
    * per micro-batch — candidates, not the corpus, cross the boundary.
    *
    * State per bucket is an id list capped at `maxBucket` (members past
    * the cap detect against the remembered prefix but are not
    * remembered — a bounded-memory divergence from the batch form,
    * which DROPS oversized buckets whole; under the cap the bounded
    * replay emits exactly the batch candidate set). `stateTtl` expires
    * idle buckets for unbounded ingest. Within a micro-batch, rows
    * process in id order → deterministic pairs with ida < idb. */
  def nearDupCandidatesStream(
      docs: Dataset[Doc],
      k: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      stateTtl: String = "",
      maxBucket: Int = 1000): Dataset[CandPair] = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout =
      if (stateTtl.isEmpty) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    val banded = docs.toDF()
      .withColumn("sig",
        graft.functions.MinHashTextSig(col("text"), k, shingleN))
      .select(col("docId"),
        explode(transform(sequence(lit(0), lit(bands - 1)), j =>
          concat_ws(":", j.cast("string"),
            concat_ws(",", transform(
              slice(col("sig"), j * r + 1, lit(r)),
              v => v.cast("string"))))))
          .as("bucket"))
      .as[(Long, String)]
    banded
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        (bucket: String, rows: Iterator[(Long, String)],
            state: GroupState[List[Long]]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            if (!state.exists && stateTtl.nonEmpty)
              state.setTimeoutDuration(stateTtl)
            // Bounded-memory hot-bucket contract (VERDICT r06 §8, the
            // streaming mirror of the batch slice-block fix): per
            // bucket per batch this function holds O(batch ids + cap)
            // — the sorted id array and the capped member list — and
            // the pair OUTPUT is a lazy iterator the runner drains
            // row-by-row, never a materialized size² list. All state
            // calls happen before the iterator escapes; the closure
            // captures only plain arrays.
            val prior = state.getOption.getOrElse(Nil)
            val ids = rows.map(_._1).toArray
            java.util.Arrays.sort(ids)
            // ids admitted to state: first nAdd (sorted) while the
            // member list is under the cap — same semantics as the
            // eager fold this replaces
            val nAdd = math.min(ids.length,
              math.max(0, maxBucket - prior.length))
            state.update(
              ids.take(nAdd).reverse.foldRight(prior)(_ :: _))
            val priorArr = prior.toArray
            ids.iterator.zipWithIndex.flatMap { case (id, i) =>
              (priorArr.iterator ++ ids.iterator.take(math.min(i, nAdd)))
                .filter(_ != id)
                .map(m => CandPair(math.min(m, id), math.max(m, id)))
            }
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
