package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: lay every document
  * head-to-tail in `idCol` order and split the token stream every
  * `ctxLen` tokens (the standard pretraining layout — documents may
  * span sequence boundaries). The assignment is a closed-form function
  * of the exclusive token prefix sum, so the operator reduces to a
  * GLOBAL ORDERED PREFIX SUM — the textbook case where the naive
  * formulation (one `Window.orderBy` over everything) funnels the full
  * corpus through a single task.
  *
  * Scale shape: range-partition by `idCol` (so partition boundaries
  * respect the document order), take per-partition token totals — a
  * tiny P-row aggregate, the ONLY data that ever reaches the driver —
  * broadcast their exclusive offsets back as a literal map, and finish
  * with a PARTITION-LOCAL running sum. Work per executor is linear in
  * its partition; nothing global moves. (Same decomposition a
  * 1000-executor prefix sum uses; at P = shuffle partitions the
  * offsets map is a few KB.)
  */
object Packing {

  /** Per-doc packing assignment:
    * (idCol, n_tokens, token_offset, seq_id, n_seqs_spanned) where
    * `token_offset` is the doc's first-token position in the packed
    * stream, `seq_id = token_offset div ctxLen` the training sequence
    * holding that first token, and `n_seqs_spanned` how many sequences
    * the doc crosses. Token counts are the engine's whitespace
    * tokenizer ([[TextAnalysis.tokenCount]]).
    *
    * RUNNER CONTRACT: persists the range-partitioned count table the
    * returned plan reads (two passes: partial sums + final); released
    * by the session's per-query cache hygiene like the other persisted
    * pipelines. */
  def packSequences(
      df: DataFrame,
      textCol: String,
      idCol: String,
      ctxLen: Int,
      numParts: Int = 0): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    val spark = df.sparkSession
    val p =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val counts = df
      .select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // P rows to the driver — the partials, never the data
    val partSums = counts.groupBy("__pid")
      .agg(sum("n_tokens").as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    // exclusive prefix over ALL pids (empty partitions contribute 0 and
    // never reach the groupBy result)
    val perPart = Array.tabulate(p)(partSums.getOrElse(_, 0L))
    val offsets = (0 until p)
      .map(i => i -> perPart.take(i).sum)
      .toMap
    // finishing pass: running sum WITHIN each pid group + its broadcast
    // offset. The window clusters on __pid — a P-way-parallel exchange
    // of the narrow count table, never a single global sort
    val w = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsetOf = typedlit(offsets)
    counts
      .withColumn("token_offset",
        sum("n_tokens").over(w) - col("n_tokens") +
          element_at(offsetOf, col("__pid")))
      .withColumn("seq_id", expr(s"token_offset div $ctxLen"))
      .withColumn("n_seqs_spanned",
        expr(s"(token_offset + n_tokens - 1) div $ctxLen") -
          col("seq_id") + lit(1L))
      .drop("__pid")
  }

  /** Sequence-level summary: docs whose first token lands in each
    * packed sequence (`seq_id`, `n_docs_starting`, `n_tokens_starting`)
    * — the packing QA view (every sequence is exactly `ctxLen` tokens
    * by construction except the final partial one; the doc-boundary
    * density is the quantity of interest). */
  def sequenceFill(packed: DataFrame): DataFrame =
    packed.groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs_starting"),
        sum("n_tokens").as("n_tokens_starting"))
}
