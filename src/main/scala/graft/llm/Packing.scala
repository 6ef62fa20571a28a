package graft.llm

import org.apache.spark.sql.DataFrame
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
  * Scale shape: the shared [[graft.stats.GlobalOrder.exclusivePrefix]]
  * decomposition — range-partition by `idCol`, P-row partials to the
  * driver, broadcast offsets, partition-local running sum; only the
  * narrow (id, n_tokens) count table ever shuffles.
  */
object Packing {

  /** Per-doc packing assignment:
    * (idCol, n_tokens, token_offset, seq_id, n_seqs_spanned) where
    * `token_offset` is the doc's first-token position in the packed
    * stream, `seq_id = token_offset div ctxLen` the training sequence
    * holding that first token, and `n_seqs_spanned` how many sequences
    * the doc crosses. Token counts come from `tokenCounter` — default
    * the whitespace heuristic ([[TextAnalysis.tokenCount]]); pass
    * [[Bpe.count]] to pack on REAL subword counts.
    *
    * RUNNER CONTRACT: persists the range-partitioned count table the
    * returned plan reads (two passes: partial sums + final); released
    * by the session's per-query cache hygiene like the other persisted
    * pipelines — or eagerly via [[packSequencesReleasable]]'s handle
    * (ADVICE r06). */
  def packSequences(
      df: DataFrame,
      textCol: String,
      idCol: String,
      ctxLen: Int,
      numParts: Int = 0,
      tokenCounter: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column = TextAnalysis.tokenCount): DataFrame =
    packSequencesReleasable(df, textCol, idCol, ctxLen, numParts,
      tokenCounter)._1

  /** [[packSequences]] plus the prefix cache's release handle — call
    * it once the packing table has been materialized. */
  def packSequencesReleasable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      ctxLen: Int,
      numParts: Int = 0,
      tokenCounter: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column = TextAnalysis.tokenCount)
      : (DataFrame, () => Unit) = {
    require(ctxLen > 0, "ctxLen must be positive")
    val counts = df.select(col(idCol),
      tokenCounter(col(textCol)).as("n_tokens"))
    val (packed, _, release) =
      graft.stats.GlobalOrder.exclusivePrefixReleasable(
        counts, Seq(col(idCol)), col("n_tokens"), "token_offset", numParts)
    (packed
      .withColumn("seq_id", expr(s"token_offset div $ctxLen"))
      .withColumn("n_seqs_spanned",
        expr(s"(token_offset + n_tokens - 1) div $ctxLen") -
          col("seq_id") + lit(1L)), release)
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
