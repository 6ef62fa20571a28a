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

  /** MATERIALIZE the packed training sequences (r09): every document's
    * token-id array (e.g. [[Bpe.encode]] output) laid head-to-tail in
    * `idCol` order and cut every `ctxLen` ids — one row per training
    * sequence `(seq_id, n_tokens, token_ids)`, the final partial
    * sequence allowed short. The last pipeline mile:
    * [[packSequences]] is the ASSIGNMENT view (which docs land where);
    * this emits the sequences a trainer actually reads.
    *
    * Scale shape: the same [[graft.stats.GlobalOrder.exclusivePrefix]]
    * decomposition computes each doc's token offset over the NARROW
    * (id, count) table; offsets join back to the id arrays (one hash
    * join keyed on the doc id), and tokens explode with their global
    * position — the one token-level shuffle, inherent to the operator
    * (a token's sequence is a global function of the whole corpus).
    * Sequence assembly is a groupBy(seq_id) whose per-group state is
    * bounded by `ctxLen`, so no skew surface exists; the exploded rows
    * are 3 narrow numerics each. */
  def materializeSequences(
      df: DataFrame,
      idsCol: String,
      idCol: String,
      ctxLen: Int,
      numParts: Int = 0): DataFrame =
    materializeSequencesReleasable(df, idsCol, idCol, ctxLen, numParts)._1

  /** [[materializeSequences]] plus the prefix cache's release handle —
    * fire it only AFTER the result is materialized (both prefix passes
    * read the cache; releasing earlier recomputes the range exchange,
    * whose sampled partitioning the collected partials no longer
    * describe). Callers that can't control materialization order use
    * the plain form and the session's per-query cache hygiene. */
  def materializeSequencesReleasable(
      df: DataFrame,
      idsCol: String,
      idCol: String,
      ctxLen: Int,
      numParts: Int = 0): (DataFrame, () => Unit) = {
    require(ctxLen > 0, "ctxLen must be positive")
    val counts = df.select(col(idCol),
      coalesce(size(col(idsCol)), lit(0)).cast("long").as("n_tokens"))
    val (packed, _, release) =
      graft.stats.GlobalOrder.exclusivePrefixReleasable(
        counts, Seq(col(idCol)), col("n_tokens"), "token_offset", numParts)
    val toks = df.select(col(idCol), col(idsCol).as("__ids"))
      .join(packed.select(col(idCol), col("token_offset")), Seq(idCol))
      .select(posexplode(col("__ids")).as(Seq("__p", "__tid")),
        col("token_offset"))
      .select(col("__tid"),
        (col("token_offset") + col("__p")).as("__gpos"))
    (toks
      .groupBy(expr(s"__gpos div $ctxLen").as("seq_id"))
      .agg(sort_array(collect_list(struct(
        pmod(col("__gpos"), lit(ctxLen.toLong)).as("p"),
        col("__tid").as("t")))).as("pt"))
      .select(col("seq_id"),
        size(col("pt")).cast("long").as("n_tokens"),
        expr("transform(pt, x -> x.t)").as("token_ids")), release)
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
