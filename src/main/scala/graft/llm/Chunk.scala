package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping document chunking: split each document's token stream
  * into fixed-size windows with a configurable overlap — the
  * context-window prep step of embedding/retrieval pipelines (and of
  * long-document training pipelines that window instead of truncate).
  *
  * Scale shape (100 TB): map-only — tokenize, generate chunk starts
  * with `sequence`, `posexplode`, slice + rejoin; one scan, no
  * shuffle, fully codegen'd builtins. The expansion is row-local and
  * BOUNDED: a doc emits ceil(n_tokens/stride) chunks and each output
  * row carries ≤ `size` tokens, so per-task memory is O(doc length ×
  * size/stride) — nothing like the quadratic explode pathologies LSH
  * banding has to guard against. Output rows re-partition naturally on
  * write; overlap duplicates ~size/stride× of the text volume, which
  * is the operator's contract, not an accident (document it in the
  * pipeline budget).
  */
object Chunk {

  /** (idCol, chunk_idx, chunk_start, n_chunk_tokens, chunk_text):
    * whitespace tokens `[k·stride, k·stride + size)` for every
    * `k·stride < n_tokens`, where `stride = size − overlap`. The final
    * chunk may be short (down to 1 token); null/empty documents emit
    * NO rows. Tokenization matches [[TextAnalysis.tokenCount]]
    * (whitespace runs, leading/trailing trimmed); chunk text is the
    * tokens rejoined with single spaces, so inner whitespace runs are
    * normalized in the output. */
  def chunkTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      size: Int,
      overlap: Int = 0): DataFrame = {
    require(size > 0, "chunk size must be positive")
    require(overlap >= 0 && overlap < size,
      "overlap must be in [0, size)")
    val stride = size - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size_(toks)
    df
      .withColumn("__toks", toks)
      .filter(col("__toks").isNotNull && size_(col("__toks")) > 0 &&
        // trim("") splits to [""] — a zero-token doc, not a 1-token one
        !(size_(col("__toks")) === 1 && element_at(col("__toks"), 1) === ""))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0),
          size_(col("__toks")) - 1, lit(stride))).as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(size).cast("long"),
          size_(col("__toks")).cast("long") - col("chunk_start"))
          .as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_start") + 1, lit(size)))
          .as("chunk_text"))
  }

  /** [[chunkTokens]] over a PRE-TOKENIZED id array (e.g.
    * [[Bpe.encode]] output): (idCol, chunk_idx, chunk_start,
    * n_chunk_tokens, chunk_ids) with the same windowing contract —
    * ids `[k·stride, k·stride + size)` for every `k·stride < n`,
    * final chunk may be short, null/empty arrays emit no rows. Same
    * map-only scale shape; the id slices are what an
    * embedding/training pipeline actually feeds the model, where
    * [[chunkTokens]]' rejoined text is the retrieval-display form. */
  def chunkIds(
      df: DataFrame,
      idsCol: String,
      idCol: String,
      size: Int,
      overlap: Int = 0): DataFrame = {
    require(size > 0, "chunk size must be positive")
    require(overlap >= 0 && overlap < size,
      "overlap must be in [0, size)")
    val stride = size - overlap
    df
      .filter(col(idsCol).isNotNull && size_(col(idsCol)) > 0)
      .select(col(idCol), col(idsCol).as("__ids"),
        posexplode(sequence(lit(0),
          size_(col(idsCol)) - 1, lit(stride)))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(size).cast("long"),
          size_(col("__ids")).cast("long") - col("chunk_start"))
          .as("n_chunk_tokens"),
        slice(col("__ids"), col("chunk_start") + 1, lit(size))
          .as("chunk_ids"))
  }

  private def size_(c: Column): Column = size(c)
}
