package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-quality evaluation over a corpus — the fertility report
  * every tokenizer paper tabulates (tokens per word / compression per
  * source): with two trained subword families in the engine
  * ([[Bpe]], [[Unigram]]), the pipeline question "which tokenizer, at
  * what cost, on MY corpus" becomes one aggregate.
  *
  * All statistics are exact integers — token and word counts sum
  * map-side, and the fertility ratio is emitted as an exact
  * tokens-per-1000-words integer division (no float sums anywhere, so
  * the report is bit-reproducible and oracle-mirrorable).
  *
  * Scale shape (100 TB): ONE pass over the corpus — every counter is
  * a map-only codegen'd kernel (`bpe_encode` / `unigram_encode` sized,
  * whitespace words filtered in-row), and the exchange carries one row
  * per group per partial. Nothing else moves. */
object TokenizerEval {

  /** Per-`groupCol` fertility: `(group, n_docs, n_words,
    * <name>_tokens..., <name>_per_kword...)` — one row per group, one
    * token-sum and one exact tokens·1000 div words ratio per counter.
    * Null texts count as documents but contribute no words/tokens;
    * a zero-word group reports null ratios rather than dividing. */
  def fertility(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      counters: Seq[(String, Column => Column)]): DataFrame = {
    require(counters.nonEmpty, "at least one token counter required")
    require(counters.map(_._1).distinct.length == counters.length,
      "counter names must be distinct")
    val words = coalesce(
      size(filter(TextAnalysis.tokens(col(textCol)),
        t => length(t) > 0)).cast("long"), lit(0L))
    val aggs =
      Seq(count(lit(1)).as("n_docs"), sum(words).as("n_words")) ++
        counters.map { case (name, counter) =>
          sum(coalesce(counter(col(textCol)), lit(0L)))
            .as(s"${name}_tokens")
        }
    val grouped = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    counters.foldLeft(grouped) { case (acc, (name, _)) =>
      acc.withColumn(s"${name}_per_kword",
        when(col("n_words") > 0,
          expr(s"(${name}_tokens * 1000) div n_words")))
    }
  }
}
