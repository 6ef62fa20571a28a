package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-bounded corpus selection: "take the best N tokens" — order
  * the corpus by a priority (classifier score, familiarity, freshness)
  * and keep the minimal prefix whose token count covers the budget.
  * This is the final step of every curation pipeline that targets a
  * fixed training-token count rather than a fixed document count.
  *
  * Like sequence packing this is a GLOBAL ORDERED PREFIX SUM, so it
  * reuses the same scale decomposition ([[Packing.packSequences]]):
  * range-partition by (priority desc, id), per-partition token totals
  * (a P-row aggregate — the only data that reaches the driver),
  * broadcast exclusive offsets, partition-local running sum. Two
  * budget-specific shapes matter at 100 TB:
  *
  *   - ONLY the narrow (id, priority, n_tokens) projection rides the
  *     range exchange, the cache, and the window — ~tens of bytes per
  *     document, a ~1000× reduction over shuffling document text (the
  *     first cut of this operator ranged-shuffled the full rows; the
  *     plan audit caught the corpus in the exchange).
  *   - partitions whose exclusive offset already meets the budget are
  *     dropped BEFORE the finishing window, so the window pass costs
  *     O(selected prefix), not O(corpus).
  *
  * Recovering full document rows is a second step ([[selectedDocs]]):
  * an equi-join of the corpus against the selected-id table, which
  * Spark plans as a broadcast join when the selection is small and a
  * hash join otherwise — either way the corpus text crosses at most
  * ONE hash exchange, never the range sort.
  */
object Select {

  /** The minimal priority-ordered prefix covering `budget` tokens, as a
    * NARROW table (idCol, n_tokens, tokens_before): a row is kept iff
    * the tokens strictly before it (higher priority first, ties broken
    * by ascending `idCol` for determinism) total less than `budget`.
    * The straddling document is INCLUDED — the output covers the
    * budget; trim the final doc downstream if an exact cut is needed.
    * Null priorities sort LAST (lowest priority); null token counts
    * (null text) count as 0. Join back to the corpus with
    * [[selectedDocs]] when full rows are needed.
    *
    * RUNNER CONTRACT: persists the range-partitioned narrow count
    * table the returned plan reads (two passes: partials + final);
    * released by the session's per-query cache hygiene like the other
    * persisted pipelines. */
  def takeTokenBudget(
      df: DataFrame,
      textCol: String,
      idCol: String,
      priority: Column,
      budget: Long,
      numParts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val p =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val counts = df
      // narrow FIRST: this projection is all that shuffles and caches
      .select(col(idCol), priority.as("__prio"),
        coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L))
          .as("__ntok"))
      .repartitionByRange(p, col("__prio").desc_nulls_last, col(idCol))
      .sortWithinPartitions(col("__prio").desc_nulls_last, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist()
    // P rows to the driver — the partials, never the data
    val partSums = counts.groupBy("__pid")
      .agg(sum("__ntok").as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val perPart = Array.tabulate(p)(partSums.getOrElse(_, 0L))
    val offsets = (0 until p).map(i => i -> perPart.take(i).sum).toMap
    // budget-specific pruning: a partition whose EXCLUSIVE offset is
    // already >= budget contributes nothing — drop it before the window
    val keepPids = (0 until p).filter(offsets(_) < budget)
    val w = Window.partitionBy("__pid")
      .orderBy(col("__prio").desc_nulls_last, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsetOf = typedlit(offsets)
    counts
      .filter(col("__pid").isin(keepPids: _*))
      .withColumn("tokens_before",
        sum("__ntok").over(w) - col("__ntok") +
          element_at(offsetOf, col("__pid")))
      .filter(col("tokens_before") < budget)
      .withColumnRenamed("__ntok", "n_tokens")
      .drop("__pid", "__prio")
  }

  /** Full document rows for a [[takeTokenBudget]] selection: inner
    * equi-join on `idCol` (AQE broadcasts the selected-id side when it
    * fits, falls back to a hash join when it doesn't — the corpus
    * crosses at most one hash exchange). */
  def selectedDocs(df: DataFrame, selected: DataFrame, idCol: String)
      : DataFrame =
    df.join(selected.select(idCol, "n_tokens", "tokens_before"), Seq(idCol))
}
