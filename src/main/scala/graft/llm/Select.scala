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
  * broadcast exclusive offsets, partition-local running sum. One extra
  * budget-specific win: partitions whose exclusive offset already
  * meets the budget are dropped BEFORE the finishing window, so the
  * expensive pass costs O(selected prefix), not O(corpus) — selecting
  * 1 TB out of 100 TB windows ~1% of the rows.
  */
object Select {

  /** Rows of `df` (plus `n_tokens`, `tokens_before`) forming the
    * minimal priority-ordered prefix covering `budget` tokens: a row is
    * kept iff the tokens strictly before it (higher priority first,
    * ties broken by ascending `idCol` for determinism) total less than
    * `budget`. The straddling document is INCLUDED — the output covers
    * the budget; trim the final doc downstream if an exact cut is
    * needed. Null priorities sort LAST (lowest priority); null token
    * counts (null text) count as 0.
    *
    * RUNNER CONTRACT: persists the range-partitioned count table the
    * returned plan reads (two passes: partials + final); released by
    * the session's per-query cache hygiene like the other persisted
    * pipelines. */
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
      .withColumn("__prio", priority)
      .withColumn("__ntok",
        coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L)))
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
}
