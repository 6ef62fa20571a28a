package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph scoring for crawl prioritization — the classic use of
  * the crawl link graph ([[graft.functions.HtmlToText]] extraction →
  * URL frontier): rank pages by incoming-link structure to decide what
  * to fetch/keep first. PageRank with a fixed iteration count and
  * INTEGER-QUANTIZED arithmetic: ranks live in integer `scale`-units,
  * every per-edge contribution is an integral division
  * (`rank div outdeg`), and the damping step is
  * `base + (85 · Σcontrib) div 100` — so each iteration is exact
  * integer algebra, bit-identical under any partitioning and
  * reproducible by a SQL mirror unrolled iteration by iteration (the
  * fixed-depth-Lloyd oracle pattern). The ~1-unit-per-edge mass lost
  * to truncation is deliberate: determinism over the 10th decimal.
  *
  * Scale shape (the web graph is the canonical 100 TB Spark graph):
  * each iteration is ONE shuffle — edges join the rank table on src
  * (map-side combined contribution sums cross the exchange keyed by
  * dst, vocabulary = node set), then a left join back onto the node
  * spine for dangling/unlinked nodes. Nothing is driver-sized except
  * the node COUNT (one long). Out-degrees are computed once and ride
  * with the edges. Zipf-hot dsts (everyone links to the homepage) are
  * partial-aggregated map-side, never a skew join. */
object Graph {

  /** Fixed-iteration integer PageRank.
    *
    * `edges`: (src, dst) — multi-edges count multiply, every node with
    * out-links contributes `rank div outdeg` per edge. `nodes`: one
    * column `v` spanning every vertex (links to ids outside the spine
    * are dropped by the final join — a crawl frontier always has edges
    * pointing off-corpus). Returns (v, rank) in scale-units after
    * `iters` iterations from the uniform start `scale div n`.
    *
    * `init` (optional) WARM-STARTS from a previous crawl's `(v, rank)`
    * table — the recurring-crawl shape: the graph grew a little since
    * last month, so re-rank from last month's vector and converge in a
    * fraction of the rounds a cold start needs. Nodes absent from
    * `init` (newly discovered pages) start at the uniform `scale div
    * n`; init rows for nodes no longer in the spine are dropped by the
    * join. One extra dimension-style left join before the loop — the
    * per-iteration shape is unchanged. */
  def pageRank(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int,
      scale: Long = 1000000000L,
      init: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50]: $iters")
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty node spine")
    val r0 = scale / n
    val base = 15L * r0 / 100L
    val deg = edges.groupBy("src").agg(count(lit(1)).as("__deg"))
    val e = edges.join(deg, Seq("src"))
    var r = init match {
      case Some(prev) => nodes.select(col("v"))
        .join(prev.select(prev.col("v"),
          prev.col("rank").cast("long").as("__init")), Seq("v"), "left")
        .select(col("v"), coalesce(col("__init"), lit(r0)).as("rank"))
      case None => nodes.select(col("v"), lit(r0).as("rank"))
    }
    for (i <- 1 to iters) {
      val contrib = e.join(r, e("src") === r("v"))
        .select(col("dst").as("v"),
          expr("rank div __deg").as("__c"))
        .groupBy("v").agg(sum("__c").as("__s"))
      r = nodes.select(col("v"))
        .join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit(base) +
            expr("(85 * coalesce(__s, CAST(0 AS BIGINT))) div 100"))
            .as("rank"))
      // Truncate iterative lineage (the Lloyd/BPE pattern): without
      // this the final plan embeds `iters` copies of the edge-join
      // subtree and Catalyst analysis cost grows superlinearly — a
      // driver-side bottleneck long before the executors feel it.
      // Every 5 rounds amortizes the materialization at low iters
      // while keeping plan depth bounded at the 50-iteration limit.
      if (i % 5 == 0 && i < iters) r = r.localCheckpoint()
    }
    r
  }
}
