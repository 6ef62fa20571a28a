package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling & plot-prep helpers (SURVEY L3, L5). */
object Sampling {

  /** L3: exact-n uniform sample without replacement, seeded —
    * `df.sample(n=k)` / `np.random.choice(indices, k)` of the reference
    * (`analyzer.py:770-771,966-967`, `semiautocuts.py:1760-1768`).
    * `orderBy(rand(seed)).limit(n)` is an O(n log k) ordered take, not a
    * full sort materialization. Deterministic for a fixed seed AND fixed
    * input partitioning; documented divergence from numpy's RNG stream. */
  def exactN(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** L3 approximate form: Bernoulli sample, fraction-based. */
  def fraction(df: DataFrame, f: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, f, seed)

  /** Stratified exact-n sample: at most `n` rows per group, chosen
    * deterministically by id-hash order (FNV-1a of the id string, ties
    * on id) — per-group caps for corpus assembly ("keep ≤ n docs per
    * source") without RNG state. The window partitions by the group
    * column, so the rank runs group-parallel; at scale this is one
    * shuffle on the group key, same as any grouped aggregate. */
  def stratifiedExactN(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(graft.functions.Fnv64(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Weighted exact-n sample without replacement — sequential Poisson
    * sampling (Ohlsson 1998, the πps-approximate priority scheme):
    * each row gets priority `u / w` where `u` is a 52-bit uniform
    * derived from the id hash, and the `n` SMALLEST priorities win, so
    * inclusion probability grows ∝ weight. Chosen over
    * Efraimidis–Spirakis `u^(1/w)` keys deliberately: the priority
    * here is one integer-exact hash and ONE IEEE division (both
    * bit-identical in any engine), where pow/ln keys can differ in the
    * last ulp between libm implementations and flip a selection —
    * this sampler is exactly mirrorable by an external SQL oracle.
    * RNG-free and partitioning-independent like [[stratifiedExactN]];
    * rows with weight ≤ 0 are never sampled. `orderBy().limit(n)` is
    * a distributed ordered take, not a full sort. */
  def weightedPriorityN(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int): DataFrame = {
    val u = pmod(graft.functions.Fnv64(col(idCol).cast("string")),
      lit(1L << 52)).cast("double")
    df.filter(col(weightCol) > 0)
      .withColumn("__pri", u / col(weightCol).cast("double"))
      .orderBy(col("__pri").asc, col(idCol).asc)
      .limit(n)
      .drop("__pri")
  }

  /** L5: log-spaced index subset of an axis of length `n` — the plot
    * downsampler (`_downsample_log`, `vibration_analyzer.py:1051-1102`,
    * default 20,000 points). Driver-side: it prepares plot indices, not
    * a table op. Always includes index 0 and n-1; strictly increasing. */
  def logDownsampleIndices(n: Int, points: Int = 20000): Array[Int] = {
    if (n <= points) Array.range(0, n)
    else {
      val lo = math.log(1.0)
      val hi = math.log(n.toDouble)
      val raw = Array.tabulate(points) { i =>
        val f = i.toDouble / (points - 1)
        math.min(n - 1, math.exp(lo + f * (hi - lo)).toInt - 1 + (if (i == 0) 1 else 0))
      }
      (Array(0) ++ raw).distinct.sorted
    }
  }
}
