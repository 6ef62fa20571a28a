package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * select raw-corpus documents that look like a small high-quality
  * TARGET corpus, by importance weights computed over hashed n-gram
  * bucket distributions. The method behind domain-targeted pretraining
  * selection (e.g. "give me the 5% of Common Crawl most like
  * Wikipedia+books").
  *
  * Model: features are unigrams + bigrams of the whitespace tokens
  * ([[TextAnalysis.tokens]]), hashed into `nBuckets` buckets
  * (FNV-1a → pmod). Bag-of-buckets distributions p (target) and q
  * (raw pool) are add-one smoothed; a document's importance weight is
  * log p(doc) - log q(doc) = Σ_grams [ log p(bucket) - log q(bucket) ].
  *
  * Determinism contract: per-BUCKET log-ratios are quantized once to
  * integer MICRO-NATS (`round(ln(·)·10⁶)` as long — the
  * [[LanguageModel]] pattern), so the per-doc weight is an exact
  * integer sum: bit-identical under any partitioning, and mirrored
  * bit-for-bit by a SQL oracle. `nBuckets` must be a power of two so
  * the oracle's UNSIGNED 64-bit FNV residue equals the engine's signed
  * `pmod` (2⁶⁴ ≡ 0 mod 2^k).
  *
  * Scale shape (100 TB): the two distributions are ONE map-side
  * combined aggregation each — what crosses the exchange is
  * `nBuckets`-bounded, never corpus-bounded. The log-ratio table is
  * `nBuckets` rows, broadcast; scoring is a map-only gram explode +
  * broadcast join + per-doc combine (the Zipf-hot buckets never key a
  * shuffle). Selection is the k-bounded [[graft.functions.TopKByScore]]
  * aggregate, not a global sort. The raw pool is scanned twice
  * (distribution + scoring) — inherent to self-normalized importance
  * weighting; a persisted log-ratio table makes re-scoring one scan. */
object Dsir {

  /** One row per document gram: every unigram plus every space-joined
    * adjacent bigram of the whitespace tokens. Matches the SQL-oracle
    * dialect contract of [[TextAnalysis.tokens]] (see
    * KernelPropertySpec): split of the TRIMMED text, an empty document
    * contributing its single empty token on both sides. */
  def docGrams(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val uni = toks.select(col(idCol), explode(col("__toks")).as("gram"))
    val bi = toks.filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("w1"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("w2")))
        .as("__bg"))
      .select(col(idCol),
        concat(col("__bg.w1"), lit(" "), col("__bg.w2")).as("gram"))
    uni.unionByName(bi)
  }

  /** Hash bucket of a gram: pmod(fnv64(gram), nBuckets). */
  def bucketOf(gram: Column, nBuckets: Int): Column =
    pmod(graft.functions.Fnv64(gram), lit(nBuckets.toLong))

  /** Bucketed gram counts of a corpus: (bucket, cnt); buckets no gram
    * hashed into are absent (smoothed in [[logRatios]]). One map-side
    * combined aggregation, `nBuckets`-bounded on the exchange. */
  def bucketCounts(
      df: DataFrame, textCol: String, idCol: String, nBuckets: Int)
      : DataFrame =
    docGrams(df, textCol, idCol)
      .select(bucketOf(col("gram"), nBuckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** The `nBuckets`-row importance table: for every bucket b,
    * lr(b) = round(10⁶ · ln( ((ct(b)+1) · (Nr+B)) / ((cr(b)+1) · (Nt+B)) ))
    * — the add-one-smoothed log p_target(b) − log q_raw(b) in integer
    * micro-nats (products as doubles: exact below 2⁵³, identical IEEE
    * op order on the SQL side). Dense over all buckets via a range
    * spine, so unseen buckets smooth to 1/(N+B) on both sides. */
  def logRatios(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two for the unsigned/signed pmod " +
        s"equivalence, got $nBuckets")
    val ct = bucketCounts(target, textCol, idCol, nBuckets)
      .withColumnRenamed("cnt", "ct")
    val cr = bucketCounts(raw, textCol, idCol, nBuckets)
      .withColumnRenamed("cnt", "cr")
    val totals = ct.agg(sum("ct").as("nt")).crossJoin(
      cr.agg(sum("cr").as("nr")))
    val spine = target.sparkSession.range(nBuckets.toLong)
      .select(col("id").as("bucket"))
    spine.join(ct, Seq("bucket"), "left")
      .join(cr, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log(
          ((col("ct") + lit(1)).cast("double") *
            (col("nr") + lit(nBuckets.toLong)).cast("double")) /
          ((col("cr") + lit(1)).cast("double") *
            (col("nt") + lit(nBuckets.toLong)).cast("double"))) * lit(1e6))
          .cast("long").as("lr"))
  }

  /** Per-document importance weights against a log-ratio table:
    * (idCol, n_grams, weight_micro) where weight_micro =
    * Σ_grams lr(bucket(gram)) — an exact integer sum. The `lr` table is
    * broadcast (nBuckets rows); the per-doc sum combines map-side. */
  def importanceWeights(
      candidates: DataFrame,
      lr: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int): DataFrame =
    docGrams(candidates, textCol, idCol)
      .select(col(idCol), bucketOf(col("gram"), nBuckets).as("bucket"))
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), sum("lr").as("weight_micro"))

  /** End-to-end DSIR weighting: distributions from `target` and the
    * `candidates` pool itself, then per-candidate weights. */
  def weigh(
      candidates: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int): DataFrame =
    importanceWeights(candidates,
      logRatios(target, candidates, textCol, idCol, nBuckets),
      textCol, idCol, nBuckets)

  /** Deterministic top-k selection by (weight DESC, id ASC) via the
    * k-bounded map-side aggregate — the argmax-k variant of the
    * paper's Gumbel resampling (the noisy variant is weight_micro +
    * gumbel, same machinery). Returns (rank, idCol, weight_micro). */
  def selectTopK(weights: DataFrame, idCol: String, k: Int): DataFrame =
    weights
      .agg(graft.functions.TopKByScore(
        col("weight_micro").cast("double"), col(idCol), k).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).as("rank"), col("col.id").as(idCol),
        col("col.score").cast("long").as("weight_micro"))
}
