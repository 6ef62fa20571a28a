package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style hashed linear text classification — the
  * inference-time quality/domain filter of public training-data
  * pipelines (the CCNet / DCLM / FineWeb-Edu shape: a linear model over
  * hashed word n-gram features, applied to every document of the
  * corpus). The reference has no counterpart; training the model is an
  * offline, sample-sized job — SCORING the full corpus is the
  * 100 TB-scale operation this operator owns.
  *
  * Features are word n-gram FNV-1a hashes WITH repetitions
  * ([[graft.functions.NgramHashes]], the fused byte-level kernel) folded
  * into `buckets` by pmod — the fastText hashing trick. The model is a
  * dense weight array indexed by bucket.
  *
  * Scale shape (100 TB): scoring is MAP-ONLY — the weights frame is
  * reduced to ONE dense-array row (built distributively, missing
  * buckets → 0) and broadcast; each document folds its own feature
  * buckets over that array with `aggregate`, inside whole-stage
  * codegen. No explode, no per-feature join, no shuffle of any
  * corpus-sized data. `buckets` bounds the broadcast (8 B/bucket: 2^22
  * buckets = 32 MB, the practical ceiling fastText itself uses).
  *
  * Arithmetic is integer-exact end to end: weights are given in
  * thousandths (`weight_milli`), the per-doc sum is a long, and the
  * decision `logit_num > 0` never touches floating point — `logit`
  * (bias + mean feature weight) is derived by ONE double division for
  * human consumption, so an ANSI-SQL oracle reproduces every column
  * bit for bit. Sigmoid is monotonic, so thresholding the logit IS
  * thresholding the probability — no `exp` whose libm rounding could
  * diverge across engines. */
object Classify {

  /** Score documents with a hashed linear model.
    *
    * @param weights  (bucket, weight_milli) — sparse model rows;
    *                 buckets outside [0, buckets) are rejected, missing
    *                 buckets weigh 0
    * @param buckets  hash-fold width (fastText `-bucket`)
    * @param biasMilli  intercept, in thousandths
    * @param ngramOrders  feature template: which word n-gram orders to
    *                     hash (fastText `-wordNgrams 2` ≡ Seq(1, 2))
    * @return (id, n_feats, wsum_milli, logit, pass): occurrence count,
    *         integer weight sum, bias + mean weight (double), and the
    *         exact integer decision `bias*n + wsum > 0`
    */
  def scoreHashedLinear(
      df: DataFrame,
      textCol: String,
      idCol: String,
      weights: DataFrame,
      buckets: Int,
      biasMilli: Long = 0L,
      ngramOrders: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 22),
      s"buckets must be in (0, 2^22] (got $buckets) — the dense model " +
        "array is broadcast to every executor")
    require(ngramOrders.nonEmpty, "at least one n-gram order")
    // one dense-array row; built on executors, broadcast to the scan
    val model = weights
      .select(col("bucket").cast("int").as("bucket"),
        col("weight_milli").cast("long").as("w"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("w"))))
        .as("m"))
      .select(transform(sequence(lit(0), lit(buckets - 1)),
        b => coalesce(element_at(col("m"), b), lit(0L))).as("warr"))
    val text = coalesce(col(textCol), lit(""))
    val feats: Column = ngramOrders
      .map(n => graft.functions.NgramHashes(text, n))
      .reduce(concat(_, _))
    df.crossJoin(broadcast(model))
      .select(col(idCol),
        transform(feats, h => pmod(h, lit(buckets.toLong))).as("fb"),
        col("warr"))
      .select(col(idCol),
        size(col("fb")).cast("long").as("n_feats"),
        aggregate(col("fb"), lit(0L),
          (acc, b) => acc + element_at(col("warr"), b.cast("int") + 1))
          .as("wsum_milli"))
      .select(col(idCol), col("n_feats"), col("wsum_milli"),
        ((lit(biasMilli) * col("n_feats") + col("wsum_milli"))
          .cast("double") / (col("n_feats") * 1000L).cast("double"))
          .as("logit"),
        (lit(biasMilli) * col("n_feats") + col("wsum_milli") > 0L)
          .as("pass"))
  }
}
