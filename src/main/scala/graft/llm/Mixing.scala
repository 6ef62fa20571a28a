package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic source-weighted data mixing — the "sample source A at
  * 25%, keep B whole" stage every pretraining corpus assembly runs.
  * Selection is a pure function of the row id (FNV-1a of the id
  * rendered as a string, taken mod 1000 — the [[graft.functions.Fnv64]]
  * kernel, so the decision is reproducible across runs, partitionings,
  * and engines, and the DuckDB oracle replays it exactly), which makes
  * the mix auditable: the same row is kept or dropped forever, no RNG
  * state. Map-only — a filter over one scan, nothing moves.
  */
object Mixing {

  /** Keep each row of `df` with its source's rate (resolution 1/1000,
    * rates in [0, 1]; sources absent from the map use `defaultRate`).
    * A row survives iff `bucket(id) < round(rate·1000)` where
    * `bucket = pmod(fnv64(cast(id as string)), 1000)`. */
  def mixBySources(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val rateCol = coalesce(
      element_at(typedlit(rates), col(sourceCol)),
      lit(defaultRate))
    df.filter(bucket(col(idCol)) < round(rateCol * 1000d).cast("long"))
  }

  private def bucket(id: org.apache.spark.sql.Column) =
    pmod(graft.functions.Fnv64(id.cast("string")), lit(1000L))

  /** Leakage-controlled train/validation split: rows are assigned by
    * the deterministic id-hash bucket of their NEAR-DUP COMPONENT —
    * not their own id — so a document and every near-duplicate of it
    * always land in the SAME split. That is the leakage-control rule
    * an eval pipeline needs: a near-dup of a validation document
    * sitting in train is contamination a per-row split cannot prevent
    * (at a 10% val rate, ~19% of near-dup pairs would straddle).
    * `nearDupPairs` is any verified pair table ((ida, idb) —
    * [[Dedup.lshCandidates]]/[[Dedup.embeddingNearDups]] output);
    * rows with no near-dup edge are their own singleton component.
    *
    * Output: `df` plus `component` (min id of the row's near-dup
    * component — the [[Dedup.nearDupComponents]] label) and `splitCol`
    * ('val' iff bucket(component) < round(valFraction·1000), the
    * [[mixBySources]] resolution and determinism contract).
    *
    * Scale shape: components are edge-bounded
    * ([[Dedup.nearDupComponents]] — driver union-find under the edge
    * cap, distributed min-label propagation above) and the labels
    * join back on the id — one hash join, broadcastable while the
    * near-dup set is small relative to the corpus (it is, by
    * definition of dedup). The split itself is map-only. */
  def leakageSplit(
      df: DataFrame,
      idCol: String,
      nearDupPairs: DataFrame,
      valFraction: Double,
      splitCol: String = "split"): DataFrame = {
    require(valFraction >= 0 && valFraction <= 1,
      "valFraction must be in [0, 1]")
    val comps = Dedup.nearDupComponents(nearDupPairs)
      .toDF(idCol, "__component")
    df.join(comps, Seq(idCol), "left")
      .withColumn("component",
        coalesce(col("__component"), col(idCol)))
      .withColumn(splitCol,
        when(bucket(col("component")) <
          round(lit(valFraction) * 1000d).cast("long"), "val")
          .otherwise("train"))
      .drop("__component")
  }

  /** General mixing with UP-weighting: weight 2.3 emits 2 copies of
    * every row plus a 3rd for the 30% of ids whose bucket falls under
    * the fractional part — the standard way high-quality sources are
    * over-represented in a pretraining mix. Output carries `copy_idx`
    * (0-based) so downstream ids stay unique; weight < 1 degenerates
    * to [[mixBySources]] selection. Same determinism contract: copies
    * are a pure function of (id, source weight). Map-only — the only
    * data growth is the emitted copies themselves. */
  /** Temperature-scaled source mixing (the UniMax/multilingual-sampling
    * shape): source shares are flattened to pᵢ ∝ nᵢ^(1/T) — T = 1
    * keeps natural proportions, T → ∞ approaches uniform — and every
    * source is then kept/up-weighted by wᵢ = pᵢ·target/nᵢ so the
    * expected output size is `targetRows` (the corpus size when 0).
    * Over-represented sources are down-sampled, under-represented ones
    * replicated, via [[mixBySourcesWeighted]]'s deterministic id-hash
    * machinery.
    *
    * Scale shape: pass 1 is one groupBy-count — #sources rows to the
    * driver (sources are a handful of corpus labels, never data-sized);
    * the weights fold into pass 2's map-only filter/explode. The
    * normalizer is summed in SORTED source order — a fixed float fold
    * order, so the mix is reproducible across partitionings and
    * mirrorable by an external engine. */
  def mixByTemperature(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      temperature: Double,
      targetRows: Long = 0L): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    // Null sources are excluded from the share computation — they would
    // otherwise surface as a null groupBy key and NPE the driver-side
    // sort (ADVICE r06). Pass 2 drops them anyway (defaultWeight 0.0).
    val cnts = df.filter(col(sourceCol).isNotNull)
      .groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(cnts.nonEmpty, "empty corpus (or all sources null)")
    val n = cnts.map(_._2).sum
    val target = (if (targetRows > 0) targetRows else n).toDouble
    val pows = cnts.map { case (s, ni) =>
      s -> math.pow(ni.toDouble, 1.0 / temperature)
    }
    val z = pows.map(_._2).foldLeft(0.0)(_ + _)
    val weights = cnts.zip(pows).map { case ((s, ni), (_, pw)) =>
      s -> pw / z * target / ni.toDouble
    }.toMap
    mixBySourcesWeighted(df, sourceCol, idCol, weights, defaultWeight = 0.0)
  }

  def mixBySourcesWeighted(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be >= 0")
    val w = coalesce(
      element_at(typedlit(weights), col(sourceCol)), lit(defaultWeight))
    val copies = (floor(w).cast("long") +
      when(bucket(col(idCol)) < round((w - floor(w)) * 1000d).cast("long"),
        1L).otherwise(0L)).as("__copies")
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Deterministic global shard-shuffle — the "shard and shuffle before
    * training" stage: every row gets a `shard` (= pmod(fnv64(id),
    * nShards)) and a dense 0-based `pos` within its shard, ordered by
    * the id hash (ties broken by id). The result is a reproducible
    * pseudo-random training order: a pure function of the id set, no
    * RNG state, identical across runs/partitionings/engines — and
    * near-duplicate input orderings (sorted-by-source, crawl order)
    * are destroyed because the hash is uncorrelated with any input
    * attribute.
    *
    * Scale shape: ONE shuffle (the window's hash partitioning by
    * shard). Shards are hash-balanced (~N/nShards rows each), so the
    * per-shard sort that ranks `pos` is bounded at `nShards` chosen
    * for the cluster (one shard ≈ one training-file target size) —
    * there is no global sort and no single-partition window. Writers
    * follow with `.repartition(col("shard")).sortWithinPartitions
    * ("pos")` to emit one ordered file per shard. */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int)
      : DataFrame =
    hashOrder(df, idCol, nShards, graft.functions.Fnv64(
      col(idCol).cast("string")))

  /** Epoch-distinct deterministic reshuffle: the [[shardShuffle]]
    * order keyed by FNV-1a of `"<id>:<epoch>"` — each epoch is an
    * independent-looking but fully reproducible permutation of the
    * same corpus (multi-epoch training wants a DIFFERENT order per
    * pass; re-reading the same shard files in the same order every
    * epoch measurably hurts convergence, and an RNG-seeded shuffle is
    * not replayable across engines/partitionings). The `':'` salt
    * separator keeps the epoch from gluing onto numeric ids
    * ambiguously (`id=1,e=12` vs `id=11,e=2`).
    *
    * Scale shape: identical to [[shardShuffle]] — ONE shuffle, the
    * per-shard window sort bounded by the caller's shard sizing; each
    * epoch's layout is produced independently (epochs never join). */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int, epoch: Int)
      : DataFrame = {
    require(epoch >= 0, s"epoch must be non-negative (got $epoch)")
    hashOrder(df, idCol, nShards, graft.functions.Fnv64(
      concat(col(idCol).cast("string"), lit(s":$epoch"))))
  }

  private def hashOrder(
      df: DataFrame, idCol: String, nShards: Int,
      h: org.apache.spark.sql.Column): DataFrame = {
    require(nShards >= 1, "nShards must be at least 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__hv"), col(idCol))
    df.withColumn("__hv", h)
      .withColumn("shard", pmod(col("__hv"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__hv")
  }

  /** Materialize the shard-shuffle as the training-file layout its
    * scaladoc promises: parquet partitioned by `shard`, each shard's
    * single file sorted by `pos` (repartition on the shard column +
    * sortWithinPartitions — one exchange beyond [[shardShuffle]]'s
    * window, no global sort). A trainer then streams
    * `shard=K/part-*.parquet` files as ready-ordered input. */
  def writeShards(
      df: DataFrame, idCol: String, nShards: Int, path: String): Unit =
    shardShuffle(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Token-budget mixture ALLOCATION under availability caps (r14) —
    * the step before [[mixBySourcesWeighted]] in every pretraining
    * corpus assembly: given how many tokens each source HAS and the
    * desired mixture weights, how many tokens may each source
    * contribute to a total budget `totalBudget`? Proportional shares
    * alone overshoot scarce sources, so the pinned rule is integer
    * WATER-FILLING:
    *
    *  - each round splits the remaining budget over the UNSETTLED
    *    sources proportionally to their milli-weights,
    *    `prop_i = floor(T_rem · w_i / W_unsettled)` (exact integers,
    *    BigInt intermediates — no overflow at any corpus size);
    *  - every unsettled source whose share exceeds its availability is
    *    CAPPED at that availability and its unused share re-enters the
    *    pool; when no source overflows, the rest settle at their
    *    shares and the fixed point is reached (≤ |sources| rounds);
    *  - flooring residue (< |unsettled| tokens per final round) stays
    *    unallocated by design — the caller rounds corpora, not tokens;
    *  - sources absent from `weightsMilli` carry weight 0 (allocated
    *    0); an all-zero-weight pool settles at 0.
    *
    * Deterministic, reproducible, and SQL-mirrorable — no floats
    * anywhere. The availability table is source-bounded, so the
    * driver-side fixed point is over a handful of rows (the vocab /
    * centroid collect discipline); the only distributed work is
    * whatever aggregate PRODUCED the availability counts.
    *
    * Returns (sourceCol, tokens_available, weight_milli,
    * tokens_allocated, capped) — `capped` marks sources pinned at
    * their availability. */
  def allocateBudget(
      avail: DataFrame,
      sourceCol: String,
      availCol: String,
      weightsMilli: Map[String, Long],
      totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be non-negative")
    require(weightsMilli.values.forall(_ >= 0L),
      "weights must be non-negative")
    val rows = avail
      .select(col(sourceCol).cast("string"), col(availCol).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(rows.map(_._1).distinct.length == rows.length,
      "availability table must have one row per source")
    require(rows.forall(_._2 >= 0L), "availability must be non-negative")
    val w = rows.map { case (s, _) => weightsMilli.getOrElse(s, 0L) }
    val c = rows.map(_._2)
    val (alloc, capped) = waterFill(w, c, BigInt(totalBudget))
    val spark = avail.sparkSession
    import spark.implicits._
    rows.indices.map(i =>
        (rows(i)._1, c(i), w(i), alloc(i), capped(i))).toSeq
      .toDF(sourceCol, "tokens_available", "weight_milli",
        "tokens_allocated", "capped")
  }

  /** One integer water-filling fixed point (the pinned rule in
    * [[allocateBudget]]'s scaladoc) over parallel weight/cap arrays;
    * returns (alloc, capped). Driver-side, |sources|-bounded. */
  private def waterFill(w: Array[Long], c: Array[Long], budget: BigInt)
      : (Array[Long], Array[Boolean]) = {
    val alloc = Array.fill[Long](w.length)(-1L) // -1 = unsettled
    val capped = Array.fill(w.length)(false)
    var tRem = budget
    var done = false
    while (!done) {
      val unsettled = alloc.indices.filter(alloc(_) < 0L)
      if (unsettled.isEmpty) done = true
      else {
        val bigW = unsettled.map(i => BigInt(w(i))).sum
        val prop = unsettled.map(i =>
          if (bigW == 0) BigInt(0) else tRem * w(i) / bigW)
        val over = unsettled.zip(prop).filter { case (i, p) => p > c(i) }
        if (over.nonEmpty) {
          over.foreach { case (i, _) =>
            alloc(i) = c(i); capped(i) = true; tRem -= c(i)
          }
        } else {
          unsettled.zip(prop).foreach { case (i, p) =>
            alloc(i) = p.toLong
          }
        }
      }
    }
    (alloc, capped)
  }

  /** Epoch-repetition-aware budget allocation (r15) — the
    * data-constrained regime of Muennighoff et al. 2023 ("Scaling
    * Data-Constrained Language Models"): when the token budget exceeds
    * what the mixture can supply in one pass, scarce-but-valuable
    * sources are REPEATED for extra epochs instead of silently
    * under-served, and repeated tokens are worth less than fresh ones.
    *
    * Extends [[allocateBudget]]'s integer water-filling with
    * corpus-wide EPOCH LAYERS:
    *
    *  - epoch r carries per-source weight
    *    `w_i^(r) = floor(w_i · decayMilli^(r−1) / 1000^(r−1))` — the
    *    diminishing-value schedule. A source whose decayed weight
    *    floors to 0 stops repeating (marginal value exhausted) even
    *    below `maxEpochs`, the hard cap;
    *  - epochs fill IN ORDER: while the remaining budget covers a full
    *    epoch of every still-valuable source, each takes exactly its
    *    availability again; the first epoch the budget cannot fill
    *    whole is the PARTIAL round — one water-filling fixed point
    *    over the active sources with their decayed weights and
    *    per-epoch availability caps (so within the partial round the
    *    flooring of the decay schedule, not the raw weights, sets the
    *    split);
    *  - `maxEpochs = 1` reduces exactly to [[allocateBudget]] (pinned
    *    in the spec); budget beyond every allowed epoch stays
    *    unallocated, and flooring residue follows the r14 rule.
    *
    * All arithmetic integer/BigInt — deterministic, order-insensitive,
    * SQL-mirrorable; the fixed point runs on the driver over the
    * source-bounded availability table.
    *
    * Returns (sourceCol, tokens_available, weight_milli,
    * tokens_allocated, epochs, capped): `epochs` =
    * ceil(allocated / available) — the passes a trainer schedules;
    * `capped` = the source is pinned at availability in its FINAL
    * round (full epochs pin; a partial-round settle below availability
    * does not). */
  def allocateBudgetEpochs(
      avail: DataFrame,
      sourceCol: String,
      availCol: String,
      weightsMilli: Map[String, Long],
      totalBudget: Long,
      maxEpochs: Int,
      decayMilli: Long): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be non-negative")
    require(weightsMilli.values.forall(_ >= 0L),
      "weights must be non-negative")
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    require(decayMilli >= 0L && decayMilli <= 1000L,
      "decayMilli must be in [0, 1000]")
    val rows = avail
      .select(col(sourceCol).cast("string"), col(availCol).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(rows.map(_._1).distinct.length == rows.length,
      "availability table must have one row per source")
    require(rows.forall(_._2 >= 0L), "availability must be non-negative")
    val w = rows.map { case (s, _) => weightsMilli.getOrElse(s, 0L) }
    val c = rows.map(_._2)
    val alloc = Array.fill[Long](rows.length)(0L)
    val capped = Array.fill(rows.length)(false)
    var tRem = BigInt(totalBudget)
    var r = 1
    var partialDone = false
    while (r <= maxEpochs && !partialDone && tRem > 0) {
      // decayed milli-weights of this epoch, floored exactly
      val wr = w.map(wi => (BigInt(wi) * BigInt(decayMilli).pow(r - 1) /
        BigInt(1000).pow(r - 1)).toLong)
      // active = still-valuable this epoch (same criterion as the SQL
      // mirror; zero-availability actives keep allocateBudget's
      // pinned-at-zero capped semantics)
      val active = wr.indices.filter(wr(_) >= 1L)
      val epochCap = active.map(i => BigInt(c(i))).sum
      if (active.isEmpty) partialDone = true
      else if (tRem >= epochCap) {
        active.foreach { i => alloc(i) += c(i); capped(i) = true }
        tRem -= epochCap
        r += 1
      } else {
        val (pa, pc) = waterFill(
          active.map(wr).toArray, active.map(c).toArray, tRem)
        active.indices.foreach { k =>
          alloc(active(k)) += pa(k)
          // final-round verdict overrides any full-epoch pin
          capped(active(k)) = pc(k)
        }
        partialDone = true
      }
    }
    val epochs = rows.indices.map(i =>
      if (c(i) == 0L || alloc(i) == 0L) 0L
      else (alloc(i) + c(i) - 1L) / c(i))
    val spark = avail.sparkSession
    import spark.implicits._
    rows.indices.map(i =>
        (rows(i)._1, c(i), w(i), alloc(i), epochs(i), capped(i))).toSeq
      .toDF(sourceCol, "tokens_available", "weight_milli",
        "tokens_allocated", "epochs", "capped")
  }

  /** Scale of the domain weights [[reweightDomains]] maintains:
    * giga (10^9) — enough head-room that the per-round floor loses
    * at most one part in 10^9 per source. */
  val WeightScale = 1000000000L

  /** DoReMi-shaped domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * multiplicative-weights ascent on per-domain EXCESS losses — the
    * Group-DRO inner loop that upweights the domains the proxy model
    * finds hardest. DoReMi's continuous update `α ← α·exp(η·ℓ̂)` is
    * replaced by its pinned integer linearization so every round is
    * exact and SQL-mirrorable (the engine-wide no-float-iteration
    * discipline):
    *
    *  - excess_i = loss_i − min_j loss_j (the best domain sets the
    *    zero — a per-batch reference-model baseline in the paper, the
    *    observed minimum here, both shift-invariant);
    *  - init m_i = floor(WeightScale / n), uniform;
    *  - each round: g_i = m_i · (1 000 000 + ηMilli · excess_i)
    *    (the multiplier is micro-scaled: milli·milli = micro), then
    *    renormalize m_i ← floor(g_i · WeightScale / Σ_j g_j) — all
    *    BigInt, deterministic, order-insensitive;
    *  - final smoothing (the paper's uniform mix-in):
    *    smoothed_i = floor(m_i · (1000 − uMilli) / 1000)
    *               + floor(WeightScale · uMilli / (1000 · n)).
    *
    * Returns (sourceCol, loss_milli, excess_milli, weight_giga,
    * weight_smoothed_giga). `losses` is the SOURCE-BOUNDED per-domain
    * loss table (one row per domain — the output of whatever corpus
    * aggregate measured the loss); the fixed point runs on the driver
    * like [[allocateBudget]], never touching corpus-sized data. */
  def reweightDomains(
      losses: DataFrame,
      sourceCol: String,
      lossCol: String,
      rounds: Int,
      etaMilli: Long,
      smoothMilli: Long = 0L): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    require(etaMilli >= 0L, "etaMilli must be non-negative")
    require(smoothMilli >= 0L && smoothMilli <= 1000L,
      "smoothMilli must be in [0, 1000]")
    val rows = losses
      .select(col(sourceCol).cast("string"), col(lossCol).cast("long"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0), "null domain name in losses table")
        // a zero-token domain's upstream `chars div toks` is null —
        // surface it as a domain-level error, not an opaque NPE
        // (ADVICE r15)
        require(!r.isNullAt(1),
          s"null $lossCol for domain '${r.getString(0)}' — every " +
            "domain needs a measured loss (a zero-token domain " +
            "divides to null upstream)")
        (r.getString(0), r.getLong(1))
      }
      .sortBy(_._1)
    require(rows.nonEmpty, "losses table is empty")
    require(rows.map(_._1).distinct.length == rows.length,
      "losses table must have one row per domain")
    val n = rows.length
    val minLoss = rows.map(_._2).min
    val excess = rows.map { case (_, l) => l - minLoss }
    var m = Array.fill(n)(BigInt(WeightScale) / n)
    var r = 0
    while (r < rounds) {
      val g = m.indices.map(i =>
        m(i) * (BigInt(1000000) + BigInt(etaMilli) * excess(i)))
      val tot = g.sum
      // all-zero weights can only happen if every m hit 0 (impossible
      // from the uniform init with non-negative multipliers ≥ 10^6,
      // which preserve positivity) — guard anyway for clarity
      require(tot > 0, "degenerate zero total weight")
      m = g.map(_ * WeightScale / tot).toArray
      r += 1
    }
    val smoothed = m.map(mi =>
      (mi * (1000 - smoothMilli) / 1000 +
        BigInt(WeightScale) * smoothMilli / (1000 * n)).toLong)
    val spark = losses.sparkSession
    import spark.implicits._
    rows.indices.map(i => (rows(i)._1, rows(i)._2, excess(i),
        m(i).toLong, smoothed(i))).toSeq
      .toDF(sourceCol, "loss_milli", "excess_milli", "weight_giga",
        "weight_smoothed_giga")
  }
}
