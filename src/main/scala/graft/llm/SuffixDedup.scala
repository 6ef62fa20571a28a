package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Suffix-ranking exact-substring dedup (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better" — the
  * ExactSubstr family): every token position whose k-token window
  * occurs at ≥ 2 corpus positions is duplicated; per document the
  * duplicated windows merge into maximal spans and are CUT (all
  * occurrences removed — the released ExactSubstr semantics; keeping a
  * canonical copy is [[graft.llm.C4]]'s span rule, a different
  * operator).
  *
  * Same SEMANTICS as [[Spans.duplicatedSpans]], different MECHANISM —
  * and the difference is the point at 100 TB:
  *
  *  - the gram-hash path shuffles 8-byte xxhash64 window keys, an
  *    honest-but-documented collision contract that over-deduplicates
  *    once the corpus approaches 2³² windows (birthday bound; the r14
  *    C4 fix bought exact string keys for the same reason, at k× key
  *    width);
  *  - this path is EXACT with FIXED-WIDTH INTEGER keys at any k: a
  *    distributed suffix ranking by prefix doubling (Manber–Myers
  *    1990, recast on DataFrames). Round j assigns every corpus
  *    position an equality-class id for its 2^j-token window as the
  *    PAIR of its two 2^(j−1) classes — one self-join on (doc,
  *    pos+2^(j−1)), one map-side-combinable groupBy((cls, cls2)), with
  *    the class id = the MIN GLOBAL POSITION in the class (unique
  *    longs from [[graft.stats.GlobalOrder]]'s doc-offset prefix sum,
  *    so no global sort and no driver-side rank table is ever built —
  *    equality classes need a canonical representative, not an order).
  *    ⌈log₂ k⌉ rounds; each shuffles 3 fixed-width integer columns
  *    per token — never a k-token key, never a monolithic in-memory
  *    suffix array.
  *
  * The final k-window class is the standard sparse-table composition:
  * with h = 2^⌊log₂ k⌋, a k-window equals another iff their leading
  * and trailing h-windows match — key = (cls_h[pos], cls_h[pos+k−h]).
  *
  * End-of-document handling is rank-native (no sentinels): a position
  * with fewer than 2^j tokens remaining pairs with a NULL second
  * class and leaves the stream at round j's inner class join — which
  * is sound because no surviving window ever needs it: a VALID start
  * p (p + k ≤ n) has p + 2^(j−1) ≤ n − 2^(j−1) at every round, and
  * the same bound holds transitively for every successor a valid
  * start's key depends on, so only dead tail positions drop.
  *
  * SINGLETON PRUNING (VERDICT r15 "Next round" 2): a class with ONE
  * member is a window string occurring ONCE in the corpus — no
  * position keyed through it can ever be duplicated (two equal longer
  * windows would put ≥ 2 members in every sub-window class), so
  * singleton classes drop from `ranks` at every depth: globally
  * unique tokens before round 1, then per round after the class
  * aggregate. Positions whose SUCCESSOR was pruned get a NULL second
  * class and leave at the same inner join that handles doc ends —
  * correct for the same reason (their window contains a unique
  * sub-window). On Zipf corpora this sheds the long unique tail
  * within 2–3 rounds, leaving later rounds to shuffle only genuinely
  * repeated context; on the all-duplicated replica stress corpus it
  * prunes nothing and the decade is unchanged — both recorded in
  * SCALE.md. The final-key `hot` filter is unchanged (a k-window can
  * be unique even when both its h-window halves repeat).
  *
  * Pinned by the LlmSpec property test against [[Spans]]' gram-hash
  * path (identical spans on random corpora — at test scale hash
  * collisions are absent, so the two mechanisms must agree exactly)
  * and the llm_suffix_dedup DuckDB oracle (exact gram strings).
  */
object SuffixDedup {

  /** (idCol, start): every token position opening a duplicated
    * k-window, via the prefix-doubling ranking above. */
  def duplicatedWindowStartsReleasable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int): (DataFrame, () => Unit) = {
    require(k > 0, "window length must be positive")
    val spark = df.sparkSession
    val toks = split(trim(col(textCol)), "\\s+")
    // docs shorter than k tokens can host no k-window occurrence and
    // (with per-doc position keys) contribute to no other doc's
    // classes — excluded from the stream entirely
    val docs = df
      .withColumn("__toks", toks)
      .filter(col("__toks").isNotNull && size(col("__toks")) >= k &&
        !(size(col("__toks")) === 1 && element_at(col("__toks"), 1) === ""))
      .select(col(idCol).as("__id"), col("__toks"),
        size(col("__toks")).cast("long").as("__n"))
    // unique long per corpus position: doc offset (GlobalOrder prefix
    // sum over the doc-count-sized (id, n) table — P partials to the
    // driver, never the data) + in-doc position
    val (offsets, _, releaseOff) = graft.stats.GlobalOrder
      .exclusivePrefixReleasable(
        docs.select(col("__id"), col("__n")),
        Seq(col("__id")), col("__n"), "__off")
    val base = docs
      .join(offsets.select(col("__id"), col("__off")), Seq("__id"))
      // generator first, arithmetic on its output in a second select
      .select(col("__id"), col("__off"), col("__n"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .select(col("__id"), col("__pos").cast("long").as("__pos"),
        col("__tok"),
        (col("__off") + col("__pos")).as("__g"),
        // valid k-window starts, judged once here and carried through
        // the rounds as one boolean
        (col("__pos") + k <= col("__n")).as("__valid"))
      .persist()
    base.count()
    releaseOff()
    // depth-1 classes: min global position among equal tokens (exact
    // string equality — the only round that touches token strings);
    // globally unique tokens are singleton classes → pruned before
    // the doubling rounds (scaladoc: SINGLETON PRUNING)
    val cls0 = base.groupBy("__tok")
      .agg(min("__g").as("__cls"), count(lit(1)).as("__nc"))
    var ranks = base
      .join(cls0, Seq("__tok"))
      .filter(col("__nc") > 1)
      .select(col("__id"), col("__pos"), col("__g"), col("__valid"),
        col("__cls"))
      .persist()
    ranks.count()
    base.unpersist()
    // doubling rounds to depth h = 2^⌊log₂ k⌋
    val a = (31 - Integer.numberOfLeadingZeros(k))
    var j = 1
    while (j <= a) {
      val h = 1L << (j - 1)
      val shifted = ranks.select(col("__id"),
        (col("__pos") - h).as("__pos"), col("__cls").as("__cls2"))
      // inner on the pair: a NULL second class (doc end, or successor
      // pruned as unique) exits here — both provably non-duplicated
      val paired = ranks.join(shifted, Seq("__id", "__pos"), "left")
      val classes = paired.groupBy("__cls", "__cls2")
        .agg(min("__g").as("__ncls"), count(lit(1)).as("__nc"))
      val next = paired.join(classes, Seq("__cls", "__cls2"))
        .filter(col("__nc") > 1) // singleton class = unique window
        .select(col("__id"), col("__pos"), col("__g"), col("__valid"),
          col("__ncls").as("__cls"))
        .persist()
      next.count()
      ranks.unpersist()
      // one round references `ranks` three times — truncate lineage
      // before the analyzed plan compounds (the starContract lesson)
      ranks = if (j % 3 == 0 && j < a) {
        val cp = next.localCheckpoint()
        next.unpersist()
        cp
      } else next
      j += 1
    }
    // k-window key = (leading h-class, trailing h-class); valid starts
    // guarantee the second lookup exists, so the join is inner
    val h2 = 1L << a
    val second = ranks.select(col("__id"),
      (col("__pos") - (k - h2)).as("__pos"), col("__cls").as("__cls2"))
    val keys = ranks.filter(col("__valid"))
      .join(second, Seq("__id", "__pos"))
      .select(col("__id"), col("__pos"), col("__cls"), col("__cls2"))
    val hot = keys.groupBy("__cls", "__cls2")
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select("__cls", "__cls2")
    val out = keys.join(hot, Seq("__cls", "__cls2"))
      .select(col("__id").as(idCol), col("__pos").as("start"))
    val finalRanks = ranks
    (out, () => { finalRanks.unpersist(); () })
  }

  /** Maximal duplicated-substring spans ≥ k tokens, (idCol,
    * span_start, span_end, n_grams) — [[Spans.duplicatedSpans]]'
    * output shape from the exact suffix-ranking mechanism. */
  def duplicatedSuffixSpansReleasable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int): (DataFrame, () => Unit) = {
    val (starts, release) =
      duplicatedWindowStartsReleasable(df, textCol, idCol, k)
    (Spans.mergeIslands(starts, idCol, k), release)
  }

  /** The ExactSubstr ACTION: rewrite `textCol` with every duplicated
    * span cut out (the [[Spans.removeDuplicatedSpans]] contract —
    * span-free docs keep their bytes, fully-duplicated docs become the
    * empty string for downstream length gates to judge). */
  def dedupExactSubstringsReleasable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int): (DataFrame, () => Unit) = {
    val (spans, release) =
      duplicatedSuffixSpansReleasable(df, textCol, idCol, k)
    (Spans.cutSpansRewrite(df, spans, textCol, idCol), release)
  }
}
