package graft.llm

import scala.collection.mutable

/** Driver-side BATCHED merge training for the [[Bpe]] and [[WordPiece]]
  * tokenizer families (VERDICT r15 "Next round" 1).
  *
  * The distributed merge loops are data-scale-safe (each round touches
  * only the distinct-word table) but cost 2 scheduled Spark jobs PER
  * MERGE — a production 32k–100k-merge vocabulary is ~10⁵ jobs of
  * fixed scheduling overhead, days of driver wall time independent of
  * cluster size. The distinct-word HISTOGRAM, however, is Zipf-bounded
  * (millions of rows at any corpus size, each a short string + a
  * count), so the SentencePiece shape applies: aggregate the histogram
  * ONCE on the cluster, collect it under an explicit size guard, and
  * train every merge in driver memory — 2 jobs total instead of
  * 2·nMerges. Past the guard, [[Bpe.learnMerges]] /
  * [[WordPiece.learnMerges]] fall back to the distributed loop
  * unchanged, so no corpus can OOM the driver.
  *
  * The in-memory loops replay the distributed semantics EXACTLY — same
  * pair counting (every adjacent position, overlaps included), same
  * leftmost-non-overlapping fold, same argmax tie-breaks under
  * SPARK's string order (UTF-8 binary = code-point order, NOT Java's
  * UTF-16 `String.compareTo`, which disagrees beyond the BMP) — and
  * the BpeSpec/WordPieceSpec property tests pin driver-path ≡
  * distributed-path merge sequences on random corpora.
  *
  * Cost shape, per family:
  *  - BPE scores by raw pair count, which for any LIVE pair only ever
  *    drops (merging (l,r) removes/splits occurrences; new pairs enter
  *    by push) — so a LAZY MAX-HEAP with stale-entry validation gives
  *    amortized O(log P) argmax and each merge re-touches only the
  *    words that contain the merged pair (inverted pair→word index).
  *  - WordPiece scores by `c_pair/(c_l·c_r)`, where a pair's score can
  *    RISE when an unrelated merge lowers c_l or c_r — a lazy heap
  *    would surface stale maxima, so the argmax is an O(P) scan of the
  *    live pair table per round (P = live distinct pairs). Merge
  *    application still re-touches only the affected words.
  */
private[llm] object MergeTrainer {

  /** Spark's string comparison: UTF-8 binary order ≡ code-point order.
    * Java's `String.compareTo` is UTF-16 code-unit order, which sorts
    * supplementary characters (surrogate range 0xD800–0xDFFF) BELOW
    * U+E000..U+FFFF — the opposite of Spark — so tie-breaks must go
    * through this comparator to replay the distributed argmax. */
  private[llm] def utf8Compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Code-point symbols of a word — the `substring(word, i, 1)` split
    * of the distributed loop (surrogate pairs stay whole). */
  private[llm] def splitCodePoints(word: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** The leftmost-non-overlapping merge fold (the `aggregate` lambda
    * of the distributed loops, element-for-element): append each
    * symbol, except that an `r` landing right after an `l` replaces
    * the pair with `merged` — and the just-created `merged` is what
    * the NEXT symbol is compared against, so overlapping occurrences
    * resolve left-to-right. */
  private[llm] def foldMerge(
      syms: Array[String],
      l: String,
      r: String,
      merged: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (out.nonEmpty && out.last == l && x == r)
        out(out.length - 1) = merged
      else
        out += x
      i += 1
    }
    out.toArray
  }

  /** Shared mutable training state over the distinct-word histogram:
    * per-word symbol arrays, live pair counts (every adjacent
    * position, overlaps included, weighted by word frequency), and
    * the pair → word-index inverted index that makes each merge
    * re-touch only the words containing it. */
  private final class State(words: Seq[(String, Long)], marker: Boolean) {
    val syms: Array[Array[String]] = words.map { case (w, _) =>
      val cps = splitCodePoints(w)
      if (marker) cps.zipWithIndex.map { case (s, i) =>
        if (i == 0) s else "##" + s
      } else cps
    }.toArray
    val cnts: Array[Long] = words.map(_._2).toArray
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // symbol occurrence counts (WordPiece's c_l/c_r; cheap to keep
    // for BPE too)
    val symCount = mutable.HashMap.empty[String, Long]

    {
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        val c = cnts(wi)
        var i = 0
        while (i < s.length) {
          symCount.updateWith(s(i)) {
            case Some(v) => Some(v + c); case None => Some(c)
          }
          if (i + 1 < s.length) {
            val p = (s(i), s(i + 1))
            pairCount.updateWith(p) {
              case Some(v) => Some(v + c); case None => Some(c)
            }
            pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
          }
          i += 1
        }
        wi += 1
      }
    }

    /** Apply merge (l, r) → merged to every word containing the pair;
      * returns the set of pairs whose live count changed (with their
      * new counts — 0 = removed), for the caller's heap pushes. */
    def applyMerge(l: String, r: String, merged: String)
        : mutable.HashMap[(String, String), Long] = {
      val touched = mutable.HashMap.empty[(String, String), Long]
      def bump(p: (String, String), d: Long): Unit = {
        val now = pairCount.getOrElse(p, 0L) + d
        if (now == 0L) pairCount.remove(p)
        else pairCount(p) = now
        touched(p) = now
      }
      val affected = pairWords.get((l, r)) match {
        case Some(s) => s.toArray
        case None => Array.empty[Int]
      }
      java.util.Arrays.sort(affected)
      affected.foreach { wi =>
        val old = syms(wi)
        // the index can hold stale entries (the pair got merged away
        // by an earlier round's rewrite of this word) — verify live
        var has = false
        var i = 0
        while (i + 1 < old.length && !has) {
          if (old(i) == l && old(i + 1) == r) has = true
          i += 1
        }
        if (has) {
          val c = cnts(wi)
          i = 0
          while (i < old.length) {
            symCount(old(i)) -= c
            if (symCount(old(i)) == 0L) symCount.remove(old(i))
            if (i + 1 < old.length) bump((old(i), old(i + 1)), -c)
            i += 1
          }
          val next = foldMerge(old, l, r, merged)
          syms(wi) = next
          i = 0
          while (i < next.length) {
            symCount.updateWith(next(i)) {
              case Some(v) => Some(v + c); case None => Some(c)
            }
            if (i + 1 < next.length) {
              val p = (next(i), next(i + 1))
              bump(p, c)
              pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
            }
            i += 1
          }
        }
      }
      pairWords.remove((l, r))
      touched
    }
  }

  /** In-memory BPE training: the distributed loop's merge sequence,
    * bit for bit, in 0 Spark jobs. */
  private[llm] def bpeMerges(
      words: Seq[(String, Long)],
      nMerges: Int,
      minPairCount: Long): Seq[(String, String, Long)] = {
    val st = new State(words, marker = false)
    // max-heap under (count DESC, l ASC, r ASC) — Spark's
    // orderBy(desc(c), l, r) with UTF-8 string order
    val ord = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String),
          b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val lc = utf8Compare(a._2, b._2)
          if (lc != 0) -lc else -utf8Compare(a._3, b._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    st.pairCount.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      // pop past stale entries: an entry is CURRENT iff its count
      // matches the live table (every count change pushed a fresh
      // entry, so the true maximum always has a current entry above
      // any stale one — counts of live pairs only ever drop)
      var best: (Long, String, String) = null
      while (best == null && heap.nonEmpty) {
        val e = heap.dequeue()
        if (st.pairCount.getOrElse((e._2, e._3), 0L) == e._1) best = e
      }
      if (best == null || best._1 < minPairCount) done = true
      else {
        val (c, l, r) = best
        out += ((l, r, c))
        val touched = st.applyMerge(l, r, l + r)
        touched.foreach { case ((pl, pr), now) =>
          if (now > 0L) heap.enqueue((now, pl, pr))
        }
      }
      round += 1
    }
    out.result()
  }

  /** In-memory WordPiece training: likelihood-gain argmax by O(P)
    * scan per round (scores can rise as symbol counts fall, so a lazy
    * heap is unsound here — see object scaladoc). */
  private[llm] def wordPieceMerges(
      words: Seq[(String, Long)],
      nMerges: Int,
      minPairCount: Long): Seq[(String, String, Long, Long)] = {
    val st = new State(words, marker = true)
    // sq ≤ 10^12 always fits a Long (c ≤ min(cl, cr)); the fast path
    // computes it in Long arithmetic when the intermediate products
    // fit, falling back to BigInt for web-scale counts — same floor
    // quotient either way
    def scoreQ(c: Long, cl: Long, cr: Long): Long =
      if (c <= 9000000L && cl <= Long.MaxValue / cr)
        (c * 1000000000000L) / (cl * cr)
      else
        ((BigInt(c) * 1000000000000L) /
          (BigInt(cl) * BigInt(cr))).toLong
    val out = Seq.newBuilder[(String, String, Long, Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      // argmax under (score_q DESC, c DESC, l ASC, r ASC), scores in
      // the pinned exact-integer quantization of the distributed loop
      var bl: String = null
      var br: String = null
      var bc = 0L
      var bsq = -1L
      st.pairCount.foreach { case ((l, r), c) =>
        if (c >= minPairCount) {
          val sq = scoreQ(c, st.symCount(l), st.symCount(r))
          val better =
            if (bl == null) true
            else if (sq != bsq) sq > bsq
            else if (c != bc) c > bc
            else {
              val lc = utf8Compare(l, bl)
              if (lc != 0) lc < 0 else utf8Compare(r, br) < 0
            }
          if (better) { bl = l; br = r; bc = c; bsq = sq }
        }
      }
      if (bl == null) done = true
      else {
        require(br.startsWith("##"),
          s"right merge symbol '$br' is not a continuation form")
        val merged = bl + br.substring(2)
        out += ((bl, br, bc, bsq))
        st.applyMerge(bl, br, merged)
      }
      round += 1
    }
    out.result()
  }
}
