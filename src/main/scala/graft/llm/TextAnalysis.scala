package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, document
  * fingerprinting. All hot-path expressions are built-in `functions._`
  * (codegen'd); the only UDFs are the lang-ID scorer and the rolling-hash
  * fingerprint, both simple per-row scalar functions.
  */
object TextAnalysis {

  /** Whitespace tokenization (the baseline tokenizer; a BPE-ish regex
    * variant is [[subwordCount]]).
    *
    * DIALECT CONTRACT (the canonical note — every `tokens()` consumer
    * and every oracle author inherits it): this is JAVA `\s+` =
    * `[ \t\n\x0B\f\r]+`, while the DuckDB oracles mirror RE2 `\s+` =
    * `[\t\n\f\r ]+` — the two disagree on VERTICAL TAB `\x0B` (Java
    * splits, RE2 does not) and both leave Unicode whitespace
    * (U+00A0, U+2028, …) unsplit. The driver corpora contain neither,
    * so every oracle row is insensitive to the gap (verified at
    * sf0.01: zero diffs); a corpus that might contain `\x0B` must be
    * canonicalized FIRST with [[normalizeText]], whose explicit
    * ASCII-whitespace class collapses `\x0B` identically in both
    * dialects (see `functions/NormalizeText.scala`). KernelPropertySpec
    * pins both behaviors so the divergence stays visible. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** Rough subword/BPE-style token estimate: word-piece regex split on
    * letter-digit-punct boundaries, ~chars/4 floor for CJK-free text. */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "[\\s]+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"))
      .cast("long")

  /** Quality metrics (length / punctuation / whitespace ratios — the
    * heuristic-filter family used by pretraining pipelines). Integer
    * counts divided as doubles → deterministic.
    *   - alpha_ratio: Unicode-letter chars / total chars (true alphabetic
    *     ratio, `[^\p{L}]` stripped — not merely non-space).
    *   - avg_token_len: non-whitespace chars (all of `\s`, not just ' ')
    *     per whitespace token. */
  def qualityMetrics(df: DataFrame, text: Column): DataFrame = {
    val n = length(text)
    val nAlpha = length(regexp_replace(text, "[^\\p{L}]", ""))
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val ntok = tokenCount(text)
    df.withColumn("n_chars_measured", n.cast("long"))
      .withColumn("alpha_ratio", nAlpha.cast("double") / n)
      .withColumn("avg_token_len", nonSpace.cast("double") / ntok)
      .withColumn("n_tokens", ntok)
  }

  /** Word n-grams WITH repetitions (the repetition-filter unit; the
    * dedup [[Dedup.shingles]] is the distinct set). Documents shorter
    * than `n` tokens collapse to one n-gram of all their tokens. */
  def ngrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    when(count > 0,
      transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Gopher/C4-style repetition metric: the fraction of n-gram
    * occurrences that duplicate an earlier occurrence,
    * `1 − distinct/total`. Boilerplate- and template-heavy documents
    * score high; a standard pretraining quality filter alongside
    * [[qualityMetrics]]. Exact integer counts divided as doubles →
    * deterministic and oracle-mirrorable (same shingle CTE as the
    * Jaccard verify). Documents shorter than `n` tokens score 0.
    *
    * Computed by the native codegen'd
    * [[graft.functions.RepeatedNgramRatio]] kernel — one linear pass
    * over the row-local token array (the declarative
    * `size(ngrams) − size(array_distinct(ngrams))` form materializes
    * the n-gram array twice per ratio and benched ~19× slower:
    * 14.0 s → 0.73 s at sf0.1 for the two-ratio query). */
  def repeatedNgramRatio(text: Column, n: Int): Column =
    graft.functions.RepeatedNgramRatio(tokens(text), n)

  /** Gopher-style heuristic quality rules beyond [[qualityMetrics]] /
    * [[repeatedNgramRatio]] — the remaining standard pretraining
    * filters expressible over this engine's whitespace tokenization:
    *
    *   - `stopword_ratio`: fraction of token OCCURRENCES that are
    *     common function words (Gopher requires a minimum — real prose
    *     has some; keyword-stuffed or non-linguistic text has none).
    *     Declarative `filter(tokens, array_contains(...))` — codegen'd,
    *     no explode, no UDF.
    *   - `symbol_ratio`: non-letter/digit/whitespace chars per char
    *     (C4 drops symbol-heavy docs). Pure regexp counting.
    *   - `top_token_ratio`: most-frequent-token coverage, the native
    *     single-pass [[graft.functions.TopTokenRatio]] kernel.
    *
    * All exact integer counts divided as doubles → oracle-mirrorable.
    * Tokens are matched lowercased against the union of the per-language
    * [[stopwords]] lists (language-agnostic, like a multilingual
    * pipeline's union list). */
  def gopherMetrics(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(lower(text))
    val stopList = array(stopwordUnion.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopList, t)))
    val nSym = length(regexp_replace(text, "[\\p{L}\\p{Nd}\\s]", ""))
    df.withColumn("stopword_ratio",
        nStop.cast("double") / size(toks))
      .withColumn("symbol_ratio", nSym.cast("double") / length(text))
      .withColumn("top_token_ratio",
        graft.functions.TopTokenRatio(text))
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Deduplicated, sorted union of the per-language stopword lists —
    * the [[gopherMetrics]] match set, exposed so the driver oracle can
    * inline the identical list. */
  val stopwordUnion: Seq[String] =
    stopwords.values.flatten.toSeq.distinct.sorted

  /** Language ID: distinct-stopword-count heuristic over whitespace
    * tokens (the n-gram-free fast path; ties break lexicographically →
    * deterministic). Fully declarative — per-language
    * `array_intersect` counts (one native set op per language, an order
    * of magnitude less generated code than a per-token IN filter),
    * argmax via a when-chain in lexicographic order — so it stays inside
    * whole-stage codegen AND is mirrorable in ANSI SQL
    * (`list_intersect`, also distinct) for the oracle gate. Unknown
    * (all counts zero) → "und". */
  def langId(text: Column): Column = {
    // null-safe: null text → zero counts → "und" on BOTH engines (a
    // bare when-chain would fall through to "und" in Spark but a SQL
    // CASE's NULL comparisons would hit the ELSE branch instead)
    val toks = tokens(lower(coalesce(text, lit(""))))
    val counts = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      lang -> size(array_intersect(toks, array(sw.map(lit): _*)))
    }
    val g = greatest(counts.map(_._2): _*)
    counts.foldLeft(when(g <= 0, lit("und"))) { case (acc, (lang, c)) =>
      acc.when(c === g, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Corpus-familiarity quality score (the CCNet-style idea with an
    * exactly-mirrorable statistic): build the corpus bigram count
    * table, then score each document by the average corpus frequency
    * of its bigram OCCURRENCES — boilerplate and in-distribution prose
    * score high, out-of-distribution or garbled text scores near the
    * singleton floor of 1.0. Integer sums divided once at the end →
    * deterministic regardless of join/aggregation order (the
    * float-sum-order trap the quantization mirror hit does not exist
    * here).
    *
    * Scale shape: one groupBy builds the model (map-side combined);
    * scoring explodes each doc's bigrams and shuffle-joins the model
    * on the bigram key — co-partitioned, linear, no broadcast of a
    * corpus-sized table. Returns (idCol, n_bigrams, familiarity). */
  def bigramFamiliarity(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    // fused repetition-preserving hash kernel: the model groupBy and
    // the score join move 8-byte hashes, never bigram strings (same
    // collision stance as every hash pipeline here — the string oracle
    // reproduces the counts exactly absent 64-bit collisions)
    val grams = df.select(col(idCol),
      explode(graft.functions.NgramHashes(col(textCol), 2)).as("g"))
    val model = grams.groupBy("g").agg(count(lit(1)).as("corpus_cnt"))
    grams.join(model, Seq("g"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum("corpus_cnt").as("sum_cnt"))
      .withColumn("familiarity",
        col("sum_cnt").cast("double") / col("n_bigrams"))
      .drop("sum_cnt")
  }

  /** PII patterns (C4-style scrub list), ordered — RE2-compatible (no
    * lookaround, no backrefs) so the DuckDB oracle runs the IDENTICAL
    * patterns. Replacement tokens are bracketed type tags. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
    "phone" -> "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}")

  /** Redact PII in place: each pattern's matches → `[EMAIL]`/`[IPV4]`/
    * `[PHONE]`. Order matters (emails before phones so digit runs
    * inside addresses are already collapsed); a map-only column
    * expression — at corpus scale this is a scan, nothing else. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (name, pat)) =>
      regexp_replace(acc, pat, s"[${name.toUpperCase}]")
    }

  /** Per-doc PII match counts, one column per pattern type
    * (`n_email`, `n_ipv4`, `n_phone`) — the audit view that decides
    * whether to redact or drop. */
  def piiCounts(df: DataFrame, text: Column): DataFrame =
    piiPatterns.foldLeft(df) { case (acc, (name, pat)) =>
      acc.withColumn(s"n_$name", regexp_count(text, lit(pat)))
    }

  /** Text canonicalization before dedup/fingerprinting (CCNet shape):
    * Unicode normalize (NFC default, NFKC folds ligatures/fullwidth) +
    * case fold + ASCII-whitespace collapse, as one codegen'd scalar
    * kernel — [[graft.functions.NormalizeText]] (see its scaladoc for
    * the exact byte contract and the `\x0B` regex-dialect note). */
  def normalizeText(text: Column): Column =
    graft.functions.NormalizeText(text)

  def normalizeText(
      text: Column, form: String,
      caseFold: Boolean, collapseWs: Boolean): Column =
    graft.functions.NormalizeText(text, form, caseFold, collapseWs)

  /** Rolling polynomial fingerprint (Rabin-Karp style, 64-bit wrapping)
    * over UTF-8 bytes: the native codegen'd
    * [[graft.functions.Fingerprint64]] expression. Stable across
    * partitioning. */
  def fingerprint(text: Column): Column =
    graft.functions.Fingerprint64(text)

  /** Winnowing-style k-gram fingerprint set: min token-hash per sliding
    * window of `w` token hashes — the standard near-dup sketch for code /
    * text plagiarism detection. The token hash is FNV-1a 64 (not
    * `xxhash64`) so an ANSI-SQL oracle can reproduce the sketch exactly
    * (same recursive-CTE mirror the MinHash pipeline uses).
    *
    * Computed by the native codegen'd
    * [[graft.functions.WinnowedSketch]] kernel — one linear pass with a
    * monotonic-deque window min (the declarative slice-per-window form
    * below was the slowest query in the suite: 6.7 s at sf0.1). */
  def winnowed(text: Column, w: Int): Column =
    graft.functions.WinnowedSketch(tokens(text), w)

  /** [[winnowed]], declarative formulation — the independent test
    * mirror of the native kernel (same role as
    * `TraceStore.rechunkDeclarative`); not the scale path. */
  def winnowedDeclarative(text: Column, w: Int): Column = {
    val hs = transform(tokens(text), t => graft.functions.Fnv64(t))
    val nwin = size(hs) - (w - 1)
    when(nwin > 0,
      array_distinct(transform(sequence(lit(0), nwin - 1),
        i => array_min(slice(hs, i + 1, lit(w))))))
      .otherwise(array(array_min(hs)))
  }

  /** Exact corpus-wide top-k terms by frequency, via two bounded scans
    * and NO token-stream shuffle:
    *
    *   1. a merged Misra–Gries sketch
    *      ([[graft.functions.MisraGriesTerms]], one `capacity`-entry
    *      summary per partition on the exchange) yields a candidate set
    *      guaranteed to contain every term with true frequency
    *      > N/(capacity+1);
    *   2. the candidates (≤ capacity strings, broadcast inside the
    *      [[graft.functions.TermCounts]] kernel) are recounted EXACTLY
    *      in one O(tokens + capacity)/doc pass, reduced by
    *      [[graft.functions.LongVectorSum]] (map-side combine, one
    *      vector per partition on the exchange).
    *
    * Result: (term, cnt) ordered (cnt DESC, term ASC), provably the
    * true top-k whenever the k-th true count exceeds N/(capacity+1) —
    * size capacity ≥ N/expected-kth-count (a few hundred covers Zipfian
    * corpora; the explode + groupBy exact mirror shuffles the whole
    * token stream instead). Null texts contribute nothing. */
  def heavyHitterTerms(
      df: DataFrame,
      text: Column,
      k: Int,
      capacity: Int): DataFrame = {
    require(k > 0 && capacity >= k, "need capacity >= k > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = df
      .agg(graft.functions.MisraGriesTerms(text, capacity).as("sketch"))
      .select(explode(col("sketch")).as("e"))
      .select(col("e.term")).as[String].collect().toSeq.sorted
    if (candidates.isEmpty) return Seq.empty[(String, Long)].toDF("term", "cnt")
    val sums = df
      .filter(text.isNotNull)
      .select(graft.functions.TermCounts(text, candidates).as("tc"))
      .agg(graft.functions.LongVectorSum(col("tc"), candidates.length)
        .as("sums"))
      .head().getSeq[Long](0)
    candidates.zip(sums)
      .sortBy { case (t, c) => (-c, t) }
      .take(k)
      .toDF("term", "cnt")
  }
}
