package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full Gopher repetition rule set (Rae et al. 2021, "Scaling
  * Language Models: … Gopher", Appendix A1.1) — the repetition side of
  * the quality family that [[TextAnalysis.repeatedNgramRatio]] /
  * [[TextAnalysis.gopherMetrics]] started:
  *
  *   - duplicate LINE / PARAGRAPH fraction (by unit count and by
  *     character mass),
  *   - top n-gram character fraction for n = 2, 3, 4,
  *   - duplicated n-gram character COVERAGE for n = 5…10 (characters
  *     inside at least one occurrence of a gram that occurs twice or
  *     more — an interval UNION over overlapping occurrences, not a
  *     per-occurrence sum, so the fraction can never exceed 1).
  *
  * Pinned details the paper leaves open (both engines replay these):
  *   - lines split on `\n`, paragraphs on `\n\n`; BLANK units (empty
  *     after trim) are structure, not content — excluded from both
  *     numerator and denominator;
  *   - a duplicate unit = every occurrence beyond the first
  *     (`1 − distinct/total`, the [[TextAnalysis.repeatedNgramRatio]]
  *     convention); unit characters are the unit's own length;
  *   - n-grams are whitespace tokens joined by one space; a document
  *     with fewer than n tokens contributes NO n-grams (fraction 0 —
  *     no short-document collapse here, unlike [[TextAnalysis.ngrams]]);
  *   - top n-gram fraction = top count × gram length / document text
  *     length; ties on count break toward the lexicographically
  *     smallest gram;
  *   - coverage counts TOKEN characters (a covered token's length) over
  *     the document's total token characters — spaces are layout, not
  *     repetition mass.
  *
  * Scale shape (100 TB): every metric is WITHIN-document, so the
  * whole rule set is ONE map-only pass — the codegen'd
  * [[graft.functions.GopherRepetition]] kernel computes all 13
  * fractions per row with no explode, no shuffle, no window (the
  * [[TextAnalysis.repeatedNgramRatio]] precedent: its declarative
  * explode form benched 19× slower; this operator's first, nine-
  * explode formulation benched 10.8/18.0/77.8 s over the x1/x4/x16
  * decade vs the kernel's map-only pass). */
object Repetition {

  /** (threshold, metric column) pairs of Rae et al. Table A1 — a
    * document FAILS when any metric EXCEEDS its threshold. */
  val GopherThresholds: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30, "dup_para_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20, "dup_para_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16,
    "dup_5gram_char_frac" -> 0.15, "dup_6gram_char_frac" -> 0.14,
    "dup_7gram_char_frac" -> 0.13, "dup_8gram_char_frac" -> 0.12,
    "dup_9gram_char_frac" -> 0.11, "dup_10gram_char_frac" -> 0.10)

  /** All 13 Gopher repetition metrics, one row per document — one
    * map-only pass through the [[graft.functions.GopherRepetition]]
    * kernel. Null text ≡ empty (all metrics 0). */
  def repetitionMetrics(
      df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.GopherRepetition(
          coalesce(col(textCol), lit(""))).as("__m"))
      .select(col(idCol) +: GopherThresholds.map { case (m, _) =>
        col(s"__m.$m").as(m) }: _*)

  /** [[repetitionMetrics]] plus the Table A1 verdict: `passes` is true
    * iff no metric exceeds its published threshold. */
  def gopherRepetitionVerdict(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val m = repetitionMetrics(df, textCol, idCol)
    m.withColumn("passes", GopherThresholds.map { case (c, th) =>
      col(c) <= th }.reduce(_ && _))
  }
}
