package graft

import org.apache.spark.sql.functions._
import graft.functions.{UnigramKernel, UnigramVocab}
import graft.llm.Unigram

/** The unigram-LM tokenizer family (r14): the exact-integer Viterbi
  * objective, training determinism, the id scheme, and the round-trip
  * equation — the [[graft.llm.Bpe]] gate family's twin. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def v(ps: (String, Long)*): UnigramVocab =
    new UnigramVocab(ps.toArray, 4)

  test("viterbi: fewest pieces wins regardless of counts") {
    // "abcd" as one 4-cp piece (count 1) beats two high-count bigrams
    val voc = v("a" -> 100L, "b" -> 100L, "c" -> 100L, "d" -> 100L,
      "ab" -> 900L, "cd" -> 900L, "abcd" -> 1L)
    assert(UnigramKernel.segmentWord("abcd", voc).toSeq == Seq("abcd"))
  }

  test("viterbi: summed counts break equal piece counts") {
    // two 2-piece covers of "abcd": (ab, cd) sum 10+1, (a, bcd) sum
    // 2+100 — the higher-sum split wins
    val voc = v("a" -> 2L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "ab" -> 10L, "cd" -> 1L, "bcd" -> 100L)
    assert(UnigramKernel.segmentWord("abcd", voc).toSeq == Seq("a", "bcd"))
  }

  test("viterbi: equal (pieces, sum) prefers the longer FINAL piece") {
    // (abc, d) and (a, bcd) both 2 pieces, both sum 5+5; the pinned
    // per-prefix tie-break takes the longer last piece of each prefix,
    // so the reconstruction is (a, bcd)
    val voc = v("a" -> 5L, "b" -> 0L, "c" -> 0L, "d" -> 5L,
      "abc" -> 5L, "bcd" -> 5L)
    assert(UnigramKernel.segmentWord("abcd", voc).toSeq == Seq("a", "bcd"))
  }

  test("viterbi is total: untrained single code points carry count 0") {
    val voc = v("ab" -> 7L)
    assert(UnigramKernel.segmentWord("abxy", voc).toSeq ==
      Seq("ab", "x", "y"))
    assert(UnigramKernel.segmentWord("", voc).isEmpty)
  }

  test("viterbi handles non-BMP pieces as whole code points") {
    val emoji = new String(Character.toChars(0x1F600))
    val voc = v(emoji -> 3L, (emoji + emoji) -> 9L)
    // 2 pieces either way, equal sums (9+3) — longer FINAL piece wins
    assert(UnigramKernel.segmentWord(emoji * 3, voc).toSeq ==
      Seq(emoji, emoji + emoji))
    // id round trip through the code-point arm
    assert(voc.pieceOfId(voc.idOf(emoji)) == emoji)
  }

  test("id scheme: code points below IdBase, ranked pieces above; " +
      "decode is loud on a foreign id") {
    val voc = v("a" -> 1L, "xy" -> 5L, "zz" -> 9L)
    assert(voc.idOf("a") == 'a'.toInt)
    assert(voc.idOf("zz") == UnigramKernel.IdBase) // rank 0: higher count
    assert(voc.idOf("xy") == UnigramKernel.IdBase + 1)
    assert(voc.pieceOfId(UnigramKernel.IdBase + 1) == "xy")
    intercept[IllegalArgumentException] {
      voc.pieceOfId(UnigramKernel.IdBase + 2)
    }
  }

  test("learn: deterministic vocabulary, repartition-invariant, EM " +
      "re-counts usage") {
    val docs = Seq(
      (1L, "banana bandana banana"),
      (2L, "ban ban banana"),
      (3L, "an and band banana"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v1 = Unigram.learn(docs, "text", seedSize = 20, vocabSize = 8)
    val v2 = Unigram.learn(docs.repartition(7), "text",
      seedSize = 20, vocabSize = 8)
    assert(v1.rankedWithCounts == v2.rankedWithCounts)
    assert(v1.rankedWithCounts.nonEmpty)
    // every ranked piece is multi-code-point with usage >= minCount
    v1.rankedWithCounts.foreach { case (_, p, c) =>
      assert(p.codePointCount(0, p.length) >= 2 && c >= 2, s"$p -> $c")
    }
    // ranks strictly ordered by (count DESC, piece ASC)
    val rw = v1.rankedWithCounts
    rw.sliding(2).foreach {
      case Seq((_, pa, ca), (_, pb, cb)) =>
        assert(ca > cb || (ca == cb && UnigramKernel.cpCompare(pa, pb) < 0))
      case _ => ()
    }
  }

  test("tokenizer fertility: exact counts, integer ratio, null/empty " +
      "and zero-word guards") {
    import graft.llm.TokenizerEval
    val docs = Seq(
      (1L, "g1", "aa bb"), // 2 words
      (2L, "g1", null.asInstanceOf[String]), // doc counted, no words
      (3L, "g2", "   "), // trims to zero words
      (4L, "g2", "x")).toDF("doc_id", "grp", "text")
    // counter = code points per word (deterministic, easy to hand-sum)
    val cpCount = (c: org.apache.spark.sql.Column) =>
      length(regexp_replace(c, "\\s+", "")).cast("long")
    val got = TokenizerEval.fertility(docs, "text", "grp",
        Seq("cp" -> cpCount))
      .orderBy("grp").collect()
    // g1: 2 docs, 2 words, 4 cps, 4*1000 div 2 = 2000
    assert(got(0).getString(0) == "g1" && got(0).getLong(1) == 2 &&
      got(0).getLong(2) == 2 && got(0).getLong(3) == 4 &&
      got(0).getLong(4) == 2000L)
    // g2: 2 docs, 1 word ("x"), 1 cp, ratio 1000
    assert(got(1).getLong(1) == 2 && got(1).getLong(2) == 1 &&
      got(1).getLong(3) == 1 && got(1).getLong(4) == 1000L)
    // zero-word group → null ratio, not a division error
    val zw = TokenizerEval.fertility(
        Seq((1L, "g", "  ")).toDF("doc_id", "grp", "text"),
        "text", "grp", Seq("cp" -> cpCount))
      .collect()(0)
    assert(zw.getLong(2) == 0 && zw.isNullAt(4))
  }

  test("encode/decode round trip equals the whitespace-squeezed text") {
    val docs = Seq(
      (1L, "banana bandana banana"),
      (2L, " ban  ban banana "),
      (3L, "an and band banana")).toDF("doc_id", "text")
    val voc = Unigram.learn(docs, "text", seedSize = 20, vocabSize = 8)
    val got = docs.select(col("doc_id"),
        Unigram.decode(Unigram.encode(col("text"), voc), voc).as("rt"),
        regexp_replace(col("text"), "\\s+", "").as("sq"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)}"))
    // count() matches the id-array size and is > the word count
    // (subword tokenization splits rare words)
    val n = docs.select(sum(Unigram.count(col("text"), voc))).head().getLong(0)
    assert(n > 0)
  }

  test("persisted vocabulary: rebuilt ranking and encode are " +
      "id-identical regardless of file row order; guards are loud (r15)") {
    val docs = Seq(
      (1L, "banana bandana banana"),
      (2L, " ban  ban banana "),
      (3L, "an and band banana")).toDF("doc_id", "text")
    val voc = Unigram.learn(docs, "text", seedSize = 20, vocabSize = 8)
    val dir = java.nio.file.Files.createTempDirectory("univocab")
      .toString + "/v"
    Unigram.writeVocab(spark, voc, dir)
    val back = Unigram.readVocab(spark, dir)
    // ranking (and therefore the id scheme) is internal to the vocab —
    // identical even though readVocab re-orders the piece array
    assert(back.rankedWithCounts == voc.rankedWithCounts)
    assert(back.maxPieceLen == voc.maxPieceLen)
    val a = docs.select(Unigram.encode(col("text"), voc).as("ids"))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    val b = docs.select(Unigram.encode(col("text"), back).as("ids"))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Unigram.writeVocab(spark, voc, dir)
    }
    // a torn artifact (two max_piece_len values) is loud
    val torn = java.nio.file.Files.createTempDirectory("univocab2")
      .toString + "/v"
    Seq(("ab", 3L, 4), ("cd", 2L, 5)).toDF("piece", "count", "max_piece_len")
      .write.parquet(torn)
    val ex = intercept[IllegalArgumentException] {
      Unigram.readVocab(spark, torn)
    }
    assert(ex.getMessage.contains("max_piece_len"))
  }
}
