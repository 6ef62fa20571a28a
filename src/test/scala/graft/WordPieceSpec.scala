package graft

import org.apache.spark.sql.functions._
import graft.functions.{WordPieceKernel, WordPieceVocab}
import graft.llm.WordPiece

/** The WordPiece tokenizer family (r15): greedy longest-match encode,
  * the likelihood-scored merge training, the three-range id scheme,
  * and the round-trip equation — the [[graft.llm.Bpe]]/[[graft.llm.Unigram]]
  * gate families' third sibling. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def v(ps: String*): WordPieceVocab =
    new WordPieceVocab(ps.toArray)

  test("greedy: longest match first, no lookahead — the un-Viterbi") {
    // "unhappy": greedy takes "unha" if present even though
    // (un, ##happy) would be 2 pieces — longest-match has no DP
    val voc = v("un", "##happy", "unha")
    val ids = WordPieceKernel.segmentWord("unhappy", voc)
    // unha (rank 2), then singles ##p ##p ##y
    assert(ids.toSeq == Seq(
      WordPieceKernel.MultiBase + 2,
      WordPieceKernel.ContBase + 'p'.toInt,
      WordPieceKernel.ContBase + 'p'.toInt,
      WordPieceKernel.ContBase + 'y'.toInt))
    // without the greedy trap the 2-piece segmentation appears
    val voc2 = v("un", "##happy")
    assert(WordPieceKernel.segmentWord("unhappy", voc2).toSeq == Seq(
      WordPieceKernel.MultiBase + 0, WordPieceKernel.MultiBase + 1))
  }

  test("continuation marking: the same content matches only in its " +
      "position's form; totality via singles") {
    val voc = v("ab", "##ab")
    // "abab": initial "ab" (rank 0), continuation "##ab" (rank 1)
    assert(WordPieceKernel.segmentWord("abab", voc).toSeq == Seq(
      WordPieceKernel.MultiBase + 0, WordPieceKernel.MultiBase + 1))
    // "xab": x is an unseen single (initial form = raw code point),
    // then the continuation piece
    assert(WordPieceKernel.segmentWord("xab", voc).toSeq == Seq(
      'x'.toInt, WordPieceKernel.MultiBase + 1))
    // an initial-only piece never matches mid-word
    val vi = v("ab")
    assert(WordPieceKernel.segmentWord("xab", vi).toSeq == Seq(
      'x'.toInt, WordPieceKernel.ContBase + 'a'.toInt,
      WordPieceKernel.ContBase + 'b'.toInt))
    assert(WordPieceKernel.segmentWord("", voc).isEmpty)
  }

  test("non-BMP code points stay whole through singles and pieces") {
    val emoji = new String(Character.toChars(0x1F600))
    val voc = v(emoji + emoji)
    val ids = WordPieceKernel.segmentWord(emoji * 3, voc)
    assert(ids.toSeq == Seq(
      WordPieceKernel.MultiBase + 0,
      WordPieceKernel.ContBase + 0x1F600))
    val back = Seq(Tuple1(emoji * 3)).toDF("t")
      .select(WordPiece.decode(WordPiece.encode(col("t"), voc), voc))
      .as[String].head()
    assert(back == emoji * 3)
  }

  test("learnMerges: likelihood score beats raw count; pinned " +
      "tie-break; repartition-invariant; '##' corpus refused") {
    // 'xq' pair: 3 co-occurrences of two rare symbols (x:3, q:3 →
    // score 3e12/9). 'th' pair: 6 co-occurrences of common symbols
    // (t:8, h:8 → score 6e12/64). BPE would merge 'th' first;
    // WordPiece must take 'xq'.
    val docs = Seq(
      (0L, "xq xq xq th th th th th th"),
      (1L, "t h t h")).toDF("doc_id", "text")
    val merges = WordPiece.learnMerges(docs, "text", nMerges = 2)
    assert(merges.head._1 == "x" && merges.head._2 == "##q")
    assert(merges.head._3 == 3L) // pair count
    assert(merges.head._4 == 3000000000000L / 9L) // exact score_q
    assert(merges(1)._1 == "t" && merges(1)._2 == "##h")
    // stable under repartitioning
    val again = WordPiece.learnMerges(docs.repartition(5), "text", 2)
    assert(again == merges)
    // loud refusal of marker-colliding corpora
    val ex = intercept[IllegalArgumentException] {
      WordPiece.learnMerges(
        Seq((0L, "a##b c")).toDF("doc_id", "text"), "text", 1)
    }
    assert(ex.getMessage.contains("##"))
  }

  test("learned vocab encodes the corpus; round trip squeezes " +
      "whitespace; foreign ids are loud") {
    val docs = Seq(
      (0L, "the then there the then"),
      (1L, "other feather the")).toDF("doc_id", "text")
    val voc = WordPiece.vocabFromMerges(
      WordPiece.learnMerges(docs, "text", nMerges = 4))
    val rt = docs.select(col("doc_id"),
        WordPiece.decode(WordPiece.encode(col("text"), voc), voc)
          .as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt(0L) == "thethentherethethen")
    assert(rt(1L) == "otherfeatherthe")
    // count is the id-stream length
    val n = docs.select(sum(WordPiece.count(col("text"), voc)))
      .head().getLong(0)
    val ids = docs.select(explode(WordPiece.encode(col("text"), voc)))
      .count()
    assert(n == ids)
    // a rank beyond the vocabulary fails loudly in decode
    val bad = intercept[IllegalArgumentException] {
      voc.contentOfRank(999)
    }
    assert(bad.getMessage.contains("wrong vocabulary"))
  }

  test("batched driver training ≡ distributed loop on random corpora, " +
      "incl. non-BMP tie-breaks (r16)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    (0 until 5).foreach { trial =>
      val alphabet: Array[String] =
        if (trial % 2 == 0) Array("a", "b", "c")
        else Array("a", "", new String(Character.toChars(0x1F600)))
      val texts = (0 until 25).map { _ =>
        (0 until (1 + rnd.nextInt(4))).map { _ =>
          (0 until (1 + rnd.nextInt(5)))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nM = 1 + rnd.nextInt(4)
      val drv = WordPiece.learnMerges(df, "text", nM)
      val dist = WordPiece.learnMerges(df, "text", nM, 2L,
        maxDriverWords = 0L)
      assert(drv == dist,
        s"trial $trial (nM=$nM): driver $drv\n distributed $dist")
    }
  }

  test("vocabFromMerges dedupes colliding result strings keeping the " +
      "first rank (ADVICE r15)") {
    // (a,##bc) and (ab,##c) both yield 'abc' — a legitimate corpus-
    // dependent outcome of the merge loop; the greedy matcher needs
    // exactly one id per string, so the later duplicate is dropped
    val merges = Seq(
      ("##b", "##c", 10L, 100L), // → ##bc
      ("a", "##bc", 9L, 90L),    // → abc (rank 1)
      ("a", "##b", 8L, 80L),     // → ab
      ("ab", "##c", 7L, 70L))    // → abc (collision — dropped)
    val voc = WordPiece.vocabFromMerges(merges)
    assert(voc.pieces.toSeq == Seq("##bc", "abc", "ab"))
  }

  test("persisted vocabulary: round trip is id-identical, clobber and " +
      "torn artifacts are loud (r15)") {
    import spark.implicits._
    val docs = Seq((0L, "the then there the then"),
      (1L, "other feather the")).toDF("doc_id", "text")
    val voc = WordPiece.vocabFromMerges(
      WordPiece.learnMerges(docs, "text", nMerges = 4))
    val dir = java.nio.file.Files.createTempDirectory("wpvocab").toString +
      "/v"
    WordPiece.writeVocab(spark, voc, dir)
    val back = WordPiece.readVocab(spark, dir)
    assert(back == voc) // array order IS the rank order — exact
    // encode under the stored vocabulary is bit-identical
    val a = docs.select(WordPiece.encode(col("text"), voc).as("ids"))
      .collect().map(_.getSeq[Int](0))
    val b = docs.select(WordPiece.encode(col("text"), back).as("ids"))
      .collect().map(_.getSeq[Int](0))
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq))
    // refuses to clobber
    intercept[IllegalArgumentException] {
      WordPiece.writeVocab(spark, voc, dir)
    }
    // a torn artifact (non-dense ranks) is loud
    val torn = java.nio.file.Files.createTempDirectory("wpvocab2")
      .toString + "/v"
    Seq((0L, "ab"), (2L, "cd")).toDF("rank", "piece")
      .write.parquet(torn)
    val ex = intercept[IllegalArgumentException] {
      WordPiece.readVocab(spark, torn)
    }
    assert(ex.getMessage.contains("non-dense rank"))
  }
}
