package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.{Fnv64, MinHashSig, MinHashTextSig, NgramHashes, ShingleHashes, SimHash64, SimHashText}
import graft.llm.{Dedup, TextAnalysis}

/** Exact-equivalence contract of the fused text→signature kernels
  * ([[graft.functions.MinHashTextSig]] / [[graft.functions.SimHashText]])
  * against the composed formulation they replace
  * (`minhash_sig(array_distinct(ngrams(split(trim(text)))), k)` and
  * `simhash64(split(trim(text)))`). The composed form survives here as
  * the independent mirror; the driver oracles are shared downstream.
  */
class TextSigSpec extends SparkSpec {
  import spark.implicits._

  // Whitespace semantics the fused byte-walker must reproduce exactly:
  // Spark trim strips 0x20 only; split("\\s+") keeps leading/trailing
  // empty tokens produced by non-space whitespace; "" → one empty token.
  private val edgeCases = Seq(
    "",
    " ",
    "    ",
    "\t",
    " \t ",
    "a",
    " a ",
    "a b",
    "a  b",
    "a\tb",
    "\ta b",
    "a b\t",
    " \ta b c\t ",
    "a\nb\r\nc",
    "a\u000Bb\fc",        // vertical tab, form feed - in \\s but not 0x20
    "x x x x x",             // duplicate tokens/shingles
    "a\u00A0b",            // NBSP: not \\s - one multi-byte token
    "héllo wörld déjà vu",   // 2-byte UTF-8 in tokens
    "你好 世界 测试 数据 样本",  // 3-byte UTF-8
    "🦊 jumps 🐶",            // 4-byte UTF-8 (surrogate pairs)
    "the quick brown fox jumps over the lazy dog",
    "one two",
    "one two three",
    (1 to 200).map(i => s"tok$i").mkString(" ")
  )

  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(0xC0FFEE)
    val alphabet = "ab cd\tef gh \n xyz  qrsé世 "
    Seq.fill(n) {
      val len = rnd.nextInt(120)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  private lazy val corpus =
    (edgeCases ++ randomStrings(300)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      // several rows per partition so whole-stage codegen paths run
      .repartition(4)

  private def assertColumnsEqual(
      fused: org.apache.spark.sql.Column,
      composed: org.apache.spark.sql.Column): Unit = {
    val mismatches = corpus
      .select(col("doc_id"), col("text"),
        fused.as("fused"), composed.as("composed"))
      .filter(not(col("fused") <=> col("composed")))
      .collect()
    assert(mismatches.isEmpty,
      s"fused/composed diverge on: ${mismatches.take(5).mkString("; ")}")
  }

  test("minhash_text ≡ minhash_sig∘array_distinct∘ngrams, all (k, n)") {
    for (k <- Seq(8, 64); n <- Seq(1, 2, 3, 5))
      assertColumnsEqual(
        MinHashTextSig(col("text"), k, n),
        MinHashSig(Dedup.shingles(col("text"), n), k))
  }

  test("simhash_text ≡ simhash64∘tokens") {
    assertColumnsEqual(
      SimHashText(col("text")),
      SimHash64(TextAnalysis.tokens(col("text"))))
  }

  test("null text → null signature (deliberate minhash divergence)") {
    val nulls = Seq((0L, null: String), (1L, "a b")).toDF("doc_id", "text")
    val r = nulls.orderBy("doc_id").select(
      MinHashTextSig(col("text"), 8, 2).as("m"),
      SimHashText(col("text")).as("s"),
      MinHashSig(Dedup.shingles(col("text"), 2), 8).as("mc"),
      SimHash64(TextAnalysis.tokens(col("text"))).as("sc"))
      .collect()
    val Array(Row(m0, s0, mc0, sc0), Row(m1, s1, mc1, sc1)) = r
    // Fused: null doc → null signature, consistently for both kernels.
    assert(m0 == null && s0 == null && sc0 == null)
    // Composed minhash chain instead yields the signature of [""]:
    // concat_ws SWALLOWS the null token array. That makes null docs
    // band-collide with genuinely empty docs — an artifact, not a
    // contract. Pin it here so the divergence is visible if it changes.
    val emptySig = nulls.filter(col("doc_id") === 1)
      .select(MinHashSig(array(lit("")), 8).as("e")).head.get(0)
    assert(mc0 == emptySig)
    assert(m1 != null && s1 != null && m1 == mc1 && s1 == sc1)
  }

  test("shingle_hashes ≡ sorted distinct fnv64 over composed shingles") {
    for (n <- Seq(1, 2, 3, 5))
      assertColumnsEqual(
        ShingleHashes(col("text"), n),
        sort_array(array_distinct(
          transform(Dedup.shingles(col("text"), n), s => Fnv64(s)))))
  }

  test("ngram_hashes ≡ fnv64 over composed ngrams (order + repetitions)") {
    for (n <- Seq(1, 2, 3))
      assertColumnsEqual(
        NgramHashes(col("text"), n),
        transform(TextAnalysis.ngrams(col("text"), n), s => Fnv64(s)))
  }

  test("top_token_ratio ≡ exploded per-token mode computation") {
    val kern = corpus.select(col("doc_id"),
      graft.functions.TopTokenRatio(col("text")).as("r"))
    val comp = corpus
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id")
      .agg((max("count").cast("double") / sum("count")).as("r"))
    val mismatches = kern.alias("k")
      .join(comp.alias("c"), Seq("doc_id"))
      .filter(not(col("k.r") <=> col("c.r")))
      .collect()
    assert(mismatches.isEmpty, s"diverge on: ${mismatches.take(5).toSeq}")
  }

  test("SQL surface: minhash_text / simhash_text registered") {
    graft.functions.GraftFunctions.register(spark)
    corpus.createOrReplaceTempView("textsig_corpus")
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_text(text, 16, 3) AS sig,
        |       simhash_text(text) AS sh
        |FROM textsig_corpus""".stripMargin)
    val viaCol = corpus.select(col("doc_id"),
      MinHashTextSig(col("text"), 16, 3).as("sig"),
      SimHashText(col("text")).as("sh"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("SQL surface: the crawl/text kernels are callable from pure " +
      "SQL and agree with the Column API (r12)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val pages = Seq((1L,
        "<nav><a href=\"/x\">Nav</a></nav>" +
          "<p>Real prose body &amp; long enough to keep around.</p>" +
          "<a href=\"/l1\">one</a>"))
      .toDF("id", "html")
    pages.createOrReplaceTempView("sqlsurface_pages")
    val sql = spark.sql(
      """SELECT id, html_to_text(html) AS t, html_links(html) AS l,
        |  html_anchors(html) AS a,
        |  html_main_text(html) AS m,
        |  html_main_text(html, 2, 1000) AS m2,
        |  normalize_text(t_raw) AS nt,
        |  robots_allowed('User-agent: *
        |Disallow: /private/', '/private/x', 'GraftBot') AS ra
        |FROM (SELECT id, html, '  Mixed  CASE  ' AS t_raw
        |      FROM sqlsurface_pages)""".stripMargin).head()
    assert(sql.getString(1).contains("Real prose body & long"))
    assert(sql.getSeq[String](2) == Seq("/x", "/l1"))
    assert(sql.getSeq[Row](3).map(_.getString(0)) == Seq("/x", "/l1"))
    assert(sql.getString(4) ==
      "Real prose body & long enough to keep around.")
    assert(sql.getString(5).startsWith("Nav")) // permissive thresholds
    assert(sql.getString(6) == "mixed case")
    assert(!sql.getBoolean(7)) // /private/ disallowed for every agent
    // literal-argument misuse is loud, not silently wrong
    intercept[Exception] {
      spark.sql("SELECT html_main_text('x', 'a', 'b')").collect()
    }
  }
}
