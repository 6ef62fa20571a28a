package graft

import org.apache.spark.sql.functions._
import graft.sources.Hdf5File

/** Property-style (seeded-random, deterministic) checks for the r07
  * native kernels against independent JVM reference implementations,
  * plus byte-level robustness of the from-spec HDF5 parser: random
  * truncations must either throw (fail loudly) or return data equal to
  * the untruncated read — never a silent misread. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  /** split(trim(text), "\\s+") exactly: Spark's trim removes ASCII
    * spaces only; java's \s matches the same class as the engine's
    * tokenizer. */
  private def refTokens(text: String): Array[String] = {
    var lo = 0
    var hi = text.length
    while (lo < hi && text(lo) == ' ') lo += 1
    while (hi > lo && text(hi - 1) == ' ') hi -= 1
    text.substring(lo, hi).split("\\s+", -1)
  }

  private val words = Array("alpha", "beta", "gamma", "δδ", "x", "yy",
    "alpha", "tok1", "tok2", "", "éclair")

  test("tokenizer whitespace-dialect contract: \\x0B and U+00A0 " +
      "through every tokens() consumer (r11)") {
    import graft.llm.TextAnalysis
    // the canonical divergence: Java \s splits on VERTICAL TAB, RE2
    // (the DuckDB oracle dialect) does not; both leave U+00A0 alone.
    // This pins the JAVA side — the engine's contract — and proves
    // normalizeText removes the divergence before it can matter.
    val docs = Seq(
      (1L, "alpha\u000Bbeta gamma"), // \x0B: Java=3 tokens, RE2=2
      (2L, "alpha\u00A0beta gamma"), // NBSP: 2 tokens both dialects
      (3L, "a\u2028b c"), // LINE SEP: unsplit in both
      (4L, " spaced out ")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq)
      .toMap
    assert(got(1L) == Seq("alpha", "beta", "gamma")) // Java splits \x0B
    assert(got(2L) == Seq("alpha\u00A0beta", "gamma"))
    assert(got(3L) == Seq("a\u2028b", "c"))
    assert(got(4L) == Seq("spaced", "out"))
    // consumers inherit it: token COUNTS (quality/budget path)
    val counts = docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts == Map(1L -> 3, 2L -> 2, 3L -> 2, 4L -> 2))
    // ...and the engine-side reference tokenizer in this spec agrees
    docs.collect().foreach { r =>
      assert(refTokens(r.getString(1)).toSeq == got(r.getLong(0)),
        s"refTokens dialect drift on doc ${r.getLong(0)}")
    }
    // normalizeText collapses \x0B via the EXPLICIT class — identical
    // in both regex dialects — so normalize-then-tokenize yields the
    // same tokens whichever engine runs the normalize step
    val norm = docs.select(col("doc_id"),
        TextAnalysis.tokens(TextAnalysis.normalizeText(col("text")))
          .as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq)
      .toMap
    assert(norm(1L) == Seq("alpha", "beta", "gamma"))
    // NBSP survives normalize (it is NOT ASCII whitespace) — in the
    // case-folded form, still one token
    assert(norm(2L).length == 2)
  }

  test("property: HtmlAnchors href stream ≡ HtmlLinks over random " +
      "tag soup — the two walkers may never disagree on WHICH anchors " +
      "exist") {
    import graft.functions.{HtmlAnchors, HtmlLinks}
    val rnd = new scala.util.Random(1212)
    val frags = Array(
      "<a href=\"/q/", "'>x</a>", "\">y</a>", "<a href='/s/",
      "<a name=n>", "</a>", "<A HREF=/u/", ">z</A>", "plain text ",
      "<script>var a = \"<a href='/d'>\";</script>", "<!-- <a href=/c> -->",
      "<b>bold</b>", "<div title=\"a > b\">", "</div>", "&amp; ",
      "<![CDATA[<a href=/cd>]]>", "< 3 ", "<a href=", "\"/late\">w</a>")
    for (trial <- 0 until 400) {
      val html = (0 until rnd.nextInt(20))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString
      val links = HtmlLinks.links(html)
      val anchors = HtmlAnchors.anchors(html).map(_._1)
      assert(anchors == links,
        s"trial $trial: walkers disagree on '$html'\n" +
          s"links=$links\nanchors=$anchors")
    }
  }

  test("property: HtmlMainText ≡ block-model reference over random " +
      "pages — the density verdict is decided by an independent " +
      "mini-model, never the kernel's own counters") {
    import graft.functions.{HtmlMainText, HtmlToText}
    val rnd = new scala.util.Random(4242)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon")
    for (trial <- 0 until 300) {
      // build a page from blocks with KNOWN plain/anchor word splits;
      // the reference computes each block's text and anchor lengths
      // from the MODEL, not by re-running any kernel walker
      val nBlocks = 1 + rnd.nextInt(6)
      val blocks = (0 until nBlocks).map { _ =>
        val plain = (0 until rnd.nextInt(6)).map(_ =>
          words(rnd.nextInt(words.length)))
        val anchored = (0 until rnd.nextInt(4)).map(_ =>
          words(rnd.nextInt(words.length)))
        (plain, anchored)
      }
      val html = blocks.map { case (plain, anchored) =>
        "<p>" + plain.mkString(" ") +
          (if (anchored.nonEmpty)
            " <a href=\"/l\">" + anchored.mkString(" ") + "</a>"
          else "") + "</p>"
      }.mkString
      val minChars = rnd.nextInt(20)
      val permille = rnd.nextInt(1100)
      val expected = blocks.flatMap { case (plain, anchored) =>
        val all = plain ++ anchored
        val text = (plain.mkString(" ") +
          (if (anchored.nonEmpty && plain.nonEmpty) " " else "") +
          anchored.mkString(" ")).trim
        val aLen = anchored.mkString(" ").length
        if (text.length >= minChars && text.nonEmpty &&
            aLen.toLong * 1000 <= permille.toLong * text.length &&
            all.nonEmpty)
          Some(text)
        else None
      }.mkString("\n")
      val got = HtmlMainText.extract(html, minChars, permille)
      assert(got == expected,
        s"trial $trial (min=$minChars p=$permille): '$html'\n" +
          s"got='$got'\nexp='$expected'")
      // and the kept text is always a sub-multiset of the full
      // visible text's lines (main-content never invents content)
      val full = HtmlToText.extract(html).split('\n').toSet
      got.split('\n').filter(_.nonEmpty).foreach(l =>
        assert(full.contains(l), s"trial $trial: invented line '$l'"))
    }
  }

  test("property: term_counts ≡ reference counting over random docs") {
    val rnd = new scala.util.Random(20260813L)
    val terms = Seq("alpha", "beta", "δδ", "nope", "alpha", "tok2")
    val cases = (0 until 300).map { i =>
      val n = rnd.nextInt(40)
      val seps = Array(" ", "  ", "\t", "\n", " \t ")
      val sb = new StringBuilder
      if (rnd.nextBoolean()) sb.append(seps(rnd.nextInt(seps.length)))
      (0 until n).foreach { _ =>
        sb.append(words(rnd.nextInt(words.length)))
        sb.append(seps(rnd.nextInt(seps.length)))
      }
      val s = sb.toString
      (i.toLong, if (rnd.nextInt(20) == 0) null else s)
    }
    val got = cases.toDF("id", "text")
      .select(col("id"),
        graft.functions.TermCounts(col("text"), terms).as("tc"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).toSeq)).toMap
    cases.foreach { case (id, text) =>
      val expect =
        if (text == null) null
        else {
          val toks = refTokens(text)
          terms.map(t => toks.count(_ == t).toLong)
        }
      assert(got(id) == expect, s"case $id: '$text'")
    }
  }

  test("property: bigram LM perplexity ≡ brute reference on random corpora") {
    val rnd = new scala.util.Random(20260814L)
    (0 until 8).foreach { trial =>
      val nDocs = 5 + rnd.nextInt(20)
      val docs = (0 until nDocs).map { i =>
        val n = rnd.nextInt(12)
        (i.toLong, (0 until n).map(_ =>
          words(rnd.nextInt(words.length))).filter(_.nonEmpty)
          .mkString(" "))
      }
      // brute reference: add-one bigram model + integer micro-nat sums
      val toks = docs.map { case (id, t) => id -> refTokens(t) }
        .filter(_._2.exists(_.nonEmpty))
      val vocab = toks.flatMap(_._2).filter(_.nonEmpty).distinct.size
      val bigrams = toks.flatMap { case (id, ws) =>
        ws.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
      }
      val cb = bigrams.groupBy(p => (p._2, p._3)).view.mapValues(_.size)
      val cu = bigrams.groupBy(_._2).view.mapValues(_.size)
      val expect = bigrams.groupBy(_._1).map { case (id, bs) =>
        val slp = bs.map { case (_, w1, w2) =>
          math.round(math.log((cb((w1, w2)) + 1.0) /
            (cu(w1).toDouble + vocab)) * 1e6)
        }.sum
        val ppl = BigDecimal(math.exp((slp / -1e6) / bs.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        id -> ((bs.length.toLong, ppl))
      }
      val got = graft.llm.LanguageModel.bigramPerplexity(
          docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(7)),
          "text", "doc_id")
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("property: MinHash estimate tracks true Jaccard (r10 mixer fix)") {
    // the r10 regression class: monotone per-permutation mixing makes
    // every position pick the same argmin shingle and estimates
    // collapse to ~0/1. Guard: over constructed pairs spanning the
    // similarity range, |est − trueJaccard| must stay within binomial
    // noise of k = 64 positions (σ ≈ 0.06; bound 0.25 is > 4σ)
    val rnd = new scala.util.Random(20260814L)
    val base = (0 until 40).map(i => s"w${rnd.nextInt(500)}x$i")
    (0 until 20).foreach { trial =>
      val keep = 5 + rnd.nextInt(35) // overlap 5..39 of 40
      val other = base.take(keep) ++
        (0 until (40 - keep)).map(i => s"v${rnd.nextInt(500)}y$i$trial")
      val docs = Seq((1L, base.mkString(" ")), (2L, other.mkString(" ")))
        .toDF("doc_id", "text")
      // 1-gram shingles: the jaccard is exactly set overlap
      val sigs = graft.llm.Dedup.minhashSignatures(
        docs, "text", "doc_id", k = 64, shingleN = 1)
      val est = graft.llm.Dedup.estimateJaccard(
          Seq((1L, 2L)).toDF("ida", "idb"), sigs, "doc_id")
        .head().getDouble(2)
      val a = base.toSet
      val b = other.toSet
      val truth = a.intersect(b).size.toDouble / a.union(b).size
      assert(math.abs(est - truth) < 0.25,
        s"trial $trial: est $est vs true $truth (keep=$keep)")
    }
  }

  test("property: SimHash Hamming distance tracks token overlap") {
    // graded behaviour, not just the hamming-0 identity case: pairs
    // sharing most tokens must land close, disjoint pairs far. Bounds
    // are loose (SimHash variance is real) but tight enough to catch
    // a degenerate fingerprint (constant bits, monotone mixing, ...)
    val rnd = new scala.util.Random(20260814L)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0 until 10).foreach { trial =>
      val base = (0 until 256).map(i => s"t${rnd.nextInt(5000)}i$i")
      def variant(keep: Int) = base.take(keep) ++
        (0 until (256 - keep)).map(i => s"u${rnd.nextInt(5000)}j$i$trial")
      val docs = Seq(
        (0L, base.mkString(" ")),
        (1L, variant(243).mkString(" ")), // ~95% overlap
        (2L, variant(13).mkString(" ")))  // ~5% overlap
        .toDF("doc_id", "text")
      val sigs = graft.llm.Dedup.simhash(docs, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val near = ham(sigs(0L), sigs(1L))
      val far = ham(sigs(0L), sigs(2L))
      assert(near <= 20, s"trial $trial: near pair hamming $near")
      assert(far >= 12, s"trial $trial: far pair hamming $far")
      assert(near < far, s"trial $trial: $near !< $far")
    }
  }

  test("property: hyperplane signature Hamming tracks vector angle") {
    // P(one plane separates u, v) = angle/π for random hyperplanes —
    // near-parallel pairs must agree on most sign bits, orthogonal
    // pairs on about half. Catches correlated/degenerate plane sets.
    val rnd = new scala.util.Random(20260814L)
    val dim = 64
    val nPlanes = 64
    val pl = graft.llm.Similarity.planes(nPlanes, dim)
    def sig(x: Array[Double]): Long = {
      var s = 0L
      for (j <- 0 until nPlanes) {
        val dot = (0 until dim).map(d => x(d) * pl(j)(d)).sum
        if (dot >= 0) s |= (1L << j)
      }
      s
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0 until 10).foreach { trial =>
      val u = Array.fill(dim)(rnd.nextGaussian())
      val w0 = Array.fill(dim)(rnd.nextGaussian())
      // orthogonalize w against u
      val uu = u.map(x => x * x).sum
      val uw = u.zip(w0).map { case (a, b) => a * b }.sum
      val w = w0.zip(u).map { case (b, a) => b - a * uw / uu }
      def at(theta: Double): Array[Double] =
        u.zip(w).map { case (a, b) =>
          math.cos(theta) * a + math.sin(theta) *
            b * math.sqrt(uu / w.map(x => x * x).sum) }
      val near = ham(sig(u), sig(at(0.1 * math.Pi))) // E = 6.4 bits
      val orth = ham(sig(u), sig(at(0.5 * math.Pi))) // E = 32 bits
      assert(near <= 18, s"trial $trial: near-angle hamming $near")
      assert(orth >= 18 && orth <= 46, s"trial $trial: orth hamming $orth")
      assert(near < orth, s"trial $trial: $near !< $orth")
    }
  }

  test("property: IMA-ADPCM decode ≡ imaStep replay on random streams") {
    import graft.llm.Multimodal
    val rnd = new scala.util.Random(20260814L)
    val dec = new Multimodal.ImaAdpcmWavDecoder(8)
    (0 until 60).foreach { trial =>
      val id = rnd.nextLong().abs % 1000000
      val n = rnd.nextInt(120) // 0..119 nibbles, odd and even
      val wav = Multimodal.syntheticImaAdpcmWav(id, n)
      val f = dec.decodeBatch(Seq(wav)).head
      assert(f(0) == 8000.0f && f(1) == (n + 1).toFloat, s"trial $trial")
      var pred = ((id * 31) % 65536 - 32768).toInt
      var sidx = (id % 89).toInt
      val expect = Array.ofDim[Int](8)
      expect((pred + 32768) / 8192) += 1
      (0 until n).foreach { i =>
        val st = Multimodal.imaStep(pred, sidx, ((id * 7 + i * 5) % 16).toInt)
        pred = st._1; sidx = st._2
        expect((pred + 32768) / 8192) += 1
      }
      assert(f.drop(2).map(_.toInt).toSeq == expect.toSeq,
        s"trial $trial id=$id n=$n")
    }
  }

  test("property: cut_spans ≡ reference cut over random span lists") {
    val rnd = new scala.util.Random(7071234L)
    val cases = (0 until 300).map { i =>
      val n = rnd.nextInt(25)
      val text = (0 until n).map(k => s"t$k").mkString(
        if (rnd.nextBoolean()) " " else "  ")
      val nSpans = rnd.nextInt(5)
      val spans = (0 until nSpans).map { _ =>
        val s = rnd.nextInt(n + 4) - 2 // incl. out-of-range / negative
        val len = rnd.nextInt(6)
        (s.toLong, (s + len).toLong)
      }
      (i.toLong, text, spans)
    }
    val d = cases.toDF("id", "text", "sp")
      .withColumn("__spans", transform(col("sp"), s =>
        struct(s.getField("_1").as("span_start"),
          s.getField("_2").as("span_end"))))
    val got = d.select(col("id"),
      graft.functions.CutSpans(col("text"), col("__spans")).as("t"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (id, text, spans) =>
      val toks = refTokens(text)
      val expect = toks.zipWithIndex.collect {
        case (t, i) if !spans.exists(sp => i >= sp._1 && i < sp._2) => t
      }.mkString(" ")
      assert(got(id) == expect,
        s"case $id: '$text' spans=$spans")
    }
  }

  test("property: WordPiece greedy segmentation ≡ brute reference over " +
      "random vocabularies and words (r15)") {
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcdeé" + new String(Character.toChars(0x1F600))
    def cps(s: String): Array[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < s.length) {
        val n = Character.charCount(s.codePointAt(i))
        out += s.substring(i, i + n)
        i += n
      }
      out.result().toArray
    }
    val alpha = cps(alphabet)
    def randWord(maxLen: Int): String =
      (0 until (1 + rnd.nextInt(maxLen))).map(_ =>
        alpha(rnd.nextInt(alpha.length))).mkString
    (0 until 200).foreach { trial =>
      // random multi-piece vocab (content 2..4 cps, mixed forms)
      val nP = rnd.nextInt(8)
      val pieceList = (0 until nP).map { _ =>
        val content = (0 until 2 + rnd.nextInt(3)).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString
        if (rnd.nextBoolean()) "##" + content else content
      }.distinct
      val voc = new graft.functions.WordPieceVocab(pieceList.toArray)
      val rankOf = pieceList.zipWithIndex.toMap
      (0 until 10).foreach { _ =>
        val w = randWord(8)
        val got = graft.functions.WordPieceKernel.segmentWord(w, voc).toSeq
        // brute reference: at each position the longest vocab match
        // (content ≥ 2, form by position), else the single code point
        val cs = cps(w)
        val maxLen = voc.maxContentLen
        val exp = Seq.newBuilder[Int]
        var pos = 0
        while (pos < cs.length) {
          var l = math.min(maxLen, cs.length - pos)
          var rank = -1
          while (l >= 2 && rank < 0) {
            val content = cs.slice(pos, pos + l).mkString
            val formed = if (pos == 0) content else "##" + content
            rank = rankOf.getOrElse(formed, -1)
            if (rank < 0) l -= 1
          }
          if (rank >= 0) {
            exp += graft.functions.WordPieceKernel.MultiBase + rank
            pos += l
          } else {
            val cp = cs(pos).codePointAt(0)
            exp += (if (pos == 0) cp
              else graft.functions.WordPieceKernel.ContBase + cp)
            pos += 1
          }
        }
        assert(got == exp.result(),
          s"trial $trial word '$w' vocab $pieceList")
      }
    }
  }

  test("property: hilbertValue ≡ reference xy2d at every nBits 1..16 " +
      "on random points (r15)") {
    def hRef(x0: Long, y0: Long, nBits: Int): Long = {
      val n = 1L << nBits
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val rnd = new scala.util.Random(16160816L)
    (1 to 16).foreach { nBits =>
      val n = 1L << nBits
      val pts = (0 until 40).map(_ =>
        (math.abs(rnd.nextLong()) % n, math.abs(rnd.nextLong()) % n))
      val got = pts.toDF("x", "y")
        .select(graft.core.Layout.hilbertValue(col("x"), col("y"), nBits))
        .as[Long].collect()
      pts.zip(got).foreach { case ((x, y), d) =>
        assert(d == hRef(x, y, nBits), s"nBits=$nBits ($x,$y)")
      }
    }
  }

  test("property: truncated HDF5 reads throw or agree — never misread") {
    val d = java.nio.file.Files.createTempDirectory("trunc").toString
    val longs = Array.tabulate(64)(i => i.toLong * 13 - 7)
    val doubles = Array.tabulate(64)(i => i * 0.75)
    def readAll(p: String): (Seq[Long], Seq[Double], Map[String, Any]) = {
      val h = new Hdf5File(p)
      try (h.readLongs("/g/ints").toSeq, h.readDoubles("/g/floats").toSeq,
        h.attributes("/g"))
      finally h.close()
    }
    for ((name, write) <- Seq[(String, String => Unit)](
      ("classic", p => Hdf5TestWriter.writeTree(p, Hdf5TestWriter.GroupNode(
        Map("g" -> Hdf5TestWriter.GroupNode(
          Map("ints" -> Hdf5TestWriter.DatasetNode(
            Hdf5TestWriter.LongCol("ints", longs, chunk = 16,
              deflate = true)),
            "floats" -> Hdf5TestWriter.DatasetNode(
              Hdf5TestWriter.DoubleCol("floats", doubles))),
          Seq("rate" -> Hdf5TestWriter.ADouble(1e6))))))),
      ("v2", p => Hdf5TestWriter.writeTreeV2(p, Hdf5TestWriter.GroupNode(
        Map("g" -> Hdf5TestWriter.GroupNode(
          Map("ints" -> Hdf5TestWriter.DatasetNode(
            Hdf5TestWriter.LongCol("ints", longs)),
            "floats" -> Hdf5TestWriter.DatasetNode(
              Hdf5TestWriter.DoubleCol("floats", doubles))),
          Seq("rate" -> Hdf5TestWriter.ADouble(1e6))))))))) {
      val full = s"$d/$name.h5"
      write(full)
      val expect = readAll(full)
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(full))
      val rnd = new scala.util.Random(991L)
      var threw = 0
      var agreed = 0
      (0 until 60).foreach { _ =>
        val cut = 8 + rnd.nextInt(bytes.length - 8)
        val p = s"$d/${name}_cut$cut.h5"
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          java.util.Arrays.copyOf(bytes, cut))
        try {
          val got = readAll(p)
          assert(got == expect,
            s"$name truncated at $cut/${bytes.length} SILENTLY misread")
          agreed += 1
        } catch { case _: Throwable => threw += 1 }
      }
      // sanity: truncation actually bites (most cuts land before data)
      assert(threw > 30, s"$name: only $threw/60 truncations threw")
      info(s"$name: $threw threw, $agreed agreed (of 60 truncations)")
    }
  }

  test("property: PairExpansion ≡ brute force under random buckets/caps") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    (0 until 8).foreach { trial =>
      val n = 5 + rnd.nextInt(60)
      // distinct (bucket, id) membership rows; ids unique per bucket
      val members = scala.util.Random.javaRandomToRandom(
        new java.util.Random(trial)).shuffle(
        (0 until n).map(i => (rnd.nextInt(5), i.toLong))).distinct
      val maxBucket = 2 + rnd.nextInt(12)
      val rlc = 1 + rnd.nextInt(5)
      val df = members.toDF("b", "id")
      val got = graft.llm.PairExpansion.bucketPairs(df, Seq("b"), "id",
          maxBucket, rowLocalCap = rlc, dedupPairs = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = members.groupBy(_._1).values
        .filter(g => g.size >= 2 && g.size <= maxBucket)
        .flatMap { g =>
          val ids = g.map(_._2).sorted
          for (i <- ids.indices; j <- (i + 1) until ids.size)
            yield (ids(i), ids(j))
        }.toSet
      assert(got == expect,
        s"trial $trial (cap $maxBucket, rlc $rlc): $got != $expect")
      // bipartite: random left/right memberships, per-side caps
      val left = (0 until (3 + rnd.nextInt(20)))
        .map(i => (rnd.nextInt(4), i.toLong)).distinct
      val right = (0 until (3 + rnd.nextInt(30)))
        .map(i => (rnd.nextInt(4), 100L + i)).distinct
      val capL = 1 + rnd.nextInt(6)
      val capR = 1 + rnd.nextInt(8)
      val gotB = graft.llm.PairExpansion.bucketPairsBipartite(
          left.toDF("b", "qid"), right.toDF("b", "cid"), Seq("b"),
          "qid", "cid", capL, capR, rowLocalCap = rlc)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lByB = left.groupBy(_._1)
      val rByB = right.groupBy(_._1)
      val expectB = (lByB.keySet & rByB.keySet).flatMap { b =>
        val ls = lByB(b).map(_._2)
        val rs = rByB(b).map(_._2)
        if (ls.size > capL || rs.size > capR) Nil
        else for (l <- ls; r <- rs) yield (l, r)
      }
      assert(gotB == expectB,
        s"trial $trial bipartite (caps $capL/$capR, rlc $rlc)")
    }
  }

  test("property: Misra-Gries bound holds under random streams + merges") {
    // For ANY token stream partitioned ANY way into per-partition
    // summaries merged in ANY order: every final count is an
    // UNDERestimate by at most N/(capacity+1), and every term with
    // true frequency > N/(capacity+1) survives — the guarantee
    // heavyHitterTerms' candidate-recount correctness rests on.
    import graft.functions.MgSummary
    val rnd = new scala.util.Random(20260814L)
    (0 until 40).foreach { trial =>
      val cap = 2 + rnd.nextInt(12)
      val vocab = 1 + rnd.nextInt(40)
      val n = 50 + rnd.nextInt(2000)
      // Zipf-ish skew so some terms actually clear the bound
      val stream = Array.fill(n) {
        val z = math.min(vocab - 1,
          (math.pow(rnd.nextDouble(), 2.5) * vocab).toInt)
        s"t$z"
      }
      val truth = stream.groupBy(identity).map { case (k, v) =>
        k -> v.length.toLong }
      val parts = 1 + rnd.nextInt(6)
      val summaries = stream.grouped(
        math.max(1, n / parts)).map { chunk =>
        val m = new MgSummary(cap)
        chunk.foreach(m.offer)
        m
      }.toBuffer
      // merge in shuffled order
      val order = rnd.shuffle(summaries)
      val merged = order.reduceLeft { (a, b) => a.absorb(b); a }
      val bound = n.toLong / (cap + 1) + 1 // classic MG: error ≤ N/(cap+1)
      val got = merged.sortedEntries.toMap
      got.foreach { case (t, c) =>
        val tr = truth(t)
        assert(c <= tr, s"trial $trial: $t overcounted $c > $tr")
        assert(c >= tr - bound,
          s"trial $trial: $t undercounted $c < $tr - $bound (cap=$cap n=$n)")
      }
      truth.foreach { case (t, tr) =>
        if (tr > bound)
          assert(got.contains(t),
            s"trial $trial: heavy term $t (freq $tr > $bound) evicted")
      }
      assert(merged.size <= cap)
    }
  }

  test("property: gopher_repetition ≡ independent reference on random docs") {
    // the kernel is a hand-rolled single pass (r13); this reference
    // reimplements the PINNED semantics independently: space-only
    // trim, \s+ tokens post-trim, grams joined with one space, ties to
    // the smallest gram in UTF-8 BYTE order (the oracle's collation —
    // via getBytes("UTF-8") here, a different mechanism than the
    // kernel's code-point compare), CODE-POINT lengths everywhere
    // (ADVICE r13: UTF-16 .length would diverge on non-BMP vocab, now
    // in the fixtures), coverage as a position UNION
    def ref(s: String): Seq[Double] = {
      def trimSp(x: String) = x.dropWhile(_ == ' ')
        .reverse.dropWhile(_ == ' ').reverse
      def cp(x: String): Long = x.codePointCount(0, x.length).toLong
      def utf8Lt(a: String, b: String): Boolean = {
        val ab = a.getBytes("UTF-8")
        val bb = b.getBytes("UTF-8")
        var i = 0
        while (i < ab.length && i < bb.length) {
          if (ab(i) != bb(i)) return (ab(i) & 0xff) < (bb(i) & 0xff)
          i += 1
        }
        ab.length < bb.length
      }
      def unit(us: Array[String]): (Double, Double) = {
        val kept = us.filter(u => trimSp(u).nonEmpty)
        if (kept.isEmpty) return (0.0, 0.0)
        val g = kept.groupBy(identity).map { case (u, o) => (u, o.length) }
        val du = g.values.map(c => c - 1).sum
        val ch = kept.map(cp).sum
        val dch = g.collect { case (u, c) if c > 1 =>
          (c - 1).toLong * cp(u) }.sum
        (du.toDouble / kept.length,
          if (ch > 0) dch.toDouble / ch else 0.0)
      }
      val (lf, lcf) = unit(s.split("\n", -1))
      val (pf, pcf) = unit(s.split("\n\n", -1))
      val toks = trimSp(s).split("\\s+", -1)
      val tl = cp(s)
      def grams(n: Int): Seq[String] =
        if (toks.length < n) Nil
        else (0 to toks.length - n).map(i =>
          toks.slice(i, i + n).mkString(" "))
      def top(n: Int): Double = {
        val gs = grams(n)
        if (gs.isEmpty || tl == 0) 0.0
        else {
          val cnt = gs.groupBy(identity).map { case (g, o) => (g, o.length) }
          val (bg, bc) = cnt.toSeq.sortWith { case ((g1, c1), (g2, c2)) =>
            c1 > c2 || (c1 == c2 && utf8Lt(g1, g2))
          }.head
          bc.toLong * cp(bg) / tl.toDouble
        }
      }
      def cov(n: Int): Double = {
        val tot = toks.map(cp).sum
        val gs = grams(n)
        if (gs.isEmpty || tot == 0) 0.0
        else {
          val cnt = gs.groupBy(identity).map { case (g, o) => (g, o.length) }
          val covered = gs.zipWithIndex.collect {
            case (g, i) if cnt(g) >= 2 => i until i + n
          }.flatten.toSet
          covered.toSeq.map(i => cp(toks(i))).sum.toDouble / tot
        }
      }
      Seq(lf, pf, lcf, pcf) ++ (2 to 4).map(top) ++ (5 to 10).map(cov)
    }
    val rnd = new scala.util.Random(20260816L)
    // U+1F600 (non-BMP: surrogate pair, 4-byte UTF-8) vs U+F8FF
    // (private use: one char, 3-byte UTF-8): UTF-16 code-unit order
    // puts the surrogate pair FIRST, byte/code-point order puts it
    // LAST — the exact inversion the tie-break fix must get right
    val emoji = new String(Character.toChars(0x1F600))
    val pua = "\uF8FF"
    val vocab = Array("aa", "b", "ccc", "dddd", "e!", "ff.", "gg",
      emoji, pua, emoji + pua)
    val docs = (0 until 120).map { i =>
      val nLines = rnd.nextInt(7)
      val lines = (0 until nLines).map { _ =>
        val reuse = rnd.nextInt(4) == 0
        if (reuse) "aa b ccc aa b ccc"
        else (0 until rnd.nextInt(9)).map(_ =>
          vocab(rnd.nextInt(vocab.length))).mkString(" ") +
          (if (rnd.nextBoolean()) "" else "  ")
      }
      val sep = if (rnd.nextBoolean()) "\n" else "\n\n"
      (i.toLong, lines.mkString(sep))
    } :+ {
      // the decisive inversion case, pinned deterministically: the two
      // count-1 bigrams tie; UTF-16 order picks "😀 <pua>" (cp length
      // 3 → 3/6), code-point order picks "<pua> 😀😀" (cp length 4 →
      // 4/6) — a VALUE difference, not just a different winner
      (120L, s"$emoji $pua $emoji$emoji")
    }
    import spark.implicits._
    val got = graft.llm.Repetition.repetitionMetrics(
        docs.toDF("doc_id", "t"), "t", "doc_id")
      .orderBy("doc_id").collect()
    val names = graft.functions.GopherRepetition.FieldNames
    docs.foreach { case (id, text) =>
      val want = ref(text)
      val row = got(id.toInt)
      names.zipWithIndex.foreach { case (nm, j) =>
        assert(row.getAs[Double](nm) == want(j),
          s"doc $id metric $nm: got ${row.getAs[Double](nm)}, " +
            s"want ${want(j)}\ntext=<$text>")
      }
    }
  }

  test("property: star contraction ≡ union-find on random/adversarial " +
      "graphs, in logarithmic rounds (r15)") {
    import graft.llm.Dedup
    // independent reference: driver union-find with min-root unions —
    // the same structure as the fast path but reimplemented here so the
    // pin does not depend on the code under test
    def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
        x
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id)).toMap
    }
    def check(label: String, edges: Seq[(Long, Long)],
        maxRounds: Int = 64): Int = {
      val (labels, rounds) =
        Dedup.starContractComponents(edges.toDF("ida", "idb"), maxRounds)
      val got = labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      labels.unpersist()
      assert(got == refComponents(edges), s"$label: $edges")
      rounds
    }
    // shapes that defeat min-label propagation or the convergence check:
    // a long chain (diameter = n), a shared-leaf mid-contraction state
    // (targets∩sources = ∅ but one source has two centers — the exact
    // state a src-dst-disjointness-only check would accept), a clique,
    // self-loops mixed in, and seeded sparse random graphs
    val chainRounds =
      check("chain-63", (0L until 63L).map(i => (i, i + 1)))
    assert(chainRounds <= 10,
      s"64-node chain took $chainRounds rounds — not log-shaped")
    check("shared-leaf", Seq((5L, 1L), (3L, 1L), (6L, 2L), (3L, 2L)))
    check("clique-10", for {
      a <- 0L until 10L; b <- (a + 1) until 10L
    } yield (a, b))
    check("self-loops+pair", Seq((7L, 7L), (3L, 4L), (9L, 9L)))
    val rnd = new scala.util.Random(20260816L)
    (0 until 4).foreach { g =>
      val n = 5 + rnd.nextInt(36)
      val edges = (0 until (n + rnd.nextInt(2 * n)))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      if (edges.nonEmpty) check(s"random-$g", edges)
    }
  }
}
