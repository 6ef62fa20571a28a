package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT minhash_sig(shingles, 64) …")` works alongside the
  * Column API.
  *
  * Two paths: [[GraftFunctions.register]] for an existing session, and
  * [[GraftExtensions]] for cluster deploys via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def minhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "minhash_sig(shingles, k)")
    MinHashSig(exprs.head, intLit(exprs(1), "k"))
  }

  private def hist2dBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 8,
      "histogram2d(x, y, xlo, xhi, xbins, ylo, yhi, ybins)")
    def dbl(e: Expression, what: String): Double = e match {
      case Literal(v: Double, _) => v
      case Literal(v: Float, _)  => v.toDouble
      case Literal(v: Int, _)    => v.toDouble
      case Literal(v: Long, _)   => v.toDouble
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $other")
    }
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.DoubleType
    Histogram2D(Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType),
      dbl(exprs(2), "xlo"), dbl(exprs(3), "xhi"), intLit(exprs(4), "xbins"),
      dbl(exprs(5), "ylo"), dbl(exprs(6), "yhi"), intLit(exprs(7), "ybins"))
      .toAggregateExpression()
  }

  private def fingerprintBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "fingerprint64(text)")
    Fingerprint64(exprs.head)
  }

  private def cosineBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "cosine_sim(a, b)")
    CosineSim(exprs(0), exprs(1))
  }

  private def simhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash64(tokens)")
    SimHash64(exprs.head)
  }

  private def fnvBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "fnv64(text)")
    Fnv64(exprs.head)
  }

  private def winnowBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "winnowed_sketch(tokens, w)")
    WinnowedSketch(exprs.head, intLit(exprs(1), "w"))
  }

  private def minhashTextBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "minhash_text(text, k, n)")
    MinHashTextSig(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "n"))
  }

  private def simhashTextBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash_text(text)")
    SimHashText(exprs.head)
  }

  private def topTokenBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "top_token_ratio(text)")
    TopTokenRatio(exprs.head)
  }

  private def shingleHashesBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "shingle_hashes(text, n)")
    ShingleHashes(exprs.head, intLit(exprs(1), "n"))
  }

  private def ngramHashesBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "ngram_hashes(text, n)")
    NgramHashes(exprs.head, intLit(exprs(1), "n"))
  }

  private def bpeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "bpe_encode(text) [default merge table]")
    BpeEncode(exprs.head, graft.llm.Bpe.defaultMerges)
  }

  private def bpeDecodeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "bpe_decode(ids) [default merge table]")
    BpeDecode(exprs.head, graft.llm.Bpe.defaultMerges)
  }

  private def gopherRepBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "gopher_repetition(text)")
    GopherRepetition(exprs.head)
  }

  private def htmlToTextBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "html_to_text(html)")
    HtmlToText(exprs.head)
  }

  private def htmlLinksBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "html_links(html)")
    HtmlLinks(exprs.head)
  }

  private def htmlAnchorsBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "html_anchors(html)")
    HtmlAnchors(exprs.head)
  }

  private def htmlMainBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1 || exprs.length == 3,
      "html_main_text(html[, min_chars, max_link_permille])")
    if (exprs.length == 1) HtmlMainText(exprs.head)
    else HtmlMainText(exprs.head, intLit(exprs(1), "min_chars"),
      intLit(exprs(2), "max_link_permille"))
  }

  private def robotsAllowedBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "robots_allowed(robots_txt, url, agent)")
    val agent = exprs(2) match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"agent must be a string literal, got $other")
    }
    RobotsAllowed(exprs(0), exprs(1), agent)
  }

  private def normalizeTextBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "normalize_text(text) [NFC + fold + ws]")
    NormalizeText(exprs.head)
  }

  private def topkByBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "topk_by(score, id, k)")
    import org.apache.spark.sql.catalyst.expressions.Cast
    TopKByScore(Cast(exprs(0), org.apache.spark.sql.types.DoubleType),
      Cast(exprs(1), org.apache.spark.sql.types.LongType),
      intLit(exprs(2), "k")).toAggregateExpression()
  }

  private[functions] def minhashBuilderPublic(exprs: Seq[Expression])
      : Expression = minhashBuilder(exprs)
  private[functions] def hist2dBuilderPublic(exprs: Seq[Expression])
      : Expression = hist2dBuilder(exprs)
  private[functions] def fingerprintBuilderPublic(exprs: Seq[Expression])
      : Expression = fingerprintBuilder(exprs)
  private[functions] def cosineBuilderPublic(exprs: Seq[Expression])
      : Expression = cosineBuilder(exprs)
  private[functions] def simhashBuilderPublic(exprs: Seq[Expression])
      : Expression = simhashBuilder(exprs)
  private[functions] def fnvBuilderPublic(exprs: Seq[Expression])
      : Expression = fnvBuilder(exprs)
  private[functions] def winnowBuilderPublic(exprs: Seq[Expression])
      : Expression = winnowBuilder(exprs)
  private[functions] def minhashTextBuilderPublic(exprs: Seq[Expression])
      : Expression = minhashTextBuilder(exprs)
  private[functions] def simhashTextBuilderPublic(exprs: Seq[Expression])
      : Expression = simhashTextBuilder(exprs)
  private[functions] def topTokenBuilderPublic(exprs: Seq[Expression])
      : Expression = topTokenBuilder(exprs)
  private[functions] def shingleHashesBuilderPublic(exprs: Seq[Expression])
      : Expression = shingleHashesBuilder(exprs)
  private[functions] def ngramHashesBuilderPublic(exprs: Seq[Expression])
      : Expression = ngramHashesBuilder(exprs)
  private[functions] def topkByBuilderPublic(exprs: Seq[Expression])
      : Expression = topkByBuilder(exprs)
  private[functions] def bpeBuilderPublic(exprs: Seq[Expression])
      : Expression = bpeBuilder(exprs)
  private[functions] def bpeDecodeBuilderPublic(exprs: Seq[Expression])
      : Expression = bpeDecodeBuilder(exprs)
  private[functions] def gopherRepBuilderPublic(exprs: Seq[Expression])
      : Expression = gopherRepBuilder(exprs)
  private[functions] def htmlToTextBuilderPublic(exprs: Seq[Expression])
      : Expression = htmlToTextBuilder(exprs)
  private[functions] def htmlLinksBuilderPublic(exprs: Seq[Expression])
      : Expression = htmlLinksBuilder(exprs)
  private[functions] def htmlAnchorsBuilderPublic(exprs: Seq[Expression])
      : Expression = htmlAnchorsBuilder(exprs)
  private[functions] def htmlMainBuilderPublic(exprs: Seq[Expression])
      : Expression = htmlMainBuilder(exprs)
  private[functions] def robotsAllowedBuilderPublic(exprs: Seq[Expression])
      : Expression = robotsAllowedBuilder(exprs)
  private[functions] def normalizeTextBuilderPublic(exprs: Seq[Expression])
      : Expression = normalizeTextBuilder(exprs)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig", minhashBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("histogram2d", hist2dBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("fingerprint64", fingerprintBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", cosineBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", simhashBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("fnv64", fnvBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("winnowed_sketch", winnowBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_text", minhashTextBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("simhash_text", simhashTextBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("top_token_ratio", topTokenBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes", shingleHashesBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("ngram_hashes", ngramHashesBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("topk_by", topkByBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("bpe_encode", bpeBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("bpe_decode", bpeDecodeBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("gopher_repetition", gopherRepBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("html_to_text", htmlToTextBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("html_links", htmlLinksBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("html_anchors", htmlAnchorsBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("html_main_text", htmlMainBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("robots_allowed", robotsAllowedBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("normalize_text", normalizeTextBuilder, "scala_udf")
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      GraftFunctions.minhashBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("histogram2d"),
      new ExpressionInfo(classOf[Histogram2D].getName, "histogram2d"),
      GraftFunctions.hist2dBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "fingerprint64"),
      GraftFunctions.fingerprintBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      GraftFunctions.cosineBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      GraftFunctions.simhashBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
      GraftFunctions.fnvBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("winnowed_sketch"),
      new ExpressionInfo(classOf[WinnowedSketch].getName, "winnowed_sketch"),
      GraftFunctions.winnowBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("minhash_text"),
      new ExpressionInfo(classOf[MinHashTextSig].getName, "minhash_text"),
      GraftFunctions.minhashTextBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("simhash_text"),
      new ExpressionInfo(classOf[SimHashText].getName, "simhash_text"),
      GraftFunctions.simhashTextBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("top_token_ratio"),
      new ExpressionInfo(classOf[TopTokenRatio].getName, "top_token_ratio"),
      GraftFunctions.topTokenBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      GraftFunctions.shingleHashesBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      GraftFunctions.ngramHashesBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by"),
      GraftFunctions.topkByBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      GraftFunctions.bpeBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("bpe_decode"),
      new ExpressionInfo(classOf[BpeDecode].getName, "bpe_decode"),
      GraftFunctions.bpeDecodeBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("gopher_repetition"),
      new ExpressionInfo(classOf[GopherRepetition].getName,
        "gopher_repetition"),
      GraftFunctions.gopherRepBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("html_to_text"),
      new ExpressionInfo(classOf[HtmlToText].getName, "html_to_text"),
      GraftFunctions.htmlToTextBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("html_links"),
      new ExpressionInfo(classOf[HtmlLinks].getName, "html_links"),
      GraftFunctions.htmlLinksBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("html_anchors"),
      new ExpressionInfo(classOf[HtmlAnchors].getName, "html_anchors"),
      GraftFunctions.htmlAnchorsBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("html_main_text"),
      new ExpressionInfo(classOf[HtmlMainText].getName, "html_main_text"),
      GraftFunctions.htmlMainBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("robots_allowed"),
      new ExpressionInfo(classOf[RobotsAllowed].getName, "robots_allowed"),
      GraftFunctions.robotsAllowedBuilderPublic _))
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      GraftFunctions.normalizeTextBuilderPublic _))
  }
}
