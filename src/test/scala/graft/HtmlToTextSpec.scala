package graft

import org.apache.spark.sql.functions._
import graft.functions.HtmlToText

/** The HTML→text kernel: hand-written fixtures pin every tokenizer
  * rule independently of the synthetic-HTML oracle query. */
class HtmlToTextSpec extends SparkSpec {
  import spark.implicits._

  private def x(html: String): String = HtmlToText.extract(html)

  test("block tags break lines, inline tags vanish, cells space") {
    assert(x("<p>one</p><p>two</p>") == "one\ntwo")
    assert(x("a<b>b</b>c") == "abc")
    assert(x("line one<br>line two") == "line one\nline two")
    assert(x("<tr><td>a</td><td>b</td></tr>") == "a b")
    assert(x("<h1>Title</h1>body") == "Title\nbody")
  }

  test("script/style are rawtext: content dropped, even fake tags") {
    assert(x("a<script>var x = '<b>not text</b>';</script>b") == "ab")
    assert(x("a<style>p { color: red; }</style>b") == "ab")
    assert(x("a<SCRIPT TYPE='text/javascript'>if (1 < 2) {}</ScRiPt>b")
      == "ab")
    // unclosed rawtext swallows the rest (HTML5 eof-in-script)
    assert(x("a<script>forever") == "a")
  }

  test("comments, doctype, CDATA, and processing instructions drop") {
    assert(x("a<!-- c <p>x</p> -->b") == "ab")
    assert(x("<!DOCTYPE html>a") == "a")
    assert(x("a<![CDATA[ <p>hidden</p> ]]>b") == "ab")
    assert(x("a<?xml version='1.0'?>b") == "ab")
    assert(x("a<!-- unterminated") == "a")
  }

  test("quoted '>' in attributes does not end the tag") {
    assert(x("""a<a href="x>y" title='p>q'>link</a>b""") == "alinkb")
  }

  test("a '<' not starting a tag is literal text") {
    assert(x("1 < 2 and 2 <3 and <3") == "1 < 2 and 2 <3 and <3")
    assert(x("trailing <") == "trailing <")
  }

  test("entities decode once, left to right, after tag removal") {
    assert(x("&amp; &lt;p&gt; &quot;q&quot; &apos;a&apos;")
      == "& <p> \"q\" 'a'")
    assert(x("&amp;lt;") == "&lt;")            // no double decode
    assert(x("&lt;script&gt;x&lt;/script&gt;") == "<script>x</script>")
    assert(x("&#169;&#x2014;") == "©—")
    assert(x("&nbsp;x") == "\u00A0x")          // NBSP is content
    assert(x("&bogus; &toolongtodecode1234; & x") ==
      "&bogus; &toolongtodecode1234; & x")
    assert(x("&#xZZ; &#; &#999999999;") == "&#xZZ; &#; &#999999999;")
  }

  test("whitespace: collapse runs per line, drop empty lines, trim") {
    assert(x("<p>  a\t\tb  </p>\n\n<p>c</p>") == "a b\nc")
    assert(x("<div></div><div>  </div><div>x</div>") == "x")
    assert(x("a  \f \r b") == "a b")
    assert(x("a \u00A0 b") == "a \u00A0 b")    // U+00A0 not collapsed
    assert(x("") == "")
    assert(x("<p></p>") == "")
  }

  test("full page: head/title kept, chrome stripped in order") {
    val page =
      """<!DOCTYPE html><html><head><title>My&nbsp;Page</title>
        |<style>body { margin: 0; }</style>
        |<script>console.log("<p>");</script></head>
        |<body><!-- nav --><h1>Hello &amp; welcome</h1>
        |<p>First   paragraph.</p>
        |<ul><li>one</li><li>two</li></ul>
        |</body></html>""".stripMargin
    assert(x(page) ==
      "My Page\nHello & welcome\nFirst paragraph.\none\ntwo")
  }

  test("expression: codegen and interpreted agree; null propagates") {
    val df = Seq(
      Some("<p>a &amp; b</p><script>x</script>c"),
      Some(""), None).toDF("h")
    val got = df.select(HtmlToText(col("h")).as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("a & b\nc"), Some(""), None))
    // interpreted path (no codegen) must match
    val interp = graft.functions.HtmlToText(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "<p>a &amp; b</p><script>x</script>c")))
      .eval(null).toString
    assert(interp == "a & b\nc")
  }

  test("HtmlLinks: attribute grammar, decoys, entity decode in hrefs") {
    import graft.functions.HtmlLinks
    def l(h: String): Seq[String] = HtmlLinks.links(h)
    // the three quoting forms, attribute order, boolean attrs before
    assert(l("""<a href="/a">x</a> <a href='/b'>y</a> <A HREF=/c>z</A>""")
      == Seq("/a", "/b", "/c"))
    assert(l("""<a download data-x="1" href = "/late">x</a>""")
      == Seq("/late"))
    // entity decode INSIDE the value; quoted '>' in a sibling attr
    assert(l("""<a title="a > b" href="/q?x=1&amp;y=2">t</a>""")
      == Seq("/q?x=1&y=2"))
    // decoys never leak: script rawtext, comments, closing tags,
    // href on a non-anchor tag, anchor without href
    assert(l("<script>var a = \"<a href='/s'>x</a>\";</script>" +
      "<!-- <a href=/c>c</a> --><link href=/l><a name=n>plain</a>")
      == Seq.empty)
    // document order across nesting; unterminated tag at EOF is safe
    assert(l("""<div><a href="/1">one</a><p><a href="/2">two""")
      == Seq("/1", "/2"))
    assert(l("""<a href="/ok">x</a><a href="/torn""") == Seq("/ok"))
    // expression: codegen path + null propagation
    val df = Seq(Some("""<a href="/a">x</a>"""), None).toDF("h")
    val got = df.select(HtmlLinks(col("h")).as("l")).collect()
    assert(got(0).getSeq[String](0) == Seq("/a"))
    assert(got(1).isNullAt(0))
  }

  test("HtmlAnchors: anchor text with inner-tag strip, ws collapse, " +
      "entity decode, implicit close, rawtext/comment/href-less decoys") {
    import graft.functions.HtmlAnchors
    def a(h: String): Seq[(String, String)] = HtmlAnchors.anchors(h)
    // inner tags removed, newline + runs collapse, ends trimmed
    assert(a("<a href=\"/p\"> first <b>bold</b>\n  link </a>")
      == Seq("/p" -> "first bold link"))
    // entity decode in BOTH href and text; NBSP survives
    assert(a("<a href='/q?x=1&amp;y=2'>D&amp;D&nbsp;guide</a>")
      == Seq("/q?x=1&y=2" -> "D&D guide"))
    // structural tags inside an anchor become a space
    assert(a("<a href=/s>one<br>two<p>three</a>")
      == Seq("/s" -> "one two three"))
    // a new <a> implicitly closes a dangling one; EOF closes the last
    assert(a("<a href=\"/1\">one <a href=\"/2\">two till eof")
      == Seq("/1" -> "one", "/2" -> "two till eof"))
    // decoys: script rawtext + comment anchors vanish, href-less <a>
    // text is NOT attributed to anyone
    assert(a("<script>var s = \"<a href='/d'>x</a>\";</script>" +
      "<a name=x>plain</a><!-- <a href=/c>c</a> -->" +
      "<a href=\"/real\">ok</a>") == Seq("/real" -> "ok"))
    // text before any anchor and between anchors never leaks in
    assert(a("lead <a href=/a>mid</a> tail") == Seq("/a" -> "mid"))
    // literal '<' inside anchor text ("<3" is text, the shared rule)
    assert(a("<a href=/h>i <3 scala</a>") == Seq("/h" -> "i <3 scala"))
    // expression: codegen + null propagation + struct shape
    val df = Seq(Some("<a href=\"/a\">x <b>y</b></a>"), None).toDF("h")
    val got = df.select(HtmlAnchors(col("h")).as("a")).collect()
    val row = got(0).getSeq[org.apache.spark.sql.Row](0)
    assert(row.map(r => (r.getString(0), r.getString(1)))
      == Seq(("/a", "x y")))
    assert(got(1).isNullAt(0))
  }
}
