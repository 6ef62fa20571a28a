package graft

import org.apache.spark.sql.functions._

import graft.sources.Sitemap

/** Declarative sitemap XML parsing (r12): leaf urlset entries with
  * whitespace/CDATA/missing-lastmod edges, sitemapindex recursion
  * flags, and the drop rules (no entries, empty loc). */
class SitemapSpec extends SparkSpec {

  test("parseSitemaps: urlset entries in document order, CDATA and " +
      "whitespace stripped, lastmod null when absent") {
    import spark.implicits._
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc> https://ex.org/a </loc>
        |       <lastmod>2026-01-05</lastmod></url>
        |  <url><loc><![CDATA[https://ex.org/b?x=1&amp;y=2]]></loc></url>
        |  <url><priority>0.5</priority></url>
        |  <url><loc>https://ex.org/c</loc>
        |       <lastmod> 2026-02-06T00:00:00Z </lastmod></url>
        |</urlset>""".stripMargin
    val out = Sitemap.parseSitemaps(
        Seq(("h1", xml)).toDF("host", "sitemap_xml"))
      .orderBy("entry_pos")
      .select("host", "entry_pos", "loc", "lastmod", "is_index")
      .as[(String, Int, String, Option[String], Boolean)]
      .collect().toSeq
    // the loc-less third entry is dropped; positions stay document-order
    assert(out == Seq(
      ("h1", 0, "https://ex.org/a", Some("2026-01-05"), false),
      ("h1", 1, "https://ex.org/b?x=1&amp;y=2", None, false),
      ("h1", 3, "https://ex.org/c", Some("2026-02-06T00:00:00Z"), false)))
  }

  test("parseSitemaps: sitemapindex children flagged for recursion; " +
      "entry-less bodies vanish") {
    import spark.implicits._
    val index =
      """<sitemapindex>
        |  <sitemap><loc>https://ex.org/sitemap-1.xml</loc>
        |           <lastmod>2026-03-01</lastmod></sitemap>
        |  <sitemap><loc>https://ex.org/sitemap-2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val out = Sitemap.parseSitemaps(Seq(
        ("idx", index),
        ("empty", "<urlset></urlset>"),
        ("leaf", "<urlset><url><loc>https://ex.org/p</loc></url></urlset>"))
        .toDF("host", "sitemap_xml"))
      .select("host", "loc", "is_index")
      .as[(String, String, Boolean)].collect().toSet
    assert(out == Set(
      ("idx", "https://ex.org/sitemap-1.xml", true),
      ("idx", "https://ex.org/sitemap-2.xml", true),
      ("leaf", "https://ex.org/p", false)))
  }

  test("revisitSelect: new/modified kept with reasons, unchanged and " +
      "lastmod-less known URLs dropped") {
    import spark.implicits._
    val frontier = Seq(
      ("https://ex.org/new", Some("2026-01-02")), // absent from prev
      ("https://ex.org/newer", None), // absent, no lastmod → still new
      ("https://ex.org/changed", Some("2026-02-01")), // after fetch
      ("https://ex.org/same", Some("2026-01-10")), // before fetch
      ("https://ex.org/nosignal", None)) // known, no lastmod → drop
      .toDF("loc", "lastmod")
    val previous = Seq(
      ("https://ex.org/changed", "2026-01-15"),
      ("https://ex.org/same", "2026-01-15"),
      ("https://ex.org/nosignal", "2026-01-15"))
      .toDF("loc", "fetched_at")
    val got = graft.sources.Sitemap.revisitSelect(frontier, previous)
      .select("loc", "reason").as[(String, String)].collect().toSet
    assert(got == Set(
      ("https://ex.org/new", "new"),
      ("https://ex.org/newer", "new"),
      ("https://ex.org/changed", "modified")))
  }

  test("parseSitemaps feeds the politeness filter: discovery funnel " +
      "composition stays declarative (no UDF in the parse plan)") {
    import spark.implicits._
    val xml = "<urlset><url><loc>https://d0.example.org/p/1</loc></url>" +
      "<url><loc>https://d0.example.org/private/x</loc></url></urlset>"
    val frontier = Sitemap.parseSitemaps(
      Seq(("d0.example.org", xml)).toDF("host", "sitemap_xml"))
    val robots = Seq(("d0.example.org",
      "User-agent: *\nDisallow: /private/\nAllow: /p/\n"))
      .toDF("host", "robots_txt")
    val verdicts = graft.sources.Robots.politenessFilter(
        frontier, robots, "GraftBot", urlCol = "loc")
      .select("loc", "allowed").as[(String, Boolean)].collect().toMap
    assert(verdicts == Map(
      "https://d0.example.org/p/1" -> true,
      "https://d0.example.org/private/x" -> false))
    // the sitemap parse itself must not plan a Scala UDF
    val plan = frontier.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"),
      "sitemap parse fell out of codegen into a UDF")
  }

  test("discoverFrontier: drives a 3-level index→index→urlset tree in " +
      "one call; depth stamped; an index cycle fails loudly (r13)") {
    import spark.implicits._
    def idx(children: Seq[String]): String =
      "<sitemapindex>" + children.map(c =>
        s"<sitemap><loc>$c</loc></sitemap>").mkString + "</sitemapindex>"
    def urlset(urls: Seq[String]): String =
      "<urlset>" + urls.map(u =>
        s"<url><loc>$u</loc></url>").mkString + "</urlset>"
    // the stored "crawl": every sitemap body by its URL — the root
    // index (depth 0) lists a sub-index; the sub-index (depth 1)
    // lists leaf urlsets (depth 2); a second SEED body is already a
    // urlset, so leaves surface at mixed depths
    val store = Seq(
      "https://ex.org/s-a.xml" -> idx(Seq(
        "https://ex.org/s-a1.xml", "https://ex.org/s-a2.xml")),
      "https://ex.org/s-a1.xml" -> urlset(Seq(
        "https://ex.org/p/1", "https://ex.org/p/2")),
      "https://ex.org/s-a2.xml" -> urlset(Seq("https://ex.org/p/3")))
      .toDF("sitemap_url", "sitemap_xml")
    val seed = Seq(
      ("h1", idx(Seq("https://ex.org/s-a.xml"))),
      ("h1", urlset(Seq("https://ex.org/p/root"))))
      .toDF("host", "sitemap_xml")
    def fetchFromStore(ch: org.apache.spark.sql.DataFrame) =
      ch.select(col("host"), col("loc").as("sitemap_url"))
        .join(store, Seq("sitemap_url"))
    val got = Sitemap.discoverFrontier(seed, fetchFromStore, maxDepth = 3)
      .select("loc", "sitemap_depth").as[(String, Int)].collect().toSet
    assert(got == Set(
      ("https://ex.org/p/root", 0),
      ("https://ex.org/p/1", 2), ("https://ex.org/p/2", 2),
      ("https://ex.org/p/3", 2)))
    // a self-referential index must hit the maxDepth guard LOUDLY —
    // silently dropping unresolved index entries is corpus loss
    val cycle = Seq(
      "https://ex.org/loop.xml" -> idx(Seq("https://ex.org/loop.xml")))
      .toDF("sitemap_url", "sitemap_xml")
    val e = intercept[IllegalArgumentException] {
      Sitemap.discoverFrontier(
        Seq(("h1", idx(Seq("https://ex.org/loop.xml"))))
          .toDF("host", "sitemap_xml"),
        ch => ch.select(col("host"), col("loc").as("sitemap_url"))
          .join(cycle, Seq("sitemap_url")),
        maxDepth = 3)
    }
    assert(e.getMessage.contains("unresolved index entries"))
  }
}
