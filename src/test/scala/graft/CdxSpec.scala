package graft

import org.apache.spark.sql.functions._

import graft.sources.Cdx

/** CDX(J) crawl-index handling (r11): SURT edge cases, CDXJ parse on
  * hand-written lines (including torn ones — permissive null fields,
  * not a dead index), and the fetch plan's slice + per-file forward
  * ordering. */
class CdxSpec extends SparkSpec {

  test("surtKey: label reverse, www/case/fragment handling, query kept") {
    import spark.implicits._
    val cases = Seq(
      "https://www.Example.COM/a/b?q=1#frag" -> "com,example)/a/b?q=1",
      "https://sub.d.example.org/" -> "org,example,d,sub)/",
      "http://example.org" -> "org,example)/", // empty path → "/"
      // only a LEADING www. label drops
      "https://wwwx.example.org/p" -> "org,example,wwwx)/p",
      "https://www.www.example.org/p" -> "org,example,www)/p")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Cdx.surtKey(col("url")).as("surt"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (url, want) => assert(got(url) == want, url) }
  }

  test("parseCdxLines: typed fields, torn lines → nulls, casts") {
    import spark.implicits._
    val good = "org,example)/p 20260101000000 " +
      """{"url": "https://example.org/p", "mime": "text/html", """ +
      """"status": "200", "digest": "sha1:XYZ", "length": "2526", """ +
      """"offset": "91233", "filename": "a.warc.gz"}"""
    val torn = "org,example)/q 20260101000001 {\"url\": \"https:"
    val parsed = Cdx.parseCdxLines(Seq(good, torn).toDF("line"), "line")
    val rows = parsed.orderBy("ts").collect()
    val g = rows(0)
    assert(g.getAs[String]("surt") == "org,example)/p")
    assert(g.getAs[Long]("ts") == 20260101000000L)
    assert(g.getAs[String]("url") == "https://example.org/p")
    assert(g.getAs[Int]("status") == 200)
    assert(g.getAs[Long]("length") == 2526L)
    assert(g.getAs[Long]("offset") == 91233L)
    assert(g.getAs[String]("filename") == "a.warc.gz")
    val t = rows(1) // torn JSON: permissive nulls, audit don't die
    assert(t.getAs[String]("surt") == "org,example)/q")
    assert(t.isNullAt(t.fieldIndex("url")) &&
      t.isNullAt(t.fieldIndex("status")))
  }

  test("fetchPlan: status/mime slice, per-file forward offsets") {
    import spark.implicits._
    def line(id: Int, status: String, mime: String, file: String) =
      s"org,example)/p/$id 2026010100000$id " +
        s"""{"url": "https://example.org/p/$id", "mime": "$mime", """ +
        s""""status": "$status", "digest": "sha1:$id", """ +
        s""""length": "100", "offset": "${1000 - id * 100}", """ +
        s""""filename": "$file"}"""
    val lines = Seq(
      line(1, "200", "text/html", "b.warc.gz"),
      line(2, "404", "text/html", "a.warc.gz"), // dropped: status
      line(3, "200", "image/png", "a.warc.gz"), // dropped: mime
      line(4, "200", "text/html", "a.warc.gz"),
      line(5, "200", "text/html", "a.warc.gz")).toDF("line")
    val plan = Cdx.fetchPlan(Cdx.parseCdxLines(lines, "line"))
      .select("filename", "offset").as[(String, Long)].collect().toSeq
    // a.warc.gz rows first, offsets ascending within the file
    assert(plan == Seq(("a.warc.gz", 500L), ("a.warc.gz", 600L),
      ("b.warc.gz", 900L)))
    // widening the slice readmits the 404 capture
    assert(Cdx.fetchPlan(Cdx.parseCdxLines(lines, "line"),
      statuses = Seq(200, 404)).count() == 4)
  }
}
