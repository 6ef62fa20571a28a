package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap ingestion (the sitemaps.org protocol) — closes the crawl
  * DISCOVERY loop: robots.txt surfaces each host's sitemap URLs
  * ([[Robots.hostDirectives]]), the sitemap bodies enumerate the
  * host's canonical URL inventory (`<loc>` + `<lastmod>`), and the
  * resulting frontier feeds the canonicalize → robots → dedup →
  * domain-cap funnel.
  *
  * Parsing is ALL-DECLARATIVE (the [[Cdx]] pattern):
  * `regexp_extract_all` over the XML body + higher-order transforms —
  * zero per-row Scala UDFs, the whole parse stays inside whole-stage
  * codegen. Machine-generated sitemaps are regular enough for anchored
  * regexes; a `<url>` block with no `<loc>` is dropped. Both leaf
  * `<urlset>` files and `<sitemapindex>` files parse — index entries
  * come back flagged `is_index` so a frontier driver can recurse.
  *
  * Scale shape: sitemap bodies are per-HOST dimension data (like
  * robots.txt) but each body lists up to 50k URLs (the protocol cap),
  * so the parse EXPLODES dimension rows into a fact-sized frontier —
  * map-only, no shuffle of its own; filter/cap the frontier in the
  * same stage before anything downstream shuffles. */
object Sitemap {

  /** One entry field: tag body with optional CDATA wrapper and
    * surrounding whitespace stripped. */
  private def field(block: Column, tag: String): Column =
    regexp_extract(block,
      s"(?s)<$tag>\\s*(?:<!\\[CDATA\\[)?(.*?)(?:\\]\\]>)?\\s*</$tag>", 1)

  /** Per-entry parse of sitemap XML bodies: one output row per
    * `<url>` / `<sitemap>` entry — the input columns plus
    * `(entry_pos, loc, lastmod, is_index)` where `entry_pos` is the
    * entry's 0-based document-order position (url entries before index
    * entries), `lastmod` is null when absent, and `is_index` flags
    * `<sitemapindex>` children (recurse to leaf sitemaps). Rows with
    * no entries vanish; entries with an empty `<loc>` are dropped. */
  def parseSitemaps(
      df: DataFrame,
      xmlCol: String = "sitemap_xml"): DataFrame = {
    val urlBlocks = regexp_extract_all(
      col(xmlCol), lit("(?s)<url>(.*?)</url>"), lit(1))
    val idxBlocks = regexp_extract_all(
      col(xmlCol), lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))
    val entries = concat(
      transform(urlBlocks,
        b => struct(b.as("b"), lit(false).as("idx"))),
      transform(idxBlocks,
        b => struct(b.as("b"), lit(true).as("idx"))))
    val lastmod = field(col("__entry.b"), "lastmod")
    df.select(col("*"), posexplode(entries).as(Seq("entry_pos", "__entry")))
      .withColumn("loc", field(col("__entry.b"), "loc"))
      .withColumn("lastmod",
        when(lastmod === "", lit(null).cast("string")).otherwise(lastmod))
      .withColumn("is_index", col("__entry.idx"))
      .drop("__entry", xmlCol)
      .filter(col("loc") =!= "")
  }
}
