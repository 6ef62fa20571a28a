package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDX(J) crawl-index handling — the step BEFORE WARC ingestion at
  * 100 TB: a crawl publishes a columnar index (one line per capture:
  * SURT key, 14-digit timestamp, JSON fields) exactly so a pipeline
  * can select the captures it wants (status 200, text/html, byte
  * ranges) and fetch only those WARC record ranges, instead of
  * scanning every archive file. Reference layout: Common Crawl's
  * `cc-index` CDXJ (`<surt> <timestamp> <json>`), itself the CDX
  * server / pywb interchange format.
  *
  * Everything here is declarative: SURT is a regexp+array expression
  * chain, CDXJ parsing is two `regexp_extract`s + Spark's native
  * `from_json` — all codegen-friendly, no UDFs, so index selection
  * pushes through Catalyst like any other filter. */
object Cdx {

  /** SURT (Sort-friendly URI Reordering Transform) key of a URL:
    * `com,example)/path?query` — host lowercased, leading `www.`
    * dropped, labels REVERSED and comma-joined, then `)` and the path
    * (query kept, fragment cut, empty path → `/`). The crawl index's
    * primary sort key: one host's captures (and one registered
    * domain's subdomains) become one contiguous key range. */
  def surtKey(url: Column): Column = {
    val host = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noWww = regexp_replace(host, "^www\\.", "")
    val rawPath = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    concat(array_join(reverse(split(noWww, "\\.")), ","), lit(")"), path)
  }

  /** The JSON field block of a CDXJ line (the Common Crawl cc-index
    * surface; every value is a JSON STRING per the format — cast after
    * parse). */
  val cdxJsonSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("length", StringType),
    StructField("offset", StringType),
    StructField("filename", StringType)))

  /** Parse CDXJ lines into typed capture rows: input columns plus
    * `surt`, `ts` (14-digit capture timestamp as long) and the JSON
    * fields — `length`/`offset` cast to long for range-fetch
    * arithmetic. A line that doesn't split `<surt> <ts> {json}` or
    * whose JSON is malformed yields null fields (Spark's from_json
    * PERMISSIVE default) — callers audit with `WHERE url IS NULL`
    * rather than dying mid-index; a 100 TB index always carries a few
    * torn lines. */
  def parseCdxLines(df: DataFrame, lineCol: String): DataFrame = {
    val line = col(lineCol)
    val fields = from_json(
      regexp_extract(line, "^\\S+ \\S+ (.*)$", 1), cdxJsonSchema)
    df.withColumn("surt", regexp_extract(line, "^(\\S+) ", 1))
      .withColumn("ts",
        regexp_extract(line, "^\\S+ (\\S+) ", 1).cast("long"))
      .withColumn("__j", fields)
      .select(df.columns.map(col).toIndexedSeq ++ Seq(
        col("surt"), col("ts"),
        col("__j.url").as("url"),
        col("__j.mime").as("mime"),
        col("__j.status").cast("int").as("status"),
        col("__j.digest").as("digest"),
        col("__j.length").cast("long").as("length"),
        col("__j.offset").cast("long").as("offset"),
        col("__j.filename").as("filename")): _*)
  }

  /** Index-driven fetch planning: select the captures worth fetching
    * (by default the classic curation slice — HTTP 200 text/html) and
    * emit the WARC range-fetch list, coalesced per archive file and
    * ordered by offset so a fetcher reads each file once, forward.
    * This is the 100 TB entry point: the index is ~1/1000th the
    * archive bytes, and everything downstream (robots, extraction,
    * dedup) runs only on the selected ranges. */
  def fetchPlan(
      captures: DataFrame,
      statuses: Seq[Int] = Seq(200),
      mimes: Seq[String] = Seq("text/html")): DataFrame =
    captures
      .filter(col("status").isin(statuses.map(Integer.valueOf): _*) &&
        col("mime").isin(mimes: _*))
      .select("filename", "offset", "length", "surt", "ts", "digest")
      .orderBy("filename", "offset")
}
