package graft

import org.apache.spark.sql.functions._

import graft.sources.Robots
import graft.sources.Robots.Rule

/** robots.txt politeness (r11): RFC 9309 group selection, wildcard/
  * anchor matching, longest-match + Allow-tie precedence, and the
  * broadcast politenessFilter plumbing (missing-host default, null
  * handling, codegen kernel ≡ direct library calls). */
class RobotsSpec extends SparkSpec {

  // --- group selection -------------------------------------------------

  test("rulesFor: exact agent group beats *, case-insensitive") {
    val body =
      "User-agent: *\nDisallow: /\n\n" +
        "User-Agent: GraftBot\nAllow: /a\nDisallow: /b\n"
    assert(Robots.rulesFor(body, "graftbot") ==
      Vector(Rule(true, "/a"), Rule(false, "/b")))
    // unknown agent falls back to the * group
    assert(Robots.rulesFor(body, "OtherBot") == Vector(Rule(false, "/")))
  }

  test("rulesFor: multiple groups for the same agent UNION in file order") {
    val body =
      "User-agent: a\nDisallow: /x\n\n" +
        "User-agent: b\nDisallow: /y\n\n" +
        "User-agent: a\nAllow: /z\n"
    assert(Robots.rulesFor(body, "a") ==
      Vector(Rule(false, "/x"), Rule(true, "/z")))
  }

  test("rulesFor: stacked User-agent lines share one rule set") {
    val body = "User-agent: a\nUser-agent: b\nDisallow: /q\n"
    assert(Robots.rulesFor(body, "a") == Vector(Rule(false, "/q")))
    assert(Robots.rulesFor(body, "b") == Vector(Rule(false, "/q")))
  }

  test("rulesFor: comments, CRLF, empty values, orphan rules, unknown " +
      "directives") {
    val body =
      "Disallow: /orphan\r\n" + // before any group: binds nobody
        "User-agent: a # inline comment\r\n" +
        "Disallow:\r\n" + // empty value: historic allow-all no-op
        "Crawl-delay: 5\r\n" + // unknown directive: no rule, ends UA run
        "disallow: /real\r\n" // lowercase key still parses
    assert(Robots.rulesFor(body, "a") == Vector(Rule(false, "/real")))
    // the crawl-delay line ended the UA run: a later User-agent opens
    // a NEW group rather than extending the first
    val two = body + "User-agent: b\nDisallow: /other\n"
    assert(Robots.rulesFor(two, "a") == Vector(Rule(false, "/real")))
    assert(Robots.rulesFor(two, "b") == Vector(Rule(false, "/other")))
  }

  test("rulesFor: no matching group and no * group = empty (allow all)") {
    assert(Robots.rulesFor("User-agent: x\nDisallow: /\n", "y").isEmpty)
    assert(Robots.rulesFor("", "y").isEmpty)
  }

  // --- pattern matching -------------------------------------------------

  test("matches: prefix, wildcard runs, final-$ anchor, literal mid-$") {
    assert(Robots.matches("/p", "/private/x"))
    assert(!Robots.matches("/p/", "/private/x"))
    assert(Robots.matches("/*.pdf$", "/a/b.pdf"))
    assert(!Robots.matches("/*.pdf$", "/a/b.pdfx"))
    assert(Robots.matches("/*.pdf", "/a/b.pdfx")) // unanchored: prefix
    assert(Robots.matches("/a*c*e", "/abcde"))
    assert(!Robots.matches("/a*z", "/abc"))
    // $ not in final position is a literal octet per the RFC grammar
    assert(Robots.matches("/a$b", "/a$b/c"))
    assert(!Robots.matches("/a$b", "/ab"))
    // empty pattern matches everything (zero-length prefix)
    assert(Robots.matches("", "/x"))
  }

  test("matches: property cross-check vs a regex translation over " +
      "randomized patterns and paths") {
    // ground truth independent of the backtracking walker: * → .*,
    // final $ → end anchor, everything else quoted, prefix semantics
    // = ^...(rest anything)
    def regexTruth(pattern: String, path: String): Boolean = {
      val anchored = pattern.nonEmpty && pattern.last == '$'
      val body = (if (anchored) pattern.dropRight(1) else pattern)
        .split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*")
      val full = if (anchored) s"^$body$$" else s"^$body.*"
      java.util.regex.Pattern.compile(full, java.util.regex.Pattern.DOTALL)
        .matcher(path).matches()
    }
    val rnd = new scala.util.Random(4111)
    val alphabet = "ab/.$*"
    def randStr(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    var checked = 0
    for (_ <- 0 until 4000) {
      val pattern = randStr(8)
      // a mid-string $ is a literal in the walker; the regex truth
      // quotes it identically, so include those cases too
      val path = randStr(10).replace("*", "x") // paths have no meta *
      val got = Robots.matches(pattern, path)
      assert(got == regexTruth(pattern, path),
        s"pattern='$pattern' path='$path': walker=$got")
      checked += 1
    }
    assert(checked == 4000)
  }

  test("matches: adversarial many-star pattern is polynomial, not " +
      "exponential (hostile robots.txt DoS)") {
    // naive backtracking takes ~2^n here; the greedy walker is O(p·s)
    val pattern = "/" + ("*a" * 20) + "*b"
    val path = "/" + "a" * 2000
    val t0 = System.nanoTime()
    assert(!Robots.matches(pattern, path))
    assert(Robots.matches(pattern, path.dropRight(1) + "ab"))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"hostile pattern took ${ms}ms — matcher is " +
      "backtracking exponentially")
  }

  test("directivesFor: bodies beyond the RFC 9309 500 KiB cap are " +
      "truncated at a line boundary; a torn trailing directive never " +
      "binds") {
    val head = "User-agent: graft\nDisallow: /blocked\n"
    val filler = ("# " + "x" * 96 + "\n") * (Robots.MaxBodyBytes / 99 + 10)
    val tail = "Allow: /blocked\n" // beyond the cap: must be ignored
    val body = head + filler + tail
    assert(body.length > Robots.MaxBodyBytes)
    val d = Robots.directivesFor(body, "graft")
    assert(d.rules == Vector(Robots.Rule(allow = false, "/blocked")))
    // under the cap the same directives all bind
    val small = Robots.directivesFor(head + tail, "graft")
    assert(small.rules.size == 2)
  }

  test("isAllowed: longest match wins; equal-length tie goes to Allow; " +
      "no match = allowed") {
    val rules = Vector(
      Rule(false, "/p"), Rule(true, "/p/"), // longer Allow wins
      Rule(true, "/dl/"), Rule(false, "/dl/")) // tie: Allow wins
    assert(Robots.isAllowed(rules, "/p/x"))
    assert(!Robots.isAllowed(rules, "/private"))
    assert(Robots.isAllowed(rules, "/dl/x"))
    assert(Robots.isAllowed(rules, "/elsewhere"))
    assert(Robots.isAllowed(Vector.empty, "/anything"))
    // order independence of the tie/longest logic
    assert(Robots.isAllowed(rules.reverse, "/p/x"))
    assert(Robots.isAllowed(rules.reverse, "/dl/x"))
  }

  // --- DataFrame politeness filter ---------------------------------------

  test("politenessFilter: verdict column, missing-host default, " +
      "root-path normalization") {
    import spark.implicits._
    val robots = Seq(
      ("ex.org",
        "User-agent: *\nDisallow: /\n\n" +
          "User-agent: GraftBot\nDisallow: /private/\nAllow: /p/\n"),
      ("other.org", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "robots_txt")
    val urls = Seq(
      (1L, "https://ex.org/p/1"), // GraftBot group: allowed
      (2L, "https://ex.org/private/2"), // GraftBot group: denied
      (3L, "https://EX.ORG/p/3"), // host match is case-insensitive
      (4L, "https://other.org/x"), // * group deny-all
      (5L, "https://norobots.org/y"), // no robots row: allowed
      (6L, "https://ex.org"), // no path → "/" (not matched by /private/)
      (7L, "https://ex.org/private/7?k=v") // query string is matched text
    ).toDF("doc_id", "url")
    val got = Robots.politenessFilter(urls, robots, "GraftBot")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> true, 7L -> false))
    // schema contract: input columns preserved, helpers dropped
    assert(Robots.politenessFilter(urls, robots, "GraftBot").columns
      .toSeq == Seq("doc_id", "url", "allowed"))
  }

  test("RobotsAllowed kernel: codegen path ≡ library calls; null in → " +
      "null out") {
    import spark.implicits._
    val bodies = Seq(
      "User-agent: *\nDisallow: /p\nAllow: /p/\n",
      "User-agent: GraftBot\nDisallow: /*.pdf$\n",
      "User-agent: other\nDisallow: /\n", // GraftBot unbound: allow
      "")
    val paths = Seq("/p", "/p/x", "/q/a.pdf", "/q/a.pdfz", "/")
    val rows = for { b <- bodies; p <- paths } yield (b, p)
    val df = rows.toDF("robots", "path").withColumn("v",
      graft.functions.RobotsAllowed(col("robots"), col("path"), "GraftBot"))
    val got = df.as[(String, String, Boolean)].collect()
    got.foreach { case (b, p, v) =>
      assert(v == Robots.isAllowed(Robots.rulesFor(b, "GraftBot"), p),
        s"mismatch for body=${b.take(30)} path=$p")
    }
    val nulls = Seq((null: String, "/x"), ("User-agent: *\nDisallow: /\n",
      null: String)).toDF("robots", "path").withColumn("v",
      graft.functions.RobotsAllowed(col("robots"), col("path"), "GraftBot"))
    assert(nulls.select("v").collect().forall(_.isNullAt(0)))
  }

  test("directivesFor: crawl-delay binds per group (min across the " +
      "agent's groups), sitemaps are file-global and distinct") {
    val body =
      "Sitemap: https://s.org/a.xml\n" +
        "User-agent: *\nCrawl-delay: 1\nDisallow: /\n\n" +
        "User-agent: bot\nCrawl-delay: 10\nAllow: /\n\n" +
        "User-agent: bot\nCrawl-delay: 3\n" +
        "sitemap: https://s.org/b.xml\n" +
        "Sitemap: https://s.org/a.xml\n" // duplicate: distinct'd
    val d = Robots.directivesFor(body, "bot")
    assert(d.crawlDelay.contains(3.0)) // min over bot groups {10, 3}, not *'s 1
    assert(d.sitemaps == Vector("https://s.org/a.xml", "https://s.org/b.xml"))
    // fallback group's delay applies to unbound agents
    assert(Robots.directivesFor(body, "other").crawlDelay.contains(1.0))
    // sitemaps visible regardless of binding group
    assert(Robots.directivesFor(body, "other").sitemaps.size == 2)
    // unparseable / absent delay → None; rulesFor still sees the rules
    assert(Robots.directivesFor(
      "User-agent: x\nCrawl-delay: soon\nDisallow: /q\n", "x")
      .crawlDelay.isEmpty)
    assert(Robots.rulesFor(
      "User-agent: x\nCrawl-delay: soon\nDisallow: /q\n", "x") ==
      Vector(Rule(false, "/q")))
  }

  test("hostDirectives: per-host scheduler frame, null delay when unset") {
    import spark.implicits._
    val robots = Seq(
      ("A.org", "User-agent: *\nCrawl-delay: 2.5\n" +
        "Sitemap: https://a.org/s.xml\nDisallow: /x\n"),
      ("b.org", "User-agent: *\nDisallow: /\n")
    ).toDF("host", "robots_txt")
    val got = Robots.hostDirectives(robots, "GraftBot")
      .as[(String, Option[Double], Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a.org") == (Some(2.5), Seq("https://a.org/s.xml")))
    assert(got("b.org") == (None, Seq.empty))
  }

  test("fetchSchedule: per-host serial slots, crawl-delay offsets, " +
      "default for unset/missing hosts") {
    import spark.implicits._
    val robots = Seq(
      ("slow.org", "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"),
      ("fast.org", "User-agent: *\nDisallow: /x\n") // no delay → default
    ).toDF("host", "robots_txt")
    val dirs = Robots.hostDirectives(robots, "GraftBot")
    val urls = Seq(
      "https://slow.org/b", "https://slow.org/a", "https://slow.org/c",
      "https://fast.org/1", "https://fast.org/2",
      "https://norobots.org/z" // no directives row → default delay
    ).toDF("url")
    val got = Robots.fetchSchedule(urls, dirs, defaultDelayMs = 100L)
      .select("host", "slot", "url", "fetch_offset_ms")
      .as[(String, Int, String, Long)].collect().toSet
    assert(got == Set(
      ("slow.org", 1, "https://slow.org/a", 0L),
      ("slow.org", 2, "https://slow.org/b", 2500L),
      ("slow.org", 3, "https://slow.org/c", 5000L),
      ("fast.org", 1, "https://fast.org/1", 0L),
      ("fast.org", 2, "https://fast.org/2", 100L),
      ("norobots.org", 1, "https://norobots.org/z", 0L)))
  }

  test("fetchSchedule: Retry-After backoff max-merges with crawl-delay " +
      "per host; absent hosts back off nothing") {
    import spark.implicits._
    val robots = Seq(
      ("slow.org", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"),
      ("fast.org", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "robots_txt")
    val dirs = Robots.hostDirectives(robots, "GraftBot")
    val urls = Seq(
      "https://slow.org/a", "https://slow.org/b", // backoff < delay
      "https://fast.org/1", "https://fast.org/2", // backoff > default
      "https://norobots.org/y", "https://norobots.org/z") // backoff only
      .toDF("url")
    val backoff = Seq(
      ("slow.org", 500L), // loses to the 2000 ms crawl-delay
      ("fast.org", 900L), // beats the 100 ms default
      ("NOROBOTS.org", 7000L)) // host matching is case-insensitive
      .toDF("host", "retry_after_ms")
    val got = Robots.fetchSchedule(urls, dirs, defaultDelayMs = 100L,
        backoff = Some(backoff))
      .select("host", "slot", "url", "fetch_offset_ms")
      .as[(String, Int, String, Long)].collect().toSet
    assert(got == Set(
      ("slow.org", 1, "https://slow.org/a", 0L),
      ("slow.org", 2, "https://slow.org/b", 2000L),
      ("fast.org", 1, "https://fast.org/1", 0L),
      ("fast.org", 2, "https://fast.org/2", 900L),
      ("norobots.org", 1, "https://norobots.org/y", 0L),
      ("norobots.org", 2, "https://norobots.org/z", 7000L)))
  }

  test("RobotsAllowed: wildcard agent token rejected at construction") {
    intercept[IllegalArgumentException] {
      graft.functions.RobotsAllowed(lit("x"), lit("/p"), "*")
    }
    intercept[IllegalArgumentException] {
      graft.functions.RobotsAllowed(lit("x"), lit("/p"), "")
    }
  }
}
