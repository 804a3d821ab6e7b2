package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RobotsKernels
import graft.ops.Robots

class RobotsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def rules(content: String, agent: String = "bot"): Seq[String] = {
    val arr = RobotsKernels.rules(UTF8String.fromString(content), UTF8String.fromString(agent))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  private def decide(content: String, path: String, agent: String = "bot"): Boolean =
    RobotsKernels.allowed(UTF8String.fromString(path),
      RobotsKernels.rules(UTF8String.fromString(content), UTF8String.fromString(agent)))

  test("pattern matching: prefix, wildcard, end anchor") {
    import RobotsKernels.patternMatches
    assert(patternMatches("/foobar", "/foo"))
    assert(!patternMatches("/bar/foo", "/foo"))
    assert(patternMatches("/a/x/b/tail", "/a/*/b"))
    assert(!patternMatches("/a/x/c", "/a/*/b"))
    assert(patternMatches("/cache/f.tmp", "/*.tmp$"))
    assert(!patternMatches("/cache/f.tmp.bak", "/*.tmp$"))
    assert(patternMatches("/exact", "/exact$"))
    assert(!patternMatches("/exactly", "/exact$"))
    assert(patternMatches("/foo/anything", "/foo*$"))
    assert(patternMatches("/a**b", "/a**b")) // literal double star collapses
  }

  test("parsing: comments, CRLF, field case, empty patterns, group boundaries") {
    val txt = "# top comment\r\nUSER-AGENT: Bot\r\nDisallow: /a # trailing\r\n" +
      "Disallow:\r\nAllow: /a/ok\r\nUser-agent: other\r\nDisallow: /\r\n"
    assert(rules(txt) == Seq("D:/a", "A:/a/ok")) // empty Disallow is a no-op
  }

  test("consecutive user-agent lines share a group; matching groups combine") {
    val txt =
      """User-agent: bot
        |User-agent: crawler
        |Disallow: /x
        |
        |User-agent: bot
        |Disallow: /y
        |""".stripMargin
    assert(rules(txt) == Seq("D:/x", "D:/y"))
    assert(rules(txt, agent = "crawler") == Seq("D:/x"))
  }

  test("specific agent group beats '*'; '*' serves unknown agents") {
    val txt =
      """User-agent: graftbot
        |Disallow: /
        |User-agent: *
        |Allow: /
        |""".stripMargin
    assert(!decide(txt, "/anything", agent = "graftbot"))
    assert(decide(txt, "/anything", agent = "somebody"))
  }

  test("longest match wins; allow wins equal-length ties; default allow") {
    val txt =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/pub
        |""".stripMargin
    assert(!decide(txt, "/private/secret"))
    assert(decide(txt, "/private/pub/x")) // longer allow overrides
    assert(decide(txt, "/open/page")) // no rule matches
    val tie = "User-agent: *\nDisallow: /p/a\nAllow: /p/b\nAllow: /p/a\n"
    assert(decide(tie, "/p/a")) // equal length: allow wins
  }

  test("filterAllowed: per-host policies, missing robots host passes") {
    val urls = Seq(
      (1L, "http://a.com/private/x"), (2L, "http://a.com/ok"),
      (3L, "http://norobots.com/private/x"), (4L, "http://b.com/any"))
      .toDF("id", "url")
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /private/"),
      ("b.com", "User-agent: *\nDisallow: /")).toDF("host", "robots_txt")
    val kept = Robots.filterAllowed(spark, urls, "url", robots, "bot")
    assert(kept.columns.toSeq == Seq("id", "url"))
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("kernels survive codegen in a full projection (SQL surface)") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_robots_allowed('/x/y', " +
        "graft_robots_rules('User-agent: *\nDisallow: /x', '*')) AS d").as[Boolean].head()
    assert(!got)
  }

  test("crawl-delay: group selection, max-wins, junk, absence") {
    import org.apache.spark.unsafe.types.UTF8String
    def delay(body: String, agent: String): Option[Double] =
      Option(graft.functions.RobotsKernels.crawlDelay(
        UTF8String.fromString(body), UTF8String.fromString(agent)))
        .map(_.doubleValue)
    // agent-specific group beats '*'
    val body = "User-agent: graftbot\nCrawl-delay: 10\n\nUser-agent: *\nCrawl-delay: 1"
    assert(delay(body, "graftbot").contains(10.0))
    assert(delay(body, "otherbot").contains(1.0))
    // several matching groups: the conservative MAX wins
    val multi = "User-agent: a\nCrawl-delay: 2\n\nUser-agent: a\nCrawl-delay: 7.5"
    assert(delay(multi, "a").contains(7.5))
    // junk / negative values are ignored; comments strip
    assert(delay("User-agent: *\nCrawl-delay: soon", "x").isEmpty)
    assert(delay("User-agent: *\nCrawl-delay: -3", "x").isEmpty)
    assert(delay("User-agent: *\nCrawl-delay: 4 # seconds", "x").contains(4.0))
    // absent directive / null-ish body
    assert(delay("User-agent: *\nDisallow: /", "x").isEmpty)
    assert(Option(graft.functions.RobotsKernels.crawlDelay(null,
      UTF8String.fromString("x"))).isEmpty)
    // crawl-delay lines never leak into the rule list
    val rules = graft.functions.RobotsKernels.rules(
      UTF8String.fromString(body), UTF8String.fromString("graftbot"))
    assert(rules.numElements() == 0)
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_robots_delay('User-agent: *\nCrawl-delay: 3', 'b') AS d")
      .as[Double].head()
    assert(viaSql == 3.0)
  }
}
