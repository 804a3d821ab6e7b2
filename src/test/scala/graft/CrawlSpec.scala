package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftFunctions, SitemapExtract}
import graft.ops.Crawl

class CrawlSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def urls(xml: String): Seq[(String, String)] = {
    val a = SitemapExtract.urls(UTF8String.fromString(xml))
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
  }

  test("sitemap extraction: entries, entities, absent lastmod, noise") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> https://a.example/p?x=1&amp;y=2 </loc>
        |    <lastmod>2026-01-15</lastmod>
        |    <changefreq>daily</changefreq><priority>0.8</priority>
        |  </url>
        |  <url><loc>https://a.example/q</loc></url>
        |  <url><priority>0.1</priority></url>
        |</urlset>""".stripMargin
    assert(urls(xml) == Seq(
      "https://a.example/p?x=1&y=2" -> "2026-01-15",
      "https://a.example/q" -> ""))
  }

  test("sitemap-index entries extract with the same shape") {
    val xml =
      """<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>
        |<lastmod>2026-02-01</lastmod></sitemap>
        |<sitemap><loc>https://a.example/s2.xml</loc></sitemap></sitemapindex>""".stripMargin
    assert(urls(xml) == Seq(
      "https://a.example/s1.xml" -> "2026-02-01",
      "https://a.example/s2.xml" -> ""))
  }

  test("sitemap extraction tolerates attributes, whitespace, ns prefixes") {
    // attributes on the entry tag
    assert(urls("""<url changefreq="daily"><loc>https://x/a</loc></url>""") ==
      Seq("https://x/a" -> ""))
    // whitespace before '>'
    assert(urls("<url >\n<loc>https://x/b</loc></url >") ==
      Seq("https://x/b" -> ""))
    // namespace prefix on entry AND inner tags
    assert(urls("<sm:url><sm:loc>https://x/c</sm:loc>" +
      "<sm:lastmod>2026-03-01</sm:lastmod></sm:url>") ==
      Seq("https://x/c" -> "2026-03-01"))
    // prefixed sitemap-index entry
    assert(urls("<sm:sitemap><sm:loc>https://x/s.xml</sm:loc></sm:sitemap>") ==
      Seq("https://x/s.xml" -> ""))
    // '<urlset>' still does NOT match as an entry (name-END check)
    assert(urls("<urlset><urlx><loc>https://x/no</loc></urlx></urlset>") ==
      Seq())
  }

  test("sitemap extraction tolerates case, truncation, and junk") {
    assert(urls("<URL><LOC>https://x/1</LOC></URL>") == Seq("https://x/1" -> ""))
    // truncated mid-entry: loc still recovered to EOF
    assert(urls("<url><loc>https://x/2") == Seq("https://x/2" -> ""))
    assert(urls("not xml at all") == Seq())
    assert(urls("") == Seq())
  }

  test("politeSchedule: per-host slots, deterministic order, eta") {
    val frontier = Seq(
      ("a.com", "https://a.com/2", 3L),
      ("a.com", "https://a.com/1", 3L),
      ("a.com", "https://a.com/3", 3L),
      ("b.com", "https://b.com/1", 5L)).toDF("host", "url", "delay_s")
    val got = Crawl.politeSchedule(frontier, "host", "url", "delay_s")
      .select("host", "url", "seq", "eta_s")
      .as[(String, String, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a.com", "https://a.com/1", 0, 0L),
      ("a.com", "https://a.com/2", 1, 3L),
      ("a.com", "https://a.com/3", 2, 6L),
      ("b.com", "https://b.com/1", 0, 0L)))
  }

  test("politeSchedule honors a priority column before URL order") {
    val frontier = Seq(
      ("a.com", "https://a.com/low", 1L, 9),
      ("a.com", "https://a.com/hi", 1L, 1)).toDF("host", "url", "delay_s", "prio")
    val got = Crawl.politeSchedule(frontier, "host", "url", "delay_s", Some("prio"))
      .select("url", "seq").as[(String, Int)].collect().toMap
    assert(got == Map("https://a.com/hi" -> 0, "https://a.com/low" -> 1))
  }

  test("hostLoad: makespan and mean wait") {
    val frontier = Seq(
      ("a.com", "u1", 2L), ("a.com", "u2", 2L), ("a.com", "u3", 2L))
      .toDF("host", "url", "delay_s")
    val sched = Crawl.politeSchedule(frontier, "host", "url", "delay_s")
    val r = Crawl.hostLoad(sched, "host", "delay_s").head
    assert(r.getAs[Long]("n_urls") == 3L)
    assert(r.getAs[Long]("makespan_s") == 4L) // slots 0,2,4
    assert(r.getAs[Double]("mean_wait_s") == 2.0)
    assert(r.getAs[Long]("delay_s") == 2L)
    assert(r.getAs[Long]("n_delay_values") == 1L)
  }

  test("hostLoad: disagreeing per-host delays are deterministic and visible") {
    val frontier = Seq(
      ("a.com", "u1", 5L), ("a.com", "u2", 2L), ("a.com", "u3", 9L))
      .toDF("host", "url", "delay_s")
    val sched = Crawl.politeSchedule(frontier, "host", "url", "delay_s")
    val r = Crawl.hostLoad(sched, "host", "delay_s").head
    assert(r.getAs[Long]("delay_s") == 2L) // min, not an arbitrary first
    assert(r.getAs[Long]("n_delay_values") == 3L) // contract violation visible
  }

  test("sitemap kernel: column surface + null propagation") {
    val df = Seq((1L, "<url><loc>https://k/1</loc></url>"),
      (2L, null.asInstanceOf[String])).toDF("id", "xml")
    val got = df.select(col("id"),
        GraftFunctions.sitemapUrls(spark, col("xml")).as("u"))
      .orderBy("id").collect()
    assert(got(0).getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)) ==
      Seq("https://k/1"))
    assert(got(1).isNullAt(1))
  }

  test("revisitSchedule: MLE, clamps, continuity correction, fences") {
    import TestSpark.spark
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hist = Seq(
      (1L, 10L, 5L),  // λ = −ln(0.5) = 0.693…, days = 1/λ ≈ 1.44
      (2L, 10L, 0L),  // static: max interval, null rate
      (3L, 10L, 10L), // always changed: continuity-corrected, min clamp
      (4L, 2L, 1L))   // insufficient evidence
      .toDF("page", "visits", "changes")
    val got = graft.ops.Crawl.revisitSchedule(hist, "visits", "changes",
        baseDays = 1.0, minDays = 0.25, maxDays = 60.0, minVisits = 4L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getString(5)))).toMap
    val lam1 = -math.log(0.5)
    assert(got(1L) == ((Some(r6(lam1)), Some(r6(1.0 / lam1)), "scheduled")))
    assert(got(2L) == ((None, Some(60.0), "static")))
    // 10/10 → frac 0.95 → λ ≈ 3.0, 1/λ ≈ 0.33 (above the 0.25 floor)
    val lam3 = -math.log(1.0 - 0.95)
    assert(got(3L) == ((Some(r6(lam3)), Some(r6(1.0 / lam3)), "scheduled")))
    assert(got(4L) == ((None, None, "insufficient")))
    intercept[IllegalArgumentException] {
      graft.ops.Crawl.revisitSchedule(hist, "visits", "changes",
        minDays = 5.0, maxDays = 1.0)
    }
  }
}
