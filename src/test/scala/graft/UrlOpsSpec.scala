package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UrlOps

class UrlOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.normalizeUrl(col("u")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("normalize: case, default ports, fragments, tracking params") {
    assert(norm(
      "HTTP://WWW.Example.COM:80/Path/Doc?utm_source=x&id=7&gclid=abc#frag",
      "https://Site.ORG:443/a?fbclid=1&b=2&utm_medium=mail",
      "http://host.net:8080/keep:port?x=1",
      "https://plain.de/path",
      "http://noquery.com/p?utm_campaign=only") == Seq(
      "http://www.example.com/Path/Doc?id=7",
      "https://site.org/a?b=2",
      "http://host.net:8080/keep:port?x=1",
      "https://plain.de/path",
      "http://noquery.com/p"))
  }

  test("normalize: path and query case preserved, param order preserved") {
    assert(norm("HTTP://A.COM/CaseSensitive/Path?Z=9&a=1&M=5") ==
      Seq("http://a.com/CaseSensitive/Path?Z=9&a=1&M=5"))
  }

  test("normalize: null and unparseable input → null") {
    val rows = Seq(Some("not a url at all"), None).toDF("u")
      .select(UrlOps.normalizeUrl(col("u")).as("n")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("registrable domain: two-label default, common-SLD country suffixes") {
    val got = Seq(
      "www.example.com", "a.b.site.co.uk", "example.com", "localhost",
      "cdn.example.de", "sub.deep.news.ac.jp", "gov.uk")
      .toDF("h").select(UrlOps.registrableDomain(col("h"))).as[String].collect().toSeq
    assert(got == Seq(
      "example.com", "site.co.uk", "example.com", "localhost",
      "example.de", "news.ac.jp", "gov.uk"))
  }

  test("domainCap keeps min(count, cap) per domain, deterministically") {
    // d0..d3: 40 urls each; d4..d23: 2 each
    val urls = ((0 until 160).map(i => s"http://d${i % 4}.com/p/$i") ++
      (0 until 40).map(i => s"http://d${4 + i % 20}.com/p/$i"))
      .toDF("url")
    val kept = UrlOps.domainCap(urls, "url", cap = 5)
    val perDom = kept.groupBy(UrlOps.registrableDomain(UrlOps.hostOf(col("url"))).as("d"))
      .count().as[(String, Long)].collect().toMap
    assert((0 until 4).forall(i => perDom(s"d$i.com") == 5))
    assert((4 until 24).forall(i => perDom(s"d$i.com") == 2))
    // deterministic under repartitioning
    val again = UrlOps.domainCap(urls.repartition(7), "url", cap = 5)
      .as[String].collect().sorted.toSeq
    assert(again == kept.as[String].collect().sorted.toSeq)
  }

  test("domainCap mega-domain prefilter agrees with the exact path") {
    val urls = (0 until 500).map(i => s"http://big.com/p/$i")
      .toDF("url")
    val exact = UrlOps.domainCap(urls, "url", cap = 10)
      .as[String].collect().sorted.toSeq
    val fenced = UrlOps.domainCap(urls, "url", cap = 10, prefilterMargin = Some(8.0))
      .as[String].collect().sorted.toSeq
    assert(exact == fenced)
    assert(exact.length == 10)
  }

  test("domainCap preserves input columns and extra column values") {
    val df = Seq((1L, "http://x.com/a"), (2L, "http://x.com/b"), (3L, "http://y.com/c"))
      .toDF("id", "url")
    val kept = UrlOps.domainCap(df, "url", cap = 1)
    assert(kept.columns.toSeq == Seq("id", "url"))
    assert(kept.count() == 2) // one per domain
    val ids = kept.select("id").as[Long].collect().toSet
    assert(ids.contains(3L)) // y.com's only row always survives
  }

  test("trapAudit: depth, repeated segments, param explosion, benign") {
    def audit(url: String): (Long, Long, Long, Boolean) = {
      val r = UrlOps.trapAudit(Seq(url).toDF("url"), "url").head()
      (r.getAs[Long]("depth"), r.getAs[Long]("max_repeat"),
        r.getAs[Long]("n_params"), r.getAs[Boolean]("is_trap"))
    }
    // benign page
    assert(audit("http://x.com/docs/page1") == ((2L, 1L, 0L, false)))
    // mirrored cycle: /a/b/a/b/a -> 'a' repeats 3 times
    assert(audit("http://x.com/a/b/a/b/a") == ((5L, 3L, 0L, true)))
    // runaway depth: 9 distinct segments > 8
    assert(audit("http://x.com/1/2/3/4/5/6/7/8/9") == ((9L, 1L, 0L, true)))
    // facet explosion: 11 params > 10
    val q = (1 to 11).map(i => s"f$i=1").mkString("&")
    assert(audit(s"http://x.com/p?$q") == ((1L, 1L, 11L, true)))
    // threshold edges: depth 8, repeat 2, params 10 all pass
    assert(!audit("http://x.com/1/2/3/4/5/6/7/8")._4)
    assert(!audit("http://x.com/a/b/a")._4)
    assert(!audit("http://x.com/p?" +
      (1 to 10).map(i => s"f$i=1").mkString("&"))._4)
    // empty path / bare host: depth 0, nothing fires
    assert(audit("http://x.com") == ((0L, 0L, 0L, false)))
    assert(audit("http://x.com/") == ((0L, 0L, 0L, false)))
  }

  test("paramAudit: session-id strip, keep, low-evidence, bare flags") {
    import TestSpark.spark
    import spark.implicits._
    val urls = ((1 to 12).map(i => s"https://A.example.com/x?sid=s$i&page=1") ++
      Seq("https://a.example.com/x?flag",
        "https://a.example.com/x?page=2"))
      .toDF("url")
    val got = graft.ops.UrlOps.paramAudit(urls, "url",
        minUrls = 10L, stripRatio = 0.9)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getString(5)))).toMap
    // hosts fold case: A.example.com == a.example.com
    assert(got("sid") == ((12L, 12L, "strip")))      // unique per URL
    assert(got("page") == ((13L, 2L, "keep")))       // 2 values over 13
    assert(got("flag") == ((1L, 0L, "low_evidence"))) // bare flag, thin
    intercept[IllegalArgumentException] {
      graft.ops.UrlOps.paramAudit(urls, "url", minUrls = 0L)
    }
  }
}
