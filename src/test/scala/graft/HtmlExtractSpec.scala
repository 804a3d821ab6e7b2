package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftFunctions, HtmlExtract}

class HtmlExtractSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def extract(html: String, minChars: Int = 3,
      maxLinkDensity: Double = 0.33): String =
    HtmlExtract.mainContent(UTF8String.fromString(html), minChars, maxLinkDensity).toString

  test("boilerplate ancestors dropped, article blocks joined in order") {
    val html =
      """<html><head><title>T</title></head><body>
        |<nav><a href="/">Home</a> <a href="/a">About</a></nav>
        |<header><h1>Site Banner</h1></header>
        |<article><p>First paragraph here.</p><p>Second paragraph here.</p></article>
        |<aside>Related links and junk</aside>
        |<footer>© 2026 example</footer>
        |</body></html>""".stripMargin
    assert(extract(html) == "First paragraph here. Second paragraph here.")
  }

  test("link density fences navigation OUTSIDE structural tags; inline links survive") {
    val html =
      "<body><div><a href='/1'>One</a> <a href='/2'>Two</a> <a href='/3'>Three</a></div>" +
        "<p>Prose with a single <a href='/ref'>reference link</a> stays because " +
        "most characters are not anchor text.</p></body>"
    val got = extract(html)
    assert(got == "Prose with a single reference link stays because " +
      "most characters are not anchor text.")
  }

  test("entities decode; unknown entities pass through literally") {
    val html = "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#65;&#x42; &copy; end</p>"
    assert(extract(html) == "a & b <tag> \"q\" AB &copy; end")
  }

  test("nbsp decodes to space and whitespace runs collapse") {
    val html = "<p>alpha&nbsp;&nbsp;beta   \n\t gamma</p>"
    assert(extract(html) == "alpha beta gamma")
  }

  test("script/style/comment/doctype content is never text") {
    val html =
      """<!DOCTYPE html><!-- <p>comment text</p> -->
        |<style>p { color: red; }</style>
        |<script>var markup = '<div>fake content</div>';</script>
        |<p>real content only</p>""".stripMargin
    assert(extract(html) == "real content only")
  }

  test("malformed markup: unclosed tags, quoted '>', stray '<', truncation") {
    assert(extract("<p>unclosed paragraph text") == "unclosed paragraph text")
    assert(extract("""<p><span title="a > b">attr gt ok</span></p>""") == "attr gt ok")
    assert(extract("<p>5 < 6 is true</p>") == "5 < 6 is true")
    assert(extract("<p>cut off mid tag</p><div cla") == "cut off mid tag")
    assert(extract("<p>before</><p>after</p>") == "before after")
  }

  test("over-closed boilerplate never goes negative and locks content out") {
    val html = "</nav></footer><p>content after stray closers</p>"
    assert(extract(html) == "content after stray closers")
  }

  test("minChars floor drops fragments, keeps prose") {
    val html = "<div>OK</div><p>long enough to keep around</p>"
    assert(extract(html, minChars = 10) == "long enough to keep around")
  }

  test("nested boilerplate: content div inside nav is still boilerplate") {
    val html = "<nav><div>deep menu text that is long</div></nav><p>kept body</p>"
    assert(extract(html) == "kept body")
  }

  test("empty and all-boilerplate pages extract to empty string") {
    assert(extract("") == "")
    assert(extract("<nav><a href='/'>Home</a></nav>") == "")
  }

  test("codegen path: DataFrame column agrees with direct kernel calls, null → null") {
    val rows = Seq(
      (1L, "<body><nav><a href='/'>x</a></nav><p>alpha beta gamma</p></body>"),
      (2L, "<p>second &amp; doc</p>"),
      (3L, null)).toDF("id", "html")
    val got = rows.select(col("id"),
        GraftFunctions.htmlMain(spark, col("html"), minChars = 3).as("text"))
      .orderBy("id").collect()
    assert(got(0).getString(1) == "alpha beta gamma")
    assert(got(1).getString(1) == "second & doc")
    assert(got(2).isNullAt(1))
  }

  test("title extraction: entity decode, normalization, absent/empty → null") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def t(h: String): String =
      Option(HtmlExtract.title(u(h))).map(_.toString).orNull
    assert(t("<html><head><TITLE>  My &amp; Page \n</TITLE></head></html>") == "My & Page")
    assert(t("<title attr=\"x\">With Attr</title>") == "With Attr")
    assert(t("<body>no title</body>") == null)
    assert(t("<title></title><p>x</p>") == null)
    assert(t("<title>unclosed at EOF") == "unclosed at EOF")
    val df = Seq("<title>From DF</title>").toDF("h")
      .select(GraftFunctions.htmlTitle(spark, col("h")))
    assert(df.as[String].head() == "From DF")
  }

  test("SQL surface: graft_html_main with literal config") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_html_main('<nav><a href=1>m</a></nav><p>sql path text</p>', 3, 0.33) AS t")
      .as[String].head()
    assert(got == "sql path text")
  }
}
