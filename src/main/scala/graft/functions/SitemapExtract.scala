package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Sitemap parsing — the crawl-DISCOVERY side of a web pipeline
 * (sitemaps.org protocol, public): a host's `sitemap.xml` lists the
 * URLs it wants crawled with optional change metadata, and a scheduler
 * joins that against its fetch ledger to decide what is STALE. The
 * kernel extracts `(loc, lastmod)` pairs from a `<urlset>` document in
 * one pass; sitemap-INDEX files (`<sitemap>` entries pointing at child
 * sitemaps) use the same `<loc>` shape and are extracted identically,
 * so an index fans out by feeding the extracted locs back to fetch.
 *
 * Deliberately NOT an XML parser: the sitemap protocol pins the
 * element names, and crawl-scale inputs are full of namespace
 * prefixes, stray whitespace, and truncation — the kernel scans for
 * `<loc>`/`<lastmod>` inside `<url>`/`<sitemap>` blocks
 * (case-insensitive, whitespace-trimmed, XML entities decoded),
 * ignores everything else, and treats a truncated document as ending
 * at EOF. `priority`/`changefreq` are advisory noise real schedulers
 * ignore; `lastmod` is the one field staleness needs (empty string
 * when absent — the row is still a discovered URL).
 */
object SitemapExtract {

  /** Decode the XML predefined entities + numeric refs; unknown
    * entities pass through literally (crawl tolerance). */
  private def decodeXml(raw: String): String = {
    if (raw.indexOf('&') < 0) return raw
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '&') {
        val semi = raw.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { sb.append('&'); i += 1 }
        else {
          val body = raw.substring(i + 1, semi)
          val dec = body match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if body.startsWith("#x") || body.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              catch { case _: Exception => null }
            case _ if body.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(body.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (dec == null) { sb.append('&'); i += 1 }
          else { sb.append(dec); i = semi + 1 }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** If the element starting at `lt` (`s(lt) == '<'`) names `name` —
    * tolerating an XML namespace prefix (`<sm:url>`), attributes
    * (`<url changefreq="...">`) and whitespace before `>` — return the
    * index just past the element name, else -1. `closing = true`
    * matches `</[prefix:]name` instead. */
  private def elementAt(
      s: String, lt: Int, to: Int, name: String, closing: Boolean): Int = {
    var p = lt + 1
    if (closing) {
      if (p >= to || s.charAt(p) != '/') return -1
      p += 1
    }
    // optional `prefix:` — an NCName-ish run followed by ':'
    var q = p
    while (q < to && {
      val c = s.charAt(q)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '-' || c == '.'
    }) q += 1
    if (q < to && s.charAt(q) == ':') p = q + 1
    if (!s.regionMatches(true, p, name, 0, name.length)) return -1
    val e = p + name.length
    if (e >= to) return -1
    val c = s.charAt(e)
    // the name must END here: '<urlset>' is not '<url'
    if (c == '>' || c == '/' || Character.isWhitespace(c)) e else -1
  }

  /** First `<` at/after `from` (before `to`) whose element names
    * `name`; -1 when absent. One forward scan, '<' by '<'. */
  private def findTag(
      s: String, name: String, from: Int, to: Int, closing: Boolean): Int = {
    var i = math.max(0, from)
    while (i < to) {
      val lt = s.indexOf('<', i)
      if (lt < 0 || lt >= to) return -1
      if (elementAt(s, lt, to, name, closing) >= 0) return lt
      i = lt + 1
    }
    -1
  }

  /** Content of the first `<tag>…</tag>` inside [from, to); null when
    * absent. Tolerates attributes, whitespace, and namespace prefixes
    * on both tags. */
  private def tagContent(s: String, tag: String, from: Int, to: Int): String = {
    val open = findTag(s, tag, from, to, closing = false)
    if (open < 0) return null
    val gt = s.indexOf('>', open)
    if (gt < 0 || gt >= to) return null
    val close = findTag(s, tag, gt + 1, to, closing = true)
    val end = if (close < 0) to else close
    decodeXml(s.substring(gt + 1, end)).trim
  }

  /** `(loc, lastmod)` per `<url>`/`<sitemap>` entry, document order;
    * entries without a `<loc>` are skipped, absent `<lastmod>` is the
    * empty string. */
  def urls(xml: UTF8String): ArrayData = {
    val s = xml.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]
    // ONE forward scan: advance '<' by '<', never re-search the tail
    // for a tag that is not there (a naive per-entry indexOf of BOTH
    // entry tags is O(n²) on real urlset documents, where the absent
    // "<sitemap>" probe re-scans everything after every entry — 100 s
    // on a 5000-entry host at sf1; this shape is linear)
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = n
      else {
        // entry tags tolerate attributes, whitespace before '>', and a
        // namespace prefix ('<url changefreq="...">', '<sm:url>') —
        // the name-END check is what keeps '<urlset>' from matching
        val tag =
          if (elementAt(s, lt, n, "url", closing = false) >= 0) "url"
          else if (elementAt(s, lt, n, "sitemap", closing = false) >= 0) "sitemap"
          else null
        if (tag == null) i = lt + 1
        else {
          val open = lt
          val close = findTag(s, tag, open + 1, n, closing = true)
          val end = if (close < 0) n else close
          val loc = tagContent(s, "loc", open, end)
          if (loc != null && loc.nonEmpty) {
            val lastmod = tagContent(s, "lastmod", open, end)
            out += InternalRow(
              UTF8String.fromString(loc),
              UTF8String.fromString(if (lastmod == null) "" else lastmod))
          }
          i = if (close < 0) n
          else {
            val gt = s.indexOf('>', close)
            if (gt < 0) n else gt + 1
          }
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_sitemap_urls(xml)` — see [[SitemapExtract.urls]]. Returns
  * `array<struct<loc:string, lastmod:string>>`; empty array for
  * documents with no entries. */
case class SitemapUrlsKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("loc", StringType, nullable = false),
      StructField("lastmod", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_sitemap_urls"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    SitemapExtract.urls(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SitemapExtract.urls($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
