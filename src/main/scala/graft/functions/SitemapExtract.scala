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

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int =
    indexOfIgnoreCase(s, needle, from, s.length)

  /** Bounded search: never scans past `to` — a per-entry probe for an
    * ABSENT inner tag must cost O(entry), not O(document). */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int, to: Int): Int = {
    var i = math.max(0, from)
    val last = math.min(s.length, to) - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

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

  /** Content of the first `<tag>…</tag>` inside [from, to); null when
    * absent. Tolerates attributes on the open tag. */
  private def tagContent(s: String, tag: String, from: Int, to: Int): String = {
    val open = indexOfIgnoreCase(s, "<" + tag, from, to)
    if (open < 0) return null
    val gt = s.indexOf('>', open)
    if (gt < 0 || gt >= to) return null
    val close = indexOfIgnoreCase(s, "</" + tag, gt + 1, to)
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
        val tag =
          if (s.regionMatches(true, lt, "<url>", 0, 5)) "url"
          else if (s.regionMatches(true, lt, "<sitemap>", 0, 9)) "sitemap"
          else null
        if (tag == null) i = lt + 1
        else {
          val open = lt
          val close = indexOfIgnoreCase(s, "</" + tag + ">", open)
          val end = if (close < 0) n else close
          val loc = tagContent(s, "loc", open, end)
          if (loc != null && loc.nonEmpty) {
            val lastmod = tagContent(s, "lastmod", open, end)
            out += InternalRow(
              UTF8String.fromString(loc),
              UTF8String.fromString(if (lastmod == null) "" else lastmod))
          }
          i = if (close < 0) n else end + tag.length + 3
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
