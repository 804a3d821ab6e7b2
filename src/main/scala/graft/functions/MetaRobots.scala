package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Page-level indexing directives — the crawl-side fence between a
 * fetched page and corpus entry that robots.txt alone cannot provide
 * (public specs: the robots `<meta>` tag convention documented beside
 * RFC 9309, and the `<link rel="canonical">` duplicate-URL hint from
 * RFC 6596):
 *
 *  - `<meta name="robots" content="noindex, nofollow">` — a page the
 *    host served but asked crawlers not to INDEX must be excluded from
 *    the corpus even though the fetch was allowed; `nofollow` fences
 *    its outlinks out of frontier expansion. `none` is the documented
 *    shorthand for both; `index`/`follow`/`all` are non-restrictive
 *    no-ops. Multiple robots metas combine most-restrictive-wins.
 *  - `<link rel="canonical" href="…">` — a page declaring a DIFFERENT
 *    canonical URL is a self-identified duplicate: corpus entry should
 *    keep the canonical target, not this copy. First canonical wins
 *    when a page (invalidly) declares several; `rel` is an HTML
 *    space-separated token list, so `rel="alternate canonical"`
 *    counts.
 *
 * Crawl-tolerant by design (same discipline as [[HtmlExtract]] /
 * [[SitemapExtract]]): attribute order is free, names/values are
 * case-insensitive where the specs say so, values may be
 * single-quoted / double-quoted / unquoted, and the tags are honored
 * anywhere in the document (real pages put them outside `<head>`).
 * Truncated documents end at EOF. NOT an HTML parser — one forward
 * scan, `<` by `<`.
 */
object MetaRobots {

  private val Schema = StructType(Seq(
    StructField("noindex", BooleanType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false),
    StructField("canonical", StringType, nullable = true)))

  def dataType: DataType = Schema

  /** Element-name check at `lt` (`s(lt) == '<'`): the tag names `name`
    * and ENDS there (whitespace, '>', or '/'). Returns the index past
    * the name, else -1. */
  private def tagAt(s: String, lt: Int, name: String): Int = {
    val p = lt + 1
    if (!s.regionMatches(true, p, name, 0, name.length)) return -1
    val e = p + name.length
    if (e >= s.length) return -1
    val c = s.charAt(e)
    if (c == '>' || c == '/' || Character.isWhitespace(c)) e else -1
  }

  /** Parse the attributes of one open tag spanning [from, gt):
    * lowercased-name → raw value ('' for valueless attrs); first
    * occurrence of a name wins. */
  private def attrs(s: String, from: Int, gt: Int): java.util.HashMap[String, String] = {
    val out = new java.util.HashMap[String, String]()
    var i = from
    while (i < gt) {
      while (i < gt && (Character.isWhitespace(s.charAt(i)) || s.charAt(i) == '/')) i += 1
      if (i >= gt) return out
      val nameStart = i
      while (i < gt && !Character.isWhitespace(s.charAt(i)) &&
        s.charAt(i) != '=' && s.charAt(i) != '/' && s.charAt(i) != '>') i += 1
      val name = s.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
      while (i < gt && Character.isWhitespace(s.charAt(i))) i += 1
      var value = ""
      if (i < gt && s.charAt(i) == '=') {
        i += 1
        while (i < gt && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < gt) {
          val q = s.charAt(i)
          if (q == '"' || q == '\'') {
            val end = s.indexOf(q, i + 1)
            val stop = if (end < 0 || end > gt) gt else end
            value = s.substring(i + 1, stop)
            i = if (end < 0 || end > gt) gt else end + 1
          } else {
            val valStart = i
            while (i < gt && !Character.isWhitespace(s.charAt(i)) &&
              s.charAt(i) != '>') i += 1
            value = s.substring(valStart, i)
          }
        }
      }
      if (name.nonEmpty && !out.containsKey(name)) out.put(name, value)
    }
    out
  }

  /** `(noindex, nofollow, canonical)` for one HTML document. */
  def directives(html: UTF8String): InternalRow = {
    val s = html.toString
    val n = s.length
    var noindex = false
    var nofollow = false
    var canonical: String = null
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = n
      else {
        val isMeta = tagAt(s, lt, "meta") >= 0
        val isLink = !isMeta && tagAt(s, lt, "link") >= 0
        if (!isMeta && !isLink) i = lt + 1
        else {
          val gtRaw = s.indexOf('>', lt)
          val gt = if (gtRaw < 0) n else gtRaw
          val a = attrs(s, lt + 5, gt) // past "<meta" / "<link"
          if (isMeta) {
            val name = a.getOrDefault("name", "")
              .trim.toLowerCase(java.util.Locale.ROOT)
            if (name == "robots") {
              val content = a.getOrDefault("content", "")
              content.split(",", -1).foreach { tokRaw =>
                tokRaw.trim.toLowerCase(java.util.Locale.ROOT) match {
                  case "noindex" => noindex = true
                  case "nofollow" => nofollow = true
                  case "none" => noindex = true; nofollow = true
                  case _ => // index/follow/all/unknown: non-restrictive
                }
              }
            }
          } else {
            val rel = a.getOrDefault("rel", "").toLowerCase(java.util.Locale.ROOT)
            val isCanonical = rel.split("\\s+", -1).contains("canonical")
            if (isCanonical && canonical == null) {
              val href = a.getOrDefault("href", "").trim
              if (href.nonEmpty) canonical = href
            }
          }
          i = gt + 1
        }
      }
    }
    InternalRow(noindex, nofollow,
      if (canonical == null) null else UTF8String.fromString(canonical))
  }
}

/** `graft_page_directives(html)` — see [[MetaRobots.directives]]:
  * `struct<noindex:boolean, nofollow:boolean, canonical:string>`. */
case class PageDirectivesKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MetaRobots.dataType
  override def prettyName: String = "graft_page_directives"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    MetaRobots.directives(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MetaRobots.directives($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
