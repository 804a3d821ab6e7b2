package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTML main-content extraction — the boilerplate-removal step between a
 * web source ([[graft.sources.WarcSource]]) and the corpus-quality
 * filter chain. Without it, language ID / quality scores / dedup all
 * run on nav-footer soup instead of the article text. (The reference
 * has no HTML processing at all — north-star surface.)
 *
 * Algorithm: the block-classification family of jusText (Pomikálek
 * 2011) and trafilatura — both public — reduced to a deterministic,
 * oracle-replayable core:
 *
 *  1. ONE left-to-right pass tokenizes tags and text; comments,
 *     `<!doctype>`/`<?…>` directives, and the raw-text elements
 *     `script/style/noscript/textarea` are skipped outright (their
 *     content is never document text).
 *  2. Block-level tags (`p div h1–h6 li ul ol table tr td th article
 *     section main blockquote pre br hr title body html head form dl
 *     dt dd figure figcaption`) delimit BLOCKS; inline tags (`a b i em
 *     strong span code small u s sub sup`) do not. Text accumulates
 *     into the current block with HTML entities decoded (`&amp; &lt;
 *     &gt; &quot; &apos; &nbsp; &#NN; &#xHH;`) and whitespace runs
 *     collapsed to single spaces at flush.
 *  3. A block is CONTENT iff (a) it is not nested under a structural
 *     boilerplate ancestor (`head nav footer header aside form`), (b)
 *     its link density — non-whitespace chars inside `<a>` over all
 *     non-whitespace chars — is ≤ `maxLinkDensity`, and (c) its
 *     normalized length is ≥ `minChars`. Content blocks join with a
 *     single space, in document order.
 *
 * Link density is the load-bearing heuristic (navigation is links;
 * prose is not), ancestor tags are the structural shortcut, and the
 * length floor drops button/label fragments — the same three signals
 * the published extractors lead with; the stopword lexicons they add
 * are deliberately out (they would make the output locale-dependent
 * and the oracle non-replayable).
 *
 * Tolerant of malformed markup by construction: unclosed tags just
 * never decrement a depth counter (guarded at 0 on close), attribute
 * values may contain `>` inside quotes, a bare `<` that opens no tag
 * is literal text, truncation mid-tag consumes to EOF. One pass, zero
 * allocation beyond the output builders — called from codegen via
 * [[HtmlMainKernel]], so the surrounding projection stays inside
 * whole-stage codegen.
 */
object HtmlExtract {

  /** Raw-text elements whose content is skipped, not text. */
  private val RawText = Set("script", "style", "noscript", "textarea")

  /** Structural ancestors that mark everything under them boilerplate. */
  private val Boiler = Set("head", "nav", "footer", "header", "aside", "form")

  private val BlockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tr", "td", "th", "article", "section",
    "main", "blockquote", "pre", "br", "hr", "title", "body", "html",
    "head", "nav", "footer", "header", "aside", "form", "dl", "dt",
    "dd", "figure", "figcaption")

  /** Whitespace incl. U+00A0 (NBSP is not Java whitespace). */
  private def isWs(c: Char): Boolean = Character.isWhitespace(c) || c == '\u00a0'

  def mainContent(html: UTF8String, minChars: Int, maxLinkDensity: Double): UTF8String = {
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder
    var blockChars = 0 // non-whitespace chars in block
    var blockLink = 0  // non-whitespace chars under <a>
    var aDepth = 0
    var boilDepth = 0

    def flush(): Unit = {
      if (block.length > 0) {
        val norm = normalizeWs(block)
        if (norm.nonEmpty) {
          val density = if (blockChars == 0) 0.0 else blockLink.toDouble / blockChars
          if (boilDepth == 0 && density <= maxLinkDensity && norm.length >= minChars) {
            if (out.length > 0) out.append(' ')
            out.append(norm)
          }
        }
        block.setLength(0)
      }
      blockChars = 0; blockLink = 0
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!' && s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (c1 == '!' || c1 == '?') { // doctype / processing instruction
          val end = s.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/' || Character.isLetter(c1)) {
          val closing = c1 == '/'
          var j = if (closing) i + 2 else i + 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          // scan to tag end, honoring quoted attribute values
          var selfClose = false
          var quote = 0.toChar
          var done = false
          while (j < n && !done) {
            val cc = s.charAt(j)
            if (quote != 0) { if (cc == quote) quote = 0 }
            else if (cc == '"' || cc == '\'') quote = cc
            else if (cc == '>') done = true
            else if (cc == '/' && j + 1 < n && s.charAt(j + 1) == '>') selfClose = true
            j += 1
          }
          i = if (done) j else n // truncated tag: consume to EOF
          if (name.isEmpty) {
            // "</>" or "< foo": not a tag; emit nothing (browsers drop it)
          } else if (!closing && RawText.contains(name) && !selfClose) {
            // skip raw content to the matching close tag
            val close = indexOfIgnoreCase(s, "</" + name, i)
            if (close < 0) i = n
            else {
              val gt = s.indexOf('>', close)
              i = if (gt < 0) n else gt + 1
            }
          } else {
            if (BlockTags.contains(name)) flush() // depth applies to OWN content
            if (Boiler.contains(name)) {
              if (!closing && !selfClose) boilDepth += 1
              else if (closing && boilDepth > 0) boilDepth -= 1
            }
            if (name == "a") {
              if (!closing && !selfClose) aDepth += 1
              else if (closing && aDepth > 0) aDepth -= 1
            }
          }
        } else { // '<' followed by non-tag char: literal text
          block.append(c); blockChars += 1; if (aDepth > 0) blockLink += 1
          i += 1
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(s, i)
        var k = 0
        while (k < decoded.length) {
          val dc = decoded.charAt(k)
          block.append(dc)
          if (!isWs(dc)) { blockChars += 1; if (aDepth > 0) blockLink += 1 }
          k += 1
        }
        i = next
      } else {
        block.append(c)
        if (!isWs(c)) { blockChars += 1; if (aDepth > 0) blockLink += 1 }
        i += 1
      }
    }
    flush()
    UTF8String.fromString(out.toString)
  }

  /** Collapse whitespace runs (incl. NBSP) to single spaces and trim. */
  private def normalizeWs(b: java.lang.StringBuilder): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    var pendingSpace = false
    while (i < b.length) {
      val c = b.charAt(i)
      if (isWs(c)) {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Decode one entity at `i` (s(i) == '&'); returns (text, nextIndex).
    * Unknown or unterminated entities pass through literally. */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val body = s.substring(i + 1, semi)
    val decoded = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if body.startsWith("#x") || body.startsWith("#X") =>
        try new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))
        catch { case _: Exception => null }
      case _ if body.startsWith("#") =>
        try new String(Character.toChars(Integer.parseInt(body.substring(1))))
        catch { case _: Exception => null }
      case _ => null
    }
    if (decoded == null) ("&", i + 1) else (decoded, semi + 1)
  }

  /** Outbound links of a page: `(href, anchor)` pairs in document
    * order — the edge list a web-graph build (in-degree, anchor-text
    * aggregation, PageRank) starts from. One pass, same tag/entity/
    * whitespace discipline as [[mainContent]]:
    *
    *  - an `<a>` tag contributes a pair iff it has a non-empty `href`
    *    attribute (entity-decoded — `&amp;` in query strings is the
    *    common case); anchors without `href` are link targets, not
    *    links;
    *  - the anchor text is the tag-stripped, entity-decoded,
    *    whitespace-normalized text to the matching `</a>` (or to the
    *    next `<a` / EOF on malformed markup — browsers auto-close);
    *    empty anchors (image links) yield an empty string, not null;
    *  - `href` is the raw attribute value after entity decoding: no
    *    resolution against a base URL here — that is
    *    [[graft.ops.UrlOps]]' job, against the page's own URI, and
    *    belongs in the plan, not the kernel.
    */
  def anchors(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = html.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow]
    var i = 0
    while (i < n) {
      val open = indexOfIgnoreCase(s, "<a", i)
      if (open < 0 || open + 2 > n) { i = n }
      else if (open + 2 < n && Character.isLetterOrDigit(s.charAt(open + 2))) {
        i = open + 2 // "<abbr" etc — not an anchor tag
      } else {
        // parse the open tag's attributes for href
        var j = open + 2
        var href: String = null
        var quote = 0.toChar
        var tagEnd = -1
        var selfClose = false
        while (j < n && tagEnd < 0) {
          val c = s.charAt(j)
          if (quote != 0) { if (c == quote) quote = 0; j += 1 }
          else if (c == '"' || c == '\'') { quote = c; j += 1 }
          else if (c == '>') tagEnd = j
          else if (c == '/' && j + 1 < n && s.charAt(j + 1) == '>') { selfClose = true; j += 1 }
          else if (Character.isLetter(c)) {
            val nameStart = j
            while (j < n && (Character.isLetterOrDigit(s.charAt(j)) || s.charAt(j) == '-')) j += 1
            val attr = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            while (j < n && isWs(s.charAt(j))) j += 1
            var value: String = null
            if (j < n && s.charAt(j) == '=') {
              j += 1
              while (j < n && isWs(s.charAt(j))) j += 1
              if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                val q = s.charAt(j)
                val end = s.indexOf(q, j + 1)
                value = s.substring(j + 1, if (end < 0) n else end)
                j = if (end < 0) n else end + 1
              } else {
                val valStart = j
                while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '>') j += 1
                value = s.substring(valStart, j)
              }
            }
            if (attr == "href" && href == null && value != null) href = value
          } else j += 1
        }
        if (tagEnd < 0) { i = n }
        else {
          var next = tagEnd + 1
          if (href != null && !selfClose) {
            // collect anchor text to </a>, the next <a, or EOF
            val buf = new java.lang.StringBuilder
            var k = next
            var stop = -1
            while (k < n && stop < 0) {
              val c = s.charAt(k)
              if (c == '<' && k + 1 < n) {
                if (s.regionMatches(true, k, "</a", 0, 3) &&
                  (k + 3 >= n || !Character.isLetterOrDigit(s.charAt(k + 3)))) {
                  val gt = s.indexOf('>', k)
                  stop = if (gt < 0) n else gt + 1
                } else if (s.regionMatches(true, k, "<a", 0, 2) &&
                  (k + 2 >= n || !Character.isLetterOrDigit(s.charAt(k + 2)))) {
                  stop = k // malformed: auto-close at next anchor
                } else {
                  // skip the nested tag (quoted '>' honored)
                  var q2 = 0.toChar
                  var m = k + 1
                  var done = false
                  while (m < n && !done) {
                    val cc = s.charAt(m)
                    if (q2 != 0) { if (cc == q2) q2 = 0 }
                    else if (cc == '"' || cc == '\'') q2 = cc
                    else if (cc == '>') done = true
                    m += 1
                  }
                  k = if (done) m else n
                }
              } else if (c == '&') {
                val (d, nx) = decodeEntity(s, k)
                buf.append(d); k = nx
              } else { buf.append(c); k += 1 }
            }
            next = if (stop < 0) n else stop
            val hrefBuf = new java.lang.StringBuilder
            var h = 0
            while (h < href.length) {
              val c = href.charAt(h)
              if (c == '&') {
                val (d, nx) = decodeEntity(href, h)
                hrefBuf.append(d); h = nx
              } else { hrefBuf.append(c); h += 1 }
            }
            val hrefDec = hrefBuf.toString.trim
            if (hrefDec.nonEmpty)
              out += org.apache.spark.sql.catalyst.InternalRow(
                UTF8String.fromString(hrefDec),
                UTF8String.fromString(normalizeWs(buf)))
          } else if (href != null && selfClose) {
            val hrefDec = href.trim
            if (hrefDec.nonEmpty)
              out += org.apache.spark.sql.catalyst.InternalRow(
                UTF8String.fromString(hrefDec), UTF8String.fromString(""))
          }
          i = next
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = math.max(0, from)
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** `<title>` text of a page: first title element's content, entity-
    * decoded and whitespace-normalized; null when absent/empty. The
    * per-document metadata a corpus record carries beside the extracted
    * body (trafilatura's metadata step). Title is a raw-text-ish
    * element — nested tags are not legal inside it, so the content is
    * everything to `</title>`. */
  def title(html: UTF8String): UTF8String = {
    val s = html.toString
    val open = indexOfIgnoreCase(s, "<title", 0)
    if (open < 0) return null
    val gt = s.indexOf('>', open)
    if (gt < 0) return null
    val close = indexOfIgnoreCase(s, "</title", gt + 1)
    val raw = s.substring(gt + 1, if (close < 0) s.length else close)
    // entity-decode then normalize through the shared paths
    val buf = new java.lang.StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '&') {
        val (d, next) = decodeEntity(raw, i)
        buf.append(d); i = next
      } else { buf.append(c); i += 1 }
    }
    val norm = normalizeWs(buf)
    if (norm.isEmpty) null else UTF8String.fromString(norm)
  }
}

/** `graft_html_title(html)` — see [[HtmlExtract.title]]. Null-
  * propagating; also null for pages without a non-empty title. */
case class HtmlTitleKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_title"
  // null for title-less html regardless of child nullability (the
  // SniffMimeKernel codegen-declaration hazard: an isNull-assigning
  // genCode needs the expression itself nullable)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HtmlExtract.title(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HtmlExtract.title($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_html_anchors(html)` — see [[HtmlExtract.anchors]]. Returns
  * `array<struct<href:string, anchor:string>>` in document order;
  * empty array for pages without links. */
case class HtmlAnchorsKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("href", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("anchor", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_anchors"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HtmlExtract.anchors(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlExtract.anchors($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_html_main(html, minChars, maxLinkDensity)` — see
  * [[HtmlExtract.mainContent]]. Null-propagating; config args must be
  * literals (they parameterize generated code). */
case class HtmlMainKernel(child: Expression, minChars: Int, maxLinkDensity: Double)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_main"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HtmlExtract.mainContent(input.asInstanceOf[UTF8String], minChars, maxLinkDensity)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlExtract.mainContent($c, $minChars, ${maxLinkDensity}D);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
