package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, BinaryType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Crawl-payload triage kernels: a web archive's `Content-Type` headers
 * LIE (mislabeled binaries, missing charsets), so a corpus pipeline
 * sniffs bytes before routing — text extraction for markup, the
 * multimodal path for media, the trash bin for executables. Magic-byte
 * tables are public (IETF media-type registrations, the WHATWG MIME
 * sniffing standard's pattern set); the HTML heuristic is the WHATWG
 * one: leading whitespace/BOM then a known tag opener. (The reference
 * has no binary handling at all — north-star surface.)
 *
 *  - `graft_sniff_mime(payload)`: binary → media-type string
 *    (`text/html`, `application/pdf`, `image/png|jpeg|gif|webp`,
 *    `application/gzip|zip`, `audio/wav`, `video/mp4`,
 *    `application/octet-stream` fallback, `text/plain` when bytes
 *    look like clean text). Null/empty → null.
 *  - `graft_detect_charset(payload)`: BOM sniff (UTF-8, UTF-16LE/BE)
 *    → `<meta charset=…>` / `http-equiv` scan in the head bytes →
 *    UTF-8 validation pass → `windows-1252` fallback (the de-facto
 *    superset that decodes any byte sequence) — the trafilatura/
 *    ftfy-style cascade every crawl pipeline runs.
 *  - `graft_decode_text(payload)`: decode bytes to a string using the
 *    detected charset (BOM stripped). The per-row charset is why this
 *    is a kernel: Spark's `decode()` takes one literal charset for
 *    the whole column, which is exactly wrong for crawl data.
 */
object SniffKernels {

  private def startsWith(b: Array[Byte], sig: Int*): Boolean =
    b.length >= sig.length && sig.zipWithIndex.forall { case (s, i) =>
      (b(i) & 0xff) == s
    }

  private val HtmlOpeners = Array(
    "<!doctype html", "<html", "<head", "<body", "<script", "<iframe",
    "<h1", "<div", "<font", "<table", "<a ", "<style", "<title", "<b>",
    "<br", "<p", "<!--")

  def sniffMime(payload: Array[Byte]): UTF8String = {
    if (payload == null || payload.length == 0) return null
    val b = payload
    val mime =
      if (startsWith(b, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)) "image/png"
      else if (startsWith(b, 0xff, 0xd8, 0xff)) "image/jpeg"
      else if (startsWith(b, 'G', 'I', 'F', '8')) "image/gif"
      else if (b.length >= 12 && startsWith(b, 'R', 'I', 'F', 'F') &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') "image/webp"
      else if (b.length >= 12 && startsWith(b, 'R', 'I', 'F', 'F') &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "audio/wav"
      else if (startsWith(b, '%', 'P', 'D', 'F', '-')) "application/pdf"
      else if (startsWith(b, 0x1f, 0x8b)) "application/gzip"
      else if (startsWith(b, 'P', 'K', 0x03, 0x04)) "application/zip"
      else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
        b(7) == 'p') "video/mp4"
      else {
        val headText = asciiHead(b, 1024)
        if (HtmlOpeners.exists(headText.startsWith(_))) "text/html"
        else if (looksLikeText(b)) "text/plain"
        else "application/octet-stream"
      }
    UTF8String.fromString(mime)
  }

  /** Lowercased ASCII projection of the head, leading whitespace/BOM
    * skipped — the WHATWG sniff window. */
  private def asciiHead(b: Array[Byte], max: Int): String = {
    var i = 0
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) i = 3
    while (i < b.length && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' ||
      b(i) == '\r' || b(i) == 0x0c)) i += 1
    val sb = new java.lang.StringBuilder
    val end = math.min(b.length, i + max)
    while (i < end) {
      val c = b(i) & 0xff
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c.toChar)
      i += 1
    }
    sb.toString
  }

  /** Printable-text heuristic: no NUL, ≤5% control bytes (outside
    * tab/newline/CR) in the first 4 KiB. */
  private def looksLikeText(b: Array[Byte]): Boolean = {
    val n = math.min(b.length, 4096)
    var ctl = 0
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c == 0) return false
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r') ctl += 1
      i += 1
    }
    ctl * 20 <= n
  }

  def detectCharset(payload: Array[Byte]): UTF8String = {
    if (payload == null || payload.length == 0) return null
    UTF8String.fromString(detectCharsetName(payload))
  }

  private[functions] def detectCharsetName(b: Array[Byte]): String = {
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) return "utf-8"
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe) return "utf-16le"
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) return "utf-16be"
    // meta charset scan over the head window (values are ASCII names)
    val head = asciiHead(b, 2048)
    val m = java.util.regex.Pattern
      .compile("""charset\s*=\s*["']?\s*([a-z0-9_.:-]+)""")
      .matcher(head)
    if (m.find()) {
      val cs = m.group(1)
      val canonical = cs match {
        case "utf8" => "utf-8"
        case "latin1" | "iso-8859-1" => "iso-8859-1"
        case other => other
      }
      if (java.nio.charset.Charset.isSupported(canonical)) return canonical
    }
    if (isValidUtf8(b)) "utf-8" else "windows-1252"
  }

  /** Strict UTF-8 validation (RFC 3629: no overlongs, no surrogates,
    * ≤ U+10FFFF). */
  private[functions] def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= b.length || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= b.length) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80) return false
        if (c == 0xe0 && c1 < 0xa0) return false // overlong
        if (c == 0xed && c1 >= 0xa0) return false // surrogate range
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= b.length) return false
        val c1 = b(i + 1) & 0xff
        if ((c1 & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        if (c == 0xf0 && c1 < 0x90) return false // overlong
        if (c == 0xf4 && c1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  def decodeText(payload: Array[Byte]): UTF8String = {
    if (payload == null) return null
    if (payload.length == 0) return UTF8String.EMPTY_UTF8
    val cs = detectCharsetName(payload)
    val skip = cs match {
      case "utf-8" if payload.length >= 3 && (payload(0) & 0xff) == 0xef &&
        (payload(1) & 0xff) == 0xbb && (payload(2) & 0xff) == 0xbf => 3
      case "utf-16le" | "utf-16be" => 2
      case _ => 0
    }
    val s = new String(payload, skip, payload.length - skip,
      java.nio.charset.Charset.forName(cs))
    UTF8String.fromString(s)
  }
}

private[functions] trait BinaryKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${child.dataType.sql}")
}

/** `graft_sniff_mime(payload)` — see [[SniffKernels.sniffMime]]. */
case class SniffMimeKernel(child: Expression) extends BinaryKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_sniff_mime"
  // null for an EMPTY (non-null) payload, so nullability must not be
  // inherited from the child: with a non-nullable child the default
  // nullSafeCodeGen never declares ev.isNull and this kernel's
  // isNull-assignment failed janino — disabling whole-stage codegen
  // for EVERY plan containing it (and the interpreted twin could
  // claim non-null while returning null)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SniffKernels.sniffMime(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SniffKernels.sniffMime($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_detect_charset(payload)` — see [[SniffKernels.detectCharset]]. */
case class DetectCharsetKernel(child: Expression) extends BinaryKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_detect_charset"
  // null for an empty payload regardless of child nullability (the
  // SniffMimeKernel codegen-declaration hazard)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SniffKernels.detectCharset(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SniffKernels.detectCharset($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_decode_text(payload)` — see [[SniffKernels.decodeText]]. */
case class DecodeTextKernel(child: Expression) extends BinaryKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_decode_text"
  override def nullSafeEval(input: Any): Any =
    SniffKernels.decodeText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SniffKernels.decodeText($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
