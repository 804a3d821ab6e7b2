package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * PII detection/redaction kernels — the privacy-scrub stage every
 * public-web training corpus runs before release (the C4/Dolma-family
 * cleanup step). One hand-rolled scan per document classifies
 * non-overlapping spans into four categories and either counts them
 * (`graft_pii_stats`) or replaces them with typed placeholder tokens
 * (`graft_pii_scrub`), so audit and redaction share one definition and
 * the whole projection stays inside whole-stage codegen.
 *
 * Span grammar (deterministic, boundary-checked — the char before and
 * after a span must not be alphanumeric):
 *
 *  - EMAIL: `local@domain` where local is a nonempty run of
 *    `[A-Za-z0-9._%+-]` and domain is a run of `[A-Za-z0-9.-]`
 *    truncated to the longest prefix that ends in `.` + ≥2 ASCII
 *    letters (the same shape as [[graft.ops.TextOps.emailPattern]]).
 *    Emails are matched first; number scanning never enters an email
 *    span (digits in `user123@…` are not phone candidates).
 *  - Number spans: an optional leading `+`, then digit groups
 *    separated by single `-`/`.`/space separators, with one optional
 *    parenthesized group `(ddd)`; classified by precedence:
 *     1. IPV4   — exactly 4 dot-separated groups of 1–3 digits, each
 *        ≤ 255, no `+`/parens;
 *     2. CARD   — 13–19 total digits, separators only space/dash, no
 *        `+`/parens, and the digit string passes the Luhn checksum
 *        (ISO/IEC 7812). A 16-digit run that fails Luhn is NOT a card
 *        and (being > 15 digits) not a phone either — the checksum is
 *        what keeps order ids and timestamps out of the redaction;
 *     3. PHONE  — 7–15 total digits AND at least one structural
 *        signal: a `+`, a parenthesized group, or ≥ 2 digit groups
 *        (≥ 3 when every separator is `.`, so decimals like
 *        `3.14159265` stay untouched). Bare unstructured digit runs
 *        are never phones — deliberate false-negative bias.
 *
 * False positives/negatives inherent to lexical PII detection (e.g.
 * `10.20.30.4567` classifying as a dotted phone) are documented
 * behavior: the kernel is a deterministic span grammar, not an NER
 * model, which is exactly what makes the scrub reproducible and
 * oracle-checkable. (The reference has no PII handling — north-star
 * surface.)
 */
object PiiKernels {

  final val EMAIL = 0
  final val PHONE = 1
  final val IPV4 = 2
  final val CARD = 3

  private val Tokens = Array("<EMAIL>", "<PHONE>", "<IP>", "<CARD>")

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isAlnum(c: Char): Boolean = isAsciiLetter(c) || isDigit(c)
  @inline private def isLocalChar(c: Char): Boolean =
    isAlnum(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def isDomainChar(c: Char): Boolean =
    isAlnum(c) || c == '.' || c == '-'

  /** Luhn checksum over an ASCII digit string. */
  def luhnValid(digits: String): Boolean = {
    var sum = 0
    var dbl = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    sum % 10 == 0
  }

  /** Non-overlapping PII spans, left-to-right: (start, endExclusive,
    * kind). Email pass first; number spans scanned between/around the
    * email spans. */
  private[functions] def scan(s: String): ArrayBuffer[(Int, Int, Int)] = {
    val n = s.length
    val spans = new ArrayBuffer[(Int, Int, Int)]

    // ---- pass 1: emails ---------------------------------------------
    var guard = 0 // end of the last accepted span
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '@') {
        var l = i
        while (l > guard && isLocalChar(s.charAt(l - 1))) l -= 1
        if (l < i) {
          val domStart = i + 1
          var r = domStart
          while (r < n && isDomainChar(s.charAt(r))) r += 1
          // truncate to the longest prefix ending in '.' + >=2 letters
          var e = r
          var ok = false
          while (e >= domStart + 4 && !ok) {
            var j = e - 1
            var letters = 0
            while (j >= domStart && isAsciiLetter(s.charAt(j))) { letters += 1; j -= 1 }
            if (letters >= 2 && j > domStart && s.charAt(j) == '.') ok = true
            else e -= math.max(1, letters)
          }
          // trailing boundary: when truncation left the span mid-run
          // ('a@b.com2x' -> 'a@b.com' + '2x'), the char after the span
          // is alphanumeric and the grammar rejects the partial email
          if (ok && e < n && isAlnum(s.charAt(e))) ok = false
          if (ok) {
            spans += ((l, e, EMAIL))
            guard = e
            i = e
          } else i += 1
        } else i += 1
      } else i += 1
    }

    // ---- pass 2: number spans (outside email spans) -----------------
    val emailSpans = spans.toArray // only emails so far, in order
    var si = 0 // next email span to skip
    i = 0
    while (i < n) {
      if (si < emailSpans.length && i >= emailSpans(si)._1) {
        i = emailSpans(si)._2
        si += 1
      } else {
        val c = s.charAt(i)
        val startable =
          (isDigit(c) ||
            (c == '+' && i + 1 < n &&
              (isDigit(s.charAt(i + 1)) || s.charAt(i + 1) == '(')) ||
            (c == '(' && i + 1 < n && isDigit(s.charAt(i + 1)))) &&
            (i == 0 || !isAlnum(s.charAt(i - 1))) &&
            (i == 0 || s.charAt(i - 1) != '+') &&
            // never re-anchor mid-blob: a digit-sep prefix (e.g. the
            // tail of a rejected "x555-123-…") is not a span boundary
            !(i >= 2 && (s.charAt(i - 1) == '-' || s.charAt(i - 1) == '.') &&
              isDigit(s.charAt(i - 2)))
        val stop = if (si < emailSpans.length) emailSpans(si)._1 else n
        if (startable) {
          val sp = parseNumberSpan(s, i, stop)
          if (sp != null) { spans += sp; i = sp._2 }
          else i += 1
        } else i += 1
      }
    }
    spans.sortInPlaceBy(_._1)
    spans
  }

  /** Parse one number span at `i` (bounded by `stop`); returns
    * (start, end, kind) or null when the span classifies as nothing. */
  private def parseNumberSpan(s: String, start: Int, stop: Int): (Int, Int, Int) = {
    var j = start
    var hasPlus = false
    var hasParen = false
    var nDigits = 0
    var nGroups = 0
    var dotSeps = 0
    var otherSeps = 0
    val groups = new ArrayBuffer[Int](8) // per-group digit counts
    val digits = new java.lang.StringBuilder(24)
    var groupVal = 0L // value of current group (capped)
    val groupVals = new ArrayBuffer[Long](8)

    if (s.charAt(j) == '+') { hasPlus = true; j += 1 }

    var done = false
    var lastWasDigitish = false // a closed group or digit run just ended
    var inParen = false
    var parenStart = -1
    var groupLen = 0
    def closeGroup(): Unit = {
      if (groupLen > 0) {
        nGroups += 1; groups += groupLen; groupVals += groupVal
        groupLen = 0; groupVal = 0L
      }
    }
    while (j < stop && !done) {
      val c = s.charAt(j)
      if (isDigit(c)) {
        groupLen += 1; nDigits += 1
        if (groupVal < 1000000L) groupVal = groupVal * 10 + (c - '0')
        digits.append(c)
        lastWasDigitish = true
        j += 1
      } else if (c == '(' && !inParen && !hasParen && groupLen == 0 &&
        j + 1 < stop && isDigit(s.charAt(j + 1))) {
        inParen = true; parenStart = j; j += 1
      } else if (c == ')' && inParen && groupLen > 0) {
        inParen = false; hasParen = true
        closeGroup()
        lastWasDigitish = true
        j += 1
      } else if ((c == '-' || c == '.' || c == ' ') && !inParen &&
        lastWasDigitish && j + 1 < stop &&
        (isDigit(s.charAt(j + 1)) ||
          (s.charAt(j + 1) == '(' && j + 2 < stop && isDigit(s.charAt(j + 2))))) {
        closeGroup()
        if (c == '.') dotSeps += 1 else otherSeps += 1
        lastWasDigitish = false
        j += 1
      } else done = true
    }
    if (inParen) { // unclosed paren: span ends before the '('
      j = parenStart
      // digits consumed inside the open paren are dropped
      val drop = digits.length()
      var k = parenStart + 1
      var inDrop = 0
      while (k < stop && isDigit(s.charAt(k))) { inDrop += 1; k += 1 }
      digits.setLength(drop - inDrop)
      nDigits -= inDrop
      groupLen = 0; groupVal = 0L
      // a separator consumed just before the '(' would otherwise dangle
      while (j > start && {
        val ch = s.charAt(j - 1); ch == '-' || ch == '.' || ch == ' '
      }) {
        if (s.charAt(j - 1) == '.') dotSeps -= 1 else otherSeps -= 1
        j -= 1
      }
    }
    closeGroup()
    if (nDigits == 0) return null
    var end = j
    // boundary: char after span must not be alphanumeric
    if (end < s.length && isAlnum(s.charAt(end))) return null
    val digitStr = digits.toString

    // IPv4: 4 dot groups, 1-3 digits each, <=255, bare
    if (!hasPlus && !hasParen && nGroups == 4 && dotSeps == 3 && otherSeps == 0 &&
      groups.forall(g => g >= 1 && g <= 3) && groupVals.forall(_ <= 255L))
      return (start, end, IPV4)
    // Card: 13-19 Luhn-valid digits, space/dash separators only
    if (!hasPlus && !hasParen && dotSeps == 0 &&
      nDigits >= 13 && nDigits <= 19 && luhnValid(digitStr))
      return (start, end, CARD)
    // Phone: 7-15 digits with structure
    val allDot = dotSeps > 0 && otherSeps == 0
    val structured = hasPlus || hasParen ||
      (if (allDot) nGroups >= 3 else nGroups >= 2)
    if (nDigits >= 7 && nDigits <= 15 && structured)
      return (start, end, PHONE)
    null
  }

  /** `[n_email, n_phone, n_ipv4, n_card]` for one document. */
  def piiStats(text: UTF8String): ArrayData = {
    val spans = scan(text.toString)
    val out = new Array[Long](4)
    spans.foreach { case (_, _, k) => out(k) += 1 }
    new GenericArrayData(out)
  }

  /** Every detected span replaced by its typed placeholder token. */
  def piiScrub(text: UTF8String): UTF8String = {
    val s = text.toString
    val spans = scan(s)
    if (spans.isEmpty) return text
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    spans.foreach { case (a, b, k) =>
      sb.append(s, pos, a).append(Tokens(k))
      pos = b
    }
    sb.append(s, pos, s.length)
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_pii_stats(text)` — see [[PiiKernels.piiStats]]. */
case class PiiStatsKernel(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pii_stats"
  override def nullSafeEval(input: Any): Any =
    PiiKernels.piiStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PiiKernels.piiStats($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_pii_scrub(text)` — see [[PiiKernels.piiScrub]]. */
case class PiiScrubKernel(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_pii_scrub"
  override def nullSafeEval(input: Any): Any =
    PiiKernels.piiScrub(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PiiKernels.piiScrub($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
