package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass text kernels for the corpus-quality hot path, as custom
 * Catalyst expressions (same design as [[WinnowingFingerprints]]: a
 * primitive-loop kernel behind `doGenCode`, so the surrounding
 * projection stays inside whole-stage codegen).
 *
 * Why: the portable Column/SQL formulations these mirror — kept in
 * [[graft.ops.TextOps]] / [[PortableSql]] as the parity reference and
 * the DuckDB oracle template — re-scan the document once per marker
 * (`replace`-length deltas allocate a full copy of the text per
 * marker, ~45 copies per row for language ID) or build every shingle
 * through interpreted HOF lambdas. Measured on the sf0.1 corpus the
 * filter chain of [[graft.ops.CorpusFilters]] costs ~4.3 s through the
 * portable expressions and ~0.3 s through these kernels — the
 * difference is pure allocation/dispatch, not algorithm.
 *
 * Parity contract (oracle-checked by q11/q12/q43 and every
 * corpus-filter query): each kernel reproduces its portable
 * formulation bit-for-bit —
 *  - token count  = `size(split(text, ' '))` = (space count) + 1;
 *  - language ID  = argmax of marker-occurrence sums over the padded,
 *    lowercased text, `langMarkers` order breaking ties, `und` when
 *    all scores are 0; occurrences are non-overlapping left-to-right,
 *    exactly what a `replace`-length delta counts;
 *  - shingle-dup ratio = `1 − |distinct n-gram strings| / |n-grams|`
 *    over `max(tokens − n + 1, 1)` space-joined word n-grams (the
 *    short-doc floor keeps the divisor positive) — UNROUNDED; callers
 *    apply the same `round(…, 6)` both engines share.
 */
object TextKernels {

  /** Token count: `split(text, ' ')` field count = spaces + 1. Counted
    * on UTF-8 bytes — 0x20 never appears in a multi-byte sequence. */
  def tokenCount(s: UTF8String): Long = {
    val bytes = s.getBytes
    var c = 1L
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) c += 1
      i += 1
    }
    c
  }

  /** Non-overlapping left-to-right occurrence count — identical to the
    * count a `replace`-length delta observes. */
  private def countOccurrences(hay: String, needle: String): Long = {
    var c = 0L
    var i = hay.indexOf(needle)
    while (i >= 0) {
      c += 1
      i = hay.indexOf(needle, i + needle.length)
    }
    c
  }

  private val langNames: Array[UTF8String] =
    graft.ops.TextOps.langMarkers.map(p => UTF8String.fromString(p._1)).toArray
  private val langMarkerWords: Array[Array[String]] =
    graft.ops.TextOps.langMarkers.map(_._2.toArray).toArray
  private val und = UTF8String.fromString("und")

  /** Language ID with the portable form's NULL contract: NULL text
    * scores 0 on every marker, so it classifies as `und` — the CASE
    * chain's NULL conditions all fall through to `ELSE 'und'`, and the
    * DuckDB oracle does the same. Called from [[LangIdKernel]] codegen. */
  def langIdOrUnd(s: UTF8String): UTF8String =
    if (s == null) und else langId(s)

  /** Language ID over ONE lowercase pass + one indexOf sweep per marker
    * (15 total), zero per-marker text copies. `toLowerCase` is
    * UTF8String's — the exact function Spark's `lower()` applies. */
  def langId(s: UTF8String): UTF8String = {
    val padded = " " + s.toLowerCase.toString + " "
    val scores = new Array[Long](langMarkerWords.length)
    var g = 0
    var max = 0L
    while (g < langMarkerWords.length) {
      val ms = langMarkerWords(g)
      var sum = 0L
      var j = 0
      while (j < ms.length) { sum += countOccurrences(padded, ms(j)); j += 1 }
      scores(g) = sum
      if (sum > max) max = sum
      g += 1
    }
    if (max <= 0L) return und
    var i = 0
    while (scores(i) != max) i += 1
    langNames(i)
  }

  /** Shannon entropy in NATS over Unicode code points, unrounded —
    * the low-entropy fence for degenerate text (one repeated char,
    * binary junk, keyboard mashing). One pass, a small count map; the
    * DuckDB oracle's `string_split(text, '')` also yields code points,
    * so the distributions agree by construction. Empty string → 0.0. */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      i += java.lang.Character.charCount(cp)
      n += 1
    }
    var ent = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      ent -= p * math.log(p)
    }
    ent
  }

  /** N-word shingles as one primitive loop — the array the HOF
    * formulation (`transform(sequence…, i -> concat_ws(' ',
    * slice(split(text)…)))`, kept in [[graft.ops.TextOps.wordShingles]]
    * as the parity/oracle reference) builds, without its failure mode:
    * `transform` is CodegenFallback, and with `split(text)` inlined in
    * the lambda the interpreted evaluator re-splits the WHOLE document
    * once per shingle — O(tokens²) per doc through megamorphic `eval`
    * call sites (thread dumps under the shingle explodes show executors
    * pinned in `StringSplit.nullSafeEval`; q79's corpus pass dropped
    * ~10× at 15k docs when this kernel replaced the HOF). Short-doc
    * floor: < n tokens → ONE shingle of however many tokens exist. */
  /** NULL contract of the HOF form, reproduced exactly: `greatest`
    * SKIPS null args, so NULL text floors to one shingle and
    * `concat_ws` over the null slice yields `""` — NULL in, `[""]`
    * out (identical to empty text). Kept bit-for-bit so swapping the
    * kernel into a hot path can never move an oracle hash. */
  def wordShinglesOrEmpty(s: UTF8String, n: Int): ArrayData =
    wordShingles(if (s == null) UTF8String.EMPTY_UTF8 else s, n)

  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val total = math.max(toks.length - n + 1, 1)
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Duplicate word-n-gram fraction, unrounded: `1 − distinct/total`
    * over the same shingle list the HOF formulation builds (short docs
    * floor at one shingle of however many tokens exist). */
  def dupShingleRatio(s: UTF8String, n: Int): Double = {
    val toks = s.toString.split(" ", -1)
    val total = math.max(toks.length - n + 1, 1)
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    1.0 - seen.size.toDouble / total.toDouble
  }

  /**
   * Unicode NFC normalization (canonical composition) — Spark's
   * function library has no normalizer at all, yet web-crawled corpora
   * mix composed ("é" U+00E9) and decomposed ("e"+U+0301) forms of the
   * same text, which breaks exact dedup, fingerprinting, and tokenizer
   * vocabulary unification (the same surface word hashes twice).
   *
   * Fast paths, in order: a pure-ASCII byte sweep returns the INPUT
   * object untouched (no String allocation at all — the overwhelmingly
   * common case in mixed corpora), then `Normalizer.isNormalized`
   * (quick-check only, no output buffer) returns the input for
   * already-NFC non-ASCII text; only genuinely decomposed text pays
   * the normalize-and-reencode cost.
   *
   * Parity contract: `java.text.Normalizer` (ICU-aligned Unicode NFC)
   * agrees with DuckDB's utf8proc `nfc_normalize` — the oracle form —
   * on canonical composition; q128 pins the seam on seeded decomposed
   * sequences.
   */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // pure ASCII is NFC by definition
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /**
   * Accent folding — the dedup/matching canonicalization one notch
   * more aggressive than [[nfcNormalize]]: NFKD-decompose, drop every
   * combining mark (Unicode category Mn), recompose to NFC. "café",
   * "café" (decomposed), and "cafe" all collapse to "cafe"; compatible
   * forms (ﬁ ligature, full-width Ａ) also fold through NFKD. This is
   * the CCNet/fastText-style preprocessing step for cross-accent
   * near-dup detection and lexicon matching; it is intentionally a
   * SEPARATE kernel from NFC normalization — folding is lossy and
   * belongs only in match keys, never in stored text. Pure-ASCII
   * inputs return the input object untouched (byte-sweep fast path).
   */
  def foldAccents(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // ASCII folds to itself
    val decomposed = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var j = 0
    while (j < decomposed.length) {
      val c = decomposed.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }

  /**
   * One-pass Unicode-script profile: per-script code-point counts for
   * the multilingual-corpus audit (script vs language-ID mismatch,
   * mixed-script spoofing/boilerplate, digit-heavy noise). The class
   * ranges are FIXED BMP blocks — explicitly pinned, not
   * `Character.UnicodeScript` (whose assignments move between Unicode
   * versions and JDKs), so the DuckDB oracle reproduces each count
   * with one `[^range]` regex per class over the same code points:
   *
   *   latin      A–Z a–z U+00C0–D6 D8–F6 F8–FF U+0100–024F
   *   greek      U+0370–03FF          cyrillic  U+0400–04FF
   *   hebrew     U+0590–05FF          arabic    U+0600–06FF
   *   devanagari U+0900–097F
   *   cjk        U+3040–30FF (kana) U+4E00–9FFF (unified)
   *              U+AC00–D7A3 (hangul)
   *   digit      0–9;  everything else (punct, space, other planes) →
   *   other.  `n_chars` counts CODE POINTS (so does DuckDB `length`).
   *
   * Decodes UTF-8 bytes directly (all classes are BMP; 4-byte
   * sequences land in `other`) — zero String allocation per row.
   */
  def scriptProfile(s: UTF8String):
      org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val bytes = s.getBytes
    var i = 0
    var n = 0L; var lat = 0L; var cyr = 0L; var gre = 0L; var ara = 0L
    var heb = 0L; var dev = 0L; var cjk = 0L; var dig = 0L; var oth = 0L
    val len = bytes.length
    while (i < len) {
      val b0 = bytes(i) & 0xFF
      var cp = -1
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xC0) { i += 1 } // stray continuation -> other
      else if (b0 < 0xE0) {
        if (i + 1 < len) cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F)
        i += 2
      } else if (b0 < 0xF0) {
        if (i + 2 < len)
          cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
            (bytes(i + 2) & 0x3F)
        i += 3
      } else { i += 4 } // non-BMP -> other
      n += 1
      if (cp >= '0' && cp <= '9') dig += 1
      else if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= 0xC0 && cp <= 0xD6) || (cp >= 0xD8 && cp <= 0xF6) ||
        (cp >= 0xF8 && cp <= 0x24F)) lat += 1
      else if (cp >= 0x370 && cp <= 0x3FF) gre += 1
      else if (cp >= 0x400 && cp <= 0x4FF) cyr += 1
      else if (cp >= 0x590 && cp <= 0x5FF) heb += 1
      else if (cp >= 0x600 && cp <= 0x6FF) ara += 1
      else if (cp >= 0x900 && cp <= 0x97F) dev += 1
      else if ((cp >= 0x3040 && cp <= 0x30FF) ||
        (cp >= 0x4E00 && cp <= 0x9FFF) ||
        (cp >= 0xAC00 && cp <= 0xD7A3)) cjk += 1
      else oth += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, lat, cyr, gre, ara, heb, dev, cjk, dig, oth))
  }
}

private[functions] trait StringKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")
}

/** `graft_token_count(text)` — see [[TextKernels.tokenCount]]. */
case class TokenCountKernel(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_count"
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.tokenCount($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_lang_id(text)` — see [[TextKernels.langId]]. NOT
  * null-propagating: NULL text yields `und` (never NULL), matching the
  * portable CASE form and the DuckDB oracle, where NULL marker scores
  * fall through every WHEN to `ELSE 'und'`
  * ([[TextKernels.langIdOrUnd]]). */
case class LangIdKernel(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextKernels.langIdOrUnd(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         |${c.code}
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
         |  graft.functions.TextKernels.langIdOrUnd(${c.isNull} ? null : ${c.value});
       """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_char_entropy(text)` — see [[TextKernels.charEntropy]]. */
case class CharEntropyKernel(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"
  override def nullSafeEval(input: Any): Any =
    TextKernels.charEntropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.charEntropy($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_word_shingles(text, n)` — see [[TextKernels.wordShingles]].
  * NOT null-propagating: NULL text yields `[""]`, the HOF form's exact
  * NULL artifact ([[TextKernels.wordShinglesOrEmpty]]). */
case class WordShinglesKernel(child: Expression, n: Int)
    extends StringKernelExpression {
  require(n >= 1 && n <= 64, "shingle width must be in [1, 64]")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextKernels.wordShinglesOrEmpty(child.eval(input).asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.TextKernels.wordShinglesOrEmpty(
         |    ${c.isNull} ? null : ${c.value}, $n);
       """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_dup_ratio(text, n)` — see [[TextKernels.dupShingleRatio]]. */
case class DupShingleRatioKernel(child: Expression, n: Int)
    extends StringKernelExpression {
  require(n >= 1 && n <= 64, "shingle width must be in [1, 64]")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dup_ratio"
  override def nullSafeEval(input: Any): Any =
    TextKernels.dupShingleRatio(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.dupShingleRatio($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_nfc(text)` — see [[TextKernels.nfcNormalize]]. Standard
  * null-propagation (NULL in, NULL out — normalization has no NULL
  * artifact to reproduce, unlike lang-ID/shingles). */
case class NfcNormalizeKernel(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override def nullSafeEval(input: Any): Any =
    TextKernels.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.nfcNormalize($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_fold_accents(text)` — see [[TextKernels.foldAccents]]. */
case class FoldAccentsKernel(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fold_accents"
  override def nullSafeEval(input: Any): Any =
    TextKernels.foldAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.foldAccents($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_script_profile(text)` — see [[TextKernels.scriptProfile]].
  * Standard null-propagation. */
case class ScriptProfileKernel(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = ScriptProfileKernel.schema
  override def prettyName: String = "graft_script_profile"
  override def nullSafeEval(input: Any): Any =
    TextKernels.scriptProfile(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.scriptProfile($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptProfileKernel {
  import org.apache.spark.sql.types.StructType
  val schema: StructType = new StructType()
    .add("n_chars", LongType, nullable = false)
    .add("n_latin", LongType, nullable = false)
    .add("n_cyrillic", LongType, nullable = false)
    .add("n_greek", LongType, nullable = false)
    .add("n_arabic", LongType, nullable = false)
    .add("n_hebrew", LongType, nullable = false)
    .add("n_devanagari", LongType, nullable = false)
    .add("n_cjk", LongType, nullable = false)
    .add("n_digit", LongType, nullable = false)
    .add("n_other", LongType, nullable = false)
}
