package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parsed WordPiece vocabulary + max matchable piece length in code
  * points (marker excluded) — top-level so generated Java can name the
  * type directly. */
final class WordPieceModel(
    val set: java.util.HashSet[String],
    val maxLen: Int) extends Serializable

/**
 * WordPiece greedy encoder kernels — longest-match-first segmentation
 * under a trained piece vocabulary (Schuster & Nakajima 2012; the
 * WordPiece tokenization BERT ships, public). The trainer lives in
 * [[graft.ops.WordPiece]]; these kernels are the production encoder,
 * same static-call `doGenCode` design as [[UnigramKernels]] so the
 * projection stays inside whole-stage codegen.
 *
 * Greedy semantics (the published algorithm, deterministic by
 * construction — no scores, no ties): at each position take the
 * LONGEST vocabulary piece that matches (position 0 matches bare
 * pieces, later positions match `##`-marked continuation pieces); if
 * NO piece matches at some position, the ENTIRE word becomes one
 * `[UNK]` token — the documented BERT fallback, not a per-character
 * one. Positions are Unicode code points (SQL `substr`/`len`
 * semantics), so the oracle's unrolled greedy chain replays the
 * segmentation exactly.
 */
object WordPieceKernels {

  /** The unknown-word token (BERT's literal). */
  final val Unk = "[UNK]"

  private val EntrySep = '\u0003'

  /** Encode a piece vocabulary for the foldable `spec` argument:
    * pieces joined by U+0003 (pieces are corpus text + the `##`
    * marker — never control characters). */
  def spec(pieces: Seq[String]): String = pieces.mkString(EntrySep.toString)

  /** Inverse of [[spec]]; parsed once per plan, shipped as a codegen
    * reference object. */
  def parseSpec(s: String): WordPieceModel = {
    val set = new java.util.HashSet[String]()
    var maxLen = 1
    if (s.nonEmpty) s.split(EntrySep.toString, -1).foreach { p =>
      set.add(p)
      val raw = if (p.startsWith("##")) p.substring(2) else p
      val l = raw.codePointCount(0, raw.length)
      if (l > maxLen) maxLen = l
    }
    new WordPieceModel(set, maxLen)
  }

  /** Greedy piece keys of ONE word (marker included on continuation
    * pieces), or null when the word hits the [UNK] fallback. */
  private def greedy(word: String, m: WordPieceModel): java.util.ArrayList[String] = {
    val L = word.codePointCount(0, word.length)
    val out = new java.util.ArrayList[String]()
    var p = 0   // code-point position
    var off = 0 // UTF-16 offset of position p
    while (p < L) {
      var l = math.min(m.maxLen, L - p)
      var hit: String = null
      var hitOff = 0
      while (l >= 1 && hit == null) {
        val end = word.offsetByCodePoints(off, l)
        val cand = word.substring(off, end)
        val key = if (p == 0) cand else "##" + cand
        if (m.set.contains(key)) { hit = key; hitOff = end }
        else l -= 1
      }
      if (hit == null) return null // whole-word [UNK] fallback
      out.add(hit)
      p += l
      off = hitOff
    }
    out
  }

  /** Greedy pieces of ONE word, left to right; empty word → empty
    * array; unmatchable word → `["[UNK]"]`. Static so codegen calls
    * it directly. */
  def pieces(word: UTF8String, m: WordPieceModel): ArrayData = {
    val w = word.toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    val g = greedy(w, m)
    if (g == null)
      return new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))
    val out = new Array[Any](g.size)
    var i = 0
    while (i < g.size) { out(i) = UTF8String.fromString(g.get(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Greedy piece count of a space-tokenized TEXT (the production
    * encoder): sum of per-word counts; an unmatchable word counts 1
    * ([UNK]); empty words count 0. Static so codegen calls it
    * directly. */
  def count(text: UTF8String, m: WordPieceModel): Long = {
    val words = text.toString.split(" ", -1)
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val g = greedy(w, m)
        total += (if (g == null) 1L else g.size.toLong)
      }
      wi += 1
    }
    total
  }
}

/** Shared shape of the two WordPiece kernels: (input, foldable vocab
  * spec) with the parsed vocabulary as a plan reference object. */
sealed trait WordPieceKernelBase extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName vocab spec must be a literal/foldable string")
    else TypeCheckResult.TypeCheckSuccess

  /** Parsed once per plan, shipped to executors with the expression. */
  @transient protected lazy val model: WordPieceModel = {
    val s = right.eval(null)
    WordPieceKernels.parseSpec(
      if (s == null) "" else s.asInstanceOf[UTF8String].toString)
  }
}

/** `graft_wordpiece_pieces(word, spec)` — greedy longest-match
  * segmentation of one word under a WordPiece vocabulary:
  * `array<string>` of pieces in order (`["[UNK]"]` on fallback). */
case class WordPiecePiecesKernel(left: Expression, right: Expression)
    extends WordPieceKernelBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_pieces"
  override def nullSafeEval(word: Any, spec: Any): Any =
    WordPieceKernels.pieces(word.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceModel", model,
      "graft.functions.WordPieceModel")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.WordPieceKernels.pieces($w, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_wordpiece_count(text, spec)` — greedy WordPiece token count
  * of a space-tokenized text (the production encoder; the WordPiece
  * twin of `graft_bpe_count` / `graft_unigram_count`). */
case class WordPieceCountKernel(left: Expression, right: Expression)
    extends WordPieceKernelBase {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wordpiece_count"
  override def nullSafeEval(text: Any, spec: Any): Any =
    WordPieceKernels.count(text.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceModel", model,
      "graft.functions.WordPieceModel")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.WordPieceKernels.count($t, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
