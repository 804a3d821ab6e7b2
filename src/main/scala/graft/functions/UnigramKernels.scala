package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parsed unigram piece table + max piece length in code points —
  * top-level so generated Java can name the type directly. */
final class UnigramModel(
    val table: java.util.HashMap[String, java.lang.Long],
    val maxLen: Int) extends Serializable

/**
 * Unigram-LM (SentencePiece-style) tokenizer kernels — Viterbi
 * segmentation of words under a trained piece table (Kudo 2018,
 * "Subword Regularization", public; the tokenizer family's second
 * public algorithm beside BPE). The trainer lives in
 * [[graft.ops.Unigram]]; these kernels are its inner loop (E-step
 * segmentation over the vocabulary frame) and the production encoder
 * (token counts over a corpus scan), same static-call `doGenCode`
 * design as [[BpeCountKernel]] so the projection stays inside
 * whole-stage codegen.
 *
 * DETERMINISM CONTRACT (what makes training DuckDB-replayable): piece
 * log-probabilities are INTEGER MICRONATS (`round(ln(p) * 1e6)` as a
 * long — the model quantizes at build time), so every Viterbi score is
 * an exact integer sum: no float summation order, no ulp drift between
 * engines. Ties between segmentations with equal integer score break
 * toward the LONGER piece at each DP position (checked longest-first).
 * A single character absent from the piece table scores the fixed
 * [[UnigramKernels.UnkMicro]] penalty (e^-100 — below any physical
 * piece probability) and is emitted as its own piece, so encoding text
 * with out-of-vocabulary characters is total and deterministic.
 *
 * Positions are Unicode CODE POINTS (SQL `substr`/`len` semantics),
 * not UTF-16 units — a surrogate pair is one DP position.
 */
object UnigramKernels {

  /** OOV single-character penalty, integer micronats: ln p = -100
    * (e^-100). Any real piece has ln p ≥ -ln(corpus tokens) ≫ -100,
    * so UNK never outcompetes a known piece. */
  final val UnkMicro: Long = -100000000L

  private val FieldSep = '\u0002'
  private val EntrySep = '\u0003'

  /** Encode a trained model for the foldable `spec` argument:
    * `piece`U+0002`logp_micro`, entries joined by U+0003. */
  def spec(model: Seq[(String, Long)]): String =
    model.map { case (p, lp) => s"$p$FieldSep$lp" }.mkString(EntrySep.toString)

  /** Inverse of [[spec]]; parsed once per plan, shipped as a codegen
    * reference object. */
  def parseSpec(s: String): UnigramModel = {
    val table = new java.util.HashMap[String, java.lang.Long]()
    var maxLen = 1
    if (s.nonEmpty) s.split(EntrySep.toString, -1).foreach { e =>
      val i = e.indexOf(FieldSep)
      require(i >= 0, s"malformed unigram model spec entry: '$e'")
      val piece = e.substring(0, i)
      table.put(piece, java.lang.Long.valueOf(e.substring(i + 1).toLong))
      val l = piece.codePointCount(0, piece.length)
      if (l > maxLen) maxLen = l
    }
    new UnigramModel(table, maxLen)
  }

  /** Viterbi back-pointers for one word: `back(p)` = code-point length
    * of the best path's piece ENDING at position p (1-based);
    * `off` = code-point start offsets (length L+1). */
  private def viterbi(
      word: String, off: Array[Int], L: Int, m: UnigramModel): Array[Int] = {
    val best = new Array[Long](L + 1)
    val back = new Array[Int](L + 1)
    var p = 1
    while (p <= L) {
      var bScore = Long.MinValue
      var bLen = 0
      val maxL = math.min(m.maxLen, p)
      var l = 1
      while (l <= maxL) {
        val piece = word.substring(off(p - l), off(p))
        val lp = m.table.get(piece)
        if (lp != null) {
          val sc = best(p - l) + lp.longValue
          // ascending l with >=-replace on ties == longest piece wins
          if (sc > bScore || (sc == bScore && l > bLen)) {
            bScore = sc; bLen = l
          }
        } else if (l == 1 && bLen == 0) {
          bScore = best(p - 1) + UnkMicro; bLen = 1
        }
        l += 1
      }
      best(p) = bScore
      back(p) = bLen
      p += 1
    }
    back
  }

  private def offsets(word: String): (Array[Int], Int) = {
    val L = word.codePointCount(0, word.length)
    val off = new Array[Int](L + 1)
    var i = 0
    var k = 0
    while (k < L) {
      off(k) = i
      i = word.offsetByCodePoints(i, 1)
      k += 1
    }
    off(L) = word.length
    (off, L)
  }

  /** Viterbi pieces of ONE word, left to right. Empty word → empty
    * array. Static so codegen calls it directly. */
  def pieces(word: UTF8String, m: UnigramModel): ArrayData = {
    val w = word.toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    val (off, l) = offsets(w)
    val back = viterbi(w, off, l, m)
    var p = l
    var n = 0
    while (p > 0) { n += 1; p -= back(p) }
    val out = new Array[Any](n)
    p = l
    var i = n - 1
    while (p > 0) {
      out(i) = UTF8String.fromString(w.substring(off(p - back(p)), off(p)))
      i -= 1
      p -= back(p)
    }
    new GenericArrayData(out)
  }

  /** Viterbi piece count of a space-tokenized TEXT (the production
    * encoder): sum of per-word path lengths; empty words count 0.
    * Static so codegen calls it directly. */
  def count(text: UTF8String, m: UnigramModel): Long = {
    val words = text.toString.split(" ", -1)
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val (off, l) = offsets(w)
        val back = viterbi(w, off, l, m)
        var p = l
        while (p > 0) { total += 1L; p -= back(p) }
      }
      wi += 1
    }
    total
  }
}

/** Shared shape of the two unigram kernels: (input, foldable model
  * spec) with the parsed model as a plan reference object. */
sealed trait UnigramKernelBase extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName model spec must be a literal/foldable string")
    else TypeCheckResult.TypeCheckSuccess

  /** Parsed once per plan, shipped to executors with the expression. */
  @transient protected lazy val model: UnigramModel = {
    val s = right.eval(null)
    UnigramKernels.parseSpec(
      if (s == null) "" else s.asInstanceOf[UTF8String].toString)
  }
}

/** `graft_unigram_pieces(word, spec)` — Viterbi segmentation of one
  * word under a trained unigram model: `array<string>` of pieces in
  * order. The trainer's E-step surface (runs on the vocabulary frame,
  * never the corpus). */
case class UnigramPiecesKernel(left: Expression, right: Expression)
    extends UnigramKernelBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_pieces"
  override def nullSafeEval(word: Any, spec: Any): Any =
    UnigramKernels.pieces(word.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      "graft.functions.UnigramModel")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.UnigramKernels.pieces($w, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_unigram_count(text, spec)` — Viterbi token count of a
  * space-tokenized text under a trained unigram model (the production
  * encoder; the unigram twin of `graft_bpe_count`). */
case class UnigramCountKernel(left: Expression, right: Expression)
    extends UnigramKernelBase {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_unigram_count"
  override def nullSafeEval(text: Any, spec: Any): Any =
    UnigramKernels.count(text.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      "graft.functions.UnigramModel")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.UnigramKernels.count($t, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
