package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_bpe_count(text, spec)` — BPE token count of `text` under a
 * learned merge list, as a primitive-loop kernel (same design as the
 * other [[TextKernels]] expressions: static-call `doGenCode` keeps the
 * projection inside whole-stage codegen).
 *
 * Semantics are parity-pinned (BpeSpec) against
 * [[graft.ops.Bpe.segmentCountPortable]], the fold-of-`replace` oracle
 * template: per space-token word, seed one symbol per character, apply
 * every merge in rank order as ONE greedy leftmost non-overlapping
 * pass (`replace` semantics: after a merge the scan continues past the
 * merged symbol), then count surviving symbols; sum over words. The
 * portable form is expression-depth ∝ merges and exists for the DuckDB
 * replay; this kernel loops a runtime merge array, so a production
 * 32k-merge tokenizer costs one array sweep per merge instead of a
 * 32k-deep expression tree — and the merge list rides into codegen as
 * a plan reference object, never re-parsed per row.
 *
 * `spec` must be a FOLDABLE string: rank-ordered merges encoded
 * `left`U+0002`right`, pairs joined by U+0003
 * ([[BpeCountKernel.spec]]). Symbols are char sequences of the corpus
 * alphabet — the control separators cannot collide with them.
 */
case class BpeCountKernel(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName merge spec must be a literal/foldable string")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  /** Parsed once per plan, shipped to executors with the expression. */
  @transient private lazy val flat: Array[String] = {
    val s = right.eval(null)
    BpeCountKernel.parseSpec(
      if (s == null) "" else s.asInstanceOf[UTF8String].toString)
  }

  override def nullSafeEval(text: Any, spec: Any): Any =
    BpeCountKernel.count(text.asInstanceOf[UTF8String], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeCountKernel.count($t, $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeCountKernel {
  private val PairSep = '\u0002'
  private val MergeSep = '\u0003'

  /** Encode a rank-ordered merge list for the `spec` argument. */
  def spec(merges: Seq[(String, String)]): String =
    merges.map { case (l, r) => s"$l$PairSep$r" }.mkString(MergeSep.toString)

  /** Inverse of [[spec]]: flat [l1, r1, l2, r2, …] in rank order. */
  def parseSpec(s: String): Array[String] =
    if (s.isEmpty) Array.empty
    else s.split(MergeSep.toString, -1).flatMap { p =>
      val i = p.indexOf(PairSep)
      require(i >= 0, s"malformed BPE merge spec entry: '$p'")
      Array(p.substring(0, i), p.substring(i + 1))
    }

  /** Static so codegen calls it directly. `flat` = [l1, r1, l2, r2, …]. */
  def count(s: UTF8String, flat: Array[String]): Long = {
    val words = s.toString.split(" ", -1)
    val nMerges = flat.length / 2
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.isEmpty) {
        // split("", " ") = [""]: the empty word is one empty symbol,
        // matching the portable form's seed of the empty string
        total += 1L
      } else {
        // seed one symbol per CODE POINT (not UTF-16 code unit), matching
        // the portable form's `(.)` regex and the trainer — a surrogate
        // pair (emoji, astral CJK) is a single seed symbol
        val syms = new Array[String](w.length) // code points ≤ code units
        var ci = 0
        var nSeed = 0
        while (ci < w.length) {
          val cc = Character.charCount(w.codePointAt(ci))
          syms(nSeed) = w.substring(ci, ci + cc)
          nSeed += 1
          ci += cc
        }
        var n = nSeed
        var m = 0
        while (m < nMerges && n > 1) {
          val l = flat(2 * m)
          val r = flat(2 * m + 1)
          var out = 0
          var i = 0
          while (i < n) {
            if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
              syms(out) = l + r
              i += 2
            } else {
              syms(out) = syms(i)
              i += 1
            }
            out += 1
          }
          n = out
          m += 1
        }
        total += n
      }
      wi += 1
    }
    total
  }
}
