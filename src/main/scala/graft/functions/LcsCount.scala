package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_lcs_count(a, b)` — length of the longest common SUBSEQUENCE
 * of the two texts' space-separated token streams (the ROUGE-L
 * statistic, Lin 2004, public). This is the fuzzy half of eval-set
 * decontamination: verbatim n-gram overlap (q108's check) misses a
 * benchmark item that leaked with small edits, while a high
 * LCS/|item| ratio survives insertions, deletions, and
 * re-punctuation.
 *
 * Tokenization is `split(' ')` with empty fields kept — byte-for-byte
 * the `string_split(text, ' ')` stream both engines share, so the DP
 * replays exactly (the oracle runs the same recurrence as an
 * anti-diagonal recursive CTE).
 *
 * Cost/shape: classic two-row DP, O(n·m) token comparisons and O(m)
 * memory per pair — the SHORT side (the benchmark item, tens of
 * tokens) should be passed as `b`, making per-pair cost n·|item| with
 * a 2·|item| scratch row. Intended strictly for post-candidate-gen
 * verification (pairs already pruned by shared n-grams), never as a
 * corpus×corpus primitive.
 */
case class LcsCountKernel(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two string arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lcs_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsCount.tokenLcs(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsCount.tokenLcs($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsCount {

  /** Two-row DP; static so codegen calls it directly. */
  def tokenLcs(a: UTF8String, b: UTF8String): Long = {
    // split(" ", -1) keeps trailing empty fields — the exact
    // `string_split(text, ' ')` token stream (double spaces yield
    // empty tokens in BOTH engines, and they may legitimately match)
    val at = a.toString.split(" ", -1)
    val bt = b.toString.split(" ", -1)
    val n = at.length
    val m = bt.length
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    var i = 1
    while (i <= n) {
      val ai = at(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ai == bt(j - 1)) prev(j - 1) + 1L
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
