package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/**
 * `graft_sorted_intersect(a, b)` — intersection SIZE of two SORTED,
 * duplicate-free `array<string>` OR `array<bigint>` columns via a
 * single merge scan.
 *
 * The Jaccard-verify hot loop (`Dedup.verifyPairs`, behind every
 * near-dup pipeline q16/q40/q46/q60/q82/q88) needs only
 * `|a ∩ b|`, but `size(array_intersect(a, b))` builds a hash set of
 * one side PER CANDIDATE PAIR — at 119 k candidates × ~50 shingles
 * (q88 at sf0.1) that is millions of per-pair string hashes and a
 * transient set allocation per row. Sorting each doc's shingle set
 * ONCE (`sort_array`, per doc not per pair) converts the per-pair work
 * to an allocation-free two-pointer merge.
 *
 * The LONG fast path (r20): even the merge scan over string arrays
 * allocates one `UTF8String` wrapper per element read — ~10⁹
 * allocations at the 125 k-candidate / ~10³-shingle regime, which made
 * the kernel itself ~95% of verify wall time (measured, BASELINE r20
 * row). Callers that dictionary-encode their sets to dense longs
 * (an injective relabeling — intersection COUNTS are invariant, see
 * `Dedup.pairOverlap`) hit the `getLong` branch instead: primitive
 * reads, zero allocation.
 *
 * Contract: both inputs sorted ascending (`sort_array` order for the
 * element type) with distinct, non-null elements (`array_distinct`
 * output); both arguments the SAME element type. The count equals
 * `size(array_intersect(a, b))` on such inputs BY CONSTRUCTION
 * (both are |a ∩ b| on sets) — spec-pinned on the real corpus, so
 * swapping it into an oracle-checked query cannot move a hash.
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    // element types only — containsNull is irrelevant to the merge
    // (the contract already requires non-null elements), and two valid
    // array<string> inputs differing only in element nullability (one
    // side through coalesce/array literal) must not fail analysis (r21)
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string> or two array<bigint> " +
          s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      SortedIntersectCount.countLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectCount.count(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "countLong" else "count"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.$fn($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Two-pointer merge count; static so codegen calls it directly. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Primitive-long merge count — allocation-free. */
  def countLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
