package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing fingerprints (MOSS scheme) as a custom Catalyst expression:
 * rolling polynomial k-gram hash (`h = Σ code·B^j mod M`, B = 257,
 * M = 1000003 — Horner form with per-step mod, identical residues to
 * the oracle's sum-of-powers form) → minimum of every `w`-hash window →
 * first-occurrence-deduplicated array&lt;long&gt;.
 *
 * Why an Expression and not `transform`/`slice` Column arithmetic: this
 * is a char-level kernel with data-dependent loop bounds. The HOF
 * formulation (kept as [[graft.ops.TextOps.rollingHashesFromCodes]],
 * the portable reference used in parity tests and as the template for
 * the DuckDB oracle SQL) evaluates an interpreted lambda PER POSITION
 * with per-element dispatch — and is one optimizer inlining away from
 * re-evaluating the whole upstream array per element (an O(len²·k)
 * blow-up we measured at ~300× before pinning projection boundaries).
 * Here the whole document is one call into [[WinnowingFingerprints
 * .compute]] running a primitive Scala loop — O(len·k) with zero
 * allocation per position.
 *
 * Codegen: `doGenCode` emits a static call to the same kernel, so the
 * surrounding projection STAYS inside whole-stage codegen — a
 * CodegenFallback expression would force the entire stage onto the
 * interpreted path, losing fusion for every neighboring expression,
 * which costs far more than the fallback's own virtual call.
 *
 * Char codes are `charAt` (UTF-16 units) — identical to `ascii()` on
 * the BMP text this corpus contains; documents with astral-plane chars
 * would need codePointAt on BOTH engines.
 *
 * Null text → null. Docs shorter than `k` → empty array (no k-grams).
 */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && k <= 64, "k must be in [2, 64]")
  require(w >= 1, "w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowingFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowingFingerprints.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingFingerprints {

  private val B = graft.ops.TextOps.rollingB
  private val M = graft.ops.TextOps.rollingM

  /** The winnowing kernel — static so generated code can call it
    * directly (Scala emits a static forwarder on the class). */
  def compute(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = input.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * B + s.charAt(i + j)) % M; j += 1 }
      hashes(i) = h
      i += 1
    }
    val nw = math.max(m - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var t = 0
    while (t < nw) {
      var mn = Long.MaxValue
      var u = t
      val end = math.min(t + w, m)
      while (u < end) { if (hashes(u) < mn) mn = hashes(u); u += 1 }
      seen.add(mn)
      t += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }
}
