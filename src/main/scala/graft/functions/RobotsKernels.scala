package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * robots.txt (Robots Exclusion Protocol, RFC 9309) kernels — the
 * crawl-policy gate between URL discovery and fetching in a web-corpus
 * pipeline. Two kernels, so the EXPENSIVE step runs per HOST and the
 * cheap step per URL:
 *
 *  - `graft_robots_rules(content, agent)`: parse a robots.txt body and
 *    return the rule list governing `agent`, encoded `"A:<pattern>"` /
 *    `"D:<pattern>"` in file order. Per RFC 9309: `#` comments strip,
 *    field names are case-insensitive, consecutive `User-agent` lines
 *    share one group, a `User-agent` after rules starts a new group,
 *    ALL groups matching the agent combine, and the specific-agent
 *    groups (exact product-token match, case-insensitive) take
 *    precedence over the `*` groups; empty patterns are no-ops. This
 *    runs once per robots FILE (hosts), never per URL.
 *  - `graft_robots_allowed(path, rules)`: evaluate a path against a
 *    parsed rule list. Longest-pattern match wins (the RFC's
 *    most-specific rule, measured in pattern octets — Google's
 *    published matcher does the same); an allow/disallow tie at equal
 *    length resolves to ALLOW (least restrictive); no match → allowed.
 *    Patterns support `*` wildcards and the `$` end anchor via a
 *    greedy left-to-right segment match. This is the per-URL kernel —
 *    a primitive loop behind codegen, scan-speed.
 *
 * Out of scope (documented divergence): percent-encoding equivalence
 * between rule and path octets — both sides are compared as given,
 * which is exact for pipelines that normalize URLs first
 * ([[graft.ops.UrlOps.normalizeUrl]]).
 */
object RobotsKernels {

  /** Greedy wildcard match: every `*`-separated segment must occur in
    * order, the first anchored at 0; `$` anchors the pattern end to
    * the path end. Without `$` the pattern is a prefix pattern. */
  def patternMatches(path: String, pattern: String): Boolean = {
    val endAnchor = pattern.endsWith("$")
    val p = if (endAnchor) pattern.substring(0, pattern.length - 1) else pattern
    val segs = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && endAnchor) {
        // last segment must END the path at/after pos
        if (!(path.endsWith(seg) && path.length - seg.length >= pos)) return false
        pos = path.length
      } else if (seg.nonEmpty) {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (endAnchor && segs.length == 1) pos == path.length else true
  }

  /** Parse + group-select; see object doc. Null content → empty rules
    * (no policy = allow all), the missing-robots default. */
  def rules(content: UTF8String, agent: UTF8String): ArrayData =
    new GenericArrayData(
      chosenEntries(content, agent).filterNot(_.startsWith("C:"))
        .map(r => UTF8String.fromString(r): Any).toArray)

  /** De-facto `Crawl-delay` (seconds) governing `agent` — the value the
    * politeness scheduler ([[graft.ops.Crawl.politeSchedule]]) feeds
    * per host. Group selection is identical to [[rules]]; when several
    * matching groups declare delays, the MAXIMUM wins (conservative —
    * the crawler can only be too polite). Null when absent/unparsable
    * or the robots body is null: caller supplies its default. */
  def crawlDelay(content: UTF8String, agent: UTF8String): java.lang.Double = {
    val ds = chosenEntries(content, agent).filter(_.startsWith("C:"))
      .flatMap(r => scala.util.Try(r.substring(2).toDouble).toOption)
      .filter(d => !d.isNaN && d >= 0)
    if (ds.isEmpty) null else java.lang.Double.valueOf(ds.max)
  }

  /** Shared parse + group-select: `"A:.."`/`"D:.."` rules plus
    * `"C:<secs>"` crawl-delay entries of the chosen groups, file
    * order. */
  private def chosenEntries(
      content: UTF8String,
      agent: UTF8String): scala.collection.mutable.ArrayBuffer[String] = {
    if (content == null) return scala.collection.mutable.ArrayBuffer.empty[String]
    val agentLc = if (agent == null) "*" else agent.toString.toLowerCase(java.util.Locale.ROOT)
    // groups: (agent tokens, rules "A:.."/"D:..")
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String], scala.collection.mutable.ArrayBuffer[String])]
    var curAgents = scala.collection.mutable.ArrayBuffer.empty[String]
    var curRules = scala.collection.mutable.ArrayBuffer.empty[String]
    var inAgentRun = false // consecutive User-agent lines share a group
    def closeGroup(): Unit = {
      if (curAgents.nonEmpty) groups += ((curAgents, curRules))
      curAgents = scala.collection.mutable.ArrayBuffer.empty[String]
      curRules = scala.collection.mutable.ArrayBuffer.empty[String]
    }
    content.toString.split("\n", -1).foreach { rawLine =>
      val noComment = {
        val h = rawLine.indexOf('#')
        if (h < 0) rawLine else rawLine.substring(0, h)
      }
      val line = noComment.trim.stripSuffix("\r").trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun) closeGroup()
            curAgents += value.toLowerCase(java.util.Locale.ROOT)
            inAgentRun = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty) // empty pattern = no-op per RFC
              curRules += (if (field == "allow") "A:" else "D:") + value
          case "crawl-delay" =>
            inAgentRun = false
            if (value.nonEmpty) curRules += "C:" + value
          case _ => // sitemap, unknown: ignore
            inAgentRun = false
        }
      }
    }
    closeGroup()
    // specific-agent groups take precedence over '*'; matches COMBINE
    val specific = groups.filter(_._1.contains(agentLc))
    val chosen = if (specific.nonEmpty) specific else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2)
  }

  /** Longest-match decision; allow wins length ties; default allow. */
  def allowed(path: UTF8String, rulesArr: ArrayData): Boolean = {
    if (path == null || rulesArr == null) return true
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rulesArr.numElements()) {
      val r = rulesArr.getUTF8String(i).toString
      val isAllow = r.charAt(0) == 'A'
      val pat = r.substring(2)
      if (patternMatches(p, pat)) {
        if (pat.length > bestLen) { bestLen = pat.length; bestAllow = isAllow }
        else if (pat.length == bestLen && isAllow) bestAllow = true
      }
      i += 1
    }
    bestAllow
  }
}

/** `graft_robots_rules(content, agent)` — see [[RobotsKernels.rules]].
  * NOT null-propagating on content: null robots body = no policy =
  * empty rule list. */
case class RobotsRulesKernel(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_robots_rules"
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    RobotsKernels.rules(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
         |${l.code}
         |${r.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.RobotsKernels.rules(
         |    ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
       """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_robots_allowed(path, rules)` — see [[RobotsKernels.allowed]].
  * NOT null-propagating: null path or rules decides ALLOW (no policy). */
case class RobotsAllowedKernel(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_robots_allowed"
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<string>), got (${l.sql}, ${r.sql})")
    }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    RobotsKernels.allowed(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
         |${l.code}
         |${r.code}
         |boolean ${ev.value} =
         |  graft.functions.RobotsKernels.allowed(
         |    ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
       """.stripMargin
    ev.copy(code = resultCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_robots_delay(content, agent)` — see
  * [[RobotsKernels.crawlDelay]]. Null result (not null-propagating
  * inputs) means "no declared delay": the caller coalesces its own
  * politeness default. */
case class RobotsDelayKernel(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_robots_delay"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val d = RobotsKernels.crawlDelay(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])
    if (d == null) null else d.doubleValue
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("delay")
    val resultCode =
      code"""
         |${l.code}
         |${r.code}
         |java.lang.Double $boxed = graft.functions.RobotsKernels.crawlDelay(
         |  ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
         |boolean ${ev.isNull} = $boxed == null;
         |double ${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    ev.copy(code = resultCode)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
