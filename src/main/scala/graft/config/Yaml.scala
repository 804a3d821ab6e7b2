package graft.config

/**
 * Minimal YAML-subset parser — just enough for the declarative pipeline
 * configs this engine consumes (reference shapes:
 * `configs/breweries_gold_pipeline.yml`,
 * `configs/metadata/breweries_metadata_ingestion.yml`). Supported:
 * nested maps by indentation, block lists (`- item`), list-of-map items
 * (`- key: v` + deeper lines), inline lists (`[a, b]`), quoted/plain
 * scalars, `#` comments, `null`/booleans/numbers as scalars. No
 * dependency: the environment is zero-egress and the full YAML spec is
 * (deliberately) out of scope — unknown constructs fail loudly.
 */
object Yaml {

  sealed trait Node {
    def asScalar: String = this match {
      case Scalar(v) => v
      case other     => throw new IllegalArgumentException(s"expected scalar, got $other")
    }
    def asList: Seq[Node] = this match {
      case Arr(items) => items
      case other      => throw new IllegalArgumentException(s"expected list, got $other")
    }
    def asMap: Map[String, Node] = this match {
      case Obj(fields) => fields.toMap
      case other       => throw new IllegalArgumentException(s"expected map, got $other")
    }
    def apply(key: String): Node = asMap.getOrElse(key,
      throw new IllegalArgumentException(s"missing key '$key' in ${asMap.keys.mkString("{", ", ", "}")}"))
    def get(key: String): Option[Node] = this match {
      case Obj(fields) => fields.toMap.get(key).filterNot(_ == Scalar("null"))
      case _           => None
    }
    def str(key: String): String = apply(key).asScalar
    def strOpt(key: String): Option[String] = get(key).map(_.asScalar)
    def listOpt(key: String): Seq[Node] = get(key).map(_.asList).getOrElse(Nil)
  }
  final case class Scalar(value: String) extends Node
  final case class Arr(items: Seq[Node]) extends Node
  final case class Obj(fields: Seq[(String, Node)]) extends Node

  private final case class Line(indent: Int, text: String)

  def parse(src: String): Node = {
    val lines = src.linesIterator.map(stripComment)
      .zipWithIndex
      .filter(_._1.trim.nonEmpty)
      .map { case (l, _) => Line(l.takeWhile(_ == ' ').length, l.trim) }
      .toVector
    val (node, rest) = parseBlock(lines, if (lines.isEmpty) 0 else lines.head.indent)
    require(rest.isEmpty, s"trailing unparsed config lines: ${rest.take(2).map(_.text)}")
    node
  }

  /** Strip a trailing comment unless the `#` sits inside quotes. */
  private def stripComment(l: String): String = {
    var inS = false; var inD = false
    val b = new StringBuilder
    var i = 0
    var done = false
    while (i < l.length && !done) {
      val c = l(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD && (i == 0 || l(i - 1) == ' ')) done = true
      else b.append(c)
      i += 1
    }
    b.toString
  }

  private def parseBlock(lines: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    if (lines.isEmpty) (Scalar("null"), lines)
    else if (lines.head.text.startsWith("- ") || lines.head.text == "-")
      parseList(lines, indent)
    else parseMap(lines, indent)
  }

  private def parseList(lines0: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    var lines = lines0
    val items = Vector.newBuilder[Node]
    while (lines.nonEmpty && lines.head.indent == indent &&
      (lines.head.text.startsWith("- ") || lines.head.text == "-")) {
      val head = lines.head
      val inner = head.text.drop(1).trim
      if (inner.isEmpty) { // "-" alone: nested block item
        lines = lines.tail
        val (node, rest) = parseBlock(lines, lines.headOption.map(_.indent).getOrElse(indent + 2))
        items += node; lines = rest
      } else if (inner.contains(": ") || inner.endsWith(":")) {
        // map item started inline: re-inject as a deeper-indented line
        val synth = Line(indent + 2, inner)
        lines = synth +: lines.tail
        val (node, rest) = parseMap(lines, indent + 2)
        items += node; lines = rest
      } else {
        items += Scalar(unquote(inner)); lines = lines.tail
      }
    }
    (Arr(items.result()), lines)
  }

  private def parseMap(lines0: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    var lines = lines0
    val fields = Vector.newBuilder[(String, Node)]
    while (lines.nonEmpty && lines.head.indent == indent &&
      !lines.head.text.startsWith("- ") && lines.head.text != "-") {
      val t = lines.head.text
      val ci = t.indexOf(':')
      require(ci > 0, s"expected 'key: value', got '$t'")
      val key = unquote(t.take(ci).trim)
      val rest = t.drop(ci + 1).trim
      lines = lines.tail
      if (rest.nonEmpty) {
        fields += key -> parseInline(rest)
      } else {
        // nested block (map or list) at deeper indent, or empty value
        if (lines.nonEmpty && lines.head.indent > indent) {
          val (node, r) = parseBlock(lines, lines.head.indent)
          fields += key -> node; lines = r
        } else fields += key -> Scalar("null")
      }
    }
    (Obj(fields.result()), lines)
  }

  private def parseInline(s: String): Node =
    if (s.startsWith("[") && s.endsWith("]")) {
      val body = s.drop(1).dropRight(1).trim
      if (body.isEmpty) Arr(Nil)
      else Arr(splitTop(body).map(x => Scalar(unquote(x.trim))))
    } else Scalar(unquote(s))

  /** Split an inline list body on top-level commas (quote-aware). */
  private def splitTop(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0; var inS = false; var inD = false
    val cur = new StringBuilder
    s.foreach {
      case c @ '\'' if !inD             => inS = !inS; cur.append(c)
      case c @ '"' if !inS              => inD = !inD; cur.append(c)
      case c @ ('[' | '(') if !inS && !inD => depth += 1; cur.append(c)
      case c @ (']' | ')') if !inS && !inD => depth -= 1; cur.append(c)
      case ',' if depth == 0 && !inS && !inD => out += cur.result(); cur.clear()
      case c                            => cur.append(c)
    }
    out += cur.result()
    out.result()
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.drop(1).dropRight(1)
    else s
}
