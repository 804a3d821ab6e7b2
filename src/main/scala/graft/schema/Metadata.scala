package graft.schema

import org.apache.spark.sql.types._

/**
 * Declarative table-schema metadata → Spark [[StructType]].
 *
 * Mirrors the reference's YAML-metadata-driven schema enforcement
 * (reference: `src/pipelines/breweries_transform_silver_notebook.py:47-62`,
 * `configs/metadata/breweries_metadata_ingestion.yml:10-42`) with two
 * deliberate fixes over the reference semantics:
 *
 *  - unknown type names FAIL loudly instead of silently falling back to
 *    string (the reference's `.get(..., StringType())` bug,
 *    `breweries_transform_silver_notebook.py:57`);
 *  - the `"type?"` nullable-suffix convention
 *    (`configs/breweries_ingestion_pipeline.yml:63-64`) is honored, and an
 *    explicit `nullable` flag (reference `:58`) takes precedence.
 *
 * This is control-plane code: it runs once on the driver to build the
 * schema, so there are no scale concerns; the scale win is downstream —
 * a fixed read schema is what lets the Parquet/JSON scans prune columns
 * (`ReadSchema` pushdown) instead of materializing every source field.
 */
object Metadata {

  /** One column spec: `typ` may carry a trailing `?` marking nullability. */
  final case class FieldSpec(
      name: String,
      typ: String,
      nullable: Option[Boolean] = None)

  final case class TableSpec(
      name: String,
      fields: Seq[FieldSpec],
      partitionBy: Seq[String] = Nil)

  /** `"double?"` → `(DoubleType, nullable = true)`. Unknown types throw. */
  def parseType(raw: String): (DataType, Boolean) = {
    val trimmed = raw.trim
    val optional = trimmed.endsWith("?")
    val base = if (optional) trimmed.dropRight(1) else trimmed
    val dt = base.toLowerCase match {
      case "string"            => StringType
      case "double"            => DoubleType
      case "float"             => FloatType
      case "int" | "integer"   => IntegerType
      case "long" | "bigint"   => LongType
      case "boolean" | "bool"  => BooleanType
      case "timestamp"         => TimestampType
      case "date"              => DateType
      case "binary"            => BinaryType
      case s if s.startsWith("decimal") =>
        // decimal(p,s)
        val ps = s.stripPrefix("decimal").stripPrefix("(").stripSuffix(")")
        val parts = ps.split(",").map(_.trim.toInt)
        DecimalType(parts(0), parts(1))
      case s if s.startsWith("array<") && s.endsWith(">") =>
        ArrayType(parseType(s.stripPrefix("array<").stripSuffix(">"))._1)
      case other =>
        throw new IllegalArgumentException(
          s"Unknown type '$other' in schema metadata (refusing the " +
            "reference's silent fallback-to-string)")
    }
    (dt, optional)
  }

  def toStructField(f: FieldSpec): StructField = {
    val (dt, suffixNullable) = parseType(f.typ)
    StructField(f.name, dt, f.nullable.getOrElse(suffixNullable))
  }

  def toStruct(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map(toStructField))

  /**
   * Minimal line-based spec parser so configs need no YAML dependency:
   * one field per line, `name: type` with optional `!null` marker, e.g.
   * {{{
   * id: string !null
   * latitude: double?
   * }}}
   * Blank lines and `#` comments ignored.
   */
  def parseSpec(spec: String): Seq[FieldSpec] =
    spec.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val Array(name, rest) = line.split(":", 2).map(_.trim)
        val notNull = rest.endsWith("!null")
        val typ = rest.stripSuffix("!null").trim
        FieldSpec(name, typ, if (notNull) Some(false) else None)
      }
      .toSeq

  def structFromSpec(spec: String): StructType = toStruct(parseSpec(spec))

  /** Canonical silver "brewery" schema from the reference metadata
    * (`configs/metadata/breweries_metadata_ingestion.yml:10-42`). */
  val brewerySilver: StructType = structFromSpec(
    """
    id: string !null
    name: string !null
    brewery_type: string
    city: string
    state: string !null
    country: string
    updated_at: timestamp
    ingestion_date: date !null
    """)
}
