package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gold-layer aggregation (reference:
 * `src/pipelines/breweries_aggregate_gold_notebook.py:32-68`) plus the
 * declarative aggregation DSL the reference *declared* but never executed
 * (`configs/breweries_gold_pipeline.yml:41-51`, SURVEY §2.6 A4).
 *
 * Two physical shapes for the same logical "union of roll-ups":
 *
 *  - [[unionRollups]] — parity shape: one `groupBy` per roll-up +
 *    `unionByName(allowMissingColumns = true)` (reference U1). N roll-ups
 *    ⇒ N aggregates over N scans (Catalyst usually reuses the exchange,
 *    but not the scan).
 *  - [[groupingSetsRollup]] — optimized shape: a single `GROUPING SETS`
 *    aggregate ⇒ ONE scan + ONE `Expand` + ONE partial/final aggregate,
 *    which is the plan you want at 100 TB (scan cost dominates; Expand
 *    multiplies rows only by the number of grouping sets, and partial
 *    aggregation collapses them map-side before the single shuffle).
 */
object Aggregate {

  /** One named metric, expressed in Spark-SQL (Catalyst `expr`) syntax —
    * honoring the reference's `{name, expr}` config surface. */
  final case class Metric(name: String, expression: String) {
    def toColumn: Column = expr(expression).as(name)
  }

  /** One roll-up: grouping columns + metrics + the `aggregation` tag the
    * reference stamps per branch
    * (`breweries_aggregate_gold_notebook.py:40,46,52`). */
  final case class AggSpec(groupBy: Seq[String], metrics: Seq[Metric], tag: String)

  /** A4 — run one declarative aggregation spec. */
  def run(df: DataFrame, spec: AggSpec): DataFrame = {
    val metricCols = spec.metrics.map(_.toColumn)
    val grouped =
      if (spec.groupBy.isEmpty) df.agg(metricCols.head, metricCols.tail: _*)
      else df.groupBy(spec.groupBy.map(col): _*).agg(metricCols.head, metricCols.tail: _*)
    grouped.withColumn("aggregation", lit(spec.tag))
  }

  /**
   * A1-A3 + U1 + P3 + P4 parity — union of roll-ups aligned by name with
   * null padding for grouping columns absent from a branch, stamped with
   * a caller-supplied (deterministic) transformation date.
   */
  def unionRollups(df: DataFrame, specs: Seq[AggSpec], transformationDate: String): DataFrame = {
    require(specs.nonEmpty, "at least one AggSpec")
    val branches = specs.map(run(df, _))
    val unioned = branches.reduce(_.unionByName(_, allowMissingColumns = true))
    // Canonical column order: all grouping cols (first-appearance order),
    // then metrics, then tags — explicit select so the output contract is
    // stable regardless of branch order (SURVEY §7.4 risk 3).
    val groupCols = specs.flatMap(_.groupBy).distinct
    val metricCols = specs.flatMap(_.metrics.map(_.name)).distinct
    val ordered = (groupCols ++ metricCols :+ "aggregation").map(col)
    unioned
      .withColumn("transformation_date", lit(transformationDate))
      .select(ordered :+ col("transformation_date"): _*)
  }

  /** One decomposable metric for [[saltedRollup]]: `func` must be an
    * algebraic aggregate that recombines by itself (`sum`, `min`, `max`)
    * or `count` (recombines by sum). */
  final case class SaltedMetric(name: String, func: String, expression: String) {
    require(Set("count", "sum", "min", "max")(func),
      s"'$func' is not decomposable; salted aggregation needs count/sum/min/max")
  }

  /**
   * Two-stage salted aggregation for SKEWED grouping keys — the 100 TB
   * escape hatch when one key holds a disproportionate share of rows and
   * its single reducer becomes the straggler. Stage 1 aggregates on
   * (keys, salt) so the hot key's rows spread over `saltBuckets`
   * reducers; stage 2 recombines the per-salt partials on the true keys
   * (a shuffle of at most keys × saltBuckets tiny rows). Results are
   * bit-identical to the plain `groupBy` for decomposable metrics —
   * verified by the oracle twin.
   *
   * The salt hashes ALL input columns (`xxhash64`), so it is independent
   * of scan layout; prefer a high-cardinality column subset in `saltOn`
   * when the full row is wide.
   */
  def saltedRollup(
      df: DataFrame,
      groupBy: Seq[String],
      metrics: Seq[SaltedMetric],
      saltBuckets: Int,
      saltOn: Seq[String] = Nil): DataFrame = {
    require(groupBy.nonEmpty && metrics.nonEmpty && saltBuckets > 0)
    val saltCols = (if (saltOn.nonEmpty) saltOn else df.columns.toSeq).map(col)
    val salted = df.withColumn("__salt", pmod(xxhash64(saltCols: _*), lit(saltBuckets)))
    val partial = metrics.map { m =>
      (m.func match {
        case "count" if m.expression == "*" => count(lit(1))
        case "count"                        => count(expr(m.expression))
        case "sum"                          => sum(expr(m.expression))
        case "min"                          => min(expr(m.expression))
        case "max"                          => max(expr(m.expression))
      }).as(m.name)
    }
    val stage1 = salted
      .groupBy((groupBy :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    val merge = metrics.map { m =>
      (m.func match {
        case "count" | "sum" => sum(col(m.name))
        case "min"           => min(col(m.name))
        case "max"           => max(col(m.name))
      }).as(m.name)
    }
    stage1.groupBy(groupBy.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /**
   * Optimized twin of [[unionRollups]]: a single GROUPING SETS aggregate.
   * The `aggregation` tag is reconstructed from `grouping(col)` flags so
   * output rows are labeled identically to the union shape.
   *
   * `sets` maps tag → grouping columns for that set.
   */
  def groupingSetsRollup(
      df: DataFrame,
      sets: Seq[(String, Seq[String])],
      metrics: Seq[Metric],
      transformationDate: String): DataFrame = {
    val allCols = sets.flatMap(_._2).distinct
    val gs = df.groupingSets(
      sets.map(_._2.map(col)),
      allCols.map(col): _*)
    val gmask = allCols
      .map(c => grouping(c).cast("string"))
      .reduceLeft[Column]((a, b) => concat(a, b))
      .as("__gmask")
    val metricCols = metrics.map(_.toColumn) :+ gmask
    val agged = gs.agg(metricCols.head, metricCols.tail: _*)
    // tag per grouping-set mask: '0' = column present in the set.
    val maskFor: Seq[String] => String =
      set => allCols.map(c => if (set.contains(c)) "0" else "1").mkString
    val tagCol = sets.foldRight(lit(null).cast("string")) { case ((tag, set), acc) =>
      when(col("__gmask") === maskFor(set), lit(tag)).otherwise(acc)
    }
    agged
      .withColumn("aggregation", tagCol)
      .withColumn("transformation_date", lit(transformationDate))
      .drop("__gmask")
  }
}
