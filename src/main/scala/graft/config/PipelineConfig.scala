package graft.config

import graft.ops.Aggregate.{AggSpec, Metric}
import graft.ops.Quality
import graft.schema.Metadata

/**
 * Typed binding from the declarative YAML config surface to engine
 * objects — the config shapes are the reference's own
 * (`configs/breweries_gold_pipeline.yml:32-69` stages with
 * `aggregations: [{name, group_by, metrics: [{name, expr}]}]` and
 * `quality_rules: [{rule, column, type}]`;
 * `configs/metadata/breweries_metadata_ingestion.yml:10-42` schema
 * entries `{name, type, nullable}`), so a user of the reference can
 * carry their configs over unchanged.
 *
 * Deliberate deviation (SURVEY §2.8 F4): an unknown `quality_rules.type`
 * throws instead of silently passing — the reference's fallthrough makes
 * a typo'd rule vacuously green.
 */
object PipelineConfig {

  final case class StageConf(
      taskId: String,
      dependsOn: Seq[String],
      parameters: Yaml.Node,
      aggregations: Seq[AggSpec],
      qualityRules: Seq[Quality.Rule],
      retries: Int,
      retryDelayMs: Long)

  final case class PipelineConf(
      dagId: String,
      schedule: Option[String],
      stages: Seq[StageConf]) {
    def stage(taskId: String): StageConf =
      stages.find(_.taskId == taskId).getOrElse(
        throw new IllegalArgumentException(s"no stage '$taskId' in dag $dagId"))
  }

  def parse(yaml: String): PipelineConf = {
    val root = Yaml.parse(yaml)
    val dag = root("dag")
    PipelineConf(
      dagId = dag.str("dag_id"),
      schedule = dag.strOpt("schedule_interval"),
      stages = root.listOpt("stages").map(parseStage))
  }

  private def parseStage(n: Yaml.Node): StageConf = {
    val params = n.get("parameters").getOrElse(Yaml.Obj(Nil))
    StageConf(
      taskId = n.str("task_id"),
      dependsOn = n.listOpt("depends_on").map(_.asScalar),
      parameters = params,
      aggregations = params.listOpt("aggregations").map(parseAgg),
      qualityRules = n.listOpt("quality_rules").map(parseRule),
      retries = n.strOpt("retries").map(_.toInt).getOrElse(0),
      retryDelayMs = n.strOpt("backoff_seconds").map(_.toLong * 1000).getOrElse(1000L))
  }

  /** `{name, group_by: [...], metrics: [{name, expr}]}` → [[AggSpec]]. */
  def parseAgg(n: Yaml.Node): AggSpec =
    AggSpec(
      groupBy = n.listOpt("group_by").map(_.asScalar),
      metrics = n.listOpt("metrics").map(m => Metric(m.str("name"), m.str("expr"))),
      tag = n.str("name"))

  /** `{rule, column, type}` → [[Quality.Rule]]; `type: expr` additionally
    * reads a `condition`. Unknown types fail loudly. */
  def parseRule(n: Yaml.Node): Quality.Rule = {
    val name = n.str("rule")
    n.str("type") match {
      case "not_null"          => Quality.NotNull(name, n.str("column"))
      case "greater_than_zero" => Quality.GreaterThanZero(name, n.str("column"))
      case "expr"              => Quality.ExprRule(name, n.str("condition"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown quality rule type '$other' for rule '$name' " +
            "(refusing the reference's silent pass-through)")
    }
  }

  /** `corpus_filters: [{filter, …thresholds}]` → the Gopher-style
    * document filter chain ([[graft.ops.CorpusFilters]]). Chain order
    * in the YAML is evaluation order (first failing filter names the
    * drop reason). Unknown filter names fail loudly, same policy as
    * quality rules. */
  def parseCorpusFilters(yaml: String): Seq[graft.ops.CorpusFilters.Filter] = {
    import graft.ops.CorpusFilters._
    Yaml.parse(yaml).listOpt("corpus_filters").map { f =>
      f.str("filter") match {
        case "min_tokens"     => MinTokens(f.str("min").toLong)
        case "max_tokens"     => MaxTokens(f.str("max").toLong)
        case "languages"      => AllowLangs(f.listOpt("allow").map(_.asScalar))
        case "min_quality"    => MinQuality(f.str("min").toDouble)
        case "max_repetition" =>
          MaxRepetition(
            f.str("max").toDouble,
            f.strOpt("shingle_words").map(_.toInt).getOrElse(3))
        case other =>
          throw new IllegalArgumentException(
            s"unknown corpus filter '$other' " +
              "(refusing the reference's silent pass-through)")
      }
    }
  }

  /** Metadata-file binding: `schema: [{name, type, nullable}]` →
    * field specs for [[Metadata.toStruct]]; `dataset.partition_by`
    * accepted as scalar or list. */
  def parseMetadata(yaml: String): Metadata.TableSpec = {
    val root = Yaml.parse(yaml)
    val ds = root("dataset")
    val partitionBy = ds.get("partition_by") match {
      case Some(Yaml.Arr(items)) => items.map(_.asScalar)
      case Some(s)               => Seq(s.asScalar)
      case None                  => Nil
    }
    val fields = root.listOpt("schema").map { f =>
      Metadata.FieldSpec(
        name = f.str("name"),
        typ = f.str("type"),
        nullable = f.strOpt("nullable").map(_.toBoolean))
    }
    Metadata.TableSpec(ds.str("name"), fields, partitionBy)
  }
}
