package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{PipelineConfig, Yaml}
import graft.ops.Quality
import graft.schema.Metadata

class ConfigSpec extends AnyFunSuite {

  test("Yaml: nested maps, block lists, inline lists, comments, quotes") {
    val n = Yaml.parse(
      """dag:
        |  dag_id: my_dag            # trailing comment
        |  schedule_interval: "30 7 * * *"
        |  tags: ["a", "b"]
        |  owners:
        |    - alice
        |    - bob
        |stages:
        |  - task_id: s1
        |    depends_on: []
        |    parameters:
        |      nested:
        |        k: "v # not a comment"
        |  - task_id: s2
        |    depends_on: ["s1"]
        |""".stripMargin)
    assert(n("dag").str("dag_id") == "my_dag")
    assert(n("dag").str("schedule_interval") == "30 7 * * *")
    assert(n("dag")("tags").asList.map(_.asScalar) == Seq("a", "b"))
    assert(n("dag")("owners").asList.map(_.asScalar) == Seq("alice", "bob"))
    val stages = n("stages").asList
    assert(stages.map(_.str("task_id")) == Seq("s1", "s2"))
    assert(stages(0)("depends_on").asList.isEmpty)
    assert(stages(0)("parameters")("nested").str("k") == "v # not a comment")
    assert(stages(1)("depends_on").asList.map(_.asScalar) == Seq("s1"))
  }

  test("Yaml: missing key and type mismatch fail loudly") {
    val n = Yaml.parse("a: 1\nb:\n  - x\n")
    intercept[IllegalArgumentException](n.str("nope"))
    intercept[IllegalArgumentException](n("b").asScalar)
    intercept[IllegalArgumentException](n("a").asList)
  }

  test("PipelineConfig: reference-shaped gold config binds to AggSpec + Rules") {
    val conf = PipelineConfig.parse(
      """dag:
        |  dag_id: gold_daily
        |  schedule_interval: "30 7 * * *"
        |stages:
        |  - task_id: aggregate_gold
        |    parameters:
        |      aggregations:
        |        - name: "by_state"
        |          group_by: ["state"]
        |          metrics:
        |            - name: "brewery_count"
        |              expr: "count(*)"
        |        - name: "by_type_state"
        |          group_by: ["brewery_type", "state"]
        |          metrics:
        |            - name: "brewery_count"
        |              expr: "count(*)"
        |  - task_id: validate_gold_quality
        |    depends_on: ["aggregate_gold"]
        |    quality_rules:
        |      - rule: "No null brewery_type"
        |        column: "brewery_type"
        |        type: "not_null"
        |      - rule: "positive counts"
        |        column: "brewery_count"
        |        type: "greater_than_zero"
        |""".stripMargin)
    assert(conf.dagId == "gold_daily")
    val agg = conf.stage("aggregate_gold")
    assert(agg.aggregations.map(_.tag) == Seq("by_state", "by_type_state"))
    assert(agg.aggregations(1).groupBy == Seq("brewery_type", "state"))
    assert(agg.aggregations(0).metrics.head.name == "brewery_count")
    val q = conf.stage("validate_gold_quality")
    assert(q.dependsOn == Seq("aggregate_gold"))
    assert(q.qualityRules == Seq(
      Quality.NotNull("No null brewery_type", "brewery_type"),
      Quality.GreaterThanZero("positive counts", "brewery_count")))
  }

  test("PipelineConfig: unknown rule type fails loudly (no reference fallthrough)") {
    val e = intercept[IllegalArgumentException](PipelineConfig.parseRule(
      Yaml.parse("rule: r\ncolumn: c\ntype: is_unique\n")))
    assert(e.getMessage.contains("is_unique"))
  }

  test("parseMetadata: schema entries → FieldSpecs, partition_by scalar or list") {
    val meta = PipelineConfig.parseMetadata(
      """dataset:
        |  name: breweries_silver
        |  partition_by: "state"
        |schema:
        |  - name: id
        |    type: string
        |    nullable: false
        |  - name: latitude
        |    type: double?
        |""".stripMargin)
    assert(meta.name == "breweries_silver")
    assert(meta.partitionBy == Seq("state"))
    assert(meta.fields == Seq(
      Metadata.FieldSpec("id", "string", Some(false)),
      Metadata.FieldSpec("latitude", "double?", None)))
    val st = Metadata.toStruct(meta.fields)
    assert(!st("id").nullable && st("latitude").nullable)

    val multi = PipelineConfig.parseMetadata(
      "dataset:\n  name: x\n  partition_by: [\"state\", \"country\"]\nschema:\n  - name: id\n    type: string\n")
    assert(multi.partitionBy == Seq("state", "country"))
  }
}
