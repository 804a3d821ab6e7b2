package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/**
 * Driver contract — one `queries` entry per implemented operator from
 * SURVEY.md §2 (+ north-star extensions), each with a DuckDB-oracle
 * twin in `oracleSql` designed for EXACT hash equality:
 * deterministic dedup/top-k (total-order tiebreaks), exact decimal
 * summation for doubles (cast→sum→single final rounding), md5-only
 * hashing, and engine-portable SQL fragments generated once for both
 * engines (`PortableSql`).
 */
object SparkEntry extends EntryContext
    with EntryIo with EntryMedia with EntryDedup with EntryAnn
    with EntryAnnGraph
    with EntryWeb with EntryGraph with EntrySearch
    with EntryText with EntryTokenize
    with EntryStats with EntryStatsInfer
    with EntryEvents with EntryCuration {

  // ---------------------------------------------------------------- entry

  /** Flagship: the full config-assembled medallion pipeline (bronze
    * JSONL capture → silver clean partitioned parquet → gold
    * union-of-rollups → quality gate + report artifact) on sf0.001,
    * returning the gold table it published. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val (report, goldPath) = graft.pipeline.Medallion.run(
      spark,
      graft.config.PipelineConfig.parse(pipelineYaml),
      graft.config.PipelineConfig.parseMetadata(metadataYaml),
      source = sp => T(sp, dir, "customer"),
      baseDir = tmp("entry_pipeline"), runId = "20251015",
      transformationDate = "2025-10-15",
      clean = graft.pipeline.Medallion.CleanSpec(
        dedupKeys = Seq("c_custkey"),
        requiredCols = Seq("c_custkey", "c_name", "c_mktsegment"),
        normalizeCols = Seq("c_name", "c_mktsegment"),
        order = Seq(col("c_name").asc_nulls_first)))
    require(report.succeeded, s"flagship pipeline failed:\n${report.toJson}")
    Layers.readParquet(spark, goldPath)
  }

  // -------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ioQueries ++ mediaQueries ++ dedupQueries ++ annQueries ++
      annGraphQueries ++
      webQueries ++ graphQueries ++ searchQueries ++
      textQueries ++ tokenizeQueries ++ statsQueries ++
      statsInferQueries ++ eventsQueries ++
      curationQueries

  def oracleSql: Map[String, String] =
    ioOracles ++ mediaOracles ++ dedupOracles ++ annOracles ++
      annGraphOracles ++
      webOracles ++ graphOracles ++ searchOracles ++
      textOracles ++ tokenizeOracles ++ statsOracles ++
      statsInferOracles ++ eventsOracles ++
      curationOracles
}
