package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.Clean

/**
 * Streaming bronze→silver ingestion — the Structured Streaming twin of
 * the batch medallion path ([[graft.pipeline.Medallion]]): a
 * schema-enforced JSONL FILE STREAM in, the narrow silver cleanings
 * (normalize + null-drop) applied per micro-batch, and a parquet sink
 * with the file-sink commit log, so output is EXACTLY-ONCE across
 * restarts (the checkpoint records which input files are done; the
 * `_spark_metadata` log records which output files are committed —
 * readers never see partial or duplicated batches).
 *
 * `Trigger.AvailableNow` drains the current backlog and stops — the
 * "batch job expressed as a stream" pattern: the SAME code serves a
 * scheduled nightly drain and a continuously tailing ingester (swap
 * the trigger), and incremental progress is free — rerunning after new
 * files land processes ONLY the new files. That replaces the
 * reference's rerun-everything daily bronze capture
 * (`src/pipelines/breweries_fetch_bronze_notebook.py:71-107`, re-run
 * per Airflow schedule with full overwrite) with incremental ingestion
 * at no code cost.
 *
 * Keyed dedup is deliberately NOT here: it needs state and an
 * event-time watermark ([[EventsStream.dedupWithinWatermark]]); the
 * batch silver compaction ([[Clean.silverClean]]) remains the
 * full-history dedup authority.
 *
 * Scale notes: file listing is incremental (`maxFilesPerTrigger` caps
 * per-batch work); the transforms are stateless and narrow, so
 * micro-batches run at scan speed with zero shuffles.
 */
object IngestStream {

  /** Build the cleaned streaming frame (separated for plan tests). */
  def cleanedStream(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      requiredCols: Seq[String],
      normalizeCols: Seq[String],
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema(schema)
      .option("multiLine", "false")
    val withCap = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    Clean.normalize(
      Clean.dropNullKeys(withCap.json(srcDir), requiredCols),
      normalizeCols)
  }

  /** Drain everything currently in `srcDir` into `outDir` exactly once
    * and return. Safe to call repeatedly: already-processed files are
    * skipped via the checkpoint. */
  def drainOnce(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      requiredCols: Seq[String],
      normalizeCols: Seq[String],
      outDir: String,
      checkpointDir: String,
      partitionBy: Seq[String] = Nil,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val writer = cleanedStream(spark, srcDir, schema, requiredCols, normalizeCols,
      maxFilesPerTrigger)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
    val q = (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .start()
    q.awaitTermination()
  }
}
