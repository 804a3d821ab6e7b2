package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Durable per-batch PAIR REPORTS for the media ingest maintainers
 * ([[ImageIngest]], [[AudioIngest]], [[VideoIngest]]) — closing the
 * crash window between a batch's index marker and its folded-record
 * commit (`/root/reference` has no streaming at all — north-star
 * crash armor, the [[graft.io.Commits]] family).
 *
 * The window: a drain probes the standing index, appends its batch
 * (marker-committed), then crashes BEFORE `commitFolded()`. The next
 * drain re-reads the same silver files, but its index-as-ledger
 * anti-join sees every id already standing, so the delta — and the
 * returned pair frame — is EMPTY: the crashed drain's near-dup pairs
 * were computed but never surfaced to any caller, and those
 * duplicates silently pass the gate. The fix is the meta-last
 * convention applied to the REPORT: each batch persists its verified
 * pairs under `index/pairs/batch=<tag>` BEFORE the batch marker
 * commits (marker covers both), and a replaying drain re-reads the
 * stored report for any batch its fresh files touch.
 *
 * Replay detection is O(drain) in the steady state: a fresh silver
 * file carrying ids that are ALREADY standing is exactly the
 * marker-committed / folded-uncommitted signature (record ids are
 * globally unique and silver is exactly-once, so no other path lands
 * a fresh file's ids in the index first) — one batch-sized semi-join
 * decides it, and only a drain inside the window pays the
 * batch-provenance scan that locates the touched reports.
 */
object PairReports {

  private def reportDir(indexDir: String, tag: String): String =
    s"$indexDir/pairs/batch=$tag"

  /** Persist a batch's verified pair report — call BEFORE the batch
    * marker commits, so a marker-committed batch always has a
    * re-readable report (a replayed orphan overwrites its own). */
  def persist(pairs: DataFrame, indexDir: String, tag: String): Unit =
    pairs.write.mode("overwrite").parquet(reportDir(indexDir, tag))

  /**
   * The stored pair reports of committed batches whose ids intersect
   * `freshIds` (one `media_id` column — the drain's fresh files' ids,
   * pre-anti-join). Returns an empty `pairSchema` frame when no fresh
   * id is standing (the steady state — decided by one batch-sized
   * semi-join against `standingIds`, no store scan), or when the
   * touched batches predate pair-report persistence (the pre-upgrade
   * store behaves as before).
   */
  def healed(
      spark: SparkSession,
      indexDir: String,
      committedBatches: Seq[Path],
      freshIds: DataFrame,
      standingIds: DataFrame,
      pairSchema: StructType): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairSchema)
    if (committedBatches.isEmpty) return empty
    val replaying = !freshIds
      .join(standingIds, Seq("media_id"), "left_semi").isEmpty
    if (!replaying) return empty
    // inside the window only: locate the touched batch tags by batch
    // provenance (media_id column + file path — a skinny one-column
    // scan of the committed batches, paid only on crash replay)
    val tags = spark.read.parquet(committedBatches.map(_.toString): _*)
      .select(col("media_id"),
        regexp_extract(input_file_name(), "batch=([^/]+)/", 1).as("__tag"))
      .join(freshIds, Seq("media_id"), "left_semi")
      .select("__tag").distinct()
      .collect().map(_.getString(0)).toSeq // ≤ #batches, never data-∝
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = tags.map(t => reportDir(indexDir, t))
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) empty
    else spark.read.schema(pairSchema).parquet(dirs: _*)
  }
}
