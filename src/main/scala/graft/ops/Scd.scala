package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SCD2 (slowly-changing-dimension, type 2) upsert merge — versioned
 * metadata maintenance for corpus dimensions (source registries,
 * license records, domain reputations): every change closes the open
 * row and opens a new one, so any past pipeline run can be replayed
 * against the dimension AS OF its read time.
 *
 * State schema: key, attrs…, `valid_from`, `valid_to` (null = open),
 * `is_current`. Batch schema: key, attrs…, `tsCol` (the effective
 * time; (key, ts) unique per batch).
 *
 * Merge semantics, per key: the open row and the batch's updates are
 * sequenced by effective time (the open row first on ties); updates
 * whose attributes equal the previous version (null-safe) are
 * SUPPRESSED (no-op churn never creates versions); each kept version's
 * `valid_to` is the next version's `valid_from`; the last is current.
 * Unknown keys insert as new current rows. CLOSED history rows are
 * never touched.
 *
 * LATE updates — effective time strictly BEFORE the open row's
 * `valid_from` — are DROPPED: sequencing one in would open a version
 * whose interval overlaps already-closed history (the closed row
 * ending at the open row's `valid_from` covers that span), silently
 * corrupting as-of replays. Callers that need to audit or
 * dead-letter them get the exact dropped set from [[lateUpdates]];
 * true retro-active corrections are a history REWRITE, not a merge,
 * and must be done deliberately against the closed rows.
 *
 * Scale shape (batch-∝, the q46/q95 incremental discipline): batch
 * keys are broadcast, and ONLY the open rows of touched keys enter the
 * window (left-semi prune) — every other state row, closed or open,
 * passes through untouched. Cost ∝ |batch| + |touched open rows|; the
 * dimension's history is never reshuffled. Both window passes share
 * one key-partitioning (a single shuffle of the touched slice).
 * EVERY broadcast here is batch-∝ — the batch's key set, and the open
 * rows of touched keys (≤ one per batch key) — never the full open
 * state, so a wide dimension cannot blow the driver through the hint.
 * The hints are also size-GUARDED: the batch key count is probed once
 * (a batch-∝ distinct + count on an already-needed frame), and a
 * backfill-sized batch above `maxBroadcastKeys` degrades to shuffle
 * joins instead of a driver-sized broadcast.
 */
object Scd {

  /** Default hint ceiling: ~10M keys is comfortably inside a 4–8 GiB
    * driver for the slim (key, valid_from) frames broadcast here;
    * beyond it a shuffle join is the right plan anyway. */
  val DefaultMaxBroadcastKeys: Long = 10L * 1000 * 1000

  def mergeScd2(
      state: DataFrame,
      updates: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCols: Seq[String],
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 merge needs at least one attribute column")
    val attrs = attrCols.map(col)
    val outCols = (Seq(keyCol) ++ attrCols ++
      Seq("valid_from", "valid_to", "is_current")).map(col)

    val open = state.filter(col("is_current"))
    // batch key set: materialized once (it anchors three joins) and
    // counted — the size probe that decides whether the hints below
    // are safe. Cost: one batch-∝ distinct, nothing state-sized.
    val upKeys = updates.select(keyCol).distinct().localCheckpoint()
    val hint: DataFrame => DataFrame =
      if (upKeys.count() <= maxBroadcastKeys) broadcast else identity
    // open rows of touched keys — ≤ |batch keys| rows, the ONLY state
    // slice this merge ever moves
    val openTouched = open.join(hint(upKeys), Seq(keyCol), "left_semi")
    // guard: drop updates older than their key's open row (see class
    // doc) — the broadcast operand is the batch-∝ touched slice, NOT
    // the full open state, so the filter is map-side AND driver-safe
    val updatesOnTime = updates.join(
        hint(openTouched.select(col(keyCol), col("valid_from").as("__open_from"))),
        Seq(keyCol), "left")
      .filter(col("__open_from").isNull || col(tsCol) >= col("__open_from"))
      .drop("__open_from")

    // untouched: all closed history + open rows of keys the batch
    // never mentions — a pass-through, no shuffle beyond the semi-join.
    // (Keys whose updates were ALL late flow through the window below
    // as a single open-row candidate and re-emerge unchanged.)
    val untouched = state.filter(!col("is_current"))
      .unionByName(open.join(hint(upKeys), Seq(keyCol), "left_anti"))

    val cand = openTouched
      .select((Seq(col(keyCol)) ++ attrs :+ col("valid_from") :+ lit(0).as("__src")): _*)
      .unionByName(updatesOnTime.select(
        (Seq(col(keyCol)) ++ attrs :+ col(tsCol).as("valid_from") :+ lit(1).as("__src")): _*))

    val seqW = Window.partitionBy(keyCol).orderBy(col("valid_from"), col("__src"))
    val kept = cand
      .withColumn("__prev", lag(struct(attrs: _*), 1).over(seqW))
      // null-safe: a version is kept iff its attributes differ from
      // the previous kept... strictly the previous CANDIDATE — with
      // the open row first and (key, ts) unique, consecutive equal
      // candidates collapse transitively to the same suppression set
      .filter(col("__prev").isNull || !(struct(attrs: _*) <=> col("__prev")))
    val versioned = kept
      .withColumn("valid_to", lead(col("valid_from"), 1).over(seqW))
      .withColumn("is_current", col("valid_to").isNull)

    untouched.select(outCols: _*).unionByName(versioned.select(outCols: _*))
  }

  /** The updates [[mergeScd2]] would DROP as late (effective time
    * strictly before their key's open row) — the audit/dead-letter
    * companion. Same batch-∝, size-guarded broadcast shape as the
    * merge's guard: the open state is semi-pruned down to the batch's
    * keys BEFORE any hint, so the broadcast operand is ≤ one slim row
    * per batch key, never the full dimension. */
  def lateUpdates(
      state: DataFrame,
      updates: DataFrame,
      keyCol: String,
      tsCol: String,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys): DataFrame = {
    val upKeys = updates.select(keyCol).distinct().localCheckpoint()
    val hint: DataFrame => DataFrame =
      if (upKeys.count() <= maxBroadcastKeys) broadcast else identity
    val openFrom = state.filter(col("is_current"))
      .join(hint(upKeys), Seq(keyCol), "left_semi")
      .select(col(keyCol), col("valid_from").as("__open_from"))
    updates.join(hint(openFrom), Seq(keyCol), "inner")
      .filter(col(tsCol) < col("__open_from"))
      .drop("__open_from")
  }
}
