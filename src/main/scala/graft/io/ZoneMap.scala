package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Zone maps — per-file min/max statistics and the file-skipping read
 * they enable (the data-skipping index of Delta/Iceberg/ORC, public:
 * Moerkotte "Small Materialized Aggregates" 1998; the txn-log file
 * stats every lakehouse reader consults before planning a scan).
 * North-star extension — the reference has no layout management.
 *
 * The idea at 100 TB: a predicate on a NON-partition column normally
 * costs a full scan; if files were written clustered on that column,
 * a (file → min/max) side table turns the predicate into a file list
 * BEFORE the scan — I/O ∝ matching files, not corpus. Effectiveness
 * is entirely a layout property: stats over the clustering column are
 * tight (disjoint ranges → most files prune), stats over an
 * uncorrelated column span the whole domain (nothing prunes). Both
 * facts are visible in [[pruneReport]], which is the audit a layout
 * decision (which column to Z-order/cluster by) is made from.
 *
 * Determinism contract: file ids come from VALUE-RANGE binning
 * (`floor((v − lo)/(hi − lo) · nFiles)`, clamped — the [[graft.ops
 * .Diagnostics.psi]] formula), i.e. the assignment a range-partitioned
 * writer produces, computed as one 1-row min/max pass plus one narrow
 * projection — no global sort, no sampled range boundaries (Spark's
 * `repartitionByRange` samples, so its exact boundaries are not
 * engine-replayable; the closed-form binning is). Stats are min/max —
 * summation-free, so every output value is exact in both engines.
 *
 * Scale shape: stats build = one decomposable `groupBy(file_id)` over
 * a narrow projection (|files| output rows); the prune decision is
 * arithmetic over the |files|-row stats table — driver-safe to
 * collect, cheap to broadcast; the pruned read shuffles nothing.
 */
object ZoneMap {

  /** Clamped range-bin file id in [0, nFiles): the deterministic
    * stand-in for a range-clustered writer's file assignment. `lo`/`hi`
    * are the column's min/max (1-row aggregate, cross-broadcast by the
    * callers). A width-0 domain (constant column) collapses to file 0. */
  def rangeFileId(v: Column, lo: Column, hi: Column, nFiles: Int): Column = {
    require(nFiles >= 1, "nFiles must be >= 1")
    when(hi === lo, lit(0))
      .otherwise(least(lit(nFiles - 1), greatest(lit(0),
        floor((v - lo) * nFiles / (hi - lo)).cast("int"))))
  }

  /** Assign each row its range-bin file id on `clusterCol` (numeric or
    * castable-to-double; timestamps cast to epoch seconds first at the
    * call site). Adds `file_id`. One 1-row min/max pass + one narrow
    * projection — zero shuffles. */
  def assignFiles(df: DataFrame, clusterCol: Column, nFiles: Int): DataFrame = {
    val v = clusterCol.cast("double")
    val bounds = df.agg(min(v).as("__lo"), max(v).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("file_id", rangeFileId(v, col("__lo"), col("__hi"), nFiles))
      .drop("__lo", "__hi")
  }

  /** Per-file zone-map stats: `n_rows` + `<c>_mn`/`<c>_mx` per tracked
    * column. min/max are summation-free (exact in any engine/order);
    * output is |files| rows. */
  def stats(df: DataFrame, fileIdCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one tracked column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_mn"), max(col(c)).as(s"${c}_mx")))
    df.groupBy(col(fileIdCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** A file survives the predicate `valueCol BETWEEN lo AND hi` iff its
    * [mn, mx] zone overlaps the range; `pruned` is the complement. Null
    * zone edges (all-null file) never overlap. */
  def prunedFlag(mn: Column, mx: Column, lo: Column, hi: Column): Column =
    !(mx >= lo && mn <= hi)

  /**
   * Layout-effectiveness report — the measured answer to "is
   * clustering this table on that column worth the write cost": for
   * each range predicate in a caller-bounded workload model, the
   * fraction of files a zone-map-pruned read SKIPS under two candidate
   * layouts (e.g. clustered on the predicate column vs insertion
   * order). The decision input for CLUSTER BY / OPTIMIZE ZORDER — a
   * layout whose skip rate isn't materially higher doesn't pay for its
   * rewrite.
   *
   * Each layout gets one [[assignFiles]] + [[stats]] pass (one 1-row
   * bounds aggregate + one |files|-row groupBy over a narrow
   * projection); the report is arithmetic over the two |files|-row
   * stats frames crossed with the |preds|-row workload — nothing here
   * scales with the table beyond the two stats scans. Counts are
   * integers; the skip rates are single divisions (round 6).
   *
   * Output: one row per predicate: (pred_lo, pred_hi, files_a, open_a,
   * skip_rate_a, files_b, open_b, skip_rate_b) — per-layout file
   * counts are separate because the two layouts need not fill the
   * same number of range bins.
   */
  def skipRateReport(
      df: DataFrame,
      layoutA: Column,
      layoutB: Column,
      valueCol: String,
      nFiles: Int,
      predicates: Seq[(Double, Double)]): DataFrame = {
    require(predicates.nonEmpty, "need at least one predicate")
    val preds = df.sparkSession.createDataFrame(predicates)
      .toDF("pred_lo", "pred_hi")
    def opens(layout: Column, name: String): DataFrame =
      stats(assignFiles(df, layout, nFiles), "file_id", Seq(valueCol))
        .crossJoin(broadcast(preds))
        .groupBy("pred_lo", "pred_hi")
        .agg(count(lit(1)).as(s"__ft_$name"),
          sum(when(!prunedFlag(col(s"${valueCol}_mn"), col(s"${valueCol}_mx"),
            col("pred_lo"), col("pred_hi")), 1L).otherwise(0L))
            .as(s"open_$name"))
    opens(layoutA, "a")
      .join(opens(layoutB, "b"), Seq("pred_lo", "pred_hi"))
      .select(col("pred_lo"), col("pred_hi"),
        col("__ft_a").as("files_a"), col("open_a"),
        round((col("__ft_a") - col("open_a")).cast("double") /
          col("__ft_a"), 6).as("skip_rate_a"),
        col("__ft_b").as("files_b"), col("open_b"),
        round((col("__ft_b") - col("open_b")).cast("double") /
          col("__ft_b"), 6).as("skip_rate_b"))
  }

  /** The file list a zone-map-pruned read would open for
    * `valueCol BETWEEN lo AND hi` — arithmetic over the |files|-row
    * stats table (collected; files-bounded by construction). */
  def survivingFiles(
      stats: DataFrame, valueCol: String, lo: Column, hi: Column,
      fileIdCol: String = "file_id"): Seq[Int] =
    stats
      .filter(!prunedFlag(col(s"${valueCol}_mn"), col(s"${valueCol}_mx"), lo, hi))
      .select(col(fileIdCol).cast("int"))
      .collect().map(_.getInt(0)).sorted.toSeq

  /**
   * Compaction plan over a file-stats ledger — group small files into
   * merge bins of ≈ `targetRows` by the running-sum binning every file
   * coalescer uses (Spark's own file grouping; Delta OPTIMIZE's greedy
   * sizing): files sort by their zone floor (so merged files stay
   * range-clustered — compaction must not destroy the layout the zone
   * maps exist for), and `bin = floor((cumRows − rows)/target)` — a
   * file opens a new bin exactly when the running total before it
   * crosses a target boundary.
   *
   * The window runs over the STATS LEDGER (|files| rows, never data
   * rows) partitioned by `partitionCols` when given — real compaction
   * plans per table partition; the unpartitioned form is for
   * single-partition ledgers and documented as files-bounded.
   *
   * Output: one row per merge bin (+ partition cols): (bin, n_files,
   * total_rows) — bins with one file need no rewrite; the caller
   * filters n_files > 1.
   */
  def compactionPlan(
      stats: DataFrame,
      sortCol: String,
      rowsCol: String,
      targetRows: Long,
      partitionCols: Seq[String] = Seq.empty): DataFrame = {
    require(targetRows >= 1, "targetRows must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(sortCol), col(rowsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = stats
      .withColumn("__cum", sum(col(rowsCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(rowsCol)) / targetRows).cast("long"))
    binned
      .groupBy((partitionCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n_files"), sum(col(rowsCol)).as("total_rows"))
  }

  /** Zone-map-pruned read of a directory written with
    * `partitionBy(fileIdCol)`: the stats table converts the VALUE
    * predicate into a `file_id IN (...)` partition filter — the
    * predicate transfer Spark cannot do natively without a lakehouse
    * txn log — then the value filter itself still applies (zones are
    * necessary, not sufficient). The isin lands in `PartitionFilters`
    * (spec-pinned), so non-surviving files are never opened. */
  def readPruned(
      spark: SparkSession, dir: String, stats: DataFrame,
      valueCol: String, lo: Column, hi: Column,
      fileIdCol: String = "file_id"): DataFrame = {
    val keep = survivingFiles(stats, valueCol, lo, hi, fileIdCol)
    spark.read.parquet(dir)
      .filter(col(fileIdCol).isin(keep: _*) && col(valueCol).between(lo, hi))
  }
}
