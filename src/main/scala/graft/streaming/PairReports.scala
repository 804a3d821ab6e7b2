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
 * pairs AND its source-file list under `index/pairs/batch=<tag>`
 * BEFORE the batch marker commits (marker covers both), and a
 * replaying drain re-reads the stored report for any batch built
 * from files the folded record still hasn't covered.
 *
 * Replay detection is COMMIT STATE, not id overlap: a batch is
 * inside the window exactly when it is marker-committed but its
 * source silver files are not yet in the folded record — i.e. they
 * are still among the drain's fresh files. (The first draft inferred
 * the window from "a fresh id is already standing", but an
 * at-least-once producer re-delivering an id in a NEW silver file is
 * indistinguishable from a crash under that test and would re-emit a
 * long-folded batch's whole report — silent duplicate pair delivery.)
 * Batches are checked newest-first and the scan stops at the first
 * batch whose sources are fully folded (every unfolded batch is
 * strictly newer than every folded one — drains serialize under the
 * index claim and the folded record advances monotonically), so the
 * steady state reads ONE tiny sidecar per drain, never the store.
 * Batches that predate source-list persistence have no sidecar and
 * terminate the scan — the pre-upgrade store behaves as before.
 */
object PairReports {

  private val sourcesName = "_graft_sources" // `_` prefix: parquet readers skip it

  private def reportDir(indexDir: String, tag: String): String =
    s"$indexDir/pairs/batch=$tag"

  /** Persist a batch's verified pair report plus the silver files it
    * was built from — call BEFORE the batch marker commits, so a
    * marker-committed batch always has a re-readable report (a
    * replayed orphan overwrites its own). The sources sidecar lands
    * AFTER the parquet write (overwrite mode clears the dir). */
  def persist(
      pairs: DataFrame,
      indexDir: String,
      tag: String,
      sourceFiles: Seq[String]): Unit = {
    val dir = reportDir(indexDir, tag)
    pairs.write.mode("overwrite").parquet(dir)
    val p = new Path(dir, sourcesName)
    val fs = p.getFileSystem(
      pairs.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(sourceFiles.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /**
   * The stored pair reports of marker-committed batches whose SOURCE
   * FILES are still among `freshFiles` (the drain's not-yet-folded
   * silver files) — exactly the marker-committed / folded-uncommitted
   * crash signature. Returns an empty `pairSchema` frame in the
   * steady state (the newest committed batch's sources are folded —
   * one sidecar read decides it, no store scan) and for pre-upgrade
   * stores (no sidecar).
   */
  def healed(
      spark: SparkSession,
      indexDir: String,
      committedBatches: Seq[Path],
      freshFiles: Seq[String],
      pairSchema: StructType): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairSchema)
    if (committedBatches.isEmpty || freshFiles.isEmpty) return empty
    val fresh = freshFiles.toSet
    val fs = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // newest-first (drains serialize under the claim, so dir mtimes
    // order the batches); stop at the first fully-folded batch —
    // everything older is folded too
    val byAge = committedBatches
      .map(b => b -> fs.getFileStatus(b).getModificationTime)
      .sortBy { case (b, t) => (-t, b.getName) }
      .map(_._1)
    val touched = scala.collection.mutable.Buffer.empty[String]
    var scanning = true
    val it = byAge.iterator
    while (scanning && it.hasNext) {
      val tag = it.next().getName.stripPrefix("batch=")
      val srcP = new Path(reportDir(indexDir, tag), sourcesName)
      if (!fs.exists(srcP)) scanning = false // pre-upgrade batch
      else {
        val in = fs.open(srcP)
        val srcs =
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(_.nonEmpty).toSet
          finally in.close()
        if (srcs.exists(fresh)) touched += tag
        else scanning = false // sources folded → steady state
      }
    }
    val dirs = touched.toSeq.map(t => reportDir(indexDir, t))
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) empty
    else spark.read.schema(pairSchema).parquet(dirs: _*)
  }
}
