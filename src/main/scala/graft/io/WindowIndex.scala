package graft.io

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/**
 * Durable exact-substring window-hash index — the parquet-backed store
 * behind incremental duplicate-span detection
 * ([[Dedup.incrementalDuplicateSpans]]). Companion to
 * [[SignatureIndex]] (MinHash, doc granularity); this one works at
 * TOKEN-WINDOW granularity, so daily ingest can find verbatim
 * boilerplate between a new batch and a 100 TB corpus without
 * re-hashing the corpus ([[Dedup.duplicateSpans]] rebuilds every
 * window of every doc per run — exactly the cost an index exists to
 * avoid).
 *
 * Store layout: `counts/` parquet with one (hh, cnt) row per appended
 * batch per distinct window hash — per-HASH summaries, never per-window
 * rows, so the store is ∝ distinct n-grams (not corpus tokens) and a
 * probe aggregates duplicate rows cheaply. `_graft_index.json` pins the
 * index identity (n, hash kind) and is committed AFTER the parquet, so
 * a crashed build leaves no readable index. Same single-writer /
 * many-reader contract, crash-safe compaction (stage + two renames +
 * [[SignatureIndex]]-style recovery), and append protocol as the
 * signature store.
 */
object WindowIndex {

  /** Index identity, fixed at build time. */
  final case class Meta(idCol: String, n: Int, kind: Dedup.HashKind)

  private def kindName(k: Dedup.HashKind): String = k match {
    case Dedup.Md5  => "md5"
    case Dedup.Xx64 => "xx64"
  }

  private def kindOf(name: String): Dedup.HashKind = name match {
    case "md5"  => Dedup.Md5
    case "xx64" => Dedup.Xx64
    case other  => sys.error(s"unknown hash kind '$other' in window index meta")
  }

  private def countsPath(dir: String) = s"$dir/counts"
  private def metaFile(dir: String) = new Path(dir, "_graft_index.json")
  private def prevPath(dir: String) = new Path(s"$dir/counts_prev")
  private def stagePath(dir: String) = s"$dir/counts_compacting"

  /** Recover the live counts dir after a crashed [[compact]] — see
    * [[SignatureIndex]]; no-op in the steady state. */
  private def ensureLive(spark: SparkSession, dir: String): Unit = {
    val live = new Path(countsPath(dir))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live) && fs.exists(prevPath(dir))) {
      fs.delete(new Path(stagePath(dir)), true)
      require(fs.rename(prevPath(dir), live),
        s"failed to restore $live from ${prevPath(dir)}")
    }
  }

  /** Build the index from scratch: count every n-token window hash of
    * `docs`, write the counts table, then commit the meta file.
    * Overwrites any previous index at `dir`. */
  def build(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      dir: String,
      n: Int,
      kind: Dedup.HashKind = Dedup.Md5): Unit = {
    require(idCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"idCol '$idCol' must be a plain identifier (stored in index meta)")
    val spark = docs.sparkSession
    Dedup.windowHashCounts(docs, textCol, idCol, n, kind)
      .sortWithinPartitions("hh") // dictionary/RLE-friendly runs
      .write.mode("overwrite").parquet(countsPath(dir))
    val json =
      s"""{"id_col": "$idCol", "n": $n, "kind": "${kindName(kind)}"}"""
    val fs = metaFile(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaFile(dir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read the index identity. Fails if `dir` holds no committed index. */
  def meta(spark: SparkSession, dir: String): Meta = {
    val p = metaFile(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no window index at $dir (missing ${p.getName})")
    val in = fs.open(p)
    val json =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    def str(k: String) = s""""$k": "([^"]*)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad index meta: missing $k")).group(1)
    def num(k: String) = s""""$k": (\\d+)""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad index meta: missing $k")).group(1).toInt
    Meta(str("id_col"), num("n"), kindOf(str("kind")))
  }

  /** The stored per-hash counts (hh, cnt) — possibly several rows per
    * hash (one per appended batch) until the next [[compact]]. */
  def counts(spark: SparkSession, dir: String): DataFrame = {
    ensureLive(spark, dir)
    spark.read.parquet(countsPath(dir))
  }

  /** Duplicated spans of `newDocs`, judged against batch ∪ indexed
    * corpus. Window width and hash kind come from the stored meta — a
    * probe CANNOT drift from the index's parameters. */
  def probe(newDocs: DataFrame, textCol: String, dir: String): DataFrame = {
    val m = meta(newDocs.sparkSession, dir)
    Dedup.incrementalDuplicateSpans(
      newDocs, counts(newDocs.sparkSession, dir), textCol, m.idCol, m.n, m.kind)
  }

  /** Append `newDocs`' window-hash counts so future probes see them. */
  def append(newDocs: DataFrame, textCol: String, dir: String): Unit = {
    ensureLive(newDocs.sparkSession, dir)
    val m = meta(newDocs.sparkSession, dir)
    Dedup.windowHashCounts(newDocs, textCol, m.idCol, m.n, m.kind)
      .sortWithinPartitions("hh")
      .write.mode("append").parquet(countsPath(dir))
  }

  /** Re-aggregate accreted append rows to one (hh, cnt) row per hash
    * in `numFiles` hash-range-clustered files, swapped in crash-safely
    * (stage → rename live to prev → promote stage → drop prev). */
  def compact(spark: SparkSession, dir: String, numFiles: Int): Unit = {
    ensureLive(spark, dir)
    val live = new Path(countsPath(dir))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(countsPath(dir))
      .groupBy(col("hh")).agg(sum(col("cnt")).as("cnt"))
      .repartitionByRange(numFiles, col("hh"))
      .sortWithinPartitions("hh")
      .write.mode("overwrite").parquet(stagePath(dir))
    fs.delete(prevPath(dir), true) // leftover from an ancient crash
    require(fs.rename(live, prevPath(dir)), s"compact: failed to retire $live")
    require(fs.rename(new Path(stagePath(dir)), live),
      s"compact: failed to promote staged index (recoverable — " +
        s"${prevPath(dir)} holds the previous index)")
    fs.delete(prevPath(dir), true)
  }

  /** [[compact]] only when appends have fragmented the store past
    * `2 × targetFiles` — the idempotent scheduled-maintenance form.
    * Returns true when a compaction ran. */
  def compactIfFragmented(spark: SparkSession, dir: String, targetFiles: Int): Boolean = {
    ensureLive(spark, dir)
    val live = new Path(countsPath(dir))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nFiles = fs.listStatus(live).count(_.getPath.getName.endsWith(".parquet"))
    val fragmented = nFiles > 2 * targetFiles
    if (fragmented) compact(spark, dir, targetFiles)
    fragmented
  }

  /** The daily-batch operation: probe the CURRENT index for the new
    * batch's duplicated spans, then append the batch's counts. Returns
    * the spans (materialized before the append so the result reflects
    * the pre-append index). */
  def ingestBatch(newDocs: DataFrame, textCol: String, dir: String): DataFrame = {
    val spans = probe(newDocs, textCol, dir).localCheckpoint()
    append(newDocs, textCol, dir)
    spans
  }
}
