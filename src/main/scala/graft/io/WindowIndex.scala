package graft.io

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Spans}

/**
 * Durable exact-substring window-hash index — the parquet-backed store
 * behind incremental duplicate-span detection
 * ([[Spans.incrementalDuplicateSpans]]). Companion to
 * [[SignatureIndex]] (MinHash, doc granularity); this one works at
 * TOKEN-WINDOW granularity, so daily ingest can find verbatim
 * boilerplate between a new batch and a 100 TB corpus without
 * re-hashing the corpus ([[Spans.duplicateSpans]] rebuilds every
 * window of every doc per run — exactly the cost an index exists to
 * avoid).
 *
 * Store layout — COMMITTED BATCHES:
 * {{{
 *   _graft_index.json                  index identity (id_col, n, kind)
 *   store/counts/batch=<tag>/          (hh, cnt) per distinct window hash
 *   store/docs/batch=<tag>/            (id) + _graft_committed  ← commit point
 * }}}
 * Every write lands under a per-batch partition pair whose tag is a
 * DETERMINISTIC function of the batch's doc ids, and a batch is LIVE
 * only once its docs-side `_graft_committed` marker exists (written
 * last). That pair of properties makes maintenance effectively
 * exactly-once without a transactional store:
 *
 *  - a crash between the counts write and the docs commit leaves an
 *    INVISIBLE orphan — readers (probe, [[counts]], [[processedIds]])
 *    filter to live tags, so nothing is double-counted and the
 *    batch's docs are still "unprocessed" (they re-enter the next
 *    delta);
 *  - a replay of the same delta recomputes the same tag and
 *    OVERWRITES the orphan in place (mode=overwrite per partition),
 *    then commits — no accretion, identical final state;
 *  - a replay with a GROWN delta (new files landed before the retry)
 *    writes a fresh tag covering the superset; the old orphan stays
 *    invisible until [[compact]] rewrites the store from live
 *    partitions only, dropping orphan garbage.
 *
 * The docs partition doubles as the PROCESSED-DOCS LEDGER (the
 * [[SignatureIndex]] "the index IS the ledger" invariant, recovered
 * here by committing ids and counts as one visibility unit):
 * [[processedIds]] drives the anti-join delta of
 * [[graft.streaming.CorpusIngest.maintainSpans]]. The store is still
 * ∝ distinct n-grams + doc IDS (never per-window rows, never text).
 *
 * Same single-writer / many-reader contract and crash-safe compaction
 * (stage + two renames of the ONE `store/` root + recovery) as the
 * signature store; serialize [[compact]] with appends.
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

  private def storePath(dir: String) = s"$dir/store"
  private def countsPath(dir: String) = s"${storePath(dir)}/counts"
  private def docsPath(dir: String) = s"${storePath(dir)}/docs"
  private def metaFile(dir: String) = new Path(dir, "_graft_index.json")
  private def prevPath(dir: String) = new Path(s"$dir/store_prev")
  private def stagePath(dir: String) = s"$dir/store_compacting"
  private val marker = "_graft_committed"
  private val baseTag = "__base__"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recover the live store after a crashed [[compact]] — see
    * [[SignatureIndex]]; no-op in the steady state. */
  private def ensureLive(spark: SparkSession, dir: String): Unit = {
    val live = new Path(storePath(dir))
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(prevPath(dir))) {
      f.delete(new Path(stagePath(dir)), true)
      require(f.rename(prevPath(dir), live),
        s"failed to restore $live from ${prevPath(dir)}")
    }
  }

  /** Deterministic batch tag from the batch's doc ids: same delta →
    * same tag → a crashed write is OVERWRITTEN by its replay, never
    * accreted. (Order-insensitive XOR of per-id hashes — wrap-free
    * under ANSI mode; the count guards the degenerate empty batch.) */
  def batchTag(docs: DataFrame, idCol: String): String = {
    val r = docs.agg(
      count(lit(1)).as("c"),
      coalesce(expr(s"bit_xor(xxhash64(cast($idCol as string)))"), lit(0L)).as("h"))
      .head()
    s"b${r.getLong(0)}x${java.lang.Long.toHexString(r.getLong(1))}"
  }

  /** Tags whose docs-side commit marker exists — the only partitions
    * any reader sees. */
  private def liveTags(spark: SparkSession, dir: String): Seq[String] = {
    ensureLive(spark, dir)
    val docs = new Path(docsPath(dir))
    val f = fs(spark, docs)
    if (!f.exists(docs)) Nil
    else f.listStatus(docs).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .filter(nm => f.exists(new Path(docs, s"$nm/$marker")))
      .map(_.stripPrefix("batch="))
  }

  /** Write one committed batch: counts partition, then the docs/ledger
    * partition, then the marker — the LAST create is the commit. */
  private def writeBatch(
      newDocs: DataFrame, textCol: String, dir: String, tag: String,
      m: Meta): Unit = {
    val spark = newDocs.sparkSession
    Spans.windowHashCounts(newDocs, textCol, m.idCol, m.n, m.kind)
      .sortWithinPartitions("hh") // dictionary/RLE-friendly runs
      .write.mode("overwrite").parquet(s"${countsPath(dir)}/batch=$tag")
    newDocs.select(m.idCol)
      .write.mode("overwrite").parquet(s"${docsPath(dir)}/batch=$tag")
    val mk = new Path(s"${docsPath(dir)}/batch=$tag/$marker")
    fs(spark, mk).create(mk, true).close()
  }

  /** Build the index from scratch as the `__base__` batch, then commit
    * the meta file. Overwrites any previous index at `dir`. */
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
    val root = new Path(dir)
    val f = fs(spark, root)
    f.delete(new Path(storePath(dir)), true)
    f.delete(prevPath(dir), true)
    f.delete(new Path(stagePath(dir)), true)
    writeBatch(docs, textCol, dir, baseTag, Meta(idCol, n, kind))
    val json =
      s"""{"id_col": "$idCol", "n": $n, "kind": "${kindName(kind)}"}"""
    val out = f.create(metaFile(dir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read the index identity. Fails if `dir` holds no committed index. */
  def meta(spark: SparkSession, dir: String): Meta = {
    val p = metaFile(dir)
    val f = fs(spark, p)
    require(f.exists(p), s"no window index at $dir (missing ${p.getName})")
    val in = f.open(p)
    val json =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    def str(k: String) = s""""$k": "([^"]*)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad index meta: missing $k")).group(1)
    def num(k: String) = s""""$k": (\\d+)""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad index meta: missing $k")).group(1).toInt
    Meta(str("id_col"), num("n"), kindOf(str("kind")))
  }

  /** The LIVE per-hash counts (hh, cnt) — possibly several rows per
    * hash (one per committed batch) until the next [[compact]].
    * Orphans of crashed writes are filtered out by tag. */
  def counts(spark: SparkSession, dir: String): DataFrame = {
    val tags = liveTags(spark, dir)
    val df = spark.read.parquet(countsPath(dir))
    (if (tags.isEmpty) df.limit(0) else df.filter(col("batch").isin(tags: _*)))
      .select("hh", "cnt")
  }

  /** The processed-docs ledger: ids of every doc whose counts are live
    * in the index — the anti-join source for delta detection (the
    * "index IS the ledger" invariant at window granularity). */
  def processedIds(spark: SparkSession, dir: String): DataFrame = {
    val m = meta(spark, dir)
    val tags = liveTags(spark, dir)
    val df = spark.read.parquet(docsPath(dir))
    (if (tags.isEmpty) df.limit(0) else df.filter(col("batch").isin(tags: _*)))
      .select(m.idCol)
  }

  /** Duplicated spans of `newDocs`, judged against batch ∪ indexed
    * corpus. Window width and hash kind come from the stored meta — a
    * probe CANNOT drift from the index's parameters. */
  def probe(newDocs: DataFrame, textCol: String, dir: String): DataFrame = {
    val m = meta(newDocs.sparkSession, dir)
    Spans.incrementalDuplicateSpans(
      newDocs, counts(newDocs.sparkSession, dir), textCol, m.idCol, m.n, m.kind)
  }

  /** Per-doc n-gram novelty of `newDocs` against the indexed corpus
    * ([[Spans.noveltyScores]]) — the data-selection read of the same
    * store the span probe uses. Window width and hash kind come from
    * the stored meta. */
  def noveltyProbe(newDocs: DataFrame, textCol: String, dir: String): DataFrame = {
    val m = meta(newDocs.sparkSession, dir)
    Spans.noveltyScores(
      newDocs, counts(newDocs.sparkSession, dir), textCol, m.idCol, m.n, m.kind)
  }

  /** Incrementally scrub `newDocs`' duplicated spans against the
    * indexed corpus ([[Spans.incrementalScrub]] — arrival-order
    * keep-first: corpus occurrences are always canonical). Parameters
    * come from the stored meta. */
  def scrubProbe(newDocs: DataFrame, textCol: String, dir: String): DataFrame = {
    val m = meta(newDocs.sparkSession, dir)
    require(m.kind == Dedup.Md5,
      "scrubbing requires the 128-bit Md5 index (xx64 is detection-grade)")
    Spans.incrementalScrub(
      newDocs, counts(newDocs.sparkSession, dir), textCol, m.idCol, m.n, m.kind)
  }

  /** Corpus n-gram statistics FROM THE INDEX ALONE — distinct grams,
    * total windows, duplicated grams, ledger doc count — the
    * metadata-only read: a 100 TB corpus answers these without a
    * corpus scan because the index already aggregated them (cost ∝
    * index size). Equals the corpus-derived numbers by construction
    * (oracle-checked). */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val c = counts(spark, dir).groupBy(col("hh")).agg(sum("cnt").as("cnt"))
    c.agg(
      count(lit(1)).as("n_distinct_grams"),
      sum(col("cnt")).as("n_windows"),
      sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
      .crossJoin(processedIds(spark, dir).agg(count(lit(1)).as("n_docs")))
  }

  /** Append `newDocs` as one committed batch so future probes see
    * them. Idempotent per doc set (deterministic tag + overwrite). */
  def append(newDocs: DataFrame, textCol: String, dir: String): Unit = {
    val spark = newDocs.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    writeBatch(newDocs, textCol, dir, batchTag(newDocs, m.idCol), m)
  }

  /** Re-aggregate the LIVE partitions to one (hh, cnt) row per hash in
    * `numFiles` hash-range-clustered files (plus the compacted ledger),
    * swapped in crash-safely (stage → rename live to prev → promote
    * stage → drop prev). Orphan partitions of crashed appends are NOT
    * carried over — compaction is also the garbage collector. Must not
    * run concurrently with an append (single-writer contract). */
  def compact(spark: SparkSession, dir: String, numFiles: Int): Unit =
    rewriteStore(spark, dir,
      counts(spark, dir).groupBy(col("hh")).agg(sum(col("cnt")).as("cnt")),
      processedIds(spark, dir), numFiles)

  /** Rewrite the whole store as ONE `__base__` batch holding
    * (`newCounts`, `newIds`), swapped in crash-safely — the shared tail
    * of [[compact]] and [[delete]]. */
  private def rewriteStore(
      spark: SparkSession, dir: String,
      newCounts: DataFrame, newIds: DataFrame, numFiles: Int): Unit = {
    ensureLive(spark, dir)
    val live = new Path(storePath(dir))
    val f = fs(spark, live)
    newCounts
      .repartitionByRange(numFiles, col("hh"))
      .sortWithinPartitions("hh")
      .write.mode("overwrite").parquet(s"${stagePath(dir)}/counts/batch=$baseTag")
    newIds
      .write.mode("overwrite").parquet(s"${stagePath(dir)}/docs/batch=$baseTag")
    val mk = new Path(s"${stagePath(dir)}/docs/batch=$baseTag/$marker")
    f.create(mk, true).close()
    f.delete(prevPath(dir), true) // leftover from an ancient crash
    require(f.rename(live, prevPath(dir)), s"rewrite: failed to retire $live")
    require(f.rename(new Path(stagePath(dir)), live),
      s"rewrite: failed to promote staged index (recoverable — " +
        s"${prevPath(dir)} holds the previous index)")
    f.delete(prevPath(dir), true)
  }

  /**
   * Remove docs from the index — the takedown / right-to-be-forgotten
   * maintenance pass at window granularity. The store holds per-hash
   * COUNTS (∝ distinct n-grams, never per-doc window rows — that
   * compression is the whole point of the design), so forgetting a doc
   * means SUBTRACTING its window-hash counts: `deletedDocs` must carry
   * the doc TEXT as indexed (a takedown request ships the content;
   * storing per-doc hashes in the index would reinstate the per-window
   * volume the counts layout exists to avoid). Cost: hash ONLY the
   * deleted docs + one store rewrite — the corpus is never re-read.
   *
   * Every deleted id must be in the ledger and its text unchanged
   * since indexing, else the subtraction would corrupt counts — the
   * ledger side is validated here (fails loudly), the text side is the
   * caller's contract (the same immutable-corpus assumption every
   * batch append already relies on). Hashes a window shares with OTHER
   * live docs keep their residual count, so a span duplicated between
   * a deleted doc and a survivor correctly stops being "duplicated"
   * only if the survivor was its sole other occurrence — equivalent to
   * a rebuild on corpus-minus-deleted (spec-pinned). Single-writer
   * contract: serialize with appends/compactions.
   */
  def delete(deletedDocs: DataFrame, textCol: String, dir: String): Unit = {
    val spark = deletedDocs.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    // A duplicated id in the takedown request would subtract that doc's
    // window counts twice, silently corrupting residuals for hashes it
    // shares with surviving docs — dedupe before hashing.
    val deduped = deletedDocs.dropDuplicates(m.idCol)
    val delIds = deduped.select(m.idCol)
    val missing = delIds.join(processedIds(spark, dir), Seq(m.idCol), "left_anti")
      .limit(1).count()
    require(missing == 0,
      s"delete: some ids are not in the index ledger at $dir — " +
        "subtracting an unindexed doc would corrupt the counts")
    val del = Spans.windowHashCounts(deduped, textCol, m.idCol, m.n, m.kind)
      .withColumnRenamed("cnt", "del_cnt")
    val remaining = counts(spark, dir)
      .groupBy(col("hh")).agg(sum(col("cnt")).as("cnt"))
      .join(del, Seq("hh"), "left_outer")
      .select(col("hh"),
        (col("cnt") - coalesce(col("del_cnt"), lit(0L))).as("cnt"))
      .filter(col("cnt") > 0)
    val liveCountFiles = {
      val it = fs(spark, new Path(countsPath(dir))).listFiles(
        new Path(countsPath(dir)), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      math.max(1, n)
    }
    rewriteStore(spark, dir, remaining,
      processedIds(spark, dir).join(broadcast(delIds), Seq(m.idCol), "left_anti"),
      liveCountFiles)
  }

  /** [[compact]] only when committed batches have fragmented the store
    * past `2 × targetFiles` counts files — the idempotent scheduled-
    * maintenance form. Returns true when a compaction ran. */
  def compactIfFragmented(spark: SparkSession, dir: String, targetFiles: Int): Boolean = {
    ensureLive(spark, dir)
    val live = new Path(countsPath(dir))
    val f = fs(spark, live)
    val it = f.listFiles(live, true)
    var nFiles = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) nFiles += 1
    }
    val fragmented = nFiles > 2 * targetFiles
    if (fragmented) compact(spark, dir, targetFiles)
    fragmented
  }

  /** The daily-batch operation: probe the CURRENT index for the new
    * batch's duplicated spans, then append the batch as one committed
    * partition pair. The spans are materialized before the append (the
    * result reflects the pre-append index), and the whole call is
    * REPLAY-SAFE: a crashed earlier attempt left only an invisible
    * orphan, which the retry overwrites. */
  def ingestBatch(newDocs: DataFrame, textCol: String, dir: String): DataFrame = {
    val spans = probe(newDocs, textCol, dir).localCheckpoint()
    append(newDocs, textCol, dir)
    spans
  }
}
