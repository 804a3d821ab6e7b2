package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Web-archive landing-zone ingestion — the batch-incremental front
 * door of a crawl pipeline: fetchers land `.warc.gz` archives in a
 * directory, and each scheduled drain reads ONLY the archives that
 * have not been processed yet (cost ∝ the batch, never the corpus —
 * the [[CorpusIngest]] discipline applied to the WARC source).
 *
 * Ledger design: an append-only parquet log of processed file paths
 * (duplicate appends are harmless — the anti-join diff treats the
 * ledger as a set). The diff of listed files against the ledger is a
 * DISTRIBUTED left-anti join: a multi-year 100 TB landing zone's
 * ledger is millions of rows and never reaches the driver — only the
 * batch-∝ new-files result is collected. Why not
 * Structured Streaming's file source: SS checkpoints key on the FILE
 * format reader, and [[graft.sources.WarcSource]] is a batch
 * DataSourceV2 — a driver-listed diff against a durable ledger gives
 * the same only-new-files contract and keeps archive listing explicit
 * and testable.
 *
 * Crash safety, step by step: silver appends BEFORE the ledger
 * records the files, so
 *  - a crash after the silver append and before the ledger append
 *    re-reads those archives next drain, and the `record_id`
 *    anti-join drops every already-landed record (WARC record ids
 *    are globally unique URNs — ISO 28500 mandates it); the drain
 *    converges forward with zero duplicates;
 *  - a lost/deleted ledger degrades to a full re-read (expensive,
 *    correct): everything anti-joins away and the ledger rebuilds.
 *
 * Returns the records THIS drain appended (empty frame when nothing
 * new landed).
 */
object WarcIngest {

  private val silverSchema = StructType(Seq(
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("payload", org.apache.spark.sql.types.BinaryType, nullable = true),
    StructField("source_file", StringType, nullable = false)))

  /** Recursive listing of `.warc`/`.warc.gz` under `dir` (sorted for
    * deterministic drain order); empty when the dir does not exist. */
  private def listArchives(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val out = ArrayBuffer.empty[String]
    val stack = scala.collection.mutable.Stack(p)
    while (stack.nonEmpty) {
      fs.listStatus(stack.pop()).foreach { st =>
        if (st.isDirectory) stack.push(st.getPath)
        else if (st.getPath.getName.endsWith(".warc") ||
          st.getPath.getName.endsWith(".warc.gz")) out += st.getPath.toString
      }
    }
    out.sorted.toSeq
  }

  /** The listed archives NOT yet in the ledger, as a DISTRIBUTED
    * left-anti join: the ledger (multi-year, zone-∝) is processed by
    * executors and never collected — only this batch-∝ diff reaches
    * the driver. Catalyst picks the strategy (ledger-side broadcast
    * while the ledger is small, shuffle join once it is not — an anti
    * join never broadcasts its preserved side, so no hint is pinned). */
  private[graft] def newArchives(
      spark: SparkSession, listed: Seq[String], ledgerDir: String): DataFrame = {
    import spark.implicits._
    val ledger = spark.read.parquet(ledgerDir).select(col("file"))
    listed.toDF("file").join(ledger, Seq("file"), "left_anti")
  }

  def drainWarc(
      spark: SparkSession,
      landingDir: String,
      silverDir: String,
      ledgerDir: String): DataFrame =
    // exclusive drain claim: the drain spans two non-transactional
    // appends (silver records, then the file ledger), and two
    // CONCURRENT drains would both read the pre-append silver and
    // double-append the same records — the claim makes the second
    // drain fail visibly instead ([[graft.io.Commits.withClaim]]);
    // released on any in-process exit, so only a process crash leaves
    // it stale (named in the error; forceReleaseClaim recovers, and
    // the crash-replay path itself stays automatic via the record_id
    // anti-join below)
    graft.io.Commits.withClaim(spark, ledgerDir) {
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(d: String): Boolean = {
      val p = new Path(d); p.getFileSystem(hconf).exists(p)
    }
    // "ledger exists" = holds DATA files: the drain claim marker
    // (hidden `_` name) may have created the directory on a first drain
    def hasLedgerData: Boolean = {
      val p = new Path(ledgerDir); val fs = p.getFileSystem(hconf)
      fs.exists(p) && fs.listStatus(p).exists { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }
    val listed = listArchives(spark, landingDir)
    val newFiles: Seq[String] =
      if (listed.isEmpty) Seq.empty
      else if (hasLedgerData)
        newArchives(spark, listed, ledgerDir)
          .collect().map(_.getString(0)).sorted.toSeq
      else listed
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], silverSchema)
    if (newFiles.isEmpty) return empty

    // read ONLY the new archives — one WarcSource scan per file,
    // unioned at the PLAN level (no shuffle); record-boundary-aware
    // splits still apply within each archive
    val batch = newFiles.map { f =>
      spark.read.format("graft.sources.WarcSource").option("path", f).load()
        .select(col("record_id"), col("target_uri"), col("warc_date"),
          col("content_type"), col("payload"), col("path").as("source_file"))
    }.reduce(_ unionByName _)

    val fresh =
      (if (exists(silverDir)) {
        val seen = spark.read.schema(silverSchema).parquet(silverDir)
          .select(col("record_id"))
        batch.join(seen, Seq("record_id"), "left_anti")
      } else batch).localCheckpoint() // pin the batch: it is appended
                                      // below and then returned

    if (!fresh.isEmpty) fresh.write.mode("append").parquet(silverDir)
    // ledger append LAST (see crash-safety note in the header)
    import spark.implicits._
    newFiles.toDF("file").coalesce(1).write.mode("append").parquet(ledgerDir)
    fresh
  }
}
