package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental zone-map maintenance — how a lakehouse actually keeps
 * the [[graft.io.ZoneMap]] file-stats index current: data files keep
 * landing in a table directory, and each scheduled drain computes
 * per-file min/max stats FOR THE NEW FILES ONLY and appends them to a
 * durable stats ledger (the Delta/Iceberg txn-log stats pattern,
 * maintained at ingest instead of rebuilt by scans).
 *
 * Mechanics mirror [[WarcIngest]]'s drain contract exactly:
 *  - the diff of listed data files against the ledger is a DISTRIBUTED
 *    left-anti join (a multi-year zone's ledger never reaches the
 *    driver; only the batch-∝ new-file list is collected);
 *  - stats append BEFORE the ledger records the files, so a crash
 *    between the two re-reads those files next drain and the ledger
 *    diff — keyed on the file path — keeps the replay idempotent at
 *    the consumer (readers MAX-merge duplicate stats rows per file;
 *    min/max are idempotent under re-aggregation, which is why zone
 *    maps tolerate at-least-once maintenance where row counts would
 *    not);
 *  - a lost ledger degrades to a full stats rebuild (expensive,
 *    correct).
 *
 * Stats are computed with `input_file_name()` grouping over a scan
 * RESTRICTED to the new files (one narrow read of the batch, zero
 * shuffle beyond the |new files|-row aggregation).
 *
 * Returns the stats rows THIS drain appended (empty when nothing new).
 */
object LayoutMaintain {

  /** Recursive listing of `.parquet` data files under `dir` (sorted
    * for deterministic drain order); empty when absent. */
  private def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val stack = scala.collection.mutable.Stack(p)
    while (stack.nonEmpty) {
      fs.listStatus(stack.pop()).foreach { st =>
        if (st.isDirectory) stack.push(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) out += st.getPath.toString
      }
    }
    out.sorted.toSeq
  }

  /** Listed files NOT yet in the ledger — distributed anti-join; only
    * the batch-∝ diff is collected. */
  private[graft] def newFiles(
      spark: SparkSession, listed: Seq[String], ledgerDir: String): DataFrame = {
    import spark.implicits._
    val ledger = spark.read.parquet(ledgerDir).select(col("file"))
    listed.toDF("file").join(ledger, Seq("file"), "left_anti")
  }

  /**
   * One drain: stat the new files of `tableDir` over `cols`, append to
   * `statsDir`, then record the files in `ledgerDir`.
   * Stats schema: (file, n_rows, `<c>_mn`, `<c>_mx` per tracked col).
   */
  def drainStats(
      spark: SparkSession,
      tableDir: String,
      statsDir: String,
      ledgerDir: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one tracked column")
    // exclusive drain claim (the WarcIngest discipline): two in-flight
    // drains would both read the pre-append ledger and double-append
    // the same stats rows — readers DO max-merge (min/max tolerate
    // at-least-once), but a concurrent drain is an operator error that
    // should fail visibly, not dilute silently into duplicate rows
    graft.io.Commits.withClaim(spark, ledgerDir) {
    val hconf = spark.sparkContext.hadoopConfiguration
    // "ledger exists" = holds DATA files: the drain claim marker
    // (hidden `_` name) creates the directory on a first drain
    def hasLedgerData: Boolean = {
      val p = new Path(ledgerDir); val fs = p.getFileSystem(hconf)
      fs.exists(p) && fs.listStatus(p).exists { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }
    val listed = listDataFiles(spark, tableDir)
    val batch: Seq[String] =
      if (listed.isEmpty) Seq.empty
      else if (hasLedgerData)
        newFiles(spark, listed, ledgerDir)
          .collect().map(_.getString(0)).sorted.toSeq
      else listed
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_mn"), max(col(c)).as(s"${c}_mx")))
    if (batch.isEmpty) {
      // schema-stable empty frame: stat a zero-row slice of the table
      if (listed.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(listed.head).limit(0)
        .select(lit("").as("file") +: cols.map(col): _*)
        .groupBy("file").agg(aggs.head, aggs.tail: _*).limit(0)
    } else {
      val stats = spark.read.parquet(batch: _*)
        .select(input_file_name().as("file") +: cols.map(col): _*)
        .groupBy("file")
        .agg(aggs.head, aggs.tail: _*)
        .localCheckpoint() // stats append + return; never recompute
      stats.write.mode("append").parquet(statsDir)
      import spark.implicits._
      batch.toDF("file").write.mode("append").parquet(ledgerDir)
      stats
    }
  } }
}
