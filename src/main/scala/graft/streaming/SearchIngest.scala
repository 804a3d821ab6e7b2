package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Streaming maintenance of the durable positional search index — the
 * landing-zone twin of [[graft.ops.Search.upsertIndex]], built
 * MERGE-ON-READ so a drain never rewrites the standing postings:
 *
 *  - postings append under `gen=<n>` partitions (one generation per
 *    drain), written with DYNAMIC partition overwrite so a crashed
 *    drain's replay overwrites its own generation in place —
 *    idempotent, no duplicate postings;
 *  - a doc LEDGER (doc_id, text_hash, gen — ids and hashes only,
 *    never text) names each document's LIVE generation; it commits
 *    AFTER the postings, so a crash in between leaves an orphan
 *    generation the reader never sees;
 *  - [[readIndex]] joins postings against the broadcast ledger on
 *    (doc_id, gen): stale generations and orphans drop map-side — the
 *    standing index is scanned once and NEVER reshuffled (the
 *    SignatureIndex probe discipline);
 *  - delta detection is (id, text_hash) against the ledger, so a
 *    re-crawled page with CHANGED text re-indexes while unchanged
 *    re-deliveries cost nothing.
 *
 * The price of merge-on-read is dead rows accumulating across
 * generations; the compaction companion is a rewrite of live postings
 * into gen 0 (the q129/q230 planner owns when) — deliberately out of
 * this maintainer, which must stay O(drain).
 */
object SearchIngest {

  private def ledgerDir(indexDir: String) = s"$indexDir/ledger"
  private def postingsDir(indexDir: String) = s"$indexDir/postings"

  /** The live positional index: postings restricted to each doc's
    * ledger generation (broadcast semi-structure — ledger is ids-only).
    * Columns: (token, doc_id, positions, tf) + the layout's `tbucket`. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val ledger = spark.read.parquet(ledgerDir(indexDir))
      .select(col("doc_id"), col("gen"))
    spark.read.parquet(postingsDir(indexDir))
      .join(broadcast(ledger), Seq("doc_id", "gen"), "left_semi")
  }

  /**
   * Drain newly landed JSONL docs and fold them into the index.
   * Returns the number of documents (re)indexed this drain.
   */
  def maintainIndex(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      idCol: String,
      textCol: String,
      silverDir: String,
      checkpointDir: String,
      indexDir: String,
      buckets: Int = 16): Long = {
    require(buckets >= 1, "buckets must be >= 1")
    // the drain's BATCH is the silver files this drain added — an
    // append-only silver keeps every superseded version of a
    // re-crawled doc, so "delta vs ledger over ALL of silver" would
    // resurrect stale rows forever (and pay an O(silver) scan per
    // drain); the file-list diff keeps the drain O(batch)
    val silverPath = new Path(silverDir)
    val sfs = silverPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def silverFiles(): Set[String] =
      if (!sfs.exists(silverPath)) Set.empty
      else sfs.listStatus(silverPath).filter(_.isFile)
        .map(_.getPath.toString).filter(_.endsWith(".parquet")).toSet
    val before = silverFiles()
    IngestStream.drainOnce(spark, landingDir, schema,
      requiredCols = Seq(idCol, textCol), normalizeCols = Nil,
      outDir = silverDir, checkpointDir = checkpointDir)
    val fresh = (silverFiles() -- before).toSeq.sorted
    val batch =
      if (fresh.nonEmpty) spark.read.schema(schema).parquet(fresh: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // one version per doc per drain is the landing-zone contract; a
    // violating batch resolves to the max (hash, text) — deterministic
    val docs = batch.select(col(idCol).as("doc_id"),
        col(textCol).as("__text"))
      .withColumn("__h", xxhash64(col("__text")))
      .groupBy("doc_id")
      .agg(max(struct(col("__h"), col("__text"))).as("__m"))
      .select(col("doc_id"), col("__m.__text").as("__text"),
        col("__m.__h").as("__h"))
    val lPath = new Path(ledgerDir(indexDir))
    val lfs = lPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasLedger = lfs.exists(lPath)
    val ledger =
      if (hasLedger) spark.read.parquet(ledgerDir(indexDir))
      else spark.range(0).select(col("id").as("doc_id"),
        col("id").as("text_hash"), col("id").cast("int").as("gen"))
    // (id, hash) delta: new docs AND re-crawled changed text
    val delta = docs
      .join(broadcast(ledger.select(col("doc_id"),
        col("text_hash").as("__lh"))), Seq("doc_id"), "left_outer")
      .filter(col("__lh").isNull || col("__lh") =!= col("__h"))
      .select(col("doc_id"), col("__text"), col("__h"))
      .localCheckpoint() // sized ∝ the drain; feeds postings AND ledger
    val nDelta = delta.count()
    if (nDelta > 0) {
      val gen = (if (hasLedger)
        ledger.agg(max(col("gen"))).head.getInt(0) else -1) + 1
      graft.ops.Search.invertedIndex(
          delta.select(col("doc_id"), col("__text")), "__text", "doc_id")
        .withColumn("tbucket", pmod(xxhash64(col("token")), lit(buckets)))
        .withColumn("gen", lit(gen))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen", "tbucket")
        .parquet(postingsDir(indexDir))
      // ledger LAST: a crash before this point leaves gen invisible
      val newLedger = ledger
        .join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .unionByName(delta.select(col("doc_id"),
          col("__h").as("text_hash"), lit(gen).as("gen")))
        .localCheckpoint() // sever lineage from the dir being replaced
      newLedger.write.mode("overwrite").parquet(ledgerDir(indexDir))
    }
    nDelta
  }

  /**
   * Merge-on-read compaction — fold every LIVE posting into one fresh
   * generation and drop the dead ones (the executor the q230 planner
   * decides WHEN to run). Crash-safe by the same ledger-last protocol
   * as a drain: the consolidated generation is written first (a crash
   * leaves it an invisible orphan), the ledger swap makes it live
   * atomically-enough (readers join on (doc, gen) — they see either
   * all-old or all-new), and only THEN are dead generation directories
   * pruned. Cost ∝ live postings — the rewrite merge-on-read defers,
   * paid once, on schedule, instead of on every drain.
   *
   * Returns the number of generation directories pruned.
   */
  def compactIndex(spark: SparkSession, indexDir: String): Int = {
    val live = readIndex(spark, indexDir)
      .localCheckpoint() // sever lineage from the dirs being replaced
    val gen = spark.read.parquet(ledgerDir(indexDir))
      .agg(max(col("gen"))).head.getInt(0) + 1
    live.drop("gen")
      .withColumn("gen", lit(gen))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("gen", "tbucket")
      .parquet(postingsDir(indexDir))
    val ledger = spark.read.parquet(ledgerDir(indexDir))
      .select(col("doc_id"), col("text_hash"), lit(gen).as("gen"))
      .localCheckpoint()
    ledger.write.mode("overwrite").parquet(ledgerDir(indexDir))
    // dead generations are now unreachable — prune their directories
    val pPath = new Path(postingsDir(indexDir))
    val fs = pPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dead = fs.listStatus(pPath)
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("gen=") && n != s"gen=$gen"
      }
    dead.foreach(fs.delete(_, true))
    dead.length
  }
}
