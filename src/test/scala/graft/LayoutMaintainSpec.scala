package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.ZoneMap
import graft.streaming.LayoutMaintain

class LayoutMaintainSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def writeBatch(dir: String, ids: Range, sub: String): Unit =
    spark.createDataset(ids.map(_.toLong)).toDF("v")
      .withColumn("payload", col("v") * 3 % 11)
      .coalesce(1)
      .write.mode("append").parquet(s"$dir/$sub")

  test("drain stats only new files; second drain is a no-op; stats match a batch rebuild") {
    val table = TestSpark.tmpDir("layout_table")
    val stats = TestSpark.tmpDir("layout_stats") + "/s"
    val ledger = TestSpark.tmpDir("layout_ledger") + "/l"
    writeBatch(table, 0 until 50, "b0")
    val d1 = LayoutMaintain.drainStats(spark, table, stats, ledger,
      Seq("v", "payload"))
    assert(d1.count() == 1)
    val r1 = d1.collect().head
    assert(r1.getLong(1) == 50 && r1.getLong(2) == 0 && r1.getLong(3) == 49)
    // drain with nothing new appends nothing
    val d2 = LayoutMaintain.drainStats(spark, table, stats, ledger,
      Seq("v", "payload"))
    assert(d2.count() == 0)
    assert(spark.read.parquet(stats).count() == 1)
    // a second landed file is statted ALONE (cost ∝ batch)
    writeBatch(table, 100 until 140, "b1")
    val d3 = LayoutMaintain.drainStats(spark, table, stats, ledger,
      Seq("v", "payload"))
    assert(d3.count() == 1)
    val r3 = d3.collect().head
    assert(r3.getLong(1) == 40 && r3.getLong(2) == 100 && r3.getLong(3) == 139)
    // the maintained ledger equals a from-scratch batch stats build
    val maintained = spark.read.parquet(stats)
      .select("n_rows", "v_mn", "v_mx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rebuild = spark.read
      .option("recursiveFileLookup", "true").parquet(table)
      .select(input_file_name().as("file"), col("v"), col("payload"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"), min("v").as("v_mn"), max("v").as("v_mx"))
      .select("n_rows", "v_mn", "v_mx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained == rebuild)
    // and the stats serve the ZoneMap prune arithmetic directly
    val st = spark.read.parquet(stats)
      .withColumn("file_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v_mn"))))
    assert(ZoneMap.survivingFiles(st, "v", lit(120.0), lit(130.0)).size == 1)
  }

  test("crash between stats append and ledger append replays idempotently at the reader") {
    val table = TestSpark.tmpDir("layout_crash")
    val stats = TestSpark.tmpDir("layout_crash_s") + "/s"
    val ledger = TestSpark.tmpDir("layout_crash_l") + "/l"
    writeBatch(table, 0 until 30, "b0")
    LayoutMaintain.drainStats(spark, table, stats, ledger, Seq("v"))
    // simulate the crash: stats landed for b1 but the ledger write
    // was lost -> next drain re-stats b1 (duplicate stats rows)
    writeBatch(table, 50 until 80, "b1")
    LayoutMaintain.drainStats(spark, table, stats, ledger, Seq("v"))
    val lf = new org.apache.hadoop.fs.Path(ledger)
    val fs = lf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // wipe the ledger entry for b1 by truncating the whole ledger and
    // re-recording only b0's file
    val b0File = spark.read.parquet(ledger).filter(col("file").contains("/b0/"))
      .collect().map(_.getString(0))
    fs.delete(lf, true)
    spark.createDataset(b0File.toSeq).toDF("file")
      .write.mode("overwrite").parquet(ledger)
    val replay = LayoutMaintain.drainStats(spark, table, stats, ledger, Seq("v"))
    assert(replay.count() == 1, "b1 re-drains after the lost ledger append")
    // duplicate stats rows exist now — the documented contract: a
    // reader MAX-merges per file and min/max are idempotent under it
    val merged = spark.read.parquet(stats)
      .groupBy("file")
      .agg(max("n_rows").as("n_rows"), min("v_mn").as("v_mn"),
        max("v_mx").as("v_mx"))
    assert(merged.count() == 2)
    val byMin = merged.orderBy("v_mn").collect()
    assert(byMin(0).getLong(1) == 30 && byMin(1).getLong(1) == 30)
    assert(byMin(1).getLong(2) == 50 && byMin(1).getLong(3) == 79)
  }
}
