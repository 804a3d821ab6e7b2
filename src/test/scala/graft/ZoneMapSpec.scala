package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.ZoneMap

class ZoneMapSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("rangeFileId: closed-form bins, edge clamps, constant-domain collapse") {
    val df = Seq(0.0, 2.5, 5.0, 9.999, 10.0).toDF("v")
      .crossJoin(Seq((0.0, 10.0)).toDF("lo", "hi"))
      .select(ZoneMap.rangeFileId(col("v"), col("lo"), col("hi"), 4).as("f"))
    // width 10 / 4 files: [0,2.5) -> 0, [2.5,5) -> 1, ...; v == hi clamps
    // into the top file instead of falling off the end
    assert(df.as[Int].collect().toSeq == Seq(0, 1, 2, 3, 3))
    val const = Seq(7.0, 7.0).toDF("v")
      .crossJoin(Seq((7.0, 7.0)).toDF("lo", "hi"))
      .select(ZoneMap.rangeFileId(col("v"), col("lo"), col("hi"), 4).as("f"))
    assert(const.as[Int].collect().toSeq == Seq(0, 0), "width-0 domain -> file 0")
  }

  test("assignFiles + stats: per-file zones are exact and disjoint on the clustered column") {
    val df = spark.range(0, 100).select(col("id").cast("double").as("v"),
      (col("id") % 7).as("other"))
    val withF = ZoneMap.assignFiles(df, col("v"), nFiles = 10)
    val st = ZoneMap.stats(withF, "file_id", Seq("v", "other"))
      .orderBy("file_id").collect()
    assert(st.length == 10)
    st.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i)
      assert(r.getLong(1) == 10, "uniform data -> 10 rows per file")
      // clustered column: tight disjoint zones [10i, 10i+9]
      assert(r.getDouble(2) == 10.0 * i && r.getDouble(3) == 10.0 * i + 9)
      // uncorrelated column: every zone spans ~the whole domain
      assert(r.getLong(4) <= 2 && r.getLong(5) >= 5)
    }
  }

  test("prunedFlag + survivingFiles: clustered predicate prunes, uncorrelated one cannot") {
    val df = spark.range(0, 100).select(col("id").cast("double").as("v"),
      (col("id") % 7).cast("double").as("other"))
    val st = ZoneMap.stats(
      ZoneMap.assignFiles(df, col("v"), nFiles = 10), "file_id",
      Seq("v", "other"))
    // v in [42, 58] touches zones [40,49] and [50,59] only
    assert(ZoneMap.survivingFiles(st, "v", lit(42.0), lit(58.0)) == Seq(4, 5))
    // the uncorrelated column's zones all span [0,6] -> nothing prunes
    assert(ZoneMap.survivingFiles(st, "other", lit(3.0), lit(3.0)) ==
      (0 until 10))
    // an out-of-domain range prunes everything
    assert(ZoneMap.survivingFiles(st, "v", lit(500.0), lit(600.0)).isEmpty)
  }

  test("readPruned: skips non-surviving files at PLANNING time and returns the exact filter result") {
    val dir = TestSpark.tmpDir("zonemap_read")
    val df = spark.range(0, 200).select(col("id").cast("double").as("v"),
      (col("id") * 3 % 11).as("payload"))
    val withF = ZoneMap.assignFiles(df, col("v"), nFiles = 8)
    withF.write.mode("overwrite").partitionBy("file_id").parquet(dir)
    val st = ZoneMap.stats(withF, "file_id", Seq("v"))
    val pruned = ZoneMap.readPruned(spark, dir, st, "v", lit(30.0), lit(60.0))
    // correctness: identical rows to the unpruned filter
    val expected = df.filter(col("v").between(30.0, 60.0))
      .select("v", "payload").collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    val got = pruned.select("v", "payload")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(got == expected)
    // the skip happens at planning time: the isin lands in
    // PartitionFilters (directory pruning), not post-scan DataFilters
    val scanExec = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scanExec.toString).map(_.group(1)).getOrElse("")
    assert(pf.contains("file_id"),
      s"expected file_id in PartitionFilters:\n$scanExec")
    // and the skip is real: the executed scan opened only the files of
    // the 2 surviving zones ([30,60] touches bins 1 and 2 of the
    // 8×~25-wide layout), strictly fewer than the full directory
    pruned.collect()
    val readFiles = scanExec.metrics("numFiles").value
    val full = spark.read.parquet(dir)
    val fullScan = full.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head
    full.collect()
    assert(readFiles < fullScan.metrics("numFiles").value,
      s"pruned scan read $readFiles files, full scan " +
        s"${fullScan.metrics("numFiles").value}")
  }

  test("compactionPlan: running-sum bins respect the target; zone order preserved; per-partition scope") {
    val stats = Seq(
      // (partition, zone floor, rows)
      ("p1", 0.0, 600L), ("p1", 1.0, 600L), ("p1", 2.0, 600L),
      ("p1", 3.0, 600L), ("p1", 4.0, 1500L),
      ("p2", 0.0, 100L)
    ).toDF("part", "mn", "n_rows")
    val got = ZoneMap.compactionPlan(stats, "mn", "n_rows",
        targetRows = 1000L, partitionCols = Seq("part"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // p1 cums: 600,1200,1800,2400,3900 -> bins floor((cum-rows)/1000):
    // 0,0,1,1,2 — files stay in zone order inside each bin
    assert(got(("p1", 0L)) == ((2L, 1200L)))
    assert(got(("p1", 1L)) == ((2L, 1200L)))
    assert(got(("p1", 2L)) == ((1L, 1500L)))
    // p2 plans independently (its own running sum)
    assert(got(("p2", 0L)) == ((1L, 100L)))
    intercept[IllegalArgumentException] {
      ZoneMap.compactionPlan(stats, "mn", "n_rows", targetRows = 0L)
    }
  }

  test("stats rejects an empty tracked-column list; assignFiles rejects nFiles < 1") {
    val df = spark.range(3).select(col("id").cast("double").as("v"))
    intercept[IllegalArgumentException] {
      ZoneMap.stats(df.withColumn("file_id", lit(0)), "file_id", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      ZoneMap.rangeFileId(col("v"), lit(0.0), lit(1.0), 0)
    }
  }

  test("skipRateReport: clustered layout skips, scattered layout opens") {
    import TestSpark.spark
    import spark.implicits._
    val df = (1L to 64L).toDF("v")
      .withColumn("scatter", (col("v") * 37) % 64)
    val r = ZoneMap.skipRateReport(df,
      layoutA = col("v"), layoutB = col("scatter"),
      valueCol = "v", nFiles = 8, predicates = Seq((1.0, 8.0)))
      .head
    // layout A: 8-wide contiguous zones — only file 0 overlaps [1, 8]
    assert(r.getLong(2) == 8L)            // files_a
    assert(r.getLong(3) == 1L)            // open_a
    assert(r.getDouble(4) == 0.875)       // skip_rate_a
    // scattered layout: wide zones, most files open, skip rate lower
    assert(r.getLong(6) > r.getLong(3))   // open_b > open_a
    assert(r.getDouble(7) < r.getDouble(4))
    intercept[IllegalArgumentException] {
      ZoneMap.skipRateReport(df, col("v"), col("v"), "v", 8, Seq.empty)
    }
  }
}
