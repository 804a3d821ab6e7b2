package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for the whole suite (Spark startup is ~5 s;
  * per-suite sessions would dominate test wall-time). Mirrors the
  * driver's config: UTC, small shuffle partitioning, UI off. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // SQL fragments under test compile to graft_* kernel calls
    graft.functions.GraftFunctions.register(s)
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  def table(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def tmpDir(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_test_$name")
    p.toFile.deleteOnExit()
    p.toString
  }
}
