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

  /** Crash simulation for [[graft.io.Commits]]-versioned single-column
    * records: snapshot the current content so [[restoreVersion]] can
    * roll the record back to it (as if a later writer died before its
    * version commit — commitVersion PRUNES superseded versions, so
    * "delete the newest dir" would not reproduce that state). */
  def snapshotVersion(base: String): Seq[String] =
    graft.io.Commits.readVersioned(spark, base) match {
      case Some((_, df)) => df.collect().map(_.getString(0)).toSeq
      case None => Nil
    }

  /** Restore a record captured by [[snapshotVersion]] (drops every
    * live version, then commits the snapshot as the only one). */
  def restoreVersion(base: String, rows: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).map(_.getPath).filter(_.getName.startsWith("v="))
        .foreach(fs.delete(_, true))
    import spark.implicits._
    graft.io.Commits.commitVersion(rows.toDF("file"), base, -1)
  }
}
