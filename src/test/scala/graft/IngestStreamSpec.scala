package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IngestStream

class IngestStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val schema = graft.schema.Metadata.structFromSpec(
    """
    c_custkey: long
    c_name: string
    c_mktsegment: string
    """)

  private def writeWave(dir: String, name: String, rows: Seq[(Long, String, String)]): Unit = {
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f)
    try rows.foreach { case (k, n, s) =>
      val nameJson = if (n == null) "null" else s""""$n""""
      w.println(s"""{"c_custkey": $k, "c_name": $nameJson, "c_mktsegment": "$s"}""")
    } finally w.close()
  }

  test("streaming ingest: clean applied, exactly-once across repeated drains, incremental on new files") {
    val base = TestSpark.tmpDir("ingest_stream")
    val src = new java.io.File(base, "landing"); src.mkdirs()
    val out = s"$base/silver"
    val ckpt = s"$base/ckpt"

    writeWave(src.getPath, "wave1.jsonl", Seq(
      (1L, "  Alice  ", "BUILDING"),
      (2L, null, "AUTOMOBILE"), // null required col -> dropped
      (3L, "Bob", "MACHINERY")))
    IngestStream.drainOnce(spark, src.getPath, schema,
      requiredCols = Seq("c_custkey", "c_name"),
      normalizeCols = Seq("c_name", "c_mktsegment"),
      outDir = out, checkpointDir = ckpt)
    val after1 = spark.read.parquet(out)
    assert(after1.count() == 2, "null-keyed row dropped")
    val alice = after1.filter(col("c_custkey") === 1).collect()(0)
    assert(alice.getAs[String]("c_name") == "alice", "trim+lower applied in-stream")
    assert(alice.getAs[String]("c_mktsegment") == "building")

    // re-drain with NO new files: exactly-once, nothing appended
    IngestStream.drainOnce(spark, src.getPath, schema,
      Seq("c_custkey", "c_name"), Seq("c_name", "c_mktsegment"), out, ckpt)
    assert(spark.read.parquet(out).count() == 2, "idempotent re-run")

    // second wave: ONLY the new file is processed
    writeWave(src.getPath, "wave2.jsonl", Seq(
      (4L, "Carol", "HOUSEHOLD"),
      (1L, "  Alice  ", "BUILDING"))) // same key again: ingest does NOT dedup
    IngestStream.drainOnce(spark, src.getPath, schema,
      Seq("c_custkey", "c_name"), Seq("c_name", "c_mktsegment"), out, ckpt)
    val after2 = spark.read.parquet(out)
    assert(after2.count() == 4, "incremental: wave1 not reprocessed, wave2 appended")
    assert(after2.filter(col("c_custkey") === 4).count() == 1)
  }

  test("the cleaned stream is narrow: no shuffle, no state in the plan") {
    val base = TestSpark.tmpDir("ingest_plan")
    val src = new java.io.File(base, "landing"); src.mkdirs()
    writeWave(src.getPath, "w.jsonl", Seq((1L, "x", "y")))
    val df = IngestStream.cleanedStream(spark, src.getPath, schema,
      Seq("c_custkey"), Seq("c_name"))
    assert(df.isStreaming)
    val plan = df.queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate") && !plan.contains("Join"),
      s"ingest must be stateless and narrow:\n$plan")
  }
}
