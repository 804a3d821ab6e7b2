package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcIO

class WarcSourceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  private def record(i: Int, payload: Array[Byte], wtype: String = "response"): Array[Byte] =
    WarcIO.render(wtype, s"http://t.local/p/$i", "2026-01-01T00:00:00Z",
      s"<urn:test:$i>", "text/plain", payload)

  private def writeFile(dir: String, name: String, bytes: Array[Byte]): String = {
    val f = new java.io.File(dir, name)
    java.nio.file.Files.write(f.toPath, bytes)
    f.getPath
  }

  private def readWarc(path: String, opts: (String, String)*): DataFrame = {
    val base = spark.read.format("graft.sources.WarcSource").option("path", path)
    opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  // payloads chosen to break delimiter-based parsers: embedded version
  // line, embedded gzip magic, non-ASCII UTF-8, empty body
  private val trickyPayloads: Seq[Array[Byte]] = Seq(
    "plain text body".getBytes(UTF_8),
    "embedded\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n".getBytes(UTF_8),
    Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 1, 2, 3),
    "naïve café — 日本語テキスト".getBytes(UTF_8),
    Array.emptyByteArray)

  test("gzip roundtrip preserves ids, uris, headers, and exact payload bytes") {
    val dir = TestSpark.tmpDir("warc_rt")
    val bos = new ByteArrayOutputStream()
    trickyPayloads.zipWithIndex.foreach { case (pl, i) => bos.write(gzipMember(record(i, pl))) }
    writeFile(dir, "seg.warc.gz", bos.toByteArray)

    val rows = readWarc(dir)
      .select("record_id", "target_uri", "warc_type", "content_length", "payload", "headers")
      .collect()
    assert(rows.length == trickyPayloads.length)
    val byId = rows.map(r => r.getString(0) -> r).toMap
    trickyPayloads.zipWithIndex.foreach { case (pl, i) =>
      val r = byId(s"<urn:test:$i>")
      assert(r.getString(1) == s"http://t.local/p/$i")
      assert(r.getString(2) == "response")
      assert(r.getLong(3) == pl.length)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](4), pl))
      val h = r.getAs[Map[String, String]](5)
      assert(h("warc-date") == "2026-01-01T00:00:00Z")
      assert(h("content-type") == "text/plain")
    }
  }

  test("record-boundary-aware splits: small splitBytes fans out, no loss, no dup") {
    val dir = TestSpark.tmpDir("warc_split")
    val bos = new ByteArrayOutputStream()
    (0 until 200).foreach { i =>
      bos.write(gzipMember(record(i, s"body $i ${"x" * (i % 37)}".getBytes(UTF_8))))
    }
    writeFile(dir, "seg.warc.gz", bos.toByteArray)

    val df = readWarc(dir, "splitBytes" -> "2048")
    assert(df.rdd.getNumPartitions > 4, "tiny splitBytes must fan out to many partitions")
    val ids = df.select("record_id").as[String].collect().sorted
    assert(ids.length == 200, "every record in exactly one split")
    assert(ids.distinct.length == 200)
  }

  test("WarcIO distributed sink: spark-written multi-file dir reads back complete") {
    val dir = TestSpark.tmpDir("warc_sink")
    val src = spark.range(0, 137).select(
      concat(lit("http://t.local/d/"), col("id")).as("target_uri"),
      lit("2026-02-02T00:00:00Z").as("warc_date"),
      concat(lit("<urn:d:"), col("id"), lit(">")).as("record_id"),
      lit("text/plain").as("content_type"),
      encode(concat(lit("doc body "), col("id")), "UTF-8").as("payload"))
    WarcIO.writeWarc(src.repartition(5), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc.gz")) > 1)

    val back = readWarc(dir, "splitBytes" -> "1024")
      .select(regexp_extract(col("target_uri"), "d/([0-9]+)$", 1).cast("long").as("id"),
        decode(col("payload"), "UTF-8").as("body"))
    assert(back.count() == 137)
    assert(back.filter(col("body") === concat(lit("doc body "), col("id"))).count() == 137)
  }

  test("malformed gzip member: fail mode throws with offset context, skip mode re-syncs") {
    val dir = TestSpark.tmpDir("warc_bad")
    val good0 = gzipMember(record(0, "first".getBytes(UTF_8)))
    val bad = gzipMember(record(1, "corrupt-me-corrupt-me".getBytes(UTF_8)))
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x55).toByte // flip a deflate byte
    val good2 = gzipMember(record(2, "third".getBytes(UTF_8)))
    val bos = new ByteArrayOutputStream()
    bos.write(good0); bos.write(bad); bos.write(good2)
    writeFile(dir, "seg.warc.gz", bos.toByteArray)

    val e = intercept[org.apache.spark.SparkException] { readWarc(dir).collect() }
    assert(e.getMessage.contains("malformed WARC record") ||
      Option(e.getCause).exists(_.getMessage.contains("malformed WARC record")))

    val ids = readWarc(dir, "onMalformed" -> "skip")
      .select("record_id").as[String].collect().sorted
    assert(ids.toSeq == Seq("<urn:test:0>", "<urn:test:2>"))
  }

  test("plain .warc and WET conversion records read in one partition per file") {
    val dir = TestSpark.tmpDir("warc_plain")
    val bos = new ByteArrayOutputStream()
    (0 until 30).foreach { i =>
      bos.write(record(i, s"extracted text $i".getBytes(UTF_8), wtype = "conversion"))
    }
    writeFile(dir, "seg.warc", bos.toByteArray)

    val df = readWarc(dir, "splitBytes" -> "64")
    assert(df.rdd.getNumPartitions == 1, "plain WARC has no sync marker — never split")
    val rows = df.select("warc_type", "record_id").collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getString(0) == "conversion"))
  }

  test("plain malformed record: fail throws, skip re-syncs on next version line") {
    val dir = TestSpark.tmpDir("warc_plain_bad")
    val bos = new ByteArrayOutputStream()
    bos.write(record(0, "ok".getBytes(UTF_8)))
    bos.write("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: nonsense\r\n\r\n".getBytes(UTF_8))
    bos.write(record(2, "ok again".getBytes(UTF_8)))
    writeFile(dir, "seg.warc", bos.toByteArray)

    intercept[org.apache.spark.SparkException] { readWarc(dir).collect() }
    val ids = readWarc(dir, "onMalformed" -> "skip")
      .select("record_id").as[String].collect().sorted
    assert(ids.toSeq == Seq("<urn:test:0>", "<urn:test:2>"))
  }

  test("column pruning reaches the scan: payload-free projection reads a pruned schema") {
    val dir = TestSpark.tmpDir("warc_prune")
    writeFile(dir, "seg.warc.gz", gzipMember(record(0, "body".getBytes(UTF_8))))
    val plan = readWarc(dir).select("target_uri").queryExecution.executedPlan
    val scans = plan.collect { case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq }
    assert(scans == Seq(Seq("target_uri")))
  }

  test("filter pushdown: WET-only read skips response rows at the source") {
    val dir = TestSpark.tmpDir("warc_pushdown")
    val bos = new ByteArrayOutputStream()
    (0 until 12).foreach { i =>
      val t = if (i % 3 == 0) "conversion" else "response"
      bos.write(gzipMember(record(i, s"body $i".getBytes(UTF_8), wtype = t)))
    }
    writeFile(dir, "seg.warc.gz", bos.toByteArray)

    val wet = readWarc(dir).filter(col("warc_type") === "conversion")
    // the predicate reaches the scan (plan-pinned via the scan description)
    val plan = wet.queryExecution.executedPlan
    val descs = plan.collect { case b: BatchScanExec => b.scan.description() }
    assert(descs.exists(d => d.contains("pushedFilters=[") &&
      d.contains("warc_type") && d.contains("conversion")), descs.mkString("\n"))
    // and the result is exactly the conversion records
    val ids = wet.select("record_id").as[String].collect().sorted.toSeq
    assert(ids == (0 until 12).filter(_ % 3 == 0).map(i => s"<urn:test:$i>").sorted)

    // prefix pushdown on target_uri composes with the type filter
    val pre = readWarc(dir).filter(col("warc_type") === "conversion" &&
      col("target_uri").startsWith("http://t.local/p/"))
    assert(pre.count() == 4)
    // an unfiltered read is untouched (no filters pushed, all rows)
    assert(readWarc(dir).count() == 12)
    // plain (non-gzip) mode honors the same pushed filters
    val pdir = TestSpark.tmpDir("warc_pushdown_plain")
    val pbos = new ByteArrayOutputStream()
    (0 until 6).foreach { i =>
      val t = if (i % 2 == 0) "conversion" else "response"
      pbos.write(record(i, s"b$i".getBytes(UTF_8), wtype = t))
    }
    writeFile(pdir, "seg.warc", pbos.toByteArray)
    assert(readWarc(pdir).filter(col("warc_type") === "conversion").count() == 3)
  }

  test("pushed-filter veto never materializes the payload") {
    import graft.sources.{WarcParse, WarcRecord}
    val bytes = record(7, "do not copy me".getBytes(UTF_8), wtype = "response")
    var sawPayload: Array[Byte] = Array.emptyByteArray
    val r = WarcParse.parseRecordFiltered(bytes, 65536, { h: WarcRecord =>
      sawPayload = h.payload // header-only view: payload must be null here
      h.warcType == "conversion"
    })
    assert(r == Right(None))
    assert(sawPayload == null, "filter must see a header-only record")
    // and an accepted record still carries its exact payload
    val kept = WarcParse.parseRecordFiltered(bytes, 65536, _ => true)
    assert(new String(kept.toOption.get.get.payload, UTF_8) == "do not copy me")
  }

  test("truncated tail in fail mode: clean EOF is not an error, cut-off member is") {
    val dir = TestSpark.tmpDir("warc_trunc")
    val g0 = gzipMember(record(0, "whole".getBytes(UTF_8)))
    val g1 = gzipMember(record(1, "cut off".getBytes(UTF_8)))
    writeFile(dir, "seg.warc.gz", g0 ++ g1.dropRight(5))
    intercept[org.apache.spark.SparkException] { readWarc(dir).collect() }
    val ok = readWarc(dir, "onMalformed" -> "skip").select("record_id").as[String].collect()
    assert(ok.toSeq == Seq("<urn:test:0>"))
  }
}
