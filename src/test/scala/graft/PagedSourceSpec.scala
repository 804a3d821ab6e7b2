package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PagedJsonlSource

class PagedSourceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def writeFixture(n: Int): String = {
    val dir = TestSpark.tmpDir("paged_fixture")
    val f = new java.io.File(dir, "data.jsonl")
    val w = new java.io.PrintWriter(f)
    try (0 until n).foreach(i => w.println(s"""{"id": $i}"""))
    finally w.close()
    f.getPath
  }

  private def paged(path: String, extra: (String, String)*): DataFrame = {
    val base = spark.read.format("graft.sources.PagedJsonlSource")
      .option("path", path).option("pageSize", "10")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("pages partition the file: one partition per page, complete content") {
    val path = writeFixture(95)
    val df = paged(path)
    assert(df.rdd.getNumPartitions == 10, "ceil(95/10) page partitions")
    assert(df.count() == 95)
    val perPage = df.groupBy("page").count().as[(Int, Long)].collect().toMap
    assert((0 to 8).forall(perPage(_) == 10) && perPage(9) == 5)
    // line_no is the global position; value survives byte-exact
    val ids = df.select(from_json(col("value"),
      graft.schema.Metadata.structFromSpec("id: long")).getField("id").as("id"),
      col("line_no"))
    assert(ids.filter(col("id") =!= col("line_no")).count() == 0)
  }

  test("maxPages caps planning like the reference's max_pages config") {
    val path = writeFixture(95)
    val df = paged(path, "maxPages" -> "3")
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 30)
  }

  test("empty input plans zero pages (stop-on-empty)") {
    val path = writeFixture(0)
    assert(paged(path).count() == 0)
  }

  test("transient fetch errors are retried inside the page reader") {
    val path = writeFixture(40)
    PagedJsonlSource.fetchAttempts.clear()
    val df = paged(path, "simulateTransientFailEvery" -> "2", "retryDelayMs" -> "1")
    assert(df.count() == 40, "all rows despite simulated failures on pages 0 and 2")
    // pages 0 and 2 each fetched twice: the failed first attempt + retry
    val attempts = PagedJsonlSource.fetchAttempts
    assert(attempts.get((path, 0)) == 2 && attempts.get((path, 2)) == 2,
      "affected pages fetched exactly twice (fail, then successful retry)")
  }

  test("exhausted in-reader retries surface as a query failure (outer safety net)") {
    val path = writeFixture(20)
    PagedJsonlSource.fetchAttempts.clear()
    // every fetch of page 0 fails on its first attempt, and retries=0
    // gives the reader no retry budget → Spark task fails → query fails
    val df = paged(path, "simulateTransientFailEvery" -> "1", "retries" -> "0")
    val e = intercept[org.apache.spark.SparkException](df.count())
    assert(e.getMessage.contains("simulated transient fetch error") ||
      Option(e.getCause).exists(_.getMessage.contains("simulated transient fetch error")))
  }

  test("planning I/O is bounded: estimatePages reads at most probeBytes of a huge stream") {
    // a synthetic 10 GB "file" that would take minutes to line-count;
    // the counting stream proves planning touches only the probe window
    val line = """{"id": 123456789}""" + "\n"
    val lineBytes = line.getBytes("UTF-8")
    val fileBytes = 10L * 1024 * 1024 * 1024
    var served = 0L
    val endless = new java.io.InputStream {
      override def read(): Int = {
        val b = lineBytes((served % lineBytes.length).toInt)
        served += 1
        b & 0xff
      }
    }
    val probe = 65536
    val est = PagedJsonlSource.estimatePages(endless, fileBytes, pageSize = 100, probe)
    assert(served <= probe, s"planning read $served bytes (probe window $probe)")
    val actualLines = fileBytes.toDouble / lineBytes.length
    val actualPages = math.ceil(actualLines / 100).toLong
    assert(math.abs(est - actualPages).toDouble / actualPages < 0.01,
      s"est $est vs actual $actualPages")
  }

  test("under-estimated planning never loses rows: the tail sweeper reads to end-of-data") {
    // long head lines + tiny probe → the sample over-estimates bytes/line
    // → too FEW pages planned → the last partition must sweep the tail
    val dir = TestSpark.tmpDir("paged_sweep")
    val f = new java.io.File(dir, "data.jsonl")
    val w = new java.io.PrintWriter(f)
    try {
      (0 until 5).foreach(i => w.println(s"""{"id": $i, "pad": "${"x" * 200}"}"""))
      (5 until 200).foreach(i => w.println(s"""{"id": $i}"""))
    } finally w.close()
    val df = paged(f.getPath, "probeBytes" -> "256")
    assert(df.rdd.getNumPartitions < 20, "mis-estimate plans fewer partitions than pages")
    assert(df.count() == 200, "sweeper must recover the unplanned tail pages")
    // page ids stay line-index-based, identical to exact planning
    val perPage = df.groupBy("page").count().as[(Int, Long)].collect().toMap
    assert(perPage.size == 20 && (0 to 19).forall(perPage(_) == 10))
  }

  test("over-estimated planning stays correct: empty pages vanish from the output") {
    // tiny head lines + long tail → too MANY pages planned; readers past
    // end-of-data fetch empty and emit nothing
    val dir = TestSpark.tmpDir("paged_over")
    val f = new java.io.File(dir, "data.jsonl")
    val w = new java.io.PrintWriter(f)
    try {
      (0 until 20).foreach(i => w.println(s"""{"id": $i}"""))
      (20 until 95).foreach(i => w.println(s"""{"id": $i, "pad": "${"y" * 120}"}"""))
    } finally w.close()
    val df = paged(f.getPath, "probeBytes" -> "200")
    assert(df.rdd.getNumPartitions > 10, "mis-estimate plans more partitions than pages")
    assert(df.count() == 95)
    assert(df.select(countDistinct(col("page"))).as[Long].collect()(0) == 10,
      "non-empty page ids = ceil(rows/pageSize), as with exact planning")
  }

  test("filters on the page column work downstream") {
    val path = writeFixture(50)
    val one = paged(path).filter(col("page") === 2)
    assert(one.count() == 10)
    assert(one.select(min("line_no"), max("line_no")).as[(Long, Long)].collect()(0) == ((20L, 29L)))
  }
}
