package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * S1 — page-batched bounded source (DataSourceV2), the engine-native
 * model of the reference's paginated REST ingestion
 * (`src/pipelines/breweries_fetch_bronze_notebook.py:27-66`: fixed-size
 * pages, stop-on-empty / `max_pages`, retry-with-backoff on transient
 * fetch errors). No network egress exists here, so the "API" is a local
 * JSONL fixture — but the Spark shape is the real one:
 *
 *  - ONE `InputPartition` per page ⇒ pages fetch in PARALLEL across
 *    executors (the scale-correct inversion of the reference's
 *    sequential driver-side loop, which bottlenecks at one page RTT per
 *    page and accumulates the whole dataset in driver memory);
 *  - per-page retry with exponential backoff lives INSIDE the partition
 *    reader, mirroring per-request retry (`:43-50`), with Spark task
 *    retry as the outer safety net;
 *  - planning is O(1) in the file size: a `Files.size` metadata probe
 *    (the HEAD-request analog) plus ONE bounded `probeBytes` read
 *    (default 64 KB) to estimate lines-per-byte — never a full-file
 *    line count, which would make the DRIVER read 100 TB before the
 *    first task launches. The estimate only steers parallelism; the
 *    LAST planned partition is a tail SWEEPER that keeps fetching
 *    consecutive pages until a short page (the stop-on-empty rule), so
 *    an under-estimate degrades to a longer final task instead of lost
 *    rows, and an over-estimate costs a few empty fetches. `maxPages`
 *    caps both, like the reference config
 *    (`configs/breweries_ingestion_pipeline.yml:36`).
 *
 * Output schema: `(page int, line_no long, value string)` — raw page
 * payloads; callers parse `value` with `from_json` + an enforced schema
 * so JSON decoding stays inside Catalyst codegen.
 *
 * Options: `path` (required, local JSONL file), `pageSize` (default 50),
 * `maxPages` (optional), `simulateTransientFailEvery` (test hook: first
 * fetch of every Nth page throws a retryable error), `retries` (default
 * 3), `retryDelayMs` (default 10).
 */
class PagedJsonlSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonlSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(properties.asScala.toMap)
}

object PagedJsonlSource {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** attempt counters for the simulated-transient-failure test hook,
    * keyed by (path, page); JVM-local, which is exactly the scope a
    * local[] test runs in. */
  private[graft] val fetchAttempts = new ConcurrentHashMap[(String, Int), Integer]()

  /**
   * Estimate the page count from `fileBytes` and a SINGLE bounded read
   * of at most `probeBytes` from the head of the stream: average bytes
   * per line over the sample's complete lines, extrapolated to the full
   * size. Reads nothing else — planning cost is independent of file
   * size (asserted by PagedSourceSpec with a counting stream). The
   * estimate is allowed to be wrong in either direction: the tail
   * sweeper guarantees coverage, empty fetches guarantee termination.
   */
  private[graft] def estimatePages(
      in: java.io.InputStream, fileBytes: Long, pageSize: Int,
      probeBytes: Int = 65536): Int = {
    if (fileBytes <= 0) return 0
    val buf = new Array[Byte](probeBytes)
    var read = 0
    var n = in.read(buf, 0, probeBytes)
    while (n > 0 && read + n < probeBytes) {
      read += n
      n = in.read(buf, read, probeBytes - read)
    }
    if (n > 0) read += n
    var lastNl = -1
    var newlines = 0
    var i = 0
    while (i < read) {
      if (buf(i) == '\n') { newlines += 1; lastNl = i }
      i += 1
    }
    // complete lines in the sample span [0, lastNl]; a sample with no
    // newline means lines outrun the probe — fall back to one line per
    // probe window (the sweeper absorbs the error either way)
    val avgLineBytes =
      if (newlines == 0) read.toDouble.max(1.0)
      else (lastNl + 1).toDouble / newlines
    val estLines = math.ceil(fileBytes / avgLineBytes).toLong
    math.max(1L, math.ceil(estLines.toDouble / pageSize).toLong)
      .min(Int.MaxValue.toLong).toInt
  }
}

final class PagedTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"paged_jsonl(${props.getOrElse("path", "?")})"
  override def schema(): StructType = PagedJsonlSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder {
      override def build(): Scan = new PagedScan(merged)
    }
  }
}

final class PagedScan(opts: Map[String, String]) extends Scan with Batch {
  private val path = opts.getOrElse("path",
    throw new IllegalArgumentException("paged-jsonl source requires option 'path'"))
  private val pageSize = opts.getOrElse("pageSize", "50").toInt
  private val maxPages = opts.get("maxPages").map(_.toInt)
  require(pageSize > 0, "pageSize must be positive")

  override def readSchema(): StructType = PagedJsonlSource.schema
  override def toBatch: Batch = this

  /** Driver-side "HEAD request": byte-size metadata probe + one bounded
    * sample read → page-count ESTIMATE. O(1) in the file size. The last
    * partition sweeps the tail, so the estimate never loses rows;
    * `maxPages` caps the sweep like the reference config. */
  override def planInputPartitions(): Array[InputPartition] = {
    val jpath = java.nio.file.Paths.get(path)
    val fileBytes = java.nio.file.Files.size(jpath)
    val probeBytes = opts.getOrElse("probeBytes", "65536").toInt
    val est =
      if (fileBytes == 0) 0
      else {
        val in = java.nio.file.Files.newInputStream(jpath)
        try PagedJsonlSource.estimatePages(in, fileBytes, pageSize, probeBytes)
        finally in.close()
      }
    val planned = maxPages.fold(est)(math.min(est, _))
    val sweepUntil = maxPages.getOrElse(Int.MaxValue)
    (0 until planned).map(p => PagedPartition(
      path, p, pageSize,
      // only the final partition sweeps past its own page
      sweepUntil = if (p == planned - 1) sweepUntil else p + 1,
      failEvery = opts.get("simulateTransientFailEvery").map(_.toInt).getOrElse(0),
      retries = opts.getOrElse("retries", "3").toInt,
      retryDelayMs = opts.getOrElse("retryDelayMs", "10").toLong): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PagedReader(partition.asInstanceOf[PagedPartition])
    }
}

/** `page` is the FIRST page this partition fetches; it keeps fetching
  * consecutive pages while `nextPage < sweepUntil` and the previous
  * page came back full (a short page means end-of-data — the
  * stop-on-empty rule). Non-sweeper partitions have
  * `sweepUntil = page + 1`, i.e. exactly one page. */
final case class PagedPartition(
    path: String,
    page: Int,
    pageSize: Int,
    sweepUntil: Int,
    failEvery: Int,
    retries: Int,
    retryDelayMs: Long) extends InputPartition

final class PagedReader(p: PagedPartition) extends PartitionReader[InternalRow] {

  /** One page fetch. The test hook throws a transient error on the
    * FIRST attempt of every `failEvery`-th page — the analog of a 429 /
    * connection reset. NOTE the line-skip is the local-fixture stand-in
    * for the SERVER's offset seek: in a real paginated API, fetching
    * page p is one request regardless of p. */
  private def fetchPage(page: Int): Vector[String] = {
    if (p.failEvery > 0 && page % p.failEvery == 0) {
      val attempts = PagedJsonlSource.fetchAttempts
        .merge((p.path, page), 1, (a, b) => a + b)
      if (attempts == 1)
        throw new java.io.IOException(s"simulated transient fetch error, page $page")
    }
    val s = java.nio.file.Files.lines(java.nio.file.Paths.get(p.path))
    try s.skip(page.toLong * p.pageSize).limit(p.pageSize)
      .iterator().asScala.toVector
    finally s.close()
  }

  /** Reference retry loop (`breweries_fetch_bronze_notebook.py:43-50`):
    * exponential backoff on transient errors, give up after `retries`. */
  private def fetchWithRetry(page: Int): Vector[String] = {
    var attempt = 0
    var delay = p.retryDelayMs
    while (true) {
      try return fetchPage(page)
      catch {
        case e: java.io.IOException if attempt < p.retries =>
          attempt += 1
          Thread.sleep(delay)
          delay *= 2
      }
    }
    sys.error("unreachable")
  }

  private var curPage = p.page
  private var lines = fetchWithRetry(curPage)
  private var idx = -1

  override def next(): Boolean = {
    idx += 1
    if (idx < lines.length) true
    else if (lines.length == p.pageSize && curPage + 1 < p.sweepUntil) {
      // page came back full — there may be more data; sweep forward
      curPage += 1
      lines = fetchWithRetry(curPage)
      idx = 0
      idx < lines.length
    } else false
  }

  override def get(): InternalRow =
    InternalRow(
      curPage,
      curPage.toLong * p.pageSize + idx,
      UTF8String.fromString(lines(idx)))

  override def close(): Unit = ()
}
