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
 *  - the page count is planned from a cheap driver-side size probe (the
 *    HEAD-request analog); `maxPages` caps it like the reference config
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

  /** Driver-side "HEAD request": line count → page count. Stop-on-empty
    * becomes a planning decision (bounded source), `maxPages` caps it. */
  override def planInputPartitions(): Array[InputPartition] = {
    val lineCount = {
      val s = java.nio.file.Files.lines(java.nio.file.Paths.get(path))
      try s.count() finally s.close()
    }
    val pages = math.ceil(lineCount.toDouble / pageSize).toInt
    val planned = maxPages.fold(pages)(math.min(pages, _))
    (0 until planned).map(p => PagedPartition(
      path, p, pageSize,
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

final case class PagedPartition(
    path: String,
    page: Int,
    pageSize: Int,
    failEvery: Int,
    retries: Int,
    retryDelayMs: Long) extends InputPartition

final class PagedReader(p: PagedPartition) extends PartitionReader[InternalRow] {

  /** One page fetch. The test hook throws a transient error on the
    * FIRST attempt of every `failEvery`-th page — the analog of a 429 /
    * connection reset. */
  private def fetchPage(): Vector[String] = {
    if (p.failEvery > 0 && p.page % p.failEvery == 0) {
      val attempts = PagedJsonlSource.fetchAttempts
        .merge((p.path, p.page), 1, (a, b) => a + b)
      if (attempts == 1)
        throw new java.io.IOException(s"simulated transient fetch error, page ${p.page}")
    }
    val s = java.nio.file.Files.lines(java.nio.file.Paths.get(p.path))
    try s.skip(p.page.toLong * p.pageSize).limit(p.pageSize)
      .iterator().asScala.toVector
    finally s.close()
  }

  /** Reference retry loop (`breweries_fetch_bronze_notebook.py:43-50`):
    * exponential backoff on transient errors, give up after `retries`. */
  private def fetchWithRetry(): Vector[String] = {
    var attempt = 0
    var delay = p.retryDelayMs
    while (true) {
      try return fetchPage()
      catch {
        case e: java.io.IOException if attempt < p.retries =>
          attempt += 1
          Thread.sleep(delay)
          delay *= 2
      }
    }
    sys.error("unreachable")
  }

  private val lines = fetchWithRetry()
  private var idx = -1

  override def next(): Boolean = { idx += 1; idx < lines.length }

  override def get(): InternalRow =
    InternalRow(
      p.page,
      p.page.toLong * p.pageSize + idx,
      UTF8String.fromString(lines(idx)))

  override def close(): Unit = ()
}
