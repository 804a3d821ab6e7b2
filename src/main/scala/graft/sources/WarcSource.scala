package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * WARC/WET web-archive source (DataSourceV2) — the Common-Crawl-shaped
 * ingestion format an LLM data pipeline reads before any of the corpus
 * operators run. Format per ISO 28500: a record is a `WARC/1.0` version
 * line, named headers, a blank line, then `Content-Length` payload
 * bytes; WET "conversion" records are the same container with extracted
 * text payloads, so one reader serves both. (The reference has no web
 * ingestion at all — its only source is a paginated JSON API,
 * `src/pipelines/breweries_fetch_bronze_notebook.py:27-66` — so this is
 * north-star surface beyond reference scope, second DataSourceV2 beside
 * [[PagedJsonlSource]].)
 *
 * Scale design:
 *  - **Record-boundary-aware splits.** Archive convention (and this
 *    source's sink, [[WarcIO]]) gzips each record as its OWN gzip
 *    member, so a reader can start mid-file: seek to the split offset,
 *    scan for the next gzip magic, and VALIDATE the candidate by
 *    decoding the member (CRC32 + ISIZE from the trailer, then the
 *    `WARC/` version line) — a magic triplet inside compressed data
 *    fails validation and the scan continues. Each split owns records
 *    whose member starts in `[start, end)`; the reader past `end`
 *    stops, the next split syncs forward, so every record lands in
 *    exactly one partition with no coordination. A 100 GB .warc.gz
 *    therefore fans out to ~800 parallel tasks instead of one.
 *  - **Planning is metadata-only**: one `listStatus` per directory,
 *    `ceil(len / splitBytes)` ranges per file — the driver never opens
 *    a data file.
 *  - **Streaming, bounded memory.** The reader holds a sliding
 *    [[ByteWindow]] over the open split — memory is proportional to
 *    ONE record (capped by `maxRecordBytes`, default 256 MiB), never
 *    to the split.
 *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): a query
 *    that reads only `target_uri` never materializes payload bytes or
 *    the header map into rows (decompression still runs — member
 *    boundaries require it — but allocation doesn't).
 *  - **Malformed records**: `onMalformed=fail` (default) throws with
 *    file/offset context the moment a SYNCED record fails to decode;
 *    `onMalformed=skip` drops the record and re-syncs on the next
 *    valid member, so one corrupt crawl segment cannot kill a 100 TB
 *    backfill. During initial split sync, failures are never errors —
 *    they are false-positive magic bytes.
 *
 * Uncompressed `.warc` files are read too, but as ONE partition per
 * file: plain WARC has no validatable sync marker (`WARC/1.0` can
 * legally appear inside a payload), so mid-file starts would risk
 * misparses. This mirrors how Hadoop treats non-splittable codecs.
 *
 * Options: `path` (file or directory of `.warc` / `.warc.gz`),
 * `splitBytes` (default 128 MiB; gzip files only), `compression`
 * (`auto` by extension | `gzip` | `none`), `onMalformed`
 * (`fail` | `skip`), `maxRecordBytes`, `maxHeaderBytes`.
 *
 * Output schema: `(path, offset, record_id, warc_type, target_uri,
 * warc_date, content_type, content_length, headers map, payload
 * binary)`. Callers decode text payloads with `decode(payload,
 * 'UTF-8')` so charset handling stays inside Catalyst codegen.
 */
class WarcSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
}

object WarcSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("headers", MapType(StringType, StringType, valueContainsNull = true),
      nullable = false),
    StructField("payload", BinaryType, nullable = false)))
}

final class WarcTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"warc(${props.getOrElse("path", "?")})"
  override def schema(): StructType = WarcSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala
    new ScanBuilder with SupportsPushDownRequiredColumns
        with SupportsPushDownFilters {
      private var required: StructType = WarcSource.schema
      private var accepted: Array[org.apache.spark.sql.sources.Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit = {
        // Spark may prune to zero columns (count(*)); keep the struct as-is.
        required = requiredSchema
      }
      override def pushFilters(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        accepted = filters.filter(f => WarcFilters.compile(f).isDefined)
        // conservative contract: EVERYTHING stays a Spark-side residual,
        // so source-side evaluation can only skip rows Spark would drop
        filters
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
        accepted
      override def build(): Scan =
        new WarcScan(merged, required, accepted.flatMap(WarcFilters.compile).toSeq)
    }
  }
}

final class WarcScan(
    opts: Map[String, String], required: StructType,
    pushed: Seq[WarcFilters.Pushed] = Seq.empty)
    extends Scan with Batch {
  private val path = opts.getOrElse("path",
    throw new IllegalArgumentException("warc source requires option 'path'"))
  private val splitBytes = opts.getOrElse("splitBytes", (128L * 1024 * 1024).toString).toLong
  private val compression = opts.getOrElse("compression", "auto")
  private val onMalformedSkip = opts.getOrElse("onMalformed", "fail") match {
    case "fail" => false
    case "skip" => true
    case other => throw new IllegalArgumentException(
      s"onMalformed must be 'fail' or 'skip', got '$other'")
  }
  private val maxRecordBytes = opts.getOrElse("maxRecordBytes", (256L * 1024 * 1024).toString).toLong
  private val maxHeaderBytes = opts.getOrElse("maxHeaderBytes", "65536").toInt
  require(splitBytes > 0, "splitBytes must be positive")

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** Surface the pushed predicates in `.explain` (plan-pinnable). */
  override def description(): String =
    s"graft.WarcScan(path=$path, " +
      s"pushedFilters=[${pushed.mkString(", ")}])"

  /** Metadata-only planning: list files, carve byte ranges. */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    require(fs.exists(p), s"warc source: path $path does not exist")
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile)
          .filter(f => f.getPath.getName.endsWith(".warc") ||
            f.getPath.getName.endsWith(".warc.gz"))
          .sortBy(_.getPath.getName)
      else Array(fs.getFileStatus(p))
    require(files.nonEmpty, s"warc source: no .warc/.warc.gz files under $path")
    files.flatMap { f =>
      val gz = compression match {
        case "gzip" => true
        case "none" => false
        case _ => f.getPath.getName.endsWith(".gz")
      }
      val len = f.getLen
      if (len == 0) Nil
      else if (!gz)
        // plain WARC: no validatable sync marker → whole file, one task
        Seq(WarcPartition(f.getPath.toString, 0L, len, gzip = false,
          onMalformedSkip, maxRecordBytes, maxHeaderBytes, pushed))
      else {
        val n = math.max(1L, math.ceil(len.toDouble / splitBytes).toLong)
        (0L until n).map { i =>
          WarcPartition(f.getPath.toString, i * splitBytes,
            math.min(len, (i + 1) * splitBytes), gzip = true,
            onMalformedSkip, maxRecordBytes, maxHeaderBytes, pushed)
        }
      }
    }.map(identity[InputPartition])
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val schema = required
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new WarcReader(partition.asInstanceOf[WarcPartition], schema)
    }
  }
}

final case class WarcPartition(
    path: String,
    start: Long,
    end: Long,
    gzip: Boolean,
    onMalformedSkip: Boolean,
    maxRecordBytes: Long,
    maxHeaderBytes: Int,
    filters: Seq[WarcFilters.Pushed] = Seq.empty) extends InputPartition

/** One parsed record. Header names are lowercased (WARC headers are
  * case-insensitive); `headers` preserves arrival order. */
final case class WarcRecord(
    recordId: String,
    warcType: String,
    targetUri: String,
    warcDate: String,
    contentType: String,
    contentLength: Long,
    headers: Seq[(String, String)],
    payload: Array[Byte])

/**
 * Sliding byte window over an InputStream: random access by ABSOLUTE
 * offset within the not-yet-released range, loading lazily in chunks.
 * `release(abs)` drops everything below `abs`, so reader memory is
 * bounded by one record, not one split.
 */
private[sources] final class ByteWindow(in: java.io.InputStream, origin: Long) {
  private var buf = new Array[Byte](1 << 16)
  private var start = 0
  private var len = 0
  private var base = origin
  private var eof = false

  /** Bytes actually available at [abs, abs+n) after loading (≤ n at EOF). */
  def available(abs: Long, n: Int): Int = {
    require(abs >= base, s"offset $abs below released window base $base")
    val need = (abs - base) + n
    require(need <= Int.MaxValue, "window request too large")
    while (len < need && !eof) {
      if (start + len == buf.length) {
        if (start > buf.length / 2) {
          System.arraycopy(buf, start, buf, 0, len); start = 0
        } else {
          val nb = new Array[Byte](buf.length * 2)
          System.arraycopy(buf, start, nb, 0, len); buf = nb; start = 0
        }
      }
      val r = in.read(buf, start + len, buf.length - start - len)
      if (r < 0) eof = true else len += r
    }
    math.max(0, math.min(n.toLong, len - (abs - base)).toInt)
  }

  /** Unsigned byte at `abs`, or -1 past EOF. */
  def get(abs: Long): Int =
    if (available(abs, 1) < 1) -1 else buf(start + (abs - base).toInt) & 0xff

  def slice(abs: Long, n: Int): Array[Byte] = {
    val got = available(abs, n)
    require(got == n, s"short read at $abs: wanted $n, got $got")
    val off = start + (abs - base).toInt
    java.util.Arrays.copyOfRange(buf, off, off + n)
  }

  /** Drop all bytes below `abs`; subsequent access below it is an error. */
  def release(abs: Long): Unit = if (abs > base) {
    val d = math.min(abs - base, len.toLong).toInt
    start += d; len -= d; base += d
    // if released past loaded data (seek-free skip), base lags; load-and-drop
    while (base < abs && !eof) {
      val got = available(base, math.min(1 << 16, (abs - base).min(Int.MaxValue.toLong).toInt))
      if (got == 0) return
      val dd = math.min(got.toLong, abs - base).toInt
      start += dd; len -= dd; base += dd
    }
  }
}

/** Minimal single-member gzip decoder with exact byte accounting —
  * `java.util.zip.GZIPInputStream` hides member boundaries behind its
  * own buffering, but split planning needs the compressed END offset of
  * each member. Validates the RFC 1952 trailer (CRC32 + ISIZE), which
  * is what lets a false-positive magic inside compressed data be told
  * apart from a real member start. */
private[sources] object GzipMember {
  /** Decode ONE member at absolute offset `off`.
    * Right((payload, nextOffset)) or Left(reason). */
  def decode(w: ByteWindow, off: Long, maxOut: Long): Either[String, (Array[Byte], Long)] = {
    if (w.available(off, 10) < 10) return Left("truncated gzip header")
    if (w.get(off) != 0x1f || w.get(off + 1) != 0x8b || w.get(off + 2) != 8)
      return Left("bad gzip magic/method")
    val flg = w.get(off + 3)
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (w.available(p, 2) < 2) return Left("truncated FEXTRA")
      p += 2 + (w.get(p) | (w.get(p + 1) << 8))
    }
    if ((flg & 8) != 0) { // FNAME, zero-terminated
      var b = w.get(p)
      while (b > 0) { p += 1; b = w.get(p) }
      if (b < 0) return Left("truncated FNAME")
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      var b = w.get(p)
      while (b > 0) { p += 1; b = w.get(p) }
      if (b < 0) return Left("truncated FCOMMENT")
      p += 1
    }
    if ((flg & 2) != 0) p += 2 // FHCRC

    val inf = new java.util.zip.Inflater(true)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val crc = new java.util.zip.CRC32()
      val outBuf = new Array[Byte](8192)
      var fed = 0L
      while (!inf.finished()) {
        val n =
          try inf.inflate(outBuf)
          catch {
            case e: java.util.zip.DataFormatException =>
              return Left(s"corrupt deflate: ${e.getMessage}")
          }
        if (n > 0) {
          out.write(outBuf, 0, n)
          crc.update(outBuf, 0, n)
          if (out.size() > maxOut) return Left(s"record exceeds maxRecordBytes=$maxOut")
        } else if (!inf.finished()) {
          if (!inf.needsInput()) return Left("deflate stalled (dictionary?)")
          val avail = w.available(p + fed, 8192)
          if (avail == 0) return Left("truncated deflate stream")
          inf.setInput(w.slice(p + fed, avail))
          fed += avail
        }
      }
      val trailerOff = p + (fed - inf.getRemaining)
      if (w.available(trailerOff, 8) < 8) return Left("truncated gzip trailer")
      def le32(o: Long): Long =
        (w.get(o) | (w.get(o + 1) << 8) | (w.get(o + 2) << 16) |
          (w.get(o + 3).toLong << 24)) & 0xffffffffL
      if (le32(trailerOff) != crc.getValue) return Left("gzip CRC mismatch")
      if (le32(trailerOff + 4) != (out.size().toLong & 0xffffffffL))
        return Left("gzip ISIZE mismatch")
      Right((out.toByteArray, trailerOff + 8))
    } finally inf.end()
  }
}

/**
 * Pushed-filter support ([[SupportsPushDownFilters]]): header-level
 * predicates on the string columns evaluate after header parse and
 * BEFORE payload materialization, so a WET-only read
 * (`warc_type = 'conversion'`) over a mixed crawl archive never
 * allocates response payload bytes or rows (decompression still runs —
 * gzip-member boundaries require it). Pushdown is best-effort and
 * CONSERVATIVE: every filter is also kept as a Spark-side residual
 * (`pushFilters` returns its full input), so source-side evaluation can
 * only skip rows the filter would drop anyway.
 */
private[sources] object WarcFilters {
  import org.apache.spark.sql.sources._

  /** Columns a header predicate can see without touching the payload. */
  private val headerCols =
    Set("record_id", "warc_type", "target_uri", "warc_date", "content_type")

  private def field(r: WarcRecord, col: String): String = col match {
    case "record_id" => r.recordId
    case "warc_type" => r.warcType
    case "target_uri" => r.targetUri
    case "warc_date" => r.warcDate
    case "content_type" => r.contentType
    case _ => null
  }

  sealed trait Pushed extends Serializable { def eval(r: WarcRecord): Boolean }
  private final case class PEq(col: String, v: String) extends Pushed {
    def eval(r: WarcRecord): Boolean = { val f = field(r, col); f != null && f == v }
  }
  private final case class PStarts(col: String, v: String) extends Pushed {
    def eval(r: WarcRecord): Boolean = {
      val f = field(r, col); f != null && f.startsWith(v)
    }
  }
  private final case class PIn(col: String, vs: Array[String]) extends Pushed {
    def eval(r: WarcRecord): Boolean = {
      val f = field(r, col); f != null && vs.contains(f)
    }
  }
  private final case class PNotNull(col: String) extends Pushed {
    def eval(r: WarcRecord): Boolean = field(r, col) != null
  }

  /** Compile one Spark filter; None = not pushable (stays Spark-only). */
  def compile(f: Filter): Option[Pushed] = f match {
    case EqualTo(c, v: String) if headerCols(c) => Some(PEq(c, v))
    case StringStartsWith(c, v) if headerCols(c) => Some(PStarts(c, v))
    case In(c, vs) if headerCols(c) && vs.forall(_.isInstanceOf[String]) =>
      Some(PIn(c, vs.map(_.asInstanceOf[String])))
    case IsNotNull(c) if headerCols(c) => Some(PNotNull(c))
    case _ => None
  }
}

private[graft] object WarcParse {
  /** Parse one record from a fully-decoded member: headers first, then
    * `keep` on the header-only record — a vetoed record returns
    * Right(None) WITHOUT allocating its payload copy. */
  def parseRecordFiltered(
      bytes: Array[Byte], maxHeaderBytes: Int,
      keep: WarcRecord => Boolean): Either[String, Option[WarcRecord]] =
    parseRecordImpl(bytes, maxHeaderBytes, keep)

  /** Parse one record from a fully-decoded member. */
  def parseRecord(bytes: Array[Byte], maxHeaderBytes: Int): Either[String, WarcRecord] =
    parseRecordImpl(bytes, maxHeaderBytes, _ => true).map(_.get)

  private def parseRecordImpl(
      bytes: Array[Byte], maxHeaderBytes: Int,
      keep: WarcRecord => Boolean): Either[String, Option[WarcRecord]] = {
    if (bytes.length < 8 || !startsWith(bytes, 0, "WARC/"))
      return Left("missing WARC/ version line")
    val headerEnd = indexOf(bytes, 0, math.min(bytes.length, maxHeaderBytes), "\r\n\r\n")
    if (headerEnd < 0) return Left(s"no header terminator within $maxHeaderBytes bytes")
    val headerText = new String(bytes, 0, headerEnd, java.nio.charset.StandardCharsets.UTF_8)
    val lines = headerText.split("\r\n", -1)
    if (!lines(0).startsWith("WARC/1.") && !lines(0).startsWith("WARC/0."))
      return Left(s"unsupported WARC version '${lines(0).take(16)}'")
    val headers = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 1
    while (i < lines.length) {
      val line = lines(i)
      val colon = line.indexOf(':')
      if (colon <= 0) return Left(s"malformed header line '${line.take(40)}'")
      headers += ((line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT),
        line.substring(colon + 1).trim))
      i += 1
    }
    val hmap = headers.toMap
    val clen = hmap.get("content-length") match {
      case None => return Left("missing Content-Length")
      case Some(s) =>
        try s.toLong
        catch { case _: NumberFormatException => return Left(s"bad Content-Length '$s'") }
    }
    val bodyStart = headerEnd + 4
    if (clen < 0 || bodyStart + clen > bytes.length)
      return Left(s"payload truncated: Content-Length=$clen, ${bytes.length - bodyStart} available")
    val headerOnly = WarcRecord(
      recordId = hmap.getOrElse("warc-record-id", null),
      warcType = hmap.getOrElse("warc-type", null),
      targetUri = hmap.getOrElse("warc-target-uri", null),
      warcDate = hmap.getOrElse("warc-date", null),
      contentType = hmap.getOrElse("content-type", null),
      contentLength = clen,
      headers = headers.toSeq,
      payload = null)
    if (!keep(headerOnly)) Right(None)
    else Right(Some(headerOnly.copy(
      payload = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + clen.toInt))))
  }

  def startsWith(bytes: Array[Byte], off: Int, s: String): Boolean = {
    if (off + s.length > bytes.length) return false
    var i = 0
    while (i < s.length) {
      if (bytes(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  def indexOf(bytes: Array[Byte], from: Int, until: Int, pat: String): Int = {
    val p = pat.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = from
    val last = math.min(until, bytes.length) - p.length
    while (i <= last) {
      var j = 0
      while (j < p.length && bytes(i + j) == p(j)) j += 1
      if (j == p.length) return i
      i += 1
    }
    -1
  }
}

final class WarcReader(p: WarcPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  import WarcParse._

  private val hPath = new Path(p.path)
  private val in = hPath.getFileSystem(new Configuration()).open(hPath)
  in.seek(p.start)
  private val w = new ByteWindow(in, p.start)

  private var pos = p.start
  private var synced = p.start == 0L // offset 0 is a boundary by definition
  private var current: WarcRecord = _
  private var curOffset = 0L

  // required-column extractors resolved once, not per row
  private val fieldBuilders: Array[WarcRecord => Any] = required.fields.map { f =>
    val utf8 = (s: String) => if (s == null) null else UTF8String.fromString(s)
    f.name match {
      case "path" =>
        val v = UTF8String.fromString(p.path); (_: WarcRecord) => v
      case "offset" => (_: WarcRecord) => curOffset
      case "record_id" => (r: WarcRecord) => utf8(r.recordId)
      case "warc_type" => (r: WarcRecord) => utf8(r.warcType)
      case "target_uri" => (r: WarcRecord) => utf8(r.targetUri)
      case "warc_date" => (r: WarcRecord) => utf8(r.warcDate)
      case "content_type" => (r: WarcRecord) => utf8(r.contentType)
      case "content_length" => (r: WarcRecord) => r.contentLength
      case "headers" => (r: WarcRecord) =>
        new ArrayBasedMapData(
          new GenericArrayData(r.headers.map(h => utf8(h._1)).toArray[Any]),
          new GenericArrayData(r.headers.map(h => utf8(h._2)).toArray[Any]))
      case "payload" => (r: WarcRecord) => r.payload
      case other => sys.error(s"unknown warc column $other")
    }
  }

  /** Conjunction of the pushed header filters (true when none). */
  private val keepPred: WarcRecord => Boolean =
    if (p.filters.isEmpty) (_ => true)
    else r => p.filters.forall(_.eval(r))

  override def next(): Boolean = if (p.gzip) nextGzip() else nextPlain()

  /** Scan for the 1f 8b 08 member magic from `from`; -1 past EOF. */
  private def scanMagic(from: Long): Long = {
    var i = from
    var b = w.get(i)
    while (b >= 0) {
      if (b == 0x1f && w.get(i + 1) == 0x8b && w.get(i + 2) == 8) return i
      // release in coarse strides so a long garbage run stays O(1) memory
      if ((i - from) % 65536 == 65535) w.release(i - 2)
      i += 1
      b = w.get(i)
    }
    -1L
  }

  private def fail(off: Long, err: String): Nothing =
    throw new java.io.IOException(
      s"malformed WARC record at ${p.path}:$off: $err (onMalformed=fail; " +
        "use onMalformed=skip to drop corrupt records and re-sync)")

  @annotation.tailrec
  private def nextGzip(): Boolean = {
    if (pos >= p.end) return false // records past `end` belong to the next split
    val c = if (synced) pos else scanMagic(pos)
    if (c < 0 || c >= p.end) return false
    w.release(c)
    GzipMember.decode(w, c, p.maxRecordBytes) match {
      case Right((bytes, nxt)) =>
        parseRecordFiltered(bytes, p.maxHeaderBytes, keepPred) match {
          case Right(Some(r)) =>
            current = r; curOffset = c; pos = nxt; synced = true
            w.release(nxt)
            true
          case Right(None) => // valid record vetoed by a pushed filter:
            // advance normally, never materialize its payload/row
            pos = nxt; synced = true; w.release(nxt); nextGzip()
          case Left(err) =>
            if (!synced) { pos = c + 1; nextGzip() } // false-positive magic
            else if (p.onMalformedSkip) { pos = c + 1; synced = false; nextGzip() }
            else fail(c, err)
        }
      case Left(err) =>
        if (!synced) { pos = c + 1; nextGzip() }
        else if (p.onMalformedSkip) { pos = c + 1; synced = false; nextGzip() }
        else fail(c, err)
    }
  }

  /** Plain mode: sequential whole-file parse (start is always 0).
    * Record layout: headers, CRLF CRLF, payload, CRLF CRLF. */
  @annotation.tailrec
  private def nextPlain(): Boolean = {
    // consume inter-record CRLFs
    while (w.get(pos) == '\r' && w.get(pos + 1) == '\n') pos += 2
    w.release(pos)
    if (w.get(pos) < 0) return false
    parsePlainAt(pos) match {
      case Right((Some(r), nxt)) =>
        current = r; curOffset = pos; pos = nxt; synced = true
        true
      case Right((None, nxt)) => // vetoed by a pushed filter
        pos = nxt; synced = true
        nextPlain()
      case Left(err) =>
        if (!p.onMalformedSkip) fail(pos, err)
        else {
          // re-sync on the next version line; may false-match payload
          // text, which is exactly why plain mode is not split
          val n = scanAscii(pos + 1, "WARC/1.")
          if (n < 0) false else { pos = n; nextPlain() }
        }
    }
  }

  private def parsePlainAt(off: Long): Either[String, (Option[WarcRecord], Long)] = {
    val headProbe = w.available(off, p.maxHeaderBytes)
    if (headProbe < 8) return Left("truncated record head")
    val head = w.slice(off, headProbe)
    if (!startsWith(head, 0, "WARC/")) return Left("missing WARC/ version line")
    val headerEnd = indexOf(head, 0, headProbe, "\r\n\r\n")
    if (headerEnd < 0) return Left(s"no header terminator within ${p.maxHeaderBytes} bytes")
    // reuse the member parser by assembling header + payload contiguously
    val clenIdx = {
      val probe = parseRecord(
        java.util.Arrays.copyOfRange(head, 0, headerEnd + 4), p.maxHeaderBytes)
      probe match {
        case Left(e) if e.startsWith("payload truncated") => // expected: body not attached yet
          val headerText = new String(head, 0, headerEnd, java.nio.charset.StandardCharsets.UTF_8)
          headerText.split("\r\n", -1).drop(1)
            .find(_.toLowerCase(java.util.Locale.ROOT).startsWith("content-length"))
            .map(_.split(":", 2)(1).trim.toLong) match {
            case Some(n) => n
            case None => return Left("missing Content-Length")
          }
        case Left(e) => return Left(e)
        case Right(r) => r.contentLength // zero-length payload parses outright
      }
    }
    if (clenIdx > p.maxRecordBytes)
      return Left(s"record exceeds maxRecordBytes=${p.maxRecordBytes}")
    val total = headerEnd + 4 + clenIdx
    if (w.available(off, total.toInt) < total) return Left("payload truncated at EOF")
    parseRecordFiltered(w.slice(off, total.toInt), p.maxHeaderBytes, keepPred)
      .map { r => (r, off + total) }
  }

  private def scanAscii(from: Long, pat: String): Long = {
    var i = from
    var b = w.get(i)
    while (b >= 0) {
      if (b == pat.charAt(0)) {
        var j = 1
        while (j < pat.length && w.get(i + j) == pat.charAt(j)) j += 1
        if (j == pat.length) return i
      }
      if ((i - from) % 65536 == 65535) w.release(i)
      i += 1
      b = w.get(i)
    }
    -1L
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](fieldBuilders.length)
    var i = 0
    while (i < vals.length) { vals(i) = fieldBuilders(i)(current); i += 1 }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = in.close()
}

/**
 * WARC sink: each task writes its partition as `part-NNNNN.warc(.gz)`,
 * one gzip member per record (the convention that makes the files
 * SPLITTABLE on read — see [[WarcSource]]). Distributed: no driver
 * collect, files land via the Hadoop FileSystem API so the same code
 * writes local disk, HDFS, or an object store.
 *
 * Expects columns `target_uri, warc_date, record_id, content_type,
 * payload` (binary). Null payload writes an empty body.
 */
object WarcIO {
  def writeWarc(
      df: DataFrame,
      dir: String,
      gzip: Boolean = true,
      warcType: String = "response"): Unit = {
    import org.apache.spark.sql.functions.col
    val proj = df.select(
      col("target_uri").cast(StringType), col("warc_date").cast(StringType),
      col("record_id").cast(StringType), col("content_type").cast(StringType),
      col("payload").cast(BinaryType))
    // overwrite semantics: stale part files from a previous (wider)
    // write would read back as duplicate records
    val dirPath = new Path(dir)
    val dfsys = dirPath.getFileSystem(new Configuration())
    if (dfsys.exists(dirPath)) dfsys.delete(dirPath, true)
    dfsys.mkdirs(dirPath)
    val ext = if (gzip) ".warc.gz" else ".warc"
    proj.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new Path(dir, f"part-$pid%05d$ext")
        val out = path.getFileSystem(new Configuration()).create(path, true)
        try it.foreach { r =>
          val rec = render(
            warcType,
            r.getString(0), r.getString(1), r.getString(2), r.getString(3),
            Option(r.get(4)).map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.emptyByteArray))
          if (gzip) {
            // close-shield: g.close() must free the native Deflater per
            // member WITHOUT closing the shared file stream
            val shield = new java.io.FilterOutputStream(out) {
              override def write(b: Array[Byte], off: Int, len: Int): Unit =
                out.write(b, off, len)
              override def close(): Unit = flush()
            }
            val g = new java.util.zip.GZIPOutputStream(shield)
            g.write(rec)
            g.close() // seals THIS member; the file stream stays open
          } else out.write(rec)
        } finally out.close()
      }
    }
  }

  /** Render one record's bytes (version line, headers, payload, two
    * CRLFs). Public: fixture builders and specs craft files from it. */
  def render(
      warcType: String, uri: String, date: String, id: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (id != null) sb.append("WARC-Record-ID: ").append(id).append("\r\n")
    if (date != null) sb.append("WARC-Date: ").append(date).append("\r\n")
    if (uri != null) sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    if (contentType != null) sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val outArr = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, outArr, 0, head.length)
    System.arraycopy(payload, 0, outArr, head.length, payload.length)
    outArr(outArr.length - 4) = '\r'; outArr(outArr.length - 3) = '\n'
    outArr(outArr.length - 2) = '\r'; outArr(outArr.length - 1) = '\n'
    outArr
  }
}
