package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * JPEG/EXIF metadata extraction — the image-side member of the
 * multimodal metadata family ([[graft.ops.Multimodal]] holds the
 * PNG/WAV/AIFF/MP4 parsers): frame dimensions from the SOF marker and
 * orientation / camera make / capture datetime from the EXIF APP1
 * IFD, parsed directly from payload bytes (public formats: JPEG
 * ISO/IEC 10918 marker structure, EXIF = TIFF 6.0 IFDs inside APP1).
 * The fields a training-data pipeline actually filters and joins on —
 * dedup by capture time, orientation-aware resize planning, camera
 * provenance — WITHOUT decoding pixels (no codec dependency; pixel
 * decode remains the documented stub).
 *
 * Parser discipline (crawl tolerance, same as the other byte
 * kernels): one forward segment walk, every offset bounds-checked,
 * both TIFF byte orders (`II`/`MM`), ASCII values in-line or offset,
 * truncated/corrupt input degrades to null FIELDS (a non-JPEG payload
 * is a null STRUCT); the walk stops at SOS — metadata precedes
 * entropy-coded data by construction.
 *
 * Scale shape: scan-speed per-row kernel, linear in segment bytes
 * (entropy data never scanned), no allocation beyond the result row.
 */
object ExifExtract {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("orientation", IntegerType, nullable = true),
    StructField("make", StringType, nullable = true),
    StructField("datetime", StringType, nullable = true)))

  private final val TagMake = 0x010F
  private final val TagOrientation = 0x0112
  private final val TagDateTime = 0x0132

  /** (width, height, orientation, make, datetime); null for non-JPEG. */
  def meta(payload: Array[Byte]): InternalRow = {
    if (payload == null || payload.length < 4) return null
    @inline def u8(i: Int): Int = payload(i) & 0xff
    if (u8(0) != 0xFF || u8(1) != 0xD8) return null // not a JPEG
    var w = -1
    var h = -1
    var orientation = -1
    var make: String = null
    var dt: String = null
    var i = 2
    var done = false
    while (!done && i + 2 <= payload.length) {
      if (u8(i) != 0xFF) done = true // desync: tolerate, stop
      else {
        val marker = u8(i + 1)
        if (marker == 0xFF) i += 1 // fill byte
        else if (marker == 0xD8 || marker == 0x01 ||
          (marker >= 0xD0 && marker <= 0xD7)) i += 2 // standalone
        else if (marker == 0xD9 || marker == 0xDA) done = true // EOI / SOS
        else if (i + 4 > payload.length) done = true
        else {
          val len = (u8(i + 2) << 8) | u8(i + 3)
          if (len < 2 || i + 2 + len > payload.length) done = true
          else {
            val segStart = i + 4
            val segLen = len - 2
            if ((marker == 0xC0 || marker == 0xC1 || marker == 0xC2) &&
              segLen >= 5) {
              h = (u8(segStart + 1) << 8) | u8(segStart + 2)
              w = (u8(segStart + 3) << 8) | u8(segStart + 4)
            } else if (marker == 0xE1 && segLen >= 14 &&
              u8(segStart) == 'E' && u8(segStart + 1) == 'x' &&
              u8(segStart + 2) == 'i' && u8(segStart + 3) == 'f' &&
              u8(segStart + 4) == 0 && u8(segStart + 5) == 0) {
              val t = parseTiff(payload, segStart + 6, segStart + segLen)
              if (t != null) {
                if (t._1 >= 0) orientation = t._1
                if (t._2 != null) make = t._2
                if (t._3 != null) dt = t._3
              }
            }
            i += 2 + len
          }
        }
      }
    }
    InternalRow(
      if (w < 0) null else w,
      if (h < 0) null else h,
      if (orientation < 0) null else orientation,
      if (make == null) null else UTF8String.fromString(make),
      if (dt == null) null else UTF8String.fromString(dt))
  }

  /** IFD0 scan of a TIFF block at [off, end): (orientation, make,
    * datetime); null when the header is not TIFF. */
  private def parseTiff(
      p: Array[Byte], off: Int, end: Int): (Int, String, String) = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    if (off + 8 > end) return null
    val le =
      if (u8(off) == 'I' && u8(off + 1) == 'I') true
      else if (u8(off) == 'M' && u8(off + 1) == 'M') false
      else return null
    @inline def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    @inline def u32(i: Int): Long =
      if (le) (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24))
      else ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3))
    if (u16(off + 2) != 42) return null
    val ifdOff = u32(off + 4)
    if (ifdOff < 0 || off + ifdOff + 2 > end) return null
    val ifd = off + ifdOff.toInt
    val n = u16(ifd)
    var orientation = -1
    var make: String = null
    var dt: String = null
    var k = 0
    while (k < n && ifd + 2 + 12 * (k + 1) <= end) {
      val e = ifd + 2 + 12 * k
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      if (tag == TagOrientation && typ == 3 && cnt == 1) {
        orientation = u16(e + 8) // SHORT value left-justified in-line
      } else if ((tag == TagMake || tag == TagDateTime) && typ == 2 &&
        cnt >= 1 && cnt <= 1024) {
        val vOff = if (cnt <= 4) e + 8 else off + u32(e + 8).toInt
        if (vOff >= off && vOff + cnt <= end) {
          var l = cnt.toInt
          while (l > 0 && p(vOff + l - 1) == 0) l -= 1 // strip NULs
          val s = new String(p, vOff, l,
            java.nio.charset.StandardCharsets.US_ASCII)
          if (tag == TagMake) make = s else dt = s
        }
      }
      k += 1
    }
    (orientation, make, dt)
  }
}

/** `graft_exif_meta(payload)` — see [[ExifExtract.meta]]: `struct<
  * width:int, height:int, orientation:int, make:string,
  * datetime:string>`; null struct for non-JPEG payloads. */
case class ExifMetaKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ExifExtract.schema
  override def prettyName: String = "graft_exif_meta"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${child.dataType.sql}")
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ExifExtract.meta(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ExifExtract.meta($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
