package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructType}

/**
 * Integer-exact audio quality statistics over raw WAV bytes — the
 * audio-corpus triage gate (clipping, peak level, DC offset) that runs
 * BEFORE any expensive decode/feature stage. Unlike the RMS envelope in
 * [[graft.ops.Multimodal.decodeAudio]] (float energy for features),
 * every statistic here is an INTEGER sum/max over the raw 16-bit PCM
 * samples, so the result is a pure function of the payload bytes and
 * replays bit-identically in the oracle:
 *
 *  - `n_samples`   total samples across channels
 *  - `sample_rate` / `channels` from the fmt chunk
 *  - `peak`        max |sample| (0…32768)
 *  - `n_clipped`   samples at full scale (32767 or −32768) — the
 *                  standard hard-clip indicator
 *  - `sum_abs`     Σ|sample| (mean level = sum_abs / n_samples)
 *  - `sum_val`     Σ sample  (DC offset = sum_val / n_samples)
 *
 * Hand-rolled RIFF walk (no `javax.sound` stream plumbing): accepts
 * only canonical PCM ("RIFF…WAVE", fmt tag 1, 16-bit) and returns NULL
 * for anything else — truncated, non-RIFF, compressed, or 8/24-bit
 * payloads all take the corrupt-blob path, the
 * [[ExifExtract]]/[[graft.ops.Multimodal.decodeImage]] contract.
 * Chunk sizes are bounds-checked throughout; a data chunk running past
 * the payload is truncated to the bytes actually present (torn
 * landing-zone files still audit their readable prefix).
 */
object AudioStats {

  val schema: StructType = new StructType()
    .add("n_samples", LongType, nullable = false)
    .add("sample_rate", LongType, nullable = false)
    .add("channels", LongType, nullable = false)
    .add("peak", LongType, nullable = false)
    .add("n_clipped", LongType, nullable = false)
    .add("sum_abs", LongType, nullable = false)
    .add("sum_val", LongType, nullable = false)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b(off) == t.charAt(0) && b(off + 1) == t.charAt(1) &&
      b(off + 2) == t.charAt(2) && b(off + 3) == t.charAt(3)

  /** NULL (not a row of zeros) for malformed payloads. */
  def stats(payload: Array[Byte]): GenericInternalRow = {
    if (payload == null || payload.length < 44) return null
    if (!tag(payload, 0, "RIFF") || !tag(payload, 8, "WAVE")) return null
    var off = 12
    var rate = -1L
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    // chunk walk: fmt must precede data (canonical WAV); unknown
    // chunks are skipped by their declared size
    while (off + 8 <= payload.length && dataOff < 0) {
      val size = u32(payload, off + 4)
      if (size < 0 || size > Int.MaxValue) return null
      if (tag(payload, off, "fmt ")) {
        if (off + 8 + 16 > payload.length) return null
        if (u16(payload, off + 8) != 1) return null // PCM only
        channels = u16(payload, off + 10)
        rate = u32(payload, off + 12)
        if (u16(payload, off + 22) != 16) return null // 16-bit only
        if (channels < 1 || rate <= 0) return null
      } else if (tag(payload, off, "data")) {
        if (rate < 0) return null // data before fmt: malformed
        dataOff = off + 8
        dataLen = math.min(size, (payload.length - dataOff).toLong).toInt
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (dataOff < 0) return null
    val nSamples = dataLen / 2
    var i = 0
    var peak = 0L
    var clipped = 0L
    var sumAbs = 0L
    var sumVal = 0L
    while (i < nSamples) {
      val s = ((payload(dataOff + 2 * i) & 0xff) |
        (payload(dataOff + 2 * i + 1) << 8)).toShort.toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      if (s == 32767L || s == -32768L) clipped += 1
      sumAbs += a
      sumVal += s
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nSamples.toLong, rate, channels.toLong, peak, clipped, sumAbs, sumVal))
  }
}

/** `graft_audio_stats(payload)` — see [[AudioStats.stats]]. NULL for
  * malformed/non-PCM payloads. */
case class AudioStatsKernel(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioStats.schema
  override def prettyName: String = "graft_audio_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${child.dataType.sql}")
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    AudioStats.stats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioStats.stats($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
