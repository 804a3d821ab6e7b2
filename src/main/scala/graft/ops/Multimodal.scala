package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (north-star): treat image/audio/video
 * payloads as opaque `binary` columns with typed metadata, and run
 * decode / feature-extract / frame-sample as partition-batched
 * transforms.
 *
 * The IMAGE kind decodes for real via `javax.imageio` (JDK-only, no
 * external codecs): dimensions + a luminance histogram feature vector.
 * Audio/video codecs are NOT available in this environment, so their
 * decode kernel is a clearly-marked deterministic STUB
 * ([[stubDecode]]) — everything around it (schema, batching shape,
 * partitioning, output contract) is the real Spark plumbing you would
 * keep when swapping in a real decoder.
 *
 * Scale notes:
 *  - payloads stay in `binary` columns → Parquet stores them as
 *    byte-arrays with column-level compression; metadata lives in plain
 *    columns so filters on (kind, width, duration…) prune row groups
 *    WITHOUT touching payload bytes.
 *  - [[decodeFeatures]] uses `mapPartitions` (the JVM analog of
 *    `mapInPandas`): one decoder init per partition, streamed
 *    row-batches, no per-row setup cost. Decoder parallelism = partition
 *    count; repartition by a size-balanced key before heavy decode.
 *  - frame sampling emits one row per sampled frame via a generator
 *    (`explode`) — a bounded row expansion declared in the plan, not a
 *    driver loop.
 */
object Multimodal {

  /** One media asset: payload + typed metadata. `n_bytes` is stored as
    * a plain metadata column precisely so size queries never touch the
    * payload bytes (Parquet column pruning skips the blob column). */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** `decoded` is true when a REAL codec parsed the payload; then
    * `width`/`height` are the decoded raster dimensions (−1 otherwise)
    * and `feature` is the luminance histogram. Undecodable/stubbed rows
    * keep flowing with the stub feature — a corrupt blob must never
    * kill a corpus-scale decode job. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      decoded: Boolean,
      width: Int,
      height: Int,
      feature: Array[Double])

  /** Deterministic fake "decode": byte-level stats standing in for a
    * real codec. STUB — stands in for the audio/video decoders that
    * aren't available in this sandbox (swap in e.g. JavaCV per
    * partition in production). */
  def stubDecode(payload: Array[Byte], dims: Int = 8): Array[Double] = {
    val out = new Array[Double](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    out
  }

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP with zero
    * non-JDK dependencies): returns (width, height, `dims`-bucket
    * normalized luminance histogram), or None when the payload is not a
    * decodable image (ImageIO yields null / throws on garbage — a
    * per-row condition, swallowed so one corrupt blob can't fail the
    * task). Deterministic: pixel traversal order and integer luma
    * arithmetic are fixed. */
  def decodeImage(payload: Array[Byte], dims: Int = 8): Option[(Int, Int, Array[Double])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Double](dims)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // integer BT.601 luma: deterministic across JVMs
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist((lum * dims) / 256) += 1.0
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h.toDouble
        var i = 0
        while (i < dims) { hist(i) /= n; i += 1 }
        Some((w, h, hist))
      }
    } catch { case _: Exception => None }

  /** Build a demo media table from any (id, text) source — payload =
    * UTF-8 bytes. Stands in for reading real blobs. */
  def demoMediaTable(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val kind = id % 3 match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRecord(id, kind, bytes, bytes.length.toLong,
          64 + (id % 16).toInt, 64, bytes.length * 10L)
    }
  }

  /** Partition-batched decode → features. One decoder/digest per
    * partition (init hoisted out of the row loop), matching the
    * mapInPandas batch-shape contract. Image payloads decode for REAL
    * (`javax.imageio`); audio/video (and undecodable image bytes) fall
    * back to the stub feature with `decoded = false`. */
  def decodeFeatures(media: Dataset[MediaRecord], dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init: digest here; a real audio/video impl would
      // also open its codec once here
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        digest.reset()
        val sum = digest.digest(r.payload).map("%02x".format(_)).mkString
        val real =
          if (r.kind == "image") decodeImage(r.payload, dims) else None
        real match {
          case Some((w, h, hist)) =>
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sum,
              decoded = true, width = w, height = h, feature = hist)
          case None =>
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sum,
              decoded = false, width = -1, height = -1,
              feature = stubDecode(r.payload, dims))
        }
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * offset (declarative explode, no driver loop). Non-video rows pass
    * through with frame_idx 0. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    val nFrames = when(col("kind") === "video",
      greatest((col("duration_ms") / everyMs).cast("int"), lit(1))).otherwise(lit(1))
    media
      .withColumn("frame_idx", explode(sequence(lit(0), nFrames - 1)))
      .withColumn("frame_offset_ms", col("frame_idx") * everyMs)
  }

  /** Metadata-only stats — provable payload-pruning: the plan touches
    * only (kind, n_bytes, duration_ms); the payload column never leaves
    * the scan (check `ReadSchema` in `.explain("formatted")`). */
  def mediaStats(media: DataFrame): DataFrame =
    media
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("duration_ms")).as("max_duration_ms"))
}
