package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (north-star): treat image/audio/video
 * payloads as opaque `binary` columns with typed metadata, and run
 * decode / feature-extract / frame-sample as partition-batched
 * transforms.
 *
 * The actual media codecs are NOT available in this environment, so the
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

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      feature: Array[Double])

  /** Deterministic fake "decode": byte-level stats standing in for a
    * real codec. STUB — replace with an actual decoder (e.g. JavaCV)
    * per partition in production. */
  def stubDecode(payload: Array[Byte], dims: Int = 8): Array[Double] = {
    val out = new Array[Double](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    out
  }

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

  /** Partition-batched decode → features. One decoder per partition
    * (init hoisted out of the row loop), matching the mapInPandas
    * batch-shape contract. */
  def decodeFeatures(media: Dataset[MediaRecord], dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: val decoder = Codec.open(...) — once per partition
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        digest.reset()
        val sum = digest.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, sum,
          stubDecode(r.payload, dims))
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
