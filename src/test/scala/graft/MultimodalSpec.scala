package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def media = Multimodal.demoMediaTable(
    TestSpark.table("documents").limit(60), "doc_id", "text")

  test("demoMediaTable: kinds cycle by id, payload is utf-8 bytes, n_bytes matches") {
    val rows = media.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = (r.media_id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(r.kind == expected)
      assert(r.n_bytes == r.payload.length.toLong)
      assert(r.duration_ms == r.payload.length * 10L)
    }
  }

  test("stubDecode is deterministic and dimension-correct") {
    val payload = "some bytes".getBytes("UTF-8")
    val a = Multimodal.stubDecode(payload, 8)
    val b = Multimodal.stubDecode(payload, 8)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 8)
    assert(Multimodal.stubDecode(Array.emptyByteArray, 4).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("decodeFeatures: md5 checksum and byte count per record, batched per partition") {
    val feats = Multimodal.decodeFeatures(media, dims = 8).collect()
    val byId = feats.map(f => f.media_id -> f).toMap
    val src = media.collect()
    assert(feats.length == src.length)
    src.foreach { r =>
      val f = byId(r.media_id)
      assert(f.n_bytes == r.payload.length.toLong)
      val md = java.security.MessageDigest.getInstance("MD5")
      val expected = md.digest(r.payload).map("%02x".format(_)).mkString
      assert(f.checksum == expected)
      assert(f.feature.length == 8)
      // demo payloads are utf-8 text, not decodable images → stub path
      assert(!f.decoded && f.width == -1 && f.height == -1)
      assert(f.feature.toSeq == Multimodal.stubDecode(r.payload, 8).toSeq)
    }
  }

  /** Render a real PNG in memory: `w`×`h`, left half black, right half
    * white. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: PNG payloads yield true dimensions and luminance histogram") {
    val png = pngBytes(40, 20)
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", png, png.length.toLong, 0, 0, 0L),
      Multimodal.MediaRecord(2L, "image", "not an image".getBytes("UTF-8"), 12L, 0, 0, 0L),
      Multimodal.MediaRecord(3L, "audio", png, png.length.toLong, 0, 0, 0L))
      .toDS()
    val out = Multimodal.decodeFeatures(recs, dims = 8).collect()
      .map(f => f.media_id -> f).toMap
    // real decode: true raster dims, histogram = half darkest + half brightest bucket
    val f1 = out(1L)
    assert(f1.decoded && f1.width == 40 && f1.height == 20)
    assert(f1.feature(0) == 0.5 && f1.feature(7) == 0.5)
    assert(f1.feature.sum == 1.0)
    // garbage bytes under the image kind degrade to the stub, never throw
    assert(!out(2L).decoded && out(2L).width == -1)
    // audio kind never routes through the image decoder, even for decodable bytes
    assert(!out(3L).decoded)
    // direct kernel check too
    val Some((w, h, hist)) = Multimodal.decodeImage(pngBytes(16, 16), 4)
    assert(w == 16 && h == 16 && hist.sum == 1.0)
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)) == None)
  }

  /** Render a real WAV in memory: 16-bit signed little-endian mono PCM,
    * `rate` Hz, `nSamples` frames — first half silence, second half a
    * ±20000 square wave (energy envelope low → high). */
  private def wavBytes(rate: Float, nSamples: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val v: Short =
        if (i < nSamples / 2) 0
        else if ((i / 8) % 2 == 0) 20000 else -20000
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real audio decode: WAV payloads yield PCM facts and RMS envelope") {
    val wav = wavBytes(8000f, 4000) // 0.5 s at 8 kHz
    val Some(info) = Multimodal.decodeAudio(wav, dims = 8)
    assert(info.sampleRate == 8000 && info.channels == 1 && info.durationMs == 500)
    // first half silent, second half ~full-scale square wave
    assert(info.envelope.take(4).forall(_ == 0.0))
    val loud = 20000.0 / 32768.0
    assert(info.envelope.drop(4).forall(e => math.abs(e - loud) < 1e-9))
    // garbage never throws
    assert(Multimodal.decodeAudio("not a wav".getBytes("UTF-8")) == None)

    // end-to-end through the partition-batched decode path
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", wav, wav.length.toLong, 0, 0, 0L),
      Multimodal.MediaRecord(2L, "audio", "garbage".getBytes("UTF-8"), 7L, 0, 0, 0L),
      Multimodal.MediaRecord(3L, "video", wav, wav.length.toLong, 0, 0, 0L))
      .toDS()
    val out = Multimodal.decodeFeatures(recs, dims = 8).collect()
      .map(f => f.media_id -> f).toMap
    val f1 = out(1L)
    assert(f1.decoded && f1.sample_rate == 8000 && f1.channels == 1 && f1.decoded_ms == 500)
    assert(f1.feature.toSeq == info.envelope.toSeq)
    assert(f1.width == -1 && f1.height == -1)
    assert(!out(2L).decoded && out(2L).sample_rate == -1)
    // video kind never routes through the audio decoder, even for WAV bytes
    assert(!out(3L).decoded && out(3L).decoded_ms == -1)
  }

  test("sampleFrames: one row per sampled frame for video, passthrough otherwise") {
    val df = media.toDF()
    val sampled = Multimodal.sampleFrames(df, everyMs = 1000)
    val perId = sampled.groupBy("media_id", "kind", "duration_ms")
      .agg(count(lit(1)).as("n"), max("frame_offset_ms").as("max_off"))
      .collect()
    perId.foreach { r =>
      val kind = r.getAs[String]("kind")
      val dur = r.getAs[Long]("duration_ms")
      val n = r.getAs[Long]("n")
      if (kind == "video") {
        val expected = math.max(dur / 1000, 1L)
        assert(n == expected, s"media ${r.getAs[Long]("media_id")}")
        assert(r.getAs[Long]("max_off") == (expected - 1) * 1000)
      } else assert(n == 1)
    }
  }

  test("mediaStats never reads the payload column (pruned scan)") {
    val dir = TestSpark.tmpDir("media_parquet")
    media.toDF().write.mode("overwrite").parquet(dir)
    val stats = Multimodal.mediaStats(spark.read.parquet(dir))
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.replaceAll("\\s", "").contains("payload"),
      "payload must be pruned from the scan")
    val rows = stats.collect().map(r =>
      r.getAs[String]("kind") -> r.getAs[Long]("total_bytes")).toMap
    val expected = media.toDF().groupBy("kind")
      .agg(sum(length(col("payload"))).as("tb")).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("tb")).toMap
    assert(rows == expected)
  }

  /** Minimal well-formed MP4: ftyp + moov{mvhd v0, trak{tkhd v0}}. */
  private def mp4Bytes(
      timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 8 + 92)
    bb.putInt(16).put("ftyp".getBytes("ISO-8859-1"))
      .put("isom".getBytes("ISO-8859-1")).putInt(0)
    bb.putInt(8 + 108 + 8 + 92).put("moov".getBytes("ISO-8859-1"))
    // mvhd v0: ver/flags, creation, modification, timescale, duration,
    // rate, volume+reserved, matrix(36), predefined(24), next_track
    bb.putInt(108).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      .putInt(0x00010000).putInt(0x01000000).putInt(0).putInt(0)
    (0 until 9).foreach(i => bb.putInt(if (i % 4 == 0) 0x00010000 else 0))
    (0 until 6).foreach(_ => bb.putInt(0))
    bb.putInt(2)
    bb.putInt(8 + 92).put("trak".getBytes("ISO-8859-1"))
    // tkhd v0: ver/flags, creation, mod, track id, reserved, duration,
    // reserved(8), layer/alt/volume/reserved(8), matrix(36), w, h (16.16)
    bb.putInt(92).put("tkhd".getBytes("ISO-8859-1"))
      .putInt(0).putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration)
      .putLong(0L).putInt(0).putInt(0)
    (0 until 9).foreach(i => bb.putInt(if (i % 4 == 0) 0x00010000 else 0))
    bb.putInt(w << 16).putInt(h << 16)
    bb.array()
  }

  test("real MP4 container parse: mvhd duration, tkhd dimensions, corrupt-safe") {
    val ok = Multimodal.parseMp4Meta(mp4Bytes(1000, 5000, 640, 360))
    assert(ok.contains(Multimodal.VideoMeta(5000L, 640, 360, 1)))
    // non-1000 timescale converts exactly
    assert(Multimodal.parseMp4Meta(mp4Bytes(90000, 450000, 1920, 1080))
      .contains(Multimodal.VideoMeta(5000L, 1920, 1080, 1)))
    // garbage, truncation, and a non-MP4 payload all refuse cleanly
    assert(Multimodal.parseMp4Meta("not a video".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseMp4Meta(mp4Bytes(1000, 5000, 640, 360).take(20)).isEmpty)
    assert(Multimodal.parseMp4Meta(Array.empty[Byte]).isEmpty)
  }

  test("decodeFeatures marks MP4 video payloads decoded with container facts") {
    import TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(2L, "video", mp4Bytes(1000, 7000, 320, 240),
        0L, -1, -1, 0L),
      Multimodal.MediaRecord(5L, "video", "junk".getBytes("UTF-8"),
        0L, -1, -1, 0L)).toDS()
    val got = Multimodal.decodeFeatures(rows).collect()
      .map(f => f.media_id -> ((f.decoded, f.width, f.height, f.decoded_ms)))
      .toMap
    assert(got(2L) == ((true, 320, 240, 7000L)))
    assert(got(5L) == ((false, -1, -1, -1L)), "corrupt video flows through the stub path")
  }

  private def audioStats(payload: Array[Byte]): Option[Seq[Long]] =
    Option(graft.functions.AudioStats.stats(payload))
      .map(r => (0 until 7).map(r.getLong))

  test("audioStats: demoWav fixture replays the per-sample arithmetic") {
    // independently computed: id=3 -> 203 samples, peak 15952, no
    // clips, sum|s|=1470944, DC sum=-250560; id=9 (clip path) -> 209
    // samples, 9 full-scale samples
    assert(audioStats(Multimodal.demoWav(3L)) ==
      Some(Seq(203L, 8000L, 1L, 15952L, 0L, 1470944L, -250560L)))
    assert(audioStats(Multimodal.demoWav(9L)) ==
      Some(Seq(209L, 8000L, 1L, 32767L, 9L, 1735719L, 357447L)))
    // id%13=0 payloads are truncated garbage -> NULL, not a crash
    assert(audioStats(Multimodal.demoWav(13L)).isEmpty)
  }

  test("audioStats: malformed / non-PCM payloads take the NULL path") {
    assert(audioStats("not audio at all, far too short".getBytes("UTF-8")).isEmpty)
    assert(audioStats(Array.empty[Byte]).isEmpty)
    // valid WAV whose declared data size overruns the payload: stats
    // cover the readable prefix (torn landing-zone file contract)
    val whole = Multimodal.demoWav(3L)
    val torn = whole.take(whole.length - 100)
    val t = audioStats(torn)
    assert(t.isDefined && t.get.head == 203L - 50L)
    // flipping the fmt tag to 0x55 (MP3) must reject
    val mp3ish = whole.clone
    mp3ish(20) = 0x55.toByte
    assert(audioStats(mp3ish).isEmpty)
  }

  test("audioStats kernel: SQL surface over a payload column") {
    import TestSpark.spark
    import spark.implicits._
    val df = Seq((3L, Multimodal.demoWav(3L)),
      (13L, Multimodal.demoWav(13L))).toDF("id", "payload")
    val got = df.select(col("id"),
        graft.functions.GraftFunctions.audioStats(spark, col("payload")).as("a"))
      .selectExpr("id", "a.n_samples", "a.n_clipped")
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 203L && got(0).getLong(2) == 0L)
    assert(got(1).isNullAt(1))
  }
}
