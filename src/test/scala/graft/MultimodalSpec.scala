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
      assert(f.feature.toSeq == Multimodal.stubDecode(r.payload, 8).toSeq)
    }
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
}
