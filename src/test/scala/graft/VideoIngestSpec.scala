package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, VideoDedup}
import graft.sources.WarcIO
import graft.streaming.VideoIngest

class VideoIngestSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def urn(i: Long) = s"<urn:graft:vid:$i>"

  /** Land one WARC wave of demoY4m payloads (plus one text record
    * that the video gate must ignore). */
  private def landWave(dir: String, ids: Seq[Long]): Unit =
    WarcIO.writeWarc(
      (ids.map(i => (s"http://vid.example/$i", "2026-01-01T00:00:00Z",
          urn(i), "video/y4m", Multimodal.demoY4m(i, 36, 32))) :+
        (("http://txt.example/x", "2026-01-01T00:00:00Z",
          "<urn:graft:txt:1>", "text/plain", "not video".getBytes("UTF-8"))))
        .toDF("target_uri", "warc_date", "record_id", "content_type", "payload")
        .repartition(2),
      dir)

  test("maintainVideos: exactly-once gating, batch×corpus pairs, crash heal") {
    val base = TestSpark.tmpDir("video_ingest")
    def drain() = VideoIngest.maintainVideos(
      spark, s"$base/landing", s"$base/silver", s"$base/ledger",
      s"$base/index", maxHamming = 6)

    assert(drain().count() == 0, "empty landing zone is a clean no-op")

    // wave 1: cluster 0 (ids 1, 2) + cluster 5 (id 51); batch-internal
    // pair (1, 2) only — id 13 is a truncated blob that must drop
    landWave(s"$base/landing/w1", Seq(1L, 2L, 51L, 13L))
    def unordered(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => Set(r.getString(0), r.getString(1))).toSet
    val p1 = unordered(drain().collect())
    assert(p1 == Set(Set(urn(1), urn(2))))
    // the text record and the corrupt blob never enter the index
    assert(VideoIngest.readFrameHashes(spark, s"$base/index")
      .select("media_id").distinct().collect().map(_.getString(0)).toSet ==
      Set(urn(1), urn(2), urn(51)))

    // re-drain with nothing new: no pairs, no index growth
    assert(drain().count() == 0)

    // wave 2: id 3 joins cluster 0 → pairs against BOTH standing
    // members; id 55 joins cluster 5 → pairs with standing id 51
    landWave(s"$base/landing/w2", Seq(3L, 55L))
    val p2 = unordered(drain().collect())
    assert(p2 == Set(
      Set(urn(1), urn(3)), Set(urn(2), urn(3)), Set(urn(51), urn(55))))

    // stored frame hashes match the batch kernel exactly
    val stored = VideoIngest.readFrameHashes(spark, s"$base/index")
      .filter(col("media_id") === urn(3))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val direct = VideoDedup.frameHashes(
        Seq((3L, Multimodal.demoY4m(3L, 36, 32))).toDF("media_id", "payload"),
        "media_id", "payload")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(stored == direct)

    // CRASH SIMULATION: wave 3 reaches silver (drainWarc committed),
    // but the process dies before the frame-hash append — the
    // index-as-ledger delta must recover that video next drain
    landWave(s"$base/landing/w3", Seq(4L))
    graft.streaming.WarcIngest.drainWarc(
      spark, s"$base/landing", s"$base/silver", s"$base/ledger")
    val p3 = unordered(drain().collect())
    assert(p3 == Set(
      Set(urn(1), urn(4)), Set(urn(2), urn(4)), Set(urn(3), urn(4))),
      "videos stranded in silver by a crash must be gated on the next drain")

    // concurrent drain fails visibly under the index claim
    graft.io.Commits.acquireClaim(spark, s"$base/index")
    intercept[graft.io.Commits.ConcurrentWriteException] { drain() }
    graft.io.Commits.forceReleaseClaim(spark, s"$base/index")
    assert(drain().count() == 0)

    // CRASH SIMULATION 2 (the marker/folded window): wave 4 drains
    // FULLY, then the folded record rolls back — the replayed drain's
    // delta is empty, but the crashed drain's caller never received
    // its pairs; the stored pair report must re-surface them
    landWave(s"$base/landing/w4", Seq(5L))
    val foldedBefore = TestSpark.snapshotVersion(s"$base/index/folded")
    val p4 = unordered(drain().collect())
    assert(p4 == Set(Set(urn(1), urn(5)), Set(urn(2), urn(5)),
      Set(urn(3), urn(5)), Set(urn(4), urn(5))))
    TestSpark.restoreVersion(s"$base/index/folded", foldedBefore)
    assert(unordered(drain().collect()) == p4,
      "a marker-committed / folded-uncommitted batch must re-surface " +
        "its stored pair report on replay")
    assert(drain().count() == 0, "the healed replay is one-shot")
  }

  test("videoProbe: aligned batch×corpus + batch-internal, never corpus×corpus") {
    // hand-built frame hashes: c1/c2 align on frames 0,2 (a corpus
    // pair that must NOT surface); b1 aligns with c1/c2 on both
    // frames; b2 shares a band on frame 0 only (below minFrames)
    val h = 0x1111222233334444L
    val corpus = Seq(
      ("c1", 0L, h), ("c1", 2L, h ^ 1L),
      ("c2", 0L, h ^ 2L), ("c2", 2L, h))
      .toDF("id", "frame_idx", "ahash")
    val batch = Seq(
      ("b1", 0L, h ^ 4L), ("b1", 2L, h),
      ("b2", 0L, h ^ (0xffL << 24))) // band 0/2/3 shared, hamming 8 > 6
      .toDF("id", "frame_idx", "ahash")
    val got = VideoDedup.videoProbe(batch, corpus, "id", maxHamming = 6)
      .collect().map(r => (Set(r.getString(0), r.getString(1)), r.getLong(2))).toSet
    assert(got == Set((Set("b1", "c1"), 2L), (Set("b1", "c2"), 2L)))
  }
}
