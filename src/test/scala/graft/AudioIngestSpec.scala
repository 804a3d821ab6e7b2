package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AudioDedup, Multimodal}
import graft.sources.WarcIO
import graft.streaming.AudioIngest

class AudioIngestSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def urn(i: Long) = s"<urn:graft:aud:$i>"

  /** Land one WARC wave of demoTone payloads (plus one text record
    * that the audio gate must ignore). */
  private def landWave(dir: String, ids: Seq[Long]): Unit =
    WarcIO.writeWarc(
      (ids.map(i => (s"http://aud.example/$i", "2026-01-01T00:00:00Z",
          urn(i), "audio/wav", Multimodal.demoTone(i))) :+
        (("http://txt.example/x", "2026-01-01T00:00:00Z",
          "<urn:graft:txt:1>", "text/plain", "not audio".getBytes("UTF-8"))))
        .toDF("target_uri", "warc_date", "record_id", "content_type", "payload")
        .repartition(2),
      dir)

  test("maintainAudio: exactly-once gating, batch×corpus pairs, crash heal") {
    val base = TestSpark.tmpDir("audio_ingest")
    def drain() = AudioIngest.maintainAudio(
      spark, s"$base/landing", s"$base/silver", s"$base/ledger",
      s"$base/index", minShared = 8L, bins = 16)

    assert(drain().count() == 0, "empty landing zone is a clean no-op")

    // wave 1: cluster 0 (ids 1, 2) + cluster 5 (id 51); batch-internal
    // pair (1, 2) only — id 13 is a truncated blob that must drop
    landWave(s"$base/landing/w1", Seq(1L, 2L, 51L, 13L))
    def unordered(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => Set(r.getString(0), r.getString(1))).toSet
    val p1 = unordered(drain().collect())
    assert(p1 == Set(Set(urn(1), urn(2))))
    // the text record and the corrupt blob never enter the index
    assert(AudioIngest.readFingerprints(spark, s"$base/index")
      .select("media_id").distinct().collect().map(_.getString(0)).toSet ==
      Set(urn(1), urn(2), urn(51)))

    // re-drain with nothing new: no pairs, no index growth
    assert(drain().count() == 0)

    // geometry drift fails LOUDLY: a drain hashed with different
    // parameters would silently probe nothing and poison the store —
    // the first drain pinned (32, 16, 3), later drains must match
    val drift = intercept[IllegalArgumentException] {
      AudioIngest.maintainAudio(
        spark, s"$base/landing", s"$base/silver", s"$base/ledger",
        s"$base/index", minShared = 8L, bins = 8)
    }
    assert(drift.getMessage.contains("geometry drift"))

    // wave 2: id 3 joins cluster 0 → pairs against BOTH standing
    // members; id 55 joins cluster 5 → pairs with standing id 51
    landWave(s"$base/landing/w2", Seq(3L, 55L))
    val p2 = unordered(drain().collect())
    assert(p2 == Set(
      Set(urn(1), urn(3)), Set(urn(2), urn(3)), Set(urn(51), urn(55))))

    // stored landmarks match the batch kernel exactly
    val stored = AudioIngest.readFingerprints(spark, s"$base/index")
      .filter(col("media_id") === urn(3))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val direct = AudioDedup.fingerprints(
        Seq((3L, Multimodal.demoTone(3L))).toDF("media_id", "payload"),
        "media_id", "payload", bins = 16)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(stored == direct)

    // CRASH SIMULATION: wave 3 reaches silver (drainWarc committed),
    // but the process dies before the fingerprint-index append — the
    // index-as-ledger delta must recover that audio next drain
    landWave(s"$base/landing/w3", Seq(4L))
    graft.streaming.WarcIngest.drainWarc(
      spark, s"$base/landing", s"$base/silver", s"$base/ledger")
    val p3 = unordered(drain().collect())
    assert(p3 == Set(
      Set(urn(1), urn(4)), Set(urn(2), urn(4)), Set(urn(3), urn(4))),
      "audio stranded in silver by a crash must be gated on the next drain")

    // concurrent drain fails visibly under the index claim
    graft.io.Commits.acquireClaim(spark, s"$base/index")
    intercept[graft.io.Commits.ConcurrentWriteException] { drain() }
    graft.io.Commits.forceReleaseClaim(spark, s"$base/index")
    assert(drain().count() == 0)

    // CRASH SIMULATION 2 (the marker/folded window): wave 4 drains
    // FULLY (batch marker + pair report committed), then the folded
    // record rolls back — the replayed drain's index-as-ledger delta
    // is empty, but the crashed drain's caller never received its
    // pairs; the stored pair report must re-surface them instead of
    // letting those duplicates silently pass the gate
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

    // O(drain) contract: the durable folded record now covers every
    // silver data file, so the next drain reads NO silver payload
    val silverFiles = {
      val p = new org.apache.hadoop.fs.Path(s"$base/silver")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
        .filter(_.endsWith(".parquet")).toSet
    }
    val folded = graft.io.Commits.readVersioned(spark, s"$base/index/folded")
      .get._2.collect().map(_.getString(0)).toSet
    assert(folded == silverFiles,
      "folded record must track exactly the silver data files")
  }

  test("sharedFingerprintProbe: batch-internal + batch×corpus, never corpus×corpus") {
    // hand-built landmark frames: c1/c2 share 8 fps (a corpus pair
    // that must NOT surface); b1 shares 8 with each of c1/c2; b2
    // shares only 2 with anyone (below minShared)
    def fps(id: String, vals: Seq[Long]) = vals.map(v => (id, 0L, v))
    val corpus = (fps("c1", 1L to 8L) ++ fps("c2", 1L to 8L))
      .toDF("id", "t", "fp")
    val batch = (fps("b1", 1L to 8L) ++ fps("b2", Seq(1L, 2L)))
      .toDF("id", "t", "fp")
    val got = AudioDedup.sharedFingerprintProbe(batch, corpus, "id", minShared = 8L)
      .collect().map(r => (Set(r.getString(0), r.getString(1)), r.getLong(2))).toSet
    assert(got == Set((Set("b1", "c1"), 8L), (Set("b1", "c2"), 8L)))

    // the stop-landmark fence drops saturated fps from the evidence
    val fenced = AudioDedup.sharedFingerprintProbe(
      batch, corpus, "id", minShared = 1L, maxDocsPerFp = 2L)
    // every fp 1..8 is carried by c1, c2, b1 (3 docs > cap 2) → only
    // fps 1,2 (c1,c2,b1,b2 = 4 docs) also dropped → nothing survives
    assert(fenced.count() == 0)
  }
}
