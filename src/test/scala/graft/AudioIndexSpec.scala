package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.AudioIndex
import graft.ops.{AudioDedup, Multimodal}

/** Durable audio-fingerprint index: probe ≡ in-memory pairs, append
  * visibility, right-to-be-forgotten delete ≡ rebuild-without, meta-
  * last crash contract, claim serialization, compaction equivalence. */
class AudioIndexSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tones(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, Multimodal.demoTone(i))).toDF("media_id", "payload")

  /** Corpus: clusters 0 (1–9), 2 (20–29), 5 (51–59 slice); id 13 is a
    * truncated blob that must drop. Batch = ids % 10 == 0-style slice. */
  private val corpusIds = Seq(1L, 2L, 3L, 13L, 21L, 22L, 51L, 52L)
  private val batchIds = Seq(4L, 23L, 53L)

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** The in-memory oracle: full-corpus shared-landmark pairs
    * restricted to those touching the batch. */
  private def expectedProbe(minShared: Long): Set[(Long, Long, Long)] =
    pairSet(AudioDedup.sharedFingerprintPairs(
      AudioDedup.fingerprints(
        tones(corpusIds ++ batchIds), "media_id", "payload", bins = 16),
      "media_id", minShared))
      .filter(p => batchIds.contains(p._1) || batchIds.contains(p._2))

  test("build + probe ≡ in-memory pairs touching the batch; geometry from meta") {
    val dir = TestSpark.tmpDir("audio_index")
    AudioIndex.build(tones(corpusIds), "media_id", "payload", dir, bins = 16)
    val got = pairSet(
      AudioIndex.probe(tones(batchIds), "payload", dir, minShared = 8L))
    val want = expectedProbe(8L)
    assert(want.nonEmpty, "fixture must produce batch-touching pairs")
    assert(got == want)
    // batch-internal evidence also surfaces (never corpus×corpus:
    // corpus pairs like (1,2) must NOT appear)
    assert(!got.exists(p =>
      corpusIds.contains(p._1) && corpusIds.contains(p._2)))

    // meta is the identity: the stored geometry drives the probe
    val m = AudioIndex.meta(spark, dir)
    assert(m == AudioIndex.Meta("media_id", 32, 16, 3))
  }

  test("ingestBatch: append visibility — the next probe sees the batch") {
    val dir = TestSpark.tmpDir("audio_index_append")
    AudioIndex.build(tones(Seq(1L, 2L)), "media_id", "payload", dir, bins = 16)
    val p1 = pairSet(AudioIndex.ingestBatch(
      tones(Seq(3L)), "payload", dir, minShared = 8L))
    assert(p1.map(p => (p._1, p._2)) == Set((1L, 3L), (2L, 3L)))
    // id 3's landmarks are now standing: id 4 pairs against it too
    val p2 = pairSet(AudioIndex.probe(
      tones(Seq(4L)), "payload", dir, minShared = 8L))
    assert(p2.map(p => (p._1, p._2)) == Set((1L, 4L), (2L, 4L), (3L, 4L)))
  }

  test("delete: forgotten docs never pair again ≡ index built without them") {
    val dir = TestSpark.tmpDir("audio_index_rtbf")
    AudioIndex.build(tones(corpusIds), "media_id", "payload", dir, bins = 16)
    AudioIndex.delete(Seq(2L, 21L).toDF("media_id"), dir)
    val got = pairSet(
      AudioIndex.probe(tones(batchIds), "payload", dir, minShared = 8L))
    val rebuilt = TestSpark.tmpDir("audio_index_rtbf_rebuild")
    AudioIndex.build(
      tones(corpusIds.filterNot(Seq(2L, 21L).contains)),
      "media_id", "payload", rebuilt, bins = 16)
    assert(got == pairSet(
      AudioIndex.probe(tones(batchIds), "payload", rebuilt, minShared = 8L)))
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L || p._1 == 21L || p._2 == 21L))
  }

  test("meta commits LAST: a crashed build leaves no readable index") {
    val dir = TestSpark.tmpDir("audio_index_crash")
    // simulate the crash window: fps written, meta never committed
    AudioDedup.fingerprints(tones(Seq(1L)), "media_id", "payload", bins = 16)
      .write.mode("overwrite").parquet(s"$dir/fps")
    val e = intercept[IllegalArgumentException] {
      AudioIndex.probe(tones(Seq(2L)), "payload", dir, minShared = 8L)
    }
    assert(e.getMessage.contains("no audio index"))
  }

  test("a crashed REBUILD is fail-loud, never stale-geometry-readable") {
    val dir = TestSpark.tmpDir("audio_index_rebuild_crash")
    AudioIndex.build(tones(Seq(1L, 2L)), "media_id", "payload", dir, bins = 8)
    // a rebuild retires the meta FIRST: simulate its crash window by
    // replaying exactly what build does up to the meta write — old
    // meta gone, new fps (different geometry) written
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_index.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    AudioDedup.fingerprints(tones(Seq(1L, 2L)), "media_id", "payload", bins = 16)
      .write.mode("overwrite").parquet(s"$dir/fps")
    // the half-rebuilt index must FAIL, not silently probe bins=8
    // landmarks against a bins=16 store
    val e = intercept[IllegalArgumentException] {
      AudioIndex.probe(tones(Seq(3L)), "payload", dir, minShared = 8L)
    }
    assert(e.getMessage.contains("no audio index"))
    // a completed rebuild recovers it
    AudioIndex.build(tones(Seq(1L, 2L)), "media_id", "payload", dir, bins = 16)
    assert(AudioIndex.meta(spark, dir).bins == 16)
    assert(AudioIndex.probe(tones(Seq(3L)), "payload", dir, minShared = 8L)
      .count() > 0)
  }

  test("reads resolve a crashed-rewrite window WITHOUT mutating the store") {
    val dir = TestSpark.tmpDir("audio_index_read_heal")
    AudioIndex.build(tones(Seq(1L, 2L)), "media_id", "payload", dir, bins = 16)
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"$dir/fps")
    val prev = new org.apache.hadoop.fs.Path(s"$dir/fps_prev")
    val fs = live.getFileSystem(conf)
    // simulate a delete/compact crashed between its two renames: fps
    // retired to fps_prev, the staged rewrite half-written
    assert(fs.rename(live, prev))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/fps_rewriting"))
    // a CLAIM-FREE read must answer from fps_prev...
    assert(AudioIndex.fingerprints(spark, dir).count() > 0)
    assert(AudioIndex.probe(tones(Seq(3L)), "payload", dir, minShared = 8L)
      .count() > 0)
    // ...and must NOT have healed: the store is byte-untouched (a
    // mutating read would race the live writer that owns the window)
    assert(!fs.exists(live), "a read must not rename the store")
    assert(fs.exists(prev))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/fps_rewriting")),
      "a read must not delete the staged rewrite")
    // the next claim-holding WRITER heals the window
    AudioIndex.append(tones(Seq(3L)), "payload", dir)
    assert(fs.exists(live) && !fs.exists(prev))
  }

  test("delete refuses a multi-column id frame instead of guessing") {
    val dir = TestSpark.tmpDir("audio_index_del_cols")
    AudioIndex.build(tones(Seq(1L, 2L)), "media_id", "payload", dir, bins = 16)
    val e = intercept[IllegalArgumentException] {
      AudioIndex.delete(
        Seq(("2026-01-01", 1L)).toDF("deleted_at", "media_id"), dir)
    }
    assert(e.getMessage.contains("single-column"))
    // the takedown never ran: id 1 still pairs
    assert(AudioIndex.probe(tones(Seq(3L)), "payload", dir, minShared = 8L)
      .collect().exists(r => r.getLong(0) == 1L || r.getLong(1) == 1L))
  }

  test("writers serialize under the store claim; probe is read-only") {
    val dir = TestSpark.tmpDir("audio_index_claim")
    AudioIndex.build(tones(Seq(1L, 2L)), "media_id", "payload", dir, bins = 16)
    graft.io.Commits.acquireClaim(spark, dir)
    intercept[graft.io.Commits.ConcurrentWriteException] {
      AudioIndex.ingestBatch(tones(Seq(3L)), "payload", dir, minShared = 8L)
    }
    intercept[graft.io.Commits.ConcurrentWriteException] {
      AudioIndex.delete(Seq(1L).toDF("media_id"), dir)
    }
    // reads stay available under a writer's claim
    assert(AudioIndex.probe(tones(Seq(3L)), "payload", dir, minShared = 8L)
      .count() > 0)
    graft.io.Commits.forceReleaseClaim(spark, dir)
    assert(AudioIndex.ingestBatch(tones(Seq(3L)), "payload", dir,
      minShared = 8L).count() > 0)
  }

  test("compact: answer-identical, fragmentation-gated") {
    val dir = TestSpark.tmpDir("audio_index_compact")
    AudioIndex.build(tones(Seq(1L, 2L)), "media_id", "payload", dir, bins = 16)
    // several appends fragment the store
    Seq(3L, 21L, 22L, 51L).foreach(i =>
      AudioIndex.append(tones(Seq(i)), "payload", dir))
    val before = pairSet(
      AudioIndex.probe(tones(Seq(4L, 23L)), "payload", dir, minShared = 8L))
    assert(AudioIndex.compactIfFragmented(spark, dir, targetFiles = 2))
    assert(!AudioIndex.compactIfFragmented(spark, dir, targetFiles = 2),
      "a just-compacted store must be a no-op")
    val after = pairSet(
      AudioIndex.probe(tones(Seq(4L, 23L)), "payload", dir, minShared = 8L))
    assert(before == after)
    assert(before.nonEmpty)

    // the gauge is guarded: an existing-but-empty store root is "not
    // fragmented", not a raw FileNotFoundException from the listing
    assert(!AudioIndex.compactIfFragmented(
      spark, TestSpark.tmpDir("audio_index_never_built"), targetFiles = 2))

    // but a MISSING store root (mistyped path / never-built store)
    // fails loudly instead of no-opping on every maintenance tick
    intercept[IllegalArgumentException] {
      AudioIndex.compactIfFragmented(
        spark, TestSpark.tmpDir("audio_index_root") + "/nope",
        targetFiles = 2)
    }
  }
}
