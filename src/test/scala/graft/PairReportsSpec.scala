package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PairReports

class PairReportsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("healed: tied batch mtimes never early-stop past an unfolded batch") {
    // three committed batches; A and C are fully folded, B is inside
    // the crash window (its sources are still fresh). ALL dir mtimes
    // are forced EQUAL — the object-store / coarse-granularity regime
    // where "newest-first" ordering is arbitrary: the scan must still
    // find B because ties are examined, only STRICTLY older batches
    // stop it.
    val base = TestSpark.tmpDir("pair_reports_ties")
    val idx = s"$base/index"
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = Seq(("x", "y", 1L)).toDF("id_a", "id_b", "hamming").schema
    def mkBatch(tag: String, ids: Seq[String], sources: Seq[String],
        pairs: Seq[(String, String, Long)]): Path = {
      val b = new Path(s"$idx/batch=$tag")
      ids.toDF("media_id").write.mode("overwrite").parquet(b.toString)
      PairReports.persist(
        pairs.toDF("id_a", "id_b", "hamming"), idx, tag, sources)
      b
    }
    val a = mkBatch("a", Seq("a1"), Seq(s"$base/s1.parquet"), Nil)
    val b = mkBatch("b", Seq("b1", "b2"), Seq(s"$base/s2.parquet"),
      Seq(("b1", "b2", 0L)))
    val c = mkBatch("c", Seq("c1"), Seq(s"$base/s3.parquet"), Nil)
    // force every surface the scan could order by to the same instant
    Seq(a, b, c).foreach(p => fs.setTimes(p, 1000000L, 1000000L))
    val fresh = Seq(s"$base/s2.parquet") // only B's sources are unfolded
    val freshIds = Seq("b1", "b2").toDF("media_id")
    val healed = PairReports.healed(spark, idx, Seq(a, b, c), fresh,
      freshIds, schema)
    assert(healed.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("b1", "b2")),
      "the unfolded batch must heal even when mtimes give no order")
    // and a folded-only fresh set heals nothing
    assert(PairReports.healed(spark, idx, Seq(a, b, c),
      Seq(s"$base/other.parquet"), Seq.empty[String].toDF("media_id"),
      schema).count() == 0)
  }

  test("healed: truncated sidecars re-derive, backfill is non-empty, vanished dirs skip") {
    val base = TestSpark.tmpDir("pair_reports_backfill")
    val idx = s"$base/index"
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = Seq(("x", "y", 1L)).toDF("id_a", "id_b", "hamming").schema
    def mkBatch(tag: String, ids: Seq[String], sources: Seq[String],
        pairs: Seq[(String, String, Long)]): Path = {
      val b = new Path(s"$idx/batch=$tag")
      ids.toDF("media_id").write.mode("overwrite").parquet(b.toString)
      PairReports.persist(
        pairs.toDF("id_a", "id_b", "hamming"), idx, tag, sources)
      b
    }
    def sidecar(tag: String) = new Path(s"$idx/pairs/batch=$tag", "_graft_sources")
    def readSidecar(tag: String): String = {
      val in = fs.open(sidecar(tag))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    // batch inside the window, but its sidecar was CRASH-TRUNCATED to
    // zero bytes (the r19 advice failure): the scan must NOT read the
    // empty file as "verified folded" — it falls back to the legacy
    // id-overlap test, heals the batch, and backfills a non-empty
    // sidecar holding the fresh set
    val w = mkBatch("w", Seq("w1", "w2"), Seq(s"$base/sw.parquet"),
      Seq(("w1", "w2", 0L)))
    fs.create(sidecar("w"), true).close() // truncate
    val healed = PairReports.healed(spark, idx, Seq(w),
      Seq(s"$base/sw.parquet"), Seq("w1", "w2").toDF("media_id"), schema)
    assert(healed.collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("w1", "w2")),
      "a zero-byte sidecar must re-derive via the legacy test, not read as folded")
    assert(readSidecar("w").trim == s"$base/sw.parquet",
      "in-window backfill records the fresh set")
    // folded legacy batch: sidecar removed entirely → legacy test says
    // folded → backfill must be the NON-EMPTY token (distinguishable
    // from truncation), and the batch stays out of the window
    val f = mkBatch("f", Seq("f1"), Seq(s"$base/sf.parquet"), Nil)
    fs.delete(sidecar("f"), false)
    assert(PairReports.healed(spark, idx, Seq(f),
      Seq(s"$base/other.parquet"), Seq.empty[String].toDF("media_id"),
      schema).count() == 0)
    val tok = readSidecar("f").trim
    assert(tok.nonEmpty && tok != s"$base/other.parquet",
      "folded backfill writes a non-empty token, never an empty file")
    // a batch dir deleted between listing and stat must be skipped,
    // not abort the drain
    val gone = new Path(s"$idx/batch=gone")
    assert(PairReports.healed(spark, idx, Seq(gone, w),
      Seq(s"$base/sw.parquet"), Seq("w1", "w2").toDF("media_id"),
      schema).count() == 1)
  }
}
