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
}
