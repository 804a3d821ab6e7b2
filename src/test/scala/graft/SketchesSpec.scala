package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("KMinValues aggregator: dedup, bound, exact-below-k, merge order-independence") {
    val kmv = Sketches.KMinValues(4)
    val z = kmv.zero
    val buf = Seq(0.5, 0.2, 0.5, 0.9, 0.1, 0.3).foldLeft(z)(kmv.reduce)
    assert(buf.toSeq == Seq(0.1, 0.2, 0.3, 0.5), "sorted 4 smallest distinct")
    // below k → exact count
    val small = Seq(0.7, 0.7, 0.4).foldLeft(kmv.zero)(kmv.reduce)
    assert(kmv.finish(small) == 2.0)
    // at/above k → (k-1)/h_k
    assert(kmv.finish(buf) == 3.0 / 0.5)
    // merge = same result regardless of how rows were partitioned
    val all = (1 to 100).map(i => i / 101.0)
    val (l, r) = all.splitAt(37)
    val merged = kmv.merge(l.foldLeft(kmv.zero)(kmv.reduce), r.foldLeft(kmv.zero)(kmv.reduce))
    assert(merged.toSeq == all.sorted.take(4))
  }

  test("kmvDistinct estimates within 20% of exact on real data, and is deterministic") {
    val orders = TestSpark.table("orders")
    val r1 = Sketches.kmvDistinct(orders, "o_custkey", 64, calibrate = true).collect()(0)
    val est = r1.getDouble(0)
    val exact = r1.getLong(1)
    assert(exact > 64, "fixture must exercise the estimation path")
    assert(math.abs(est - exact) / exact < 0.2, s"est=$est exact=$exact")
    val r2 = Sketches.kmvDistinct(orders, "o_custkey", 64, calibrate = true).collect()(0)
    assert(r1 == r2)
  }

  test("kmvDistinct is exact when cardinality < k") {
    val df = Seq.tabulate(50)(i => i % 10).toDF("v")
    val r = Sketches.kmvDistinct(df, "v", 256, calibrate = true).collect()(0)
    assert(r.getDouble(0) == 10.0)
    assert(r.getLong(1) == 10L)
  }

  test("cmsTopTokens: estimates never undercount, and are exact when width kills collisions") {
    val docs = TestSpark.table("documents")
    val narrow = Sketches.cmsTopTokens(docs, "text", k = 10, depth = 3, width = 32).collect()
    assert(narrow.length == 10)
    narrow.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS must never underestimate: ${r.getString(0)} est=${r.getLong(2)} exact=${r.getLong(1)}")
    }
    // a huge width makes collisions vanishingly unlikely on a tiny
    // vocabulary → every estimate collapses to the exact count
    val wide = Sketches.cmsTopTokens(docs, "text", k = 10, depth = 3, width = 1 << 20).collect()
    wide.foreach(r => assert(r.getLong(2) == r.getLong(1)))
    // deterministic: same rows both runs
    val rerun = Sketches.cmsTopTokens(docs, "text", k = 10, depth = 3, width = 32).collect()
    assert(narrow.map(_.toString).sorted.toSeq == rerun.map(_.toString).sorted.toSeq)
  }

  test("default (production) path is sketch-only: one aggregate, no distinct shuffle") {
    val orders = TestSpark.table("orders")
    val df = Sketches.kmvDistinct(orders, "o_custkey", 64)
    assert(df.columns.toSeq == Seq("est_distinct"))
    val plan = df.queryExecution.executedPlan.toString
    // the exact twin would show up as a count(distinct ...) aggregate and
    // a second join — the sketch-only plan has neither
    assert(!plan.toLowerCase.contains("count(distinct"), plan)
    assert(!plan.contains("Join"), plan)
    val est = df.collect()(0).getDouble(0)
    val exact = orders.select(count_distinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(math.abs(est - exact) / exact < 0.2)
  }

  test("kmvSetCardinalities: exact below k; union/intersection algebra consistent") {
    import TestSpark.spark.implicits._
    // 60 and 80 distinct keys with a 40-key overlap — well under
    // k = 256, so every sketch holds its full set and the estimates
    // are EXACT set cardinalities
    val a = (0 until 60).map(_.toLong).toDF("k")
    val b = (20 until 100).map(_.toLong).toDF("k")
    val r = Sketches.kmvSetCardinalities(a, "k", b, "k", k = 256)
      .collect().head
    assert(r.getDouble(0) == 60.0 && r.getDouble(1) == 80.0)
    assert(r.getDouble(2) == 100.0, "union exact below k")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == 0.4, "jaccard 40/100 from full sketches")
    assert(r.getDouble(4) == r6(0.4 * 100.0), "intersection = J * union")
    // at-scale estimates stay within the bottom-k error envelope
    val big = TestSpark.table("orders")
    val ts = col("o_orderdate")
    val cut = lit("1996-01-01 00:00:00").cast("timestamp")
    val est = Sketches.kmvSetCardinalities(
      big.filter(ts < cut), "o_custkey",
      big.filter(ts >= cut), "o_custkey", k = 128).collect().head
    val exact = big.select(count_distinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(est.getDouble(2) - exact) / exact < 0.3,
      s"union estimate ${est.getDouble(2)} vs exact $exact")
    assert(est.getDouble(4) <= est.getDouble(0) + 1e-9 ||
      est.getDouble(4) <= est.getDouble(1) + 1e-9,
      "intersection cannot exceed both sides")
  }
}
