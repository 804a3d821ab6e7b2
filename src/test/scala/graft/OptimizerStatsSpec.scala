package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.OptimizerStats

class OptimizerStatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("equiHeightHistogram: equal-count bins, tie-safe boundaries") {
    val h = OptimizerStats.equiHeightHistogram(
      (1L to 8L).toDF("v"), "v", bins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(h.toSeq == Seq(
      (0L, 1.0, 2.0, 2L, 2L), (1L, 3.0, 4.0, 2L, 2L),
      (2L, 5.0, 6.0, 2L, 2L), (3L, 7.0, 8.0, 2L, 2L)))
    // heavy ties: the rank cut is deterministic because order
    // statistics are — both bins get exactly half the mass
    val t = OptimizerStats.equiHeightHistogram(
      Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L).toDF("v"), "v", bins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(t.toSeq == Seq((0L, 1.0, 1.0, 4L), (1L, 2.0, 2.0, 4L)))
    intercept[IllegalArgumentException] {
      OptimizerStats.equiHeightHistogram(Seq(1L).toDF("v"), "v", 0)
    }
  }

  test("equiHeightHistogram: a value straddling a bin boundary splits by rank, exactly") {
    // r21 distinct-value rewrite: value 3 occupies ranks 6..8 of n=8 at
    // bins=3 — rank 6 lands in bin 1, ranks 7..8 in bin 2, so bin 1
    // mixes values {2, 3} (ndv 2) and bin 2 holds 2 rows of value 3
    val h = OptimizerStats.equiHeightHistogram(
      Seq(1L, 1L, 1L, 2L, 2L, 3L, 3L, 3L).toDF("v"), "v", bins = 3)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(h.toSeq == Seq(
      (0L, 1.0, 1.0, 3L, 1L),
      (1L, 2.0, 3.0, 3L, 2L),
      (2L, 3.0, 3.0, 2L, 1L)))
    // n < bins: sparse bins, one row each, never a crash
    val s = OptimizerStats.equiHeightHistogram(
      Seq(5L, 7L).toDF("v"), "v", bins = 4)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(s.toSeq == Seq((0L, 1L), (2L, 1L)))
  }

  test("rangeSelectivityReport: uniform-within-bin estimate vs truth") {
    val df = (1L to 100L).toDF("v")
    // bins over 1..100 at 4: [1,25] [26,50] [51,75] [76,100], 25 each.
    // pred [20, 30): bin0 gives 25·(25−20)/24, bin1 gives 25·(30−26)/24
    //   -> est = 225/24 = 9.375; actual = |{20..29}| = 10
    val r = OptimizerStats.rangeSelectivityReport(
      df, "v", bins = 4, predicates = Seq((20.0, 30.0), (1.0, 101.0)))
      .orderBy("pred_lo").collect()
      .map(x => (x.getDouble(0), x.getDouble(2), x.getLong(3), x.getDouble(4)))
    assert(r(1) == ((20.0, 9.375, 10L, -0.0625)))
    // full-range predicate: every bin fully covered -> exact
    assert(r(0) == ((1.0, 100.0, 100L, 0.0)))
    intercept[IllegalArgumentException] {
      OptimizerStats.rangeSelectivityReport(df, "v", 4, Seq((5.0, 5.0)))
    }
  }

  test("rangeSelectivityReport: single-value bin is all-or-nothing") {
    val df = Seq(1L, 1L, 1L, 1L, 9L, 9L, 9L, 9L).toDF("v")
    val rows = OptimizerStats.rangeSelectivityReport(
      df, "v", bins = 2, predicates = Seq((0.0, 2.0), (2.0, 9.0)))
      .orderBy("pred_lo").collect()
    val r = rows.map(x => (x.getDouble(0), x.getDouble(2), x.getLong(3)))
    assert(r(0) == ((0.0, 4.0, 4L)))  // bin {1} inside [0,2)
    assert(r(1) == ((2.0, 0.0, 0L)))  // bin {9} outside [2,9) (half-open)
    // a zero-truth predicate has no relative error — NULL, not ±∞
    assert(!rows(0).isNullAt(4) && rows(1).isNullAt(4))
  }

  test("joinCardinalityEstimate: System-R formula vs per-key-count truth") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 4L).toDF("k")
    val r = OptimizerStats.joinCardinalityEstimate(a, "k", b, "k", "t").head
    assert(r.getString(0) == "t")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 4L, 3L, 3L)))
    assert(r.getDouble(5) == 5.3333)       // 16/3 rounded 4
    assert(r.getLong(6) == 4L)             // 2·1 + 1·2
    assert(math.abs(r.getDouble(7) - 0.75) < 1e-4) // 4 / (16/3)
    // disjoint key sets -> actual 0, ratio 0
    val d = OptimizerStats.joinCardinalityEstimate(
      Seq(1L).toDF("k"), "k", Seq(2L).toDF("k"), "k", "d").head
    assert(d.getLong(6) == 0L && d.getDouble(7) == 0.0)
  }
}
