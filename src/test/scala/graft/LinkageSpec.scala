package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Linkage
import graft.ops.Linkage.Field

class LinkageSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fellegiSunter: per-field evidence sums, bands, null = disagreement") {
    val a = Seq(
      (1L, Some("alice"), 10.0, "X"),
      (2L, Some("bob"), 20.0, "X"),
      (3L, Some("carol"), 30.0, "Y"),
      (4L, Option.empty[String], 40.0, "Y"))
      .toDF("id", "name", "bal", "seg")
    val b = Seq(
      (11L, "alice", 10.2, "X"),  // both agree with 1
      (12L, "zed", 20.1, "X"),    // bal-only with 2
      (13L, "carol", 99.0, "Y"),  // name-only with 3
      (14L, "dave", 40.0, "Y"))   // bal agrees with 4, name NULL side
      .toDF("id", "name", "bal", "seg")
    val fields = Seq(
      Field("name", col("a_name") === col("b_name"), m = 0.95, u = 0.005),
      Field("bal", abs(col("a_bal") - col("b_bal")) <= 0.5, m = 0.9, u = 0.1))
    // wn = ln(190) ≈ 5.25, wnD ≈ −2.99, wb = ln(9) ≈ 2.20, wbD ≈ −2.20
    val wn = math.log(0.95 / 0.005); val wnD = math.log(0.05 / 0.995)
    val wb = math.log(0.9 / 0.1); val wbD = math.log(0.1 / 0.9)
    val got = Linkage.fellegiSunter(a, b, "id", "seg", fields,
        upper = 4.0, lower = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getDouble(4),
          r.getString(5)))).toMap
    // blocking: only same-segment pairs exist (2 × 2 per segment)
    assert(got.size == 8)
    assert(got((1L, 11L)) == ((true, true, r6(wn + wb), "match")))
    assert(got((2L, 12L)) == ((false, true, r6(wnD + wb), "possible")))
    assert(got((3L, 13L)) == ((true, false, r6(wn + wbD), "possible")))
    // NULL name evaluates as DISAGREEMENT, not agreement
    assert(got((4L, 14L)) == ((false, true, r6(wnD + wb), "possible")))
    assert(got((3L, 14L))._4 == "non_match")
    // guards: m must exceed u, thresholds ordered, fields non-empty
    intercept[IllegalArgumentException] {
      Field("bad", lit(true), m = 0.1, u = 0.5)
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(a, b, "id", "seg", Seq.empty, 1.0, 0.0)
    }
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(a, b, "id", "seg", fields, 0.0, 1.0)
    }
  }

  test("hot-block fence: one oversized block fails loudly, names the key") {
    // segment X: 3 × 3 = 9 pairs, Y: 1 × 1 — a cap of 8 must trip on X
    // and say so; null block keys never form pairs, so they are exempt
    val a = Seq((1L, "p", Option("X")), (2L, "q", Option("X")),
      (3L, "r", Option("X")), (4L, "s", Option("Y")),
      (5L, "t", Option.empty[String])).toDF("id", "name", "seg")
    val b = Seq((11L, "p", Option("X")), (12L, "q", Option("X")),
      (13L, "r", Option("X")), (14L, "s", Option("Y")),
      (15L, "t", Option.empty[String])).toDF("id", "name", "seg")
    val fields = Seq(
      Field("name", col("a_name") === col("b_name"), m = 0.9, u = 0.1))
    val e = intercept[IllegalArgumentException] {
      Linkage.fellegiSunter(a, b, "id", "seg", fields,
        upper = 1.0, lower = -1.0, maxBlockPairs = 8L)
    }
    assert(e.getMessage.contains("'X'") && e.getMessage.contains("9"),
      s"fence must name the hot key and its pair count: ${e.getMessage}")
    // at-the-cap blocks pass (9 ≤ 9), and the result is the plain
    // blocked scoring — the fence never changes answers, only fails
    val ok = Linkage.fellegiSunter(a, b, "id", "seg", fields,
      upper = 1.0, lower = -1.0, maxBlockPairs = 9L)
    assert(ok.count() == 9 + 1)
    // explicit opt-out skips the audit pass entirely
    assert(Linkage.fellegiSunter(a, b, "id", "seg", fields,
      upper = 1.0, lower = -1.0, maxBlockPairs = Long.MaxValue).count() == 10)
  }
}
