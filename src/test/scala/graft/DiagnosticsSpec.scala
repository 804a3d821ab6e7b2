package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Diagnostics

class DiagnosticsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("skewReport: hand-computed shares/skew/salt; deterministic tie-break; top-k honored") {
    // keys: a×6, b×2, c×2, d×1, e×1 → 12 rows over 5 keys, mean 2.4
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq("d", "e")).toDF("k")
    val got = Diagnostics.skewReport(df, "k", topK = 3)
      .as[(String, Long, Double, Double, Double, Long)].collect()
    assert(got.length == 3)
    // a: n=6, share 0.5, mean 2.4, skew 2.5, salt ceil(1.25)=2
    assert(got(0) == (("a", 6L, 0.5, 2.4, 2.5, 2L)))
    // b and c tie at n=2 → key-ascending order; skew 2/2.4 = 0.833333
    assert(got(1) == (("b", 2L, 0.166667, 2.4, 0.833333, 1L)))
    assert(got(2) == (("c", 2L, 0.166667, 2.4, 0.833333, 1L)))
  }

  test("skewReport: uniform keys read skew 1.0, salt 1") {
    val df = Seq("x", "y", "z").toDF("k")
    val got = Diagnostics.skewReport(df, "k", topK = 5)
      .as[(String, Long, Double, Double, Double, Long)].collect()
    assert(got.length == 3, "topK beyond the key space returns all keys")
    assert(got.forall(r => r._5 == 1.0 && r._6 == 1L))
  }

  test("skewReport plan: TakeOrdered top-k, no global sort of the key space") {
    val orders = TestSpark.table("orders")
    val plan = Diagnostics.skewReport(orders, "o_custkey", topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject, got:\n$plan")
    assert(!plan.contains("Sort [n"), s"no global sort allowed:\n$plan")
  }
}
