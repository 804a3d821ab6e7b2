package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cdc

class CdcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def state(rows: (Long, String)*) = rows.toDF("k", "v")

  private def changes(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "ts", "op", "v")

  private def apply0(s: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame) =
    Cdc.applyCdc(s, c, "k", "ts", "op", Seq("v"))
      .as[(Long, String)].collect().toSet

  test("applyCdc: latest op wins — update, delete, insert, re-insert after delete") {
    val s = state(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    val c = changes(
      (1L, 10L, "U", "a2"),   // plain update
      (2L, 10L, "U", "late"), // update then delete → delete wins
      (2L, 20L, "D", null),
      (3L, 10L, "D", null),   // delete then re-insert → insert wins
      (3L, 20L, "I", "c2"),
      (5L, 10L, "I", "e"),    // brand-new key
      (6L, 10L, "D", null))   // delete of an absent key: no-op
    assert(apply0(s, c) == Set(1L -> "a2", 3L -> "c2", 4L -> "d", 5L -> "e"))
  }

  test("applyCdc: empty changes is identity; idempotent re-apply of the same batch") {
    val s = state(1L -> "a", 2L -> "b")
    assert(apply0(s, changes()) == Set(1L -> "a", 2L -> "b"))
    val c = changes((1L, 10L, "U", "a2"), (2L, 10L, "D", null))
    val once = Cdc.applyCdc(s, c, "k", "ts", "op", Seq("v"))
    val twice = Cdc.applyCdc(once, c, "k", "ts", "op", Seq("v"))
    assert(twice.as[(Long, String)].collect().toSet ==
      once.as[(Long, String)].collect().toSet)
  }

  test("applyCdc tie-break: violated (key, ts) uniqueness resolves deterministically, not to duplicate rows") {
    val s = state(1L -> "a", 2L -> "b", 3L -> "c")
    // key 1: U and D at the same max ts → D wins (op priority), key removed
    // key 2: two U's at the same max ts with different payloads → exactly
    //        one survives, and re-running picks the SAME one (payload-hash
    //        total order)
    // key 3: the same change row replayed twice → one surviving row
    val c = changes(
      (1L, 10L, "U", "a2"), (1L, 10L, "D", null),
      (2L, 10L, "U", "x"), (2L, 10L, "U", "y"),
      (3L, 10L, "U", "c2"), (3L, 10L, "U", "c2"))
    val r1 = apply0(s, c)
    assert(!r1.exists(_._1 == 1L), s"D must beat same-ts U: $r1")
    assert(r1.count(_._1 == 2L) == 1, s"same-ts U/U must yield ONE row: $r1")
    assert(r1.count(_._1 == 3L) == 1 && r1.contains(3L -> "c2"),
      s"replayed identical change must collapse: $r1")
    val r2 = apply0(s, c)
    assert(r1 == r2, s"tie-break must be deterministic: $r1 vs $r2")
  }

  test("applyCdc large batch: above maxBroadcastKeys the prune degrades to a shuffle join") {
    val s = state(1L -> "a", 2L -> "b")
    val c = changes((1L, 10L, "U", "a2"), (3L, 10L, "I", "c"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // hints are the only broadcast source with the threshold off
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Cdc.applyCdc(s, c, "k", "ts", "op", Seq("v"),
        maxBroadcastKeys = 0L)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"maxBroadcastKeys=0 must not force a broadcast:\n$plan")
      assert(df.as[(Long, String)].collect().toSet ==
        Set(1L -> "a2", 2L -> "b", 3L -> "c"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("applyCdc plan: state pruned via broadcast anti-join, winner via single aggregate") {
    val s = TestSpark.table("customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("v"))
    val c = changes((1L, 10L, "U", "x"))
    val plan = Cdc.applyCdc(s, c, "k", "ts", "op", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"state must meet the changed keys via broadcast:\n$plan")
    assert(!plan.contains("Window"), s"winner must be an aggregate, not a window:\n$plan")
  }
}
