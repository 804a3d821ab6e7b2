package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd

class ScdSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private type Row5 = (Long, String, Long, Option[Long], Boolean)

  private def state(rows: Row5*) =
    rows.toDF("k", "seg", "valid_from", "valid_to", "is_current")

  private def collect(df: org.apache.spark.sql.DataFrame): Set[Row5] =
    df.as[Row5].collect().toSet

  test("merge: change versions, no-op suppressed, new key inserted, history untouched") {
    val s = state(
      (1L, "A", 0L, None, true),
      (1L, "Z", -5L, Some(0L), false), // closed history — must pass through
      (3L, "C", 0L, None, true)) // untouched open key
    val u = Seq(
      (1L, "B", 10L), // real change
      (1L, "B", 20L), // no-op churn vs ts-10 version — suppressed
      (2L, "N", 5L)). // brand-new key
      toDF("k", "seg", "ts")
    val got = collect(Scd.mergeScd2(s, u, "k", "ts", Seq("seg")))
    assert(got == Set(
      (1L, "Z", -5L, Some(0L), false),
      (1L, "A", 0L, Some(10L), false), // closed by the change
      (1L, "B", 10L, None, true),
      (2L, "N", 5L, None, true),
      (3L, "C", 0L, None, true)))
  }

  test("change-back creates a version; suppression compares against the standing version") {
    val s = state((1L, "A", 0L, None, true))
    val u = Seq((1L, "A", 5L), (1L, "B", 10L), (1L, "A", 20L)).toDF("k", "seg", "ts")
    val got = collect(Scd.mergeScd2(s, u, "k", "ts", Seq("seg")))
    // A@5 is a no-op vs the open A@0; B@10 versions; A@20 is a real
    // change BACK (differs from standing B)
    assert(got == Set(
      (1L, "A", 0L, Some(10L), false),
      (1L, "B", 10L, Some(20L), false),
      (1L, "A", 20L, None, true)))
  }

  test("re-merging the same batch is a no-op (idempotent maintenance)") {
    val s = state((1L, "A", 0L, None, true), (2L, "C", 0L, None, true))
    val u = Seq((1L, "B", 10L)).toDF("k", "seg", "ts")
    val once = Scd.mergeScd2(s, u, "k", "ts", Seq("seg"))
    val twice = Scd.mergeScd2(once, u, "k", "ts", Seq("seg"))
    assert(collect(once) == collect(twice))
  }

  test("null-safe attribute compare: null → value and value → null both version") {
    val s = state((1L, null, 0L, None, true))
    val u = Seq((1L, Some("B"), 10L), (1L, None, 20L))
      .toDF("k", "seg", "ts")
    val got = collect(Scd.mergeScd2(s, u, "k", "ts", Seq("seg")))
    assert(got == Set(
      (1L, null, 0L, Some(10L), false),
      (1L, "B", 10L, Some(20L), false),
      (1L, null, 20L, None, true)))
    // and null → null is suppressed
    val noop = Seq((1L, Option.empty[String], 10L)).toDF("k", "seg", "ts")
    assert(collect(Scd.mergeScd2(s, noop, "k", "ts", Seq("seg"))) ==
      Set((1L, null, 0L, None, true)))
  }

  test("untouched keys stay out of the merge window (batch-bounded plan)") {
    val s = state((1L, "A", 0L, None, true), (2L, "C", 0L, None, true))
    val u = Seq((1L, "B", 10L)).toDF("k", "seg", "ts")
    val plan = Scd.mergeScd2(s, u, "k", "ts", Seq("seg"))
      .queryExecution.executedPlan.toString
    // batch keys reach the state via BROADCAST semi/anti joins — the
    // state is never shuffled to meet the batch
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast key pruning:\n$plan")
  }

  test("large batch: above maxBroadcastKeys the merge degrades to shuffle joins, same result") {
    val s = state(
      (1L, "A", 0L, None, true),
      (1L, "Z", -5L, Some(0L), false),
      (3L, "C", 0L, None, true))
    val u = Seq((1L, "B", 10L), (2L, "N", 5L)).toDF("k", "seg", "ts")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // hints are the only broadcast source with the threshold off
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Scd.mergeScd2(s, u, "k", "ts", Seq("seg"), maxBroadcastKeys = 0L)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"maxBroadcastKeys=0 must not force a broadcast:\n$plan")
      assert(collect(df) == collect(Scd.mergeScd2(s, u, "k", "ts", Seq("seg"))),
        "shuffle-join path must produce the broadcast path's exact output")
      val late = Scd.lateUpdates(s, u, "k", "ts", maxBroadcastKeys = 0L)
      assert(late.queryExecution.executedPlan.toString.indexOf("BroadcastHashJoin") < 0)
      assert(late.count() == 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("late update (ts < open valid_from) is dropped, never overlaps closed history") {
    val s = state(
      (1L, "Z", -5L, Some(0L), false), // closed: covers [-5, 0)
      (1L, "A", 0L, None, true))       // open since 0
    // ts=-3 lands inside the CLOSED row's interval — merging it would
    // open a version overlapping [-5, 0); it must be dropped, and the
    // on-time update must still merge normally
    val u = Seq((1L, "L", -3L), (1L, "B", 10L)).toDF("k", "seg", "ts")
    val got = collect(Scd.mergeScd2(s, u, "k", "ts", Seq("seg")))
    assert(got == Set(
      (1L, "Z", -5L, Some(0L), false), // closed history byte-identical
      (1L, "A", 0L, Some(10L), false),
      (1L, "B", 10L, None, true)))
    // no two versions of a key may overlap: for sorted intervals,
    // each valid_to must equal the next valid_from
    val ivs = got.toSeq.sortBy(_._3).map(r => (r._3, r._4))
    ivs.sliding(2).foreach {
      case Seq((_, Some(hi)), (lo2, _)) => assert(hi == lo2, s"gap/overlap at $hi vs $lo2")
      case _ =>
    }
    // the auditor surfaces exactly the dropped row
    val late = Scd.lateUpdates(s, u, "k", "ts")
      .as[(Long, String, Long)].collect().toSeq
    assert(late == Seq((1L, "L", -3L)))
    // a batch that is ENTIRELY late leaves the state byte-identical
    val allLate = Seq((1L, "L", -4L)).toDF("k", "seg", "ts")
    assert(collect(Scd.mergeScd2(s, allLate, "k", "ts", Seq("seg"))) == collect(s))
  }
}
