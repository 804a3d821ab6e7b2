package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ranges

class RangesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("range join boundaries: start inclusive, end exclusive, bucket-edge intervals") {
    val points = Seq(
      (1L, ts(100), "p_at_start"),
      (1L, ts(150), "p_inside"),
      (1L, ts(200), "p_at_end"),
      (1L, ts(3600), "p_on_bucket_edge"),
      (2L, ts(150), "p_wrong_key"))
      .toDF("k", "ts", "name")
    val intervals = Seq(
      (1L, ts(100), ts(200), "iv1"),
      (1L, ts(3000), ts(3600), "iv_ends_on_edge"), // end exclusive at bucket edge
      (1L, ts(3500), ts(4000), "iv_spans_edge"))
      .toDF("k", "start_ts", "end_ts", "iv")
    val out = Ranges.rangeJoin(points, intervals, Seq("k"), "ts",
      "start_ts", "end_ts", bucketWidthSeconds = 3600)
      .select("name", "iv").as[(String, String)].collect().toSet
    assert(out == Set(
      ("p_at_start", "iv1"),
      ("p_inside", "iv1"),
      ("p_on_bucket_edge", "iv_spans_edge")))
  }

  test("bucketed range join equals the brute-force theta join on real events") {
    val ev = graft.io.Layers.readEvents(spark, s"${TestSpark.sfDir}/events.parquet")
    val win = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("end_ts"))
    val points = ev.select(col("user_id"), col("ts"), col("event_id"))
    val bucketed = Ranges.rangeJoin(points, win, Seq("user_id"), "ts",
      "start_ts", "end_ts", bucketWidthSeconds = 1800)
      .select("purchase_id", "event_id").as[(Long, Long)].collect().toSet
    val brute = points.join(win, Seq("user_id"))
      .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("purchase_id", "event_id").as[(Long, Long)].collect().toSet
    assert(bucketed == brute)
    assert(bucketed.nonEmpty)
  }

  test("random intervals: bucketed result == brute force for several bucket widths") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val points = Seq.tabulate(300)(i =>
        (rnd.nextInt(5).toLong, ts(rnd.nextInt(10000)), i.toLong))
        .toDF("k", "ts", "pid")
      val intervals = Seq.tabulate(50) { i =>
        val start = rnd.nextInt(9000)
        (rnd.nextInt(5).toLong, ts(start), ts(start + 1 + rnd.nextInt(2000)), i.toLong)
      }.toDF("k", "start_ts", "end_ts", "iv")
      val brute = points.join(intervals, Seq("k"))
        .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
        .select("pid", "iv").as[(Long, Long)].collect().toSet
      for (width <- Seq(100L, 777L, 5000L)) {
        val bucketed = Ranges.rangeJoin(points, intervals, Seq("k"), "ts",
          "start_ts", "end_ts", width)
          .select("pid", "iv").as[(Long, Long)].collect().toSet
        assert(bucketed == brute, s"seed=$seed width=$width")
      }
    }
  }

  test("inverted interval (end <= start) matches nothing instead of exploding") {
    val points = Seq((1L, ts(150), 1L)).toDF("k", "ts", "event_id")
    val intervals = Seq(
      // end WAY before start: sequence(b0, b1) would be a huge DESCENDING
      // bucket array without the guard
      (1L, ts(100000000), ts(0), 10L),
      (1L, ts(100), ts(100), 11L), // empty interval
      (1L, ts(100), ts(200), 12L)) // sane control
      .toDF("k", "start_ts", "end_ts", "iv")
    val out = Ranges.rangeJoin(points, intervals, Seq("k"), "ts",
      "start_ts", "end_ts", bucketWidthSeconds = 3600)
      .select("event_id", "iv").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 12L)))
  }

  test("no nested-loop join in the bucketed plan") {
    val points = Seq((1L, ts(100), 1L)).toDF("k", "ts", "event_id")
    val intervals = Seq((1L, ts(50), ts(150), 10L)).toDF("k", "start_ts", "end_ts", "iv")
    val plan = Ranges.rangeJoin(points, intervals, Seq("k"), "ts",
      "start_ts", "end_ts", 3600).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"must be an equi-join plan:\n$plan")
  }
}
