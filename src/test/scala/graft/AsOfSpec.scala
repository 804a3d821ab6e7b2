package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  test("asofJoin attaches the latest right row at or before the left ts, per key") {
    val left = Seq(
      (1L, ts(5), "e1"), (1L, ts(10), "e2"), (1L, ts(20), "e3"),
      (2L, ts(7), "e4"), (3L, ts(9), "e5"))
      .toDF("k", "ts", "name")
    val right = Seq(
      (1L, ts(10), 100L, 1.5), // equal-ts: must match e2 (>= convention)
      (1L, ts(12), 101L, 2.5),
      (2L, ts(1), 200L, 9.0))
      .toDF("k", "ts", "rid", "rv")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"))
      .select("name", "rid", "rv").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("e1") == ((None, None)), "before any right row → nulls")
    assert(out("e2") == ((Some(100L), Some(1.5))), "ts tie matches (>= semantics)")
    assert(out("e3") == ((Some(101L), Some(2.5))), "latest prior wins")
    assert(out("e4") == ((Some(200L), Some(9.0))))
    assert(out("e5") == ((None, None)), "key with no right rows at all")
  }

  test("payload columns always come from the SAME matched row (struct fill)") {
    val left = Seq((1L, ts(10), "e")).toDF("k", "ts", "name")
    // earlier row has a null payload field that a naive per-column
    // last(ignoreNulls) would wrongly backfill from
    val right = Seq(
      (1L, ts(1), Option(7L), Option(1.0)),
      (1L, ts(5), Option(8L), None: Option[Double]))
      .toDF("k", "ts", "rid", "rv")
    val r = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"))
      .select("rid", "rv").collect()(0)
    assert(r.getLong(0) == 8L)
    assert(r.isNullAt(1), "null field of the matched row must NOT be backfilled")
  }

  test("random data: asofJoin == brute force") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.tabulate(200)(i =>
        (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000)), i.toLong))
        .toDF("k", "ts", "lid")
      val rightRows = Seq.tabulate(60)(i =>
        (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000)), i.toLong))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique per (k, ts)
      val right = rightRows.toDF("k", "ts", "rid")
      val out = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rid"))
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val rByK = rightRows.groupBy(_._1)
      left.collect().foreach { r =>
        val (k, t, lid) = (r.getLong(0), r.getTimestamp(1), r.getLong(2))
        val expected = rByK.getOrElse(k, Seq.empty)
          .filter(!_._2.after(t)).sortBy(_._2.getTime).lastOption.map(_._3)
        assert(out(lid) == expected, s"seed=$seed lid=$lid")
      }
    }
  }

  test("asofJoin on real events matches a per-user brute force") {
    val ev = graft.io.Layers.readEvents(spark, s"${TestSpark.sfDir}/events.parquet")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"))
    val out = AsOf.asofJoin(
      ev.select("event_id", "user_id", "ts"), purchases,
      Seq("user_id"), "ts", Seq("purchase_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.get(r.fieldIndex("purchase_id"))).map(_.asInstanceOf[Long])).toMap
    val events = ev.select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val ps = purchases.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.size == events.length)
    events.foreach { case (eid, uid, t) =>
      val expected = ps.getOrElse(uid, Array.empty)
        .filter(!_._2.after(t))
        .sortBy(_._2.getTime)
        .lastOption.map(_._3)
      assert(out(eid) == expected, s"event $eid")
    }
  }
}
