package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Streaming shapes over a bounded file-source directory, asserted
  * against their batch twins. Event-time timeouts only fire when a LATER
  * batch advances the watermark, so the fixture is written as several
  * files consumed one per micro-batch (`maxFilesPerTrigger=1`), with
  * far-future sentinel events pushing the watermark forward. */
class EventsStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private def writeEvents(dir: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

  private def streamFrom(dir: String): DataFrame =
    spark.readStream.schema(EventsStream.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

  // main fixture: u1 has two sessions (gap > 30 min), u2 one session
  private val mainEvents = Seq(
    (1L, ts(600), 1L, "click", 1.0, "{}"),
    (2L, ts(610), 1L, "view", 2.0, "{}"),
    (3L, ts(720), 1L, "click", 4.0, "{}"),
    (4L, ts(605), 2L, "view", 8.0, "{}"))

  test("hourlyByType (complete mode) matches the batch tumbling-window aggregation") {
    val dir = TestSpark.tmpDir("stream_hourly")
    writeEvents(dir, mainEvents)
    val q = EventsStream.runToMemory(
      EventsStream.hourlyByType(streamFrom(dir)), "hourly_test", OutputMode.Complete())
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hourly_test")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start"), col("event_type"), col("n_events"), col("total_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("dedupWithinWatermark drops re-delivered event ids") {
    val dir = TestSpark.tmpDir("stream_dedup")
    writeEvents(dir, mainEvents ++ Seq(
      (1L, ts(600), 1L, "click", 1.0, "{}"), // exact redelivery
      (2L, ts(610), 1L, "view", 2.0, "{}")))
    val q = EventsStream.runToMemory(
      EventsStream.dedupWithinWatermark(streamFrom(dir)), "dedup_test")
    q.processAllAvailable(); q.stop()
    val out = spark.table("dedup_test")
    assert(out.count() == 4)
    assert(out.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("stream-stream interval join matches the batch range join, state bounded") {
    val dir = TestSpark.tmpDir("stream_ssjoin")
    // purchases at t=600 (u1) and t=605 (u2); events within/outside the
    // 120-min attribution window
    val fixture = Seq(
      (10L, ts(600), 1L, "purchase", 50.0, "{}"),
      (11L, ts(605), 2L, "purchase", 70.0, "{}"),
      (1L, ts(610), 1L, "click", 1.0, "{}"), // within window of 10
      (2L, ts(700), 1L, "view", 2.0, "{}"), // within window of 10
      (3L, ts(800), 1L, "click", 3.0, "{}"), // OUTSIDE 120-min window
      (4L, ts(606), 2L, "view", 4.0, "{}"), // within window of 11
      (5L, ts(500), 1L, "view", 5.0, "{}")) // BEFORE the purchase
    writeEvents(dir, fixture)
    val events = streamFrom(dir)
    val purchases = streamFrom(dir).filter(col("event_type") === "purchase")
    val q = EventsStream.runToMemory(
      EventsStream.purchasesBeforeEvents(events, purchases, windowMinutes = 120),
      "ssjoin_test")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssjoin_test")
      .as[(Long, Long, Long, Double)].collect().toSet
    // batch twin: plain inner join with the same time-bound condition
    val b = spark.read.parquet(dir)
    val bp = b.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val batch = b.select("event_id", "user_id", "ts")
      .join(bp, col("user_id") === col("p_user_id") &&
        col("p_ts") <= col("ts") &&
        col("p_ts") >= col("ts") - expr("INTERVAL 120 MINUTES"))
      .select("event_id", "user_id", "purchase_id", "purchase_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch)
    // the fixture's semantics: purchases self-join (within window), the
    // in-window events attributed, out-of-window and before-purchase not
    assert(streamed.contains((1L, 1L, 10L, 50.0)))
    assert(streamed.contains((2L, 1L, 10L, 50.0)))
    assert(!streamed.exists(_._1 == 3L), "event outside the window must not join")
    assert(!streamed.exists(_._1 == 5L), "event before the purchase must not join")
    assert(streamed.contains((4L, 2L, 11L, 70.0)))
  }

  test("sessionize emits 30-min-gap sessions as the watermark passes, matching the batch twin") {
    val dir = TestSpark.tmpDir("stream_sessions")
    writeEvents(dir, mainEvents)
    // two sentinel files, each advancing the watermark one more batch so
    // every main session times out (watermark lags one batch behind data)
    writeEvents(dir, Seq((100L, ts(10000), 99L, "click", 0.0, "{}")))
    writeEvents(dir, Seq((101L, ts(20000), 98L, "click", 0.0, "{}")))
    val q = EventsStream.runToMemory(
      EventsStream.sessionize(spark, streamFrom(dir)), "session_test")
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("session_test")
      .as[(Long, Timestamp, Timestamp, Int, Double)].collect()
      .filter(s => s._1 == 1L || s._1 == 2L).sortBy(s => (s._1, s._2.getTime))
    assert(sessions.toSeq == Seq(
      (1L, ts(600), ts(610), 2, 3.0),
      (1L, ts(720), ts(720), 1, 4.0),
      (2L, ts(605), ts(605), 1, 8.0)))
    // batch twin (q19 logic): same session count per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val batchCounts = spark.read.parquet(dir)
      .filter(col("user_id").isin(1L, 2L))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .groupBy("user_id")
      .agg(sum(when(col("prev").isNull ||
        (col("ts").cast("double") - col("prev").cast("double")) > 1800.0, 1L)
        .otherwise(0L)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    val streamCounts = sessions.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(streamCounts == batchCounts)
  }
}
