package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/**
 * Structured-Streaming extension over the `events` table (north-star;
 * the reference is batch-only — SURVEY §2.12 — its "stream" is a daily
 * cron). Demonstrates the streaming shapes a production ingest needs:
 * watermarked tumbling-window aggregation, streaming dedup within the
 * watermark, and custom sessionization state.
 *
 * Batch twins of the window aggregations live in `SparkEntry.queries`
 * (oracle-checkable); streaming runs are exercised by ScalaTest via the
 * file source on a bounded directory.
 *
 * Scale notes: state store size is bounded by the watermark horizon;
 * shuffle partitioning for the windowed agg is keyed on
 * (window, event_type) which is low-cardinality → at 1000 executors
 * you'd add the user_id to the grouping or salt the window key.
 */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event files. */
  def readEventStream(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** Watermarked tumbling-window aggregation:
    * per (1-hour window, event_type) counts and value sums, tolerating
    * 30 minutes of lateness before state eviction. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming dedup on event_id within the watermark horizon —
    * at-least-once source → effectively-once downstream. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessionState(start: Long, last: Long, events: Int, value: Double)
  final case class SessionOut(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /**
   * Custom sessionization: 30-minute-inactivity sessions per user via
   * `flatMapGroupsWithState` with event-time timeout — the state shape
   * Spark's built-in `session_window` can't express when you need
   * per-session custom payloads.
   */
  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", "30 minutes")
      .as[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.events, s.value))
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { r =>
              val t = r._2.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, events = s.events + 1, value = s.value + r._5))
                case Some(s) =>
                  closed += SessionOut(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.events, s.value)
                  cur = Some(SessionState(t, t, 1, r._5))
                case None =>
                  cur = Some(SessionState(t, t, 1, r._5))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
      .toDF()
  }

  /**
   * Stream-stream interval join: every event joined to the SAME user's
   * purchases that happened in the `windowMinutes` before it — the
   * attribution/feature-join shape ("which purchase preceded this
   * click"). This is the one streaming join Spark supports with BOUNDED
   * state: both sides carry watermarks and the join condition bounds
   * event time on both sides, so each side's state store evicts rows
   * older than (watermark + window) instead of growing forever. An
   * unbounded-condition stream-stream join is refused by Spark for
   * exactly that reason — the time bound is not an optimization, it is
   * what makes the join runnable at all.
   *
   * Inner join ⇒ results emit as soon as both sides arrive; the
   * watermark only governs state eviction and late-data tolerance.
   */
  def purchasesBeforeEvents(
      events: DataFrame, purchases: DataFrame, windowMinutes: Int = 120): DataFrame = {
    val ev = events
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "30 minutes")
    val pu = purchases
      .select(
        col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withWatermark("p_ts", "30 minutes")
    ev.join(
      pu,
      col("user_id") === col("p_user_id") &&
        col("p_ts") <= col("ts") &&
        col("p_ts") >= col("ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select("event_id", "user_id", "purchase_id", "purchase_value")
  }

  /** Drive a stream to a memory sink until no more input (test/demo). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append())
      : StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()
}
