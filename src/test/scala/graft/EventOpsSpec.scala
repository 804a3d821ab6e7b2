package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

class EventOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

  test("funnel: greedy-earliest chaining, strict order, whole chain inside the anchor window") {
    val events = ev(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L), // completes
      (2L, "view", 0L), (2L, "purchase", 5L), (2L, "click", 10L),  // purchase BEFORE click → stops at click
      (3L, "click", 5L), (3L, "purchase", 6L),                     // no view → never enters
      (4L, "view", 0L), (4L, "click", 500L),                       // click outside the window
      (5L, "view", 0L), (5L, "view", 3L), (5L, "click", 1L))       // click after FIRST view only
    val got = EventOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowSeconds = 100L)
      .as[(String, Int, Long, Double)].collect().sortBy(_._2)
    // entered: u1,u2,u4,u5 = 4; clicked: u1,u2,u5 = 3; purchased: u1 = 1
    assert(got(0) == (("view", 1, 4L, 1.0)))
    assert(got(1) == (("click", 2, 3L, 0.75)))
    assert(got(2) == (("purchase", 3, 1L, 0.25)))
  }

  test("funnel: empty entry step yields zero rows reached, conversions 0") {
    val events = ev((1L, "click", 0L))
    val got = EventOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"), windowSeconds = 10L)
      .as[(String, Int, Long, Double)].collect().sortBy(_._2)
    assert(got(0) == (("view", 1, 0L, 0.0)))
    assert(got(1) == (("click", 2, 0L, 0.0)))
  }

  test("retention: cohort by first-activity period, k counts and rates; duplicate activity collapses") {
    val day = 86400L
    val events = ev(
      (1L, "view", 0L),            // u1 cohort 0 (day 0)
      (1L, "click", 8L * day),     // p1 → k1
      (1L, "view", 19L * day),     // p2 → k2
      (2L, "view", 9L * day),      // u2 cohort 1 (day 9)
      (2L, "click", 9L * day + 1), // same period — collapses
      (2L, "view", 17L * day),     // p2 → k1
      (3L, "view", 1L * day))      // u3 cohort 0, never returns
    val got = EventOps.retention(events, "user_id", "ts",
        epochDate = "1970-01-01", periodDays = 7)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L, 1.0),  // cohort 0: u1 + u3
      (0L, 1L, 1L, 0.5),  // only u1 returns in week 1
      (0L, 2L, 1L, 0.5),
      (1L, 0L, 1L, 1.0),  // cohort 1: u2
      (1L, 1L, 1L, 1.0)))
  }

  test("retention on real events: k=0 always has rate 1.0, rates never exceed 1, k never negative") {
    val events = graft.io.Layers.readEvents(spark, s"${TestSpark.sfDir}/events.parquet")
    val got = EventOps.retention(events, "user_id", "ts", "2024-01-01", 7)
    assert(got.filter(col("k") < 0).count() == 0)
    assert(got.filter(col("retention") > 1.0).count() == 0)
    assert(got.filter(col("k") === 0 && col("retention") =!= 1.0).count() == 0)
  }

  test("topJourneys: session boundaries cut grams, order is (ts, id), counts exact") {
    import spark.implicits._
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // u1 session A: view->cart->buy->view ; gap >30min ; session B:
    // view->cart->buy  => "view→cart→buy" ×2, "cart→buy→view" ×1
    // u2: a 2-event session contributes no 3-gram
    val ev = Seq(
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(1), "cart"),
      (3L, 1L, ts(2), "buy"), (4L, 1L, ts(3), "view"),
      (5L, 1L, ts(50), "view"), (6L, 1L, ts(51), "cart"), (7L, 1L, ts(52), "buy"),
      (8L, 2L, ts(0), "view"), (9L, 2L, ts(1), "cart"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.topJourneys(ev, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 1800, n = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view→cart→buy" -> 2L, "cart→buy→view" -> 1L))
    // the session cut is load-bearing: without it, "buy→view→view"
    // and "view→view→cart" would bridge the gap
    assert(!got.contains("buy→view→view") && !got.contains("view→view→cart"))
    // equal timestamps order by event id
    val tie = Seq(
      (20L, 3L, ts(0), "a"), (21L, 3L, ts(0), "b"), (22L, 3L, ts(0), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val t = EventOps.topJourneys(tie, "user_id", "ts", "event_id",
      "event_type", n = 3, topK = 5).collect()
    assert(t.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a→b→c", 1L)))
    intercept[IllegalArgumentException] {
      EventOps.topJourneys(ev, "user_id", "ts", "event_id", "event_type", n = 1)
    }
  }

  test("lastTouchAttribution: predecessor in-session, (direct) on session opens, gap resets") {
    import spark.implicits._
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val ev = Seq(
      // u1 session A: view -> purchase (credit: view)
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(1), "purchase"),
      // u1 session B opens WITH a purchase after a 40-min gap: (direct)
      // — the preceding 'click' is in the previous session
      (3L, 1L, ts(2), "click"), (4L, 1L, ts(45), "purchase"),
      // u2 first-ever event is a purchase: (direct)
      (5L, 2L, ts(0), "purchase"),
      // u2: click -> purchase in one session (credit: click)
      (6L, 2L, ts(10), "click"), (7L, 2L, ts(11), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.lastTouchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", gapSeconds = 1800)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view" -> 1L, "click" -> 1L, "(direct)" -> 2L))
  }

  test("markovAttribution: hand chain, removal effects, first-conversion truncation") {
    import spark.implicits._
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // paths: u1 START→a→CONV, u2 START→a→NULL, u3 START→b→CONV
    // P(START→a)=2/3, P(START→b)=1/3, p(a)=1/2, p(b)=1
    // pBase = 2/3·1/2 + 1/3·1 = 2/3; remove a → 1/3; remove b → 1/3
    // effects: a = (2/3−1/3)/(2/3) = 0.5, b = 0.5; shares 0.5 each
    val ev = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "purchase"),
      (3L, 2L, ts(0), "a"),
      (4L, 3L, ts(0), "b"), (5L, 3L, ts(1), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.markovAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == Map("a" -> ((0.5, 0.5)), "b" -> ((0.5, 0.5))))

    // events AFTER the first conversion in a session are outside the
    // path: the trailing 'c' must not become a state; and a
    // session-opening conversion is a direct START→CONV edge that
    // keeps pBase > 0 with no channels at all
    val trunc = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "purchase"),
      (3L, 1L, ts(2), "c"),
      (4L, 2L, ts(0), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val chans = EventOps.markovAttribution(trunc, "user_id", "ts",
        "event_id", "event_type", "purchase")
      .collect().map(_.getString(0)).toSet
    // 'c' trails u1's conversion, so truncation drops it entirely —
    // the only channel left is 'a'
    assert(chans == Set("a"))

    // no conversion anywhere -> fail loud
    intercept[IllegalArgumentException] {
      EventOps.markovAttribution(
        Seq((1L, 1L, ts(0), "a")).toDF("event_id", "user_id", "ts",
          "event_type"),
        "user_id", "ts", "event_id", "event_type", "purchase")
    }
  }

  test("cupedReadout: θ = 2 hand model, analytic adjusted means, variance identity") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // y = 2x exactly (+5 for arm 1): θ = cov/var = 2,
    // arm-0 adjusted mean 30, arm-1 35; var_y 106.25 → adj 6.25
    val ev = Seq(
      (0L, t(1), 10.0), (0L, t(20), 20.0),
      (2L, t(1), 20.0), (2L, t(20), 40.0),
      (1L, t(1), 10.0), (1L, t(20), 25.0),
      (3L, t(1), 20.0), (3L, t(20), 45.0))
      .toDF("user_id", "ts", "value")
    val got = EventOps.cupedReadout(ev, "user_id", "ts", "value",
        cutoverTs = "2024-01-16 00:00:00", armOf = col("user_id") % 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got(0L) == ((2L, 30.0, 30.0, 2.0, 106.25, 6.25)))
    assert(got(1L) == ((2L, 35.0, 35.0, 2.0, 106.25, 6.25)))
    // the adjustment only moves arms whose PRE-period composition
    // differs: shift user 3's pre value and arm 1 re-centers
    val skewed = ev.withColumn("value",
      when(col("user_id") === 3 && col("ts") < lit("2024-01-16"),
        lit(40.0)).otherwise(col("value")))
    val adj = EventOps.cupedReadout(skewed, "user_id", "ts", "value",
        cutoverTs = "2024-01-16 00:00:00", armOf = col("user_id") % 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(adj(1L) < 35.0, "pre-heavy arm must adjust DOWN")
    assert(adj(0L) > 30.0, "pre-light arm must adjust UP")
  }

  test("funnelLatency: greedy-earliest elapsed, percentile interpolation") {
    val events = ev(
      // u1: view@0 -> click@10 (chain clock starts at the FIRST view)
      (1L, "view", 0L), (1L, "view", 5L), (1L, "click", 10L),
      // u2: view@0 -> click@30, the later click@50 is ignored (greedy)
      (2L, "view", 0L), (2L, "click", 30L), (2L, "click", 50L),
      // u3: click precedes the view: strict order -> never reaches
      (3L, "click", 5L), (3L, "view", 6L),
      // u4: view only
      (4L, "view", 0L))
    val got = EventOps.funnelLatency(events, "user_id", "event_type",
        "ts", Seq("view", "click"), windowSeconds = 100L,
        ps = Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    // elapsed = {10, 30}: p50 = 20 (midpoint), p90 = 28
    assert(got.toSeq == Seq(("click", 2, 20.0, 28.0, 2L)))
  }

  test("volumeForecastError: perfectly seasonal series scores MASE 0") {
    // 48 hours alternating 2 events / 0 events with period 24:
    // seasonal diff is always 0, one-step diff alternates -> MASE 0
    val rows = (0 until 48).flatMap { h =>
      if (h % 24 == 0) Seq((1L, "a", h * 3600L), (2L, "a", h * 3600L))
      else Seq((1L, "a", h * 3600L + 1))
    }
    val got = EventOps.volumeForecastError(ev(rows: _*), "event_type",
        "ts", seasonHours = 24)
      .head
    assert(got.getString(0) == "a" && got.getLong(1) == 48L)
    assert(got.getLong(2) == 0L, "seasonal forecast is exact here")
    assert(got.getLong(4) > 0L)
    assert(got.getDouble(6) == 0.0)
    // constant series: naive1 denominator 0 -> MASE undefined -> null
    val const = ev((0 until 30).map(h => (1L, "b", h * 3600L)): _*)
    assert(EventOps.volumeForecastError(const, "event_type", "ts")
      .head.isNullAt(6))
    intercept[IllegalArgumentException] {
      EventOps.volumeForecastError(const, "event_type", "ts",
        seasonHours = 1)
    }
  }

  test("longestBurst: islands over the densified grid, earliest tie-break") {
    // hours 0-1 burst (len 2), hour 2 dark (no events at all — the
    // spine must still break the run), hours 3-5 burst (len 3),
    // hours 6-7 quiet (1 event each)
    def burst(h: Int) = Seq((1L, "a", h * 3600L), (2L, "a", h * 3600L),
      (3L, "a", h * 3600L + 5))
    val rows = burst(0) ++ burst(1) ++ burst(3) ++ burst(4) ++ burst(5) ++
      Seq((9L, "a", 6 * 3600L), (9L, "a", 7 * 3600L))
    val r = EventOps.longestBurst(ev(rows: _*), "event_type", "ts",
      minCount = 3L).head
    assert(r.getString(0) == "a")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((8L, 5L, 3L, 3L)))
    // tie on length: the EARLIEST island wins
    val tie = burst(0) ++ burst(1) ++ burst(4) ++ burst(5) ++
      Seq((9L, "a", 7 * 3600L))
    val t = EventOps.longestBurst(ev(tie: _*), "event_type", "ts", 3L).head
    assert(t.getLong(3) == 2L && t.getLong(4) == 0L)
    intercept[IllegalArgumentException] {
      EventOps.longestBurst(ev(rows: _*), "event_type", "ts", 0L)
    }
  }
}
