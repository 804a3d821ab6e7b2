package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Layers

/** events slice of the [[SparkEntry]] registry — event-time
  * analytics: tumbling/sliding windows, sessionization, as-of/range
  * joins, funnels, retention, attribution, rate anomaly, burst and
  * volume-forecast diagnostics. Split out of [[EntryStats]] by family
  * for maintainability (the r16 registry-split convention); entries
  * and oracles are verbatim registry content (no behavior change). */
private[graft] trait EntryEvents extends EntryContext {

  protected def eventsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- events: hourly tumbling-window aggregation (batch twin of the
    //      streaming hourlyByType)
    "q18_events_hourly" -> ((s, dir) =>
      Layers.readEvents(s, s"$dir/events.parquet")
        .groupBy(
          date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          expr(dsum("value")).as("total_value"))),




    // ---- events: batch sessionization (30-min inactivity gap)
    "q19_sessions" -> ((s, dir) => {
      val ev = Layers.readEvents(s, s"$dir/events.parquet")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev", lag(col("ts"), 1).over(w))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("prev").isNull ||
            (col("ts").cast("double") - col("prev").cast("double")) > 1800.0, 1L)
            .otherwise(0L)).as("n_sessions"))
    }),




    // ---- joins: star-schema revenue rollup, dims broadcast
    "q20_join_revenue" -> ((s, dir) => {
      val o = T(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      o.join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_orders"),
          expr(dsum("o_totalprice")).as("revenue"))
    }),




    // ---- events: sliding-window aggregation (1 h window, 30 min slide)
    "q32_sliding_window" -> ((s, dir) =>
      Layers.readEvents(s, s"$dir/events.parquet")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          expr(dsum("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))),




    // ---- as-of (point-in-time) join: each event joined to the user's
    //      latest prior purchase (no future leakage) — composed from
    //      union + running-last window, oracle = DuckDB native ASOF JOIN
    "q33_asof_join" -> ((s, dir) => {
      val ev = Layers.readEvents(s, s"$dir/events.parquet")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      graft.ops.AsOf.asofJoin(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        keys = Seq("user_id"), tsCol = "ts",
        rightCols = Seq("purchase_id", "purchase_value"))
        .select("event_id", "user_id", "purchase_id", "purchase_value")
    }),




    // ---- range (interval) join via bucketed equi-join decomposition:
    //      events counted into 2-hour windows opened by each purchase
    "q34_range_join" -> ((s, dir) => {
      val ev = Layers.readEvents(s, s"$dir/events.parquet")
      val win = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
      graft.ops.Ranges.rangeJoin(
        ev.select(col("user_id"), col("ts"), col("event_id")),
        win, keys = Seq("user_id"), tsCol = "ts",
        startCol = "start_ts", endCol = "end_ts", bucketWidthSeconds = 3600)
        .groupBy("purchase_id")
        .agg(count(lit(1)).as("n_events"))
    }),




    // ---- north-star events: ordered funnel — greedy-earliest
    //      view→click→purchase within 7 days of the anchor; one
    //      decomposable groupBy(user).min per step chained by user-key
    //      equi-joins, each stage checkpointed once (no per-user loops,
    //      no event-array collection).
    "q135_event_funnel" -> ((s, dir) =>
      graft.ops.EventOps.funnel(
        graft.io.Layers.readEvents(s, s"$dir/events.parquet"),
        "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"),
        windowSeconds = 604800L)),




    // ---- north-star events: weekly cohort retention — cohort = the
    //      period of a user's first event (integer arithmetic vs a
    //      fixed epoch date, bit-replayable); (cohort, k) activity
    //      counts + rate vs the cohort's own size.
    "q136_retention" -> ((s, dir) =>
      graft.ops.EventOps.retention(
        graft.io.Layers.readEvents(s, s"$dir/events.parquet"),
        "user_id", "ts", epochDate = "2024-01-01", periodDays = 7)),




    // ---- north-star: event-rate anomaly alarm — per-type hourly
    //      counts z-scored against their own trailing 24 h; the
    //      baseline uses decomposable Σn/Σn² window sums (NOT
    //      stddev_samp, whose merge order differs between engines at
    //      the ulp level), so both engines compute identical doubles.
    "q170_rate_anomaly" -> ((s, dir) => {
      val ev = Layers.readEvents(s, s"$dir/events.parquet")
      graft.ops.EventOps.rateAnomalies(ev, "event_type", "ts")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_hours"),
          sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"),
          sum(when(col("z").isNull, 1L).otherwise(0L)).as("n_warmup"),
          round(max(abs(col("z"))), 6).as("max_abs_z"))
    }),




    // ---- north-star: last-touch attribution — which event type
    //      immediately precedes each purchase in its session (the
    //      first attribution model every analytics stack ships);
    //      session-opening purchases attribute to "(direct)".
    "q231_attribution" -> ((s, dir) =>
      graft.ops.EventOps.lastTouchAttribution(
        Layers.readEvents(s, s"$dir/events.parquet"),
        "user_id", "ts", "event_id", "event_type",
        conversionType = "purchase", gapSeconds = 1800)),




    // ---- north-star: Markov-chain removal-effect attribution — the
    //      principled upgrade over q231's last-touch: credit = how much
    //      conversion probability drops when the channel is removed.
    "q242_markov_attribution" -> ((s, dir) =>
      graft.ops.EventOps.markovAttribution(
        Layers.readEvents(s, s"$dir/events.parquet"),
        "user_id", "ts", "event_id", "event_type",
        conversionType = "purchase", gapSeconds = 1800, iters = 15)),




    // ---- north-star: funnel time-to-convert percentiles — the
    //      latency companion of q135's reach counts (same greedy
    //      chain); p50/p90 seconds from anchor per step decide the
    //      attribution window.
    "q255_funnel_latency" -> ((s, dir) =>
      graft.ops.EventOps.funnelLatency(
        Layers.readEvents(s, s"$dir/events.parquet"),
        "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"),
        windowSeconds = 604800L, ps = Seq(0.5, 0.9))),




    // ---- north-star: seasonal-naive volume forecast error (MASE) —
    //      does "same hour yesterday" beat "last hour" per event type,
    //      over the DENSIFIED hour grid; integer-exact sums, one
    //      division.
    "q256_volume_mase" -> ((s, dir) =>
      graft.ops.EventOps.volumeForecastError(
        Layers.readEvents(s, s"$dir/events.parquet"),
        "event_type", "ts", seasonHours = 24)),




    // ---- north-star: longest sustained burst per event type — the
    //      gaps-and-islands decomposition over the densified hour grid:
    //      duration-aware operational facts beside q170's point alarms.
    "q272_longest_burst" -> ((s, dir) =>
      graft.ops.EventOps.longestBurst(
        Layers.readEvents(s, s"$dir/events.parquet"),
        "event_type", "ts", minCount = 3L))
  )

  protected def eventsOracles: Map[String, String] = Map(
    // anomaly replay: identical per-type hour-grid densification
    // (min..max spine, n=0 fill) + identical Σn/Σn² window arithmetic
    // on the same trailing frame — integer sums are exact, so the
    // doubles match bit-for-bit before the shared round(…,6)
    "q170_rate_anomaly" ->
      """WITH obs AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT event_type, min(hour) AS mn, max(hour) AS mx
        |  FROM obs GROUP BY 1),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
        |  FROM bounds),
        |h AS (
        |  SELECT spine.event_type, spine.hour, COALESCE(obs.n, 0) AS n
        |  FROM spine LEFT JOIN obs
        |    ON spine.event_type = obs.event_type AND spine.hour = obs.hour),
        |wstats AS (
        |  SELECT event_type, hour, n,
        |    sum(CAST(n AS DOUBLE)) OVER w AS s1,
        |    sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER w AS s2,
        |    CAST(count(n) OVER w AS DOUBLE) AS c
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, hour, n,
        |    CASE WHEN c >= 2 AND sqrt(GREATEST((s2 - s1*s1/c)/(c-1),
        |        CAST(0 AS DOUBLE))) > 0
        |      THEN round((CAST(n AS DOUBLE) - s1/c) /
        |        sqrt(GREATEST((s2 - s1*s1/c)/(c-1), CAST(0 AS DOUBLE))), 6)
        |    END AS z
        |  FROM wstats)
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies,
        |  CAST(sum(CASE WHEN z IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_warmup,
        |  round(max(abs(z)), 6) AS max_abs_z
        |FROM z GROUP BY event_type""".stripMargin,




    "q18_events_hourly" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
         |  count(*) AS n_events, ${dsum("value")} AS total_value
         |FROM events GROUP BY 1, 2""".stripMargin,




    "q19_sessions" ->
      s"""WITH p AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events)
         |SELECT user_id, count(*) AS n_events,
         |  CAST(sum(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
         |FROM p GROUP BY user_id""".stripMargin,




    "q20_join_revenue" ->
      s"""SELECT r_name, n_name, count(*) AS n_orders, ${dsum("o_totalprice")} AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY r_name, n_name""".stripMargin,




    "q33_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |        event_id AS purchase_id, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, p.purchase_id, p.purchase_value
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin,




    "q34_range_join" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS start_ts,
        |        CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS end_ts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, count(*) AS n_events
        |FROM p JOIN e ON e.user_id = p.user_id AND e.ts >= p.start_ts AND e.ts < p.end_ts
        |GROUP BY p.purchase_id""".stripMargin,




    "q32_sliding_window" ->
      s"""WITH e AS (SELECT event_type, value,
         |    time_bucket(INTERVAL '30 minutes', ts) AS tb FROM events),
         |w AS (
         |  SELECT tb AS window_start, event_type, value FROM e
         |  UNION ALL
         |  SELECT tb - INTERVAL '30 minutes', event_type, value FROM e
         |)
         |SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
         |  count(*) AS n_events, ${dsum("value")} AS total_value
         |FROM w GROUP BY 1, 2""".stripMargin,




    // attribution replay: the q19/q217 sessionization window + lag of
    // (type, session), purchase rows only
    "q231_attribution" ->
      """WITH p AS (SELECT user_id, event_id, ts, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS ptype
        |  FROM events),
        |s AS (SELECT *, sum(CASE WHEN prev IS NULL
        |      OR epoch(ts) - epoch(prev) > 1800.0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM p),
        |s2 AS (SELECT *, lag(sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS psess FROM s)
        |SELECT CASE WHEN psess IS NULL OR psess <> sess THEN '(direct)'
        |            ELSE ptype END AS touch_type,
        |  count(*) AS n_conversions
        |FROM s2 WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,




    // Markov-attribution replay: q231's sessionization, paths truncated
    // at the first conversion, (src,dst) transition counts, and the
    // SAME 15-step truncated Neumann series unrolled as chained CTEs —
    // per removed channel — that the Spark side computes on the
    // collected (type-vocabulary-bounded) transition matrix
    "q242_markov_attribution" -> {
      def iter(prev: Int, cur: Int): String =
        s"""it$cur AS (
           |  SELECT r.removed, t.src AS state,
           |    sum(t.prob * CASE WHEN t.dst = 'CONV' THEN 1.0
           |      WHEN t.dst = 'NULL' OR t.dst = r.removed THEN 0.0
           |      ELSE coalesce(i.p, 0.0) END) AS p
           |  FROM tp t CROSS JOIN removals r
           |  LEFT JOIN it$prev i ON i.state = t.dst AND i.removed = r.removed
           |  GROUP BY 1, 2)""".stripMargin
      val itChain = (1 to 15).map(i => iter(i - 1, i)).mkString(",\n")
      s"""WITH pp AS (SELECT user_id, event_id, ts, event_type,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS prev
         |  FROM events),
         |ss AS (SELECT *, sum(CASE WHEN prev IS NULL
         |      OR epoch(ts) - epoch(prev) > 1800.0 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM pp),
         |paths AS (SELECT user_id, sess,
         |    list(event_type ORDER BY ts, event_id) AS types
         |  FROM ss GROUP BY user_id, sess),
         |tr0 AS (SELECT CASE WHEN cpos IS NOT NULL AND cpos > 0
         |    THEN ['START'] || types[1:cpos-1] || ['CONV']
         |    ELSE ['START'] || types || ['NULL'] END AS path
         |  FROM (SELECT types, list_position(types, 'purchase') AS cpos
         |        FROM paths)),
         |trans AS (SELECT path[i] AS src, path[i+1] AS dst, count(*) AS cnt
         |  FROM (SELECT path, unnest(generate_series(1, len(path) - 1)) AS i
         |        FROM tr0)
         |  GROUP BY 1, 2),
         |tp AS (SELECT src, dst,
         |    CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY src) AS prob
         |  FROM trans),
         |states AS (SELECT DISTINCT src AS state FROM trans),
         |removals AS (SELECT 'NONE' AS removed
         |  UNION ALL SELECT state FROM states WHERE state <> 'START'),
         |it0 AS (SELECT r.removed, st.state, 0.0 AS p
         |  FROM states st CROSS JOIN removals r),
         |$itChain,
         |base AS (SELECT p AS pb FROM it15
         |  WHERE removed = 'NONE' AND state = 'START'),
         |eff AS (SELECT i.removed AS channel, (b.pb - i.p) / b.pb AS effect
         |  FROM it15 i, base b
         |  WHERE i.removed <> 'NONE' AND i.state = 'START'),
         |tot AS (SELECT sum(effect) AS te FROM eff)
         |SELECT channel, round(effect, 6) AS removal_effect,
         |  round(CASE WHEN te > 0 THEN effect / te ELSE 0.0 END, 6)
         |    AS attribution_share
         |FROM eff, tot""".stripMargin
    },




    // funnel-latency replay: the q135 chain keeping each step's
    // timestamp, elapsed = epoch diff, then the q38 percentile
    // interpolation partitioned by step
    "q255_funnel_latency" -> {
      val pcols = Seq(0.5 -> "p50", 0.9 -> "p90").map { case (p, name) =>
        s"""round(
           |    max(CASE WHEN rn = CAST(floor((n - 1) * $p) AS BIGINT) + 1 THEN v END) +
           |    (max(CASE WHEN rn = CAST(ceil((n - 1) * $p) AS BIGINT) + 1 THEN v END) -
           |     max(CASE WHEN rn = CAST(floor((n - 1) * $p) AS BIGINT) + 1 THEN v END))
           |    * max((n - 1) * $p - floor((n - 1) * $p)), 6) AS $name""".stripMargin
      }.mkString(",\n  ")
      s"""WITH fn1 AS (SELECT user_id, min(ts) AS anchor
         |  FROM events WHERE event_type = 'view' GROUP BY user_id),
         |fn2 AS (SELECT e.user_id, min(f.anchor) AS anchor,
         |    min(e.ts) AS prev
         |  FROM events e JOIN fn1 f ON e.user_id = f.user_id
         |  WHERE e.event_type = 'click' AND e.ts > f.anchor
         |    AND e.ts <= f.anchor + INTERVAL 604800 SECONDS
         |  GROUP BY e.user_id),
         |fn3 AS (SELECT e.user_id, min(f.anchor) AS anchor,
         |    min(e.ts) AS prev
         |  FROM events e JOIN fn2 f ON e.user_id = f.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > f.prev
         |    AND e.ts <= f.anchor + INTERVAL 604800 SECONDS
         |  GROUP BY e.user_id),
         |lat AS (SELECT 'click' AS step, 2 AS step_idx,
         |    epoch(prev) - epoch(anchor) AS v FROM fn2
         |  UNION ALL SELECT 'purchase', 3,
         |    epoch(prev) - epoch(anchor) FROM fn3),
         |r AS (SELECT step, step_idx, v,
         |    row_number() OVER (PARTITION BY step ORDER BY v ASC) AS rn,
         |    CAST(count(*) OVER (PARTITION BY step) AS DOUBLE) AS n
         |  FROM lat)
         |SELECT step, step_idx,
         |  $pcols,
         |  CAST(max(n) AS BIGINT) AS n_rows
         |FROM r GROUP BY step, step_idx""".stripMargin
    },




    // MASE replay: hour-floor counts, per-type densified spine, both
    // lags on one window, the four integer sums and one division
    "q256_volume_mase" ->
      """WITH hc AS (SELECT event_type,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(min(h), max(h)))
        |    AS h FROM hc GROUP BY event_type),
        |g AS (SELECT sp.event_type, sp.h, coalesce(hc.n, 0) AS y
        |  FROM sp LEFT JOIN hc USING (event_type, h)),
        |l AS (SELECT event_type, y,
        |    lag(y, 24) OVER (PARTITION BY event_type ORDER BY h) AS ys,
        |    lag(y, 1) OVER (PARTITION BY event_type ORDER BY h) AS y1
        |  FROM g)
        |SELECT event_type, count(*) AS n_hours,
        |  coalesce(CAST(sum(abs(y - ys)) AS BIGINT), 0)
        |    AS sum_abs_seasonal,
        |  count(ys) AS n_seasonal,
        |  coalesce(CAST(sum(abs(y - y1)) AS BIGINT), 0) AS sum_abs_naive1,
        |  count(y1) AS n_naive1,
        |  round(CASE WHEN coalesce(sum(abs(y - y1)), 0) = 0
        |      OR count(ys) = 0 THEN NULL
        |    ELSE CAST(sum(abs(y - ys)) AS DOUBLE) * count(y1)
        |      / (count(ys) * sum(abs(y - y1))) END, 6) AS mase
        |FROM l GROUP BY event_type""".stripMargin,




    // longest-burst replay: densified hour grid, the two-rank island
    // id, per-island lengths, longest with earliest-start tie-break
    "q272_longest_burst" ->
      """WITH hc AS (SELECT event_type,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(min(h), max(h)))
        |    AS h FROM hc GROUP BY event_type),
        |g AS (SELECT sp.event_type, sp.h,
        |    (coalesce(hc.n, 0) >= 3) AS q
        |  FROM sp LEFT JOIN hc USING (event_type, h)),
        |gr AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h)
        |    - row_number() OVER (PARTITION BY event_type, q ORDER BY h)
        |      AS grp
        |  FROM g),
        |isl AS (SELECT event_type, grp, count(*) AS len,
        |    min(h) AS start FROM gr WHERE q GROUP BY 1, 2),
        |tot AS (SELECT event_type, count(*) AS n_hours,
        |    CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_burst_hours
        |  FROM gr GROUP BY event_type),
        |best AS (SELECT event_type, len AS longest_burst,
        |    start AS burst_start_hour,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY len DESC, start ASC) AS rk
        |  FROM isl)
        |SELECT t.event_type, t.n_hours, t.n_burst_hours,
        |  b.longest_burst, b.burst_start_hour
        |FROM tot t JOIN best b
        |  ON b.event_type = t.event_type AND b.rk = 1""".stripMargin,




    // funnel replay: identical greedy-earliest chaining — per-step
    // first-occurrence min after the previous step, whole chain fenced
    // to the anchor's window
    "q135_event_funnel" ->
      """WITH fn1 AS (SELECT user_id, min(ts) AS anchor
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |fn2 AS (SELECT e.user_id, min(f.anchor) AS anchor, min(e.ts) AS prev
        |  FROM events e JOIN fn1 f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'click' AND e.ts > f.anchor
        |    AND e.ts <= f.anchor + INTERVAL 604800 SECONDS
        |  GROUP BY e.user_id),
        |fn3 AS (SELECT e.user_id
        |  FROM events e JOIN fn2 f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > f.prev
        |    AND e.ts <= f.anchor + INTERVAL 604800 SECONDS
        |  GROUP BY e.user_id),
        |fn_n AS (SELECT (SELECT count(*) FROM fn1) AS n1,
        |                (SELECT count(*) FROM fn2) AS n2,
        |                (SELECT count(*) FROM fn3) AS n3)
        |SELECT 'view' AS step, 1 AS step_idx, n1 AS n_users, 1.0 AS conversion FROM fn_n
        |UNION ALL SELECT 'click', 2, n2, round(CAST(n2 AS DOUBLE) / n1, 6) FROM fn_n
        |UNION ALL SELECT 'purchase', 3, n3, round(CAST(n3 AS DOUBLE) / n1, 6) FROM fn_n""".stripMargin,




    // retention replay: identical integer period arithmetic vs the
    // fixed epoch date
    "q136_retention" ->
      """WITH rt_a AS (SELECT DISTINCT user_id,
        |    CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS p
        |  FROM events),
        |rt_c AS (SELECT user_id, min(p) AS cohort FROM rt_a GROUP BY user_id),
        |rt_j AS (SELECT a.user_id, c.cohort, a.p - c.cohort AS k
        |  FROM rt_a a JOIN rt_c c USING (user_id)),
        |rt_k AS (SELECT cohort, k, count(*) AS n_users FROM rt_j GROUP BY cohort, k),
        |rt_s AS (SELECT cohort, count(*) AS sz FROM rt_c GROUP BY cohort)
        |SELECT k.cohort, k.k, k.n_users,
        |  round(CAST(k.n_users AS DOUBLE) / s.sz, 6) AS retention
        |FROM rt_k k JOIN rt_s s USING (cohort)""".stripMargin
  )
}
