package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over the events table: ordered funnels and
 * cohort retention — the two reporting primitives event pipelines ship
 * beside windows/sessionization (SparkEntry q18/q19) and the as-of /
 * range joins (q33/q34).
 *
 * Both ops are join/aggregate formulations — no per-user loops, no
 * `collect_list` of unbounded event arrays, no global sorts:
 *  - funnel: one `groupBy(user).min` per step, chained by a same-key
 *    equi-join — each stage shuffles on the user key once, and every
 *    aggregation is decomposable (map-side combined);
 *  - retention: first-activity cohort + distinct (user, period) frame,
 *    joined on user — cohort/period cardinality is tiny, the heavy
 *    frames are both user-keyed.
 */
object EventOps {

  /**
   * Greedy-earliest ordered funnel: step 1 anchors at the user's FIRST
   * `steps(0)` event; step i+1 matches the first `steps(i+1)` event
   * strictly after step i and within `windowSeconds` of the ANCHOR
   * (the whole chain must fit the window, the standard product-funnel
   * contract). Returns one row per step: (step, step_idx, n_users,
   * conversion vs step 1, rounded 6).
   */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(windowSeconds > 0, "window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.select(
      col(userCol).as("u"), col(typeCol).as("t"), col(tsCol).as("ts"))
    // anchor: first occurrence of the entry step. Each stage is
    // localCheckpoint'ed: stage i+1 joins against stage i, and without
    // the checkpoint every later stage would re-execute every earlier
    // stage's shuffle through the lineage. (K stages therefore
    // materialize as K sequential jobs — inherent to the chain, since
    // stage i+1's input IS stage i's output — but the per-step reach
    // COUNTS ride one final aggregation over the K tagged user frames,
    // not K extra driver actions.)
    var reached = base.filter(col("t") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("anchor"))
      .withColumn("prev", col("anchor"))
      .localCheckpoint()
    val stages = Seq.newBuilder[DataFrame]
    stages += reached.select(col("u"), lit(1).as("step_idx"))
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val prevStage = reached.withColumnRenamed("u", "__ru")
      reached = base.filter(col("t") === step)
        .join(prevStage, col("u") === col("__ru")).drop("__ru")
        .filter(col("ts") > col("prev") &&
          col("ts") <= col("anchor") + expr(s"INTERVAL $windowSeconds SECONDS"))
        .groupBy("u")
        .agg(min(col("ts")).as("__step_ts"),
          min(col("anchor")).as("anchor")) // constant per user
        .withColumn("prev", col("__step_ts")).drop("__step_ts")
        .localCheckpoint()
      stages += reached.select(col("u"), lit(i + 2).as("step_idx"))
    }
    // ONE action over the checkpointed stages: K rows, driver-bounded
    val reach = stages.result().reduce(_ unionByName _)
      .groupBy("step_idx").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = steps.zipWithIndex.map { case (step, i) =>
      (step, i + 1, reach.getOrElse(i + 1, 0L))
    }
    val n1 = rows.head._3.toDouble
    rows.map { case (step, idx, n) =>
      (step, idx, n, if (n1 == 0) 0.0 else
        BigDecimal(n / n1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("step", "step_idx", "n_users", "conversion")
  }

  /**
   * Weekly cohort retention: a user's cohort is the period (integer
   * `floor(days-since-epochDate / periodDays)`) of their FIRST event;
   * for every (cohort, k ≥ 0) the report counts users with any
   * activity k periods after their cohort period, plus the retention
   * rate vs the cohort's own size (k = 0 row ≡ cohort size, rate 1.0).
   * Pure integer period arithmetic — replayable bit-exactly in SQL.
   */
  /**
   * Top-k user journeys — the most common length-`n` event-type
   * sequences inside sessions (the path-analysis staple: "what do
   * users actually do before X"). Sessionizes on an inactivity gap,
   * orders each session's events deterministically by (ts, event id —
   * the equal-timestamp tie-break), and counts sliding `n`-grams over
   * the per-session type sequence.
   *
   * Scale shape: ONE user-keyed window pass (lag + running session
   * sum — the q19 sessionization shape), one (user, session)
   * aggregation whose collected list is session-bounded (sessions are
   * gap-delimited by construction; a runaway bot session is a data
   * problem the politeness/rate alarms own), an n-gram explode ∝
   * events, a decomposable gram count, and a `TakeOrderedAndProject`
   * top-k (count desc, journey asc) — never a journey-vocabulary
   * sort.
   *
   * Output: (journey "a→b→c", n_occurrences), topK rows.
   */
  def topJourneys(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      gapSeconds: Int = 1800,
      n: Int = 3,
      topK: Int = 20): DataFrame = {
    require(n >= 2, "a journey needs at least 2 steps")
    require(topK >= 1 && gapSeconds >= 1, "topK and gapSeconds must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val sessioned = events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        (col(tsCol).cast("double") - col("__prev").cast("double"))
          > gapSeconds.toDouble, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
    val seqs = sessioned
      .groupBy(col(userCol), col("__sess"))
      .agg(transform(
        sort_array(collect_list(struct(col(tsCol).as("t"),
          col(idCol).as("i"), col(typeCol).as("e")))),
        x => x.getField("e")).as("__types"))
      .filter(size(col("__types")) >= n)
    val grams = seqs.select(explode(transform(
      sequence(lit(0), size(col("__types")) - n),
      i => concat_ws("→", slice(col("__types"), i + 1, lit(n)))))
      .as("journey"))
    grams.groupBy("journey")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("journey").asc)
      .limit(topK)
  }

  /**
   * Last-touch attribution — for every conversion event, the
   * event type IMMEDIATELY preceding it in the same session (the
   * simplest published attribution model, and the one every analytics
   * stack ships first): which touchpoint "gets credit" for the
   * conversion. Conversions that OPEN a session attribute to
   * `(direct)`.
   *
   * Same single user-keyed window pass as [[topJourneys]] (lag of
   * type AND of session id — the session-boundary check rides the
   * same window), then one decomposable count per touch type.
   *
   * Output: (touch_type, n_conversions), the attribution report.
   */
  def lastTouchAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      conversionType: String,
      gapSeconds: Int = 1800): DataFrame = {
    require(gapSeconds >= 1, "gapSeconds must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        (col(tsCol).cast("double") - col("__prev").cast("double"))
          > gapSeconds.toDouble, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(cum))
      .withColumn("__ptype", lag(col(typeCol), 1).over(w))
      .withColumn("__psess", lag(col("__sess"), 1).over(w))
      .filter(col(typeCol) === conversionType)
      .select(when(col("__psess").isNull || col("__psess") =!= col("__sess"),
        lit("(direct)")).otherwise(col("__ptype")).as("touch_type"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_conversions"))
  }

  /**
   * Markov-chain (removal-effect) attribution — the published upgrade
   * over [[lastTouchAttribution]]: model sessions as first-order Markov
   * paths `START → e₁ → … → CONV|NULL`, and credit each channel by how
   * much the overall conversion probability DROPS when that channel is
   * removed from the chain (its transitions redirected to NULL). A
   * channel that only ever appears after the decision is made earns
   * ~nothing; a channel every converting path flows through earns its
   * true share — exactly what last-touch gets wrong.
   *
   * Each session path is truncated at its FIRST conversion (events
   * after it belong to the next decision, and a conversion state must
   * be absorbing for the chain to be well-defined); non-converting
   * sessions end in NULL. Conversion probability is the `iters`-step
   * truncated Neumann series of the absorption equations
   * `p(s) = P(s→CONV) + Σ_t P(s→t)·p(t)` from p₀ = 0 — both engines
   * compute the SAME pinned-iteration value, so the result is
   * deterministic parity rather than a convergence promise (at the
   * default 15 steps the residual is far below the 6-decimal display
   * for real session chains, whose per-step continue-mass is well
   * under 1).
   *
   * Scale shape: the same single user-keyed window pass as
   * [[topJourneys]] (sessionize + session-bounded path collect), one
   * decomposable (src, dst) count — and then the chain solve runs on
   * the TRANSITION MATRIX, which is ≤ (|event types| + 3)² rows no
   * matter how many events fed it: the collect is bounded by the type
   * vocabulary (the q135 funnel-counts pattern), never by data volume.
   *
   * Output: (channel, removal_effect, attribution_share), one row per
   * non-START transient state, effects relative to the baseline
   * conversion probability, both rounded 6.
   */
  def markovAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      conversionType: String,
      gapSeconds: Int = 1800,
      iters: Int = 15): DataFrame = {
    require(gapSeconds >= 1, "gapSeconds must be positive")
    require(iters >= 1, "iters must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val sessioned = events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        (col(tsCol).cast("double") - col("__prev").cast("double"))
          > gapSeconds.toDouble, 1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(cum))
    val paths = sessioned
      .groupBy(col(userCol), col("__sess"))
      .agg(transform(
        sort_array(collect_list(struct(col(tsCol).as("t"),
          col(idCol).as("i"), col(typeCol).as("e")))),
        x => x.getField("e")).as("__types"))
      .withColumn("__cpos", array_position(col("__types"), lit(conversionType)))
      .select(when(col("__cpos") > 0,
          concat(array(lit("START")),
            slice(col("__types"), lit(1), (col("__cpos") - 1).cast("int")),
            array(lit("CONV"))))
        .otherwise(concat(array(lit("START")), col("__types"),
          array(lit("NULL")))).as("__path"))
    val trans = paths
      .select(explode(transform(
        sequence(lit(0), size(col("__path")) - 2),
        i => struct(element_at(col("__path"), i + 1).as("src"),
          element_at(col("__path"), i + 2).as("dst")))).as("p"))
      .select(col("p.src"), col("p.dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    // bounded by the event-type vocabulary squared — never data-∝
    val edges = trans.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2))
    val totals = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._3).sum
    }
    val transientStates =
      edges.map(_._1).distinct.sorted // every transient state has out-edges
    def absorb(removed: Option[String]): Double = {
      var p = transientStates.map(_ -> 0.0).toMap
      for (_ <- 1 to iters) {
        p = transientStates.map { s =>
          s -> edges.filter(_._1 == s).map { case (_, t, c) =>
            val pv =
              if (t == "CONV") 1.0
              else if (t == "NULL" || removed.contains(t)) 0.0
              else p(t)
            (c.toDouble / totals(s)) * pv
          }.sum
        }.toMap
      }
      p("START")
    }
    val pBase = absorb(None)
    require(pBase > 0,
      "markovAttribution: no converting path — nothing to attribute")
    val channels = transientStates.filterNot(_ == "START")
    val effects = channels.map(c => c -> (pBase - absorb(Some(c))) / pBase)
    val totalEffect = effects.map(_._2).sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = effects.map { case (c, e) =>
      (c, r6(e), r6(if (totalEffect > 0) e / totalEffect else 0.0))
    }
    events.sparkSession.createDataFrame(out.toSeq)
      .toDF("channel", "removal_effect", "attribution_share")
  }

  /**
   * Funnel time-to-convert percentiles — the latency companion of
   * [[funnel]]'s reach counts: for every user who reached step k, the
   * seconds from their funnel ANCHOR (first entry-step event) to the
   * greedy-earliest step-k completion, summarized as exact percentiles
   * per step. "Half the buyers buy within 8 minutes, the p90 takes two
   * days" is what decides the attribution window and the re-engagement
   * cadence — the reach counts alone can't say it.
   *
   * Exactly [[funnel]]'s chaining semantics (greedy-earliest, strict
   * order, whole chain inside the anchor window) — the per-step user
   * sets are identical by construction; this variant keeps each
   * reached user's step timestamp and feeds the elapsed seconds to
   * [[Stats.exactPercentiles]] (one per-step rank window over the
   * step's reached-user frame). Elapsed values are timestamp
   * differences in double seconds — engine-exact arithmetic on
   * identical inputs.
   *
   * Output: one row per non-entry step:
   * (step, step_idx, p<…> per requested fraction, n_rows).
   */
  def funnelLatency(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowSeconds: Long,
      ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(windowSeconds > 0, "window must be positive")
    val base = events.select(
      col(userCol).as("u"), col(typeCol).as("t"), col(tsCol).as("ts"))
    var reached = base.filter(col("t") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("anchor"))
      .withColumn("prev", col("anchor"))
      .localCheckpoint()
    val latFrames = Seq.newBuilder[DataFrame]
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val prevStage = reached.withColumnRenamed("u", "__ru")
      reached = base.filter(col("t") === step)
        .join(prevStage, col("u") === col("__ru")).drop("__ru")
        .filter(col("ts") > col("prev") &&
          col("ts") <= col("anchor") + expr(s"INTERVAL $windowSeconds SECONDS"))
        .groupBy("u")
        .agg(min(col("ts")).as("__step_ts"),
          min(col("anchor")).as("anchor"))
        .withColumn("prev", col("__step_ts")).drop("__step_ts")
        .localCheckpoint()
      latFrames += reached.select(
        lit(step).as("step"), lit(i + 2).as("step_idx"),
        (col("prev").cast("double") - col("anchor").cast("double"))
          .as("elapsed_s"))
    }
    Stats.exactPercentiles(
      latFrames.result().reduce(_ unionByName _),
      groupCols = Seq("step", "step_idx"), valueCol = "elapsed_s", ps = ps)
  }

  /**
   * Seasonal-naive volume forecast error (MASE — Hyndman & Koehler
   * 2006, public) — the capacity-planning gauge over event volumes:
   * how well does "same hour yesterday" predict each type's hourly
   * count, scaled by the one-step naive baseline so types with wildly
   * different volumes compare on one axis:
   *
   *   MASE = mean|y_t − y_{t−season}| / mean|y_t − y_{t−1}|
   *
   * MASE < 1 → the seasonal pattern is real (schedule by it);
   * MASE ≈ 1 → no daily seasonality; a constant series (denominator
   * 0) → null. Both means run over the DENSIFIED per-type hour grid
   * ([[rateAnomalies]]' spine discipline — missing hours are real
   * zeros, not absent rows), so a source going dark counts against
   * the forecast instead of vanishing.
   *
   * All counts and absolute differences are exact integers; the MASE
   * ratio is computed from the four integer sums in one division —
   * engine-exact. One (type, hour) aggregation, one per-type spine
   * join, ONE type-keyed window pass (both lags ride it).
   *
   * Output: one row per type: (event_type, n_hours, sum_abs_seasonal,
   * n_seasonal, sum_abs_naive1, n_naive1, mase).
   */
  def volumeForecastError(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      seasonHours: Int = 24): DataFrame = {
    require(seasonHours >= 2, "season must be at least 2 hours")
    val hourly = events
      .select(col(typeCol).as("event_type"),
        floor(col(tsCol).cast("double") / 3600).as("__h"))
      .groupBy("event_type", "__h")
      .agg(count(lit(1)).as("__n"))
    val spine = hourly.groupBy("event_type")
      .agg(min("__h").as("__lo"), max("__h").as("__hi"))
      .select(col("event_type"),
        explode(sequence(col("__lo"), col("__hi"))).as("__h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("__h"))
    val grid = spine
      .join(hourly, Seq("event_type", "__h"), "left_outer")
      .select(col("event_type"), col("__h"),
        coalesce(col("__n"), lit(0L)).as("__y"))
      .withColumn("__ys", lag(col("__y"), seasonHours).over(w))
      .withColumn("__y1", lag(col("__y"), 1).over(w))
    grid.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        coalesce(sum(abs(col("__y") - col("__ys"))), lit(0L))
          .as("sum_abs_seasonal"),
        count(col("__ys")).as("n_seasonal"),
        coalesce(sum(abs(col("__y") - col("__y1"))), lit(0L))
          .as("sum_abs_naive1"),
        count(col("__y1")).as("n_naive1"))
      .select(col("event_type"), col("n_hours"), col("sum_abs_seasonal"),
        col("n_seasonal"), col("sum_abs_naive1"), col("n_naive1"),
        round(when(col("sum_abs_naive1") === 0 || col("n_seasonal") === 0,
          lit(null).cast("double"))
          .otherwise(col("sum_abs_seasonal").cast("double") *
            col("n_naive1") / (col("n_seasonal") * col("sum_abs_naive1"))),
          6).as("mase"))
  }

  /**
   * Longest sustained burst per event type — the classic
   * gaps-and-islands decomposition over the DENSIFIED hour grid
   * ([[volumeForecastError]]'s spine discipline): consecutive hours at
   * or above `minCount` events form an island; the report gives each
   * type's longest island and when it started. The duration-aware
   * companion of [[rateAnomalies]]' point alarms — "traffic spiked"
   * vs "traffic has been elevated for 14 straight hours" are
   * different operational facts.
   *
   * Islands come from the standard two-rank difference (`row_number`
   * over all hours minus `row_number` over qualifying hours is
   * constant within a run) — both ranks ride ONE type-keyed window
   * pass over the hour grid; the rollup is decomposable. Ties on
   * length break toward the EARLIEST start. Integer arithmetic
   * end-to-end.
   *
   * Output: one row per type with any qualifying hour:
   * (event_type, n_hours, n_burst_hours, longest_burst,
   * burst_start_hour).
   */
  def longestBurst(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val hourly = events
      .select(col(typeCol).as("event_type"),
        floor(col(tsCol).cast("double") / 3600).as("__h"))
      .groupBy("event_type", "__h")
      .agg(count(lit(1)).as("__n"))
    val spine = hourly.groupBy("event_type")
      .agg(min("__h").as("__lo"), max("__h").as("__hi"))
      .select(col("event_type"),
        explode(sequence(col("__lo"), col("__hi"))).as("__h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("__h"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("__q")).orderBy(col("__h"))
    val grid = spine
      .join(hourly, Seq("event_type", "__h"), "left_outer")
      .select(col("event_type"), col("__h"),
        (coalesce(col("__n"), lit(0L)) >= minCount).as("__q"))
      .withColumn("__grp",
        row_number().over(w) - row_number().over(wq))
    val islands = grid
      .filter(col("__q"))
      .groupBy(col("event_type"), col("__grp"))
      .agg(count(lit(1)).as("__len"), min(col("__h")).as("__start"))
    val totals = grid.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("__q"), 1L).otherwise(0L)).as("n_burst_hours"))
    islands
      .groupBy("event_type")
      .agg(max(struct(col("__len").as("l"), (-col("__start")).as("ns")))
        .as("__m"))
      .select(col("event_type"), col("__m.l").as("longest_burst"),
        (-col("__m.ns")).as("burst_start_hour"))
      .join(totals, Seq("event_type"))
      .select(col("event_type"), col("n_hours"), col("n_burst_hours"),
        col("longest_burst"), col("burst_start_hour"))
  }

  /**
   * CUPED experiment readout (Deng et al. 2013, "Improving the
   * Sensitivity of Online Controlled Experiments", public) — the
   * variance-reduction standard of every experimentation platform:
   * adjust each user's in-experiment metric by their PRE-PERIOD
   * behavior, `y* = y − θ·(x − x̄)`, `θ = cov(x,y)/var(x)`, shrinking
   * metric variance by exactly `θ²·var(x)` without biasing the
   * treatment contrast (x predates assignment).
   *
   * DETERMINISM: per-user x (pre) and y (post) sums run through
   * decimal(28,8) — exact, order-free; every downstream moment
   * (Σx, Σy, Σxy, Σx², Σy²) is likewise decimal-exact, and the
   * per-arm ADJUSTED mean is computed analytically from those sums
   * (`meanŷ = (Σy_arm − θ·(Σx_arm − n_arm·x̄))/n_arm`) rather than by
   * summing per-row adjusted values — no float accumulation anywhere,
   * so the readout replays bit-for-bit. Variance reduction is the
   * identity `var(y*) = var(y) − θ²·var(x)`.
   *
   * Scale shape: one decomposable per-user conditional aggregation
   * (the universe = users with any event), one 1-row moment rollup
   * broadcast into the |arms|-row report. Nothing row-∝ beyond the
   * first aggregation.
   *
   * Output: one row per arm: (arm, n_users, mean_y, mean_y_adj,
   * theta, var_y, var_y_adj) — theta/variances are global, repeated
   * per row for a self-contained report.
   */
  def cupedReadout(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      cutoverTs: String,
      armOf: Column): DataFrame = {
    val dec = "decimal(28,8)"
    val pre = when(col(tsCol) < lit(cutoverTs).cast("timestamp"),
      col(valueCol)).otherwise(lit(0.0))
    val post = when(col(tsCol) >= lit(cutoverTs).cast("timestamp"),
      col(valueCol)).otherwise(lit(0.0))
    val perUser = events
      .groupBy(col(userCol))
      .agg(sum(pre.cast(dec)).cast("double").as("__x"),
        sum(post.cast(dec)).cast("double").as("__y"))
      .select(col(userCol), armOf.as("arm"), col("__x"), col("__y"))
    val moments = perUser.agg(
      count(lit(1)).as("__n"),
      sum(col("__x").cast(dec)).cast("double").as("__sx"),
      sum(col("__y").cast(dec)).cast("double").as("__sy"),
      sum((col("__x") * col("__y")).cast(dec)).cast("double").as("__sxy"),
      sum((col("__x") * col("__x")).cast(dec)).cast("double").as("__sxx"),
      sum((col("__y") * col("__y")).cast(dec)).cast("double").as("__syy"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("__x").cast(dec)).cast("double").as("__ax"),
        sum(col("__y").cast(dec)).cast("double").as("__ay"))
    val n = col("__n").cast("double")
    val varX = col("__sxx") / n - (col("__sx") / n) * (col("__sx") / n)
    val varY = col("__syy") / n - (col("__sy") / n) * (col("__sy") / n)
    val covXY = col("__sxy") / n - (col("__sx") / n) * (col("__sy") / n)
    // degenerate pre-period (no activity / constant covariate): theta
    // would be cov/0 = NaN and poison every adjusted column — degrade
    // to the UNADJUSTED readout instead (theta = 0 ⇒ adj = raw)
    val theta = when(varX === 0.0, lit(0.0)).otherwise(covXY / varX)
    arms.crossJoin(broadcast(moments))
      .select(col("arm"), col("n_users"),
        round(col("__ay") / col("n_users"), 6).as("mean_y"),
        round((col("__ay") - theta *
          (col("__ax") - col("n_users") * (col("__sx") / n))) /
          col("n_users"), 6).as("mean_y_adj"),
        round(theta, 6).as("theta"),
        round(varY, 6).as("var_y"),
        round(varY - theta * theta * varX, 6).as("var_y_adj"))
  }

  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      epochDate: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "periodDays must be at least 1")
    val period = floor(
      datediff(col(tsCol).cast("date"), lit(epochDate).cast("date")) /
        periodDays).cast("long")
    val activity = events
      .select(col(userCol).as("u"), period.as("p")).distinct()
    val cohorts = activity.groupBy("u").agg(min(col("p")).as("cohort"))
    val joined = activity.join(cohorts, "u")
      .select(col("u"), col("cohort"), (col("p") - col("cohort")).as("k"))
    val byK = joined.groupBy("cohort", "k")
      .agg(count(lit(1)).as("n_users")) // (u, p) already distinct
    val sizes = cohorts.groupBy("cohort").agg(count(lit(1)).as("__size"))
    byK.join(sizes, "cohort")
      .select(col("cohort"), col("k"), col("n_users"),
        round(col("n_users").cast("double") / col("__size"), 6).as("retention"))
  }

  /**
   * Event-rate anomaly detection: per (type, hour) counts z-scored
   * against that type's own TRAILING window (`trailing` WALL-CLOCK
   * hours ending the hour before — the current hour never contaminates
   * its own baseline). The ops alarm behind ingestion monitoring: a
   * source going dark or a bot storm is a |z| spike long before it is
   * a corpus-quality problem.
   *
   * The hour grid is DENSIFIED per type before windowing: each type's
   * [min hour, max hour] range is filled with n = 0 rows, so the
   * trailing frame spans `trailing` real hours (not the last
   * `trailing` OBSERVED hours, which under gaps could cover an
   * arbitrarily long wall-clock span), and an hour with zero events
   * emits an n = 0 row whose z goes sharply negative — the
   * source-going-dark alarm actually fires. (Full-range darkness past
   * a type's last event is unobservable batch-side by construction;
   * the streaming maintainer owns the "no data at all since T" case.)
   *
   * Determinism note (oracle parity): the baseline is computed from
   * DECOMPOSABLE window sums — `Σn`, `Σn²`, `count` → mean = Σn/c,
   * var = (Σn² − (Σn)²/c)/(c−1) — rather than `stddev_samp`, whose
   * merge order differs between engines at the ulp level. Integer sums
   * are exact, so both engines evaluate bit-identical doubles.
   *
   * Scale shape: one (type, hour) aggregation, a per-type hour spine
   * (one `sequence` array per type — a decade-long type is ~90k
   * entries, well under array limits) left-joined back, then ONE
   * type-keyed window — |types| partitions of |range-hours| rows each;
   * warm-up hours (fewer than 2 trailing points) emit null z.
   */
  def rateAnomalies(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      trailing: Int = 24,
      zThreshold: Double = 3.0): DataFrame = {
    require(trailing >= 2, "need at least 2 trailing hours for a variance")
    val observed = events
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    // densify: every hour in the type's [min, max] range, n = 0 fill
    val spine = observed.groupBy("event_type")
      .agg(min(col("hour")).as("__mn"), max(col("hour")).as("__mx"))
      .select(col("event_type"),
        explode(expr("sequence(__mn, __mx, interval 1 hour)")).as("hour"))
    val hourly = spine.join(observed, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-trailing, -1)
    val nD = col("n").cast("double")
    val s1 = sum(nD).over(w)
    val s2 = sum(nD * nD).over(w)
    val c = count(col("n")).over(w).cast("double")
    hourly
      .select(col("event_type"), col("hour"), col("n"),
        s1.as("__s1"), s2.as("__s2"), c.as("__c"))
      .select(col("event_type"), col("hour"), col("n"),
        when(col("__c") >= 2,
          greatest(
            (col("__s2") - col("__s1") * col("__s1") / col("__c")) /
              (col("__c") - 1),
            lit(0.0))).as("__var"),
        (col("__s1") / col("__c")).as("__mean"), col("__c"))
      .select(col("event_type"), col("hour"), col("n"),
        when(col("__c") >= 2 && sqrt(col("__var")) > 0,
          round((col("n").cast("double") - col("__mean")) / sqrt(col("__var")), 6))
          .as("z"))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
  }
}
