package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Crawl scheduling — the step between a discovered frontier
 * ([[graft.functions.SitemapExtract]], extracted links) and the
 * fetcher fleet: per-host POLITENESS serializes requests to one host
 * (RFC 9309 crawl-delay etiquette), so the schedule assigns every URL
 * a per-host sequence slot and an earliest-fetch offset, and the
 * per-host makespan (slots × delay) is what capacity planning reads —
 * a host with 10⁶ pages at 1 req/s is an 11-day crawl no matter how
 * many fetchers exist, which is why [[UrlOps.domainCap]] runs first.
 *
 * Scale shape: ONE host-keyed window (rank within host) — the same
 * partitioning the per-domain cap and the fetch queues themselves use;
 * no global sort, no driver state. Ordering within a host is
 * deterministic (priority asc, then URL asc), so re-planning a crawl
 * on different cluster layouts yields the same schedule.
 */
object Crawl {

  /**
   * Assign per-host fetch slots: `seq` (0-based within host, by
   * `priorityCol` asc then `urlCol` asc) and `eta_s = seq × delay`.
   * `delayCol` is the host's crawl delay in seconds (constant per
   * host — typically joined from parsed robots rules; rows of one
   * host MUST agree — [[hostLoad]]'s `n_delay_values` column surfaces
   * violations of that contract, and its reported `delay_s` is the
   * deterministic `min` either way).
   */
  def politeSchedule(
      frontier: DataFrame,
      hostCol: String,
      urlCol: String,
      delayCol: String,
      priorityCol: Option[String] = None): DataFrame = {
    val order: Seq[Column] =
      priorityCol.map(c => col(c).asc).toSeq :+ col(urlCol).asc
    val w = Window.partitionBy(col(hostCol)).orderBy(order: _*)
    frontier.withColumn("seq", row_number().over(w) - 1)
      .withColumn("eta_s", col("seq") * col(delayCol))
  }

  /** Per-host schedule summary: queue depth, makespan, mean wait —
    * the capacity-planning rollup (decomposable aggregates over the
    * schedule; shares the host partitioning). `delay_s` is the
    * deterministic `min` of the delay column (== the delay when the
    * rows-agree contract holds); `n_delay_values` counts distinct
    * delays per host, so a contract violation (> 1) is visible in the
    * rollup instead of silently picking an arbitrary row. */
  /**
   * Freshness-aware revisit scheduling (Cho & Garcia-Molina 2003,
   * "Estimating Frequency of Change", public) — turn per-page visit
   * history into a re-crawl cadence: with `changes` detected over
   * `visits` equi-spaced checks, the Poisson change-rate MLE is
   *
   *   λ̂ = −ln(1 − changes/visits)   (changes per visit interval)
   *
   * and the revisit interval scales as `baseDays / λ̂`, clamped to
   * [minDays, maxDays] — hot pages re-crawl fast, static archives
   * don't burn fetch budget. The always-changed boundary
   * (changes = visits, λ̂ = ∞) clamps the fraction to
   * `(visits − 0.5)/visits` (the standard continuity correction) so
   * the estimator stays finite; zero changes clamp to the max
   * interval directly. Pages with fewer than `minVisits` observations
   * report `insufficient` instead of a guessed cadence.
   *
   * Pure projection arithmetic over the (page, visits, changes)
   * history frame — one `ln`, one division, two clamps; round 6. At
   * crawl scale the history frame IS the page table: everything stays
   * narrow, nothing shuffles.
   *
   * Output: (input cols…, change_rate, revisit_days, verdict).
   */
  def revisitSchedule(
      history: DataFrame,
      visitsCol: String,
      changesCol: String,
      baseDays: Double = 1.0,
      minDays: Double = 0.25,
      maxDays: Double = 60.0,
      minVisits: Long = 4L): DataFrame = {
    require(baseDays > 0 && minDays > 0 && maxDays >= minDays,
      "day bounds must be positive and ordered")
    require(minVisits >= 1, "minVisits must be >= 1")
    val v = col(visitsCol).cast("double")
    val c = col(changesCol).cast("double")
    val frac = when(c >= v, (v - 0.5) / v).otherwise(c / v)
    val lambda = -log(lit(1.0) - frac)
    val days = least(lit(maxDays),
      greatest(lit(minDays), lit(baseDays) / lambda))
    history
      .withColumn("change_rate",
        when(col(visitsCol) < minVisits || c === 0, lit(null))
          .otherwise(round(lambda, 6)))
      .withColumn("revisit_days",
        when(col(visitsCol) < minVisits, lit(null))
          .when(c === 0, lit(maxDays))
          .otherwise(round(days, 6)))
      .withColumn("verdict",
        when(col(visitsCol) < minVisits, lit("insufficient"))
          .when(c === 0, lit("static"))
          .otherwise(lit("scheduled")))
  }

  def hostLoad(schedule: DataFrame, hostCol: String, delayCol: String): DataFrame =
    schedule.groupBy(col(hostCol).as("host"))
      .agg(
        count(lit(1)).as("n_urls"),
        max(col("eta_s")).as("makespan_s"),
        round(avg(col("eta_s")), 6).as("mean_wait_s"),
        min(col(delayCol)).as("delay_s"),
        countDistinct(col(delayCol)).as("n_delay_values"))
}
