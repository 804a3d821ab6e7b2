package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact distribution statistics (percentiles with linear
 * interpolation), computed from first principles rather than the
 * engines' quantile builtins — `percentile`/`quantile_cont`
 * implementations differ subtly across engines, while rank arithmetic
 * (`pos = (n−1)·p`, interpolate between the two bracketing order
 * statistics) is deterministic double math that reproduces bit-for-bit
 * in the DuckDB oracle.
 *
 * Plan shape: ONE rank window per group (hash exchange on the group key
 * + per-partition sort) feeding a conditional aggregation on the same
 * key — Catalyst reuses the partitioning, so the whole multi-percentile
 * computation costs a single shuffle. All requested percentiles come
 * out of the same pass.
 */
object Stats {

  /**
   * Per-group trimmed statistics — the robust mean of textbook
   * statistics: drop the `trimFrac` smallest and largest values in
   * each group before averaging, so a handful of pathological
   * documents (a 100 MB page, a 3-byte stub) cannot drag a source's
   * length profile. The per-source calibration input raw means get
   * wrong exactly where curation matters (the outlier-heavy sources).
   *
   * The rank is one PER-GROUP window (never a global sort); trimming
   * cuts `floor(n·trimFrac)` rows per end by rank, and because equal
   * boundary values are interchangeable under sum/mean, the tie order
   * inside the window cannot change the result — the trimmed MULTISET
   * is deterministic even though the rank itself is not total.
   * Integer-valued inputs keep the sums exact; the two means are
   * single divisions (round 6).
   *
   * Output: (groupCol, n, n_trimmed, mean_raw, mean_trimmed).
   */
  def trimmedStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      trimFrac: Double = 0.05): DataFrame = {
    require(trimFrac >= 0 && trimFrac < 0.5,
      s"trimFrac must be in [0, 0.5), got $trimFrac")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val n = Window.partitionBy(col(groupCol))
    val ranked = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).as("__v"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("__cut", floor(col("__n") * lit(trimFrac)))
    ranked
      .groupBy(col(groupCol))
      .agg(
        max(col("__n")).as("n"),
        (lit(2) * max(col("__cut"))).as("n_trimmed"),
        round(sum(col("__v")).cast("double") / max(col("__n")), 6)
          .as("mean_raw"),
        round(
          sum(when(col("__rk") > col("__cut") &&
            col("__rk") <= col("__n") - col("__cut"), col("__v"))
            .otherwise(lit(0))).cast("double") /
            (max(col("__n")) - lit(2) * max(col("__cut"))), 6)
          .as("mean_trimmed"))
  }

  /**
   * Gini concentration of per-group mass — the single-number "is this
   * corpus a monoculture" gauge (textbook Gini over the discrete
   * distribution, sorted ascending): 0 = every domain contributes
   * equally, →1 = a handful of domains own everything. The
   * corpus-health companion of the domain caps: the cap enforces a
   * limit, the Gini MEASURES how close the crawl sails to needing it.
   *
   *   G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)   (xᵢ ascending, i = 1…n)
   *
   * One decomposable per-group count, then ONE window over the
   * |groups|-row frame (groups = domains/sources — bounded, never
   * corpus-∝); integer sums throughout, one final division (round 6).
   * Ties in mass order by group name — the formula is tie-invariant
   * (equal xᵢ swap freely), the pin is for the plan's determinism.
   *
   * Output: one row (n_groups, total, gini).
   */
  def giniConcentration(
      df: DataFrame,
      groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perGroup = df
      .filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__x"))
    // single-partition window over the per-GROUP counts (group-bounded,
    // never the row count)
    val w = Window.orderBy(col("__x").asc, col(groupCol).asc)
    perGroup
      .withColumn("__i", row_number().over(w))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__x")).as("total"),
        round((lit(2) * sum(col("__i") * col("__x")) -
          (count(lit(1)) + 1) * sum(col("__x"))).cast("double") /
          (count(lit(1)) * sum(col("__x"))), 6).as("gini"))
  }

  /**
   * One-pass column profiler — the data-quality sibling of the
   * reference's rule engine: per column, row/null/distinct counts and
   * (numeric columns only) min/max as doubles. Every metric for every
   * column is computed in ONE aggregation over ONE scan; the single
   * result row is MATERIALIZED (localCheckpoint) before the per-column
   * unpivot, because each union branch would otherwise re-execute the
   * whole aggregate — exchange reuse does not deduplicate across union
   * branches here (measured: k columns → 2k scans without the
   * checkpoint, one with). The multi-column `count_distinct` plans
   * through Spark's Expand — one duplicated stream per distinct column,
   * the standard cost and the dominant term in the profile's runtime;
   * `approxDistinct = true` swaps in `approx_count_distinct` (HLL++,
   * ~2% default error), which removes the Expand entirely — constant
   * sketch state per column, one un-duplicated stream. That is the
   * 100 TB configuration; exact distincts stay the oracle-checked
   * default.
   *
   * Output: (column, n_rows, n_nulls, n_distinct, min_val, max_val).
   */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    def isNum(c: String) = df.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def nd(c: String) =
      if (approxDistinct) approx_count_distinct(col(c)) else count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        nd(c).as(s"__nd_$c")) ++
        (if (isNum(c))
           Seq(min(col(c)).cast("double").as(s"__mn_$c"),
             max(col(c)).cast("double").as(s"__mx_$c"))
         else Nil)
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*).localCheckpoint()
    cols.map { c =>
      one.select(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        (if (isNum(c)) col(s"__mn_$c") else lit(null).cast("double")).as("min_val"),
        (if (isNum(c)) col(s"__mx_$c") else lit(null).cast("double")).as("max_val"))
    }.reduce(_.unionByName(_))
  }

  /** Per-group exact percentiles of `valueCol` (linear interpolation,
    * results rounded to 6 decimals). Output: group cols + one
    * `p<percent>` column per requested fraction + `n_rows`.
    *
    * Null values of `valueCol` are EXCLUDED (the SQL-aggregate
    * convention, and what DuckDB's `quantile_cont` does). Without the
    * filter, Spark's `asc` window order puts nulls FIRST — they'd take
    * ranks 1..m AND count toward `n`, shifting every percentile (and
    * diverging from engines that order nulls last). `n_rows` counts
    * non-null values only. */
  def exactPercentiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__v").asc)
    val ranked = df
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
    val aggs = ps.flatMap { p =>
      val pos = (col("__n") - 1).cast("double") * p // 0-based fractional rank
      val lo = floor(pos).cast("long") + 1 // 1-based bracketing ranks
      val hi = ceil(pos).cast("long") + 1
      val name = pName(p)
      Seq(
        max(when(col("__rn") === lo, col("__v"))).as(s"__lo_$name"),
        max(when(col("__rn") === hi, col("__v"))).as(s"__hi_$name"),
        max(pos - floor(pos)).as(s"__frac_$name"))
    } :+ max(col("__n")).as("n_rows")
    val agged = ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val outCols = groupCols.map(col) ++ ps.map { p =>
      val name = pName(p)
      round(col(s"__lo_$name") +
        (col(s"__hi_$name") - col(s"__lo_$name")) * col(s"__frac_$name"), 6).as(name)
    } :+ col("n_rows")
    agged.select(outCols: _*)
  }

  /**
   * Approximate percentiles — the 100 TB twin of [[exactPercentiles]],
   * same output shape (group cols + one `p<percent>` column per
   * fraction + `n_rows`) so it's a drop-in swap.
   *
   * [[exactPercentiles]] ranks every row (a full per-group sort under
   * the window) — exact, but at extreme group cardinalities the sort
   * IS the job. This twin aggregates a bounded Greenwald-Khanna
   * quantile sketch instead, via Spark's built-in `percentile_approx`:
   * deliberately NOT a bespoke typed Aggregator, because the built-in
   * is the same KLL/GK-family sketch already implemented as a
   * partial-aggregating ImperativeAggregate (map-side partials, one
   * exchange of fixed-size sketch state, ObjectHashAggregate) — a
   * hand-rolled one would duplicate it with more risk and no plan
   * advantage. One sketch per group serves ALL requested fractions.
   *
   * Guarantee: rank error ≤ n/`accuracy` per group (GK bound), exact
   * when a group has ≤ `accuracy` rows. Null handling matches the
   * exact twin EXACTLY, including the row set: null values are
   * excluded BEFORE grouping, so a group whose values are all null is
   * omitted from the output (not emitted with null percentiles) —
   * swapping exact ↔ approx can never change which groups exist.
   * Values are true order statistics (no interpolation), so approx and
   * exact can differ by one sample even on small groups.
   */
  def approxPercentiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val v = col(valueCol).cast("double")
    val agged = df
      .filter(v.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        percentile_approx(v, array(ps.map(lit): _*), lit(accuracy)).as("__qs"),
        count(v).as("n_rows"))
    val outCols = groupCols.map(col) ++
      ps.zipWithIndex.map { case (p, i) => col("__qs").getItem(i).as(pName(p)) } :+
      col("n_rows")
    agged.select(outCols: _*)
  }

  /**
   * Benford first-digit audit (Newcomb 1881 / Benford 1938, public) —
   * the fabricated-data detector every audit stack ships: naturally
   * occurring multi-scale positive quantities put digit d first with
   * probability log₁₀(1 + 1/d); synthetic, truncated, or manually
   * entered values don't. Per digit: observed count/share, the Benford
   * expectation, and the χ² goodness-of-fit term.
   *
   * The first significant digit comes from the value's STRING form
   * (first character in 1-9) rather than log/pow arithmetic — the
   * string route has no float-boundary risk (log₁₀(1000) landing at
   * 2.9999…), and any decimal or scientific rendering starts with the
   * same significant digit. Zero/null/negative values are excluded
   * (Benford applies to positive magnitudes; sign conventions are the
   * caller's normalization).
   *
   * One decomposable digit count (9-row output) + a 1-row total;
   * expected shares are exact `log10` of rational constants. χ² terms
   * round 6.
   *
   * Output: (digit, n, share, expected_share, chi2_term), 9 rows.
   */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val firstDigit = regexp_extract(
      abs(col(valueCol)).cast("string"), "[1-9]", 0)
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) =!= 0)
      .select(firstDigit.as("__d"))
      .filter(col("__d") =!= "")
      .groupBy(col("__d").cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
    val digits = df.sparkSession.createDataFrame(
      (1 to 9).map(d => (d, math.log10(1.0 + 1.0 / d))))
      .toDF("digit", "expected_share")
    val tot = counts.agg(sum(col("n")).as("__t"))
    digits
      .join(counts, Seq("digit"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("n"), lit(0L)).cast("double") / col("__t"), 6)
          .as("share"),
        round(col("expected_share"), 6).as("expected_share"),
        round(
          (coalesce(col("n"), lit(0L)) - col("expected_share") * col("__t")) *
            (coalesce(col("n"), lit(0L)) - col("expected_share") * col("__t"))
            / (col("expected_share") * col("__t")), 6).as("chi2_term"))
  }

  /**
   * Bucket-jackknife ratio-metric readout (Quenouille/Tukey jackknife;
   * the delete-one-bucket form every experimentation platform uses for
   * ratio metrics, public) — a ratio of sums `θ = Σnum/Σden` (revenue
   * per session, clicks per user) has NO closed-form variance; the
   * delete-one-bucket estimates
   *
   *   θ₍ᵦ₎ = (Σnum − num_b)/(Σden − den_b)
   *
   * give `se² = (B−1)/B · Σ(θ₍ᵦ₎ − θ̄)²` and the bias-corrected
   * `θ_jk = B·θ − (B−1)·θ̄`. Buckets come from a deterministic hash of
   * the RANDOMIZATION UNIT (users), so correlated rows stay together —
   * bucketing rows instead would understate the variance.
   *
   * Per-bucket sums run through decimal(28,8) (exact, order-free);
   * each θ₍ᵦ₎ is computed ANALYTICALLY from those sums; only the final
   * B-term moments are float sums (B caller-bounded, round-6 display
   * far above the jitter). Output: one row
   * (b_buckets, theta, theta_jk, se).
   */
  def jackknifeRatio(
      df: DataFrame,
      bucketOf: Column,
      numCol: String,
      denCol: String): DataFrame = {
    val dec = "decimal(28,8)"
    val per = df
      .groupBy(bucketOf.as("__bkt"))
      .agg(sum(col(numCol).cast(dec)).cast("double").as("__n"),
        sum(col(denCol).cast(dec)).cast("double").as("__d"))
      .localCheckpoint() // feeds totals AND leave-one-out frame
    val tot = per.agg(count(lit(1)).as("__B"),
      sum(col("__n").cast(dec)).cast("double").as("__sn"),
      sum(col("__d").cast(dec)).cast("double").as("__sd"))
    val loo = per.crossJoin(broadcast(tot))
      .select(col("__B"), col("__sn"), col("__sd"),
        ((col("__sn") - col("__n")) / (col("__sd") - col("__d")))
          .as("__t"))
    // θ moments also go through decimal — a float Σθ² − B·θ̄² is a
    // catastrophic cancellation, and its last-ulp jitter would be
    // AMPLIFIED, not hidden, by the final sqrt
    loo
      .groupBy(col("__B"), col("__sn"), col("__sd"))
      .agg(sum(col("__t").cast(dec)).cast("double").as("__st"),
        sum((col("__t") * col("__t")).cast(dec)).cast("double")
          .as("__tsq"))
      .select(col("__B").as("b_buckets"),
        round(col("__sn") / col("__sd"), 6).as("theta"),
        round(col("__B") * (col("__sn") / col("__sd")) -
          (col("__B") - 1) * (col("__st") / col("__B")), 6)
          .as("theta_jk"),
        round(sqrt(greatest(lit(0.0),
          ((col("__B") - 1).cast("double") / col("__B")) *
            (col("__tsq") - col("__B") * (col("__st") / col("__B")) *
              (col("__st") / col("__B"))))), 6).as("se"))
  }

  /**
   * Hill tail-index estimator (Hill 1975, public) — how heavy is the
   * upper tail of a positive metric (doc lengths, host page counts):
   * over the top `k` order statistics x₍₁₎ ≥ … ≥ x₍ₖ₎ and the
   * threshold x₍ₖ₊₁₎,
   *
   *   H = (1/k) Σᵢ ln(xᵢ / x₍ₖ₊₁₎),   α̂ = 1/H
   *
   * α̂ ≤ 2 means infinite variance — mean-based capacity planning on
   * that column is wrong, quantile planning isn't optional. The
   * TAIL-side companion of the q212 Zipf rank-slope (that fits the
   * frequency law; this measures a distribution's extreme-value
   * weight).
   *
   * The top k+1 values are order statistics (tie-deterministic) via
   * one TakeOrdered — k is caller-bounded, nothing global sorts. Each
   * ln term micro-quantizes to an integer before summation, so H is
   * an exact integer sum + one division; α̂ = 1/H (both round 6).
   * Zero/negative values are excluded (the estimator is defined on
   * positive tails).
   *
   * Output: one row (k, threshold, hill, alpha).
   */
  def hillTailIndex(
      df: DataFrame,
      valueCol: String,
      k: Int = 100): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val top = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && col("__v") > 0)
      .orderBy(col("__v").desc)
      .limit(k + 1)
      .localCheckpoint() // feeds the threshold AND the terms
    val thr = top.agg(min(col("__v")).as("__thr"))
    // terms tied AT the threshold contribute ln(1) = 0 — excluding
    // them leaves the k-term sum unchanged, so the tie cut is exact
    top.crossJoin(broadcast(thr))
      .filter(col("__v") > col("__thr"))
      .select(round(log(col("__v") / col("__thr")) * 1e6).cast("long")
        .as("__t"))
      .agg(coalesce(sum(col("__t")), lit(0L)).as("__s"))
      .crossJoin(broadcast(thr))
      .select(lit(k).as("k"), col("__thr").as("threshold"),
        round(col("__s").cast("double") / 1e6 / lit(k), 6).as("hill"),
        // a flat top (H = 0) has no finite tail index — null, not ∞
        when(col("__s") === 0, lit(null).cast("double"))
          .otherwise(round(lit(k) * 1e6 / col("__s").cast("double"), 6))
          .as("alpha"))
  }

  /** `0.95` → `p95`, `0.5` → `p50`, `0.999` → `p99_9`. Goes through the
    * decimal STRING form of p — `0.9 * 100` in binary doubles is
    * 90.00000000000001, which would leak into the column name. */
  def pName(p: Double): String =
    "p" + (BigDecimal(p.toString) * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_").replace("-", "")
}
