package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Keyed-operation skew diagnostics — the pre-flight check before any
 * large join or aggregation at scale. Every shuffle hash-partitions by
 * key, so ONE heavy key serializes an entire stage behind one reducer;
 * knowing the heavy-hitter set and how far it sits above the mean is
 * what decides between a plain shuffle, AQE skew splitting, and an
 * explicit salt ([[Aggregate.saltedRollup]]).
 *
 * Scale shape: one decomposable `groupBy(key).count` (map-side
 * combined), a 1-row global stat aggregate broadcast back, and a
 * `TakeOrderedAndProject` top-k — no windows, no global sort, nothing
 * driver-side beyond k rows.
 */
object Diagnostics {

  /**
   * Top-`topK` keys by row count, each with:
   *  - `share`  — the key's fraction of all rows;
   *  - `mean_n` — mean rows per key over the whole key space;
   *  - `skew`   — this key's count over the mean (1.0 = perfectly even);
   *  - `rec_salt` — `ceil(skew / 2)`: the salt fan-out that would level
   *    this key's partitions to ~2× the mean, i.e. the number a caller
   *    passes straight to the salted two-stage aggregation path.
   *
   * Ties break on the key ascending, so the report is deterministic.
   */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, "topK must be at least 1")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      count(lit(1)).as("__nkeys"), sum(col("n")).as("__total"))
    val skew = col("n").cast("double") * col("__nkeys") / col("__total")
    counts.orderBy(col("n").desc, col(keyCol).asc).limit(topK)
      .crossJoin(broadcast(stats))
      .select(
        col(keyCol),
        col("n"),
        round(col("n").cast("double") / col("__total"), 6).as("share"),
        round(col("__total").cast("double") / col("__nkeys"), 6).as("mean_n"),
        round(skew, 6).as("skew"),
        ceil(skew / 2).as("rec_salt"))
  }

  /**
   * Population Stability Index between two snapshots of a numeric
   * column — the standard drift alarm a corpus-refresh pipeline runs
   * before retraining anything downstream (PSI < 0.1 stable, 0.1–0.25
   * drifting, > 0.25 shifted; credit-scoring folklore, public).
   * Bins are `bins` equal-width intervals over the BASE snapshot's
   * [min, max] (two broadcast scalars), with open-ended edge bins so
   * out-of-range `next` values land in bins 0 / bins−1 instead of
   * vanishing; per-bin shares are floored at `eps` on BOTH sides (the
   * standard guard — an empty bin would make the log term infinite).
   * A DEGENERATE base column (min == max, width 0) takes the limit of
   * the clamping formula — values at/below the constant land in bin 0,
   * values above it in bin bins−1 — rather than dividing by zero (the
   * 0/0 null bin silently dropped every row and read ~0 "stable" even
   * when the next snapshot had drifted off the constant).
   *
   * Scale shape: two scans (one per snapshot) → per-bin decomposable
   * counts (≤ bins rows) → |bins|-row arithmetic. Output: one row per
   * bin (base_share, next_share, psi_term) — `sum(psi_term)` is the
   * index; keeping the per-bin terms is what makes the alarm
   * actionable (WHICH region moved).
   */
  def psi(
      base: DataFrame,
      next: DataFrame,
      valueCol: String,
      bins: Int = 10,
      eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, "psi needs at least 2 bins")
    val stats = base.agg(
      min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    def binned(df: DataFrame): DataFrame = df
      .filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(stats))
      .select(
        // width-0 base (min == max): the limit of the clamping formula
        // — at/below the constant -> bin 0, above -> top bin — instead
        // of a 0/0 null bin that silently drops every row
        when(col("__hi") === col("__lo"),
          when(col(valueCol).cast("double") > col("__lo"), lit(bins - 1))
            .otherwise(lit(0)))
          .otherwise(least(lit(bins - 1), greatest(lit(0),
            floor((col(valueCol).cast("double") - col("__lo")) * bins /
              (col("__hi") - col("__lo"))).cast("int")))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val b = binned(base).withColumnRenamed("n", "bn")
    val nx = binned(next).withColumnRenamed("n", "nn")
    val bTot = b.agg(sum(col("bn")).cast("double").as("__bt"))
    val nTot = nx.agg(sum(col("nn")).cast("double").as("__nt"))
    val allBins = base.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
    allBins
      .join(b, Seq("bin"), "left").join(nx, Seq("bin"), "left")
      .crossJoin(broadcast(bTot)).crossJoin(broadcast(nTot))
      .select(col("bin"),
        greatest(coalesce(col("bn"), lit(0L)).cast("double") / col("__bt"),
          lit(eps)).as("base_share"),
        greatest(coalesce(col("nn"), lit(0L)).cast("double") / col("__nt"),
          lit(eps)).as("next_share"))
      .select(col("bin"),
        round(col("base_share"), 6).as("base_share"),
        round(col("next_share"), 6).as("next_share"),
        round((col("base_share") - col("next_share")) *
          log(col("base_share") / col("next_share")), 6).as("psi_term"))
  }

  /**
   * Jensen–Shannon divergence (nats) between two corpora's token
   * distributions — the mixing diagnostic that quantifies how far two
   * sources/languages/snapshots are lexically (0 = identical,
   * ln 2 ≈ 0.693 = disjoint). Symmetric and bounded, unlike KL, which
   * is what makes it a usable dashboard number. One explode+count per
   * side (vocab-bounded aggregations), a full-outer vocab join, then a
   * one-row sum — the corpus text never shuffles, only (token, count)
   * pairs do.
   */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def dist(df: DataFrame, cname: String): DataFrame = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as(cname))
    val da = dist(a, "ca")
    val db = dist(b, "cb")
    val tot = da.agg(sum(col("ca")).cast("double").as("__ta"))
      .crossJoin(db.agg(sum(col("cb")).cast("double").as("__tb")))
    da.join(db, Seq("token"), "full_outer")
      .crossJoin(broadcast(tot))
      .select(
        (coalesce(col("ca"), lit(0L)).cast("double") / col("__ta")).as("p"),
        (coalesce(col("cb"), lit(0L)).cast("double") / col("__tb")).as("q"))
      .select(col("p"), col("q"), ((col("p") + col("q")) / 2).as("m"))
      .agg(round(
        (sum(when(col("p") > 0, col("p") * log(col("p") / col("m")))
          .otherwise(0.0)) +
          sum(when(col("q") > 0, col("q") * log(col("q") / col("m")))
            .otherwise(0.0))) / 2, 6).as("js_nats"))
  }

  /**
   * χ² drift attribution — the per-token complement of [[psi]]/
   * [[jsDivergence]]'s single-number alarms: WHICH tokens moved. For
   * each token with base count ≥ `minCount` (the standard
   * expected-frequency floor of the χ² test — and the fence that
   * keeps the long tail out of the report), the goodness-of-fit term
   * `(observed − expected)² / expected` with `expected = nextTotal ·
   * baseCount / baseTotal`; the top-k terms ARE the drift
   * explanation ("the crawl started speaking Python").
   *
   * Two token-count aggregations (vocab-bounded) + one token-keyed
   * join + `TakeOrderedAndProject` top-k; expected/term are two
   * deterministic float ops over exact integer counts (round 6).
   * Tokens newly appearing in `next` are outside the fence by
   * construction — [[jsDivergence]] owns the new-mass signal.
   *
   * Output: (token, n_base, n_next, expected, chi2_term), topK rows.
   */
  def chiSquareDrift(
      base: DataFrame,
      next: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 20): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    def counts(df: DataFrame, cname: String): DataFrame = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as(cname))
    // BOTH totals run over the fenced comparison vocabulary, so the
    // expected counts are a proper (conditional) goodness-of-fit
    val joined = counts(base, "n_base")
      .filter(col("n_base") >= minCount)
      .join(counts(next, "n_next"), Seq("token"), "left_outer")
      .select(col("token"), col("n_base"),
        coalesce(col("n_next"), lit(0L)).as("n_next"))
      .localCheckpoint() // feeds the totals AND the terms
    val tot = joined.agg(
      sum(col("n_base")).cast("double").as("__bt"),
      sum(col("n_next")).cast("double").as("__nt"))
    joined
      .crossJoin(broadcast(tot))
      .select(col("token"), col("n_base"), col("n_next"),
        (col("__nt") * col("n_base") / col("__bt")).as("__e"))
      .select(col("token"), col("n_base"), col("n_next"),
        round(col("__e"), 6).as("expected"),
        round((col("n_next") - col("__e")) * (col("n_next") - col("__e"))
          / col("__e"), 6).as("chi2_term"))
      .orderBy(col("chi2_term").desc, col("token").asc)
      .limit(topK)
  }

  /**
   * Cramér's V association between two categoricals (textbook
   * contingency statistics) — "are language and source independent, and
   * how far from it": the normalized χ² that stays in [0, 1] no matter
   * the table size, so "lang×source V = 0.6" and "lang×license V =
   * 0.05" compare directly. The cross-categorical companion of
   * [[chiSquareDrift]] (that one compares two SNAPSHOTS of one
   * column).
   *
   *   V = √( χ² / (n · min(r−1, c−1)) ),
   *   χ² over the DENSIFIED r×c grid (absent cells are observed-0 with
   *   full expected mass — skipping them understates χ²).
   *
   * Scale shape: one (a, b) cell count plus the two margins (all
   * category-bounded, never row-∝), the r×c grid by margin cross
   * join, one 1-row rollup. Counts are exact integers; expected values
   * and χ² terms are double products of exact ratios (round 6 at the
   * report — term-order jitter is ~1e-13 against O(1..n) values).
   *
   * Output: one row (n, r, c, chi2, cramers_v).
   */
  def cramersV(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val rows = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
    val cells = rows.groupBy("__a", "__b").agg(count(lit(1)).as("__o"))
    val ma = rows.groupBy("__a").agg(count(lit(1)).as("__ra"))
    val mb = rows.groupBy("__b").agg(count(lit(1)).as("__cb"))
    val tot = rows.agg(count(lit(1)).as("__n"))
    val grid = ma.crossJoin(mb)
      .join(cells, Seq("__a", "__b"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("__n"),
        (col("__ra").cast("double") * col("__cb") / col("__n")).as("__e"),
        coalesce(col("__o"), lit(0L)).as("__o"))
    val chi2 = grid.agg(
      max(col("__n")).as("n"),
      sum((col("__o") - col("__e")) * (col("__o") - col("__e")) /
        col("__e")).as("__chi2"))
    val dims = ma.agg(count(lit(1)).as("r"))
      .crossJoin(mb.agg(count(lit(1)).as("c")))
    chi2.crossJoin(dims)
      .select(col("n"), col("r"), col("c"),
        round(col("__chi2"), 6).as("chi2"),
        when(least(col("r"), col("c")) <= 1, lit(null).cast("double"))
          .otherwise(round(sqrt(col("__chi2") /
            (col("n") * (least(col("r"), col("c")) - 1))), 6))
          .as("cramers_v"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov statistic — the distribution-drift
   * test that needs NO binning choice (PSI and χ² both inherit their
   * sensitivity from the bin edges; KS is the sup-norm distance between
   * the two empirical CDFs directly):
   *
   *   D = max over observed values x of |F_a(x) − F_b(x)|
   *
   * The classic acceptance gate for "is this snapshot still the same
   * distribution" on ordinal signals (doc lengths, quality scores).
   *
   * Scale shape: each side collapses to (value, count) with one
   * decomposable aggregation, the outer-joined distinct-value frame gets
   * ONE running-sum window, and the report is a 1-row TakeOrdered. The
   * window is deliberately unpartitioned — it runs over the DISTINCT
   * value frame, which for the ordinal columns KS applies to is
   * vocabulary-bounded, never row-∝ (for a truly continuous column,
   * quantize first; the binning then IS the declared resolution).
   *
   * Determinism: cumulative counts are integer-valued, so F_a and F_b
   * are exact IEEE quotients reproduced bit-for-bit by any engine; the
   * argmax tie breaks on the smallest value. `d_stat` rounds to 6 only
   * for display — the max is taken on unrounded quotients.
   *
   * Output: one row (d_stat, at_value, n_a, n_b).
   */
  /**
   * Embedding centroid drift — the drift gauge for the VECTOR side of
   * the corpus (PSI/JS/KS watch scalar columns; a re-embedded or
   * distribution-shifted corpus moves in embedding space first): the
   * cosine between the two snapshots' mean vectors, plus the top-k
   * dimensions by absolute centroid shift (the "which directions
   * moved" attribution).
   *
   * DETERMINISM: per-dimension means run the float→double values
   * through decimal(28,8) sums (exact, order-free); the cross-snapshot
   * cosine folds the two dims-length mean vectors IN DIMENSION ORDER
   * (same HOF shape both engines), so every output value replays.
   *
   * Scale shape: one posexplode + decomposable (dim) aggregation per
   * snapshot (dims-bounded output), a dims-row join, one dims-row
   * fold for the cosine, TakeOrdered top-k. Nothing row-∝ shuffles
   * beyond the two per-dim aggregations.
   *
   * Output: topK rows (dim, mean_base, mean_next, abs_shift,
   * centroid_cosine) — the cosine is global, repeated per row.
   */
  def embeddingCentroidDrift(
      base: DataFrame,
      next: DataFrame,
      embCol: String,
      topK: Int = 8): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val dec = "decimal(28,8)"
    def dimMeans(df: DataFrame, cname: String): DataFrame = df
      .select(posexplode(col(embCol)).as(Seq("__d", "__v")))
      .groupBy("__d")
      .agg((sum(col("__v").cast("double").cast(dec)).cast("double") /
        count(lit(1))).as(cname))
    val joined = dimMeans(base, "mean_base")
      .join(dimMeans(next, "mean_next"), Seq("__d"))
      .localCheckpoint() // feeds the cosine fold AND the top-k
    val vecs = joined
      .select(struct(col("__d"), col("mean_base"), col("mean_next"))
        .as("__s"))
      .agg(sort_array(collect_list(col("__s"))).as("__rows"))
      .select(
        transform(col("__rows"), r => r.getField("mean_base")).as("__a"),
        transform(col("__rows"), r => r.getField("mean_next")).as("__b"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val cosine = vecs.select(
      round(dot(col("__a"), col("__b")) /
        (sqrt(dot(col("__a"), col("__a"))) *
          sqrt(dot(col("__b"), col("__b")))), 6).as("centroid_cosine"))
    joined
      .select(col("__d").as("dim"),
        round(col("mean_base"), 6).as("mean_base"),
        round(col("mean_next"), 6).as("mean_next"),
        round(abs(col("mean_next") - col("mean_base")), 6).as("abs_shift"))
      .orderBy(col("abs_shift").desc, col("dim").asc)
      .limit(topK)
      .crossJoin(broadcast(cosine))
  }

  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, cname: String): DataFrame = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as(cname))
    val joined = side(a, "__ca")
      .join(side(b, "__cb"), Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    // single-partition windows over DISTINCT values (both sides pre-
    // aggregated above) — value-bounded, the exact-KS shape
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val all = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    joined
      .select(col("__v"),
        sum(col("__ca")).over(w).as("__cuma"),
        sum(col("__cb")).over(w).as("__cumb"),
        sum(col("__ca")).over(all).as("__na"),
        sum(col("__cb")).over(all).as("__nb"))
      .select(col("__v"),
        abs(col("__cuma").cast("double") / col("__na") -
          col("__cumb").cast("double") / col("__nb")).as("__d"),
        col("__na"), col("__nb"))
      .orderBy(col("__d").desc, col("__v").asc)
      .limit(1)
      .select(round(col("__d"), 6).as("d_stat"), col("__v").as("at_value"),
        col("__na").as("n_a"), col("__nb").as("n_b"))
  }
}
