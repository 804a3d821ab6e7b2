package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality rule engine (reference:
 * `src/pipelines/breweries_data_quality_gold.py:17-36`;
 * rule configs `configs/breweries_gold_pipeline.yml:60-69`).
 *
 * The reference runs ONE Spark job per rule (`filter(...).count()` in a
 * Python loop). At 100 TB that's N full scans. Here every rule compiles
 * to a conditional-count expression and ALL rules evaluate in a single
 * aggregate over one scan (`sum(case when violated then 1 end)` per rule)
 * — one job, no shuffle beyond the final single-row reduce, fully inside
 * whole-stage codegen. The same compiled columns can also piggy-back on a
 * write via `Dataset.observe`, making the quality pass free.
 */
object Quality {

  /** Rule ADT. `violated` is the Column predicate marking BAD rows. */
  sealed trait Rule {
    def name: String
    def violated: Column
  }

  /** `not_null` (reference `breweries_data_quality_gold.py:28-29`). */
  final case class NotNull(name: String, column: String) extends Rule {
    def violated: Column = col(column).isNull
  }

  /** `greater_than_zero` (reference `:30-31`). */
  final case class GreaterThanZero(name: String, column: String) extends Rule {
    def violated: Column = col(column) <= 0
  }

  /** Extensible SQL-expression rule: `condition` is what must HOLD. The
    * reference silently passes unknown rule types (`:32-33`); we instead
    * let callers express anything Catalyst can parse. Null condition
    * results count as violations (null ≠ satisfied). */
  final case class ExprRule(name: String, condition: String) extends Rule {
    def violated: Column = !coalesce(expr(condition), lit(false))
  }

  /** Single-row wide result: one `<rule>` count column per rule. */
  /**
   * Cohen's kappa (Cohen 1960, public) — chance-corrected agreement
   * between two labelers over the same rows: the QA metric for a
   * quality-classifier change ("the new gate agrees with the old one
   * at κ = 0.8") and for human-vs-model label audits. Raw agreement
   * `po` flatters imbalanced label sets (two always-say-keep gates
   * agree 100% by accident); κ subtracts the agreement `pe` expected
   * from the marginals alone: `κ = (po − pe)/(1 − pe)`.
   *
   * Everything is integer counts until three final divisions: one
   * |labels|²-bounded confusion aggregation, marginals from it, and
   * `pe`'s numerator as a Σ(row-marginal × col-marginal) over the
   * label join — exact in any order, so both engines produce
   * bit-identical doubles (round 6 on publication). Rows where either
   * label is null are excluded (not labeled by both). Degenerate
   * `pe = 1` (both sides constant and equal) yields null κ — the
   * statistic is undefined there, not 1.0.
   *
   * Output: one row (n, n_agree, po, pe, kappa).
   */
  def agreementKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rowM = cells.groupBy("__a").agg(sum("__n").as("__ra"))
    val colM = cells.groupBy("__b").agg(sum("__n").as("__cb"))
    val tot = cells.agg(
      sum(col("__n")).as("n"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
        .as("n_agree"))
    val peNum = rowM
      .join(colM, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ra") * col("__cb")), lit(0L)).as("__pe_num"))
    tot.crossJoin(peNum)
      .select(col("n"), col("n_agree"),
        (col("n_agree").cast("double") / col("n")).as("__po"),
        (col("__pe_num").cast("double") / (col("n") * col("n"))).as("__pe"))
      .select(col("n"), col("n_agree"),
        round(col("__po"), 6).as("po"),
        round(col("__pe"), 6).as("pe"),
        round(when(col("__pe") === 1.0, lit(null).cast("double"))
          .otherwise((col("__po") - col("__pe")) / (lit(1.0) - col("__pe"))), 6)
          .as("kappa"))
  }

  /**
   * Krippendorff's alpha, nominal metric (Krippendorff 2004, public) —
   * the inter-annotator statistic that [[agreementKappa]] cannot be
   * when raters ABSTAIN: κ needs exactly two complete raters; α takes
   * any number of raters with arbitrary missingness (the real shape of
   * LLM-judge / multi-gate labeling, where judges skip out-of-domain
   * rows). Units with fewer than 2 ratings carry no agreement
   * information and drop (the standard convention).
   *
   * Nominal form over per-unit category counts n_uc (m_u = Σ_c n_uc):
   *
   *   α = 1 − (n−1) · Σ_u [(m_u² − Σ_c n_uc²)/(m_u−1)] / (n² − Σ_c n_c²)
   *
   * DETERMINISM: every per-unit term is scaled by
   * `L = lcm(1…maxRaters−1)` (bounded by the caller's rater-column
   * list), making the observed-disagreement sum EXACT INTEGERS — no
   * float accumulation anywhere; α is one final division (round 6).
   * Perfect agreement on every multi-rated unit → α = 1; an expected
   * disagreement of 0 (all ratings one category) → α undefined → null.
   *
   * Scale shape: one melt (units × raters, narrow), one (unit,
   * category) count, one unit-keyed rollup, category totals — all
   * decomposable; the report is 1 row.
   *
   * Output: (n_ratings, n_units, d_o_scaled, d_e, alpha) — d_o_scaled
   * is the integer L-scaled observed-disagreement numerator, d_e the
   * integer expected numerator (n² − Σ n_c²).
   */
  def krippendorffAlpha(
      df: DataFrame,
      unitCol: String,
      raterCols: Seq[String]): DataFrame = {
    require(raterCols.size >= 2, "alpha needs at least two rater columns")
    val lcm = (2 until raterCols.size).foldLeft(1L) { (acc, i) =>
      val g = BigInt(acc).gcd(BigInt(i)).toLong
      acc / g * i
    }
    // L = lcm(1 .. maxRaters−1): every (m_u − 1) divides it exactly
    val melted = df
      .select(col(unitCol).as("__u"), explode(array(raterCols.map(c =>
        col(c).cast("string")): _*)).as("__cat"))
      .filter(col("__cat").isNotNull)
    val unitCat = melted.groupBy("__u", "__cat")
      .agg(count(lit(1)).as("__nuc"))
    val units = unitCat.groupBy("__u")
      .agg(sum(col("__nuc")).as("__mu"),
        sum(col("__nuc") * col("__nuc")).as("__sq"))
      .filter(col("__mu") >= 2)
    val dO = units.agg(
      coalesce(sum((col("__mu") * col("__mu") - col("__sq")) *
        (lit(lcm) / (col("__mu") - 1)).cast("long")), lit(0L))
        .as("d_o_scaled"),
      coalesce(sum(col("__mu")), lit(0L)).as("n_ratings"),
      count(lit(1)).as("n_units"))
    // category totals over the SCORED units only
    val catTot = unitCat
      .join(units.select("__u"), Seq("__u"), "left_semi")
      .groupBy("__cat").agg(sum("__nuc").as("__nc"))
      .agg(coalesce(sum(col("__nc") * col("__nc")), lit(0L)).as("__sqc"))
    dO.crossJoin(catTot)
      .select(col("n_ratings"), col("n_units"), col("d_o_scaled"),
        (col("n_ratings") * col("n_ratings") - col("__sqc")).as("d_e"))
      .select(col("n_ratings"), col("n_units"), col("d_o_scaled"),
        col("d_e"),
        round(when(col("d_e") === 0, lit(null).cast("double"))
          .otherwise(lit(1.0) -
            (col("n_ratings") - 1).cast("double") * col("d_o_scaled") /
            (lit(lcm) * col("d_e"))), 6).as("alpha"))
  }

  /**
   * Empirical-Bayes shrunk per-source quality rates (beta-binomial /
   * James–Stein shrinkage, public textbook statistics): a source with
   * 3/3 good docs must NOT outrank one with 970/1000 — small samples
   * shrink toward the corpus-wide rate `μ` with prior strength `k`
   * pseudo-observations: `shrunk = (k·μ + good) / (k + n)`. The
   * source-level curation ranking (crawl seed weighting, domain caps,
   * mixture weights) that raw rates get WRONG for exactly the sources
   * a crawl has barely sampled.
   *
   * One decomposable per-source aggregation + a 1-row global rate
   * cross-broadcast into |sources|-row arithmetic. Counts are exact
   * integers; `μ` and the shrunk rate are single-division doubles
   * (round 6) — bit-replayable.
   *
   * Output: (sourceCol, n_docs, n_good, raw_rate, shrunk_rate).
   */
  def shrunkSourceQuality(
      df: DataFrame,
      sourceCol: String,
      goodFlag: Column,
      priorStrength: Double = 20.0): DataFrame = {
    require(priorStrength > 0, "priorStrength must be positive")
    val perSource = df
      .filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(goodFlag, 1L).otherwise(0L)).as("n_good"))
    val global = perSource.agg(
      (sum(col("n_good")).cast("double") / sum(col("n_docs")))
        .as("__mu"))
    perSource.crossJoin(broadcast(global))
      .select(col(sourceCol), col("n_docs"), col("n_good"),
        round(col("n_good").cast("double") / col("n_docs"), 6).as("raw_rate"),
        round((lit(priorStrength) * col("__mu") + col("n_good")) /
          (lit(priorStrength) + col("n_docs")), 6).as("shrunk_rate"))
  }

  /**
   * Per-group quantile normalization of a score column — map each
   * row's score to its within-group rank position `rank/(n+1)` (the
   * Hazen-style plotting position; textbook quantile normalization):
   * the cross-source comparability fix for quality scores, whose raw
   * scales drift per source (a 0.6 from a clean source ≠ a 0.6 from a
   * boilerplate farm). After the transform, "top 10% of each source"
   * is the SAME predicate everywhere — the usual selection rule
   * quota-based curation actually wants.
   *
   * One PER-GROUP rank window (the [[graft.ops.Stats.trimmedStats]]
   * shape, never a global sort); ties rank deterministically by the id
   * column, and the normalized score is one exact integer ratio
   * (round 6).
   *
   * Output: input id/group plus (raw value, `q_norm`).
   */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val n = Window.partitionBy(col(groupCol))
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valueCol))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .select(col(idCol), col(groupCol), col(valueCol),
        round(col("__rk").cast("double") / (col("__n") + 1), 6).as("q_norm"))
  }

  def violationCounts(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = rules.map(r =>
      sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Tall report `{rule, invalid_count, passed}` — the reference's JSON
    * report shape (`breweries_data_quality_gold.py:36`), still one pass:
    * the wide single-row aggregate is exploded driver-free. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val wide = violationCounts(df, rules)
    val entries = rules.map(r =>
      struct(lit(r.name).as("rule"), col(r.name).as("invalid_count")))
    wide
      .select(explode(array(entries: _*)).as("e"))
      .select(
        col("e.rule").as("rule"),
        col("e.invalid_count").as("invalid_count"),
        (col("e.invalid_count") === 0L).as("passed"))
  }

  /** The observe()-variant: attach rule metrics to a DataFrame so a
    * subsequent write computes them as a side effect (zero extra scans).
    * Read them back from the `QueryExecutionListener` / `observedMetrics`. */
  def observed(df: DataFrame, observationName: String, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
    df.observe(observationName, aggs.head, aggs.tail: _*)
  }

  /** Same, bound to an [[org.apache.spark.sql.Observation]] handle —
    * `obs.get` blocks until the first action on the returned frame
    * completes and then yields the per-rule violation counts. */
  def observed(df: DataFrame, obs: org.apache.spark.sql.Observation, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
    df.observe(obs, aggs.head, aggs.tail: _*)
  }
}
