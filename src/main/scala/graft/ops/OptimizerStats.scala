package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * ANALYZE-style optimizer statistics — the cost-model inputs every
 * cost-based planner (Spark CBO, the System R lineage) derives its
 * join orders and strategy choices from: equi-height histograms for
 * range-predicate selectivity, and distinct-count statistics for
 * equi-join output cardinality. Implemented as first-class operators
 * so a pipeline can MEASURE how good those estimates are on its own
 * data — the estimate-vs-actual error report is what tells an operator
 * whether the planner's numbers can be trusted before a 100 TB join
 * order is locked in.
 *
 * Scale shape: the histogram build aggregates to one row per DISTINCT
 * value first (map-side partials), then ranks the value frame with ONE
 * window — so the single-partition sort is ndv-∝, never table-∝; and
 * stats collection at warehouse scale runs over a SAMPLE by design
 * (stats are advisory; Spark's own ANALYZE samples too). Everything
 * downstream of the build is bins-/predicates-bounded. The join estimator needs
 * only per-side 1-row aggregates plus a per-key count join — the
 * actual cardinality is computed WITHOUT materializing the join
 * (Σ_k cnt_a(k)·cnt_b(k) over the key frame).
 */
object OptimizerStats {

  /**
   * Exact equi-height histogram: rank the non-null values ascending and
   * cut the rank space into `bins` equal-count slices —
   * `bin = floor((rank−1)·bins / n)`, pure integer arithmetic. Bin
   * boundaries are order statistics, so the per-bin (lo, hi, count,
   * ndv) are deterministic even under value ties: the multiset of
   * values falling in a rank range does not depend on tie order.
   *
   * Equi-height (not equi-width) is what planners actually store:
   * every bin carries the same row mass, so a range predicate's
   * selectivity error is bounded by one bin fraction regardless of how
   * skewed the value distribution is.
   *
   * Output: (bin, lo, hi, n_rows, ndv), `bins` rows (fewer when
   * n < bins).
   */
  def equiHeightHistogram(
      df: DataFrame,
      valueCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // r21: rank arithmetic over per-VALUE counts, not per-row ranks.
    // The previous form shuffled EVERY row to one partition for a
    // global row_number — a corpus-∝ single-task window. Aggregating
    // to one row per distinct value first (map-side partials) makes
    // the single-partition window value-bounded (the ksStatistic
    // shape). Bin content is IDENTICAL: bin(r) = ⌊(r−1)·bins/n⌋
    // depends only on the rank RANGE a value's ties occupy (the
    // tie-invariance already documented above), so each value's rows
    // land in bins ⌊start·bins/n⌋‥⌊(end−1)·bins/n⌋ with the per-bin
    // row count a pure interval intersection — and the per-bin
    // (lo, hi, n_rows, ndv) aggregate the same multiset. Integer DIV
    // equals the old floor-of-double-division for any realistic n
    // (both sides exact below 2⁵³).
    val counts = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = counts.select(col("__v"), col("__c"),
      // __s = (1-based rank of this value's first row) − 1
      (sum(col("__c")).over(w) - col("__c")).as("__s"),
      sum(col("__c")).over(all).as("__n"))
    // bins the value's rank interval [__s+1, __s+__c] intersects; bin
    // b covers ranks r with r−1 ∈ [⌈b·n/bins⌉, ⌈(b+1)·n/bins⌉ − 1]
    val binLo = expr(s"(bin * __n + ${bins - 1}) DIV $bins")
    val binHi = expr(s"((bin + 1) * __n + ${bins - 1}) DIV $bins - 1")
    ranked
      .select(col("__v"), col("__c"), col("__s"), col("__n"),
        explode(sequence(
          expr(s"(__s * $bins) DIV __n"),
          expr(s"((__s + __c - 1) * $bins) DIV __n"))).as("bin"))
      .select(col("bin"), col("__v"),
        (least(col("__s") + col("__c") - 1, binHi) -
          greatest(col("__s"), binLo) + 1).as("__nb"))
      .groupBy("bin")
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
        sum(col("__nb")).as("n_rows"), count(lit(1)).as("ndv"))
  }

  /**
   * Range-selectivity estimate-vs-actual report — for each half-open
   * predicate `lo <= v < hi`, the histogram estimate under the
   * textbook uniform-within-bin assumption:
   *
   *   est = Σ_bins n_b · clamp01((min(hi_b, hi) − max(lo_b, lo)) / (hi_b − lo_b))
   *
   * (a single-value bin — hi_b = lo_b — contributes all-or-nothing),
   * joined against the TRUE count from one conditional-aggregation
   * scan that serves every predicate at once. `rel_error` is computed
   * from the ROUNDED estimate so the report itself is engine-exact.
   *
   * The predicate list is caller-bounded (it is the planner's
   * workload model, dozens at most), so the bins × predicates cross
   * join and the |preds|-row output never scale with the table.
   *
   * Output: (pred_lo, pred_hi, est_rows, actual_rows, rel_error),
   * one row per predicate.
   */
  def rangeSelectivityReport(
      df: DataFrame,
      valueCol: String,
      bins: Int,
      predicates: Seq[(Double, Double)]): DataFrame = {
    require(predicates.nonEmpty, "need at least one predicate")
    require(predicates.forall { case (l, h) => l < h },
      "each predicate needs lo < hi")
    val spark = df.sparkSession
    val hist = equiHeightHistogram(df, valueCol, bins)
    val preds = spark.createDataFrame(predicates).toDF("pred_lo", "pred_hi")
    // overlap fraction of a bin with [pred_lo, pred_hi), clamped
    val overlap = when(col("hi") === col("lo"),
        when(col("pred_lo") <= col("lo") && col("lo") < col("pred_hi"),
          lit(1.0)).otherwise(lit(0.0)))
      .otherwise(greatest(lit(0.0), least(
        (least(col("hi"), col("pred_hi")) -
          greatest(col("lo"), col("pred_lo"))) / (col("hi") - col("lo")),
        lit(1.0))))
    val est = hist.crossJoin(broadcast(preds))
      .groupBy("pred_lo", "pred_hi")
      .agg(round(sum(col("n_rows") * overlap), 4).as("est_rows"))
    // one scan answers every predicate's true count
    val v = col(valueCol).cast("double")
    val actualAggs = predicates.zipWithIndex.map { case ((l, h), i) =>
      sum(when(v >= l && v < h, 1L).otherwise(0L)).as(s"__a_$i")
    }
    val one = df.agg(actualAggs.head, actualAggs.tail: _*).localCheckpoint()
    val actual = predicates.zipWithIndex.map { case ((l, h), i) =>
      one.select(lit(l).as("pred_lo"), lit(h).as("pred_hi"),
        col(s"__a_$i").as("actual_rows"))
    }.reduce(_.unionByName(_))
    est.join(actual, Seq("pred_lo", "pred_hi"))
      .select(col("pred_lo"), col("pred_hi"), col("est_rows"),
        col("actual_rows"),
        // a zero-truth predicate has no RELATIVE error — NULL, not ∞
        when(col("actual_rows") === 0, lit(null).cast("double"))
          .otherwise(round((col("est_rows") - col("actual_rows")) /
            col("actual_rows"), 6)).as("rel_error"))
  }

  /**
   * Equi-join output-cardinality estimate vs actual — the System R
   * formula every cost-based optimizer starts from:
   *
   *   |A ⋈ B|  ≈  |A|·|B| / max(ndv_A(k), ndv_B(k))
   *
   * (containment-of-value-sets assumption). The TRUE cardinality is
   * Σ_k cnt_A(k)·cnt_B(k), computed by joining the two per-key COUNT
   * frames — key-cardinality-sized, never row-sized: the join itself
   * is never materialized. `ratio` (actual / estimate, rounded 6) is
   * the q-error direction planners care about — how far off the
   * uniform-frequency assumption is on THIS key.
   *
   * Output: one row (label, n_a, n_b, ndv_a, ndv_b, est_rows,
   * actual_rows, ratio).
   */
  def joinCardinalityEstimate(
      a: DataFrame,
      aKey: String,
      b: DataFrame,
      bKey: String,
      label: String): DataFrame = {
    val ca = a.filter(col(aKey).isNotNull)
      .groupBy(col(aKey).as("__k")).agg(count(lit(1)).as("__na"))
    val cb = b.filter(col(bKey).isNotNull)
      .groupBy(col(bKey).as("__k")).agg(count(lit(1)).as("__nb"))
    val actual = ca.join(cb, Seq("__k"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L))
        .as("actual_rows"))
    val stats = ca.agg(sum(col("__na")).as("n_a"),
        count(lit(1)).as("ndv_a"))
      .crossJoin(cb.agg(sum(col("__nb")).as("n_b"),
        count(lit(1)).as("ndv_b")))
    stats.crossJoin(actual)
      .select(lit(label).as("label"), col("n_a"), col("n_b"),
        col("ndv_a"), col("ndv_b"),
        round(col("n_a").cast("double") * col("n_b") /
          greatest(col("ndv_a"), col("ndv_b")), 4).as("est_rows"),
        col("actual_rows"))
      .withColumn("ratio",
        round(col("actual_rows") / col("est_rows"), 6))
  }

}
