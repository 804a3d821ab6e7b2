package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Dataset-release privacy audits — the aggregate-side complement to
 * the span-level scrub ([[graft.functions.PiiKernels]]): redaction
 * removes direct identifiers, but a release can still re-identify
 * people through QUASI-identifier combinations (the Sweeney result:
 * zip+birthdate+sex identifies most of a population — public
 * literature: k-anonymity, Samarati/Sweeney 1998; l-diversity,
 * Machanavajjhala 2007).
 *
 *  - k-anonymity: every quasi-identifier combination must cover ≥ k
 *    rows; smaller groups are re-identifiable.
 *  - l-diversity: within a combination, the SENSITIVE attribute must
 *    take ≥ l distinct values — a 50-row group is still leaky when
 *    all 50 share one diagnosis.
 *
 * Scale shape: ONE groupBy over the quasi columns (decomposable count
 * + count-distinct), then a one-row rollup — the table never shuffles
 * anything but (combo, counts) pairs. The per-group frame
 * ([[anonymityGroups]]) is what a suppression/generalization pass
 * consumes; the one-row report ([[anonymityReport]]) is the release
 * gate.
 */
object Privacy {

  /** Per-combination audit frame: (quasi cols…, n, n_sensitive). */
  def anonymityGroups(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
  }

  /** One-row release gate: group counts, k-anonymity violations (and
    * the rows they expose), worst-case group size, l-diversity
    * violations among the k-anonymous groups (a group failing k is
    * already suppressed; double-counting it as an l failure would
    * overstate the repair work). */
  def anonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Int,
      l: Int): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    require(l >= 2, s"l must be at least 2, got $l")
    anonymityGroups(df, quasiCols, sensitiveCol)
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("n") < k, col("n"))).as("n_rows_at_risk"),
        min(col("n")).as("min_group"),
        sum(when(col("n") >= k && col("n_sensitive") < l, 1L).otherwise(0L))
          .as("n_low_diversity"))
      .select(col("n_groups"), col("n_small_groups"),
        coalesce(col("n_rows_at_risk"), lit(0L)).as("n_rows_at_risk"),
        col("min_group"), col("n_low_diversity"))
  }

  /**
   * t-closeness audit (Li, Li & Venkatasubramanian 2007, public) —
   * the distributional gate k-anonymity and l-diversity both miss: a
   * large, diverse group whose sensitive values SKEW far from the
   * global distribution still leaks ("this zip code is mostly
   * high-balance"). Distance is the Earth Mover's Distance for an
   * ORDERED sensitive attribute with m distinct values under the
   * standard equal-spacing ground metric:
   * `EMD = (1/(m−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|`
   * (p = group distribution, q = global).
   *
   * DETERMINISM: the whole computation is integer until one final
   * division. Over the common denominator `n_g · N`, each difference
   * `p_j − q_j` has integer numerator `cnt_gj·N − gcnt_j·n_g`; the
   * ordered cumulative sums, absolute values, and their total stay
   * exact integers (order-free), so
   * `emd = round(Σ|cum| / (n_g·N·(m−1)), 6)` is the same double in
   * any engine under any partitioning. m = 1 (constant attribute)
   * yields EMD 0 by convention.
   *
   * Scale shape: two decomposable aggregations (per-cell, per-group),
   * one values-bounded global frame (m rows — a rank window over the
   * distinct values is single-partition by construction and
   * values-bounded by contract), a |groups|×m broadcast-densified
   * grid (the EMD definition's own size — every group must price
   * VALUES IT LACKS), and one group-keyed window over that grid.
   * Nothing row-∝ ever shuffles.
   *
   * @return one row per group: (quasi cols…, n, emd)
   */
  def tClosenessGroups(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val qc = quasiCols.map(col)
    val rows = df.filter(col(sensitiveCol).isNotNull)
    // global value distribution + rank over the ordered values; meta
    // carries N and m (both one-row, broadcast)
    val gv = rows.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__gcnt"))
    // single-partition window over DISTINCT sensitive values — the
    // t-closeness domain, value-bounded (never the row count)
    val gvr = gv.select(col("__v"), col("__gcnt"),
      row_number().over(Window.orderBy(col("__v"))).as("__r"))
    val meta = gv.agg(sum("__gcnt").as("__N"), count(lit(1)).as("__m"))
    val groups = rows.groupBy(qc: _*).agg(count(lit(1)).as("__ng"))
    val cells = rows.groupBy(qc :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val grid = groups
      .crossJoin(broadcast(gvr))
      .crossJoin(broadcast(meta))
      .join(cells, quasiCols :+ "__v", "left_outer")
      .select((qc :+ col("__ng") :+ col("__r") :+ col("__N") :+ col("__m") :+
        (coalesce(col("__cnt"), lit(0L)) * col("__N") -
          col("__gcnt") * col("__ng")).as("__numer")): _*)
    val cum = grid.withColumn("__cum",
      sum(col("__numer")).over(Window
        .partitionBy(qc: _*).orderBy(col("__r"))))
    cum.groupBy((qc :+ col("__ng") :+ col("__N") :+ col("__m")): _*)
      .agg(sum(abs(col("__cum"))).as("__tnum"))
      .select((qc :+ col("__ng").as("n") :+
        when(col("__m") <= 1, lit(0.0))
          .otherwise(round(col("__tnum") /
            (col("__ng") * col("__N") * (col("__m") - 1)), 6))
          .as("emd")): _*)
  }

  /** One-row t-closeness release gate over the k-anonymous groups (a
    * group failing k is already suppressed — the q171 discipline):
    * violation = `n ≥ k AND emd > t`. `sum_emd_micro` totals the
    * 6-decimal EMDs as exact integers, so the report is order-free. */
  def tClosenessReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Int,
      t: Double): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    require(t > 0.0 && t < 1.0, s"t must be in (0, 1), got $t")
    tClosenessGroups(df, quasiCols, sensitiveCol)
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") >= k && col("emd") > t, 1L).otherwise(0L))
          .as("n_tclose_violations"),
        max(when(col("n") >= k, col("emd"))).as("max_emd_anonymous"),
        sum(round(col("emd") * 1e6).cast("long")).as("sum_emd_micro"))
  }

  /**
   * Differentially-private release counts — the aggregate-release
   * mechanism the audits above gate: per-group counts with Laplace
   * noise at sensitivity 1 (one row in/out moves any count by ≤ 1),
   * the ε-DP Laplace mechanism of Dwork et al. 2006 (public). The
   * k-anonymity/t-closeness family asks "is this grouping safe to
   * release raw"; this releases a grouping that ISN'T, with calibrated
   * noise instead of suppression.
   *
   * The noise is SEEDED, not sampled: the Laplace draw comes from the
   * inverse CDF
   * `noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|)`
   * applied to the salted md5 unit hash of the group key (the
   * [[Sampling.unitPos]] mechanism the split fences already use). That
   * makes releases REPRODUCIBLE — the same (salt, group) always gets
   * the same draw, so re-running the pipeline cannot leak fresh
   * independent noise about the same count (noise reuse across
   * re-releases of the same statistic is the standard practitioner
   * guidance), and the oracle can replay the draw bit-for-bit. A NEW
   * release epoch (new privacy budget) is a new salt by contract. The
   * unit hash has 2⁻⁶⁰ granularity, so |noise| ≤ ~41.6/ε — finite by
   * construction, no clipping branch needed.
   *
   * Scale shape: one decomposable groupBy count; the noise is a scalar
   * expression over the |groups|-row frame. Nothing row-∝ shuffles.
   *
   * Output: (groupCol, n_noisy) — the TRUE count deliberately does not
   * ride along (it is the secret); round 6.
   */
  def dpNoisyCounts(
      df: DataFrame,
      groupCol: String,
      epsilon: Double,
      salt: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(salt.nonEmpty, "salt (release epoch) must be non-empty")
    val u = Sampling.unitPos(col(groupCol), salt)
    val centered = u - 0.5
    val noise = lit(-1.0 / epsilon) *
      signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n") + noise, 6).as("n_noisy"))
  }
}
