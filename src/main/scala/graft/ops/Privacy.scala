package graft.ops

import org.apache.spark.sql.DataFrame
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
}
