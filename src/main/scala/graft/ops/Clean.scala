package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Silver-layer cleaning operators (reference:
 * `src/pipelines/breweries_transform_silver_notebook.py:70-83`):
 * keyed dedup (D1), required-column null drop (F1), `trim∘lower`
 * string normalization (P2).
 *
 * Scale notes (100 TB design point):
 *  - [[dedupArbitrary]] / [[dedupLatest]] shuffle once on the dedup keys;
 *    Spark plans `dropDuplicates` as partial+final aggregate, so map-side
 *    combining shrinks the exchange when duplicates are common. The
 *    window-based [[dedupLatest]] also needs exactly one hash exchange on
 *    the keys (no sort-merge of the whole table; per-partition sort only).
 *  - normalization and null-drop are narrow (no shuffle) and stay inside
 *    whole-stage codegen; `AtLeastNNonNulls` pushes null filters to the
 *    Parquet scan.
 *  - keep-latest beats keep-arbitrary at scale anyway: re-runs are
 *    idempotent, so backfills don't flap output partitions.
 */
object Clean {

  /** P2 — canonicalize string columns with `trim(lower(c))`. */
  def normalize(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, trim(lower(col(c)))))

  /** F1 — drop rows with nulls in any required column
    * (≡ `df.na.drop(keys)`). */
  def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.na.drop(keys)

  /** D1 parity — keep an arbitrary row per key (reference semantics;
    * nondeterministic, so never used for oracle-checked queries). */
  def dedupArbitrary(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /**
   * D1 deterministic — keep the first row per key under `order`
   * (e.g. latest `updated_at`, tiebroken by a unique column).
   * Callers must make `order` a total order for determinism.
   */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full silver clean: dedup (deterministic) → null-drop → normalize. */
  def silverClean(
      df: DataFrame,
      keys: Seq[String],
      requiredCols: Seq[String],
      normalizeCols: Seq[String],
      order: Seq[Column]): DataFrame =
    normalize(dropNullKeys(dedupLatest(df, keys, order), requiredCols), normalizeCols)
}
