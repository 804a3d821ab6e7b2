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
}
