package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: match left rows carrying a point timestamp to
 * right rows carrying `[start, end)` intervals on the same key.
 *
 * A naive `left.ts >= start AND left.ts < end` predicate join is a
 * theta join — Spark plans it as a broadcast-nested-loop (quadratic
 * work, and an OOM broadcast once neither side is small). This operator
 * uses the standard bin-the-range decomposition instead: every interval
 * is exploded into the fixed-width time buckets it overlaps (a bounded
 * expansion of `⌈duration/bucket⌉+1` rows), points map to exactly one
 * bucket, and the match becomes an EQUI-join on (key, bucket) followed
 * by the exact range filter. The shuffle is hash-partitioned like any
 * ordinary join; pick `bucketWidth` near the typical interval length so
 * the expansion stays small while buckets stay selective.
 */
object Ranges {

  private def bucketOf(ts: Column, widthSeconds: Long): Column =
    floor(ts.cast("double") / widthSeconds).cast("long")

  /**
   * Inner range join. `left` has point column `tsCol`; `right` has
   * `startCol`/`endCol` (end exclusive). Both sides keep all their
   * columns; name collisions other than `keys` are the caller's to
   * resolve beforehand.
   */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketWidthSeconds: Long): DataFrame = {
    require(bucketWidthSeconds > 0)
    val l = left.withColumn("__bucket", bucketOf(col(tsCol), bucketWidthSeconds))
    val r = right
      // [start, end) with end <= start is empty — drop such rows BEFORE
      // bucketing: `sequence(b0, b1)` with b1 < b0 generates a DESCENDING
      // sequence (implicit step −1), so one malformed row with end far
      // before start would otherwise explode into a huge bucket array.
      .filter(col(endCol) > col(startCol))
      .withColumn("__b0", bucketOf(col(startCol), bucketWidthSeconds))
      // end is exclusive: an interval touching a bucket boundary exactly
      // does not reach into the next bucket
      .withColumn("__b1", bucketOf(col(endCol) - expr("INTERVAL 1 MICROSECOND"),
        bucketWidthSeconds))
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")
    l.join(r, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
