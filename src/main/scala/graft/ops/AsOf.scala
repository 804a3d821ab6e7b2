package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — for every left row, attach the LATEST
 * right row with `right.ts <= left.ts` per key (the training-data
 * staple: join facts to the dimension state that was true at event
 * time, without leaking the future).
 *
 * Spark has no native as-of join; per the extension preference order
 * this is COMPOSED from built-ins rather than a custom physical
 * operator: tag both sides, union them, and run ONE
 * `last(_, ignoreNulls)` window per key ordered by (ts, tag) with
 * right-before-left on ties (so `right.ts == left.ts` matches, the
 * `>=` convention). Cost: a single hash exchange on the key + one
 * per-partition sort — same shuffle bill as a plain join, with none of
 * the range-join blowup a `left.ts >= right.ts` theta-join would cause
 * (Spark would plan that as a broadcast-nested-loop). At 100 TB the
 * exchange is the scan-dominated term; state per key is one row (the
 * running last), not a buffered range.
 *
 * The right payload travels as ONE struct so all its columns come from
 * the SAME matched row even when some payload values are null. Rows
 * with no prior right row get nulls (left-join semantics). Caller
 * contract: `right` is unique per (keys, tsCol) — pre-dedup otherwise.
 */
object AsOf {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"right payload columns ${rightCols.intersect(leftCols)} collide with left columns")

    val payload = struct(rightCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val taggedLeft = left
      .withColumn("__tag", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val taggedRight = {
      val base = right.select((keys :+ tsCol).map(col) :+ payload.as("__payload"): _*)
      leftCols.filterNot(c => keys.contains(c) || c == tsCol)
        .foldLeft(base.withColumn("__tag", lit(0))) { (d, c) =>
          d.withColumn(c, lit(null).cast(left.schema(c).dataType))
        }
    }
    val cols: Seq[Column] = (leftCols :+ "__tag" :+ "__payload").map(col)
    val unioned = taggedLeft.select(cols: _*)
      .unionByName(taggedRight.select(cols: _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    rightCols.foldLeft(filled) { (d, c) =>
      d.withColumn(c, col(s"__match.$c"))
    }.drop("__tag", "__payload", "__match")
  }
}
