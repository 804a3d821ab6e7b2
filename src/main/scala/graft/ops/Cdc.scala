package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC (change-data-capture) apply — materialize a change log
 * (insert/update/delete ops with effective timestamps) onto a current-
 * state table. The flat-state sibling of [[Scd.mergeScd2]]: SCD2 keeps
 * every version for as-of replay; CDC apply keeps ONLY the latest
 * surviving row per key — the shape consumed by serving tables and by
 * downstream batch reads that do not need history.
 *
 * Semantics, per key: the change with the greatest `tsCol` wins
 * outright (caller contract: (key, ts) unique within a batch — ties
 * would make the winner nondeterministic, so the spec pins the
 * contract); a winning `D` removes the key, a winning `I`/`U` replaces
 * (or inserts) the row with the change's attributes. Keys the batch
 * never mentions pass through untouched. Deleting an absent key and
 * re-inserting a deleted key are both naturally legal.
 *
 * Scale shape (batch-∝, the q122 discipline): the winner per key is a
 * decomposable `max(ts)` aggregate joined back on (key, ts) — both
 * sides share one key partitioning, no window, no sort. (NOT
 * `max_by(struct(...), ts)`: Spark's codegen'd max_by NPEs on struct
 * payloads with null string fields — exactly what a delete row
 * carries.) The state is pruned by a BROADCAST anti-join on the
 * (small) changed-key set, so the table itself is never reshuffled.
 * Cost ∝ |changes| + O(state scan).
 */
object Cdc {

  def applyCdc(
      state: DataFrame,
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      opCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "CDC apply needs at least one attribute column")
    val outCols = (keyCol +: attrCols).map(col)
    val winnerTs = changes.groupBy(col(keyCol))
      .agg(max(col(tsCol)).as(tsCol))
    val latest = changes.join(winnerTs, Seq(keyCol, tsCol))
      .select((Seq(keyCol, opCol) ++ attrCols).map(col): _*)
    val untouched = state
      .join(broadcast(latest.select(keyCol)), Seq(keyCol), "left_anti")
    val applied = latest.filter(col(opCol) =!= "D").select(outCols: _*)
    untouched.select(outCols: _*).unionByName(applied)
  }
}
