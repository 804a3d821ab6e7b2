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
 * Semantics, per key: the change with the greatest `tsCol` wins; a
 * winning `D` removes the key, a winning `I`/`U` replaces (or inserts)
 * the row with the change's attributes. Keys the batch never mentions
 * pass through untouched. Deleting an absent key and re-inserting a
 * deleted key are both naturally legal.
 *
 * Tie-break: the caller contract is (key, ts) unique within a batch,
 * but a violated contract (replayed log segment, upstream clock
 * collision) must NOT corrupt key multiplicity — so ties on the max
 * ts resolve DETERMINISTICALLY instead of emitting both rows: op
 * priority `D` > `U` > `I` first (at the same instant the delete is
 * the terminal fact), then a 64-bit hash of (op, attrs) as a total
 * order over payloads, then exact-duplicate rows collapse to one.
 * Every input therefore yields exactly one surviving row per key,
 * replayable bit-for-bit.
 *
 * Scale shape (batch-∝, the q122 discipline): the winner per key is a
 * decomposable `max(struct(ts, priority, payload-hash))` over
 * NON-NULL primitives joined back on that exact tuple — no window, no
 * sort. (NOT `max_by(struct(...), ts)`: Spark's codegen'd max_by NPEs
 * on struct payloads with null string fields — exactly what a delete
 * row carries; the hash-only struct sidesteps that while ALSO packing
 * the tie-break into the same aggregate.) The state is pruned by an
 * anti-join on the changed-key set, broadcast only below
 * `maxBroadcastKeys` (the key count falls out of the winner frame,
 * which is counted once when it is materialized): a daily delta prunes
 * map-side with the table never reshuffled, while a backfill-sized
 * change log degrades to a shuffle join instead of a driver OOM.
 * Cost ∝ |changes| + O(state scan).
 */
object Cdc {

  def applyCdc(
      state: DataFrame,
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      opCol: String,
      attrCols: Seq[String],
      maxBroadcastKeys: Long = Scd.DefaultMaxBroadcastKeys): DataFrame = {
    require(attrCols.nonEmpty, "CDC apply needs at least one attribute column")
    val outCols = (keyCol +: attrCols).map(col)
    val pri = when(col(opCol) === "D", 2)
      .when(col(opCol) === "U", 1).otherwise(0)
    // Nullability contract: `changes`' attr columns must DECLARE
    // nullable when delete rows carry nulls. An enforced-schema scan
    // that promises non-null over null data makes every codegen
    // consumer (the hash below, the dedupe sort, any join) skip its
    // null check and NPE — and no in-plan defense can help, because
    // the analyzer constant-folds null checks away on declared-
    // non-null columns. Fix it at the read (see
    // CorpusIngest.maintainServing's relaxed readSchema).
    val keyed = changes
      .withColumn("__pri", pri)
      .withColumn("__tb", xxhash64(struct((opCol +: attrCols).map(col): _*)))
    // one decomposable aggregate picks (max ts, then op priority, then
    // payload hash) — all three struct fields non-null primitives, so
    // struct max is codegen-safe
    val winner = keyed.groupBy(col(keyCol))
      .agg(max(struct(col(tsCol), col("__pri"), col("__tb"))).as("__w"))
      .select(col(keyCol), col(s"__w.$tsCol").as(tsCol),
        col("__w.__pri").as("__pri"), col("__w.__tb").as("__tb"))
      .localCheckpoint()
    val nKeys = winner.count()
    val latest = keyed.join(winner, Seq(keyCol, tsCol, "__pri", "__tb"))
      // surviving duplicates are bit-identical replayed rows (equal
      // key, ts, op priority AND payload hash) — collapse to one
      .dropDuplicates(Seq(keyCol))
      .select((Seq(keyCol, opCol) ++ attrCols).map(col): _*)
    val changedKeys = winner.select(keyCol)
    val prune =
      if (nKeys <= maxBroadcastKeys) broadcast(changedKeys) else changedKeys
    val untouched = state.join(prune, Seq(keyCol), "left_anti")
    val applied = latest.filter(col(opCol) =!= "D").select(outCols: _*)
    untouched.select(outCols: _*).unionByName(applied)
  }
}
