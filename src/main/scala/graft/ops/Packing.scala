package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Token-budget operators for training-data assembly (north-star
 * extension): the two standard moves between "cleaned corpus" and
 * "training batches" —
 *
 *  - [[packSequences]]: GPT-style concat-and-chunk packing. Documents
 *    are concatenated in a deterministic order within each shard and
 *    cut into fixed-`budget` token sequences; a document whose token
 *    range straddles a cut contributes to both sequences. Computed
 *    declaratively: one running-sum window gives each doc its global
 *    token interval `[cum − n, cum)`, and the sequences it touches are
 *    `floor(start/B) … floor((end−1)/B)` — a BOUNDED explode (a doc
 *    spans at most `n/B + 1` sequences), no stateful scan.
 *  - [[tokenQuota]]: per-source token budgeting (data-mixing quota):
 *    keep documents in deterministic order while a source's running
 *    token total stays inside its quota — the "cap web at N tokens"
 *    primitive. Same window, then a scan-speed filter.
 *
 * Scale design (100 TB): the only exchange is the window's hash
 * partition on the shard column — each shard's docs sort WITHIN its
 * partitions (Spark plans a partial sort after the exchange, not a
 * global sort). Shards are the parallelism unit a real packing job
 * already has (per-language / per-source / per-shard files); packing
 * across 100 TB in ONE ordered stream would serialize any engine, so
 * the shard key is a required argument, not an option. Skewed shards
 * split under AQE like any other window input.
 */
object Packing {

  /** Running token interval per doc: (everything in `df`) + `__n`
    * (tokens), `__start`/`__end` (global interval within the shard,
    * end exclusive). Zero-token docs are dropped — they contribute to
    * no sequence and would otherwise need a degenerate-range guard. */
  private def intervals(
      df: DataFrame, textCol: String, shardCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
    df.withColumn("__n",
        graft.functions.GraftFunctions.tokenCount(df.sparkSession, col(textCol)))
      .filter(col("__n") > 0)
      .withColumn("__end", sum(col("__n")).over(w))
      .withColumn("__start", col("__end") - col("__n"))
  }

  /**
   * Concat-and-chunk packing: one row per (doc, sequence) contribution.
   * Output: (orderCol, shardCol, seq_idx, toks_in_seq) where `seq_idx`
   * numbers `budget`-token sequences within the shard and `toks_in_seq`
   * is how many of the doc's tokens land in that sequence.
   */
  def packSequences(
      df: DataFrame,
      textCol: String,
      shardCol: String,
      orderCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "token budget must be positive")
    val b = lit(budget)
    val firstSeq: Column = expr(s"__start DIV $budget")
    val lastSeq: Column = expr(s"(__end - 1) DIV $budget")
    intervals(df, textCol, shardCol, orderCol)
      .select(
        col(orderCol), col(shardCol), col("__start"), col("__end"),
        explode(sequence(firstSeq, lastSeq)).as("seq_idx"))
      .select(
        col(orderCol), col(shardCol), col("seq_idx"),
        (least(col("__end"), (col("seq_idx") + 1) * b) -
          greatest(col("__start"), col("seq_idx") * b)).as("toks_in_seq"))
  }

  /**
   * Per-source token quota: documents of each shard are kept in
   * `orderCol` order while the shard's running token total is within
   * `quota` — a doc is kept iff its interval STARTS inside the quota
   * (the standard "truncate the last doc" policy keeps the boundary
   * doc and cuts it downstream). Output: the kept rows of `df`.
   */
  def tokenQuota(
      df: DataFrame,
      textCol: String,
      shardCol: String,
      orderCol: String,
      quota: Long): DataFrame = {
    require(quota >= 1, "token quota must be positive")
    intervals(df, textCol, shardCol, orderCol)
      .filter(col("__start") < quota)
      .drop("__n", "__start", "__end")
  }
}
