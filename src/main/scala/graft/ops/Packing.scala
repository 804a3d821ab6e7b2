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
      df: DataFrame, textCol: String, shardCol: String, orderCol: String): DataFrame =
    intervalsBy(df,
      graft.functions.GraftFunctions.tokenCount(df.sparkSession, col(textCol)),
      shardCol, orderCol)

  /** [[intervals]] under ANY per-doc token counter (e.g. the BPE
    * kernel — packing budgets should be measured in the tokens the
    * MODEL will see, not whitespace words). */
  private def intervalsBy(
      df: DataFrame, countExpr: Column, shardCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
    df.withColumn("__n", countExpr)
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
      budget: Long): DataFrame =
    packSequencesBy(df,
      graft.functions.GraftFunctions.tokenCount(df.sparkSession, col(textCol)),
      shardCol, orderCol, budget)

  /** [[packSequences]] under ANY per-doc token counter — pass the BPE
    * kernel ([[graft.functions.GraftFunctions.bpeCount]]) to budget
    * sequences in MODEL tokens (what the trainer actually packs)
    * instead of whitespace words. Same plan: one running-sum window
    * per shard + a bounded explode. */
  def packSequencesBy(
      df: DataFrame,
      countExpr: Column,
      shardCol: String,
      orderCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "token budget must be positive")
    val b = lit(budget)
    val firstSeq: Column = expr(s"__start DIV $budget")
    val lastSeq: Column = expr(s"(__end - 1) DIV $budget")
    intervalsBy(df, countExpr, shardCol, orderCol)
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

  /**
   * Token-balanced shard export — the training-data writer's
   * assignment: a deterministic seeded global shuffle (order = salted
   * md5 of the key — the [[Sampling]] hash story: reruns, retries and
   * repartitions reproduce the same order forever) with contiguous
   * `targetTokens`-sized shards cut along the running token total, so
   * every output shard carries the same token volume (± one document)
   * regardless of document-length skew. Doc-count sharding
   * (`hash % N`) leaves per-shard token imbalance equal to the
   * doc-length variance; trainer workers and output files want token
   * balance.
   *
   * Output: (idCol, n_toks, tok_start, shard_idx) — `tok_start` =
   * tokens preceding the doc in the global shuffled order; a doc
   * straddling a shard boundary belongs to the shard its FIRST token
   * lands in ([[packSequences]]' convention, truncation downstream).
   *
   * Scale: the global running sum is a DISTRIBUTED PREFIX SUM, never
   * one window over the corpus. Docs group by the first two hex chars
   * of the order key (256 salt groups; the salt is a PREFIX of the
   * key, so per-group order concatenated in salt order IS the global
   * key order), each group running-sums under a partitioned window,
   * and the 256 GROUP TOTALS — constant-size state, independent of
   * the corpus — cumulate in one bounded single-partition window and
   * broadcast back as per-group offsets. Shard assignment is then a
   * scan-speed projection.
   */
  def exportShards(
      df: DataFrame,
      textCol: String,
      idCol: String,
      targetTokens: Long,
      seed: String = "shards"): DataFrame = {
    require(targetTokens >= 1, "shard token target must be positive")
    val pre = df
      .withColumn("__key", md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
      .withColumn("__salt", substring(col("__key"), 1, 2))
      .withColumn("__n",
        graft.functions.GraftFunctions.tokenCount(df.sparkSession, col(textCol))
          .cast("long"))
    // idCol tiebreak keeps the order total even under an md5 collision
    val w = Window.partitionBy("__salt").orderBy(col("__key"), col(idCol))
    val local = pre.withColumn("__e", sum(col("__n")).over(w))
    // 256 rows — the single-partition window is over CONSTANT-size
    // state (the salt-group totals), not the data; exclusive prefix
    val offsets = local.groupBy(col("__salt")).agg(sum(col("__n")).as("__t"))
      .withColumn("__off",
        coalesce(
          sum(col("__t")).over(
            Window.orderBy("__salt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__salt", "__off")
    local.join(broadcast(offsets), Seq("__salt"))
      .withColumn("__start", col("__off") + col("__e") - col("__n"))
      .withColumn("shard_idx", expr(s"__start DIV $targetTokens"))
      .select(col(idCol), col("__n").as("n_toks"),
        col("__start").as("tok_start"), col("shard_idx"))
  }

  /**
   * Per-shard dataset card: the manifest a published training export
   * ships beside its shards — doc/token counts plus composition over
   * an attribute (source, language…). One groupBy over the
   * [[exportShards]] assignment joined with the doc attributes; at
   * 100 TB the manifest is |shards| rows — the queryable metadata a
   * consumer reads INSTEAD of scanning the export to learn its mix.
   *
   * `n_attrs` = distinct attribute values in the shard;
   * `top_attr` = lexicographically-first modal value (deterministic
   * tie-break so the manifest is reproducible run to run).
   */
  def shardManifest(
      shards: DataFrame, docs: DataFrame, idCol: String,
      attrCol: String): DataFrame = {
    val joined = shards.join(docs.select(col(idCol), col(attrCol)), Seq(idCol))
    val byAttr = joined.groupBy(col("shard_idx"), col(attrCol))
      .agg(count(lit(1)).as("__c"), sum(col("n_toks")).as("__t"))
    byAttr.groupBy(col("shard_idx"))
      .agg(
        sum(col("__c")).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        count(lit(1)).as("n_attrs"),
        // modal attribute, ties → lexicographically first:
        // min(struct(−count, attr)) — decomposable, no window
        min(struct((-col("__c")).as("__negc"), col(attrCol).as("__a")))
          .getField("__a").as("top_attr"))
  }
}
