package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE (byte-pair-encoding) tokenizer training (north-star
 * extension) — learn the merge table an LLM tokenizer ships with from
 * the corpus itself.
 *
 * Scale shape (the classic one, GPT-2-style): the corpus is read ONCE
 * to build the (distinct word, count) vocabulary; every merge
 * iteration then runs on that vocabulary frame — cost ∝ |vocab| ×
 * symbols-per-word, never corpus tokens. Per iteration: one
 * vocab-sized pair aggregation (map-side partials, shuffle keyed on
 * the pair), a ONE-ROW collect of the winning pair (constant driver
 * state), and a narrow merge-application projection. The vocabulary
 * frame is `localCheckpoint`ed each round so lineage stays O(1) across
 * hundreds of merges.
 *
 * Merge application uses a string `replace` over a control-character
 * symbol encoding, so the SAME operation is expressible in ANSI SQL
 * and the DuckDB oracle replays training verbatim:
 *
 *  - a word's symbol sequence is stored as the symbols joined by the
 *    DOUBLED separator `\u0001\u0001` ("a b c" ⇒ `a␁␁b␁␁c`);
 *  - applying merge (l, r) = pad to `␁…␁`, then
 *    `replace(␁l␁␁r␁ → ␁lr␁)` — the doubled interior separator makes
 *    boundary-sharing matches independent (`␁a␁␁b␁␁a␁␁b␁` rewrites to
 *    `␁ab␁␁ab␁` in one pass), while single-symbol prefixes can never
 *    false-match inside a longer symbol;
 *  - `replace` is leftmost non-overlapping in both engines, which IS
 *    greedy BPE pair semantics (`a a a` ⇒ `[aa, a]`).
 *
 * Ties in pair counts break lexicographically (left, then right) so
 * training is deterministic under any partitioning. Corpus text must
 * not contain `\u0001` / `\u0002` (control chars; enforced nowhere —
 * they cannot appear in space-tokenized natural-language corpora and
 * the fixture is ASCII).
 *
 * Encoding new text with a learned merge list has two forms:
 * [[segmentCountPortable]], the fold-of-`replace` Column expression
 * (the oracle template — viable for small merge lists), and
 * [[graft.functions.GraftFunctions.bpeCount]], the codegen kernel that
 * loops the merge array per word (the production path: a 32k-merge
 * tokenizer cannot be a 32k-deep expression tree).
 */
object Bpe {

  /** Symbol separator (single). Words are stored joined by [[SS]]. */
  val S = "\u0001"

  /** The doubled separator between symbols. */
  val SS: String = S + S

  /** Seed a word into its character-symbol encoding: every char a
    * symbol, joined by [[SS]]. `"abc"` ⇒ `a␁␁b␁␁c`. */
  private def seedSymbols(word: Column): Column =
    rtrim(regexp_replace(word, "(.)", "$1" + SS), S)

  /** One merge application on the [[SS]]-encoded symbol string. */
  private def applyMerge(wsym: Column, l: String, r: String): Column =
    trim(
      replace(
        concat(lit(S), wsym, lit(S)),
        lit(S + l + SS + r + S),
        lit(S + l + r + S)),
      S)

  /**
   * Train `merges` BPE merges on the corpus. Returns the ranked merge
   * table: (rank, left_sym, right_sym, pair_count) — rank 1 is the
   * first (most frequent) merge. Stops early if the vocabulary runs
   * out of adjacent pairs (every word fused to one symbol).
   */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 100000,
      s"merge count must be in [1, 100000]: got $merges")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = df
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(seedSymbols(col("word")).as("wsym"), col("n"))
      .localCheckpoint()
    val learned = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val l = col("l")
      val top = vocab
        .select(col("n"), split(col("wsym"), SS).as("l"))
        .filter(size(l) > 1)
        .select(col("n"),
          explode(transform(sequence(lit(1), size(l) - 1), i => struct(
            element_at(l, i).as("ls"),
            element_at(l, i + 1).as("rs")))).as("p"))
        .groupBy(col("p.ls").as("left_sym"), col("p.rs").as("right_sym"))
        .agg(sum("n").as("pair_count"))
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top(0)
        val (lft, rgt) = (row.getString(0), row.getString(1))
        learned += ((rank.toLong, lft, rgt, row.getLong(2)))
        vocab = vocab
          .select(applyMerge(col("wsym"), lft, rgt).as("wsym"), col("n"))
          .localCheckpoint()
        rank += 1
      }
    }
    learned.result().toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** The learned merge list in rank order, collected to the driver —
    * constant-size (the merge count the caller chose). */
  def mergeList(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy("rank").select("left_sym", "right_sym")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  /**
   * BPE token count of `textCol` under a learned merge list, as a pure
   * fold-of-`replace` Column expression: per word, seed characters,
   * apply every merge in rank order, count surviving symbols; sum over
   * words. This is the ORACLE TEMPLATE (one nested `replace` per
   * merge — expression depth ∝ merges, fine for the tens the oracle
   * replays); production encoding is the
   * [[graft.functions.GraftFunctions.bpeCount]] kernel, parity-pinned
   * against this form in BpeSpec.
   */
  /** Padded symbol string of one word after applying `merges` in rank
    * order — the shared core of the portable encode forms. */
  private def encodePadded(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(concat(lit(S), seedSymbols(w), lit(S))) {
      case (acc, (l, r)) =>
        replace(acc, lit(S + l + SS + r + S), lit(S + l + r + S))
    }

  def segmentCountPortable(c: Column, merges: Seq[(String, String)]): Column = {
    val perWord = transform(TextOps.tokens(c),
      w => size(split(trim(encodePadded(w, merges), S), SS)).cast("long"))
    aggregate(perWord, lit(0L), (acc, x) => acc + x)
  }

  /**
   * The corpus vocabulary under a learned merge list: every surviving
   * symbol (= BPE token) with its corpus occurrence count — the token
   * frequency table a tokenizer ships beside its merges (and the input
   * to vocabulary-size/coverage decisions).
   *
   * Same scale shape as [[train]]: ONE corpus pass aggregates
   * (distinct word, count); encoding and the symbol rollup then run on
   * the vocab frame — applying the merge list costs |vocab| ×
   * |merges| replaces, never a corpus re-read.
   */
  def vocabulary(
      df: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(split(trim(encodePadded(col("word"), merges), S), SS).as("syms"),
        col("n"))
      .select(explode(col("syms")).as("symbol"), col("n"))
      .groupBy("symbol").agg(sum("n").as("n_occurrences"))
}
