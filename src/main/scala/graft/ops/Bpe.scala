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
    val vocab0 = df
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(seedSymbols(col("word")).as("wsym"), col("n"))
      .localCheckpoint()
    // r20 driver fast path: the vocabulary is a BOUNDED driver value
    // (distinct words — the same contract under which the trained
    // model tables already live on the driver, EntryContext's
    // tokenizerMemo), and the merge loop over it is pure arithmetic.
    // The distributed loop paid 2 jobs per merge (a one-row TakeOrdered
    // + a checkpoint) on a frame that is tiny next to the corpus;
    // under the gate the SAME seeded vocab is collected once and the
    // merges run in-process: identical pair counts (overlapping
    // adjacent occurrences, summed in Long), identical tie-break
    // (count desc, then UTF-8 BYTE order on left then right — exactly
    // Spark's string ordering), identical greedy leftmost
    // non-overlapping merge application (the padded-replace's
    // semantics, in list form). BpeSpec pins fast ≡ loop on the real
    // corpus. Past the gate (a 100 TB corpus's vocabulary) the
    // distributed loop below runs unchanged.
    if (vocab0.count() <= bpeDriverMaxVocab) {
      var words: Array[(Array[String], Long)] = vocab0.collect().map { r =>
        (r.getString(0).split(java.util.regex.Pattern.quote(SS), -1),
          r.getLong(1))
      }
      def u8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val learned = Seq.newBuilder[(Long, String, String, Long)]
      var rank = 1
      var exhausted = false
      while (rank <= merges && !exhausted) {
        val counts = collection.mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (syms, n) =>
          var i = 0
          while (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            counts(k) = counts.getOrElse(k, 0L) + n
            i += 1
          }
        }
        if (counts.isEmpty) exhausted = true
        else {
          var best: ((String, String), Long) = null
          counts.foreach { e =>
            if (best == null) best = e
            else {
              val c = java.lang.Long.compare(e._2, best._2)
              val better =
                if (c != 0) c > 0
                else {
                  val cl = java.util.Arrays.compareUnsigned(
                    u8(e._1._1), u8(best._1._1))
                  if (cl != 0) cl < 0
                  else java.util.Arrays.compareUnsigned(
                    u8(e._1._2), u8(best._1._2)) < 0
                }
              if (better) best = e
            }
          }
          val ((lft, rgt), cnt) = best
          learned += ((rank.toLong, lft, rgt, cnt))
          words = words.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == lft && syms(i + 1) == rgt) {
                  out += lft + rgt; i += 2 // leftmost non-overlapping
                } else { out += syms(i); i += 1 }
              }
              (out.result(), n)
            }
          }
          rank += 1
        }
      }
      return learned.result().toDF("rank", "left_sym", "right_sym", "pair_count")
    }
    var vocab = vocab0
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

  /** Vocabulary gate for [[train]]'s driver fast path (~100 MB of
    * word/count pairs at the cap — the tokenizerMemo bounded-driver-
    * value contract). `var` only as a test seam (BpeSpec forces the
    * distributed loop to pin fast ≡ loop); production never writes. */
  private[graft] var bpeDriverMaxVocab = 2_000_000L

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
