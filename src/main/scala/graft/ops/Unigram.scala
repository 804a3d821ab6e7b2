package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Unigram-LM (SentencePiece-style) tokenizer TRAINING (north-star
 * extension; Kudo 2018, "Subword Regularization" — the second public
 * tokenizer-training algorithm a multilingual pipeline ships beside
 * [[Bpe]]). A piece vocabulary with probabilities is learned by:
 *
 *  1. SEED — every substring of every corpus word up to `maxPieceLen`
 *     code points, weighted by word frequency; all single characters
 *     are kept unconditionally (segmentation totality), the top
 *     `seedSize` multi-character substrings by (count desc, piece asc)
 *     join them. Probability ∝ substring count.
 *  2. EM — `emIters` rounds of HARD EM (the deterministic Viterbi
 *     variant of Kudo's E-step — expected counts from the single best
 *     segmentation instead of the full lattice, the documented choice
 *     that makes training integer-exact and DuckDB-replayable): each
 *     round re-segments the VOCABULARY (never the corpus) under the
 *     current model, re-counts pieces weighted by word frequency,
 *     drops multi-char pieces that won no occurrences, floors single
 *     chars at count 1, and re-normalizes.
 *  3. PRUNE — keep the `keepSize` best multi-char pieces by
 *     (count desc, piece asc) plus all single chars; re-normalize.
 *
 * Probabilities are INTEGER MICRONATS (`round(ln(cnt/total)·1e6)` as
 * BIGINT — [[graft.functions.UnigramKernels]] documents the contract):
 * every Viterbi comparison in training and encoding is an exact
 * integer sum, so the same arithmetic replays bit-identically in the
 * DuckDB oracle. Ties in seed/prune selection break on the piece
 * string ascending — training is deterministic under any partitioning.
 *
 * Scale shape (the [[Bpe.train]] discipline): ONE corpus pass builds
 * the (distinct word, count) vocabulary frame; everything after —
 * substring explosion, E-step segmentation, pruning — is
 * vocab-bounded, cost ∝ |distinct words| × word length × maxPieceLen,
 * never corpus tokens. The model itself is driver-sized by design (a
 * tokenizer artifact: |alphabet| + seedSize entries, the same class of
 * constant as a BPE merge list) and rides into the segmentation kernel
 * as ONE plan reference object. Words longer than `maxWordLen` code
 * points are excluded from training (SentencePiece's
 * max-sentencepiece-length discipline: pathological "words" — URLs,
 * base64 blobs — would blow the substring explosion quadratically and
 * carry no reusable subword signal).
 */
object Unigram {

  /** Quantize a (piece, cnt) frame into the final model shape:
    * (piece, cnt, logp_micro) with logp = round(ln(cnt/Σcnt)·1e6). */
  private def withLogp(m: DataFrame): DataFrame = {
    val tot = m.agg(sum(col("cnt")).cast("double").as("__tot"))
    m.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__tot")) * 1e6, 0)
          .cast("long").as("logp_micro"))
  }

  /** The (word, n) vocabulary frame: one corpus pass, overlong words
    * excluded. */
  private def wordFrame(df: DataFrame, textCol: String, maxWordLen: Int) =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(length(col("word")).between(1, maxWordLen))

  /**
   * Train a unigram-LM piece model. Returns (piece, cnt, logp_micro),
   * one row per surviving piece — the model a tokenizer ships
   * (persist with plain parquet; re-load with [[modelTable]]).
   */
  def train(
      df: DataFrame,
      textCol: String,
      maxPieceLen: Int = 4,
      seedSize: Int = 200,
      emIters: Int = 2,
      keepSize: Int = 100,
      maxWordLen: Int = 16): DataFrame = {
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen must be in [2, 16]: got $maxPieceLen")
    require(seedSize >= 1 && keepSize >= 1 && emIters >= 0,
      "seedSize/keepSize must be >= 1, emIters >= 0")
    val spark = df.sparkSession
    val words = wordFrame(df, textCol, maxWordLen).localCheckpoint()

    // 1. seed: all substrings ≤ maxPieceLen, weighted by word count
    val subs = words
      .select(col("n"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), s ->
           |  transform(sequence(s, least(s + ${maxPieceLen - 1}, length(word))),
           |    e -> substring(word, s, e - s + 1))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("n").as("cnt"))
      .localCheckpoint()
    val singles = subs.filter(length(col("piece")) === 1)
    var model = singles.unionByName(
      subs.filter(length(col("piece")) > 1)
        .orderBy(desc("cnt"), asc("piece")).limit(seedSize))
      .localCheckpoint()

    // 2. hard-EM rounds on the vocabulary frame
    for (_ <- 1 to emIters) {
      val table = modelTable(withLogp(model))
      val segCounts = words
        .select(col("n"),
          explode(GraftFunctions.unigramPieces(spark, col("word"), table))
            .as("piece"))
        .groupBy("piece").agg(sum("n").as("segcnt"))
      // single chars: full alphabet kept, count floored at 1;
      // multi-char: only pieces the Viterbi paths actually used
      model = singles.select("piece")
        .join(segCounts, Seq("piece"), "left")
        .select(col("piece"),
          greatest(coalesce(col("segcnt"), lit(0L)), lit(1L)).as("cnt"))
        .unionByName(
          model.filter(length(col("piece")) > 1).select("piece")
            .join(segCounts, Seq("piece"), "inner")
            .select(col("piece"), col("segcnt").as("cnt")))
        .localCheckpoint()
    }

    // 3. prune to keepSize multi-char pieces + the full alphabet
    withLogp(
      model.filter(length(col("piece")) === 1).unionByName(
        model.filter(length(col("piece")) > 1)
          .orderBy(desc("cnt"), asc("piece")).limit(keepSize)))
  }

  /** The trained model as the kernel's (piece, logp_micro) table,
    * collected to the driver — constant-size (a tokenizer artifact),
    * sorted by piece so the kernel spec string is deterministic. */
  def modelTable(model: DataFrame): Seq[(String, Long)] =
    model.orderBy("piece").select("piece", "logp_micro")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
}
