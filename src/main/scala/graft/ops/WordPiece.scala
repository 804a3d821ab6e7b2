package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed WordPiece tokenizer training (north-star extension) —
 * the THIRD public tokenizer algorithm beside BPE ([[Bpe]]) and the
 * unigram LM ([[Unigram]]): Schuster & Nakajima 2012, the vocabulary
 * BERT ships. Same merge loop as BPE but a different objective — the
 * winning pair maximizes the corpus LIKELIHOOD gain
 * `score = count(l,r) / (count(l) · count(r))`, not the raw pair
 * count, so a rare-but-always-together pair beats a frequent pair of
 * independently-frequent symbols.
 *
 * Scale shape is [[Bpe.train]]'s: ONE corpus pass builds the
 * (distinct word, count) vocabulary; each merge round then runs on
 * that vocabulary frame — a symbol-count aggregation, an adjacent-pair
 * aggregation, a ONE-ROW argmax collect, and a narrow merge
 * projection, all ∝ |vocab| × symbols-per-word. The symbol encoding
 * is [[Bpe]]'s U+0001-separator scheme, so the oracle
 * replays training verbatim with the same padded-`replace`.
 *
 * WordPiece marks CONTINUATION pieces with the `##` prefix: a word
 * seeds as `w ##o ##r ##d`, and merging (l, r) yields `l + r-minus-##`
 * (the marker of the left part survives — `(##o, ##r) → ##or`,
 * `(w, ##o) → wo`). Position-0 and continuation pieces are distinct
 * symbols with distinct counts, exactly as in the paper.
 *
 * DETERMINISM: the score is a double division of exact integer counts
 * (< 2⁵³) — identically rounded IEEE in both engines; ties break
 * lexicographically (left, then right). Corpus words must not contain
 * U+0001/U+0002 (the separator scheme, as in BPE) or a literal
 * `##`-prefixed token (the continuation marker); neither occurs in
 * space-tokenized natural text and the fixture is ASCII prose.
 */
object WordPiece {

  import Bpe.{S, SS}

  /** Continuation-marker prefix. */
  val CC = "##"

  /** Seed a word into WordPiece symbols: first char bare, the rest
    * `##`-marked, joined by [[Bpe.SS]]. `"abc"` ⇒ `a␁␁##b␁␁##c`. */
  private def seedSymbols(word: Column): Column =
    regexp_replace(
      rtrim(regexp_replace(word, "(.)", CC + "$1" + SS), S),
      "^" + CC, "")

  /** One WordPiece merge on the encoded symbol string: `(l, r)` fuses
    * to `l + r-minus-##` (the right side is always a continuation
    * piece — it sits at a non-initial position by construction). */
  private def applyMerge(wsym: Column, l: String, r: String): Column =
    trim(
      replace(
        concat(lit(S), wsym, lit(S)),
        lit(S + l + SS + r + S),
        lit(S + l + r.stripPrefix(CC) + S)),
      S)

  /**
   * Train `merges` WordPiece merges. Returns the ranked merge table:
   * (rank, left_sym, right_sym, merged_sym, pair_count, left_count,
   * right_count) — rank 1 first; `score = pair_count /
   * (left_count · right_count)` is recomputable from the integer
   * columns (kept out of the output so the table is float-free).
   * Stops early when no adjacent pair remains.
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
    // r20 driver fast path — the [[Bpe.train]] gate applied to the
    // WordPiece objective: same collected vocab, same greedy leftmost
    // merge list form; the winner is argmax of the double score
    // p/(l·r) computed from exact Long counts — the identical IEEE
    // operations the distributed branch runs, so ordering (score desc,
    // UTF-8-byte left asc, right asc) is bit-identical. WordPieceSpec
    // pins fast ≡ loop; past the gate the loop below runs unchanged.
    if (vocab0.count() <= Bpe.bpeDriverMaxVocab) {
      var words: Array[(Array[String], Long)] = vocab0.collect().map { r =>
        (r.getString(0).split(java.util.regex.Pattern.quote(SS), -1),
          r.getLong(1))
      }
      def u8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val learned = Seq.newBuilder[(Long, String, String, String, Long, Long, Long)]
      var rank = 1
      var exhausted = false
      while (rank <= merges && !exhausted) {
        val symCounts = collection.mutable.HashMap.empty[String, Long]
        val pairCounts = collection.mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (syms, n) =>
          var i = 0
          while (i < syms.length) {
            symCounts(syms(i)) = symCounts.getOrElse(syms(i), 0L) + n
            if (i < syms.length - 1) {
              val k = (syms(i), syms(i + 1))
              pairCounts(k) = pairCounts.getOrElse(k, 0L) + n
            }
            i += 1
          }
        }
        if (pairCounts.isEmpty) exhausted = true
        else {
          var bestK: (String, String) = null
          var bestC = 0L
          var bestScore = 0.0
          pairCounts.foreach { case (k, p) =>
            val score = p.toDouble /
              (symCounts(k._1).toDouble * symCounts(k._2).toDouble)
            val better =
              if (bestK == null) true
              else if (score != bestScore) score > bestScore
              else {
                val cl = java.util.Arrays.compareUnsigned(u8(k._1), u8(bestK._1))
                if (cl != 0) cl < 0
                else java.util.Arrays.compareUnsigned(u8(k._2), u8(bestK._2)) < 0
              }
            if (better) { bestK = k; bestC = p; bestScore = score }
          }
          val (lft, rgt) = bestK
          learned += ((rank.toLong, lft, rgt, lft + rgt.stripPrefix(CC),
            bestC, symCounts(lft), symCounts(rgt)))
          val merged = lft + rgt.stripPrefix(CC)
          words = words.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == lft && syms(i + 1) == rgt) {
                  out += merged; i += 2 // leftmost non-overlapping
                } else { out += syms(i); i += 1 }
              }
              (out.result(), n)
            }
          }
          rank += 1
        }
      }
      return learned.result().toDF("rank", "left_sym", "right_sym",
        "merged_sym", "pair_count", "left_count", "right_count")
    }
    var vocab = vocab0
    val learned = Seq.newBuilder[(Long, String, String, String, Long, Long, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val l = col("l")
      val syms = vocab.select(col("n"), split(col("wsym"), SS).as("l"))
      val symCounts = syms
        .select(explode(l).as("sym"), col("n"))
        .groupBy("sym").agg(sum("n").as("cnt"))
      val top = syms
        .filter(size(l) > 1)
        .select(col("n"),
          explode(transform(sequence(lit(1), size(l) - 1), i => struct(
            element_at(l, i).as("ls"),
            element_at(l, i + 1).as("rs")))).as("p"))
        .groupBy(col("p.ls").as("left_sym"), col("p.rs").as("right_sym"))
        .agg(sum("n").as("pair_count"))
        .join(symCounts.select(col("sym").as("left_sym"),
          col("cnt").as("left_count")), Seq("left_sym"))
        .join(symCounts.select(col("sym").as("right_sym"),
          col("cnt").as("right_count")), Seq("right_sym"))
        .withColumn("score",
          col("pair_count").cast("double") /
            (col("left_count").cast("double") * col("right_count").cast("double")))
        .orderBy(desc("score"), asc("left_sym"), asc("right_sym"))
        .limit(1)
        .select("left_sym", "right_sym", "pair_count", "left_count", "right_count")
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top(0)
        val (lft, rgt) = (row.getString(0), row.getString(1))
        learned += ((rank.toLong, lft, rgt, lft + rgt.stripPrefix(CC),
          row.getLong(2), row.getLong(3), row.getLong(4)))
        vocab = vocab
          .select(applyMerge(col("wsym"), lft, rgt).as("wsym"), col("n"))
          .localCheckpoint()
        rank += 1
      }
    }
    learned.result().toDF("rank", "left_sym", "right_sym", "merged_sym",
      "pair_count", "left_count", "right_count")
  }

  /** The vocabulary the greedy encoder matches against: the training
    * ALPHABET (every position-0 char and `##`-marked continuation
    * char of the corpus — unmergeable floor, exactly the paper's
    * construction) plus one merged piece per learned merge. One
    * corpus pass; output is alphabet+merges-sized. */
  def vocab(df: DataFrame, textCol: String, trained: DataFrame): DataFrame = {
    val alphabet = df
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .select(explode(split(seedSymbols(col("word")), SS)).as("piece"))
      .distinct()
    alphabet.unionByName(trained.select(col("merged_sym").as("piece")))
      .distinct()
  }

  /** The piece list collected to the driver — constant-size (alphabet
    * + merge count), the model artifact the encoder kernels take. */
  def pieceList(vocab: DataFrame): Seq[String] =
    vocab.orderBy("piece").collect().toSeq.map(_.getString(0))
}
