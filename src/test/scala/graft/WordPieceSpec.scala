package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, WordPieceKernels}
import graft.ops.WordPiece

class WordPieceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def model(pieces: String*) =
    WordPieceKernels.parseSpec(WordPieceKernels.spec(pieces))

  private def piecesOf(word: String, vocab: Seq[String]): Seq[String] = {
    val a = WordPieceKernels.pieces(
      org.apache.spark.unsafe.types.UTF8String.fromString(word),
      model(vocab: _*))
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("train: hand-computed merges, likelihood tie-break, ## marking") {
    // words: ab×3, ac×2 — symbols a:5 ##b:3 ##c:2; both pairs score
    // 0.2 (3/15 vs 2/10) -> tie breaks toward right '##b' < '##c'
    val docs = Seq("ab ab ac", "ab ac").toDF("text")
    val got = WordPiece.train(docs, "text", 2)
      .orderBy("rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got(0) == ((1L, "a", "##b", "ab", 3L, 5L, 3L)))
    // round 2: remaining pair (a, ##c) with a:2 ##c:2 -> ac
    assert(got(1) == ((2L, "a", "##c", "ac", 2L, 2L, 2L)))
  }

  test("train: likelihood objective beats raw pair count (unlike BPE)") {
    // xy×5 vs zw×2: (x,##y) count 5, score 5/25 = 0.2;
    // (z,##w) count 2, score 2/4 = 0.5 -> WordPiece picks (z,##w)
    val docs = Seq("xy xy xy xy xy zw zw").toDF("text")
    val wp = WordPiece.train(docs, "text", 1).head()
    assert((wp.getString(1), wp.getString(2), wp.getString(3)) ==
      (("z", "##w", "zw")))
    val bpe = graft.ops.Bpe.train(docs, "text", 1).head()
    assert((bpe.getString(1), bpe.getString(2)) == (("x", "y")))
  }

  test("train: continuation merges keep the ## marker") {
    // abc×4: round 1 both pairs score 4/16; tie -> left '##b' < 'a'
    // ('#' 0x23 sorts before letters), winner (##b,##c) -> '##bc'
    // KEEPS the marker; round 2 fuses (a,##bc) -> bare 'abc'
    val docs = Seq("abc abc abc abc").toDF("text")
    val got = WordPiece.train(docs, "text", 2).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(got(0) == (("##b", "##c", "##bc")))
    assert(got(1) == (("a", "##bc", "abc")))
    // continuation-side merge keeps the ## marker: all four pairs of
    // dabc/eabc score exactly 1/3 (2/6, 1/3, 3/9, 3/9 — the same
    // correctly-rounded double), so the tie-break picks the smallest
    // left symbol '##a' and the fused piece is '##ab', still marked
    val docs2 = Seq("dabc dabc eabc").toDF("text")
    val w2 = WordPiece.train(docs2, "text", 1).head()
    assert((w2.getString(1), w2.getString(2), w2.getString(3)) ==
      (("##a", "##b", "##ab")))
  }

  test("vocab: alphabet plus merged pieces, positional ## identities") {
    val docs = Seq("ab ab ac ba").toDF("text")
    val trained = WordPiece.train(docs, "text", 1)
    val v = WordPiece.pieceList(WordPiece.vocab(docs, "text", trained))
    // alphabet: a, b (position-0) + ##a, ##b, ##c (continuation);
    // round-1 winner is (b,##a) -> 'ba' (score 1/(1·1) = 1.0 — the
    // always-together pair beats the frequent (a,##b) at 2/6)
    assert(v.toSet == Set("a", "b", "##a", "##b", "##c", "ba"))
  }

  test("greedy pieces: longest-match-first, position-aware ## lookup") {
    val vocab = Seq("un", "##able", "##ab", "##le", "u", "##n", "##a",
      "##b", "##l", "##e")
    assert(piecesOf("unable", vocab) == Seq("un", "##able"))
    // without ##able, greedy takes ##ab then ##le
    assert(piecesOf("unable", vocab.filterNot(_ == "##able")) ==
      Seq("un", "##ab", "##le"))
    // position matters: bare 'able' has no position-0 'a...' piece
    assert(piecesOf("able", vocab) == Seq(WordPieceKernels.Unk))
    // greedy is NOT optimal: taking ##ab leaves a dead 'l'+'e'? no —
    // ##l and ##e exist, so it segments; just more pieces
    assert(piecesOf("unab", vocab) == Seq("un", "##ab"))
  }

  test("greedy: whole-word [UNK] fallback and counts") {
    val vocab = Seq("a", "##b")
    assert(piecesOf("ab", vocab) == Seq("a", "##b"))
    assert(piecesOf("abz", vocab) == Seq(WordPieceKernels.Unk))
    assert(piecesOf("za", vocab) == Seq(WordPieceKernels.Unk))
    val m = model(vocab: _*)
    def cnt(t: String): Long = WordPieceKernels.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), m)
    assert(cnt("ab ab") == 4L)
    assert(cnt("ab abz ab") == 5L)   // middle word collapses to 1 [UNK]
    assert(cnt("") == 0L)            // empty text: zero words
    assert(cnt("ab  ab") == 4L)      // double space: empty word counts 0
  }

  test("kernels: SQL surface and null propagation") {
    GraftFunctions.register(spark)
    val spec = WordPieceKernels.spec(Seq("a", "##b"))
    val lit = spec.replace("'", "''")
    val r = spark.sql(
      s"SELECT graft_wordpiece_count('ab ab', '$lit') AS c, " +
        s"graft_wordpiece_pieces('ab', '$lit') AS p, " +
        s"graft_wordpiece_count(CAST(NULL AS STRING), '$lit') AS n")
      .head()
    assert(r.getLong(0) == 4L)
    assert(r.getSeq[String](1) == Seq("a", "##b"))
    assert(r.isNullAt(2))
  }

  test("durable roundtrip: stored vocab encodes identically") {
    val docs = TestSpark.table("documents").limit(60)
    val even = docs.filter($"doc_id" % 2 === 0)
    val trained = WordPiece.train(even, "text", 4)
    val vocabDf = WordPiece.vocab(even, "text", trained)
    val dir = TestSpark.tmpDir("wp_model")
    vocabDf.write.mode("overwrite").parquet(dir)
    val stored = WordPiece.pieceList(spark.read.parquet(dir))
    val direct = WordPiece.pieceList(vocabDf)
    assert(stored == direct && stored.nonEmpty)
    val enc = docs.filter($"doc_id" % 2 =!= 0)
      .select($"doc_id",
        GraftFunctions.wordPieceCount(spark, $"text", stored).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc.nonEmpty && enc.values.forall(_ > 0L))
    // held-out words segment without [UNK] iff their chars are in the
    // training alphabet; spot-check totals are stable across runs
    val enc2 = docs.filter($"doc_id" % 2 =!= 0)
      .select($"doc_id",
        GraftFunctions.wordPieceCount(spark, $"text", direct).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc == enc2)
  }

  test("train: driver fast path == distributed loop (real corpus, score ties)") {
    // the r20 fast path must reproduce the loop's merge table
    // rank-for-rank under the LIKELIHOOD objective: the double score
    // p/(l·r) is the identical IEEE computation on both paths, ties
    // break on UTF-8-byte symbol order
    val docs = TestSpark.table("documents").filter(col("text").isNotNull)
    val fast = WordPiece.train(docs, "text", merges = 6)
      .as[(Long, String, String, String, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    val saved = graft.ops.Bpe.bpeDriverMaxVocab
    val loop =
      try {
        graft.ops.Bpe.bpeDriverMaxVocab = 0L
        WordPiece.train(docs, "text", merges = 6)
          .as[(Long, String, String, String, Long, Long, Long)]
          .collect().toSeq.sortBy(_._1)
      } finally graft.ops.Bpe.bpeDriverMaxVocab = saved
    assert(fast == loop, "driver fast path must equal the distributed loop")
    assert(fast.size == 6)
  }
}
