package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, UnigramKernels}
import graft.ops.Unigram

class UnigramSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def kernelPieces(word: String, model: Seq[(String, Long)]): Seq[String] = {
    val m = UnigramKernels.parseSpec(UnigramKernels.spec(model))
    val a = UnigramKernels.pieces(UTF8String.fromString(word), m)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  private def kernelCount(text: String, model: Seq[(String, Long)]): Long =
    UnigramKernels.count(UTF8String.fromString(text),
      UnigramKernels.parseSpec(UnigramKernels.spec(model)))

  /** Brute force: enumerate every segmentation (pieces from the model,
    * or single-char UNK), return the max score. */
  private def bruteBest(word: String, model: Seq[(String, Long)]): Long = {
    val t = model.toMap
    def go(i: Int): Long =
      if (i == word.length) 0L
      else (1 to (word.length - i)).flatMap { l =>
        val p = word.substring(i, i + l)
        t.get(p).map(_ + go(i + l))
          .orElse(if (l == 1) Some(UnigramKernels.UnkMicro + go(i + 1)) else None)
      }.max
    go(0)
  }

  private def pathScore(word: String, pieces: Seq[String],
      model: Seq[(String, Long)]): Long = {
    val t = model.toMap
    assert(pieces.mkString == word, s"pieces must tile the word: $pieces")
    pieces.map(p => t.getOrElse(p,
      { assert(p.length == 1, s"multi-char OOV piece $p"); UnigramKernels.UnkMicro }))
      .sum
  }

  test("viterbi: best segmentation, hand case") {
    // ab is much more probable than a+b
    val m = Seq("a" -> -2000000L, "b" -> -2000000L, "ab" -> -1000000L)
    assert(kernelPieces("ab", m) == Seq("ab"))
    assert(kernelPieces("aab", m) == Seq("a", "ab"))
    assert(kernelCount("ab aab ab", m) == 1 + 2 + 1)
  }

  test("viterbi: exact integer tie breaks toward the longer piece") {
    // [a, b] and [ab] both score -2000000 exactly
    val m = Seq("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L)
    assert(kernelPieces("ab", m) == Seq("ab"))
    // and the tie-break is positional, not global: 'aab' -> a + ab
    assert(kernelPieces("aab", m) == Seq("a", "ab"))
  }

  test("viterbi: OOV single chars segment as UNK pieces") {
    val m = Seq("a" -> -1000000L)
    assert(kernelPieces("axa", m) == Seq("a", "x", "a"))
    // a known piece always beats an UNK path through its chars
    val m2 = Seq("x" -> -90000000L, "xy" -> -99000000L)
    assert(kernelPieces("xy", m2) == Seq("xy")) // -99e6 > -90e6 + UNK
    assert(kernelCount("", m) == 0L)
    assert(kernelCount("  ", m) == 0L) // empty words count 0
  }

  test("viterbi: kernel path score equals brute-force optimum") {
    val m = Seq("a" -> -1200000L, "b" -> -1500000L, "c" -> -1700000L,
      "ab" -> -2100000L, "bc" -> -2300000L, "abc" -> -3100000L,
      "ca" -> -2000000L, "aa" -> -1900000L)
    for (w <- Seq("abcabc", "aabbcc", "cabcab", "abccba", "aaaaaa", "xbcax")) {
      val pieces = kernelPieces(w, m)
      assert(pathScore(w, pieces, m) == bruteBest(w, m),
        s"word $w: kernel path $pieces is not optimal")
    }
  }

  test("train: hand-computed seed, EM re-count, and prune") {
    // words: ab x3, cd x1
    val df = Seq("ab ab", "ab cd").toDF("text")
    val model = Unigram.train(df, "text",
        maxPieceLen = 2, seedSize = 2, emIters = 1, keepSize = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // seed: a3 b3 ab3 c1 d1 cd1 (total 12); EM segments ab->[ab],
    // cd->[cd]; singles floor at 1 -> a1 b1 c1 d1 ab3 cd1; prune keeps
    // top-1 multi (ab); final counts a1 b1 c1 d1 ab3, total 7
    val lnq = (c: Long, t: Long) => math.round(math.log(c.toDouble / t) * 1e6)
    assert(model == Set(
      ("a", 1L, lnq(1, 7)), ("b", 1L, lnq(1, 7)),
      ("c", 1L, lnq(1, 7)), ("d", 1L, lnq(1, 7)),
      ("ab", 3L, lnq(3, 7))))
  }

  test("train: seed tie-break is deterministic on the piece string") {
    // every multi-char substring count ties at 1: selection must be
    // lexicographic, so seedSize=2 keeps 'ab' and 'abc'
    val df = Seq("abc").toDF("text")
    val m = Unigram.train(df, "text",
        maxPieceLen = 3, seedSize = 2, emIters = 0, keepSize = 2)
      .select("piece").as[String].collect().toSet
    assert(m == Set("a", "b", "c", "ab", "abc"))
  }

  test("train: overlong words are excluded from the vocabulary") {
    val df = Seq("ab ab toolongword").toDF("text")
    val m = Unigram.train(df, "text", maxPieceLen = 2, seedSize = 2,
        emIters = 1, keepSize = 2, maxWordLen = 8)
      .select("piece").as[String].collect().toSet
    assert(!m.exists(p => "toolongword".contains(p) && !"ab".contains(p)))
  }

  test("kernel column surface: sql registration and null propagation") {
    val model = Seq("a" -> -1000000L, "ab" -> -900000L)
    val df = Seq((1L, "ab a"), (2L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select(col("id"),
        GraftFunctions.unigramCount(spark, col("t"), model).as("n"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 2L)
    assert(got(1).isNullAt(1))
    GraftFunctions.register(spark)
    // SQL-callable via the registered name; the spec argument is a
    // foldable chr/concat expression (constant-folded before parse)
    val viaSql = spark.sql(
      "SELECT graft_unigram_pieces('aab', concat(" +
        "'a', char(2), '-1000000', char(3), 'ab', char(2), '-900000')) AS p")
      .head.getSeq[String](0)
    assert(viaSql == Seq("a", "ab"))
  }

  test("durable model roundtrip: stored model encodes identically") {
    val df = Seq("ab ab cd", "ab cd cd", "abcd ab").toDF("text")
    val trained = Unigram.train(df, "text",
      maxPieceLen = 3, seedSize = 4, emIters = 2, keepSize = 3)
    val dir = java.nio.file.Files.createTempDirectory("unigram_model").toString
    trained.write.mode("overwrite").parquet(dir)
    val live = Unigram.modelTable(trained)
    val stored = Unigram.modelTable(spark.read.parquet(dir))
    assert(live == stored)
    val enc = df.select(
      GraftFunctions.unigramCount(spark, col("text"), stored).as("n"))
      .as[Long].collect().toSeq
    assert(enc == df.select(
      GraftFunctions.unigramCount(spark, col("text"), live).as("n"))
      .as[Long].collect().toSeq)
  }
}
