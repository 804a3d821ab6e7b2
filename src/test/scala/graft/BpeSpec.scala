package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BpeCountKernel, GraftFunctions}
import graft.ops.Bpe

class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("train: hand-computed merges on the classic low/lower corpus") {
    val df = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = Bpe.train(df, "text", merges = 4)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    // iter 1: (l,o)=5 ties (o,w)=5 → left asc picks (l,o)
    // iter 2: (lo,w)=5
    // iter 3: (low,e)=2 ties (e,r)=2 → left asc picks (e,r)
    // iter 4: (low,er)=2
    assert(got == Seq(
      (1L, "l", "o", 5L),
      (2L, "lo", "w", 5L),
      (3L, "e", "r", 2L),
      (4L, "low", "er", 2L)))
  }

  test("train stops early when the vocabulary has no adjacent pairs") {
    val df = Seq("a a b", "b a").toDF("text")
    assert(Bpe.train(df, "text", merges = 5).count() == 0)
    // and a vocab that fuses completely before the budget is spent
    val tiny = Seq("ab ab ab").toDF("text")
    val got = Bpe.train(tiny, "text", merges = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "b", 3L)))
  }

  test("greedy leftmost merge semantics: 'a a a' → [aa, a]") {
    val merges = Seq(("a", "a"))
    val df = Seq("aaa", "aaaa", "aaaaa").toDF("text")
    val got = df.select(Bpe.segmentCountPortable(col("text"), merges))
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 2L, 3L)) // [aa,a], [aa,aa], [aa,aa,a]
    val kern = df.select(
        GraftFunctions.bpeCount(spark, col("text"), merges))
      .as[Long].collect().toSeq
    assert(kern == got)
  }

  test("kernel == portable fold-of-replace on the real corpus") {
    val docs = TestSpark.table("documents").limit(300)
    val merges = Bpe.mergeList(Bpe.train(docs, "text", merges = 8))
    assert(merges.length == 8)
    val both = docs.select(
        Bpe.segmentCountPortable(col("text"), merges).as("portable"),
        GraftFunctions.bpeCount(spark, col("text"), merges).as("kernel"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty && both.forall { case (p, k) => p == k })
    // merges COMPRESS: BPE count strictly below char count for real text
    val (bpe, chars) = docs.select(
        sum(GraftFunctions.bpeCount(spark, col("text"), merges)),
        sum(length(regexp_replace(col("text"), " ", ""))))
      .as[(Long, Long)].collect().head
    assert(bpe < chars)
  }

  test("non-BMP text: kernel == portable == trainer seed (code points, not code units)") {
    // emoji (U+1F600-range) and astral CJK (U+20000-range) are surrogate
    // PAIRS in UTF-16; each must seed as ONE symbol everywhere
    val astral = new String(Character.toChars(0x20BB7)) // 𠮷
    val emoji = "😀" // 😀
    val docs = Seq(
      s"$emoji$emoji $astral${astral}ab",
      s"ab$emoji ${astral}b $emoji",
      s"$emoji$astral $emoji$astral $emoji$astral").toDF("text")
    // no merges: count == code points per word (empty-merge parity)
    val seedCounts = docs.select(
        GraftFunctions.bpeCount(spark, col("text"), Nil).as("kernel"),
        Bpe.segmentCountPortable(col("text"), Nil).as("portable"))
      .as[(Long, Long)].collect()
    assert(seedCounts.toSeq == Seq((6L, 6L), (6L, 6L), (6L, 6L)))
    // train on the astral corpus and check three-way parity
    val merges = Bpe.mergeList(Bpe.train(docs, "text", merges = 3))
    assert(merges.nonEmpty)
    // a learned merge must pair whole code points — never a lone surrogate
    merges.foreach { case (l, r) =>
      Seq(l, r).foreach { s =>
        assert(!Character.isSurrogate(s.charAt(s.length - 1)) ||
          Character.isLowSurrogate(s.charAt(s.length - 1)) && s.length >= 2 &&
          Character.isHighSurrogate(s.charAt(s.length - 2)),
          s"merge side '$s' splits a surrogate pair")
      }
    }
    val both = docs.select(
        Bpe.segmentCountPortable(col("text"), merges).as("portable"),
        GraftFunctions.bpeCount(spark, col("text"), merges).as("kernel"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty && both.forall { case (p, k) => p == k })
    // the repeated emoji+astral bigram must actually compress
    val withM = docs.select(sum(
        GraftFunctions.bpeCount(spark, col("text"), merges)))
      .as[Long].collect().head
    assert(withM < 18L, s"merges must compress astral text, got $withM of 18 seeds")
  }

  test("merge spec roundtrip; empty merge list counts characters") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    assert(BpeCountKernel.parseSpec(BpeCountKernel.spec(merges)).toSeq ==
      Seq("l", "o", "lo", "w", "e", "r"))
    val df = Seq("low lower", "").toDF("text")
    val none = df.select(GraftFunctions.bpeCount(spark, col("text"), Nil))
      .as[Long].collect().toSeq
    assert(none == Seq(8L, 1L)) // chars per word; empty text = 1 empty word
    val withM = df.select(GraftFunctions.bpeCount(spark, col("text"), merges))
      .as[Long].collect().toSeq
    assert(withM == Seq(3L, 1L)) // [low] + [low, er]
  }

  test("vocabulary: hand-computed symbol frequencies; counts conserve tokens") {
    val df = Seq("low low low", "lower lower", "newest").toDF("text")
    val merges = Bpe.mergeList(Bpe.train(df, "text", merges = 4))
    // after (l,o)(lo,w)(e,r)(low,er): low→[low]×3, lower→[lower]×2
    // (merge 4 fuses it), newest→[n,e,w,e,s,t]
    val got = Bpe.vocabulary(df, "text", merges)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "low" -> 3L, "lower" -> 2L,
      "n" -> 1L, "e" -> 2L, "w" -> 1L, "s" -> 1L, "t" -> 1L))
    // total symbol occurrences == total BPE tokens of the corpus
    val totalViaCount = df.select(
        sum(Bpe.segmentCountPortable(col("text"), merges)))
      .as[Long].collect().head
    assert(got.values.sum == totalViaCount)
  }

  test("durable model: encoding from the stored merge table == direct") {
    val docs = TestSpark.table("documents").limit(200)
    val dir = TestSpark.tmpDir("bpe_model")
    Bpe.train(docs, "text", merges = 5).write.mode("overwrite").parquet(dir)
    val stored = Bpe.mergeList(spark.read.parquet(dir))
    val direct = Bpe.mergeList(Bpe.train(docs, "text", merges = 5))
    assert(stored == direct && stored.length == 5)
    val a = docs.select(GraftFunctions.bpeCount(spark, col("text"), stored))
      .as[Long].collect().toSeq
    val b = docs.select(GraftFunctions.bpeCount(spark, col("text"), direct))
      .as[Long].collect().toSeq
    assert(a == b)
  }

  test("BPE count kernel stays inside whole-stage codegen") {
    // a CodegenFallback here would force the WHOLE projection onto the
    // interpreted path; the static-call doGenCode keeps the stage fused
    val plan = TestSpark.table("documents")
      .select(GraftFunctions.bpeCount(spark, col("text"), Seq(("t", "h"))))
      .queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("graft_bpe_count") => w
    }
    assert(fused.nonEmpty, s"graft_bpe_count not inside WholeStageCodegen:\n$plan")
  }

  test("train: driver fast path == distributed loop (real corpus, ties included)") {
    // the r20 fast path must reproduce the loop's merge table
    // rank-for-rank: same overlapping pair counts, same (count desc,
    // UTF-8-byte left asc, right asc) tie-break, same greedy leftmost
    // application — checked on the real fixture corpus where ties and
    // multi-merge interactions actually occur
    val docs = TestSpark.table("documents").filter(col("text").isNotNull)
    val fast = Bpe.train(docs, "text", merges = 6)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    val saved = Bpe.bpeDriverMaxVocab
    val loop =
      try {
        Bpe.bpeDriverMaxVocab = 0L
        Bpe.train(docs, "text", merges = 6)
          .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      } finally Bpe.bpeDriverMaxVocab = saved
    assert(fast == loop, "driver fast path must equal the distributed loop")
    assert(fast.size == 6)
  }
}
