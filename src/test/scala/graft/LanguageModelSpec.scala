package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LanguageModel

class LanguageModelSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("unigram NLL: rare-token docs score higher than common-token docs; exact on a known corpus") {
    // corpus: "a" appears 6×, "b" 2×, "z" 1× of N=9 tokens
    val df = Seq(
      (1L, "a a a"),
      (2L, "a a a"),
      (3L, "b b z")).toDF("doc_id", "text")
    val out = LanguageModel.meanNegLogLik(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 9.0
    def nll(ps: Seq[Double]) =
      BigDecimal(ps.map(p => -math.log(p)).sum / ps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == nll(Seq(6 / n, 6 / n, 6 / n)))
    assert(out(1L) == out(2L), "identical docs score identically")
    assert(out(3L) == nll(Seq(2 / n, 2 / n, 1 / n)))
    assert(out(3L) > out(1L), "rarer tokens → higher NLL")
  }

  test("broadcast and shuffle vocab paths agree") {
    val docs = TestSpark.table("documents").limit(100)
    def run(b: Boolean) = LanguageModel.meanNegLogLik(docs, "text", "doc_id", broadcastVocab = b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(true) == run(false))
  }

  test("held-out scoring: exact Laplace smoothing, OOV scores highest") {
    // model corpus: "a"×6, "b"×3 → N=9, V=2
    val model = LanguageModel.unigramCounts(
      Seq((1L, "a a a a a a"), (2L, "b b b")).toDF("doc_id", "text"), "text")
    val batch = Seq(
      (10L, "a a"),   // common tokens
      (11L, "b q")).toDF("doc_id", "text") // q is OOV → c=0
    val out = LanguageModel.scoreHeldOut(model, batch, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def nll(cs: Seq[Long]) = {
      val raw = cs.map(c => -math.log((c + 1).toDouble / 11.0)) // N+V = 11
      BigDecimal(raw.sum / raw.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(10L) == nll(Seq(6L, 6L)))
    assert(out(11L) == nll(Seq(3L, 0L)))
    assert(out(11L) > out(10L), "OOV-bearing doc scores higher")
  }

  test("scoring is partitioning-invariant (rounded sums absorb order)") {
    def run(parts: Int) = LanguageModel.meanNegLogLik(
      TestSpark.table("documents").repartition(parts), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(3) == run(23))
  }
}
