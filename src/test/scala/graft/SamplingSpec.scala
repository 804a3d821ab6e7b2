package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs = TestSpark.table("documents").select("doc_id")

  test("hashSplit: disjoint, covering, deterministic, roughly proportional") {
    val total = docs.count()
    val splits = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1), "s1")
    val sets = splits.map(_.as[Long].collect().toSet)
    assert(sets.map(_.size.toLong).sum == total, "covering")
    assert(sets.combinations(2).forall { case Seq(a, b) => a.intersect(b).isEmpty }, "disjoint")
    assert(math.abs(sets(0).size.toDouble / total - 0.8) < 0.1, "≈80% train")
    val again = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1), "s1")
      .map(_.as[Long].collect().toSet)
    assert(sets == again, "pure function of the key")
  }

  test("deterministicSample: growing the fraction keeps earlier members (consistency)") {
    val s25 = Sampling.deterministicSample(docs, "doc_id", 0.25, "s1").as[Long].collect().toSet
    val s50 = Sampling.deterministicSample(docs, "doc_id", 0.5, "s1").as[Long].collect().toSet
    assert(s25.subsetOf(s50))
    assert(s25.nonEmpty && s50.size > s25.size)
  }

  test("salt decorrelates sampling decisions") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.5, "saltA").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.5, "saltB").as[Long].collect().toSet
    assert(a != b)
    val overlap = a.intersect(b).size.toDouble / math.max(a.size, 1)
    assert(overlap > 0.3 && overlap < 0.7, s"independent-ish overlap, got $overlap")
  }

  test("last bucket is unbounded above (covering even when cum sum < 1 or hash == 1)") {
    // the final split must filter only on the lower fence — a `pos < hi`
    // upper fence would silently drop keys hashing into [cum_last, 1]
    val splits = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1), "s1")
    val lastPlan = splits.last.queryExecution.analyzed.toString
    assert(!lastPlan.contains("<"), s"last bucket must have no upper bound:\n$lastPlan")
    // non-last buckets keep both fences (disjointness)
    assert(splits.head.queryExecution.analyzed.toString.contains("<"))
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException](
      Sampling.hashSplit(docs, "doc_id", Seq(0.5, 0.2), "s"))
  }
}
