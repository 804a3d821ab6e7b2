package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bloom

class BloomSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("bits: every inserted key passes mightContain (no false negatives, ever)") {
    val keys = (1L to 500L).map(_ * 7919).toDF("k")
    val bitsArr = Bloom.bits(keys, "k", numBits = 1 << 12, numHashes = 5)
      .collect()(0).getSeq[Long](0)
    val misses = keys
      .filter(!Bloom.mightContain(typedlit(bitsArr), $"k", 1 << 12, 5))
      .count()
    assert(misses == 0, "bloom filters never have false negatives")
  }

  test("false-positive rate is near the theoretical bound") {
    val n = 500
    val m = 1 << 13
    val h = 5
    val keys = (1L to n.toLong).toDF("k")
    val bitsArr = Bloom.bits(keys, "k", m, h).collect()(0).getSeq[Long](0)
    val probes = ((n + 1).toLong to (n + 5000).toLong).toDF("k")
    val fp = probes.filter(Bloom.mightContain(typedlit(bitsArr), $"k", m, h)).count()
    // theoretical fpp ≈ (1 - e^(-hn/m))^h ≈ 0.22% at these parameters;
    // allow generous slack for hash variance
    assert(fp.toDouble / 5000 < 0.02, s"fp rate ${fp / 5000.0} far above bound")
  }

  test("prunedSemiJoin is bit-identical to a plain semi-join") {
    val lineitem = TestSpark.table("lineitem")
    val hot = TestSpark.table("orders")
      .filter($"o_totalprice" > 300000.0).select("o_orderkey")
    val pruned = Bloom.prunedSemiJoin(lineitem, "l_orderkey", hot, "o_orderkey")
      .select("l_orderkey", "l_linenumber").collect().toSet
    val plain = lineitem
      .join(hot, lineitem("l_orderkey") === hot("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(pruned == plain)
    assert(plain.nonEmpty, "fixture must exercise the match path")
  }

  test("plan shape: the bloom probe is a literal filter BELOW the join exchange on the big side") {
    val lineitem = TestSpark.table("lineitem")
    val hot = TestSpark.table("orders")
      .filter($"o_totalprice" > 300000.0).select("o_orderkey")
    val plan = Bloom.prunedSemiJoin(lineitem, "l_orderkey", hot, "o_orderkey")
      .queryExecution.executedPlan.toString
    // the probe compiles to element_at(<literal array>, …) bit tests
    assert(plan.contains("element_at"), "bloom probe missing from the plan")
    val lines = plan.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("LeftSemi"))
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("element_at"))
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "bloom filter must sit under the semi-join (pruning before the exchange)")
    // and no broadcast-nested-loop reordering pathology
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("empty key set → all-zero bits → everything pruned (still exact)") {
    val lineitem = TestSpark.table("lineitem")
    val none = TestSpark.table("orders")
      .filter($"o_totalprice" > 1e12).select("o_orderkey")
    assert(Bloom.prunedSemiJoin(lineitem, "l_orderkey", none, "o_orderkey").count() == 0)
  }

  test("fprCalibration: measured FPR sits in the theory band, edges behave") {
    import TestSpark.spark
    import spark.implicits._
    val insert = (1L to 400L).toDF("key")
    val probe = (10001L to 12000L).toDF("key")
    val r = Bloom.fprCalibration(insert, probe, "key",
      numBits = 4096, numHashes = 3).head
    assert(r.getLong(0) == 400L && r.getLong(1) == 2000L)
    assert(r.getLong(4) > 0L && r.getLong(4) <= 1200L) // <= k·n bits set
    val (measured, fill, theory) =
      (r.getDouble(6), r.getDouble(7), r.getDouble(8))
    // k=3, n=400, m=4096: theory ≈ 1.6% — measured within a loose band
    assert(theory > 0.005 && theory < 0.05)
    assert(measured >= 0.0 && measured < 5 * theory + 0.01,
      s"measured $measured wildly off theory $theory")
    assert(fill > 0 && fill < 0.05)
    // probes that ARE inserted are excluded: an all-overlapping probe
    // set measures nothing (0 probes -> NaN guarded upstream by data,
    // here just assert the disjointness filter)
    val overlap = Bloom.fprCalibration(insert, insert, "key",
      numBits = 4096, numHashes = 3).head
    assert(overlap.getLong(1) == 0L)
    intercept[IllegalArgumentException] {
      Bloom.fprCalibration(insert, probe, "key", numBits = 32,
        numHashes = 3)
    }
  }
}
