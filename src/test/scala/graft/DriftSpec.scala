package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Diagnostics

class DriftSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("psi: identical snapshots score ~0; known shift scores the hand value") {
    val base = (1L to 100L).toDF("v")
    val same = Diagnostics.psi(base, base, "v", bins = 4)
      .agg(sum("psi_term")).head.getDouble(0)
    assert(math.abs(same) < 1e-9)

    // next concentrates everything in the top half: bins 0,1 empty
    val next = (51L to 100L).toDF("v")
    val terms = Diagnostics.psi(base, next, "v", bins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // base shares: bins 0..3 hold 25/100 each (edges: bin = floor((v-1)*4/99))
    assert(terms.forall(t => t._2 > 0.2 && t._2 < 0.3))
    // next: bins 0,1 floored at eps -> large positive psi terms
    assert(terms(0)._3 == 1e-6 && terms(1)._3 == 1e-6)
    assert(terms(0)._4 > 1.0) // 0.25 * ln(0.25/1e-6) ≈ 3.1 rounded per-term
    val total = terms.map(_._4).sum
    assert(total > 5.0, s"concentrated shift must alarm, got $total")
  }

  test("psi: out-of-range next values clamp to edge bins, nulls drop") {
    val base = (0L to 9L).toDF("v")
    val next = Seq(-100L, 100L, 5L).toDF("v")
      .unionByName(Seq(Option.empty[Long]).toDF("v"))
    val terms = Diagnostics.psi(base, next, "v", bins = 5)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getDouble(2)))
    // 3 non-null values: one in bin 0 (clamped), one in bin 4
    // (clamped), one mid -> next shares sum to 1
    assert(math.abs(terms.map(_._2).sum - 1.0) < 1e-6)
    assert(terms.head._2 > 0.3 && terms.last._2 > 0.3)
  }

  test("psi: constant base column does not vanish into a null bin") {
    val base = Seq(5L, 5L, 5L, 5L).toDF("v") // width-0 range
    // next drifts entirely above the constant -> top bin, huge PSI
    val next = Seq(9L, 9L, 9L, 5L).toDF("v")
    val terms = Diagnostics.psi(base, next, "v", bins = 5)
      .orderBy("bin").collect()
    assert(terms.length == 5) // every bin row present, nothing dropped
    val bin0 = terms.head
    val bin4 = terms.last
    assert(bin0.getDouble(1) == 1.0) // all base mass in bin 0
    assert(math.abs(bin4.getDouble(2) - 0.75) < 1e-9) // drifted next mass
    val psiTotal = terms.map(_.getDouble(3)).sum
    assert(psiTotal > 0.25, s"drift off a constant must alarm, got $psiTotal")
  }

  test("rateAnomalies: injected spike flags, steady rate does not, warm-up nulls") {
    import java.sql.Timestamp
    // 40 hours of a steady ~10 events/hour, then one 100-event spike
    val base = 1767225600000L // 2026-01-01T00:00:00Z
    val rows = (0 until 40).flatMap { h =>
      val n = if (h == 39) 100 else 10 + (h % 3) // mild jitter, huge spike
      (0 until n).map(_ =>
        ("click", new Timestamp(base + h * 3600000L + 600000L)))
    }
    val df = rows.toDF("event_type", "ts")
    val got = graft.ops.EventOps.rateAnomalies(df, "event_type", "ts",
        trailing = 24, zThreshold = 3.0)
      .orderBy("hour").collect()
    // first 2 hours lack a 2-point baseline -> null z
    assert(got.take(2).forall(_.isNullAt(3)))
    // the spike hour is anomalous; the steady hours are not
    val flagged = got.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.length == 1)
    assert(flagged.head.getAs[Long]("n") == 100L)
    assert(math.abs(flagged.head.getAs[Double]("z")) > 3.0)
  }

  test("rateAnomalies: a source going dark emits n=0 rows that alarm") {
    import java.sql.Timestamp
    val base = 1767225600000L // 2026-01-01T00:00:00Z
    // ~10-12/hour for 30 hours, then hours 30-32 DARK, then resume
    val rows = ((0 until 30) ++ (33 until 36)).flatMap { h =>
      (0 until (10 + h % 3)).map(_ =>
        ("ingest", new Timestamp(base + h * 3600000L + 60000L)))
    }
    val got = graft.ops.EventOps.rateAnomalies(rows.toDF("event_type", "ts"),
        "event_type", "ts", trailing = 24, zThreshold = 3.0)
      .orderBy("hour").collect()
    // the dense grid covers every hour in [0, 35] — gaps included
    assert(got.length == 36)
    val dark = got.slice(30, 33)
    assert(dark.forall(_.getAs[Long]("n") == 0L))
    // zero against a steady-10 trailing baseline is a sharp negative z
    assert(dark.forall(r => r.getAs[Double]("z") < -3.0 &&
      r.getAs[Boolean]("is_anomaly")))
    // and the trailing frame is wall-clock: resumed hours see the
    // zeros in their baseline (variance > 0, no false alarm on 10s)
    assert(!got(33).getAs[Boolean]("is_anomaly") ||
      got(33).getAs[Double]("z") > 0)
  }

  test("jsDivergence: identical corpora 0, disjoint corpora ln 2, hand case") {
    val a = Seq("x y", "x z").toDF("text")
    assert(Diagnostics.jsDivergence(a, a, "text").head.getDouble(0) == 0.0)
    val b = Seq("p q r s").toDF("text")
    assert(math.abs(Diagnostics.jsDivergence(a, b, "text").head.getDouble(0)
      - math.log(2)) < 1e-6)
    // hand case: a = {x:1/2, y:1/4, z:1/4}, c = {x:1/2, y:1/2}
    val c = Seq("x y").toDF("text")
    def kl(p: Map[String, Double], m: Map[String, Double]): Double =
      p.collect { case (t, pv) if pv > 0 => pv * math.log(pv / m(t)) }.sum
    val pa = Map("x" -> 0.5, "y" -> 0.25, "z" -> 0.25)
    val pc = Map("x" -> 0.5, "y" -> 0.5, "z" -> 0.0)
    val m = (pa.keySet ++ pc.keySet).map(t =>
      t -> (pa.getOrElse(t, 0.0) + pc.getOrElse(t, 0.0)) / 2).toMap
    val expect = (kl(pa, m) + kl(pc, m)) / 2
    val got = Diagnostics.jsDivergence(a, c, "text").head.getDouble(0)
    assert(math.abs(got - expect) < 1e-6, s"got $got expected $expect")
  }

  test("chiSquareDrift: hand terms, minCount fence, vanished token attributed, new token outside") {
    import TestSpark.spark.implicits._
    // base: aa×6 bb×6 cc×2 ; next: aa×2 bb×6 zz×4
    val base = Seq((1L, ("aa " * 6 + "bb " * 6 + "cc " * 2).trim)).toDF("doc_id", "text")
    val next = Seq((2L, ("aa " * 2 + "bb " * 6 + "zz " * 4).trim)).toDF("doc_id", "text")
    val got = Diagnostics.chiSquareDrift(base, next, "text",
        minCount = 5L, topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // fenced vocab {aa, bb}: bt = 12, nt = 8 (cc under fence; zz new)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val eAa = 8.0 * 6 / 12; val eBb = 8.0 * 6 / 12
    assert(got("aa") == ((6L, 2L, r6(eAa), r6((2 - eAa) * (2 - eAa) / eAa))))
    assert(got("bb") == ((6L, 6L, r6(eBb), r6((6 - eBb) * (6 - eBb) / eBb))))
    assert(!got.contains("cc"), "under the minCount fence")
    assert(!got.contains("zz"), "new tokens are jsDivergence's signal")
    // a token that VANISHES from next still gets a term (n_next = 0)
    val gone = Diagnostics.chiSquareDrift(base,
        Seq((3L, "bb bb")).toDF("doc_id", "text"), "text", 5L, 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(gone("aa") == 0L)
    intercept[IllegalArgumentException] {
      Diagnostics.chiSquareDrift(base, next, "text", minCount = 0L)
    }
  }

  test("ksStatistic: hand CDFs, smallest-value tie-break, nulls drop") {
    // F_a over {1,2,3,4}: .5 .75 1 1; F_b: 0 .25 .75 1
    // diffs: .5 .5 .25 0 -> D = .5 at the SMALLEST tied value (1)
    val a = Seq(1L, 1L, 2L, 3L).toDF("v")
    val b = Seq(2L, 3L, 3L, 4L).toDF("v")
    val r = Diagnostics.ksStatistic(a, b, "v").head
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 1.0)
    assert(r.getLong(2) == 4L && r.getLong(3) == 4L)
    // identical samples -> D = 0 (argmax falls to the smallest value)
    val same = Diagnostics.ksStatistic(a, a, "v").head
    assert(same.getDouble(0) == 0.0 && same.getDouble(1) == 1.0)
    // null values are excluded from both counts and CDFs
    val withNull = Seq(Some(1L), Some(1L), Some(2L), Some(3L), None).toDF("v")
    val rn = Diagnostics.ksStatistic(withNull, b, "v").head
    assert(rn.getDouble(0) == 0.5 && rn.getLong(2) == 4L)
  }

  test("embeddingCentroidDrift: hand means, orthogonal cosine, shift ranking") {
    val base = Seq((1L, Array(1f, 0f)), (2L, Array(3f, 0f)))
      .toDF("vec_id", "embedding")
    val next = Seq((3L, Array(0f, 2f)), (4L, Array(0f, 4f)))
      .toDF("vec_id", "embedding")
    // mean_base = [2, 0], mean_next = [0, 3] -> cosine 0; dim 1 shifts
    // most (3 > 2)
    val got = Diagnostics.embeddingCentroidDrift(base, next, "embedding",
        topK = 2)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1, 0.0, 3.0, 3.0, 0.0), (0, 2.0, 0.0, 2.0, 0.0)))
    // identical snapshots: cosine 1, zero shifts
    val same = Diagnostics.embeddingCentroidDrift(base, base, "embedding",
        topK = 1).head
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 1.0)
    intercept[IllegalArgumentException] {
      Diagnostics.embeddingCentroidDrift(base, next, "embedding", topK = 0)
    }
  }

  test("cramersV: perfect association = 1, independence = 0, 1-column null") {
    // perfect: every a maps to its own b (2×2, n = 4)
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val p = Diagnostics.cramersV(perfect, "a", "b").head
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == ((4L, 2L, 2L)))
    assert(p.getDouble(4) == 1.0)
    // independence: uniform 2×2 -> χ² = 0, V = 0 (and the densified
    // grid matters: remove one cell and V must rise above 0)
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val i = Diagnostics.cramersV(indep, "a", "b").head
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0)
    val sparse = Seq(("x", "p"), ("x", "q"), ("y", "p")).toDF("a", "b")
    assert(Diagnostics.cramersV(sparse, "a", "b").head.getDouble(4) > 0.0)
    // a single-category column: V undefined -> null
    val flat = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(Diagnostics.cramersV(flat, "a", "b").head.isNullAt(4))
  }
}
