package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

class StatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("pName renders clean percentile column names") {
    assert(Stats.pName(0.5) == "p50")
    assert(Stats.pName(0.9) == "p90")
    assert(Stats.pName(0.999) == "p99_9")
    assert(Stats.pName(0.05) == "p5")
  }

  test("exact percentiles on a known tiny group") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10)).toDF("g", "v")
    val out = Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.5, 1.0))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out("a") == ((2.5, 4.0, 4L))) // median of 1..4 interpolates to 2.5
    assert(out("b") == ((10.0, 10.0, 1L)))
  }

  test("matches a sorted-array reference implementation on random data") {
    def ref(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * p
      val lo = s(math.floor(pos).toInt)
      val hi = s(math.ceil(pos).toInt)
      val raw = lo + (hi - lo) * (pos - math.floor(pos))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val data = Seq.tabulate(500)(i => (s"g${rnd.nextInt(4)}", rnd.nextInt(1000).toDouble))
      val df = data.toDF("g", "v")
      val out = Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.25, 0.9))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      data.groupBy(_._1).foreach { case (g, rows) =>
        val vs = rows.map(_._2)
        assert(out(g)._1 == ref(vs, 0.25), s"seed=$seed g=$g p25")
        assert(out(g)._2 == ref(vs, 0.9), s"seed=$seed g=$g p90")
      }
    }
  }

  test("null values are excluded from percentiles and n_rows") {
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(3)), ("a", None))
      .toDF("g", "v")
    val out = Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // nulls neither rank (which would select/shift order statistics) nor
    // count toward n — median of {1, 3} is 2
    assert(out("a") == ((2.0, 2L)))
  }

  test("approxPercentiles: exact when accuracy >= group size; same output shape") {
    val df = TestSpark.table("documents")
      .selectExpr("lang", "size(split(text, ' ')) AS n")
    val approx = Stats.approxPercentiles(df, Seq("lang"), "n", Seq(0.5, 0.9), accuracy = 100000)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Stats.exactPercentiles(df, Seq("lang"), "n", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (lang, a) =>
      val e = exact(lang)
      assert(a.getLong(3) == e.getLong(3), s"$lang n_rows")
      // GK at accuracy >= n returns true order statistics; the exact twin
      // interpolates between them, so approx must sit within one sample
      // of the interpolated value on each side
      for (i <- 1 to 2)
        assert(math.abs(a.getDouble(i) - e.getDouble(i)) <= 1.0,
          s"$lang p$i approx=${a.getDouble(i)} exact=${e.getDouble(i)}")
    }
  }

  test("approx and exact agree on the GROUP SET: all-null groups omitted by both") {
    val df = Seq(("a", Some(1)), ("a", Some(3)), ("b", None), ("b", None))
      .toDF("g", "v")
    val exact = Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.5))
      .select("g").as[String].collect().toSet
    val approx = Stats.approxPercentiles(df, Seq("g"), "v", Seq(0.5))
      .select("g").as[String].collect().toSet
    assert(exact == Set("a") && approx == Set("a"),
      "swapping exact <-> approx must never change which groups exist")
  }

  test("approxPercentiles: GK rank-error bound holds at coarse accuracy") {
    val rnd = new scala.util.Random(7)
    val data = Seq.tabulate(2000)(_ => ("g", rnd.nextInt(100000).toDouble))
    val df = data.toDF("g", "v")
    val accuracy = 20 // rank error <= n/accuracy = 100 ranks
    val sorted = data.map(_._2).sorted.toIndexedSeq
    val n = sorted.length
    val out = Stats.approxPercentiles(df, Seq("g"), "v", Seq(0.5, 0.9), accuracy)
      .collect()(0)
    for ((p, i) <- Seq(0.5 -> 1, 0.9 -> 2)) {
      val v = out.getDouble(i)
      // rank of the returned value in the true sorted data
      val rank = sorted.count(_ <= v)
      assert(math.abs(rank - p * n) <= n.toDouble / accuracy + 1,
        s"p=$p returned $v at rank $rank (target ${p * n})")
    }
  }

  test("approxPercentiles plan: bounded sketch state, partial aggregation, no sort") {
    val df = TestSpark.table("documents")
      .selectExpr("lang", "size(split(text, ' ')) AS n")
    val plan = Stats.approxPercentiles(df, Seq("lang"), "n", Seq(0.5, 0.99))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_percentile_approx"), s"map-side sketch partials:\n$plan")
    assert(!plan.contains("Sort"), s"sketch path must not sort:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"one exchange of sketch state, got $exchanges")
  }

  test("single shuffle: window and final aggregation share the group partitioning") {
    val df = TestSpark.table("documents")
      .selectExpr("lang", "size(split(text, ' ')) AS n")
    val plan = Stats.exactPercentiles(df, Seq("lang"), "n", Seq(0.5, 0.99))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
  }

  test("profile: exact counts/nulls/distincts, numeric min/max, null min/max for strings") {
    val df = Seq(
      (Some(1.5), Some("a"), 10L),
      (Some(2.5), None, 10L),
      (None, Some("b"), 20L),
      (Some(2.5), Some("a"), 30L)
    ).toDF("x", "s", "k")
    val out = Stats.profile(df, Seq("x", "s", "k"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("x", "s", "k"))
    val x = out("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 1 && x.getLong(3) == 2)
    assert(x.getDouble(4) == 1.5 && x.getDouble(5) == 2.5)
    val s = out("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5), "string columns carry no numeric min/max")
    val k = out("k")
    assert(k.getLong(2) == 0 && k.getLong(3) == 3)
    assert(k.getDouble(4) == 10.0 && k.getDouble(5) == 30.0)
  }

  test("profile runs ONE scan: the unpivot reads the materialized row, never the table") {
    val plan = Stats.profile(TestSpark.table("lineitem"), Seq("l_quantity", "l_returnflag"))
      .queryExecution.optimizedPlan.toString
    // the aggregate row is checkpointed, so the union branches contain
    // zero parquet relations — without the materialization each branch
    // re-executed the whole aggregate (measured 2 scans per column)
    assert(!plan.contains("Relation") && !plan.contains("parquet"),
      s"profile must not re-scan per column/metric:\n$plan")
  }

  test("approx profile: no Expand, exact metrics intact, distincts within HLL error") {
    val li = TestSpark.table("lineitem")
    val cols = Seq("l_quantity", "l_returnflag", "l_orderkey")
    // exact distincts duplicate the stream through Expand; HLL must not
    def aggPlan(approx: Boolean) = {
      val one = li.agg(
        count(lit(1)),
        cols.map(c => (if (approx) approx_count_distinct(col(c))
                       else count_distinct(col(c))).as(s"__$c")): _*)
      one.queryExecution.executedPlan.toString
    }
    assert(aggPlan(approx = false).contains("Expand"))
    assert(!aggPlan(approx = true).contains("Expand"),
      "approx_count_distinct must plan without the Expand duplication")

    val exact = Stats.profile(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Stats.profile(li, cols, approxDistinct = true).collect()
      .map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2),
        s"$c: row/null counts must stay exact")
      assert(a.isNullAt(4) == e.isNullAt(4) &&
        (a.isNullAt(4) || a.getDouble(4) == e.getDouble(4)), s"$c: min must stay exact")
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ad - ed) / ed < 0.1,
        s"$c: HLL estimate $ad vs exact $ed beyond 10%")
    }
  }

  test("giniConcentration: uniform = 0, extremes -> high, hand formula") {
    import TestSpark.spark.implicits._
    def gini(counts: Seq[(String, Int)]): Double =
      Stats.giniConcentration(
        counts.flatMap { case (g, n) => Seq.fill(n)(g) }.toDF("src"), "src")
        .collect().head.getDouble(2)
    // perfectly uniform mass -> 0
    assert(gini(Seq("a" -> 5, "b" -> 5, "c" -> 5)) == 0.0)
    // hand case: x = (1, 1, 8) ascending -> G = (2*(1+2+24) - 4*10)/(3*10)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gini(Seq("a" -> 8, "b" -> 1, "c" -> 1)) == r6(14.0 / 30))
    // more concentration -> strictly higher
    assert(gini(Seq("a" -> 98, "b" -> 1, "c" -> 1)) > gini(Seq("a" -> 8, "b" -> 1, "c" -> 1)))
  }

  test("trimmedStats: outliers dropped from the mean; trim count floor; nulls excluded") {
    import TestSpark.spark.implicits._
    // group g: 19 values of 100 + one 1e6 outlier -> n=20, cut=1
    // (floor(20*0.05)); trimmed mean drops the min (100) AND the
    // outlier, leaving 18×100
    val rows: Seq[(String, Option[Long])] =
      Seq.fill(19)(("g", Some(100L))) ++
        Seq(("g", Some(1000000L)), ("s", Some(7L)), ("s", Some(9L)),
          ("g", None))
    val df = rows.toDF("src", "v")
    val got = Stats.trimmedStats(df, "src", "v", trimFrac = 0.05)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val rawG = (19 * 100L + 1000000L).toDouble / 20
    assert(got("g") == ((20L, 2L, rawG, 100.0)))
    // a 2-row group trims nothing (floor(2*0.05) = 0): mean unchanged
    assert(got("s") == ((2L, 0L, 8.0, 8.0)))
    intercept[IllegalArgumentException] {
      Stats.trimmedStats(df, "src", "v", trimFrac = 0.5)
    }
  }

  test("benfordAudit: string-derived digits, exclusions, χ² arithmetic") {
    import TestSpark.spark
    import spark.implicits._
    // digits: 1 (×3: 1.0, 0.015, 123), 9 (×1), zero/null excluded;
    // negatives count by magnitude
    val df = Seq(Some(1.0), Some(0.015), Some(123.0), Some(-9.5),
      Some(0.0), None).toDF("v")
    val got = Stats.benfordAudit(df, "v")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L.toInt) == ((3L, 0.75)))
    assert(got(9) == ((1L, 0.25)))
    assert((2 to 8).forall(d => got(d)._1 == 0L))
    // χ² term for digit 1: (3 − e·4)²/(e·4), e = log10(2)
    val e1 = math.log10(2.0) * 4
    val chi1 = Stats.benfordAudit(df, "v")
      .filter(col("digit") === 1).head.getDouble(4)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(chi1 == r6((3 - e1) * (3 - e1) / e1))
  }

  test("hillTailIndex: hand logs, threshold ties contribute zero") {
    import TestSpark.spark
    import spark.implicits._
    // top-3 at k=2: (10e², 10e, 10) -> terms ln e² + ln e = 3,
    // H = 3/2, α = 2/3
    val df = Seq(10 * math.exp(2), 10 * math.E, 10.0, 5.0, 1.0).toDF("v")
    val r = Stats.hillTailIndex(df, "v", k = 2).head
    assert(r.getInt(0) == 2 && r.getDouble(1) == 10.0)
    assert(r.getDouble(2) == 1.5 && r.getDouble(3) == 0.666667)
    // all top values tied: every term is ln(1) = 0 -> H 0, α undefined
    val flat = Seq(8.0, 8.0, 8.0, 5.0).toDF("v")
    val f = Stats.hillTailIndex(flat, "v", k = 2).head
    assert(f.getDouble(2) == 0.0 && f.isNullAt(3))
    // zero/negative values are outside the estimator's domain
    val pos = Stats.hillTailIndex(
      Seq(-1.0, 0.0, 4.0, 2.0, 1.0).toDF("v"), "v", k = 2).head
    assert(pos.getDouble(1) == 1.0)
    intercept[IllegalArgumentException] {
      Stats.hillTailIndex(df, "v", k = 1)
    }
  }

  test("jackknifeRatio: hand buckets, zero-variance series, bias identity") {
    import TestSpark.spark
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // buckets (n, d): (2, 1), (4, 2), (6, 3) — every leave-one-out
    // ratio is exactly 2.0 -> zero variance, no bias
    val same = Seq((0L, 2.0, 1.0), (1L, 4.0, 2.0), (2L, 6.0, 3.0))
      .toDF("u", "n", "d")
    val s = Stats.jackknifeRatio(same, col("u"), "n", "d").head
    assert(s.getLong(0) == 3L)
    assert(s.getDouble(1) == 2.0 && s.getDouble(2) == 2.0 &&
      s.getDouble(3) == 0.0)
    // heterogeneous buckets: θ = 10/4; θ₍ᵦ₎ = {8/3, 9/3, 3/2}
    val mix = Seq((0L, 2.0, 1.0), (1L, 1.0, 1.0), (2L, 7.0, 2.0))
      .toDF("u", "n", "d")
    val m = Stats.jackknifeRatio(mix, col("u"), "n", "d").head
    val thetas = Seq(8.0 / 3, 9.0 / 3, 3.0 / 2)
    val tbar = thetas.sum / 3
    assert(m.getDouble(1) == 2.5)
    assert(math.abs(m.getDouble(2) - (3 * 2.5 - 2 * tbar)) < 2e-6)
    val va = (2.0 / 3) * thetas.map(t => (t - tbar) * (t - tbar)).sum
    assert(math.abs(m.getDouble(3) - math.sqrt(va)) < 2e-6)
  }
}
