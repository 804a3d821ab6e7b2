package graft

import org.apache.spark.sql.functions._
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

  test("stratifiedSample keeps ~the requested fraction per stratum, deterministically") {
    val documents = TestSpark.table("documents")
    val fr = Map("en" -> 0.9, "fr" -> 0.5, "es" -> 0.25, "de" -> 0.1, "zh" -> 0.05)
    val out = Sampling.stratifiedSample(documents, "lang", "doc_id", fr, salt = "mix1")
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fr.foreach { case (lang, f) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(rate - f) < 0.25,
        s"$lang kept $rate of ${totals(lang)} docs, wanted ~$f")
    }
    val rerun = Sampling.stratifiedSample(
      documents.repartition(7), "lang", "doc_id", fr, salt = "mix1")
    assert(out.select("doc_id").collect().toSet == rerun.select("doc_id").collect().toSet,
      "membership is a pure function of (salt, key) — partitioning-invariant")
  }

  test("raising a stratum's fraction strictly grows its sample (consistent mixture evolution)") {
    val documents = TestSpark.table("documents")
    def ids(f: Double) = Sampling.stratifiedSample(
      documents, "lang", "doc_id", Map("en" -> f), salt = "mix1")
      .select("doc_id").as[Long].collect().toSet
    val quarter = ids(0.25)
    val half = ids(0.5)
    assert(quarter.subsetOf(half), "fraction=0.25 must be a subset of fraction=0.5")
    assert(quarter.size < half.size)
  }

  test("strata missing from the fraction map keep defaultFraction") {
    val documents = TestSpark.table("documents")
    val dropped = Sampling.stratifiedSample(
      documents, "lang", "doc_id", Map("en" -> 1.0), salt = "s")
    assert(dropped.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"),
      "default 0.0 drops every other stratum")
    val kept = Sampling.stratifiedSample(
      documents, "lang", "doc_id", Map("en" -> 1.0), defaultFraction = 1.0, salt = "s")
    assert(kept.count() == documents.count())
  }

  test("mixtureWeights: α=1 reproduces natural proportions; α<1 flattens; fractions realize the target") {
    val docs = TestSpark.table("documents")
    val toks = graft.ops.TextOps.tokenCount(org.apache.spark.sql.functions.col("text"))
    val natural = Sampling.mixtureWeights(docs, "lang", toks, alpha = 1.0, targetUnits = 10000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val totalUnits = natural.values.map(_._1).sum.toDouble
    natural.foreach { case (lang, (n, w, _)) =>
      assert(math.abs(w - n / totalUnits) < 1e-6, s"$lang natural weight")
    }
    assert(math.abs(natural.values.map(_._2).sum - 1.0) < 1e-5, "weights normalize")

    val flat = Sampling.mixtureWeights(docs, "lang", toks, alpha = 0.3, targetUnits = 10000L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // flattening: the largest stratum loses weight, the smallest gains
    val big = natural.maxBy(_._2._1)._1
    val small = natural.minBy(_._2._1)._1
    assert(flat(big) < natural(big)._2 && flat(small) > natural(small)._2)

    // realized mixture ≈ target: Σ keep_fraction·n ≈ target (when no
    // stratum saturates at 1.0)
    if (natural.values.forall(_._3 < 1.0)) {
      val realized = natural.map { case (_, (n, _, f)) => n * f }.sum
      assert(math.abs(realized - 10000.0) / 10000.0 < 0.01, s"realized $realized")
    }
  }

  test("curriculumBins: quartiles per group, monotone in the metric, near-equal sizes") {
    import org.apache.spark.sql.functions.col
    val docs = TestSpark.table("documents")
    val out = Sampling.curriculumBins(
      docs, "lang", "doc_id", org.apache.spark.sql.functions.length(col("text")),
      nBins = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._4).toSet == Set(0L, 1L, 2L, 3L))
    // within a group, a doc in a lower bin never has a larger metric
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val byBin = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      byBin.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(byBin(a).max <= byBin(b).min + 1e-9, s"$lang bins $a/$b overlap")
        case _ =>
      }
      // quartiles: each bin holds ≤ ceil(n/4) + ties worth of rows
      val n = rows.size
      byBin.values.foreach(v => assert(v.size <= n / 2, s"$lang bin too large"))
    }
    // every doc got exactly one bin
    assert(out.length == docs.count())
  }

  test("curriculumBins approx mode: same shape, bins agree within sketch rank error") {
    import org.apache.spark.sql.functions.{col, length}
    val docs = TestSpark.table("documents")
    def bins(approx: Boolean) = Sampling.curriculumBins(
      docs, "lang", "doc_id", length(col("text")), nBins = 4, approx = approx)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val exact = bins(approx = false)
    val approxBins = bins(approx = true)
    assert(approxBins.keySet == exact.keySet, "one bin per doc either way")
    assert(approxBins.values.toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    // high accuracy at fixture scale: boundary drift may only move docs
    // NEAR a boundary — the overwhelming majority must agree exactly
    val disagree = exact.count { case (k, v) => approxBins(k) != v }
    assert(disagree.toDouble / exact.size < 0.05,
      s"$disagree of ${exact.size} docs changed bins")
  }

  test("clusterCapped: top-cap per family by (order desc, id), singletons always keep") {
    val docs = Seq(
      (1L, 100L), (2L, 300L), (3L, 200L), // cluster A (label 1)
      (10L, 50L), (11L, 50L), // cluster B (label 10) — order tie → id
      (20L, 10L), (21L, 999L) // singletons
    ).toDF("doc_id", "n_chars")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "label")
    val got = Sampling.clusterCapped(docs, "doc_id", labels, cap = 2, orderCol = "n_chars")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 7, "every doc keeps a row")
    // cluster A keeps the two longest (2: 300, 3: 200), drops 1 (100)
    assert(got(2L) == ((1L, true)) && got(3L) == ((1L, true)) && got(1L) == ((1L, false)))
    // order tie broken by id ascending — both fit under cap=2 anyway
    assert(got(10L) == ((10L, true)) && got(11L) == ((10L, true)))
    assert(got(20L) == ((20L, true)) && got(21L) == ((21L, true)))
    // cap=1 reduces to hard dedup: exactly one keeper per family
    val hard = Sampling.clusterCapped(docs, "doc_id", labels, cap = 1, orderCol = "n_chars")
      .as[(Long, Long, Boolean)].collect()
    assert(hard.filter(r => r._2 == 1L && r._3).map(_._1).toSeq == Seq(2L))
  }

  test("clusterAwareSplit: no cluster straddles a split; singletons match plain hashSplit") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 500).select(col("id").as("doc_id"))
    // clusters of 3: representative r, members r+1, r+2, for r in 0,30,60…
    val labels = spark.range(0, 500, 30)
      .select(explode(array(col("id"), col("id") + 1, col("id") + 2)).as("id"),
        col("id").as("label"))
    val splits = Sampling.clusterAwareSplit(
      docs, "doc_id", labels, Seq(0.6, 0.2, 0.2), salt = "s1")
    val tagged = splits.zipWithIndex
      .map { case (d, i) => d.select(col("doc_id"), lit(i).as("split")) }
      .reduce(_.unionByName(_))
    // disjoint + covering
    assert(tagged.count() == 500)
    assert(tagged.select("doc_id").distinct().count() == 500)
    // INTEGRITY: every cluster's members share one split
    val straddling = tagged.join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .groupBy("label").agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddling == 0, "a near-dup cluster crossed the train/test fence")
    // a doc in NO cluster splits exactly as plain hashSplit on its own id
    val singletonIds = tagged.join(labels.withColumnRenamed("id", "doc_id"),
      Seq("doc_id"), "left_anti")
    val plain = Sampling.hashSplit(
        singletonIds.select("doc_id"), "doc_id", Seq(0.6, 0.2, 0.2), salt = "s1")
      .zipWithIndex.map { case (d, i) => d.select(col("doc_id"), lit(i).as("p")) }
      .reduce(_.unionByName(_))
    val diverged = singletonIds.join(plain, Seq("doc_id"))
      .filter(col("split") =!= col("p")).count()
    assert(diverged == 0, "singleton routing must equal hashSplit")
    // original columns come back untouched (helper columns dropped)
    assert(splits.head.columns.toSeq == Seq("doc_id"))
  }

  test("tokenBudgetSelect: full bins keep, threshold bin spends remainder in id order, nulls never keep") {
    import org.apache.spark.sql.functions._
    val docs = Seq[(Long, Option[Double], Long)](
      (1L, Some(0.95), 10L), // bin 9
      (2L, Some(0.95), 10L), // bin 9
      (3L, Some(0.85), 5L),  // bin 8, earliest id
      (4L, Some(0.85), 10L), // bin 8
      (5L, Some(0.55), 100L), // bin 5
      (6L, None, 7L)          // no score — never kept
    ).toDF("doc_id", "q", "tok")
    // budget 27: bin 9 (mass 20) keeps fully; bin 8 is the threshold
    // with remainder 7 — id 3 (run 5) fits, id 4 (run 15) does not;
    // bin 5 and the null row drop
    val got = Sampling.tokenBudgetSelect(docs, "doc_id", "q", "tok", budget = 27L, bins = 10)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> false))
    // a huge budget keeps every scored row, never the null one
    val all = Sampling.tokenBudgetSelect(docs, "doc_id", "q", "tok", budget = 1000L, bins = 10)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(all == Map(1L -> true, 2L -> true, 3L -> true,
      4L -> true, 5L -> true, 6L -> false))
    // zero budget keeps nothing; kept token mass never exceeds budget
    val none = Sampling.tokenBudgetSelect(docs, "doc_id", "q", "tok", budget = 0L, bins = 10)
      .filter(col("keep")).count()
    assert(none == 0)
    // invariant on real data: kept mass <= budget, and greedy-by-bin
    // optimality — no dropped bin outranks a kept one
    val corpus = TestSpark.table("documents").select(
      col("doc_id"),
      graft.ops.TextOps.qualityScore(col("text")).as("q"),
      graft.functions.GraftFunctions.tokenCount(spark, col("text")).as("tok"))
    val sel = Sampling.tokenBudgetSelect(corpus, "doc_id", "q", "tok", budget = 5000L)
    val keptMass = sel.filter(col("keep")).agg(sum("tok")).collect()(0).getLong(0)
    assert(keptMass <= 5000L)
    // bin comparison clamps like the op does (q == 1.0 → top bin 99)
    val maxDroppedQ = sel.filter(!col("keep")).agg(max("q")).collect()(0).getDouble(0)
    val minKeptBin = sel.filter(col("keep"))
      .agg(min(least(floor(col("q") * 100), lit(99L)))).collect()(0).getLong(0)
    assert(math.min(math.floor(maxDroppedQ * 100).toLong, 99L) <= minKeptBin,
      "a dropped doc outranked a kept bin")
  }

  test("excessLossWeights: exact softmax, hardest group dominates, weights sum to 1") {
    val scored = Seq(
      ("easy", 1.0), ("easy", 2.0), // mean 1.5
      ("mid", 3.0), ("mid", 4.0), // mean 3.5
      ("hard", 6.0), ("hard", 8.0) // mean 7.0
    ).toDF("source", "nll")
    val got = Sampling.excessLossWeights(scored, "source", "nll", temperature = 1.0)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val e = Map("easy" -> math.exp(0.0), "mid" -> math.exp(2.0), "hard" -> math.exp(5.5))
    val z = e.values.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("easy") == ((1.5, r6(e("easy") / z))))
    assert(got("mid") == ((3.5, r6(e("mid") / z))))
    assert(got("hard") == ((7.0, r6(e("hard") / z))))
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-5)
    // colder temperature concentrates mass on the hardest group
    val cold = Sampling.excessLossWeights(scored, "source", "nll", temperature = 0.25)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(cold("hard") > got("hard")._2)
  }

  test("weightedSample: deterministic ES keys, weight bias, invariances") {
    val df = (0L until 400L).map(i => (i, s"g${i % 2}",
      if (i % 2 == 0) 9.0 else 1.0)).toDF("id", "grp", "w")
    val take = Sampling.weightedSample(df, "id", "w", k = 50, salt = "t",
        strataCol = Some("grp"))
      .select("id").as[Long].collect().toSet
    assert(take.size == 100) // 50 per stratum (each stratum has 200 rows)
    // identical under repartitioning (pure function of salt+key+weight)
    val take2 = Sampling.weightedSample(df.repartition(13), "id", "w", 50,
        salt = "t", strataCol = Some("grp"))
      .select("id").as[Long].collect().toSet
    assert(take2 == take)
    // a GLOBAL k=50 over the same frame: the heavy-weight group (w=9)
    // must dominate the sample
    val global = Sampling.weightedSample(df, "id", "w", k = 50, salt = "t")
      .select("id").as[Long].collect()
    assert(global.length == 50)
    val heavy = global.count(_ % 2 == 0)
    assert(heavy > 35, s"w=9 rows should dominate, got $heavy/50")
    // null / non-positive weights never sample
    // NaN is a live trap here: Spark orders NaN above every numeric,
    // so an unguarded `w > 0` admits it and its NaN key tops the rank
    import org.apache.spark.sql.functions.{col, lit, when}
    val bad = Seq((1L, "g", 1.0), (2L, "g", 0.0), (3L, "g", -1.0),
      (4L, "g", 2.0), (5L, "g", Double.NaN)).toDF("id", "grp", "w")
      .withColumn("w", when(col("id") === 1L, lit(null)).otherwise(col("w")))
    val kept = Sampling.weightedSample(bad, "id", "w", 10, "t", Some("grp"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(4L))
  }

  test("softDedupWeights: 1/|cluster| per member, singletons weigh 1") {
    // clusters: {1,2,3} labeled 1, {5,6} labeled 5; 4 and 9 singleton
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L).toDF("doc_id")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "label")
    val got = Sampling.softDedupWeights(docs, "doc_id", labels)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0.333333), (2L, 1L, 0.333333), (3L, 1L, 0.333333),
      (4L, 4L, 1.0), (5L, 5L, 0.5), (6L, 5L, 0.5), (9L, 9L, 1.0)))
    // total mass = one unit per cluster-or-singleton (up to rounding)
    val mass = got.toSeq.map(_._3).sum
    assert(math.abs(mass - 4.0) < 1e-4)
    // and the weights feed the ES sampler directly: every stratum
    // draw is weight-eligible (no nulls/zeros from the weighting)
    val sampled = Sampling.weightedSample(
      Sampling.softDedupWeights(docs, "doc_id", labels),
      "doc_id", "weight", k = 3, salt = "sd")
    assert(sampled.count() == 3)
  }

  test("unimaxAllocation: hand-computed water-fill — tails cap, head absorbs the remainder") {
    // per-doc rows aggregate to a=10, b=20, c=100 tokens; epochCap 2
    // -> capacities 20, 40, 200; budget 100: ascending r = (100/3,
    // (100-20)/2, (100-60)/1) = (33.3, 40, 40) -> theta 40; allocs
    // (20, 40, 40), sum exactly the budget
    val docs = Seq(("a", 4L), ("a", 6L), ("b", 20L), ("c", 70L), ("c", 30L))
      .toDF("lang", "toks")
    val got = Sampling.unimaxAllocation(docs, "lang", col("toks"),
        budget = 100L, epochCap = 2.0)
      .select("lang", "n_tokens", "alloc_tokens", "sample_rate")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a", 10L, 20.0, 2.0),      // capped: full 2 epochs
      ("b", 20L, 40.0, 2.0),      // capped exactly at the water level
      ("c", 100L, 40.0, 0.4)))    // head: budget-limited below 1 epoch
    assert(got.map(_._3).sum == 100.0, "allocations exhaust the budget")
  }

  test("unimaxAllocation: surplus budget degrades to the epoch caps; bad args rejected") {
    val docs = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("lang", "toks")
    val got = Sampling.unimaxAllocation(docs, "lang", col("toks"),
        budget = 10000L, epochCap = 2.0)
      .select("lang", "alloc_tokens", "sample_rate")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 20.0, 2.0), ("b", 40.0, 2.0), ("c", 200.0, 2.0)),
      "when the budget exceeds total capacity every language caps")
    // partitioning invariance: |langs|-row arithmetic is layout-free
    val p2 = Sampling.unimaxAllocation(docs.repartition(2), "lang",
      col("toks"), budget = 100L, epochCap = 2.0).collect().map(_.toSeq).toSet
    val p5 = Sampling.unimaxAllocation(docs.repartition(5), "lang",
      col("toks"), budget = 100L, epochCap = 2.0).collect().map(_.toSeq).toSet
    assert(p2 == p5)
    intercept[IllegalArgumentException] {
      Sampling.unimaxAllocation(docs, "lang", col("toks"), budget = 0L, epochCap = 2.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.unimaxAllocation(docs, "lang", col("toks"), budget = 10L, epochCap = 0.0)
    }
  }

  test("largestRemainderAllocation: integer quotas sum exactly to seats") {
    import TestSpark.spark
    import spark.implicits._
    // counts a=5, b=3, c=2 over 7 seats: quotas 3.5/2.1/1.4 → base
    // 3/2/1 (6), one leftover goes to the largest remainder (a: .5)
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("g")
    val got = Sampling.largestRemainderAllocation(df, "g", seats = 7L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((3L, 1L, 4L)))
    assert(got("b") == ((2L, 0L, 2L)))
    assert(got("c") == ((1L, 0L, 1L)))
    assert(got.values.map(_._3).sum == 7L, "allocations sum to seats")
    // remainder ties break on the group ascending
    val tied = (Seq.fill(1)("x") ++ Seq.fill(1)("y")).toDF("g")
    val t = Sampling.largestRemainderAllocation(tied, "g", seats = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(t == Map("x" -> 2L, "y" -> 1L))
    intercept[IllegalArgumentException] {
      Sampling.largestRemainderAllocation(df, "g", seats = 0L)
    }
  }
}
