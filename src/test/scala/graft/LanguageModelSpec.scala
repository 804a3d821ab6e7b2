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

  test("hashed grams: unigrams + bigrams, short-doc floor") {
    val df = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val counts = LanguageModel.hashedGrams(df, "text", "doc_id", dims = 64)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) == 5L, "3 unigrams + 2 bigrams")
    // wordShingles' 1-element floor: a 1-token doc's bigram list is
    // [token] — 1 unigram + 1 floored 'bigram' (mirrored in the oracle)
    assert(counts(2L) == 2L)
  }

  test("DSIR importance weights: exact smoothed log-ratio against an independent replay") {
    // replay the formula with plain Scala maps over the operator's own
    // bucket assignments (the bucket hash itself is cross-engine-checked
    // by q79's oracle); checks smoothing, normalization, per-instance
    // association and rounding
    val raw = Seq(
      (1L, "spark scala engine"),
      (2L, "le chat noir"),
      (3L, "spark le engine")).toDF("doc_id", "text")
    val target = raw.filter($"doc_id" === 1L)
    val dims = 32
    val grams = LanguageModel.hashedGrams(raw, "text", "doc_id", dims)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tgt = grams.filter(_._1 == 1L).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val all = grams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (tn, rn) = (tgt.values.sum.toDouble, all.values.sum.toDouble)
    val expected = grams.groupBy(_._1).map { case (id, gs) =>
      val s = gs.map { case (_, b) =>
        math.log((tgt.getOrElse(b, 0L) + 1).toDouble / (tn + dims)) -
          math.log((all(b) + 1).toDouble / (rn + dims))
      }.sum
      id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = LanguageModel.importanceWeights(raw, target, "text", "doc_id", dims)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == expected)
    assert(out(1L) > out(2L), "the target doc itself outranks off-target text")
  }

  test("DSIR weights favor target-like docs and are partitioning-invariant") {
    val docs = TestSpark.table("documents")
    def run(parts: Int) = LanguageModel.importanceWeights(
      docs.repartition(parts), docs.filter($"lang" === "en"),
      "text", "doc_id", dims = 128)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = run(5)
    assert(w == run(29))
    // aggregate separation: the en slice (the target itself) must
    // average a higher importance weight than the rest of the corpus
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, rest) = w.partition { case (id, _) => langs(id) == "en" }
    val avg = (m: Map[Long, Double]) => m.values.sum / m.size
    assert(avg(en) > avg(rest),
      "target-language docs must outrank the rest on average")
  }

  test("naive bayes: separable classes recovered; decision frame total; deterministic") {
    // class A docs are all-'x y' text, class B all-'p q' — trivially
    // separable even through 128 hash buckets
    val train = Seq(
      (0L, "x y x y x", "A"), (2L, "y x y x y", "A"), (4L, "x x y y x", "A"),
      (6L, "p q p q p", "B"), (8L, "q p q p q", "B"), (10L, "p p q q p", "B"))
      .toDF("doc_id", "text", "lang")
    val test = Seq((1L, "x y x"), (3L, "q p q"), (5L, "y y x x")).toDF("doc_id", "text")
    val got = LanguageModel.naiveBayesClassify(
        train, test, "text", "doc_id", "lang", dims = 128)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "A", 3L -> "B", 5L -> "A"))
    // rerun is bit-identical (pure aggregation, no sampling anywhere)
    val again = LanguageModel.naiveBayesClassify(
        train, test, "text", "doc_id", "lang", dims = 128)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val first = LanguageModel.naiveBayesClassify(
        train, test, "text", "doc_id", "lang", dims = 128)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(again == first)
  }

  test("naive bayes model survives the parquet roundtrip (stored-model scoring == direct)") {
    val train = Seq(
      (0L, "x y x y x", "A"), (2L, "y x y x y", "A"),
      (6L, "p q p q p", "B"), (8L, "q p q p q", "B"))
      .toDF("doc_id", "text", "lang")
    val test = Seq((1L, "x y x"), (3L, "q p q")).toDF("doc_id", "text")
    val dir = TestSpark.tmpDir("nb_model")
    LanguageModel.naiveBayesModel(train, "text", "lang", dims = 128)
      .write.mode("overwrite").parquet(dir)
    val stored = LanguageModel.naiveBayesScore(
        spark.read.parquet(dir), test, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val direct = LanguageModel.naiveBayesClassify(
        train, test, "text", "doc_id", "lang", dims = 128)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(stored == direct)
    // the model table is the complete classes×dims grid
    assert(spark.read.parquet(dir).count() == 2L * 128L)
    // a pruned/compacted model (rows dropped before persisting) must be
    // rejected: dims is inferred from max(bucket), so an incomplete grid
    // would silently shrink the hash space and misbucket every gram
    val pruned = spark.read.parquet(dir)
      .filter(!($"cls" === "A" && $"bucket" === 0L))
    assert(pruned.count() == 2L * 128L - 1, "fixture must actually prune a row")
    val err = intercept[IllegalArgumentException] {
      LanguageModel.naiveBayesScore(pruned, test, "text", "doc_id").collect()
    }
    assert(err.getMessage.contains("complete classes"))
  }

  test("bigram NLL: exact on a known corpus; order sensitivity; short docs excluded") {
    // corpus bigrams: doc1 'a b','b a','a b' doc2 'b a' doc3 none (1 token)
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "z")).toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(df, "text", "doc_id", lambda = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // counts: unigrams a×3 b×3 z×1 (N=7, V=3); bigrams 'a b'×2, 'b a'×2
    val n = 7.0; val v = 3.0
    def p(bc: Long, c1: Long, c2: Long) =
      0.75 * ((bc + 1.0) / (c1 + v)) + 0.25 * ((c2 + 1.0) / (n + v))
    def nll(ps: Seq[Double]) =
      BigDecimal(ps.map(x => -math.log(x)).sum / ps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == nll(Seq(p(2, 3, 3), p(2, 3, 3), p(2, 3, 3))))
    assert(out(2L) == nll(Seq(p(2, 3, 3))))
    assert(!out.contains(3L), "single-token docs have no bigram positions")
    // order sensitivity: same token BAG, different order — the doc
    // whose bigrams are rarer in the corpus must score strictly higher
    // (a unigram model scores these two identically)
    val shuffled = Seq((1L, "a a b b"), (2L, "a b a b")).toDF("doc_id", "text")
    val s = LanguageModel.bigramNll(shuffled, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > s(2L), "rare-bigram ordering must score higher")
  }

  test("Kneser-Ney: exact on a known corpus; continuation effect that add-one interpolation cannot express") {
    // f and m both occur 4x (equal unigram frequency), but f only ever
    // follows s or q (pre=2) while m follows four distinct contexts
    // (pre=4) — the "San Francisco" setup. d7/d8 are singleton bigrams
    // with the SAME history q, so add-one interpolation scores them
    // identically; KN's continuation unigram separates them.
    val df = Seq(
      (1L, "s f"), (2L, "s f"), (3L, "s f"),
      (4L, "a m"), (5L, "b m"), (6L, "c m"),
      (7L, "q f"), (8L, "q m"),
      (9L, "z")).toDF("doc_id", "text")
    val out = LanguageModel.kneserNeyNll(df, "text", "doc_id", discount = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // bigram types: s-f(3) a-m(1) b-m(1) c-m(1) q-f(1) q-m(1); B=6
    // hist: s h=3 fert=1; a/b/c h=1 fert=1; q h=2 fert=2
    // cont: pre(f)=2, pre(m)=4
    val b = 6.0
    def p(bc: Long, h: Long, fert: Long, pre: Long) =
      math.max(bc - 0.75, 0.0) / h + 0.75 * fert / h * (pre / b)
    def nll(ps: Seq[Double]) =
      BigDecimal(ps.map(x => -math.log(x)).sum / ps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == nll(Seq(p(3, 3, 1, 2))))
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(4L) == nll(Seq(p(1, 1, 1, 4))))
    assert(out(7L) == nll(Seq(p(1, 2, 2, 2))))
    assert(out(8L) == nll(Seq(p(1, 2, 2, 4))))
    assert(!out.contains(9L), "single-token docs have no bigram positions")
    // the effect: same history, same bigram count, same unigram
    // frequency of the next word — KN ranks the low-diversity
    // continuation (f) strictly worse...
    assert(out(7L) > out(8L),
      "continuation diversity must separate equal-frequency next words")
    // ...while the add-one interpolated model provably ties them
    val addOne = LanguageModel.bigramNll(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(addOne(7L) == addOne(8L),
      "fixture must hit the add-one blind spot it claims to")
  }

  test("PMI collocations: exact arithmetic; chance-level pairs score ~0; minCount fences singletons") {
    // "san francisco" always co-occurs (4 of 12 positions); "the" pairs
    // with everything (chance-level); "rare gem" occurs once
    val df = Seq(
      (1L, "san francisco the a"), (2L, "san francisco the b"),
      (3L, "san francisco the c"), (4L, "san francisco rare gem"))
      .toDF("doc_id", "text")
    val all = LanguageModel.pmiCollocations(df, "text", minCount = 1L, topK = 50)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // 12 bigram positions total; "san francisco": pair 4, left(san) 4,
    // right(francisco) 4 -> pmi = ln(4*12/(4*4)) = ln 3
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(all("san francisco") == ((4L, 4L, 4L, r6(math.log(3.0)))))
    // "francisco the": pair 3, left 4, right 3 -> ln(3*12/12) = ln 3
    assert(all("francisco the") == ((3L, 4L, 3L, r6(math.log(3.0)))))
    assert(all("rare gem")._4 == r6(math.log(12.0)),
      "singleton of two rare words maxes PMI — the pathology minCount fences")
    val fenced = LanguageModel.pmiCollocations(df, "text", minCount = 3L, topK = 50)
      .collect().map(_.getString(0)).toSet
    assert(!fenced.contains("rare gem") && fenced.contains("san francisco"))
    intercept[IllegalArgumentException] {
      LanguageModel.pmiCollocations(df, "text", minCount = 0L)
    }
  }

  test("Kneser-Ney is partitioning-invariant and rejects out-of-range discounts") {
    def run(parts: Int) = LanguageModel.kneserNeyNll(
      TestSpark.table("documents").repartition(parts), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(3) == run(23))
    intercept[IllegalArgumentException] {
      LanguageModel.kneserNeyNll(
        TestSpark.table("documents"), "text", "doc_id", discount = 1.0)
    }
  }

  test("stupidBackoffNll: all three backoff branches hit their hand values") {
    import TestSpark.spark
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // model: N = 6 tokens, V = 4; trigrams {a b c, b c a, c a b, a b d};
    // bigrams {a b:2, b c:1, c a:1, b d:1}; unigrams {a:2, b:2, c:1, d:1}
    val model = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val heldout = Seq(
      (11L, "a b c"),  // seen trigram:   S = c3/c(a b)   = 1/2
      (13L, "a b z"),  // unseen all:     S = α²·(0+1)/(N+V)
      (15L, "d a b"),  // bigram backoff: S = α·c(a b)/c(a) = 0.4·2/2
      (17L, "a b"))    // < 3 tokens — excluded by contract
      .toDF("doc_id", "text")
    val got = LanguageModel.stupidBackoffNll(model, heldout,
        "text", "doc_id", alpha = 0.4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(11L, 13L, 15L))
    assert(got(11L) == r6(-math.log(1.0 / 2)))
    assert(got(13L) == r6(-math.log(0.4 * 0.4 * 1.0 / 10.0)))
    assert(got(15L) == r6(-math.log(0.4 * 2.0 / 2)))
    intercept[IllegalArgumentException] {
      LanguageModel.stupidBackoffNll(model, heldout, "text", "doc_id",
        alpha = 1.0)
    }
  }

  test("goodTuringMass: singleton share is the unseen mass, absent n_r = 0") {
    import TestSpark.spark
    import spark.implicits._
    // counts: a×3, b×2, c×2, d,e,f ×1 → N = 10, n1 = 3, n2 = 2, n3 = 1
    val df = Seq((1L, "a a a b b c c d e f")).toDF("doc_id", "text")
    val got = LanguageModel.goodTuringMass(df, "text", maxR = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(0) == ((0L, 0.3)))        // unseen mass = n1/N = 3/10
    assert(got(1) == ((3L, 0.4)))        // 2·n2/N = 4/10
    assert(got(2) == ((2L, 0.3)))        // 3·n3/N = 3/10
    assert(got(3) == ((1L, 0.0)))        // n4 = 0
    assert(got(4) == ((0L, 0.0)))
    intercept[IllegalArgumentException] {
      LanguageModel.goodTuringMass(df, "text", maxR = 0)
    }
  }
}
