package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Search

class SearchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a quick brown fox jumps over a sleeping cat"),
    (3L, "completely unrelated words about spark and shuffle plans"),
    (4L, "the quick brown fox naps all day long")
  ).toDF("doc_id", "text")

  test("contamination flags exactly the docs sharing an n-gram with the benchmark") {
    // benchmark = doc 1; 4-grams of doc 2 sharing with doc 1:
    // "quick brown fox jumps" only ("brown fox jumps over" also shared!)
    val out = Search.contamination(
      docs.filter($"doc_id" =!= 1L), docs.filter($"doc_id" === 1L),
      "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(2L, 4L), "docs 2 and 4 share 4-grams with doc 1; doc 3 shares none")
    assert(out(2L) == 2L, "doc 2: 'quick brown fox jumps' + 'brown fox jumps over'")
    assert(out(4L) == 1L, "doc 4: 'the quick brown fox'")
  }

  test("contamination counts DISTINCT grams (repeats in a doc count once)") {
    val corpus = Seq((10L, "x y x y x y")).toDF("doc_id", "text")
    val bench = Seq((0L, "x y x")).toDF("doc_id", "text")
    val out = Search.contamination(corpus, bench, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // corpus doc grams: {x y, y x}; bench grams: {x y, y x} → 2 distinct hits
    assert(out == Map(10L -> 2L))
  }

  test("bm25 ranks the term-dense doc first and excludes no-match docs") {
    val out = Search.bm25(docs, "text", "doc_id", Seq("fox", "quick"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSet == Set(1L, 2L, 4L), "doc 3 has no query term")
    // scores sorted desc, deterministic tiebreak
    assert(out.map(_._2).reverse.toSeq == out.map(_._2).sortBy(identity).toSeq)
    // shorter doc with same tf scores higher (length normalization)
    val byId = out.toMap
    assert(byId(4L) > byId(1L), "doc 4 is shorter than doc 1 with the same tf")
  }

  test("bm25 idf favors rarer terms: a doc matching only a rare term beats one matching only a common term") {
    val corpus = Seq(
      (1L, "common common common rare"),
      (2L, "common filler filler filler"),
      (3L, "rare filler filler filler"),
      (4L, "common filler filler filler"),
      (5L, "common filler filler filler")
    ).toDF("doc_id", "text")
    val out = Search.bm25(corpus, "text", "doc_id", Seq("common", "rare"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(3L) > out(2L), "same tf and length; 'rare' has higher idf")
  }

  test("topTokens returns exact counts with deterministic ordering") {
    val out = Search.topTokens(docs, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "the" ×3, "quick"/"brown"/"fox" ×3 each... compute exact: ties broken by token asc
    val exact = docs.select(explode(split($"text", " ")).as("t"))
      .groupBy("t").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(3)
    assert(out.toSeq == exact.toSeq)
  }

  test("rrfFuse: hand-computed fusion, both-lists items win, determinism") {
    // list 1 ranks: a(1), b(2), c(3); list 2 ranks: c(1), d(2)
    val l1 = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "rank")
    val l2 = Seq(("c", 1), ("d", 2)).toDF("id", "rank")
    val got = Search.rrfFuse(Seq(l1, l2), "id", k = 60, topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    def c(r: Int): Long = math.round(1e9 / (60.0 + r))
    val expect = Seq(
      ("c", c(3) + c(1), 2L), // in both lists: highest fused score
      ("a", c(1), 1L),
      ("d", c(2), 1L),
      ("b", c(2), 1L)).sortBy(t => (-t._2, t._1))
    assert(got == expect)
    // c (rank 3 + rank 1) beats a (rank 1 in one list only)
    assert(got.head._1 == "c")
    // ranked() attaches 1-based ranks in the given order
    val r = Search.ranked(Seq(("x", 0.9), ("y", 0.8)).toDF("id", "s"),
      org.apache.spark.sql.functions.desc("s")).as[(String, Double, Int)]
      .collect().map { case (i, _, rk) => (i, rk) }.toMap
    assert(r == Map("x" -> 1, "y" -> 2))
  }

  test("mmrSelect: diversity beats relevance, ties, orientation") {
    def run(cands: Seq[(Long, Long)], sims: Seq[(Long, Long, Long)],
        k: Int): Seq[(Long, Long, Long)] =
      Search.mmrSelect(
        cands.toDF("doc_id", "rel_micro"),
        sims.toDF("id_a", "id_b", "sim_micro"),
        "doc_id", k, wRel = 7L, wDiv = 3L)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val cands = Seq((1L, 100L), (2L, 95L), (3L, 50L))
    // low redundancy: pure relevance order survives
    val mild = run(cands, Seq((1L, 2L, 30L)), 3)
    assert(mild.map(_._2) == Seq(1L, 2L, 3L))
    assert(mild.head == ((1L, 1L, 700L)))
    assert(mild(1) == ((2L, 2L, 7L * 95 - 3L * 30)))
    // near-dup of the first pick: diversity flips positions 2/3
    val strong = run(cands, Seq((1L, 2L, 200L)), 3)
    assert(strong.map(_._2) == Seq(1L, 3L, 2L))
    assert(strong(1) == ((2L, 3L, 350L)))
    assert(strong(2) == ((3L, 2L, 7L * 95 - 3L * 200)))
    // orientation-insensitive: (2,1) sim gives the same selection
    assert(run(cands, Seq((2L, 1L, 200L)), 3) == strong)
    // score tie breaks toward the smaller id; k > n stops at n
    val tied = run(Seq((5L, 10L), (4L, 10L)), Nil, 5)
    assert(tied.map(_._2) == Seq(4L, 5L) && tied.length == 2)
  }

  test("kwicSnippets: window, both clamps, hit offset, non-match prune") {
    val docs = Seq(
      (1L, "one two spark window five six seven"),
      (2L, "spark window tail a b"),
      (3L, "a b spark window"),
      (4L, "no phrase here at all")).toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs, "text", "doc_id")
    val hits = Search.phraseSearch(idx, Seq("spark", "window"))
    def kw(ctx: Int): Map[Long, (Long, String, Long)] =
      Search.kwicSnippets(docs, hits, "text", "doc_id", phraseLen = 2, ctx = ctx)
        .collect()
        .map(r => r.getLong(0) -> ((r.getAs[Long]("first_pos"),
          r.getAs[String]("snippet"), r.getAs[Long]("hit_off")))).toMap
    val got = kw(2)
    assert(got.keySet == Set(1L, 2L, 3L)) // doc 4 never joins
    assert(got(1L) == ((2L, "one two spark window five six", 2L)))
    assert(got(2L) == ((0L, "spark window tail a", 0L))) // left clamp
    val wide = kw(3)
    assert(wide(3L) == ((2L, "a b spark window", 2L)))   // right clamp
  }

  test("proximitySearch: ordered window, slop edges, tf fanout counted") {
    val pdocs = Seq(
      (1L, "spark a b window"),        // gap 3: in at slop 3
      (2L, "spark window"),            // gap 1
      (3L, "window spark"),            // wrong order: out
      (4L, "spark a b c window"),      // gap 4: out at slop 3
      (5L, "spark window spark window") // pairs: (0,1),(0,3),(2,3) -> gaps 1,3,1
    ).toDF("doc_id", "text")
    val idx = Search.invertedIndex(pdocs, "text", "doc_id")
    val got = Search.proximitySearch(idx, "spark", "window", slop = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 3L)), 2L -> ((1L, 1L)), 5L -> ((3L, 1L))))
    intercept[IllegalArgumentException] {
      Search.proximitySearch(idx, "spark", "spark", slop = 3)
    }
    intercept[IllegalArgumentException] {
      Search.proximitySearch(idx, "spark", "window", slop = 0)
    }
  }

  test("ndcgAtK: hand-computed grades, unjudged rank counts as rel 0") {
    // system ranking: doc1 (rel 3), doc2 (unjudged -> 0), doc3 (rel 1);
    // judged pool also holds doc9 (rel 2), unreturned
    val ranking = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val rels = Seq((1L, 3), (3L, 1), (9L, 2)).toDF("doc_id", "rel")
    val got = Search.ndcgAtK(ranking, rels, "doc_id", k = 3).collect().head
    def g(rel: Int) = math.pow(2.0, rel) - 1.0
    def d(pos: Int) = math.log(pos + 1.0) / math.log(2.0)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg = g(3) / d(1) + g(0) / d(2) + g(1) / d(3)
    val idcg = g(3) / d(1) + g(2) / d(2) + g(1) / d(3) // ideal: 3,2,1
    assert(got.getInt(0) == 3)
    assert(got.getDouble(1) == r6(dcg))
    assert(got.getDouble(2) == r6(idcg))
    assert(got.getDouble(3) == r6(dcg / idcg))
    assert(got.getDouble(3) < 1.0)
  }

  test("ndcgAtK: the ideal ordering of the judged pool scores exactly 1.0; k truncates") {
    val rels = Seq((1L, 3), (2L, 2), (3L, 2), (4L, 0)).toDF("doc_id", "rel")
    // perfect system ranking = grade desc, id asc (the ideal tie-break)
    val perfect = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("doc_id", "rank")
    val got = Search.ndcgAtK(perfect, rels, "doc_id", k = 4).collect().head
    assert(got.getDouble(3) == 1.0)
    // k = 2 ignores everything past rank 2 on BOTH sides
    val k2 = Search.ndcgAtK(perfect, rels, "doc_id", k = 2).collect().head
    assert(k2.getDouble(3) == 1.0)
    val worst = Seq((4L, 1), (3L, 2), (2L, 3), (1L, 4)).toDF("doc_id", "rank")
    assert(Search.ndcgAtK(worst, rels, "doc_id", k = 4)
      .collect().head.getDouble(3) < 1.0)
    intercept[IllegalArgumentException] {
      Search.ndcgAtK(perfect, rels, "doc_id", k = 0)
    }
  }

  test("upsertIndex: tombstone + append equals a fresh rebuild") {
    import TestSpark.spark
    import spark.implicits._
    val current = Seq(
      (1L, "a b c"), (2L, "c d"), (3L, "a a b")).toDF("doc_id", "text")
    val stale = Seq(
      (1L, "a b c"), (2L, "OLD junk"), (3L, "STALE a")).toDF("doc_id", "text")
    val stored = Search.invertedIndex(stale, "text", "doc_id")
    val merged = Search.upsertIndex(stored,
      current.filter(col("doc_id") >= 2), "text", "doc_id")
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("doc_id"), r.getAs[Seq[Int]]("positions"),
        r.getAs[Long]("tf"))).toSet
    assert(dump(merged) == dump(Search.invertedIndex(current, "text",
      "doc_id")), "merged index must equal a fresh rebuild")
    // untouched doc 1's postings came from the STORE, not a rescan
    assert(dump(merged).exists { case (t, d, _, _) => t == "a" && d == 1L })
    // phrase search over the merged index answers on current text
    val hits = Search.phraseSearch(merged, Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L, 3L -> 1L))
  }

  test("indexHealth: heavy tokens by df, shares, token tie-break") {
    import TestSpark.spark
    import spark.implicits._
    // 'a' in 3 docs (df 3, tf 4), 'b' in 2 (tf 2), 'c' in 1 (tf 1)
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs, "text", "doc_id")
    val got = Search.indexHealth(idx, topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(5), r.getLong(6)))
    // totals: 3 tokens, 6 postings; a: df 3 (share 0.5), b: df 2
    assert(got.toSeq == Seq(
      ("a", 3L, 4L, 0.5, 3L, 6L), ("b", 2L, 2L, 0.333333, 3L, 6L)))
    intercept[IllegalArgumentException] {
      Search.indexHealth(idx, topK = 0)
    }
  }
}
