package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus search / lexical-statistics operators for training-data
 * pipelines (north-star extension): benchmark decontamination, BM25
 * keyword retrieval, and corpus-wide heavy hitters.
 *
 * Scale design (100 TB):
 *  - [[contamination]] broadcasts the benchmark n-gram set (eval
 *    benchmarks are MBs; the corpus is the 100 TB side) so the corpus
 *    is scanned ONCE, the gram join runs map-side, and the only
 *    shuffle carries (doc, matched-gram) rows for the tiny
 *    contaminated fraction — partial-aggregated on doc id.
 *  - [[bm25]] needs global stats (N, df per term, avg doc length):
 *    ONE aggregation pass collapses them to a single broadcast row,
 *    then scoring is a narrow projection over a second scan with a
 *    `TakeOrderedAndProject` top-k — no global sort, no shuffle of
 *    scored rows beyond the k-row reduce.
 *  - [[topTokens]] is the canonical explode → partial-agg → top-k:
 *    map-side combine collapses each partition's token counts before
 *    the wire, and the final ordering is a k-row `TakeOrdered`, never
 *    a full sort of the vocabulary.
 */
object Search {

  /**
   * Benchmark decontamination: for every corpus document sharing at
   * least one `n`-word shingle with the benchmark set, the number of
   * its distinct shingles that appear anywhere in the benchmark.
   * Training sets are decontaminated against eval benchmarks by
   * dropping (or flagging) exactly these docs — a doc with even one
   * verbatim benchmark n-gram is suspect at the n used in practice
   * (8–13 words; the fixture corpus's short docs use smaller n).
   *
   * Output: (idCol, n_contaminated) — flagged docs only.
   */
  def contamination(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    // The benchmark gram set is deduplicated once and broadcast; the
    // corpus side explodes its own distinct grams and probes map-side.
    val benchGrams = bench
      .select(explode(array_distinct(graft.functions.GraftFunctions
        .wordShingles(bench.sparkSession, col(textCol), n))).as("__g"))
      .distinct()
    corpus
      .select(
        col(idCol),
        explode(array_distinct(graft.functions.GraftFunctions
          .wordShingles(corpus.sparkSession, col(textCol), n))).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Exact term frequency in a token array (list-filter length — exact
    * for consecutive duplicate tokens, unlike replace-delta counting
    * which merges matches sharing a delimiter space). */
  def termFreq(toks: Column, term: String): Column =
    size(filter(toks, t => t === term)).cast("long")

  /**
   * Okapi BM25 top-k retrieval for a fixed bag of query terms, with
   * the standard always-positive idf variant
   * `ln((N − df + 0.5)/(df + 0.5) + 1)`:
   *
   *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
   *
   * Scored docs are ranked (score desc, id asc — total order) and cut
   * to `topK`. Scores are rounded to 6 decimals for cross-engine float
   * stability. Docs matching no term (score 0) are excluded.
   */
  def bm25(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = TextOps.tokens(col(textCol))
    val perDoc = df.select(
      col(idCol) +:
        size(toks).cast("long").as("__len") +:
        terms.zipWithIndex.map { case (t, i) => termFreq(toks, t).as(s"__tf$i") }: _*)
    // global stats → ONE row (broadcast): N, Σlen (exact integer sum —
    // avgdl is derived by a single deterministic division), df per term
    val statAggs =
      sum(col("__len")).as("__sumlen") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = perDoc.agg(count(lit(1)).as("__n"), statAggs: _*)
    val nD = col("__n").cast("double")
    val avgdl = col("__sumlen").cast("double") / nD
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val dfT = col(s"__df$i").cast("double")
      val idf = log((nD - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len").cast("double") / avgdl))
    }.reduce(_ + _)
    perDoc
      .crossJoin(broadcast(stats))
      .select(col(idCol), round(score, 6).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Corpus-wide top-`k` tokens by occurrence count (heavy hitters),
    * deterministically ordered (count desc, token asc). */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /**
   * Positional inverted index: one row per (token, doc) carrying the
   * sorted 0-based position list and term frequency — the durable
   * artifact phrase/proximity queries run against WITHOUT rescanning
   * document text. Build cost is one explode + one (token, doc_id)
   * aggregation; persist partitioned by a token hash bucket so a query
   * for k tokens prunes to k buckets' files
   * ([[graft.io.VectorIndex]]'s static-pruning discipline).
   */
  def invertedIndex(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "token")))
      .groupBy("token", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))

  /**
   * Posting-list health report — the index-side capacity view query
   * planning needs: the heavy tokens (stopword-class posting lists are
   * the rows a phrase query's isin-prune can NOT shrink) with their
   * document frequency, total term frequency, and share of all
   * postings. A token holding >1% of the index is a candidate for a
   * stopword fence or an impact-ordered list — this report is where
   * that decision gets its numbers.
   *
   * One decomposable per-token rollup over the postings frame, a 1-row
   * totals broadcast, TakeOrdered top-k (df desc, token asc). Counts
   * exact; shares single divisions (round 6).
   *
   * Output: topK rows (token, df, tf_sum, df_share, postings_share) —
   * totals ride along as (n_tokens, n_postings).
   */
  def indexHealth(index: DataFrame, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val perToken = index.groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_sum"))
      .localCheckpoint() // feeds totals AND the top-k
    val totals = perToken.agg(
      count(lit(1)).as("n_tokens"),
      sum(col("df")).as("n_postings"),
      sum(col("tf_sum")).as("__ttf"))
    perToken
      .orderBy(col("df").desc, col("token").asc)
      .limit(topK)
      .crossJoin(broadcast(totals))
      .select(col("token"), col("df"), col("tf_sum"),
        round(col("df").cast("double") / col("n_postings"), 6)
          .as("df_share"),
        round(col("tf_sum").cast("double") / col("__ttf"), 6)
          .as("tf_share"),
        col("n_tokens"), col("n_postings"))
  }

  /**
   * Doc-granular index upsert — the MAINTENANCE half of the durable
   * [[invertedIndex]] (the SignatureIndex/VectorIndex discipline,
   * applied to search): a re-crawled or newly ingested batch replaces
   * its documents' postings without rebuilding the corpus index.
   * Semantics: postings for batch doc ids are dropped from the store
   * (tombstone), the batch's fresh postings append. Equivalent to
   * `invertedIndex(corpus with the batch's docs replaced)` — the spec
   * pins that equivalence.
   *
   * Scale shape: the tombstone list is BATCH-∝ and broadcasts into a
   * scan-filter (`left_anti`) — the stored index is read once,
   * map-side, and NEVER reshuffled (the incremental-dedup probe
   * contract); fresh postings are batch-∝ and append bucketed exactly
   * like the store's layout, so query-time pruning is unchanged. A
   * doc-granular delete touches every token bucket by nature — that
   * is a full index READ, not a shuffle, and amortizes across the
   * whole batch.
   */
  def upsertIndex(
      stored: DataFrame,
      batchDocs: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val tombstones = batchDocs.select(col(idCol).as("doc_id")).distinct()
    stored
      .join(broadcast(tombstones), Seq("doc_id"), "left_anti")
      .unionByName(invertedIndex(batchDocs, textCol, idCol))
  }

  /**
   * Exact phrase search from the positional index alone: a doc matches
   * at start position `s` iff for EVERY phrase offset `o`, token
   * `phrase(o)` has a posting at `s + o`. The phrase (with its
   * offsets — repeated tokens are handled) enters as a broadcast
   * literal table; the index is restricted to the phrase's tokens
   * FIRST (an `isin` pushdown — with a bucketed index this prunes at
   * planning time), so everything downstream is posting-list-sized:
   * explode to (doc, candidate start, offset), then one (doc, start)
   * aggregation checking full offset coverage.
   *
   * Output: (doc_id, n_occurrences, first_pos) per matching doc.
   */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val k = phrase.length
    val spark = index.sparkSession
    val offsets = spark.createDataFrame(
      phrase.zipWithIndex.map { case (t, o) => (t, o) })
      .toDF("token", "__off")
    index
      .filter(col("token").isin(phrase.distinct: _*))
      .join(broadcast(offsets), "token")
      .select(col("doc_id"), col("__off"),
        explode(col("positions")).as("__pos"))
      .select(col("doc_id"), col("__off"), (col("__pos") - col("__off")).as("__start"))
      .filter(col("__start") >= 0)
      .groupBy("doc_id", "__start")
      .agg(countDistinct(col("__off")).as("__cover"))
      .filter(col("__cover") === k)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"), min(col("__start")).as("first_pos"))
  }

  /**
   * Ordered proximity search from the positional index (the Lucene
   * "slop" query, public): documents where `termB` occurs within
   * [1, slop] tokens AFTER `termA` — the relevance middle ground
   * between the exact-adjacent [[phraseSearch]] and a bag-of-words
   * AND ("new ... york" with an adjective between still matches).
   *
   * Same scale contract as phraseSearch: the index is isin-restricted
   * to the two terms FIRST (partition pruning on a bucketed index),
   * the position pairing is a doc-keyed join of two posting lists
   * whose fanout is tf_A × tf_B per doc — posting-list-sized, never a
   * corpus scan.
   *
   * Output: (doc_id, n_matches, min_gap) per matching doc.
   */
  def proximitySearch(
      index: DataFrame,
      termA: String,
      termB: String,
      slop: Int): DataFrame = {
    require(slop >= 1, "slop must be >= 1")
    require(termA != termB,
      "self-proximity is ambiguous (every occurrence pairs with itself)")
    val pa = index.filter(col("token") === termA)
      .select(col("doc_id"), explode(col("positions")).as("__pa"))
    val pb = index.filter(col("token") === termB)
      .select(col("doc_id"), explode(col("positions")).as("__pb"))
    pa.join(pb, "doc_id")
      .filter(col("__pb") > col("__pa") &&
        col("__pb") - col("__pa") <= slop)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        min(col("__pb") - col("__pa")).cast("long").as("min_gap"))
  }

  /**
   * KWIC (key-word-in-context) snippets — the display layer of
   * [[phraseSearch]]: for every matching document, the `ctx` tokens on
   * each side of the FIRST phrase occurrence, joined back into a
   * space-separated snippet (the classic concordance view, public
   * since Luhn 1960). `hit_off` gives the phrase's token offset inside
   * the snippet so a renderer can highlight it without re-searching.
   *
   * Scale shape: `matches` is posting-list-sized (the phraseSearch
   * output), so the text attach join touches ONLY matching documents
   * (never a corpus scan); the window slice is one narrow codegen
   * projection. Window edges clamp at both ends of the document.
   *
   * @param matches output of [[phraseSearch]] — (doc_id,
   *                n_occurrences, first_pos)
   * @return (doc_id, n_occurrences, first_pos, snippet, hit_off)
   */
  def kwicSnippets(
      docs: DataFrame,
      matches: DataFrame,
      textCol: String,
      idCol: String,
      phraseLen: Int,
      ctx: Int): DataFrame = {
    require(phraseLen >= 1, "phraseLen must be positive")
    require(ctx >= 0, "context width must be non-negative")
    val toks = TextOps.tokens(col(textCol))
    val start1 = greatest(col("first_pos") + 1 - ctx, lit(1L)) // 1-based
    val end1 = col("first_pos") + phraseLen + ctx              // 1-based
    matches
      .join(docs.select(col(idCol).as("doc_id"), col(textCol)), Seq("doc_id"))
      .select(col("doc_id"), col("n_occurrences"), col("first_pos"),
        array_join(slice(toks, start1.cast("int"),
          (end1 - start1 + 1).cast("int")), " ").as("snippet"),
        (col("first_pos") + 1 - start1).cast("long").as("hit_off"))
  }

  /**
   * Reciprocal-rank fusion (Cormack/Clarke/Büttcher, public) — the
   * standard score-free combiner for heterogeneous retrievers (BM25 +
   * dense, relevance + quality priors, …): each list contributes
   * `1/(k + rank)` per member and contributions sum; items high in ANY
   * list surface without any score calibration between retrievers.
   *
   * Each input frame must carry `idCol` and a 1-based `rank` column
   * (use [[ranked]] on a top-K frame). Determinism contract:
   * contributions are INTEGER MICRO-UNITS (`round(1e9/(k+rank))` as
   * BIGINT), so the fused score is an exact integer sum — independent
   * of list order and engine, the [[graft.functions.UnigramKernels]]
   * discipline. Output: (idCol, rrf_micro, n_lists), top-`topK` by
   * (rrf_micro desc, id asc).
   *
   * Scale shape: inputs are top-K lists (K-row frames by contract), so
   * the union + id-keyed aggregation is list-∝ — never corpus-∝.
   */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      k: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, "rrf k must be positive")
    val contribs = rankings.map(_.select(col(idCol),
      round(lit(1e9) / (lit(k).cast("double") + col("rank")), 0)
        .cast("long").as("__c")))
    contribs.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum(col("__c")).as("rrf_micro"), count(lit(1)).as("n_lists"))
      .orderBy(desc("rrf_micro"), asc(idCol))
      .limit(topK)
  }

  /** Attach a 1-based `rank` to a TOP-K frame by the given order.
    * Single-partition window by design — the input is a K-row ranked
    * list, not a corpus (rank a corpus with per-key windows instead). */
  def ranked(topList: DataFrame, order: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
    topList.withColumn("rank", row_number().over(w))
  }

  /**
   * nDCG@k (Järvelin & Kekäläinen 2002, public) — THE graded ranking
   * metric: `DCG@k = Σ_{i≤k} (2^rel_i − 1)/log2(i + 1)` over the
   * system ranking, normalized by the ideal DCG of the best possible
   * ordering of the judged set. The eval every retrieval change
   * (BM25 tuning, ANN recall dial, MMR/RRF re-rank) is gated on —
   * recall@k sees WHETHER the right docs arrived, nDCG sees WHERE.
   *
   * Contracts: `ranking` = (idCol, rank 1-based) — a top-k list, not
   * a corpus; `rels` = the judged relevance set (idCol, rel: integer
   * grade ≥ 0) — judgment-pool-sized by definition. Unjudged ranked
   * docs score rel = 0 (the standard convention); the ideal ordering
   * sorts the judged set by grade desc (ties: id asc — deterministic).
   * Both joins are judgment-sized broadcasts; the ideal top-k is
   * `TakeOrderedAndProject`, never a global sort. Gains `2^rel − 1`
   * are exact integers; the k-term discounted sums are the only
   * doubles (round 6 — the usual sum-order bound).
   *
   * Output: one row (k, dcg, idcg, ndcg).
   */
  def ndcgAtK(
      ranking: DataFrame,
      rels: DataFrame,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "ndcgAtK needs k >= 1")
    def gain(rel: Column): Column =
      (pow(lit(2.0), rel.cast("double")) - 1.0)
    def disc(pos: Column): Column = log2(pos.cast("double") + 1.0)
    val sys = ranking
      .filter(col("rank") <= k)
      .join(broadcast(rels.select(col(idCol), col("rel"))), Seq(idCol), "left")
      .select((gain(coalesce(col("rel"), lit(0))) / disc(col("rank"))).as("__g"))
      .agg(sum(col("__g")).as("dcg"))
    val ideal = ranked(
      rels.orderBy(col("rel").desc, col(idCol).asc).limit(k),
      col("rel").desc, col(idCol).asc)
      .select((gain(col("rel")) / disc(col("rank"))).as("__g"))
      .agg(sum(col("__g")).as("idcg"))
    sys.crossJoin(ideal)
      .select(lit(k).as("k"),
        round(col("dcg"), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        round(try_divide(col("dcg"), col("idcg")), 6).as("ndcg"))
  }

  /**
   * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
   * 1998, public) — dedup-aware retrieval: pure relevance ranking
   * returns five near-copies of the best hit; MMR greedily picks the
   * candidate maximizing `wRel·relevance − wDiv·maxSimToSelected`, so
   * each selection is relevant AND novel against what is already in
   * the result. The retrieval-time complement of corpus dedup (a RAG
   * context window has no room for near-duplicates).
   *
   * Contracts: `candidates` = (idCol, rel_micro: long), `sims` =
   * (id_a, id_b, sim_micro: long) over candidate pairs
   * (orientation-insensitive; a missing pair scores 0). ALL-INTEGER
   * scoring — λ enters as the exact weight pair (wRel, wDiv), e.g.
   * (7, 3) for λ = 0.7 — so selection replays bit-identically; ties
   * break toward the smaller id.
   *
   * The greedy loop runs on the DRIVER over the collected candidate
   * list — bounded BY DESIGN: a re-ranker consumes a top-k list
   * (corpus-scale work happened upstream in BM25/ANN), and the k·n
   * step cost is microscopic next to one distributed job dispatch.
   * Guarded at 10k candidates: past that the caller is misusing a
   * re-ranker as a ranker.
   *
   * @return one row per selection: (position, idCol, mmr_micro)
   */
  def mmrSelect(
      candidates: DataFrame,
      sims: DataFrame,
      idCol: String,
      k: Int,
      wRel: Long,
      wDiv: Long): DataFrame = {
    require(k >= 1, "mmrSelect needs k >= 1")
    require(wRel >= 0 && wDiv >= 0 && wRel + wDiv > 0,
      s"weights must be non-negative and not both zero: ($wRel, $wDiv)")
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand = candidates
      .select(col(idCol).cast("long"), col("rel_micro").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(cand.length <= 10000,
      s"mmrSelect re-ranks a top-k list, got ${cand.length} candidates")
    val sim = sims
      .select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("sim_micro").cast("long"))
      .collect().flatMap { r =>
        val (a, b, v) = (r.getLong(0), r.getLong(1), r.getLong(2))
        Seq((a, b) -> v, (b, a) -> v)
      }.toMap
    val selected = Seq.newBuilder[(Long, Long, Long)] // (position, id, mmr)
    var picked = Vector.empty[Long]
    var remaining = cand.sortBy(_._1).toVector
    var pos = 1L
    while (pos <= k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, rel) =>
        val ms =
          if (picked.isEmpty) 0L
          else picked.map(s => sim.getOrElse((id, s), 0L)).max
        (wRel * rel - wDiv * ms, id)
      }
      val (bestScore, bestId) = scored.maxBy { case (sc, id) => (sc, -id) }
      selected += ((pos, bestId, bestScore))
      picked :+= bestId
      remaining = remaining.filterNot(_._1 == bestId)
      pos += 1
    }
    selected.result().toDF("position", idCol, "mmr_micro")
  }
}
