package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/** search slice of the [[SparkEntry]] registry — search + ranking: BM25, phrase/proximity/KWIC retrieval, RRF hybrid, nDCG, journey paths.
  * Split by family for maintainability; entries and oracles are
  * verbatim registry content (no behavior change). */
private[graft] trait EntrySearch extends EntryContext {

  protected def searchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // ---- north-star: Okapi BM25 top-k keyword retrieval — global
    //      stats (N, df, avgdl) collapse to ONE broadcast row; scoring
    //      is a narrow projection + TakeOrderedAndProject.
    "q51_bm25" -> ((s, dir) =>
      graft.ops.Search.bm25(
        T(s, dir, "documents"), "text", "doc_id",
        terms = Seq("spark", "hash", "window"), topK = 20)),



    // ---- north-star: exact phrase search answered from a PERSISTED
    //      positional inverted index (token-hash-bucketed so a k-token
    //      query prunes to k buckets) — the corpus text is never
    //      rescanned at query time; the oracle replays the phrase scan
    //      directly over documents.
    "q152_phrase_search" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val out = tmp("q152_index")
      graft.ops.Search.invertedIndex(docs, "text", "doc_id")
        .withColumn("tbucket", pmod(xxhash64(col("token")), lit(16)))
        .write.mode("overwrite").partitionBy("tbucket").parquet(out)
      val idx = s.read.parquet(out)
      graft.ops.Search.phraseSearch(idx, Seq("spark", "window"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_occurrences")).as("n_occ"),
          sum(col("doc_id")).as("sum_ids"),
          min(col("first_pos")).cast("long").as("min_first"))
    }),



    // ---- north-star: reciprocal-rank fusion — the score-free hybrid
    //      combiner: BM25 relevance fused with a quality-prior ranking
    //      (each list contributes 1/(60+rank), summed as exact integer
    //      micro-units). Items high in EITHER list surface without
    //      score calibration; the aggregation is list-∝, never
    //      corpus-∝.
    "q181_rrf_hybrid" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val bm = graft.ops.Search.ranked(
        graft.ops.Search.bm25(docs, "text", "doc_id",
          terms = Seq("spark", "hash", "window"), topK = 20),
        desc("bm25"), asc("doc_id"))
      val qual = graft.ops.Search.ranked(
        docs.filter(col("text").isNotNull)
          .selectExpr("doc_id",
            s"${PortableSql.qualityScore("text", SD)} AS quality")
          .orderBy(desc("quality"), asc("doc_id")).limit(20),
        desc("quality"), asc("doc_id"))
      graft.ops.Search.rrfFuse(
        Seq(bm.select("doc_id", "rank"), qual.select("doc_id", "rank")),
        "doc_id", k = 60, topK = 10)
    }),



    // ---- north-star: KWIC snippets — the display layer of the q152
    //      positional-index phrase search: ±3 tokens of context around
    //      the first "spark window" hit, with the in-snippet phrase
    //      offset for highlighting; the text attach touches ONLY
    //      matching docs (posting-list-sized, never a corpus scan).
    "q205_kwic_snippets" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val idx = graft.ops.Search.invertedIndex(docs, "text", "doc_id")
      val hits = graft.ops.Search.phraseSearch(idx, Seq("spark", "window"))
      graft.ops.Search.kwicSnippets(docs, hits, "text", "doc_id",
        phraseLen = 2, ctx = 3)
    }),



    // ---- north-star: nDCG@10 of the q51 BM25 ranking against a
    //      constructively graded judgment pool (docs ≡ 0 mod 3, grade
    //      = id mod 4) — the position-aware eval recall@k cannot
    //      express; unjudged ranked docs score 0 per the standard
    //      convention.
    "q211_ndcg" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val bm = graft.ops.Search.bm25(docs, "text", "doc_id",
        terms = Seq("spark", "hash", "window"), topK = 20)
      val ranking = graft.ops.Search.ranked(
        bm, col("bm25").desc, col("doc_id").asc).select("doc_id", "rank")
      val rels = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("rel"))
      graft.ops.Search.ndcgAtK(ranking, rels, "doc_id", k = 10)
    }),



    // ---- north-star: top-k user journeys — most common 3-step
    //      event-type sequences inside 30-min sessions (one user-keyed
    //      window + session-bounded lists + decomposable gram counts).
    "q217_journeys" -> ((s, dir) =>
      graft.ops.EventOps.topJourneys(
        Layers.readEvents(s, s"$dir/events.parquet"),
        "user_id", "ts", "event_id", "event_type",
        gapSeconds = 1800, n = 3, topK = 15)),



    // ---- north-star: ordered proximity search (Lucene slop) — docs
    //      where "window" follows "spark" within 3 tokens, straight
    //      from the positional index: the relevance middle ground
    //      between exact-phrase and bag-of-words AND.
    "q221_proximity" -> ((s, dir) => {
      val idx = graft.ops.Search.invertedIndex(
        T(s, dir, "documents"), "text", "doc_id")
      graft.ops.Search.proximitySearch(idx, "spark", "window", slop = 3)
    })
  )

  protected def searchOracles: Map[String, String] = Map(


    // KWIC replay: the q152 direct-scan phrase lambda + inclusive
    // 1-based list slicing (both ends clamp); hit_off is the phrase's
    // 0-based token offset inside the snippet
    "q205_kwic_snippets" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id, toks,
        |    len(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'spark' AND toks[i+1] = 'window')) AS occ,
        |    list_min(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'spark' AND toks[i+1] = 'window')) AS first1
        |  FROM tk)
        |SELECT doc_id, CAST(occ AS BIGINT) AS n_occurrences,
        |  CAST(first1 - 1 AS BIGINT) AS first_pos,
        |  array_to_string(toks[greatest(first1 - 3, 1):first1 + 4], ' ')
        |    AS snippet,
        |  CAST(first1 - greatest(first1 - 3, 1) AS BIGINT) AS hit_off
        |FROM m WHERE occ > 0""".stripMargin,



    // nDCG replay: the shared q51 BM25 chain top-20 ranked, judged
    // pool doc_id%3=0 graded id%4, unjudged rel 0; ideal = judged
    // top-10 by grade
    "q211_ndcg" ->
      s"""WITH $bm25Ctes,
         |bml AS (SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
         |        ORDER BY bm25 DESC, doc_id LIMIT 20),
         |rk AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |       FROM bml),
         |rels AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS rel
         |         FROM documents WHERE doc_id % 3 = 0),
         |sys AS (SELECT sum((pow(2.0, CAST(coalesce(r.rel, 0) AS DOUBLE)) - 1.0)
         |          / log2(CAST(rk.rank AS DOUBLE) + 1.0)) AS dcg
         |        FROM rk LEFT JOIN rels r USING (doc_id)
         |        WHERE rk.rank <= 10),
         |itop AS (SELECT rel,
         |           row_number() OVER (ORDER BY rel DESC, doc_id ASC) AS rank
         |         FROM (SELECT * FROM rels
         |               ORDER BY rel DESC, doc_id ASC LIMIT 10)),
         |ideal AS (SELECT sum((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
         |            / log2(CAST(rank AS DOUBLE) + 1.0)) AS idcg
         |          FROM itop)
         |SELECT 10 AS k, round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
         |  round(dcg / idcg, 6) AS ndcg
         |FROM sys, ideal""".stripMargin,



    // journeys replay: the q19 sessionization window, ordered
    // per-session type lists, sliding 3-gram slices
    "q217_journeys" ->
      """WITH p AS (SELECT user_id, event_id, ts, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |s AS (SELECT *, sum(CASE WHEN prev IS NULL
        |      OR epoch(ts) - epoch(prev) > 1800.0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM p),
        |seqs AS (SELECT user_id, sess,
        |    list(event_type ORDER BY ts, event_id) AS types
        |  FROM s GROUP BY user_id, sess),
        |g AS (SELECT array_to_string(list_slice(types, gi, gi + 2), '→')
        |    AS journey
        |  FROM seqs, unnest(generate_series(1, len(types) - 2)) AS t(gi)
        |  WHERE len(types) >= 3)
        |SELECT journey, count(*) AS n_occurrences
        |FROM g GROUP BY journey
        |ORDER BY n_occurrences DESC, journey ASC LIMIT 15""".stripMargin,



    // proximity replay: token positions from the text directly —
    // gaps are base-independent (Spark postings are 0-based)
    "q221_proximity" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents WHERE text IS NOT NULL),
        |pa AS (SELECT doc_id, gi AS p FROM tok,
        |  unnest(generate_series(1, len(l))) AS t(gi)
        |  WHERE l[CAST(gi AS INT)] = 'spark'),
        |pb AS (SELECT doc_id, gi AS p FROM tok,
        |  unnest(generate_series(1, len(l))) AS t(gi)
        |  WHERE l[CAST(gi AS INT)] = 'window'),
        |m AS (SELECT pa.doc_id, pb.p - pa.p AS gap
        |  FROM pa JOIN pb USING (doc_id)
        |  WHERE pb.p > pa.p AND pb.p - pa.p <= 3)
        |SELECT doc_id, count(*) AS n_matches,
        |  CAST(min(gap) AS BIGINT) AS min_gap
        |FROM m GROUP BY doc_id""".stripMargin,



    "q51_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,



    // RRF replay: the shared q51 BM25 chain and the q13 quality score
    // each ranked top-20, fused as exact integer micro-contributions
    "q181_rrf_hybrid" ->
      s"""WITH $bm25Ctes,
         |bml AS (SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
         |        ORDER BY bm25 DESC, doc_id LIMIT 20),
         |bmr AS (SELECT doc_id,
         |          row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |        FROM bml),
         |ql AS (SELECT doc_id,
         |         ${PortableSql.qualityScore("text", DD)} AS quality
         |       FROM documents WHERE text IS NOT NULL
         |       ORDER BY quality DESC, doc_id LIMIT 20),
         |qr AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY quality DESC, doc_id) AS rank
         |       FROM ql),
         |u AS (SELECT doc_id,
         |        CAST(round(1000000000.0 / (CAST(60 AS DOUBLE) + rank))
         |          AS BIGINT) AS c
         |      FROM bmr
         |      UNION ALL
         |      SELECT doc_id,
         |        CAST(round(1000000000.0 / (CAST(60 AS DOUBLE) + rank))
         |          AS BIGINT) AS c
         |      FROM qr)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
         |  count(*) AS n_lists
         |FROM u GROUP BY doc_id
         |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,



    // phrase replay: DuckDB scans the corpus directly with a lambda
    // over token bigrams (1-based list index i -> 0-based position
    // i-1); the Spark side must reach the same answer from the
    // persisted index alone
    "q152_phrase_search" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    len(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'spark' AND toks[i+1] = 'window')) AS occ,
        |    list_min(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'spark' AND toks[i+1] = 'window')) AS first1
        |  FROM tk)
        |SELECT count(*) FILTER (occ > 0) AS n_docs,
        |  CAST(sum(occ) AS BIGINT) AS n_occ,
        |  CAST(sum(CASE WHEN occ > 0 THEN doc_id END) AS BIGINT) AS sum_ids,
        |  CAST(min(first1) - 1 AS BIGINT) AS min_first
        |FROM m""".stripMargin
  )
}
