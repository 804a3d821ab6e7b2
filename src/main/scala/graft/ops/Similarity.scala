package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor / similarity search over an embedding
 * column (`array<float>`) — north-star extension.
 *
 * Scale design (100 TB):
 *  - [[bruteForceTopK]] is the exactness baseline: a broadcast of the
 *    (tiny) query vector against a full scan — one narrow pass, a
 *    partial top-k per partition, and a final k-row reduce
 *    (`orderBy.limit(k)` is planned by Spark as TakeOrderedAndProject —
 *    NO global sort/shuffle of the corpus).
 *  - [[signBuckets]]/[[lshTopK]] is the scale path: random-hyperplane
 *    LSH where the "hyperplanes" are deterministic ±1 vectors derived
 *    from md5(plane, dim) — seedless, engine-portable, and broadcastable
 *    as pure expressions. Probing cost drops from O(corpus) to
 *    O(bucket), with the usual recall/bucket-size trade governed by the
 *    number of planes.
 *  - cosine scoring runs through the custom Catalyst expression
 *    [[graft.functions.CosineSimilarity]] (primitive fused loop with
 *    doGenCode, inside whole-stage codegen) — Spark's own higher-order
 *    functions are CodegenFallback, so the composable
 *    `zip_with`+`aggregate` formulation ([[dot]]/[[cosine]], kept as
 *    the reference implementation and parity check) pays interpreted
 *    lambda dispatch per row.
 *
 * All similarity outputs are rounded to 6 decimals: the only
 * cross-engine nondeterminism is float-sum association order, which is
 * ~1e-13 relative — rounding removes it (SURVEY §7.4 risk 5).
 */
object Similarity {

  /** Elementwise dot product of two float-array columns (as double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 6-decimal-rounded for determinism. Composable
    * HOF formulation — correct everywhere, but Spark's higher-order
    * functions are CodegenFallback (interpreted per row). The operator
    * paths below use [[cosineFast]] instead. `try_divide` makes a
    * zero-norm (degenerate) vector yield NULL under ANSI mode rather
    * than throwing — matching [[cosineFast]], and keeping a handful of
    * empty embeddings from killing a corpus-wide job. */
  def cosine(a: Column, b: Column): Column =
    round(try_divide(dot(a, b), norm(a) * norm(b)), 6)

  /** Codegen'd cosine: the custom Catalyst expression
    * [[graft.functions.CosineSimilarity]] (fused primitive loop inside
    * whole-stage codegen, no intermediate arrays), rounded to 6 decimals.
    * Accumulation order matches [[cosine]] exactly, so results are
    * bit-identical — swapping kernels cannot move an oracle hash. */
  def cosineFast(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    round(graft.functions.GraftFunctions.cosine(spark, a, b), 6)

  /** The single-query entry points take EXACTLY one query row: their
    * global `orderBy…limit` would silently interleave several queries'
    * candidates into one meaningless ranking (wrong answer, no error).
    * Enforced cheaply (`limit(2)` short-circuits the scan); query SETS
    * go through the `…Batch` variants, which carry a query id. */
  private def requireSingleQuery(queryDf: DataFrame, op: String): Unit = {
    val n = queryDf.limit(2).count()
    require(n == 1,
      s"$op expects exactly one query row, got ${if (n == 0) "none" else "2+"} — " +
        "use the Batch variant for query sets")
  }

  /**
   * Distributed per-query top-k over a scored (query_id, id, score)
   * frame — the shared tail of every batch retrieval path. A plain
   * `Window.partitionBy(query_id)` puts each query's ENTIRE candidate
   * set in one task (corpus-sized for brute force — the unsplittable
   * partition that kills a 1000-executor run), so rank in two stages:
   *
   *  1. within (query, salt) where salt = hash(id) mod `salts`: each
   *     query's ranking spreads over `salts` bounded partitions. Any
   *     global top-k row is necessarily in its salt group's top-k
   *     under the same total order, so survivors (≤ salts·k per
   *     query) lose nothing;
   *  2. final rank over survivors only.
   *
   * The salt cannot move the result — stage 2 re-ranks under the
   * global total order (score desc, id asc) — so oracles replay this
   * as ONE plain window. Output: input columns + `rank` (1-based,
   * long), filtered to rank ≤ k.
   */
  def perQueryTopK(
      scored: DataFrame,
      qidCol: String,
      idCol: String,
      scoreCol: String,
      k: Int,
      salts: Int = 64): DataFrame = {
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    val w1 = Window
      .partitionBy(col(qidCol), pmod(hash(col(idCol)), lit(salts)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy(col(qidCol)).orderBy(order: _*)
    scored
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
  }

  /**
   * Exact top-k by cosine against the single row of `queryDf`
   * (columns: `embedding`). Ties broken by id ascending — total order,
   * oracle-reproducible. The query side is broadcast; the corpus is
   * never shuffled.
   */
  def bruteForceTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      k: Int): DataFrame = {
    requireSingleQuery(queryDf, "bruteForceTopK")
    val scored = corpus
      .crossJoin(broadcast(queryDf.select(col(embCol).as("__q"))))
      .select(
        col(idCol),
        cosineFast(corpus.sparkSession, col(embCol), col("__q")).as("cosine_sim"))
    scored
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Exact top-k per query for a query SET — retrieval for seed-set
   * dedup, eval batches, RAG batches: ONE job for N queries instead of
   * N driver-synchronized single-query jobs. The (tiny) query table is
   * broadcast against one corpus scan; ranking is the salted two-stage
   * [[perQueryTopK]] (no corpus-sized partition per query). Output:
   * (query_id, rank, idCol, cosine_sim).
   */
  def bruteForceTopKBatch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      qidCol: String,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(qidCol).as("query_id"), col(embCol).as("__q")))
    val scored = corpus
      .crossJoin(q)
      .select(
        col("query_id"),
        col(idCol),
        cosineFast(corpus.sparkSession, col(embCol), col("__q")).as("cosine_sim"))
    perQueryTopK(scored, "query_id", idCol, "cosine_sim", k)
      .select(col("query_id"), col("rank"), col(idCol), col("cosine_sim"))
  }

  /**
   * Recall@k of an approximate retrieval run against exact ground
   * truth — the evaluation harness that closes the ANN tuning loop
   * (pick nlist/nprobe/planes by measured recall, not guesswork).
   *
   * Both inputs are per-query top-k frames (k·|queries| rows — index
   * output, never corpus-sized), so the join is trivially
   * broadcastable; per-query recall = |approx ∩ truth| / |truth∩topk|,
   * i.e. hits over the query's own (distinct, ≤ k) truth-set size — NOT
   * over the literal k, which would deflate recall when the ground
   * truth has fewer than k candidates (small corpus, filtered truth).
   * Both sides are DEDUPED on (query, id) first, so duplicate result
   * rows can neither inflate hits past 1.0 nor double-count truth.
   * Ids are compared, not ranks: an approximate index that returns the
   * right set in a different order has perfect recall.
   *
   * `k` is ENFORCED, not advisory: a query with more than k distinct
   * truth rows means the caller passed un-truncated ground truth — the
   * metric computed would be recall-vs-full-truth while the name
   * promises recall@k — so the plan fails loud at execution (a lazy
   * `raise_error` riding the denominator, zero cost on valid input)
   * instead of silently reporting the wrong metric.
   */
  def recallAtK(
      truth: DataFrame,
      approx: DataFrame,
      qidCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"recallAtK needs k > 0, got $k")
    val t = truth
      .select(col(qidCol).as("query_id"), col(idCol).as("__id")).distinct()
    val a = approx
      .select(col(qidCol).as("query_id"), col(idCol).as("__id")).distinct()
      .withColumn("__hit", lit(1))
    // the guard rides the denominator so column pruning can never
    // drop it: valid rows pass truth_n through unchanged
    val guardedTruthN = when(col("truth_n") > k,
        raise_error(concat(
          lit("recallAtK: query "), col("query_id").cast("string"),
          lit(" has "), col("truth_n").cast("string"),
          lit(s" distinct truth rows > k=$k — pass per-query top-k ground truth"))))
      .otherwise(col("truth_n"))
    t.join(a, Seq("query_id", "__id"), "left")
      .groupBy("query_id")
      .agg(count(col("__hit")).as("hits"), count(lit(1)).as("truth_n"))
      .withColumn("recall_at_k",
        round(col("hits").cast("double") / guardedTruthN.cast("double"), 6))
      .drop("truth_n")
  }

  /** Deterministic pseudo-random ±1 hyperplane component for
    * (plane, dim): parity of the first md5 hex nibble. */
  private def planeSign(plane: Int, dim: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dim".getBytes("UTF-8"))
    if ((hex(0) & 1) == 0) 1 else -1
  }

  /** Precomputed ±1 hyperplanes (driver-side, tiny: planes × dims ints),
    * embedded into the plan as literals — the distributed-friendly
    * version of broadcasting a random projection matrix. */
  def planes(numPlanes: Int, dims: Int): Seq[Seq[Int]] =
    (0 until numPlanes).map(p => (0 until dims).map(d => planeSign(p, d)))

  /** Sign-random-projection bucket id: one bit per hyperplane (sign of
    * the ±1-projection), packed into a bit-string column. The projection
    * is rounded to 6 decimals BEFORE the sign test (mirrored in the
    * oracle twin): float-sum association order differs between engines
    * by ~1e-13, which could otherwise flip the bit of a projection that
    * lands within an ulp of zero and turn into a discrete bucket
    * mismatch. */
  def signBucket(emb: Column, hyperplanes: Seq[Seq[Int]]): Column = {
    val bits = hyperplanes.map { hp =>
      val proj = aggregate(
        zip_with(emb, lit(hp.toArray), (x, s) => x.cast("double") * s.cast("double")),
        lit(0.0),
        (acc, x) => acc + x)
      when(round(proj, 6) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Corpus → (id, bucket) assignment; the ANN index build. Narrow. */
  def signBuckets(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numPlanes: Int,
      dims: Int): DataFrame =
    corpus.select(col(idCol), signBucket(col(embCol), planes(numPlanes, dims)).as("bucket"))

  /**
   * ANN top-k: score only the query's own LSH bucket (plus the query
   * broadcast). Recall < 1 by design; the oracle twin replays the same
   * bucket-restricted search so correctness is still hash-checkable.
   */
  def lshTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      numPlanes: Int,
      dims: Int): DataFrame = {
    requireSingleQuery(queryDf, "lshTopK")
    val hp = planes(numPlanes, dims)
    val bucketed = corpus.withColumn("__bucket", signBucket(col(embCol), hp))
    val q = broadcast(
      queryDf.select(
        col(embCol).as("__q"),
        signBucket(col(embCol), hp).as("__qbucket")))
    bucketed
      .join(q, col("__bucket") === col("__qbucket"))
      .select(col(idCol), cosineFast(corpus.sparkSession, col(embCol), col("__q")).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Banded all-pairs neighbor search — the 100 TB shape. A single
   * sign-bucket join (see [[bucketedNeighbors]]) has two scale failures:
   * with few planes the within-bucket pair count is O(n²/2^planes), and
   * with many planes recall collapses. Banding fixes both: `bands`
   * independent bucket assignments of `planesPerBand` planes each
   * (plane indices `b·planesPerBand until (b+1)·planesPerBand`), a pair
   * is a candidate if it collides in ANY band (OR-amplification), and a
   * deterministic per-bucket cap (`maxBucketSize`, ordered by id) bounds
   * the worst-case bucket join even under adversarial skew. Scale the
   * bucket count with the corpus: `planesPerBand ≳ log2(n / targetBucket)`.
   *
   * Measured at sf0.1 (2 000 vectors, 8 planes/band × 2 bands): 256
   * buckets per band, mean bucket ≈ 7.8, p99 = 19, max = 23 — the pair
   * join touches well under 1 % of the n² pair space.
   */
  def bandedNeighbors(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      planesPerBand: Int,
      bands: Int,
      dims: Int,
      minCosine: Double,
      maxBucketSize: Int = 1000): DataFrame = {
    val all = planes(planesPerBand * bands, dims)
    val bandCols = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        signBucket(col(embCol), all.slice(b * planesPerBand, (b + 1) * planesPerBand))
          .as("bucket"))
    }
    // materialize the (id, emb, band, bucket) index before the self-join
    // (expression-heavy projection; see bucketedNeighbors note)
    val bucketed = corpus
      .select(col(idCol).as("id"), col(embCol).as("emb"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("emb"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .localCheckpoint()
    val w = Window.partitionBy("band", "bucket").orderBy("id")
    val capped = bucketed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBucketSize)
      .drop("__rn")
    val a = capped.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("emb").as("emb_a"))
    val c = capped.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("emb").as("emb_b"))
    a.join(c, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineFast(corpus.sparkSession, col("emb_a"), col("emb_b")).as("cosine_sim"))
      .distinct() // a pair may collide in several bands
      .filter(col("cosine_sim") >= minCosine)
  }

  /**
   * kNN graph over the whole corpus from banded-LSH candidates — the
   * input structure for graph-based clustering and SemDeDup-style
   * neighborhood dedup: every vector's top-`k` neighbors by cosine
   * among its [[bandedNeighbors]] candidates (approximate by
   * construction: only same-bucket pairs compete; recall is the
   * banding trade documented there).
   *
   * Top-k is a pure AGGREGATION, not a window: candidate edges
   * symmetrize, then per-vertex `array_sort` + `slice` over the
   * collected (−cosine_micro, nbr) structs — deterministic integer
   * sort keys, no per-vertex global sort, and the per-vertex list is
   * bounded by `bands · maxBucketSize` candidates. `rank` is dense
   * 1..k by that key.
   */
  def knnGraph(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      planesPerBand: Int,
      bands: Int,
      dims: Int,
      k: Int,
      minCosine: Double,
      maxBucketSize: Int = 1000): DataFrame = {
    require(k >= 1, "knnGraph needs k >= 1")
    val pairs = bandedNeighbors(corpus, idCol, embCol, planesPerBand,
      bands, dims, minCosine, maxBucketSize)
    val sym = pairs
      .select(col("id_a").as("id"), col("id_b").as("nbr"), col("cosine_sim"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nbr"),
        col("cosine_sim")))
    sym
      .select(col("id"), struct(
        (-round(col("cosine_sim") * 1e6, 0).cast("long")).as("nc"),
        col("nbr").as("nbr")).as("e"))
      .groupBy("id")
      .agg(slice(array_sort(collect_list(col("e"))), 1, k).as("top"))
      .select(col("id"), posexplode(col("top")).as(Seq("rank0", "e")))
      .select(col("id"), (col("rank0") + 1).cast("long").as("rank"),
        col("e.nbr").as("nbr"), (-col("e.nc")).as("cos_micro"))
  }

  /**
   * One NN-DESCENT refinement round over a [[knnGraph]]-shaped edge
   * list — "a neighbor of my neighbor is probably my neighbor" (Dong,
   * Moses & Li, WWW'11): candidates are the current edges plus every
   * two-hop path through the SYMMETRIZED graph, re-scored by true
   * cosine, per-vertex top-k kept. An LSH-seeded graph only competes
   * same-bucket pairs, so its edges plateau at the banding recall; a
   * descent round lets every vertex see its neighbors' neighborhoods,
   * which converges toward the exact kNN graph in O(log n) rounds on
   * real metrics (the paper's empirical result).
   *
   * Scale shape: reverse edges are capped at `k` per vertex before the
   * two-hop join (the paper's reverse-sampling — an in-degree hub
   * would otherwise mint in-degree² candidates), so candidates are
   * ≤ 4k² per vertex — n·O(k²) rows total, two embedding joins and one
   * bounded per-vertex aggregation; never corpus×corpus. Output schema
   * = [[knnGraph]]'s (id, rank, nbr, cos_micro), deterministic.
   */
  def nnDescentRound(
      knn: DataFrame,
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "nnDescentRound needs k >= 1")
    val spark = corpus.sparkSession
    val fwd = knn.select(col("id"), col("nbr"))
    // reverse edges capped at k per vertex by (cos desc, nbr asc) —
    // the same bounded aggregation as the forward top-k
    val rev = knn
      .select(col("nbr").as("id"), struct(
        (-col("cos_micro")).as("nc"), col("id").as("nbr")).as("e"))
      .groupBy("id")
      .agg(slice(array_sort(collect_list(col("e"))), 1, k).as("top"))
      .select(col("id"), explode(col("top")).as("e"))
      .select(col("id"), col("e.nbr").as("nbr"))
    // materialized: sym derives from the reverse-cap aggregation (a
    // full-edge-list shuffle) and feeds the plan THREE times (both
    // sides of the two-hop self-join + the candidate union) — without
    // the checkpoint each reference recomputes that shuffle
    val sym = fwd.unionAll(rev).distinct().localCheckpoint()
    val twoHop = sym.as("a").join(sym.as("b"), col("a.nbr") === col("b.id"))
      .select(col("a.id").as("id"), col("b.nbr").as("nbr"))
      .filter(col("id") =!= col("nbr"))
    val cand = sym.unionAll(twoHop).distinct()
    val emb = corpus.select(col(idCol).cast("long").as("__nid"),
      col(embCol).as("__ne"))
    cand
      .join(emb.select(col("__nid").as("id"), col("__ne").as("__ea")), Seq("id"))
      .join(emb.select(col("__nid").as("nbr"), col("__ne").as("__eb")), Seq("nbr"))
      .select(col("id"), struct(
        (-round(cosineFast(spark, col("__ea"), col("__eb")) * 1e6, 0)
          .cast("long")).as("nc"),
        col("nbr").as("nbr")).as("e"))
      .filter(col("e.nc").isNotNull) // zero-norm endpoints are unrankable
      .groupBy("id")
      .agg(slice(array_sort(collect_list(col("e"))), 1, k).as("top"))
      .select(col("id"), posexplode(col("top")).as(Seq("rank0", "e")))
      .select(col("id"), (col("rank0") + 1).cast("long").as("rank"),
        col("e.nbr").as("nbr"), (-col("e.nc")).as("cos_micro"))
  }

  /**
   * [[knnGraph]] + `rounds` of [[nnDescentRound]] — the EDGE-QUALITY
   * build: LSH seeds the neighborhoods, descent rounds converge the
   * edges toward the exact kNN graph. Use it where the edges
   * themselves are the product (mutual-kNN near-dup,
   * [[reciprocalNeighbors]], SemDeDup pruning, graph clustering) —
   * there, truer edges are strictly better. For BEAM-SEARCH
   * navigation the trade is real and measured (BASELINE.md r17
   * recall audit): descent tightens clusters and prunes the
   * accidental long-range links that make a flat graph navigable, so
   * on vanishing-contrast (noise-floor) data beam recall@10 DROPPED
   * 0.200 → 0.150 after one round at 10×; the published navigation
   * fixes are diversified pruning (HNSW's heuristic / DiskANN's
   * α-RNG) or hierarchy, not more descent. Each round
   * localCheckpoints so the lineage doesn't stack joins.
   */
  def knnGraphRefined(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      planesPerBand: Int,
      bands: Int,
      dims: Int,
      k: Int,
      minCosine: Double,
      maxBucketSize: Int = 1000,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 0, "rounds must be >= 0")
    var g = knnGraph(corpus, idCol, embCol, planesPerBand, bands, dims,
      k, minCosine, maxBucketSize)
    (1 to rounds).foreach { _ =>
      g = nnDescentRound(g.localCheckpoint(), corpus, idCol, embCol, k)
    }
    g
  }

  /**
   * Reciprocal nearest neighbors over a [[knnGraph]]: pairs where EACH
   * side ranks the other in its own top-k (the mutual-kNN criterion —
   * public staple of agglomerative/near-dup clustering, e.g. Qin et
   * al. 2011 re-ranking): a one-directional kNN edge often just means
   * "b is popular"; mutuality is the strong duplicate/same-entity
   * signal that survives hubness.
   *
   * Input is the knnGraph's directed edge list (id, rank, nbr,
   * cos_micro) — k·|nodes| rows, never corpus-∝ — and the check is ONE
   * self-equi-join on the ordered pair. Output: (id_a, id_b, rank_ab,
   * rank_ba, cos_micro), id_a < id_b.
   */
  def reciprocalNeighbors(knn: DataFrame): DataFrame = {
    val fwd = knn.filter(col("id") < col("nbr"))
      .select(col("id").as("id_a"), col("nbr").as("id_b"),
        col("rank").as("rank_ab"), col("cos_micro"))
    val bwd = knn.filter(col("id") > col("nbr"))
      .select(col("nbr").as("id_a"), col("id").as("id_b"),
        col("rank").as("rank_ba"))
    fwd.join(bwd, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("rank_ab"), col("rank_ba"),
        col("cos_micro"))
  }

  /**
   * Graph-based ANN: beam (ef-) search over a [[knnGraph]] — the
   * single-layer NSW construction behind HNSW/Vamana (Malkov &
   * Yashunin 2018) with deterministic entry points instead of the
   * level hierarchy. The candidate POOL starts at the `nEntries`
   * lowest corpus ids (replayable), and each of exactly `maxSteps`
   * rounds scores the pool's out-neighbors and keeps the top
   * `beamWidth` of (pool ∪ neighbors) by (cosine desc, id asc) —
   * greedy walks (beam 1) stall in the first local optimum, which is
   * precisely why the public algorithm carries a pool. The answer is
   * the top-`k` of every node VISITED.
   *
   * Why this matters at scale: every other ANN family here (IVF, PQ,
   * LSH) prunes by precomputed partitions; the beam prunes by ADAPTIVE
   * expansion — per query it scores ≤ beamWidth·k·maxSteps vectors
   * (a few hundred), no corpus scan at all. Embeddings and adjacency
   * are point-looked-up per round through [[pointLookup]]: the round's
   * node ids (driver-visible, beam-bounded) become an `isin` literal
   * that reaches the parquet scan as a pushed In filter, so footer
   * min/max skipping prunes the probe instead of rescanning the
   * corpus. The fixed round count (vs converge-detection) keeps the
   * whole search SQL-unrollable — the oracle replays every round,
   * top-`beamWidth` cut included. Single-query wrapper over
   * [[graphSearchBatch]]; output (idCol as long, cosine_sim), top-k by
   * (cosine desc, id asc).
   */
  def graphSearch(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      queryDf: DataFrame,
      graph: DataFrame,
      k: Int,
      nEntries: Int = 4,
      beamWidth: Int = 8,
      maxSteps: Int = 8,
      entries: Seq[Long] = Nil): DataFrame = {
    requireSingleQuery(queryDf, "graphSearch")
    graphSearchBatch(corpus, idCol, embCol,
        queryDf.select(lit(0L).as("__qid"), col(embCol)), "__qid",
        graph, k, nEntries, beamWidth, maxSteps, entries)
      .select(col(idCol), col("cosine_sim"))
  }

  /**
   * Deterministic SPREAD entry seeds for the NSW beam — the id-range
   * stride: seed i = the smallest corpus id ≥ minId + i·(span/n).
   * The lowest-ids rule seeds one corner of the graph; as the corpus
   * (and the NSW diameter) grows, a fixed-step beam from a static
   * corner loses recall — the public fixes are hierarchical entries
   * (HNSW layers) or spread seeds; this is the replayable spread.
   * Measured (BASELINE.md r17 recall audit, 10× fixture): noise-floor
   * recall@10 0.200 corner → 0.313 stride16 (+56% relative); planted-
   * target hit@1 8/8 — the gap to 1.0 is the fixture's vanishing
   * contrast (rank-10/11 cosine margin ~0.003), not navigation. Cost:
   * ONE min/max aggregate + one conditional-min pass — no sort, no
   * window; both are footer-stat-cheap on a range-clustered store.
   * SQL-replayable as n scalar subqueries.
   */
  def strideEntries(corpus: DataFrame, idCol: String, n: Int): Seq[Long] = {
    require(n >= 1, "need at least one entry")
    val mm = corpus.agg(
      min(col(idCol).cast("long")).as("lo"),
      max(col(idCol).cast("long")).as("hi")).head()
    if (mm.isNullAt(0)) return Nil
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1
    val cuts = (0 until n).map(i => lo + i * span / n).distinct
    val aggCols = cuts.map(c =>
      min(when(col(idCol).cast("long") >= c, col(idCol).cast("long")))
        .as(s"__e$c"))
    val agg = corpus.agg(aggCols.head, aggCols.tail: _*).head()
    cuts.indices.flatMap(i =>
      if (agg.isNullAt(i)) None else Some(agg.getLong(i))).distinct
  }

  /**
   * Point lookup of a bounded, driver-visible id set: the ids ride the
   * plan as an `isin` literal, which Spark pushes into the parquet
   * scan (`PushedFilters: In(...)`) so row-group min/max footer stats
   * skip everything but the touched groups — against the
   * range-clustered layouts ([[graft.io.VectorIndex]],
   * [[graft.io.GraphIndex]]) a lookup of b ids reads O(b) row groups,
   * never the corpus. Ids are read as long (the batch-variant
   * contract, [[pqTopKWithBatch]]).
   *
   * Above [[maxIsinLiterals]] ids the literal form stops paying: a
   * ~500k-element `In` bloats the plan and strains driver codegen more
   * than the footer pruning saves (the GraphIngest drain regime —
   * maxBatchLink=4096 × beam geometry). Past the threshold the same
   * id set rides a BROADCAST left-semi join instead: one hashed
   * membership probe executor-side, plan size O(1) in |ids|. A
   * min/max range filter still reaches the scan so footer stats prune
   * the untouched tail of a range-clustered layout.
   */
  def pointLookup(df: DataFrame, idCol: String, ids: Seq[Long]): DataFrame =
    if (ids.size <= maxIsinLiterals) df.filter(col(idCol).isin(ids: _*))
    else {
      val spark = df.sparkSession
      import scala.jdk.CollectionConverters._
      val idDf = spark.createDataFrame(
        ids.distinct.map(org.apache.spark.sql.Row(_)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__pl_id",
            org.apache.spark.sql.types.LongType, nullable = false))))
      df.filter(col(idCol) >= lit(ids.min) && col(idCol) <= lit(ids.max))
        .join(broadcast(idDf), col(idCol) === col("__pl_id"), "left_semi")
    }

  /** Literal-`isin` ceiling for [[pointLookup]] — beyond this the
    * lookup becomes a broadcast semi-join (plan-size O(1)). */
  val maxIsinLiterals: Int = 8192

  /**
   * Graph-based ANN for a query SET — [[graphSearch]]'s production
   * probe shape: one beam per query, but each round's lookups merge
   * across ALL queries into one pruned embedding fetch and one pruned
   * adjacency fetch (the [[pqTopKWithBatch]] amortization applied to
   * the graph regime — a probe service runs thousands of queries; one
   * driver call per query would serialize and rescan).
   *
   * Execution shape per round: (1) adjacency of the pools' nodes not
   * yet expanded — [[pointLookup]] on the graph, collected (≤ pool·k
   * skinny rows); (2) cosine scores for (query, node) pairs not yet
   * scored — the union of frontiers becomes ONE [[pointLookup]] on the
   * corpus, scored executor-side through [[cosineFast]]'s codegen
   * kernel against the broadcast query batch, collected (≤
   * |queries|·beamWidth·k scalar rows). Driver state is beam-geometry-
   * bounded by construction — pools (beamWidth ids/query), the score
   * memo (≤ nEntries + maxSteps·beamWidth·k entries/query), adjacency
   * (k outs per expanded node) — never corpus-∝. Scores memoize, so a
   * re-visited node is never re-fetched (its cosine is deterministic).
   *
   * Semantics per query are EXACTLY the single-query beam: pool starts
   * at the `nEntries` lowest corpus ids scored; each of `maxSteps`
   * rounds scores the pool's out-neighbors and keeps the top
   * `beamWidth` of (pool ∪ neighbors) by (cosine desc, id asc); the
   * answer is the top-`k` of every node visited. Null cosines
   * (zero-norm vectors) are unrankable and drop.
   *
   * Output: (qidCol: long, rank: long, idCol: long, cosine_sim),
   * rank 1..k per query by (cosine desc, id asc).
   */
  def graphSearchBatch(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      qidCol: String,
      graph: DataFrame,
      k: Int,
      nEntries: Int = 4,
      beamWidth: Int = 8,
      maxSteps: Int = 8,
      entries: Seq[Long] = Nil,
      entriesByQuery: Map[Long, Seq[Long]] = Map.empty): DataFrame = {
    require(k >= 1 && nEntries >= 1 && beamWidth >= 1 && maxSteps >= 0,
      "degenerate geometry")
    val spark = corpus.sparkSession
    import scala.jdk.CollectionConverters._
    // the query batch rides the rounds as a broadcast local relation —
    // collected ONCE (a probe batch is small by contract), so scoring
    // rounds never rescan whatever frame produced the queries
    val qSel = queries.select(col(qidCol).cast("long").as("query_id"),
      col(embCol).as("__qe"))
    val qRows = qSel.collect()
    require(qRows.nonEmpty, "graphSearchBatch: empty query set")
    require(qRows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "graphSearchBatch: null query id or embedding")
    val qids = qRows.map(_.getLong(0)).toSeq
    require(qids.distinct.length == qids.length,
      "graphSearchBatch: duplicate query ids")
    val qLocal = broadcast(
      spark.createDataFrame(qRows.toSeq.asJava, qSel.schema))

    // null ids are unaddressable (and would NPE the driver-side beam
    // state) — drop them here instead of relying on input hygiene
    val nodeEmb = corpus.select(col(idCol).cast("long").as("node"),
      col(embCol).as("__e")).filter(col("node").isNotNull)
    val edges = graph.select(col("id").cast("long").as("id"),
      col("nbr").cast("long").as("nbr"))
      .filter(col("id").isNotNull && col("nbr").isNotNull)
    val pairSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false)))

    val simOf = collection.mutable.Map.empty[Long,
      collection.mutable.Map[Long, Double]]
    qids.foreach(q => simOf(q) = collection.mutable.Map.empty)
    val adj = collection.mutable.Map.empty[Long, Array[Long]]

    // one pruned adjacency fetch for the round's not-yet-expanded nodes
    def fetchAdj(ids: Seq[Long]): Unit = {
      val missing = ids.filterNot(adj.contains)
      if (missing.nonEmpty) {
        pointLookup(edges, "id", missing).collect()
          .groupBy(_.getLong(0))
          .foreach { case (i, rs) => adj(i) = rs.map(_.getLong(1)) }
        missing.foreach(i => if (!adj.contains(i)) adj(i) = Array.empty)
      }
    }

    // one pruned embedding fetch + executor-side cosine for the
    // round's not-yet-scored (query, node) pairs, across all queries
    def score(pairs: Seq[(Long, Long)]): Unit = {
      val need = pairs.distinct.filterNot { case (q, n) => simOf(q).contains(n) }
      if (need.isEmpty) return
      val needDf = spark.createDataFrame(
        need.map { case (q, n) => org.apache.spark.sql.Row(q, n) }.asJava,
        pairSchema)
      broadcast(needDf)
        .join(pointLookup(nodeEmb, "node", need.map(_._2).distinct), Seq("node"))
        .join(qLocal, Seq("query_id"))
        .withColumn("__sim", cosineFast(spark, col("__e"), col("__qe")))
        .filter(col("__sim").isNotNull) // zero-norm vectors are unrankable
        .select(col("query_id"), col("node"), col("__sim"))
        .collect()
        .foreach(r => simOf(r.getLong(0))(r.getLong(1)) = r.getDouble(2))
    }

    // deterministic entry seeds: PER-QUERY (`entriesByQuery` — the
    // hierarchical regime: an upper-layer walk hands each query its
    // own near-the-target seeds, [[GraphNav.hierarchicalSearchBatch]]), else
    // shared — caller-supplied (the [[strideEntries]] spread) or, by
    // default, the nEntries lowest corpus ids (one column-pruned
    // TakeOrdered pass)
    val shared: Seq[Long] =
      if (entriesByQuery.nonEmpty && qids.forall(q =>
          entriesByQuery.get(q).exists(_.nonEmpty))) Nil
      else if (entries.nonEmpty) entries.distinct
      else corpus.select(col(idCol).cast("long").as("node"))
        .filter(col("node").isNotNull)
        .orderBy(col("node").asc).limit(nEntries)
        .collect().map(_.getLong(0)).toSeq
    def seedsOf(q: Long): Seq[Long] =
      entriesByQuery.get(q).filter(_.nonEmpty)
        .map(_.distinct).getOrElse(shared)
    score(qids.flatMap(q => seedsOf(q).map(q -> _)))
    def topBeam(q: Long, cand: Seq[Long], width: Int): Seq[Long] =
      cand.distinct.filter(simOf(q).contains)
        .sortBy(n => (-simOf(q)(n), n)).take(width)
    var pool: Map[Long, Seq[Long]] =
      qids.map(q => q -> seedsOf(q).filter(simOf(q).contains)).toMap
    (1 to maxSteps).foreach { _ =>
      fetchAdj(pool.valuesIterator.flatten.toSeq.distinct)
      score(for {
        q <- qids; n <- pool(q); nbr <- adj(n)
      } yield (q, nbr))
      pool = qids.map { q =>
        q -> topBeam(q, pool(q) ++ pool(q).flatMap(adj(_)), beamWidth)
      }.toMap
    }
    val out = qids.flatMap { q =>
      topBeam(q, simOf(q).keys.toSeq, k).zipWithIndex.map { case (n, i) =>
        org.apache.spark.sql.Row(q, (i + 1).toLong, n, simOf(q)(n))
      }
    }
    spark.createDataFrame(out.asJava, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cosine_sim",
        org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /**
   * IVF (inverted-file) coarse quantizer: assign every vector to its
   * nearest of `nlist` centroid vectors (cosine, ties → lowest centroid
   * id). The index build is one narrow pass over the corpus against a
   * BROADCAST centroid table — no corpus shuffle except the per-vector
   * rank (keyed on the vector id). Output: (idCol, list_id).
   *
   * `centroids` here are deterministic seeds (callers typically pass the
   * first `nlist` corpus vectors) so the whole path is oracle-checkable;
   * a production build would train them with k-means|| and keep THIS
   * assignment/probe path unchanged — the quantizer quality changes, the
   * plan shape does not.
   */
  def ivfAssign(
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String,
      embCol: String,
      centIdCol: String,
      centEmbCol: String): DataFrame = {
    val scored = corpus.select(col(idCol), col(embCol))
      .crossJoin(broadcast(centroids.select(
        col(centIdCol).as("__cid"), col(centEmbCol).as("__cemb"))))
      .select(col(idCol),
        col("__cid"),
        cosineFast(corpus.sparkSession, col(embCol), col("__cemb")).as("__csim"))
    val w = Window.partitionBy(idCol).orderBy(col("__csim").desc, col("__cid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__cid").as("list_id"))
  }

  /**
   * IVF ANN top-k: rank the query's `nprobe` nearest inverted lists,
   * then score ONLY vectors assigned to those lists — probe cost drops
   * from O(corpus) to O(corpus·nprobe/nlist). Recall < 1 by design (the
   * standard IVF trade); the oracle twin replays the same probe.
   */
  def ivfTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int): DataFrame = {
    requireSingleQuery(queryDf, "ivfTopK")
    val centroids = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("cid"), col(embCol).as("cemb"))
    val assigned = ivfAssign(corpus, centroids, idCol, embCol, "cid", "cemb")
    val q = queryDf.select(col(embCol).as("__q"))
    val probeLists = broadcast(
      q.crossJoin(broadcast(centroids))
        .select(col("cid"), col("__q"), cosineFast(corpus.sparkSession, col("cemb"), col("__q")).as("__csim"))
        .orderBy(col("__csim").desc, col("cid").asc)
        .limit(nprobe)
        .select(col("cid").as("list_id"), col("__q")))
    corpus.join(assigned, idCol)
      .join(probeLists, "list_id")
      .select(col(idCol), cosineFast(corpus.sparkSession, col(embCol), col("__q")).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * IVF with a TRAINED coarse quantizer: centroids come from Lloyd's
   * k-means ([[Clustering.train]]) instead of the first `nlist` corpus
   * vectors, then the probe path is IDENTICAL in shape to [[ivfTopK]]
   * — rank the query's `nprobe` nearest lists, score only vectors
   * assigned there. Training cost is `iters` corpus passes paid ONCE
   * at index build; the quantizer quality changes (balanced lists →
   * better recall at the same nprobe), the probe plan does not.
   *
   * List assignment and list ranking go through [[Clustering.assign]]'s
   * rounded HOF cosine (6 decimals, ties → lowest centroid id) so the
   * whole path — training included — stays oracle-replayable; the
   * final candidate scoring uses the codegen'd [[cosineFast]] kernel,
   * same as every other ANN path.
   */
  def ivfTopKTrained(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int,
      iters: Int): DataFrame = {
    requireSingleQuery(queryDf, "ivfTopKTrained")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Clustering.train(corpus, idCol, embCol, nlist, iters)
    val assigned = Clustering.assign(corpus, idCol, embCol, cents)
      .select(col(idCol), col("cluster").as("list_id"))
    val centDf = cents.toDF("cid", "cemb") // nlist rows — broadcast literal
    val q = queryDf.select(col(embCol).as("__q"))
    val probeLists = broadcast(
      q.crossJoin(broadcast(centDf))
        .select(col("cid"), col("__q"), cosine(col("cemb"), col("__q")).as("__csim"))
        .orderBy(col("__csim").desc, col("cid").asc)
        .limit(nprobe)
        .select(col("cid").as("list_id"), col("__q")))
    corpus.join(assigned, idCol)
      .join(probeLists, "list_id")
      .select(col(idCol), cosineFast(spark, col(embCol), col("__q")).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * [[ivfTopKTrained]] for a query SET: ONE training run, ONE corpus
   * assignment, then every query ranks its own `nprobe` lists inside
   * the same broadcast (a per-query window over the queries×nlist
   * centroid frame — tiny) and all candidate scoring rides one join.
   * A vector assigned to a list probed by several queries is scored
   * once per probing query — exactly the per-query candidate sets of
   * N single-query runs, in one job. Final ranking is the salted
   * two-stage [[perQueryTopK]]. Output: (query_id, rank, idCol,
   * cosine_sim).
   */
  def ivfTopKTrainedBatch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      qidCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int,
      iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Clustering.train(corpus, idCol, embCol, nlist, iters)
    val assigned = Clustering.assign(corpus, idCol, embCol, cents)
      .select(col(idCol), col("cluster").as("list_id"))
    val centDf = cents.toDF("cid", "cemb") // nlist rows — broadcast literal
    val q = queries.select(col(qidCol).as("query_id"), col(embCol).as("__q"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("__csim").desc, col("cid").asc)
    val probeLists = broadcast(
      q.crossJoin(broadcast(centDf))
        .select(col("query_id"), col("cid"), col("__q"),
          cosine(col("cemb"), col("__q")).as("__csim"))
        .withColumn("__rn", row_number().over(wq))
        .filter(col("__rn") <= nprobe)
        .select(col("query_id"), col("cid").as("list_id"), col("__q")))
    val scored = corpus.join(assigned, idCol)
      .join(probeLists, "list_id")
      .select(col("query_id"), col(idCol),
        cosineFast(spark, col(embCol), col("__q")).as("cosine_sim"))
    perQueryTopK(scored, "query_id", idCol, "cosine_sim", k)
      .select(col("query_id"), col("rank"), col(idCol), col("cosine_sim"))
  }

  /** Train the per-block PQ codebooks (one k-means per slice). */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      blocks: Int,
      k: Int,
      iters: Int): Seq[Seq[(Long, Seq[Double])]] = {
    require(blocks >= 1 && dims % blocks == 0, "blocks must divide dims")
    val d = dims / blocks
    (0 until blocks).map { b =>
      val sub = corpus.select(col(idCol), slice(col(embCol), b * d + 1, d).as(embCol))
      Clustering.train(sub, idCol, embCol, k, iters)
    }
  }

  /** Encode against trained codebooks: ONE narrow projection. */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    val d = dims / codebooks.size
    val codeCols = codebooks.zipWithIndex.map { case (cents, b) =>
      Clustering.nearestCentroid(slice(col(embCol), b * d + 1, d), cents).as(s"code_$b")
    }
    corpus.select(col(idCol) +: codeCols: _*)
  }

  /**
   * Product-quantization codes (the FAISS IVF-PQ compression block):
   * each embedding splits into `blocks` contiguous sub-vectors; each
   * block gets its OWN k-means codebook ([[Clustering.train]] on the
   * slice) and every vector's block is replaced by its nearest code id.
   * `dims/blocks · blocks` floats compress to `blocks` small ints —
   * the memory move that lets a 100 TB embedding corpus fit an ANN
   * index in RAM.
   *
   * Training is `blocks × iters` bounded passes paid once at index
   * build ([[pqCodebooks]]). ENCODING is the part that must scale, and
   * it is ONE narrow projection ([[pqEncode]]): all `blocks` argmaxes
   * (`greatest(struct)` over literal centroids) evaluate in the same
   * whole-stage-codegen pass — no joins, no shuffles, no per-block
   * scans.
   *
   * Output: (idCol, code_0 … code_{blocks−1}); code ids are seed ids
   * within the block's codebook (deterministic, oracle-replayable).
   */
  def pqCodes(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      blocks: Int,
      k: Int,
      iters: Int): DataFrame =
    pqEncode(corpus, idCol, embCol, dims,
      pqCodebooks(corpus, idCol, embCol, dims, blocks, k, iters))

  /**
   * PQ asymmetric-distance top-k (MIPS form): approximate inner
   * product `dot(q, x) ≈ Σ_b dot(q_b, codebook_b[code_b])`. The query
   * side is EXACT (never quantized — that is the "asymmetric"); the
   * corpus side is looked up from `blocks` tiny code→value maps
   * computed once per query on the driver (blocks × k doubles). Search
   * therefore touches ONLY the integer code table — the compressed
   * representation is the working set, which is the entire point of PQ
   * at 100 TB — in one narrow projection + `TakeOrderedAndProject`.
   *
   * Inner product, not cosine: dot decomposes additively across blocks
   * (cosine's norm does not). Output: (idCol, approx_dot) top `topK`
   * by (score desc, id asc).
   */
  def pqTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      topK: Int,
      dims: Int,
      blocks: Int,
      k: Int,
      iters: Int): DataFrame =
    pqTopKWith(corpus, queryDf, idCol, embCol, topK, dims,
      pqCodebooks(corpus, idCol, embCol, dims, blocks, k, iters))

  /** [[pqTopK]] against ALREADY-TRAINED codebooks — the steady-state
    * query path (training is an index-build cost, paid once). */
  def pqTopKWith(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      topK: Int,
      dims: Int,
      codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    val blocks = codebooks.size
    val d = dims / blocks
    val qRows = queryDf.select(col(embCol)).limit(2).collect()
    require(qRows.length == 1,
      s"pqTopKWith expects exactly one query row, got " +
        s"${if (qRows.isEmpty) "none" else "2+"} — use pqTopKWithBatch for query sets")
    val q = qRows.head.getSeq[Float](0)
    require(q.size == dims, s"query has ${q.size} dims, expected $dims")
    val codes = pqEncode(corpus, idCol, embCol, dims, codebooks)
    val score = codebooks.zipWithIndex.map { case (cents, b) =>
      val table = cents.map { case (cid, cent) =>
        cid -> (0 until d).map(i => q(b * d + i).toDouble * cent(i)).sum
      }.toMap
      element_at(typedlit(table), col(s"code_$b"))
    }.reduce(_ + _)
    codes
      .select(col(idCol), round(score, 6).as("approx_dot"))
      .orderBy(col("approx_dot").desc, col(idCol).asc)
      .limit(topK)
  }

  /**
   * [[pqTopKWith]] for a query SET: the per-block code→partial-dot
   * lookup becomes a NESTED map (query → code → partial, still
   * driver-computed constants: queries × blocks × k doubles — the
   * query table is small by contract, it rides the plan as a literal
   * just like the single-query tables), so scoring all N queries stays
   * one narrow projection over the integer code table. Final ranking
   * is the salted two-stage [[perQueryTopK]]. Output: (query_id, rank,
   * idCol, approx_dot). Query ids must be distinct and are read as
   * long.
   */
  def pqTopKWithBatch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      qidCol: String,
      topK: Int,
      dims: Int,
      codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    val blocks = codebooks.size
    val d = dims / blocks
    val qs = queries.select(col(qidCol).cast("long"), col(embCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    require(qs.nonEmpty, "pqTopKWithBatch: empty query set")
    require(qs.map(_._1).distinct.length == qs.length,
      "pqTopKWithBatch: duplicate query ids")
    qs.foreach { case (qid, q) =>
      require(q.size == dims, s"query $qid has ${q.size} dims, expected $dims") }
    val codes = pqEncode(corpus, idCol, embCol, dims, codebooks)
    val qids = broadcast(
      queries.select(col(qidCol).cast("long").as("query_id")))
    val score = codebooks.zipWithIndex.map { case (cents, b) =>
      val table: Map[Long, Map[Long, Double]] = qs.map { case (qid, q) =>
        qid -> cents.map { case (cid, cent) =>
          cid -> (0 until d).map(i => q(b * d + i).toDouble * cent(i)).sum
        }.toMap
      }.toMap
      element_at(element_at(typedlit(table), col("query_id")), col(s"code_$b"))
    }.reduce(_ + _)
    val scored = codes
      .crossJoin(qids)
      .select(col("query_id"), col(idCol), round(score, 6).as("approx_dot"))
    perQueryTopK(scored, "query_id", idCol, "approx_dot", topK)
      .select(col("query_id"), col("rank"), col(idCol), col("approx_dot"))
  }

  /**
   * IVF-PQ with residual encoding — the FAISS composite index: the
   * coarse quantizer ([[Clustering.train]], [[ivfTopKTrained]]'s
   * trainer) routes every vector to a list, the vector's RESIDUAL
   * against its list centroid is product-quantized ([[pqCodebooks]] on
   * residuals — residuals cluster far tighter than raw vectors, the
   * whole point of the composite), and search scores only the probed
   * lists' integer codes: `dot(q, x) ≈ dot(q, c_list) + Σ_b
   * dot(q_b, codebook_b[code_b])` — the first term a per-list constant
   * lookup, the second the standard ADC table.
   *
   * Scale shape: training is bounded passes paid at index build;
   * encode is one narrow projection (+ one broadcast map lookup for
   * the centroid); search touches only `nprobe/nlist` of the code
   * table, never a float vector — compressed working set AND pruned
   * scan in the same index, exactly the 100 TB serving layout. The
   * residual frame is `localCheckpoint`ed: it feeds `blocks × iters`
   * training passes plus the encode.
   *
   * Output: (idCol, approx_dot) — top `topK` by (score desc, id asc).
   */
  def ivfPqTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      topK: Int,
      dims: Int,
      nlist: Int,
      nprobe: Int,
      coarseIters: Int,
      blocks: Int,
      k: Int,
      pqIters: Int): DataFrame = {
    requireSingleQuery(queryDf, "ivfPqTopK")
    val spark = corpus.sparkSession
    import spark.implicits._
    require(blocks >= 1 && dims % blocks == 0, "blocks must divide dims")
    val d = dims / blocks
    val cents = Clustering.train(corpus, idCol, embCol, nlist, coarseIters)
    val centMap = typedlit(cents.toMap)
    val res = Clustering.assign(corpus, idCol, embCol, cents)
      .select(col(idCol), col("cluster").as("list_id"),
        zip_with(col(embCol), element_at(centMap, col("cluster")),
          (x, c) => (x.cast("double") - c).cast("float")).as("__res"))
      .localCheckpoint()
    val books = pqCodebooks(res, idCol, "__res", dims, blocks, k, pqIters)
    val codeCols = books.zipWithIndex.map { case (cs, b) =>
      Clustering.nearestCentroid(slice(col("__res"), b * d + 1, d), cs).as(s"code_$b")
    }
    val codes = res.select(col(idCol) +: col("list_id") +: codeCols: _*)
    val centDf = cents.toDF("cid", "cemb")
    val q = queryDf.select(col(embCol).as("__q"))
    val probeLists = broadcast(
      q.crossJoin(broadcast(centDf))
        .select(col("cid"), cosine(col("cemb"), col("__q")).as("__csim"))
        .orderBy(col("__csim").desc, col("cid").asc)
        .limit(nprobe)
        .select(col("cid").as("list_id")))
    val qv = queryDf.select(col(embCol)).collect().head.getSeq[Float](0)
    require(qv.size == dims, s"query has ${qv.size} dims, expected $dims")
    val adc = books.zipWithIndex.map { case (cs, b) =>
      val table = cs.map { case (cid, cent) =>
        cid -> (0 until d).map(i => qv(b * d + i).toDouble * cent(i)).sum
      }.toMap
      element_at(typedlit(table), col(s"code_$b"))
    }.reduce(_ + _)
    val corr = cents.map { case (cid, c) =>
      cid -> (0 until dims).map(i => qv(i).toDouble * c(i)).sum
    }.toMap
    codes.join(broadcast(probeLists), "list_id")
      .select(col(idCol),
        round(element_at(typedlit(corr), col("list_id")) + adc, 6).as("approx_dot"))
      .orderBy(col("approx_dot").desc, col(idCol).asc)
      .limit(topK)
  }

  /**
   * [[ivfPqTopK]] for a query SET — one training run, one residual
   * encode, one scan of the probed lists' codes serves every query:
   * the ADC tables become nested (query → code) literal maps and the
   * per-list corrections a nested (query → list) map (queries × nlist
   * doubles — driver constants like the single-query tables); each
   * query ranks its own `nprobe` lists in the broadcast centroid
   * frame, and candidates score only against the queries that probed
   * their list. Final ranking is the salted two-stage
   * [[perQueryTopK]]. Output: (query_id, rank, idCol, approx_dot);
   * query ids must be distinct.
   */
  def ivfPqTopKBatch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      qidCol: String,
      topK: Int,
      dims: Int,
      nlist: Int,
      nprobe: Int,
      coarseIters: Int,
      blocks: Int,
      k: Int,
      pqIters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(blocks >= 1 && dims % blocks == 0, "blocks must divide dims")
    val d = dims / blocks
    val qs = queries.select(col(qidCol).cast("long"), col(embCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    require(qs.nonEmpty, "ivfPqTopKBatch: empty query set")
    require(qs.map(_._1).distinct.length == qs.length,
      "ivfPqTopKBatch: duplicate query ids")
    qs.foreach { case (qid, q) =>
      require(q.size == dims, s"query $qid has ${q.size} dims, expected $dims") }
    val cents = Clustering.train(corpus, idCol, embCol, nlist, coarseIters)
    val centMap = typedlit(cents.toMap)
    val res = Clustering.assign(corpus, idCol, embCol, cents)
      .select(col(idCol), col("cluster").as("list_id"),
        zip_with(col(embCol), element_at(centMap, col("cluster")),
          (x, c) => (x.cast("double") - c).cast("float")).as("__res"))
      .localCheckpoint()
    val books = pqCodebooks(res, idCol, "__res", dims, blocks, k, pqIters)
    val codeCols = books.zipWithIndex.map { case (cs, b) =>
      Clustering.nearestCentroid(slice(col("__res"), b * d + 1, d), cs).as(s"code_$b")
    }
    val codes = res.select(col(idCol) +: col("list_id") +: codeCols: _*)
    val centDf = cents.toDF("cid", "cemb")
    val q = queries.select(col(qidCol).cast("long").as("query_id"),
      col(embCol).as("__q"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("__csim").desc, col("cid").asc)
    val probePairs = broadcast(
      q.crossJoin(broadcast(centDf))
        .select(col("query_id"), col("cid"),
          cosine(col("cemb"), col("__q")).as("__csim"))
        .withColumn("__rn", row_number().over(wq))
        .filter(col("__rn") <= nprobe)
        .select(col("query_id"), col("cid").as("list_id")))
    val adc = books.zipWithIndex.map { case (cs, b) =>
      val table: Map[Long, Map[Long, Double]] = qs.map { case (qid, qv) =>
        qid -> cs.map { case (cid, cent) =>
          cid -> (0 until d).map(i => qv(b * d + i).toDouble * cent(i)).sum
        }.toMap
      }.toMap
      element_at(element_at(typedlit(table), col("query_id")), col(s"code_$b"))
    }.reduce(_ + _)
    val corr: Map[Long, Map[Long, Double]] = qs.map { case (qid, qv) =>
      qid -> cents.map { case (cid, c) =>
        cid -> (0 until dims).map(i => qv(i).toDouble * c(i)).sum
      }.toMap
    }.toMap
    val scored = codes.join(probePairs, "list_id")
      .select(col("query_id"), col(idCol),
        round(element_at(element_at(typedlit(corr), col("query_id")), col("list_id"))
          + adc, 6).as("approx_dot"))
    perQueryTopK(scored, "query_id", idCol, "approx_dot", topK)
      .select(col("query_id"), col("rank"), col(idCol), col("approx_dot"))
  }

  /** All-pairs top-k neighbors per vector within LSH buckets (the
    * batch "kNN graph" builder): join within buckets, rank per source
    * id. Used for embedding-cosine near-dup detection. Single-band —
    * prefer [[bandedNeighbors]] beyond toy corpus sizes. */
  def bucketedNeighbors(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numPlanes: Int,
      dims: Int,
      minCosine: Double): DataFrame = {
    val hp = planes(numPlanes, dims)
    // Materialize the bucketed projection before the self-join —
    // otherwise the join re-evaluates the numPlanes dot-product
    // expressions per candidate row instead of once per vector.
    // localCheckpoint, not persist: persist's cache build bypasses
    // codegen and re-evaluates expression-heavy projections ~8× slower
    // (same pathology as the MinHash index in Dedup.candidatePairs).
    val b = corpus.select(
      col(idCol).as("id"),
      col(embCol).as("emb"),
      signBucket(col(embCol), hp).as("bucket"))
      .localCheckpoint()
    val a = b.select(col("id").as("id_a"), col("emb").as("emb_a"), col("bucket"))
    val c = b.select(col("id").as("id_b"), col("emb").as("emb_b"), col("bucket"))
    a.join(c, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        cosineFast(corpus.sparkSession, col("emb_a"), col("emb_b")).as("cosine_sim"))
      .filter(col("cosine_sim") >= minCosine)
  }

  /**
   * Random-projection (Johnson–Lindenstrauss) compressed retrieval:
   * project every vector onto `projDims` deterministic ±1 hyperplanes
   * (the [[planes]] matrix — the same public-seed construction the
   * sign-LSH path uses, kept UNQUANTIZED here), rank by cosine in the
   * compressed space, then exact-rerank the top `k·rerankFactor`
   * candidates on the full vectors. The classic two-stage shape:
   * stage 1 touches `projDims`-sized arrays (4× fewer multiplies at
   * 64→16), stage 2 pays full cost on a candidate set ∝ k, not ∝
   * corpus.
   *
   * Scale shape: the projection is a narrow per-row expression over a
   * broadcast literal matrix (no shuffle); stage-1 ranking is
   * `TakeOrderedAndProject`-bounded; stage 2 joins only the candidate
   * ids back to the corpus. Exactness caveat (the JL trade): recall
   * is probabilistic in `projDims` — candidates are whatever the
   * compressed cosine ranks highest, deterministically replayable.
   *
   * Output: (idCol, cosine_sim) — exact cosines, top-k of the
   * candidate set, ties → lowest id.
   */
  def projectedTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      projDims: Int,
      dims: Int,
      rerankFactor: Int = 4): DataFrame = {
    requireSingleQuery(queryDf, "projectedTopK")
    val mat = planes(projDims, dims)
    def proj(c: Column): Column = array(
      mat.map(p => dot(c, typedlit(p.map(_.toDouble)))): _*)
    val cp = corpus.select(col(idCol).as("id"), col(embCol).as("emb"),
      proj(col(embCol)).as("p"))
    val qp = broadcast(queryDf.select(proj(col(embCol)).as("qp"),
      col(embCol).as("qemb")))
    val cand = cp.crossJoin(qp)
      .select(col("id"), col("emb"), col("qemb"), cosine(col("p"), col("qp")).as("__pc"))
      .orderBy(col("__pc").desc, col("id").asc)
      .limit(k * rerankFactor)
    cand
      .select(col("id").as(idCol),
        cosineFast(corpus.sparkSession, col("emb"), col("qemb")).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Incremental semantic dedup — the daily-batch shape of
   * [[semanticDedup]]: new vectors are screened against the DURABLE
   * vector index ([[graft.io.VectorIndex.probeThreshold]] — all
   * corpus matches ≥ threshold in the probed lists, arrival order:
   * the corpus copy always wins) and then against each other
   * (keep-first by id within the batch). The corpus is never
   * re-scored; probe IO is `nprobe/nlist` of the stored lists, and
   * the batch-internal pass is batch × batch (the batch is small by
   * contract — a day's arrivals, not a corpus).
   *
   * Output: (idCol, reason, keep) — one row per batch vector; reason
   * = 'corpus' | 'batch' | NULL, keep ⇔ reason IS NULL.
   */
  def incrementalSemanticDedup(
      batch: DataFrame,
      idCol: String,
      embCol: String,
      indexDir: String,
      threshold: Double,
      nprobe: Int): DataFrame = {
    // The index probe reads the column named by the index's stored
    // vecCol; align the caller's embCol to it explicitly so a batch
    // whose embedding column is named differently (or that happens to
    // carry an unrelated column under that name) can't feed the two
    // passes different vectors.
    val vecCol = graft.io.VectorIndex.meta(batch.sparkSession, indexDir).vecCol
    val probeFrame =
      if (embCol == vecCol) batch
      else batch.select(col(idCol), col(embCol).as(vecCol))
    val corpusDups = graft.io.VectorIndex
      .probeThreshold(probeFrame, idCol, indexDir, threshold, nprobe)
      .select(col("query_id").as(idCol)).distinct()
      .withColumn("__corpus", lit(true))
    batch.select(col(idCol))
      .join(corpusDups, Seq(idCol), "left")
      .join(batchInternalDups(batch, idCol, embCol, threshold), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__corpus"), lit("corpus"))
          .when(col("__batch"), lit("batch"))
          .otherwise(lit(null).cast("string")).as("reason"),
        (col("__corpus").isNull && col("__batch").isNull).as("keep"))
  }

  /** The batch-internal keep-first pass of [[incrementalSemanticDedup]]
    * (also the whole decision on a BOOTSTRAP wave, when no index exists
    * yet): ids with a lower-id batch mate at cosine ≥ threshold, marked
    * `__batch`. The batch is small by contract — this is pairwise. */
  private[graft] def batchInternalDups(
      batch: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double): DataFrame = {
    val lo = batch.select(col(idCol).as("__lo"), col(embCol).as("__elo"))
    val hi = batch.select(col(idCol).as("__hi"), col(embCol).as("__ehi"))
    lo.crossJoin(hi)
      .filter(col("__lo") < col("__hi"))
      .filter(cosineFast(batch.sparkSession, col("__elo"), col("__ehi")) >= threshold)
      .select(col("__hi").as(idCol)).distinct()
      .withColumn("__batch", lit(true))
  }

  /**
   * SemDeDup-style semantic dedup: k-means partitions the embedding
   * space, then near-dup pruning runs ONLY within each cluster — the
   * corpus-wide O(N²) pairwise cosine collapses to Σ|cluster|², and
   * the cluster id is the join/shuffle key. At 100 TB the production
   * knob is `k` itself (SemDeDup's regime is k ≈ N/10³, keeping every
   * cluster's pair block bounded); the pair join never shuffles the
   * corpus on anything but the cluster id, so AQE's skew split is the
   * guardrail for an unbalanced quantizer, exactly as in
   * [[bandedNeighbors]]'s bucket join.
   *
   * Keep policy (deterministic, oracle-replayable): a vector survives
   * iff its cluster holds NO lower-id vector with cosine ≥
   * `threshold` — "keep lowest id per semantic dup set", the same
   * convention as every destructive dedup in [[graft.ops.Dedup]].
   *
   * Output: (idCol, cluster, keep) — one row per input vector.
   */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int,
      threshold: Double): DataFrame = {
    val centroids = Clustering.train(corpus, idCol, embCol, k, iters)
    // materialize the assignment once — it feeds both sides of the
    // pair join and the final decision frame, and the k·dims argmax
    // projection is expression-heavy (same reasoning as
    // bucketedNeighbors' index materialization)
    val assigned = Clustering.assign(corpus, idCol, embCol, centroids)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("cluster"))
      .localCheckpoint()
    val lo = assigned.select(
      col("cluster"), col("id").as("__lo"), col("emb").as("__elo"))
    val hi = assigned.select(
      col("cluster"), col("id").as("__hi"), col("emb").as("__ehi"))
    val dropped = lo.join(hi, Seq("cluster"))
      .filter(col("__lo") < col("__hi"))
      .filter(
        cosineFast(corpus.sparkSession, col("__elo"), col("__ehi")) >= threshold)
      .select(col("__hi").as("id"))
      .distinct()
    assigned
      .join(dropped.withColumn("__drop", lit(true)), Seq("id"), "left")
      .select(
        col("id").as(idCol),
        col("cluster"),
        col("__drop").isNull.as("keep"))
  }

  /**
   * Embedding-column quality audit — the pre-index health check:
   * corrupt vectors (NaN components, zero norms, wrong dimensionality)
   * poison an ANN index SILENTLY — a NaN propagates through every
   * dot product it touches, a zero vector has undefined cosine, a
   * truncated vector skews any centroid it lands in — and none of them
   * crash the build. One narrow scan, one 1-row decomposable
   * aggregate: n_vectors, the three corruption counts, and min/max
   * norm over the healthy rows (rounded 6, the engine-parity
   * convention).
   */
  def vectorAudit(
      df: DataFrame,
      embCol: String,
      expectedDims: Int): DataFrame = {
    require(expectedDims >= 1, "expectedDims must be positive")
    val e = col(embCol)
    val norm = sqrt(aggregate(e, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val dimsOk = size(e) === expectedDims
    val hasNan = exists(e, x => isnan(x))
    val healthy = dimsOk && !hasNan
    df.select(
        dimsOk.as("__dims_ok"), hasNan.as("__nan"),
        norm.as("__norm"), healthy.as("__healthy"))
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(when(!col("__dims_ok"), 1L).otherwise(0L)).as("n_wrong_dims"),
        sum(when(col("__nan"), 1L).otherwise(0L)).as("n_nan"),
        sum(when(col("__healthy") && col("__norm") < 1e-6, 1L)
          .otherwise(0L)).as("n_zero_norm"),
        round(min(when(col("__healthy"), col("__norm"))), 6).as("min_norm"),
        round(max(when(col("__healthy"), col("__norm"))), 6).as("max_norm"))
  }

  /**
   * Seed-centroid quality scoring — the classifier-free embedding
   * quality signal from the data-selection literature: a small curated
   * SEED set defines "good" as its centroid, and every corpus vector
   * scores by cosine to it (domain routing, quality fencing, "more
   * like these" selection — the lightweight sibling of a trained
   * classifier).
   *
   * Determinism contract (cross-engine/partitioning): components are
   * rounded to 6 dp and summed as exact DECIMALs (order-independent —
   * a plain float mean varies with partition merge order), the per-dim
   * mean re-rounds at 6, and the centroid is cast to FLOAT (both
   * engines' nearest-float of the same decimal). Scoring then rides
   * the codegen cosine kernel with the centroid as ONE literal array.
   *
   * Scale shape: the centroid is a dims-bounded aggregation over the
   * SEEDS (seed-∝, collected as `dims` driver rows — same class as a
   * query vector); scoring is one narrow codegen scan of the corpus,
   * no shuffle, no join.
   */
  def seedCentroid(seeds: DataFrame, embCol: String): Array[Float] =
    seeds.select(posexplode(col(embCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg(round(
        sum(round(col("x").cast("double"), 6).cast("decimal(18,6)"))
          .cast("double") / count(lit(1)), 6).as("c"))
      .orderBy("i")
      .collect().map(_.getDouble(1).toFloat)

  /** Corpus scored against a seed centroid: (idCol, cos) — see
    * [[seedCentroid]]. */
  def seedCentroidScores(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      centroid: Array[Float]): DataFrame = {
    val spark = corpus.sparkSession
    corpus.select(col(idCol),
      cosineFast(spark, col(embCol), typedlit(centroid)).as("cos"))
  }

  /**
   * Train SQ8 scalar-quantization ranges: the per-dimension (min, max)
   * over the corpus — ONE aggregation, output dims-bounded
   * (driver-sized by design, like a PQ codebook). Exact: min/max
   * involve no float summation, so both engines compute identical
   * doubles.
   */
  def sqRanges(
      corpus: DataFrame, embCol: String, dims: Int): Seq[(Double, Double)] = {
    require(dims >= 1, "sqRanges needs dims >= 1")
    val aggs = (0 until dims).flatMap { d =>
      val x = element_at(col(embCol), d + 1).cast("double")
      Seq(min(x).as(s"mn_$d"), max(x).as(s"mx_$d"))
    }
    val row = corpus.agg(aggs.head, aggs.tail: _*).head()
    (0 until dims).map(d => (row.getDouble(2 * d), row.getDouble(2 * d + 1)))
  }

  /**
   * SQ8 encode (the FAISS `SQ8` / scalar-quantizer compression block,
   * public): each float dimension maps to an integer code in [0, 255]
   * via `floor((x − min) / (max − min) · 255)` (clamped; a degenerate
   * constant dimension codes 0). 64 floats → 64 bytes conceptually —
   * the simpler sibling of PQ: no training iterations, no codebook
   * search, reconstruction error bounded per-dimension instead of
   * per-block.
   *
   * Ranges are driver literals, so encoding is ONE narrow codegen
   * projection — no joins, no shuffles; identical floor/clamp
   * arithmetic replays in the oracle.
   */
  def sqEncode(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      dims: Int,
      ranges: Seq[(Double, Double)]): DataFrame = {
    require(ranges.length == dims, s"ranges must have $dims entries")
    val codes = (0 until dims).map { d =>
      val (mn, mx) = ranges(d)
      val x = element_at(col(embCol), d + 1).cast("double")
      if (mx == mn) lit(0L)
      else least(greatest(
        floor((x - lit(mn)) / lit(mx - mn) * lit(255.0)).cast("long"),
        lit(0L)), lit(255L))
    }
    corpus.select(col(idCol), array(codes: _*).as("codes"))
  }

  /**
   * SQ8 asymmetric-distance top-k (MIPS form): approximate inner
   * product against the DEQUANTIZED corpus codes — the query side
   * stays exact (the "asymmetric" of the ADC family), the corpus side
   * reconstructs each dimension at its bucket midpoint
   * `min + (code + 0.5) · (max − min)/256`. Search touches only the
   * integer code table + the dims-bounded range literals: one narrow
   * projection + `TakeOrderedAndProject`, never the float embeddings —
   * the working-set shrink that makes a 100 TB vector corpus
   * RAM-resident. Scores fold left-to-right over dimensions and round
   * to 6 decimals (the [[dot]] determinism contract).
   */
  def sqTopKWith(
      codes: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      topK: Int,
      dims: Int,
      ranges: Seq[(Double, Double)]): DataFrame = {
    require(ranges.length == dims, s"ranges must have $dims entries")
    requireSingleQuery(queryDf, "sqTopKWith")
    val q = queryDf.select(col(embCol)).head().getSeq[Float](0)
    require(q.length == dims, s"query must have $dims dims, got ${q.length}")
    val qArr = array(q.map(v => lit(v.toDouble)): _*)
    val recon = array((0 until dims).map { d =>
      val (mn, mx) = ranges(d)
      lit(mn) + (element_at(col("codes"), d + 1) + lit(0.5)) * lit((mx - mn) / 256.0)
    }: _*)
    codes
      .select(col(idCol), round(dot(qArr, recon), 6).as("approx_dot"))
      .orderBy(col("approx_dot").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Train + encode + search in one call (the q70/q71 convenience
    * shape; production persists [[sqEncode]]'s codes and calls
    * [[sqTopKWith]] per query). */
  def sqTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      topK: Int,
      dims: Int): DataFrame = {
    val ranges = sqRanges(corpus, embCol, dims)
    sqTopKWith(sqEncode(corpus, idCol, embCol, dims, ranges),
      queryDf, idCol, embCol, topK, dims, ranges)
  }

  /**
   * Multi-probe LSH (Lv et al., VLDB 2007, public): probe the query's
   * own sign-bucket PLUS every bucket at Hamming distance 1 (one
   * flipped hyperplane sign) — the recall repair for single-bucket LSH,
   * whose misses are exactly the near-neighbors that landed a
   * hairline's width across one hyperplane. numPlanes+1 buckets probed
   * instead of 2^numPlanes scanned: recall strictly ⊇ [[lshTopK]]'s at
   * ~(numPlanes+1)/2^numPlanes of the corpus touched (expected).
   *
   * The probe set is a driver literal (the query row is one vector, so
   * its bucket string and the flips are computed once) — the corpus
   * side stays ONE narrow bucketed scan with an `isin` filter, no
   * shuffle, top-k via `TakeOrderedAndProject`. With a bucket-
   * partitioned durable index the isin becomes partition pruning.
   */
  def multiProbeTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      numPlanes: Int,
      dims: Int): DataFrame = {
    requireSingleQuery(queryDf, "multiProbeTopK")
    val hp = planes(numPlanes, dims)
    val qBucket = queryDf.select(signBucket(col(embCol), hp).as("b"))
      .head().getString(0)
    val probeSet = qBucket +: (0 until numPlanes).map { i =>
      qBucket.updated(i, if (qBucket.charAt(i) == '1') '0' else '1')
    }
    val q = broadcast(queryDf.select(col(embCol).as("__q")))
    corpus
      .withColumn("__bucket", signBucket(col(embCol), hp))
      .filter(col("__bucket").isin(probeSet: _*))
      .crossJoin(q)
      .select(col(idCol),
        cosineFast(corpus.sparkSession, col(embCol), col("__q"))
          .as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Hard-negative mining (the dense-retrieval training-data staple —
   * Karpukhin et al. 2020 DPR, public): for each query, the most
   * SIMILAR candidates that are NOT positives (here: not the query
   * itself and not sharing its `groupCol` — cluster label, source,
   * whatever defines "same thing"). Random negatives are too easy;
   * the gradient signal lives in the near-misses.
   *
   * Mining runs the standard two-stage shape: an over-fetched
   * retrieval cut (`k · overFetch` per query — the ANN stage of a
   * production miner; brute-force here so the cut itself is exact and
   * oracle-replayable), then the group filter, then a per-query
   * re-rank to k. The FILTER-AFTER-CUT contract is deliberate and
   * documented: a query whose top-R is flooded by its own positives
   * yields fewer than k negatives — raise `overFetch`, don't scan the
   * corpus. All joins after the cut are (queries·R)-row frames.
   *
   * Output: (query_id, rank, idCol, cosine_sim), rank ≤ k per query.
   */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      qidCol: String,
      groupCol: String,
      k: Int,
      overFetch: Int = 4): DataFrame = {
    require(k >= 1 && overFetch >= 1, "k and overFetch must be positive")
    val cut = bruteForceTopKBatch(corpus, queries, idCol, embCol, qidCol,
      k * overFetch)
    val qGroups = broadcast(queries.select(col(qidCol).as("query_id"),
      col(groupCol).as("__qg")))
    val cGroups = broadcast(corpus.select(col(idCol), col(groupCol).as("__cg")))
    val negatives = cut
      .join(qGroups, "query_id")
      .join(cGroups, idCol)
      .filter(col(idCol) =!= col("query_id") &&
        (col("__cg").isNull || col("__qg").isNull || col("__cg") =!= col("__qg")))
      .select(col("query_id"), col(idCol), col("cosine_sim"))
    perQueryTopK(negatives, "query_id", idCol, "cosine_sim", k)
      .select(col("query_id"), col("rank"), col(idCol), col("cosine_sim"))
  }

  /**
   * Two-stage refine re-rank (the FAISS `IndexRefineFlat` pattern,
   * public): the compressed stage ([[sqTopKWith]] over the integer
   * code table) over-fetches `topK × refineFactor` candidates, then
   * ONLY those candidate rows are re-scored against the exact float
   * embeddings and re-ranked. The standard accuracy/cost dial of every
   * production vector index: quantization error decides RECALL INTO
   * the candidate set (cheap to widen — scan cost is code-table-sized
   * either way), while the final ORDER is exact, so the approximate
   * stage only has to be good enough to not drop a true neighbor past
   * rank R.
   *
   * Scale shape: stage 1 never touches the float embeddings (the
   * working-set shrink that makes the 100 TB corpus scannable); stage
   * 2 attaches R = topK·refineFactor ids — an R-row broadcast
   * semi-join against the embedding table, so exact-scoring cost is
   * R·dims, not corpus·dims. Both stages end in
   * `TakeOrderedAndProject` (no global sort). Ties break on id
   * ascending at both stages, so the candidate CUT at rank R is
   * deterministic and the oracle replays it exactly.
   *
   * Output: (idCol, approx_dot, exact_dot) — keeping the stage-1 score
   * beside the exact one is what makes the quantization error
   * observable (the audit column a recall regression starts from).
   */
  def sqRefineTopK(
      corpus: DataFrame,
      queryDf: DataFrame,
      idCol: String,
      embCol: String,
      topK: Int,
      refineFactor: Int,
      dims: Int): DataFrame = {
    require(refineFactor >= 1, "refineFactor must be >= 1")
    requireSingleQuery(queryDf, "sqRefineTopK")
    val ranges = sqRanges(corpus, embCol, dims)
    val codes = sqEncode(corpus, idCol, embCol, dims, ranges)
    val cands = sqTopKWith(codes, queryDf, idCol, embCol,
      topK * refineFactor, dims, ranges)
    val q = queryDf.select(col(embCol)).head().getSeq[Float](0)
    val qArr = array(q.map(v => lit(v.toDouble)): _*)
    corpus
      .join(broadcast(cands), idCol)
      .select(col(idCol), col("approx_dot"),
        round(dot(qArr, col(embCol)), 6).as("exact_dot"))
      .orderBy(col("exact_dot").desc, col(idCol).asc)
      .limit(topK)
  }
}
