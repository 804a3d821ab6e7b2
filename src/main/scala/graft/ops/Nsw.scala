package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * NSW graph-ANN family — kNN-graph CONSTRUCTION from banded-LSH
 * candidates, NN-descent refinement (Dong et al. WWW'11), and the
 * deterministic beam SEARCH (single-layer NSW, the HNSW/Vamana base
 * layer) with its batch probe, spread/per-query seeding, and bounded
 * point lookups. Split out of [[Similarity]] by the ~2k-line file cap
 * (r19) — every member VERBATIM from the pre-split object (no
 * behavior change; callers renamed `Similarity.x` → `Nsw.x`). The
 * navigation-QUALITY ops (α-RNG pruning, hierarchy, filtered search)
 * live in [[GraphNav]]; the geometry kernels ([[Similarity.cosineFast]],
 * [[Similarity.bandedNeighbors]], planes/buckets) stay in
 * [[Similarity]] and are consumed from here.
 */
object Nsw {
  /**
   * kNN graph over the whole corpus from banded-LSH candidates — the
   * input structure for graph-based clustering and SemDeDup-style
   * neighborhood dedup: every vector's top-`k` neighbors by cosine
   * among its [[Similarity.bandedNeighbors]] candidates (approximate by
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
    val pairs = Similarity.bandedNeighbors(corpus, idCol, embCol, planesPerBand,
      bands, dims, minCosine, maxBucketSize)
      // pinned: the symmetrize union below reads `pairs` twice, and
      // un-checkpointed the WHOLE banded stem (bucket self-join +
      // cosine + distinct) ran once per branch (r21 — the
      // nnDescentRound sym pin, one level up)
      .localCheckpoint()
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
        (-round(Similarity.cosineFast(spark, col("__ea"), col("__eb")) * 1e6, 0)
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
    Similarity.requireSingleQuery(queryDf, "graphSearch")
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
   * contract, [[Similarity.pqTopKWithBatch]]).
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
   * Shared beam-walk memo for MULTI-WALK callers over ONE immutable
   * (corpus, graph) pair — the cross-rung amortization of
   * [[graft.ops.GraphNav.filteredSearchBatch]]'s escalation ladder:
   * rung r+1 re-walks with a wider beam, and without a shared memo it
   * re-fetches and re-scores every node rung r already visited (the
   * walks overlap heavily — same seeds, same graph). Both maps cache
   * values that are DETERMINISTIC for the duration of a search
   * session (cosine(query, node) and the node's out-edges), so reuse
   * cannot change any walk's result — it only turns already-paid point
   * lookups into driver-map hits (a round whose entire need is cached
   * launches NO job at all). Never share across different graphs (the
   * adjacency would lie) or mutated corpora; the escalation ladder
   * holds both fixed by construction.
   */
  final class BeamState {
    private[ops] val simOf = collection.mutable.Map
      .empty[Long, collection.mutable.Map[Long, Double]]
    private[ops] val adj = collection.mutable.Map.empty[Long, Array[Long]]
  }

  /**
   * Graph-based ANN for a query SET — [[graphSearch]]'s production
   * probe shape: one beam per query, but each round's lookups merge
   * across ALL queries into one pruned embedding fetch and one pruned
   * adjacency fetch (the [[Similarity.pqTopKWithBatch]] amortization applied to
   * the graph regime — a probe service runs thousands of queries; one
   * driver call per query would serialize and rescan).
   *
   * Execution shape per round: (1) adjacency of the pools' nodes not
   * yet expanded — [[pointLookup]] on the graph, collected (≤ pool·k
   * skinny rows); (2) cosine scores for (query, node) pairs not yet
   * scored — the union of frontiers becomes ONE [[pointLookup]] on the
   * corpus, scored executor-side through [[Similarity.cosineFast]]'s codegen
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
      entriesByQuery: Map[Long, Seq[Long]] = Map.empty,
      state: BeamState = null): DataFrame = {
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
    // each query's embedding value, riding inside the need-pairs local
    // relation below — ONE broadcast per score job instead of two
    val qEmbOf: Map[Long, Any] = qRows.map(r => r.getLong(0) -> r.get(1)).toMap

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
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__qe",
        qSel.schema("__qe").dataType, nullable = false)))

    // per-walk memos, or the caller's shared [[BeamState]] (cross-rung
    // reuse — sound because both cached quantities are deterministic
    // for a fixed (corpus, graph); see BeamState's scaladoc)
    val st = if (state == null) new BeamState else state
    val simOf = st.simOf
    qids.foreach(q => simOf.getOrElseUpdate(q, collection.mutable.Map.empty))
    val adj = st.adj

    // ONE Spark job per round: the round's not-yet-scored (query,
    // node) cosines AND the not-yet-fetched adjacency rows ride one
    // unioned plan (tagged rows, split back on the driver). The
    // adjacency side PREFETCHES the whole candidate set — the next
    // pool is always a subset of this round's scored candidates, so
    // the next round's adjacency need is a guaranteed cache hit and
    // never launches a job of its own. Fetch volume grows only by the
    // skinny (id, nbr) rows of nodes whose embeddings the score side
    // already fetches — same cardinality, same pruned scan. Returns
    // (fetchedNew, scoredNew) — the fixed-point signals.
    def roundJob(pairs: Seq[(Long, Long)], prefetchIds: Seq[Long]): (Boolean, Boolean) = {
      val need = pairs.distinct.filterNot { case (q, n) => simOf(q).contains(n) }
      val missing = prefetchIds.distinct.filterNot(adj.contains)
      if (need.isEmpty && missing.isEmpty) return (false, false)
      // the query embedding rides inside the need-pairs local relation
      // (query_id, node, __qe): one broadcast build per round, not two
      val scorePart =
        if (need.isEmpty) None
        else {
          val needDf = spark.createDataFrame(
            need.map { case (q, n) =>
              org.apache.spark.sql.Row(q, n, qEmbOf(q)) }.asJava,
            pairSchema)
          Some(broadcast(needDf)
            .join(pointLookup(nodeEmb, "node", need.map(_._2).distinct),
              Seq("node"))
            .withColumn("__sim",
              Similarity.cosineFast(spark, col("__e"), col("__qe")))
            .filter(col("__sim").isNotNull) // zero-norm: unrankable
            .select(lit(0).as("__kind"), col("query_id").as("__a"),
              col("node").as("__b"), col("__sim")))
        }
      val adjPart =
        if (missing.isEmpty) None
        else Some(pointLookup(edges, "id", missing)
          .select(lit(1).as("__kind"), col("id").as("__a"),
            col("nbr").as("__b"), lit(null).cast("double").as("__sim")))
      val rows = (scorePart.toSeq ++ adjPart.toSeq)
        .reduce(_ unionByName _).collect()
      val (adjRows, simRows) = rows.partition(_.getInt(0) == 1)
      simRows.foreach(r => simOf(r.getLong(1))(r.getLong(2)) = r.getDouble(3))
      adjRows.groupBy(_.getLong(1))
        .foreach { case (i, rs) => adj(i) = rs.map(_.getLong(2)) }
      missing.foreach(i => if (!adj.contains(i)) adj(i) = Array.empty)
      (missing.nonEmpty, need.nonEmpty)
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
    // seed job: score the seeds AND prefetch their adjacency — round 1
    // then starts with its pool's adjacency already in hand
    roundJob(qids.flatMap(q => seedsOf(q).map(q -> _)),
      qids.flatMap(seedsOf).distinct)
    def topBeam(q: Long, cand: Seq[Long], width: Int): Seq[Long] =
      cand.distinct.filter(simOf(q).contains)
        .sortBy(n => (-simOf(q)(n), n)).take(width)
    var pool: Map[Long, Seq[Long]] =
      qids.map(q => q -> seedsOf(q).filter(simOf(q).contains)).toMap
    // fixed-point early exit: a round that fetched nothing, scored
    // nothing, and left every pool unchanged is a fixed point — all
    // remaining rounds would replay it verbatim (pool evolution is a
    // deterministic function of (pool, simOf, adj), and the memos only
    // grow), so the answer is already final. Identical results to the
    // full maxSteps unroll the oracle replays; only the no-op rounds'
    // job launches are skipped.
    var step = 0
    var fixedPoint = false
    while (step < maxSteps && !fixedPoint) {
      val cand = pool.valuesIterator.flatten.toSeq.distinct
      // adjacency of every pool node was prefetched by the previous
      // round's job (pool ⊆ last round's candidates), so this round's
      // single job scores the frontier and prefetches the adjacency of
      // the NEXT pool's candidate superset
      val (fetchedNew, scoredNew) = roundJob(
        for { q <- qids; n <- pool(q); nbr <- adj(n) } yield (q, nbr),
        cand ++ cand.flatMap(n => adj.getOrElse(n, Array.empty[Long]).toSeq))
      val next = qids.map { q =>
        q -> topBeam(q, pool(q) ++ pool(q).flatMap(adj(_)), beamWidth)
      }.toMap
      fixedPoint = !fetchedNew && !scoredNew && next == pool
      pool = next
      step += 1
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
}
