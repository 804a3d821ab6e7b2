package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.ops.Nsw

/** graph-ANN slice of the [[SparkEntry]] registry — NSW beam walks
  * (single/batch/durable/maintained), NN-descent refinement, stride
  * seeding, planted-target navigation gates, graph RTBF.
  * Split out of [[EntryAnn]] by family (r18 registry hygiene);
  * entries and oracles are verbatim registry content (no behavior
  * change — Registry keyset diff empty). */
private[graft] trait EntryAnnGraph extends EntryContext {

  protected def annGraphQueries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // ---- north-star: graph ANN — beam (ef-) search over the LSH-built
    //      kNN graph (single-layer NSW, the HNSW/Vamana base layer with
    //      deterministic entries): adaptive expansion scores only
    //      ≤ beam·k·steps vectors per query, no corpus scan — the
    //      third pruning regime beside IVF partitions and LSH buckets.
    //      The oracle unrolls every beam round (neighbor scoring +
    //      top-beam cut) — search path, not just the answer, is what
    //      replays.
    "q283_graph_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Nsw.graphSearch(
        emb, "vec_id", "embedding", emb.filter(col("vec_id") === 0),
        annGraph(s, dir), k = 10,
        nEntries = 4, beamWidth = 16, maxSteps = 10)
    }),


    // ---- north-star: graph-ANN recall readout — the dial that says
    //      whether beam/steps/graph-degree are enough: recall@10 of
    //      the q283 walk against the exact brute-force ranking, one
    //      row. (The q219 multi-probe-LSH recall pattern applied to
    //      the graph regime.)
    "q284_graph_ann_recall" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
      val walk = Nsw.graphSearch(
        emb, "vec_id", "embedding", q, annGraph(s, dir), k = 10,
        nEntries = 4, beamWidth = 16, maxSteps = 10)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
      walk.select("vec_id").join(exact.select("vec_id"), Seq("vec_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(10L).as("k"), col("n_hits"),
          round(col("n_hits").cast("double") / 10.0, 6).as("recall"))
    }),


    // ---- north-star: graph-ANN BATCH probe — the production shape a
    //      probe service runs: one beam per query, every round's
    //      embedding/adjacency lookups merged across the batch into
    //      ONE isin-pruned point fetch (the pqTopKWithBatch
    //      amortization in the graph regime). Oracle = three full
    //      single-query walk unrolls over the shared graph stem.
    "q285_graph_ann_batch" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Nsw.graphSearchBatch(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id").isin(0L, 7L, 23L))
          .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id", annGraph(s, dir), k = 10,
        nEntries = 4, beamWidth = 16, maxSteps = 10)
    }),


    // ---- north-star: DURABLE nav-graph index (q283's production
    //      form — the adjacency lives in parquet with a merge-on-read
    //      gen/ledger lifecycle, built once; the probe walks the
    //      stored graph cold with the geometry from the index's own
    //      committed meta). Same oracle as q283: the store must
    //      reproduce the in-memory walk verbatim (q60 convention).
    "q286_durable_graph_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.io.GraphIndex.search(s, durableGraphIndex(s, dir), emb,
        emb.filter(col("vec_id") === 0), k = 10)
    }),


    // ---- north-star: incremental NSW insert (search-then-link) —
    //      the graph twin of SignatureIndex.ingestBatch: a held-out
    //      batch joins the standing graph through one beam search per
    //      vector + exact batch-internal links, touched nodes re-prune
    //      to degree k, and the probe then walks the MERGED graph
    //      (query = an inserted vector — only reachable if the link
    //      pass actually wired it in). Oracle replays walks, forward
    //      cut, symmetrize, re-prune, and the final probe.
    "q287_graph_ann_insert" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.io.GraphIndex.search(s, insertedGraphIndex(s, dir), emb,
        emb.filter(col("vec_id") === 0), k = 10)
    }),

    // ---- north-star: durable BATCH probe — q285's stored-graph twin
    //      (the probe-service shape against the published layer): all
    //      three beams share each round's pruned lookups against the
    //      id-sorted adjacency files. Same oracle as q285 — the store
    //      must reproduce the in-memory batch walks verbatim.
    "q292_durable_graph_batch" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.io.GraphIndex.searchBatch(s, durableGraphIndex(s, dir), emb,
        emb.filter(col("vec_id").isin(0L, 7L, 23L))
          .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id", k = 10)
    }),

    // ---- north-star: the streaming graph maintainer END TO END —
    //      wave 1 lands as JSONL and bootstraps the graph through
    //      GraphIngest.maintainGraph (exactly-once silver, folded-
    //      files batches), wave 2 (0, 10, 20) lands and search-then-
    //      links; the probe over the maintained store must equal the
    //      directly-built q287 store (same oracle — the q282
    //      convention for the graph regime).
    "q293_graph_ingest" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.io.GraphIndex.search(s, graphIngestStore(s, dir), emb,
        emb.filter(col("vec_id") === 0), k = 10)
    }),

    // ---- north-star: right-to-be-forgotten for the nav graph — the
    //      takedown pass every other durable index has (q82/q83/q99):
    //      deleted ids leave the ledger and every edge incident to
    //      them drops (owners-only rewrite). The probe then walks the
    //      pruned graph over the SURVIVING corpus; a forgotten vector
    //      can never surface. Oracle = the walk over kg minus the
    //      incident edges, entries from the survivors.
    "q291_forget_graph" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.io.GraphIndex.search(s, forgottenGraphIndex(s, dir),
        emb.filter(!col("vec_id").isin(1L, 11L, 21L)),
        emb.filter(col("vec_id") === 0), k = 10)
    }),

    // ---- north-star: one NN-DESCENT round over the q191 kNN graph
    //      (Dong et al. WWW'11 — "a neighbor of my neighbor is
    //      probably my neighbor"): reverse edges capped at k per
    //      vertex, two-hop candidates through the symmetrized graph,
    //      true-cosine re-score, per-vertex top-k. The EDGE-QUALITY
    //      op (mutual-kNN/SemDeDup consumers) — the r17 recall audit
    //      measured it repairing the LSH banding gap on edges while
    //      NOT being the navigation fix (BASELINE.md). Readout =
    //      q191's per-rank aggregate so the whole refined edge set
    //      hash-checks compactly.
    "q299_nn_descent" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val seed = Nsw.knnGraph(emb, "vec_id", "embedding",
        planesPerBand = 8, bands = 2, dims = 64, k = 5,
        minCosine = 0.15, maxBucketSize = 1000)
      Nsw.nnDescentRound(seed, emb, "vec_id", "embedding", k = 5)
        .groupBy("rank")
        .agg(
          count(lit(1)).as("n_edges"),
          countDistinct(col("id")).as("n_vertices"),
          sum(col("cos_micro")).as("sum_cos_micro"),
          sum(col("nbr")).as("sum_nbrs"))
    }),

    // ---- north-star: the q283 beam walk from SPREAD entry seeds
    //      (strideEntries — the production seeding policy the r17
    //      recall audit recommends: +56% relative recall at 10× over
    //      the lowest-id corner as the NSW diameter grows). The
    //      oracle replays seed derivation (id-range stride →
    //      conditional min) AND every beam round from those seeds.
    "q300_graph_ann_stride" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Nsw.graphSearch(
        emb, "vec_id", "embedding", emb.filter(col("vec_id") === 0),
        annGraph(s, dir), k = 10, nEntries = 4, beamWidth = 16,
        maxSteps = 10,
        entries = Nsw.strideEntries(emb, "vec_id", 4))
    }),

    // ---- north-star: PLANTED-TARGET navigation probe as a gate query
    //      — the r17 recall audit's decisive control, hash-checked:
    //      the query is corpus vector 0 plus PURE-INTEGER-derived
    //      noise (exact decimals, float-cast — bit-identical in both
    //      engines, no trig/normalization whose summation order could
    //      drift), planted ~cos 0.9 from its target; the stride-seeded
    //      beam must walk to it (rank 1 rides the hash). Recall@10 on
    //      this fixture measures tie-breaking noise (BASELINE r17
    //      audit); planted hit@1 measures NAVIGATION.
    "q301_planted_walk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val planted = emb.filter(col("vec_id") === 0)
        .select(col("vec_id"),
          transform(col("embedding"), (x, i) =>
            x.cast("double") +
              ((i * 131 + 17) % 201 - 100).cast("double") / lit(1000.0))
            .cast("array<float>").as("embedding"))
      Nsw.graphSearch(
        emb, "vec_id", "embedding", planted, annGraph(s, dir),
        k = 10, nEntries = 4, beamWidth = 16, maxSteps = 10,
        entries = Nsw.strideEntries(emb, "vec_id", 4))
    }),

    // ---- north-star: the q284 recall readout under the PRODUCTION
    //      seeding policy (stride spread) — ties the audit's
    //      recommendation to the oracle gate: seed derivation, every
    //      beam round, and the exact-top-10 intersection all replay.
    "q302_stride_recall" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
      val walk = Nsw.graphSearch(
        emb, "vec_id", "embedding", q, annGraph(s, dir), k = 10,
        nEntries = 4, beamWidth = 16, maxSteps = 10,
        entries = Nsw.strideEntries(emb, "vec_id", 4))
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
      walk.select("vec_id").join(exact.select("vec_id"), Seq("vec_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(10L).as("k"), col("n_hits"),
          round(col("n_hits").cast("double") / 10.0, 6).as("recall"))
    }),

    // ---- north-star: DIVERSIFIED-PRUNING navigation as a production
    //      op (DiskANN α-RNG RobustPrune / HNSW select-neighbors
    //      heuristic — GraphNav.alphaPrunedGraph): the annGraph
    //      geometry with candidates WIDENED to 12 and α-RNG-pruned
    //      back to degree ≤ 8 (α = 1.2) — the same edge budget spent
    //      across DIRECTIONS. The oracle replays the candidate graph,
    //      the greedy occlusion prune EDGE-FOR-EDGE (24 unrolled
    //      kept-set CTEs in micro-cosine integer arithmetic), the
    //      stride seeds, and every beam round. Measured value is
    //      regime-dependent (BASELINE r18 recall + cluster-nav
    //      audits): on the contrast-free noise fixture occlusion
    //      fires on 1.6% of edges and walks are unchanged (0.313
    //      noise-floor tie, planted hit@1 8/8); on clustered data
    //      (q304) it is the difference between 0.000 and 1.000.
    "q303_diversified_walk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Nsw.graphSearch(
        emb, "vec_id", "embedding", emb.filter(col("vec_id") === 0),
        divGraph(s, dir), k = 10, nEntries = 4, beamWidth = 16,
        maxSteps = 10, entries = Nsw.strideEntries(emb, "vec_id", 4))
    }),

    // ---- north-star: CLUSTERED-corpus navigation gate — the regime
    //      the diversified-pruning heuristic was published for
    //      (Malkov & Yashunin 2018 §4): every 20th vector seeds a
    //      tight 20-clone cluster (pure-integer noise, the q301
    //      convention), so a raw kNN graph with k=8 < cluster size is
    //      disconnected cliques and navigates at recall 0.000
    //      (measured, ClusterNav, both scales), while the α-RNG graph
    //      from a 24-candidate pool at the SAME degree-8 budget
    //      reaches 1.000. The walk probes cluster [100, 119] from a
    //      fresh clone of seed 100; output = the ranked walk with the
    //      exact-top-10 membership flag — ranking AND recall
    //      hash-check together.
    "q304_clustered_nav" -> ((s, dir) => {
      val corpus = clusteredCorpus(s, dir)
      val q = corpus.filter(col("vec_id") === 100)
        .select(col("vec_id"),
          transform(col("embedding"), (x, i) =>
            x.cast("double") +
              ((i * 131 + 757) % 201 - 100).cast("double") / lit(1000.0))
            .cast("array<float>").as("embedding"))
      val walk = Nsw.graphSearch(
        corpus, "vec_id", "embedding", q, clusteredDivGraph(s, dir),
        k = 10, nEntries = 4, beamWidth = 16, maxSteps = 10,
        entries = Nsw.strideEntries(corpus, "vec_id", 16))
      val exact = Similarity.bruteForceTopK(
          corpus, q, "vec_id", "embedding", k = 10)
        .select(col("vec_id").as("__ev"))
      walk.join(exact, walk("vec_id") === exact("__ev"), "left")
        .select(col("vec_id"), col("cosine_sim"),
          col("__ev").isNotNull.as("in_exact"))
    }),


    // ---- north-star: the DIVERSIFIED graph as a DURABLE index — the
    //      q303 construction (12-candidate pool, α-RNG prune to
    //      degree ≤ 8) committed through the GraphIndex lifecycle
    //      (gen/ledger CAS, MoR adjacency, claim-serialized drains,
    //      RTBF), with the α policy stored in the meta so every
    //      future insert-merge RobustPrunes instead of top-k (the
    //      DiskANN insertion rule; GraphIndexSpec pins the occlusion
    //      invariant across drains). Probe ≡ the in-memory q303 walk
    //      — same oracle, the q60/q286 durable-twin convention.
    "q305_durable_diversified" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.io.GraphIndex.search(s, durableDivGraphIndex(s, dir), emb,
        emb.filter(col("vec_id") === 0), k = 10,
        entries = Nsw.strideEntries(emb, "vec_id", 4))
    }),


    // ---- north-star: attribute-FILTERED graph ANN — the production
    //      "nearest neighbors WHERE <predicate>" shape (Filtered-
    //      DiskANN's problem, solved here by the standard
    //      over-retrieve baseline): the beam walks UNFILTERED (the
    //      graph's navigability must not depend on the predicate),
    //      the ranked VISITED set is then filtered and cut — pure
    //      composition over the oracle-gated walk, no new operator.
    //      Deterministic stand-in predicate: vec_id % 3 = 0.
    "q306_filtered_walk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Nsw.graphSearch(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") === 0), annGraph(s, dir), k = 60,
          nEntries = 4, beamWidth = 16, maxSteps = 10,
          entries = Nsw.strideEntries(emb, "vec_id", 4))
        .filter(col("vec_id") % 3 === 0)
        .orderBy(col("cosine_sim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // ---- north-star: SELECTIVITY-SAFE filtered graph ANN — q306's
    //      over-retrieve composition made safe under a SELECTIVE
    //      predicate (keep-rate 1/10 here vs q306's ~1/3): if the
    //      cheap rung's filtered cut comes up short of k, the search
    //      ESCALATES (beam and cut ×4) up to a documented budget cap,
    //      and a still-thin answer surfaces `thin_result = true`
    //      instead of a silently short list (Filtered-DiskANN's
    //      over-retrieve escalation, Gollapudi et al. WWW 2023 —
    //      GraphNav.filteredSearch). The oracle replays BOTH rungs'
    //      beam walks and the integer-count pick between them.
    "q307_filtered_escalation" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.ops.GraphNav.filteredSearch(
        emb, "vec_id", "embedding", emb.filter(col("vec_id") === 0),
        annGraph(s, dir), predicate = col("vec_id") % 10 === 7, k = 10,
        nEntries = 4, beamWidth = 16, maxSteps = 10,
        entries = Nsw.strideEntries(emb, "vec_id", 4),
        overFetch = 4, escalations = 1, growth = 4)
    }),

    // ---- north-star: HNSW layer-descent as a GATE query — the
    //      hierarchicalSearchBatch production wrapper (upper-layer
    //      walk hands each query its own near-the-target base seeds;
    //      Malkov & Yashunin 2018) was spec-only in r18, the one
    //      GraphNav op outside the oracle gate. Upper layer = the
    //      deterministic % 4 sample under annGraph's geometry; three
    //      queries gate the per-query-seed batch semantics. The
    //      oracle replays the upper stem, each upper walk, the seed
    //      handoff, and every base round (the q300 convention,
    //      composed twice).
    "q308_hierarchical_walk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.ops.GraphNav.hierarchicalSearchBatch(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id").isin(0L, 7L, 23L))
          .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id", annGraph(s, dir),
        emb.filter(col("vec_id") % 4 === 0), upperAnnGraph(s, dir),
        k = 10, seedK = 8, beamWidth = 8, maxSteps = 8,
        upperBeamWidth = 16, upperMaxSteps = 10)
    }),


    // ---- north-star: BATCH filtered graph ANN — q307's escalation
    //      ladder in the probe-service shape: one ladder per query,
    //      every rung ONE graphSearchBatch over the rung's still-thin
    //      queries (adjacency/embedding fetches merge across the
    //      batch — the q285 amortization), escalation decisions
    //      per-query (a satisfied query never re-walks; a selective
    //      one never drags the batch). Oracle = each query's two-rung
    //      ladder replayed independently (per-query semantics ≡
    //      filteredSearch exactly).
    "q309_filtered_batch" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.ops.GraphNav.filteredSearchBatch(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id").isin(0L, 7L, 23L))
          .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id", annGraph(s, dir),
        predicate = col("vec_id") % 10 === 7, k = 10,
        nEntries = 4, beamWidth = 16, maxSteps = 10,
        entries = Nsw.strideEntries(emb, "vec_id", 4),
        overFetch = 4, escalations = 1, growth = 4)
    }),


    // ---- north-star: filtered walk against the PUBLISHED store — the
    //      production "top-k WHERE <pred>" a probe service answers
    //      from a committed index, not a session-built graph: q309's
    //      per-query escalation wired to q305's durable α-pruned
    //      adjacency (GraphIndex.filteredSearchBatch — MoR ledger
    //      resolve, build-time geometry, id-sorted point-lookup
    //      pruning). Oracle = the q305 stem (α-RNG replay) under the
    //      q309 ladder.
    "q310_durable_filtered_walk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      graft.io.GraphIndex.filteredSearchBatch(
        s, durableDivGraphIndex(s, dir), emb,
        emb.filter(col("vec_id").isin(0L, 7L, 23L))
          .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id", predicate = col("vec_id") % 10 === 7, k = 10,
        entries = Nsw.strideEntries(emb, "vec_id", 4),
        overFetch = 4, escalations = 1, growth = 4)
    }),


    // ---- north-star: predicate-aware probe of the DURABLE IVF
    //      index — the escalation ladder in the IVF regime
    //      (VectorIndex.probeFilteredBatch): each rung probes
    //      nprobe·growth^rung list DIRECTORIES (static partition
    //      pruning), thin queries widen per-query, and the nlist cap
    //      makes the last rung EXACT (rung 1 here: 2×4 ≥ nlist=8 →
    //      all lists — thin then means the store truly holds < k
    //      matches). Oracle replays training, both rungs' probes, and
    //      the per-query integer-count pick.
    "q311_durable_filtered_probe" -> ((s, dir) =>
      graft.io.VectorIndex.probeFilteredBatch(
        T(s, dir, "embeddings").filter(col("vec_id") < 3), "vec_id",
        durableVecIndex(s, dir), predicate = col("vec_id") % 10 === 7,
        k = 10, nprobe = 2, escalations = 1, growth = 4))

  )

  protected def annGraphOracles: Map[String, String] = Map(


    // graph-ANN replay: candidate banding → kNN edges → every beam
    // round unrolled (the search path, not just the answer)
    "q283_graph_ann" ->
      s"""WITH ${graphAnnStemCtes()},
         |${graphAnnWalkCtes(0)}
         |SELECT node AS vec_id, sim AS cosine_sim FROM res_q0""".stripMargin,


    // durable nav-graph probe: the stored graph must reproduce the
    // in-memory walk verbatim (the q60 equivalence convention — same
    // oracle as q283)
    "q286_durable_graph_ann" ->
      s"""WITH ${graphAnnStemCtes()},
         |${graphAnnWalkCtes(0)}
         |SELECT node AS vec_id, sim AS cosine_sim FROM res_q0""".stripMargin,


    // search-then-link replay: standing stem (batch held out) → one
    // forget replay: full-corpus graph minus every edge incident to a
    // deleted id, probe walk over the surviving corpus (entries from
    // the survivors — a forgotten vector can never surface)
    "q291_forget_graph" ->
      s"""WITH ${graphAnnStemCtes()},
         |embs AS MATERIALIZED (SELECT vec_id, embedding FROM embm
         |  WHERE vec_id NOT IN (1, 11, 21)),
         |kgd AS MATERIALIZED (SELECT id, nbr FROM kg
         |  WHERE id NOT IN (1, 11, 21) AND nbr NOT IN (1, 11, 21)),
         |entd AS (SELECT vec_id AS node FROM embs ORDER BY vec_id LIMIT 4),
         |${graphAnnWalkCtes(0, graph = "kgd", ent = "entd",
             emb = "embs", qsrc = "embs", ns0 = "fg")}
         |SELECT node AS vec_id, sim AS cosine_sim FROM res_fg""".stripMargin,

    // walk per inserted vector (its top-8 forward candidates) + exact
    // batch-internal pairs → micro-ranked forward cut → symmetrize →
    // degree-re-prune touched nodes against the standing edge cosines
    // → merged graph → the final probe walk over the FULL corpus
    "q287_graph_ann_insert" -> graphInsertOracle,

    // maintainer end-to-end ≡ the same insert math: the landed-JSONL
    // drains (bootstrap build + search-then-link) must produce the
    // IDENTICAL merged graph, so the oracle is q287's verbatim (float
    // JSON round-trips are exact — Java shortest-repr)
    "q293_graph_ingest" -> graphInsertOracle,


    // recall readout: the same walk intersected with the exact top-10
    "q284_graph_ann_recall" ->
      s"""WITH ${graphAnnStemCtes()},
         |${graphAnnWalkCtes(0)},
         |bt AS (SELECT vec_id FROM (
         |    SELECT e.vec_id,
         |      row_number() OVER (ORDER BY
         |        ${duckCosine("e.embedding", "qv_q0.qe", 64)} DESC,
         |        e.vec_id ASC) AS rn
         |    FROM embm e, qv_q0) WHERE rn <= 10)
         |SELECT CAST(10 AS BIGINT) AS k,
         |  CAST(count(*) AS BIGINT) AS n_hits,
         |  round(count(*) / 10.0, 6) AS recall
         |FROM res_q0 r JOIN bt ON bt.vec_id = r.node""".stripMargin,


    // batch replay: one walk namespace per query over the SHARED graph
    // stem — the amortization under test is that the engine's rounds
    // merge across queries while per-query semantics stay the single
    // walk's, so the oracle is literally three single walks
    "q285_graph_ann_batch" ->
      s"""WITH ${graphAnnStemCtes()},
         |${Seq(0L, 7L, 23L).map(graphAnnWalkCtes(_)).mkString(",\n")}
         |${Seq(0L, 7L, 23L).map(q =>
             s"""SELECT CAST($q AS BIGINT) AS query_id,
                |  CAST(rn AS BIGINT) AS rank, node AS vec_id,
                |  sim AS cosine_sim FROM res_q$q""".stripMargin)
           .mkString("\nUNION ALL\n")}""".stripMargin,

    // durable batch probe ≡ the in-memory batch walks (q60 convention)
    "q292_durable_graph_batch" ->
      s"""WITH ${graphAnnStemCtes()},
         |${Seq(0L, 7L, 23L).map(graphAnnWalkCtes(_)).mkString(",\n")}
         |${Seq(0L, 7L, 23L).map(q =>
             s"""SELECT CAST($q AS BIGINT) AS query_id,
                |  CAST(rn AS BIGINT) AS rank, node AS vec_id,
                |  sim AS cosine_sim FROM res_q$q""".stripMargin)
           .mkString("\nUNION ALL\n")}""".stripMargin,


    // NN-descent replay: the q191 pair CTEs → k=5 seed edges →
    // reverse cap (top-k incoming by cos desc, id asc) → symmetrize →
    // two-hop → fresh cosine re-score (no floor — repair edges) →
    // per-vertex top-k → q191's per-rank readout
    "q299_nn_descent" ->
      s"""WITH $embPairCtes,
         |sym0 AS (SELECT id_a AS id, id_b AS nbr, cosine_sim FROM p
         |  UNION ALL SELECT id_b, id_a, cosine_sim FROM p),
         |kgs AS MATERIALIZED (SELECT id, nbr, cm FROM (
         |    SELECT id, nbr,
         |      CAST(round(cosine_sim*1000000, 0) AS BIGINT) AS cm,
         |      row_number() OVER (PARTITION BY id
         |        ORDER BY round(cosine_sim*1000000, 0) DESC, nbr) AS rank
         |    FROM sym0) WHERE rank <= 5),
         |revc AS (SELECT nbr AS id, id AS nbr FROM (
         |    SELECT id, nbr, row_number() OVER (PARTITION BY nbr
         |      ORDER BY cm DESC, id ASC) AS rr FROM kgs) WHERE rr <= 5),
         |symd AS MATERIALIZED (SELECT DISTINCT id, nbr FROM (
         |    SELECT id, nbr FROM kgs UNION ALL SELECT id, nbr FROM revc)),
         |hop2 AS (SELECT a.id, b.nbr FROM symd a JOIN symd b
         |    ON a.nbr = b.id WHERE a.id <> b.nbr),
         |cand AS (SELECT DISTINCT id, nbr FROM (
         |    SELECT id, nbr FROM symd UNION ALL SELECT id, nbr FROM hop2)),
         |scd AS (SELECT c.id, c.nbr, CAST(round(
         |      ${duckCosine("ea.embedding", "eb.embedding", 64)}*1000000, 0)
         |      AS BIGINT) AS cm
         |  FROM cand c JOIN embm ea ON ea.vec_id = c.id
         |  JOIN embm eb ON eb.vec_id = c.nbr),
         |rd AS (SELECT id, nbr, cm, row_number() OVER (PARTITION BY id
         |    ORDER BY cm DESC, nbr ASC) AS rank FROM scd)
         |SELECT rank, count(*) AS n_edges,
         |  count(DISTINCT id) AS n_vertices,
         |  CAST(sum(cm) AS BIGINT) AS sum_cos_micro,
         |  CAST(sum(nbr) AS BIGINT) AS sum_nbrs
         |FROM rd WHERE rank <= 5 GROUP BY 1""".stripMargin,


    // stride-seeded walk replay: the seed derivation (id-range stride
    // cuts → conditional min per cut, exactly strideEntries' integer
    // arithmetic) feeds the same unrolled beam rounds as q283
    "q300_graph_ann_stride" ->
      s"""WITH ${graphAnnStemCtes()},
         |mmS AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi FROM embm),
         |entS AS (SELECT DISTINCT node FROM (
         |    SELECT (SELECT min(e2.vec_id) FROM embm e2
         |        WHERE e2.vec_id >= m.lo + (i.i * (m.hi - m.lo + 1)) // 4)
         |      AS node
         |    FROM mmS m, generate_series(0, 3) i(i))
         |  WHERE node IS NOT NULL),
         |${graphAnnWalkCtes(0, ent = "entS", ns0 = "st")}
         |SELECT node AS vec_id, sim AS cosine_sim FROM res_st""".stripMargin,


    // planted-walk replay: the planted query vector from the same
    // pure-integer noise formula (1-based __i ↔ Spark's 0-based
    // transform index), REAL-cast for bit parity, then the stride
    // seeds + every beam round
    "q301_planted_walk" ->
      s"""WITH ${graphAnnStemCtes()},
         |plq AS (SELECT vec_id,
         |    list_transform(generate_series(1, 64), __i ->
         |      CAST(CAST(embedding[__i] AS DOUBLE) +
         |        (((__i - 1) * 131 + 17) % 201 - 100) / 1000.0 AS REAL))
         |      AS embedding
         |  FROM embm WHERE vec_id = 0),
         |mmS AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi FROM embm),
         |entS AS (SELECT DISTINCT node FROM (
         |    SELECT (SELECT min(e2.vec_id) FROM embm e2
         |        WHERE e2.vec_id >= m.lo + (i.i * (m.hi - m.lo + 1)) // 4)
         |      AS node
         |    FROM mmS m, generate_series(0, 3) i(i))
         |  WHERE node IS NOT NULL),
         |${graphAnnWalkCtes(0, ent = "entS", qsrc = "plq", ns0 = "pl")}
         |SELECT node AS vec_id, sim AS cosine_sim FROM res_pl""".stripMargin,


    // stride-recall replay: the q284 readout with the entS seeds —
    // walk rounds + the exact-top-10 intersection
    "q302_stride_recall" ->
      s"""WITH ${graphAnnStemCtes()},
         |mmS AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi FROM embm),
         |entS AS (SELECT DISTINCT node FROM (
         |    SELECT (SELECT min(e2.vec_id) FROM embm e2
         |        WHERE e2.vec_id >= m.lo + (i.i * (m.hi - m.lo + 1)) // 4)
         |      AS node
         |    FROM mmS m, generate_series(0, 3) i(i))
         |  WHERE node IS NOT NULL),
         |${graphAnnWalkCtes(0, ent = "entS", ns0 = "sr")},
         |bt AS (SELECT vec_id FROM (
         |    SELECT e.vec_id,
         |      row_number() OVER (ORDER BY
         |        ${duckCosine("e.embedding", "qv_sr.qe", 64)} DESC,
         |        e.vec_id ASC) AS rn
         |    FROM embm e, qv_sr) WHERE rn <= 10)
         |SELECT CAST(10 AS BIGINT) AS k,
         |  CAST(count(*) AS BIGINT) AS n_hits,
         |  round(count(*) / 10.0, 6) AS recall
         |FROM res_sr r JOIN bt ON bt.vec_id = r.node""".stripMargin,

    // diversified-walk replay: candidate stem at k=12, the α-RNG
    // greedy unrolled kept-set by kept-set, stride seeds, every beam
    // round — the walk runs on the PRUNED graph kgp
    "q303_diversified_walk" ->
      s"""WITH ${graphAnnStemCtes(k = 12)},
         |${alphaPruneCtes(k = 12, r = 8)},
         |${strideEntCtes(4, "S")},
         |${graphAnnWalkCtes(0, graph = "kgp", ent = "entS", ns0 = "dv")}
         |SELECT node AS vec_id, sim AS cosine_sim FROM res_dv""".stripMargin,

    // clustered-nav replay: the clone corpus (pure-integer noise,
    // REAL-cast), candidate stem at k=24 over it, the α-RNG prune,
    // 16 stride seeds, the walk for seed 100's fresh clone, and the
    // exact-top-10 membership flag
    "q304_clustered_nav" ->
      s"""WITH seedsC AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 20 = 0),
         |cembC AS MATERIALIZED (SELECT s.vec_id + t.j AS vec_id,
         |    CASE WHEN t.j = 0 THEN s.embedding ELSE
         |      list_transform(generate_series(1, 64), __i ->
         |        CAST(CAST(s.embedding[__i] AS DOUBLE) +
         |          (((__i - 1) * 131 + t.j * 37 + 17) % 201 - 100) / 1000.0
         |          AS REAL))
         |    END AS embedding
         |  FROM seedsC s, generate_series(0, 19) t(j)),
         |${graphAnnStemCtes(src = "cembC", sfx = "_c", k = 24)},
         |${alphaPruneCtes(k = 24, r = 8, sfx = "_c", emb = "embm_c")},
         |${strideEntCtes(16, "S_c", emb = "embm_c")},
         |plqC AS (SELECT vec_id,
         |    list_transform(generate_series(1, 64), __i ->
         |      CAST(CAST(embedding[__i] AS DOUBLE) +
         |        (((__i - 1) * 131 + 757) % 201 - 100) / 1000.0 AS REAL))
         |      AS embedding
         |  FROM embm_c WHERE vec_id = 100),
         |${graphAnnWalkCtes(100, graph = "kgp_c", ent = "entS_c",
             emb = "embm_c", qsrc = "plqC", ns0 = "cn")},
         |bt AS (SELECT vec_id FROM (
         |    SELECT e.vec_id,
         |      row_number() OVER (ORDER BY
         |        ${duckCosine("e.embedding", "qv_cn.qe", 64)} DESC,
         |        e.vec_id ASC) AS rn
         |    FROM embm_c e, qv_cn) WHERE rn <= 10)
         |SELECT r.node AS vec_id, r.sim AS cosine_sim,
         |  bt.vec_id IS NOT NULL AS in_exact
         |FROM res_cn r LEFT JOIN bt ON bt.vec_id = r.node""".stripMargin,


    // durable diversified probe ≡ the in-memory q303 walk (the stored
    // adjacency IS the α-pruned graph): q303's replay verbatim
    "q305_durable_diversified" ->
      s"""WITH ${graphAnnStemCtes(k = 12)},
         |${alphaPruneCtes(k = 12, r = 8)},
         |${strideEntCtes(4, "S")},
         |${graphAnnWalkCtes(0, graph = "kgp", ent = "entS", ns0 = "dd")}
         |SELECT node AS vec_id, sim AS cosine_sim FROM res_dd""".stripMargin,


    // filtered-walk replay: the stride-seeded walk at k=60 (the
    // visited-set over-retrieve), then the predicate + re-cut — same
    // total order as the engine (sim desc, id asc)
    "q306_filtered_walk" ->
      s"""WITH ${graphAnnStemCtes()},
         |${strideEntCtes(4, "S")},
         |${graphAnnWalkCtes(0, k = 60, ent = "entS", ns0 = "fw")}
         |SELECT node AS vec_id, sim AS cosine_sim FROM (
         |  SELECT node, sim,
         |    row_number() OVER (ORDER BY sim DESC, node ASC) AS fr
         |  FROM res_fw WHERE node % 3 = 0) WHERE fr <= 10""".stripMargin,

    // escalation replay: BOTH rungs' walks (rung 0 beam 16 / cut 40;
    // rung 1 beam 64 / cut 160), the per-rung predicate filters, the
    // integer-count pick (rung 0 wins iff it already holds k
    // matches), and the thin flag from the selected rung's count —
    // GraphNav.filteredSearch's exact escalation arithmetic
    "q307_filtered_escalation" ->
      s"""WITH ${graphAnnStemCtes()},
         |${strideEntCtes(4, "S")},
         |${graphAnnWalkCtes(0, beam = 16, k = 40, ent = "entS", ns0 = "e0")},
         |${graphAnnWalkCtes(0, beam = 64, k = 160, ent = "entS", ns0 = "e1")},
         |f0 AS (SELECT node, sim FROM res_e0 WHERE node % 10 = 7),
         |f1 AS (SELECT node, sim FROM res_e1 WHERE node % 10 = 7),
         |pick AS (SELECT (SELECT count(*) FROM f0) >= 10 AS ok0),
         |sel AS (SELECT node, sim FROM f0 WHERE (SELECT ok0 FROM pick)
         |  UNION ALL
         |  SELECT node, sim FROM f1 WHERE NOT (SELECT ok0 FROM pick)),
         |nsel AS (SELECT count(*) AS c FROM sel)
         |SELECT CAST(fr AS BIGINT) AS rank, node AS vec_id,
         |  sim AS cosine_sim, (SELECT c FROM nsel) < 10 AS thin_result
         |FROM (SELECT node, sim,
         |    row_number() OVER (ORDER BY sim DESC, node ASC) AS fr
         |  FROM sel) WHERE fr <= 10""".stripMargin,

    // layer-descent replay: the upper stem (the % 4 sample under the
    // same banding), each query's upper walk (beam 16, 10 rounds,
    // k = seedK), its result nodes handed to the base walk as
    // per-query entries, then every base round (beam 8, 8 rounds) —
    // the q285 batch shape with hierarchical seeds
    "q308_hierarchical_walk" ->
      s"""WITH ${graphAnnStemCtes()},
         |${graphAnnStemCtes(
             "(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0)",
             "_u")},
         |${strideEntCtes(4, "U", emb = "embm_u")},
         |${Seq(0L, 7L, 23L).map(q =>
             graphAnnWalkCtes(q, steps = 10, beam = 16, k = 8,
               graph = "kg_u", ent = "entU", emb = "embm_u",
               qsrc = "embm", ns0 = s"u$q")).mkString(",\n")},
         |${Seq(0L, 7L, 23L).map(q =>
             s"sb$q AS (SELECT node FROM res_u$q)").mkString(",\n")},
         |${Seq(0L, 7L, 23L).map(q =>
             graphAnnWalkCtes(q, steps = 8, beam = 8, k = 10,
               graph = "kg", ent = s"sb$q", emb = "embm",
               qsrc = "embm", ns0 = s"h$q")).mkString(",\n")}
         |${Seq(0L, 7L, 23L).map(q =>
             s"""SELECT CAST($q AS BIGINT) AS query_id,
                |  CAST(rn AS BIGINT) AS rank, node AS vec_id,
                |  sim AS cosine_sim FROM res_h$q""".stripMargin)
           .mkString("\nUNION ALL\n")}""".stripMargin,

    // batch-ladder replay over the session graph: per query, both
    // rungs' walks + the integer-count pick (the q307 arithmetic,
    // composed per query — batch semantics are per-query identical)
    "q309_filtered_batch" ->
      s"""WITH ${graphAnnStemCtes()},
         |${filteredLadderCtes(graph = "kg")}
         |${filteredLadderFinalSql}""".stripMargin,

    // durable-store ladder: the q305 stem (α-RNG RobustPrune replay
    // of the stored adjacency) under the same per-query two-rung pick
    "q310_durable_filtered_walk" ->
      s"""WITH ${graphAnnStemCtes(k = 12)},
         |${alphaPruneCtes(k = 12, r = 8)},
         |${filteredLadderCtes(graph = "kgp")}
         |${filteredLadderFinalSql}""".stripMargin,

    // IVF-ladder replay: k-means training, rung-0 probe (top-2 lists
    // per query), rung-1 probe (2×4 ≥ nlist → ALL lists, the exact
    // regime), predicate on both, per-query count pick + thin flag
    "q311_durable_filtered_probe" -> {
      val dims = 64
      s"""WITH ${ivfTrainCtes(dims)},
         |q AS (SELECT CAST(vec_id AS BIGINT) AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id < 3),
         |pr0 AS (SELECT query_id, cid AS list_id FROM (
         |    SELECT q.query_id, c.cid, row_number() OVER (
         |        PARTITION BY q.query_id
         |        ORDER BY ${duckCosine("c.cemb", "q.qe", dims)} DESC,
         |          c.cid ASC) AS rn
         |    FROM c1 c, q) WHERE rn <= 2),
         |s0 AS (SELECT p.query_id, e.vec_id,
         |        ${duckCosine("e.embedding", "q.qe", dims)} AS cosine_sim
         |      FROM pr0 p JOIN q USING (query_id)
         |      JOIN alist a ON a.list_id = p.list_id
         |      JOIN embeddings e ON e.vec_id = a.vec_id
         |      WHERE e.vec_id % 10 = 7),
         |s1 AS (SELECT q.query_id, e.vec_id,
         |        ${duckCosine("e.embedding", "q.qe", dims)} AS cosine_sim
         |      FROM embeddings e, q WHERE e.vec_id % 10 = 7),
         |n0 AS (SELECT query_id, count(*) AS c FROM s0 GROUP BY query_id),
         |sel AS (
         |  SELECT s0.query_id, s0.vec_id, s0.cosine_sim
         |  FROM s0 JOIN n0 USING (query_id) WHERE n0.c >= 10
         |  UNION ALL
         |  SELECT s1.query_id, s1.vec_id, s1.cosine_sim
         |  FROM s1 LEFT JOIN n0 USING (query_id)
         |  WHERE coalesce(n0.c, 0) < 10),
         |nsel AS (SELECT query_id, count(*) AS c FROM sel GROUP BY query_id),
         |r AS (SELECT query_id, CAST(row_number() OVER (
         |      PARTITION BY query_id
         |      ORDER BY cosine_sim DESC, vec_id ASC) AS BIGINT) AS rank,
         |    vec_id, cosine_sim FROM sel)
         |SELECT r.query_id, r.rank, r.vec_id, r.cosine_sim,
         |  (nsel.c < 10) AS thin_result
         |FROM r JOIN nsel USING (query_id) WHERE r.rank <= 10""".stripMargin
    }

  )

  /** Per-query two-rung filtered-escalation CTEs over a walkable stem
    * (the q307 arithmetic composed for the q309/q310 batch gates):
    * for each query — rung-0 walk (beam 16, cut 40), rung-1 walk
    * (beam 64, cut 160), the `% 10 = 7` filters, the count pick, and
    * the selected count. Ends after `cnt<q>`; pair with
    * [[filteredLadderFinalSql]]. */
  private def filteredLadderCtes(graph: String): String = {
    val walks = Seq(0L, 7L, 23L).map { q =>
      Seq(
        graphAnnWalkCtes(q, beam = 16, k = 40, graph = graph,
          ent = "entS", ns0 = s"a$q"),
        graphAnnWalkCtes(q, beam = 64, k = 160, graph = graph,
          ent = "entS", ns0 = s"b$q"),
        s"f0x$q AS (SELECT node, sim FROM res_a$q WHERE node % 10 = 7)",
        s"f1x$q AS (SELECT node, sim FROM res_b$q WHERE node % 10 = 7)",
        s"pk$q AS (SELECT (SELECT count(*) FROM f0x$q) >= 10 AS ok0)",
        s"""sel$q AS (SELECT node, sim FROM f0x$q
           |    WHERE (SELECT ok0 FROM pk$q)
           |  UNION ALL
           |  SELECT node, sim FROM f1x$q
           |    WHERE NOT (SELECT ok0 FROM pk$q))""".stripMargin,
        s"cnt$q AS (SELECT count(*) AS c FROM sel$q)"
      ).mkString(",\n")
    }.mkString(",\n")
    s"""${strideEntCtes(4, "S")},
       |$walks""".stripMargin
  }

  /** Final SELECT for [[filteredLadderCtes]]: per query the ranked cut
    * of its selected rung + the thin flag from the selected count. */
  private val filteredLadderFinalSql: String =
    Seq(0L, 7L, 23L).map { q =>
      s"""SELECT CAST($q AS BIGINT) AS query_id, CAST(fr AS BIGINT) AS rank,
         |  node AS vec_id, sim AS cosine_sim,
         |  (SELECT c FROM cnt$q) < 10 AS thin_result
         |FROM (SELECT node, sim,
         |    row_number() OVER (ORDER BY sim DESC, node ASC) AS fr
         |  FROM sel$q) WHERE fr <= 10""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Shared q287/q293 oracle: the full search-then-link replay. */
  protected lazy val graphInsertOracle: String = {
      val batch = Seq(0L, 10L, 20L)
      val bList = batch.mkString(", ")
      val walks = batch.map(q => graphAnnWalkCtes(q, k = 8,
        graph = "kg_s", ent = "ent_s", emb = "embm_s", qsrc = "fullemb",
        ns0 = s"i$q")).mkString(",\n")
      val walkCand = batch.map(q =>
        s"SELECT CAST($q AS BIGINT) AS qid, node, sim FROM res_i$q")
        .mkString(" UNION ALL ")
      s"""WITH ${graphAnnStemCtes(
             s"(SELECT * FROM embeddings WHERE vec_id NOT IN ($bList))", "_s")},
         |fullemb AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
         |$walks,
         |batchv AS (SELECT vec_id, embedding FROM fullemb
         |  WHERE vec_id IN ($bList)),
         |internal AS (SELECT a.vec_id AS qid, CAST(b.vec_id AS BIGINT) AS node,
         |    ${duckCosine("a.embedding", "b.embedding", 64)} AS sim
         |  FROM batchv a JOIN batchv b ON b.vec_id <> a.vec_id),
         |candm AS (SELECT qid AS id, node AS nbr,
         |    max(CAST(round(sim*1000000, 0) AS BIGINT)) AS c
         |  FROM ($walkCand UNION ALL SELECT qid, node, sim FROM internal)
         |  GROUP BY qid, node),
         |fwd AS (SELECT id, nbr, c FROM (SELECT id, nbr, c,
         |    row_number() OVER (PARTITION BY id ORDER BY c DESC, nbr ASC) AS rn
         |  FROM candm) WHERE rn <= 8),
         |symn AS (SELECT id, nbr, c FROM fwd
         |  UNION ALL SELECT nbr AS id, id AS nbr, c FROM fwd),
         |touched AS (SELECT DISTINCT id FROM symn),
         |mrg AS (SELECT id, nbr, max(c) AS c FROM (
         |    SELECT k.id, k.nbr,
         |      CAST(round(k.cosine_sim*1000000, 0) AS BIGINT) AS c
         |    FROM kgc_s k JOIN touched t ON t.id = k.id
         |    UNION ALL SELECT id, nbr, c FROM symn)
         |  GROUP BY id, nbr),
         |pr AS (SELECT id, nbr FROM (SELECT id, nbr,
         |    row_number() OVER (PARTITION BY id ORDER BY c DESC, nbr ASC) AS rn
         |  FROM mrg) WHERE rn <= 8),
         |kg2 AS MATERIALIZED (
         |  SELECT k.id, k.nbr FROM kg_s k
         |  WHERE k.id NOT IN (SELECT id FROM touched)
         |  UNION ALL SELECT id, nbr FROM pr),
         |ent2 AS (SELECT vec_id AS node FROM fullemb ORDER BY vec_id LIMIT 4),
         |${graphAnnWalkCtes(0, k = 10, graph = "kg2", ent = "ent2",
             emb = "fullemb", qsrc = "fullemb", ns0 = "f")}
         |SELECT node AS vec_id, sim AS cosine_sim FROM res_f""".stripMargin
  }
}
