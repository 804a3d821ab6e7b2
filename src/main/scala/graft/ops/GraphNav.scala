package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph-ANN NAVIGATION quality ops — the published fixes the flat-NSW
 * beam ([[Nsw.graphSearchBatch]]) plateaus without
 * (`/root/reference` has no ANN at all — north-star surface; the r17
 * recall audit measured stride seeding topping out at 0.313
 * noise-floor recall@10 at 10×, with both fixes named in
 * [[Nsw.nnDescentRound]]'s scaladoc):
 *
 *  - '''Diversified pruning''' ([[alphaPrunedGraph]]) — DiskANN's
 *    α-RNG RobustPrune (Subramanya et al., NeurIPS 2019) / HNSW's
 *    select-neighbors heuristic (Malkov & Yashunin 2018 §4): keep a
 *    candidate edge only if no already-kept closer neighbor "occludes"
 *    it (α·d(kept, cand) > d(node, cand)). A raw kNN edge list spends
 *    its whole degree budget on one tight cluster direction; the
 *    occlusion rule forces the budget across DIRECTIONS, preserving
 *    the long-range links beam navigation lives on — exactly the
 *    links NN-descent prunes away (the measured navigation regression
 *    knnGraphRefined documents).
 *  - '''Hierarchy''' ([[hierarchicalSearchBatch]]) — HNSW's layer
 *    descent: a sampled upper-layer corpus is walked first, and each
 *    query's upper-layer result seeds its base-layer beam
 *    (per-query entries through `entriesByQuery`), replacing global
 *    seeds with near-the-target ones.
 *
 * Everything is integer-deterministic (micro-cosine arithmetic, total
 * orders) so the gate queries replay edge-for-edge in the DuckDB
 * oracle — the q300 convention.
 *
 * WHEN the occlusion rule has power (measured, BASELINE r18 recall +
 * cluster-nav audits): it needs distance CONTRAST among a node's
 * candidates — some candidate pair closer to each other than to the
 * node. On near-orthogonal noise (the ScaleGen fixture: all pairwise
 * distances ≈ equal) α = 1.2 fires on 1.6% of edges and walks are
 * bit-identical to the raw graph (noise-floor recall@10 ties at
 * 0.313, planted-target hit@1 8/8 — the r17 fixture-contrast ceiling,
 * now confirmed for the third published fix). On CLUSTERED data —
 * the regime the heuristic was published for — it is decisive: raw
 * kNN with k < cluster size is disconnected cliques (recall@10
 * 0.000 at 5k AND 50k corpus), while α-RNG over a pool wide enough
 * to carry cross-cluster candidates reaches 1.000 at the SAME
 * degree-8 budget (`graft.tools.ClusterNav`). Corollary: clusters
 * need a CENTER for intra-cluster occlusion (the hub is closer to
 * every clone than they are to each other); a center-free simplex of
 * equidistant clones occludes nothing.
 */
object GraphNav {

  /**
   * α-RNG diversified pruning of a [[Nsw.knnGraph]]-shaped edge
   * list (id, rank, nbr, cos_micro): per node, process candidates
   * best-first — (cos_micro desc, nbr asc), the knnGraph rank order —
   * and KEEP a candidate `c` only while fewer than `r` edges are kept
   * and no kept `p` occludes it:
   *
   *   occluded(p, c)  ⟺  alphaNum · d(p, c) ≤ alphaDen · d(node, c)
   *
   * with d = 1e6 − cos_micro (micro cosine distance) — α =
   * alphaNum/alphaDen as an exact integer ratio, so the decision is
   * pure integer arithmetic and replays bit-for-bit in SQL. α = 1
   * is the classic relative-neighborhood graph; DiskANN's α ≈ 1.2
   * keeps slightly-occluded edges for robustness. Build the candidate
   * list WIDER than the degree budget (k of the input knnGraph > `r`)
   * so pruned slots refill with directionally-diverse picks.
   *
   * Scale shape: pairwise candidate cosines are one self-equi-join on
   * the node id — ≤ k²/2 rows per node, n·O(k²) total (the
   * [[Nsw.nnDescentRound]] candidate budget), two embedding
   * joins, then ONE bounded per-node aggregation whose greedy scan
   * runs as a higher-order `aggregate` over ≤ k structs; never
   * corpus×corpus, no driver-side state.
   *
   * Output schema = knnGraph's (id, rank, nbr, cos_micro) with ≤ `r`
   * edges per node, rank re-numbered 1..≤r in kept order.
   */
  def alphaPrunedGraph(
      knn: DataFrame,
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      r: Int,
      alphaNum: Int = 12,
      alphaDen: Int = 10): DataFrame = {
    require(r >= 1, "alphaPrunedGraph needs r >= 1")
    require(alphaNum >= alphaDen && alphaDen >= 1,
      "alpha must be >= 1 (alphaNum >= alphaDen >= 1)")
    val spark = corpus.sparkSession
    val cand = knn.select(col("id"), col("nbr"), col("cos_micro"))
    val emb = corpus.select(col(idCol).cast("long").as("__nid"),
      col(embCol).as("__ne"))
    // pairwise cosines between BETTER-ranKED p and candidate c of the
    // same node (the only pairs the greedy consults): micro-rounded
    // through the same kernel/rounding as the input edges
    val better = col("a.cos_micro") > col("b.cos_micro") ||
      (col("a.cos_micro") === col("b.cos_micro") && col("a.nbr") < col("b.nbr"))
    val pw = cand.as("a").join(cand.as("b"),
        col("a.id") === col("b.id") && col("a.nbr") =!= col("b.nbr") && better)
      .select(col("a.id").as("id"), col("a.nbr").as("p"), col("b.nbr").as("c"))
      .join(emb.select(col("__nid").as("p"), col("__ne").as("__ea")), Seq("p"))
      .join(emb.select(col("__nid").as("c"), col("__ne").as("__eb")), Seq("c"))
      .select(col("id"), col("p"), col("c"),
        round(Similarity.cosineFast(spark, col("__ea"), col("__eb")) * 1e6, 0)
          .cast("long").as("pcm"))
      .filter(col("pcm").isNotNull) // zero-norm candidates are unoccludable
    // per candidate: its occlusion context (every better-ranked p with
    // the pairwise micro cosine), then per node: candidates sorted
    // best-first with the context inlined
    val withOcc = cand.join(
        pw.groupBy(col("id"), col("c").as("nbr"))
          .agg(collect_list(struct(col("p"), col("pcm"))).as("occ")),
        Seq("id", "nbr"), "left")
      .select(col("id"), struct(
        (-col("cos_micro")).as("nc"),
        col("nbr").as("nbr"),
        coalesce(col("occ"),
          array().cast("array<struct<p:bigint,pcm:bigint>>")).as("occ")).as("e"))
    // the greedy: aggregate over the sorted candidate structs, kept =
    // array of nbr ids; a candidate joins while |kept| < r and no kept
    // p occludes it — all integer arithmetic, SQL-replayable
    val kept = withOcc
      .groupBy("id")
      .agg(array_sort(collect_list(col("e"))).as("cands"))
      .select(col("id"), expr(
        s"""aggregate(cands, cast(array() as array<bigint>), (kept, c) ->
           |  if (size(kept) >= $r
           |      or exists(c.occ, o -> array_contains(kept, o.p)
           |        and ${alphaNum}L * (1000000L - o.pcm)
           |          <= ${alphaDen}L * (1000000L + c.nc)),
           |    kept, concat(kept, array(c.nbr))))""".stripMargin).as("kept"))
    kept
      .select(col("id"), posexplode(col("kept")).as(Seq("rank0", "nbr")))
      .select(col("id"), (col("rank0") + 1).cast("long").as("rank"), col("nbr"))
      .join(cand.select(col("id"), col("nbr"), col("cos_micro")),
        Seq("id", "nbr"))
      .select(col("id"), col("rank"), col("nbr"), col("cos_micro"))
  }

  /**
   * SELECTIVITY-SAFE attribute-filtered graph ANN — "top-k WHERE
   * <predicate>" with the predicate-aware over-retrieve ESCALATION of
   * Filtered-DiskANN's baseline (Gollapudi et al., WWW 2023; the fix
   * for the q306 composition's silent-thin-answer failure): the beam
   * walks UNFILTERED (graph navigability must not depend on the
   * predicate), the ranked visited set is filtered, and if fewer than
   * `k` rows survive the search WIDENS — beam width and the visited
   * cut both scale by `growth` per rung — until the filtered result
   * reaches `k` or the documented budget cap (`escalations` rungs)
   * is exhausted. A capped-out thin answer is SURFACED, not silent:
   * every row carries `thin_result = true` when the final rung still
   * returned fewer than `k` matches, so a caller filtering on a
   * predicate more selective than the budget covers sees the signal
   * instead of a quietly short list. The flag is row-carried, so a
   * ZERO-match result (the maximally thin case) has no row to carry
   * it — the signal there is the row count itself: `rows < k` ⟺ thin
   * by construction (the result holds min(matches, k) rows).
   *
   * Scale shape: each rung is one [[Nsw.graphSearch]] beam —
   * corpus-independent pruned point lookups, driver state
   * beam-geometry-bounded; the per-rung count action reads ≤
   * k·overFetch·growth^rung rows. Worst case (selective predicate)
   * pays `escalations + 1` walks — bounded by construction, and only
   * when the cheap rung actually came up thin. Deterministic end to
   * end (each rung is the replayable beam + an integer-count pick),
   * so the whole escalation unrolls in SQL — the q300 convention.
   *
   * Output: (rank, idCol, cosine_sim, thin_result), rank 1..≤k by
   * (cosine desc, id asc) over the selected rung's filtered rows.
   * Single-query wrapper over [[filteredSearchBatch]] (the
   * [[Nsw.graphSearch]]/[[Nsw.graphSearchBatch]] convention).
   */
  def filteredSearch(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      queryDf: DataFrame,
      graph: DataFrame,
      predicate: Column,
      k: Int,
      nEntries: Int = 4,
      beamWidth: Int = 16,
      maxSteps: Int = 10,
      entries: Seq[Long] = Nil,
      overFetch: Int = 4,
      escalations: Int = 1,
      growth: Int = 4): DataFrame = {
    Similarity.requireSingleQuery(queryDf, "filteredSearch")
    filteredSearchBatch(corpus, idCol, embCol,
        queryDf.select(lit(0L).as("__qid"), col(embCol)), "__qid",
        graph, predicate, k, nEntries, beamWidth, maxSteps, entries,
        overFetch, escalations, growth)
      .select(col("rank"), col(idCol), col("cosine_sim"), col("thin_result"))
  }

  /**
   * [[filteredSearch]] for a query SET — the probe-service shape: one
   * escalation ladder per query, but every rung's walk runs as ONE
   * [[Nsw.graphSearchBatch]] over the rung's still-thin queries, so
   * each round's adjacency/embedding point lookups merge across the
   * whole batch (the q285 amortization — a per-query driver loop would
   * serialize the walks and re-fetch shared neighborhoods).
   * ESCALATION DECISIONS STAY PER-QUERY: a query whose rung-0 filtered
   * cut already holds `k` matches finalizes there; only the thin
   * queries re-walk at the next rung's geometry (beam and cut ×
   * `growth`), so one selective query never drags the whole batch up
   * the ladder — and the ladder never walks a satisfied query again.
   *
   * Per query the semantics are EXACTLY [[filteredSearch]] (shared
   * `entries`, same rung geometry, same integer-count pick), so the
   * oracle replays each query's ladder independently — the q300
   * convention, composed per query. Driver state: per-rung match
   * counts (one ≤|queries|-row collect per rung) + the beam state
   * [[Nsw.graphSearchBatch]] already bounds.
   *
   * Output: (qidCol: long, rank, idCol, cosine_sim, thin_result),
   * rank 1..≤k per query by (cosine desc, id asc) over that query's
   * selected rung; `thin_result` = that rung (the final one walked for
   * the query) still held fewer than `k` matches.
   */
  def filteredSearchBatch(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      qidCol: String,
      graph: DataFrame,
      predicate: Column,
      k: Int,
      nEntries: Int = 4,
      beamWidth: Int = 16,
      maxSteps: Int = 10,
      entries: Seq[Long] = Nil,
      overFetch: Int = 4,
      escalations: Int = 1,
      growth: Int = 4): DataFrame = {
    require(k >= 1 && overFetch >= 1 && escalations >= 0 && growth >= 1,
      "degenerate escalation geometry")
    // the worst rung's cut is computed in Int (beam geometry): guard
    // the PRODUCT, not just each factor — growth^escalations saturates
    // Double→Int and the multiply wraps negative, which would surface
    // as a silently empty beam instead of this require (r19 advice)
    val worstCut = (1 to escalations).foldLeft(k.toLong * overFetch) {
      case (acc, _) => if (acc > Int.MaxValue) acc else acc * growth
    }
    require(worstCut <= Int.MaxValue,
      s"escalation geometry overflows Int: k * overFetch * growth^escalations " +
        s"= $k * $overFetch * $growth^$escalations > ${Int.MaxValue}")
    val spark = corpus.sparkSession
    import scala.jdk.CollectionConverters._
    val perQ = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine_sim").desc, col(idCol).asc)
    // query batch collected ONCE to the driver (small by contract);
    // each rung hands its still-thin subset back as a LOCAL relation —
    // no checkpoint job, no re-scan of whatever frame produced the
    // queries, and graphSearchBatch's own collect of it is a free
    // LocalTableScan
    val qSel = queries.select(col(qidCol).cast("long").as("query_id"),
      col(embCol))
    val qRows = qSel.collect()
    var active = qRows.map(_.getLong(0)).toSeq
    // ONE memo across the whole ladder: rung r+1's wider walk revisits
    // most of rung r's nodes — shared state turns those re-fetches
    // into driver-map hits (identical results; see BeamState scaladoc)
    val beamState = new Nsw.BeamState
    var rung = 0
    var out: DataFrame = null
    var doneLoop = false
    while (!doneLoop) {
      val scale = math.pow(growth.toDouble, rung.toDouble).toInt
      val activeSet = active.toSet
      val activeDf = spark.createDataFrame(
        qRows.filter(r => activeSet(r.getLong(0))).toSeq.asJava, qSel.schema)
      // the rung's walk output is a driver-built local relation
      // (graphSearchBatch collects its beam state), so re-reading
      // `kept` for counts and the cut recomputes nothing remote
      val kept = Nsw.graphSearchBatch(
          corpus, idCol, embCol,
          activeDf, "query_id",
          graph, k = k * overFetch * scale, nEntries, beamWidth * scale,
          maxSteps, entries, state = beamState)
        .select(col("query_id"), col(idCol), col("cosine_sim"))
        .filter(predicate)
      // per-query match counts: ≤ |active| rows on the driver —
      // beam-cut-bounded input, never corpus-∝
      val counts = kept.groupBy("query_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val thin = active.filter(q => counts.getOrElse(q, 0L) < k)
      val settled = if (rung >= escalations) active else active.diff(thin)
      if (settled.nonEmpty) {
        val thinSet = thin.toSet
        val cut = kept
          .filter(col("query_id").isin(settled: _*))
          .withColumn("rank", row_number().over(perQ).cast("long"))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("rank"), col(idCol), col("cosine_sim"),
            col("query_id").isin(thinSet.toSeq: _*).as("thin_result"))
        out = if (out == null) cut else out.unionByName(cut)
      }
      if (rung >= escalations || thin.isEmpty) doneLoop = true
      else { active = thin; rung += 1 }
    }
    out.withColumnRenamed("query_id", qidCol)
  }

  /**
   * HNSW-style two-layer hierarchical beam search — the PRODUCTION
   * wrapper for the per-query-seed hook
   * ([[Nsw.graphSearchBatch]]'s `entriesByQuery`; prototyped in
   * `graft.tools.GraphRecall`): walk the sampled `upperCorpus` first
   * (its graph is small, so a cheap wide beam covers it), then hand
   * each query its own upper-layer top-`seedK` as base-layer entries —
   * near-the-target seeds instead of global ones, the layer-descent
   * step of Malkov & Yashunin 2018. Deterministic end to end: the
   * upper layer is whatever reproducible sample the caller built
   * (e.g. `xxhash64(id) % m = 0`), both walks are the replayable beam.
   *
   * Cost: one graphSearchBatch over the upper layer (corpus-size
   * |upper| ≈ n/m) + the base walk — the base rounds dominate; the
   * upper walk adds one beam's worth of pruned point lookups.
   */
  def hierarchicalSearchBatch(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      qidCol: String,
      graph: DataFrame,
      upperCorpus: DataFrame,
      upperGraph: DataFrame,
      k: Int,
      seedK: Int = 8,
      beamWidth: Int = 8,
      maxSteps: Int = 8,
      upperBeamWidth: Int = 16,
      upperMaxSteps: Int = 10): DataFrame = {
    val upper = Nsw.graphSearchBatch(
        upperCorpus, idCol, embCol, queries, qidCol, upperGraph,
        k = seedK, nEntries = 4, beamWidth = upperBeamWidth,
        maxSteps = upperMaxSteps,
        entries = Nsw.strideEntries(upperCorpus, idCol, 4))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSeq }
    Nsw.graphSearchBatch(corpus, idCol, embCol, queries, qidCol,
      graph, k, nEntries = 4, beamWidth = beamWidth, maxSteps = maxSteps,
      entriesByQuery = upper)
  }
}
