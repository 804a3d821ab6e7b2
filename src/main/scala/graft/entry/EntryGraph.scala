package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/** graph slice of the [[SparkEntry]] registry — link-graph analytics: PageRank/HITS/PPR, components/label propagation, triangles, k-core, similarity/assortativity.
  * Split by family for maintainability; entries and oracles are
  * verbatim registry content (no behavior change). */
private[graft] trait EntryGraph extends EntryContext {

  protected def graphQueries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // ---- north-star: link-graph extraction — pages carry 3
    //      constructive article links (plus nav boilerplate that must
    //      be filtered by href shape); the anchors kernel recovers the
    //      edge list, including the entity-decoded anchor text, and
    //      the oracle rebuilds the same edges from doc_id arithmetic.
    "q150_link_graph" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val page = concat(
        lit("<html><body><nav><a href=\"/home\">Home</a></nav><article><p>"),
        col("text"),
        lit("</p><p>See <a href=\"/doc/"), (id * 2 + 1) % col("__n"),
        lit("\">ref one</a> <a href=\"/doc/"), (id * 3 + 2) % col("__n"),
        lit("\">ref two</a> and <a href=\"/doc/"), (id * 7 + 5) % col("__n"),
        lit("\">ref &amp; three</a>.</p></article></body></html>"))
      docs.crossJoin(broadcast(nRow))
        .select(id.as("src"),
          explode(graft.functions.GraftFunctions.htmlAnchors(s, page)).as("a"))
        .filter(col("a.href").startsWith("/doc/"))
        .select(col("src"),
          regexp_extract(col("a.href"), "^/doc/([0-9]+)$", 1).cast("long").as("dst"),
          col("a.anchor").as("anchor"))
        .groupBy((col("dst") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_edges"),
          countDistinct(col("dst")).as("n_targets"),
          countDistinct(col("src")).as("n_sources"),
          sum(col("dst")).as("sum_dst"),
          sum(when(col("anchor") === "ref & three", 1L).otherwise(0L)).as("n_amp"))
    }),



    // ---- north-star: PageRank over the synthetic web graph (3
    //      out-links per page, q150's formula) — declarative power
    //      method, 3 iterations at d=0.85; the oracle unrolls the same
    //      iterations as CTEs. Float discipline: both engines compute
    //      (1.0 - 0.85) rather than a rounded 0.15 literal, and the
    //      report rounds only at the end.
    "q151_pagerank" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      val nodes = docs.select(id.as("id"))
      graft.ops.LinkGraph.pageRank(nodes, edges, iters = 3, damping = 0.85)
        .groupBy((col("id") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_nodes"),
          round(sum(col("pr")), 6).as("sum_pr"),
          round(max(col("pr")), 9).as("max_pr"))
    }),



    // ---- north-star: HITS hubs/authorities over the synthetic link
    //      graph — 2 mutual-reinforcement iterations with in-plan L2
    //      normalization; the oracle unrolls the identical update
    //      order (authority from OLD hubs, hub from NEW authorities).
    "q158_hits" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      graft.ops.LinkGraph.hits(docs.select(id.as("id")), edges, iters = 2)
        .groupBy((col("id") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_nodes"),
          round(sum(col("auth")), 6).as("sum_auth"),
          round(sum(col("hub")), 6).as("sum_hub"))
    }),



    // ---- north-star: personalized PageRank (random walk with
    //      restart) — teleport pinned to the 1%-of-docs seed set, the
    //      graph-expansion primitive for "more pages like these";
    //      oracle unrolls the same 3 iterations with the same teleport
    //      vector and double-precision discipline.
    "q159_ppr" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      val seeds = docs.filter(id % 100 === 0).select(id.as("id"))
      graft.ops.LinkGraph.personalizedPageRank(
          docs.select(id.as("id")), edges, seeds, iters = 3, damping = 0.85)
        .groupBy((col("id") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_nodes"),
          round(sum(col("pr")), 6).as("sum_pr"))
    }),



    // ---- north-star: triangle counting over the near-dup graph —
    //      degree-ordered edge orientation (compact-forward) bounds
    //      oriented out-degree at O(√m), so the wedge join stays
    //      O(m^1.5) even on skewed graphs; the cluster-density audit
    //      (triangle-rich near-dup families = template copying,
    //      triangle-poor = chains of borderline matches). Reads the
    //      same shared pair index as q16/q39/q47/q176.
    "q180_triangles" -> ((s, dir) =>
      graft.ops.LinkGraph.triangles(
        verifiedPairs(s, dir).select("id_a", "id_b"), "id_a", "id_b")),



    // ---- north-star: label-propagation communities over the q151
    //      synthetic web graph — 3 synchronous rounds with the
    //      deterministic (max votes, min label) rule + self-vote; the
    //      oracle unrolls the same rounds as CTEs, so the full
    //      labeling replays bit-identically.
    "q182_label_prop" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      val nodes = docs.select(id.as("id"))
      graft.ops.LinkGraph
        .labelPropagation(nodes, edges, "src", "dst", iters = 3)
        .groupBy((col("label") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_nodes"),
          countDistinct(col("label")).as("n_communities"),
          sum(col("label")).as("sum_labels"),
          sum(when(col("label") === col("id"), 1L).otherwise(0L))
            .as("n_self"))
    }),



    // ---- north-star: co-citation (shared citing sources) and
    //      bibliographic coupling (shared out-links) over the same
    //      graph — the two classic link-structure similarity signals;
    //      both self-joins key on the BOUNDED-degree side (out-degree
    //      for co-citation, capped in-degree for coupling).
    "q183_link_similarity" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      val cc = graft.ops.LinkGraph.coCitation(edges, "src", "dst")
        .groupBy((col("ta") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("n_common")).as("sum_common"),
          max(col("n_common")).as("max_common"),
          sum(when(col("n_common") >= 2, 1L).otherwise(0L)).as("n_strong"))
        .select(lit("cocite").as("kind"), col("bucket"), col("n_pairs"),
          col("sum_common"), col("max_common"), col("n_strong"))
      val bc = graft.ops.LinkGraph
        .bibCoupling(edges, "src", "dst", maxIndeg = 1000L)
        .groupBy((col("sa") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("n_common")).as("sum_common"),
          max(col("n_common")).as("max_common"),
          sum(when(col("n_common") >= 2, 1L).otherwise(0L)).as("n_strong"))
        .select(lit("bibcouple").as("kind"), col("bucket"), col("n_pairs"),
          col("sum_common"), col("max_common"), col("n_strong"))
      cc.unionByName(bc)
    }),



    // ---- north-star: local clustering coefficients over the
    //      near-dup graph (q180's shared pair index) — per-vertex
    //      cc = 2T/(d(d−1)) from the degree-oriented triangle
    //      pipeline; degree-1 vertices are unmeasurable (NULL), and
    //      cc totals ride as integer micro-units.
    "q190_clustering_coeff" -> ((s, dir) =>
      graft.ops.LinkGraph.clusteringCoefficients(
        verifiedPairs(s, dir).select("id_a", "id_b"), "id_a", "id_b")
        .groupBy((col("id") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_vertices"),
          sum(col("degree")).as("sum_deg"),
          sum(col("n_triangles")).as("sum_tri"),
          sum(when(col("cc").isNotNull, 1L).otherwise(0L))
            .as("n_cc_defined"),
          sum(when(col("cc").isNotNull,
            round(col("cc") * 1e6, 0).cast("long")).otherwise(0L))
            .as("sum_cc_micro"))),



    // ---- north-star: k-core peeling over the q182 synthetic web
    //      graph — 4 synchronous peel rounds at k=5 strip the
    //      periphery (pendant chains, one-shot links) whose graph
    //      signals are noise; the oracle unrolls the same rounds as
    //      CTEs, so the surviving-core membership and in-core degrees
    //      replay bit-identically.
    "q192_k_core" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      graft.ops.LinkGraph.kCore(edges, "src", "dst", k = 5, rounds = 4)
        .groupBy((col("id") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_vertices"),
          sum(col("core_deg")).as("sum_core_deg"),
          max(col("core_deg")).as("max_core_deg"),
          min(col("core_deg")).as("min_core_deg"))
    }),



    // ---- north-star: degree assortativity (Newman 2002) over the
    //      q182 synthetic web graph — do hubs link to hubs? The 1-row
    //      graph-shape statistic (negative = hub-to-leaf web shape;
    //      a positive jag flags mutually-linking spam farms).
    //      Integer-exact Σ sums; one final division.
    "q202_assortativity" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      graft.ops.LinkGraph.degreeAssortativity(edges, "src", "dst")
    }),



    // ---- north-star: PageRank convergence residual — L1 distance
    //      between the last two power iterations of the q151 graph
    //      (prev tracked inside ONE loop, no second run): the stopping
    //      gauge that decides whether iters was enough before ranks
    //      feed scheduling.
    "q223_pagerank_residual" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      graft.ops.LinkGraph.pageRankResidual(
        docs.select(id.as("id")), edges, iters = 3, damping = 0.85)
    }),



    // ---- north-star: host-level PageRank — the q151 page graph
    //      CONTRACTED to hosts (page id % 12; intra-host links
    //      dropped, inter-host edges deduped): the graph a crawler
    //      actually ranks for seed budgets — |hosts| nodes, so the
    //      iteration cost is independent of page count after the one
    //      contraction pass. Dangling hosts handled by the op.
    "q224_host_pagerank" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val pageEdges = docs.crossJoin(broadcast(nRow)).select(
        id.as("psrc"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("pdst"))
      val hostEdges = pageEdges
        .select((col("psrc") % 12).as("src"), (col("pdst") % 12).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val hosts = docs.select((id % 12).as("id")).distinct()
      graft.ops.LinkGraph.pageRank(hosts, hostEdges, iters = 3,
          damping = 0.85)
        .select(col("id").as("host"), round(col("pr"), 9).as("pr"))
    }),



    // ---- north-star: directed reciprocity of the synthetic link
    //      graph — the link-exchange/mutual-citation-ring gauge; one
    //      distinct edge set + one reversed-key semi-join.
    "q271_reciprocity" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      graft.ops.LinkGraph.reciprocity(edges, "src", "dst")
    }),



    // ---- north-star: language assortativity of the link graph —
    //      Newman's categorical mixing coefficient (do pages link
    //      within their language?); integer-exact over the E² common
    //      denominator.
    "q274_lang_assortativity" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val edges = docs.crossJoin(broadcast(nRow)).select(
        id.as("src"),
        explode(array(
          (id * 2 + 1) % col("__n"),
          (id * 3 + 2) % col("__n"),
          (id * 7 + 5) % col("__n"))).as("dst"))
      graft.ops.LinkGraph.attributeAssortativity(
        edges, docs.select(id.as("id"), col("lang").as("label")),
        "src", "dst")
    })
  )

  protected def graphOracles: Map[String, String] = Map(
    // triangle replay: canonical a<b edges from the shared pair CTEs;
    // wedge count = Σ C(d⁺,2) under the same (degree, id) orientation,
    // triangle count = the a<b<c closed-triple join (orientation-free,
    // provably equal)
    "q180_triangles" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |te AS (SELECT DISTINCT least(id_a, id_b) AS a,
         |         greatest(id_a, id_b) AS b
         |       FROM vpairs WHERE id_a <> id_b),
         |tdeg AS (SELECT v, count(*) AS d FROM (
         |    SELECT a AS v FROM te UNION ALL SELECT b AS v FROM te)
         |  GROUP BY v),
         |tor AS (SELECT
         |    CASE WHEN (da.d < db.d) OR (da.d = db.d AND te.a < te.b)
         |      THEN te.a ELSE te.b END AS f
         |  FROM te JOIN tdeg da ON da.v = te.a
         |  JOIN tdeg db ON db.v = te.b),
         |todeg AS (SELECT f, count(*) AS dd FROM tor GROUP BY f),
         |tri AS (SELECT count(*) AS n_triangles
         |        FROM te e1 JOIN te e2 ON e2.a = e1.a AND e2.b > e1.b
         |        JOIN te e3 ON e3.a = e1.b AND e3.b = e2.b)
         |SELECT (SELECT count(*) FROM tdeg) AS n_vertices,
         |  (SELECT count(*) FROM te) AS n_edges,
         |  (SELECT CAST(coalesce(sum(dd * (dd - 1) / 2), 0) AS BIGINT)
         |   FROM todeg) AS n_wedges,
         |  (SELECT CAST(n_triangles AS BIGINT) FROM tri) AS n_triangles""".stripMargin,



    // clustering replay: the orientation-free a<b<c triple enumeration
    // hits the same triangle set, so per-corner explode + counts equal
    // the oriented pipeline's; identical IEEE division, micro-rounded
    "q190_clustering_coeff" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |te AS (SELECT DISTINCT least(id_a, id_b) AS a,
         |         greatest(id_a, id_b) AS b
         |       FROM vpairs WHERE id_a <> id_b),
         |tdeg AS (SELECT v, count(*) AS d FROM (
         |    SELECT a AS v FROM te UNION ALL SELECT b AS v FROM te)
         |  GROUP BY v),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |        FROM te e1 JOIN te e2 ON e2.a = e1.a AND e2.b > e1.b
         |        JOIN te e3 ON e3.a = e1.b AND e3.b = e2.b),
         |pv AS (SELECT v, count(*) AS t FROM (
         |    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
         |    UNION ALL SELECT z FROM tri) GROUP BY v),
         |cc AS (SELECT d.v, d.d, coalesce(pv.t, 0) AS t,
         |         CASE WHEN d.d >= 2
         |           THEN 2.0*coalesce(pv.t, 0)/(d.d*(d.d - 1)) END AS cc
         |       FROM tdeg d LEFT JOIN pv ON pv.v = d.v)
         |SELECT v % 5 AS bucket, count(*) AS n_vertices,
         |  CAST(sum(d) AS BIGINT) AS sum_deg,
         |  CAST(sum(t) AS BIGINT) AS sum_tri,
         |  CAST(sum(CASE WHEN cc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_cc_defined,
         |  CAST(sum(CASE WHEN cc IS NOT NULL
         |    THEN CAST(round(cc*1000000, 0) AS BIGINT) ELSE 0 END) AS BIGINT)
         |    AS sum_cc_micro
         |FROM cc GROUP BY 1""".stripMargin,



    // k-core replay: the q182 edge CTEs + 4 unrolled peel rounds —
    // each round keeps vertices with degree >= 5 in the PREVIOUS edge
    // set and edges whose both endpoints survive; pure integer counts,
    // so core membership and in-core degrees replay bit-identically
    "q192_k_core" -> {
      def peel(prev: String, cur: String): String =
        s"""k_$cur AS (
           |  SELECT v FROM (SELECT a AS v FROM e_$prev
           |                 UNION ALL SELECT b FROM e_$prev)
           |  GROUP BY v HAVING count(*) >= 5),
           |e_$cur AS (
           |  SELECT e.a, e.b FROM e_$prev e
           |  JOIN k_$cur x ON e.a = x.v
           |  JOIN k_$cur y ON e.b = y.v)""".stripMargin
      s"""WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
         |e0 AS (
         |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
         |  FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
         |e_0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM e0 WHERE src <> dst),
         |${peel("0", "1")},
         |${peel("1", "2")},
         |${peel("2", "3")},
         |${peel("3", "4")},
         |deg AS (
         |  SELECT id, count(*) AS core_deg FROM (
         |    SELECT a AS id FROM e_4 UNION ALL SELECT b FROM e_4)
         |  GROUP BY id)
         |SELECT id % 5 AS bucket, count(*) AS n_vertices,
         |  CAST(sum(core_deg) AS BIGINT) AS sum_core_deg,
         |  max(core_deg) AS max_core_deg,
         |  min(core_deg) AS min_core_deg
         |FROM deg GROUP BY 1""".stripMargin
    },



    // assortativity replay: canonical edges, degrees, symmetrized
    // endpoint-degree sample, exact integer sums, one division
    "q202_assortativity" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
        |e0 AS (
        |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
        |  FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |        FROM e0 WHERE src <> dst),
        |deg AS (SELECT v, count(*) AS d FROM (
        |    SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v),
        |att AS (SELECT da.d AS x, db.d AS y FROM und
        |        JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b),
        |sym AS (SELECT x, y FROM att UNION ALL SELECT y, x FROM att),
        |agg AS (SELECT count(*) AS m2,
        |    CAST(sum(x*y) AS BIGINT) AS sum_xy,
        |    CAST(sum(x) AS BIGINT) AS sum_x,
        |    CAST(sum(x*x) AS BIGINT) AS sum_x2
        |  FROM sym)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  CAST(m2 / 2 AS BIGINT) AS n_edges, sum_xy, sum_x, sum_x2,
        |  CASE WHEN m2 * sum_x2 - sum_x * sum_x <> 0
        |    THEN round(CAST(m2 * sum_xy - sum_x * sum_x AS DOUBLE)
        |      / CAST(m2 * sum_x2 - sum_x * sum_x AS DOUBLE), 6) END
        |    AS assortativity
        |FROM agg""".stripMargin,



    // residual replay: the q151 unrolled iterations, diff of r_3 vs r_2
    "q223_pagerank_residual" -> {
      def iter(prev: String, cur: String): String =
        s"""c_$cur AS (
           |  SELECT e.dst AS id, sum(r_$prev.pr / deg.outdeg) AS cin
           |  FROM r_$prev JOIN e ON r_$prev.id = e.src
           |  JOIN deg ON e.src = deg.src
           |  GROUP BY e.dst),
           |r_$cur AS (
           |  SELECT nodes.id,
           |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/nn.nd
           |      + CAST(0.85 AS DOUBLE)*(COALESCE(c_$cur.cin, 0.0)) AS pr
           |  FROM nodes LEFT JOIN c_$cur ON nodes.id = c_$cur.id, nn)""".stripMargin
      s"""WITH nn AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS nd, count(*) AS n
         |  FROM documents WHERE text IS NOT NULL),
         |nodes AS (SELECT doc_id AS id FROM documents WHERE text IS NOT NULL),
         |e AS (
         |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
         |  FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |r_0 AS (SELECT id, 1.0/nd AS pr FROM nodes, nn),
         |${iter("0", "1")},
         |${iter("1", "2")},
         |${iter("2", "3")}
         |SELECT 3 AS iters, count(*) AS n_nodes,
         |  round(sum(abs(r_3.pr - r_2.pr)), 6) AS l1_residual,
         |  round(max(abs(r_3.pr - r_2.pr)), 9) AS max_delta
         |FROM r_3 JOIN r_2 ON r_3.id = r_2.id""".stripMargin
    },



    // host-PageRank replay: page edges contracted to distinct
    // inter-host edges, 3 iterations WITH the dangling-mass term
    "q224_host_pagerank" -> {
      def iter(prev: String, cur: String): String =
        s"""c_$cur AS (
           |  SELECT he.dst AS id, sum(r_$prev.pr / deg.outdeg) AS cin
           |  FROM r_$prev JOIN he ON r_$prev.id = he.src
           |  JOIN deg ON he.src = deg.src
           |  GROUP BY he.dst),
           |d_$cur AS (
           |  SELECT coalesce(sum(pr), 0.0) AS dm FROM r_$prev
           |  WHERE id NOT IN (SELECT src FROM deg)),
           |r_$cur AS (
           |  SELECT hosts.id,
           |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/hn.nd
           |      + CAST(0.85 AS DOUBLE)*(COALESCE(c_$cur.cin, 0.0)
           |        + d_$cur.dm/hn.nd) AS pr
           |  FROM hosts LEFT JOIN c_$cur ON hosts.id = c_$cur.id,
           |    hn, d_$cur)""".stripMargin
      s"""WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
         |pe AS (
         |  SELECT doc_id AS psrc, (doc_id*2+1) % n AS pdst
         |  FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
         |he AS (SELECT DISTINCT psrc % 12 AS src, pdst % 12 AS dst
         |       FROM pe WHERE psrc % 12 <> pdst % 12),
         |hosts AS (SELECT DISTINCT doc_id % 12 AS id
         |          FROM documents WHERE text IS NOT NULL),
         |hn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM hosts),
         |deg AS (SELECT src, count(*) AS outdeg FROM he GROUP BY src),
         |r_0 AS (SELECT id, 1.0/nd AS pr FROM hosts, hn),
         |${iter("0", "1")},
         |${iter("1", "2")},
         |${iter("2", "3")}
         |SELECT id AS host, round(pr, 9) AS pr FROM r_3""".stripMargin
    },



    // reciprocity replay: the directed synthetic edges, distinct,
    // self-loop-free, reversed-key semi-join via EXISTS
    "q271_reciprocity" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents
        |  WHERE text IS NOT NULL),
        |e0 AS (
        |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
        |  FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn
        |  WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn
        |  WHERE text IS NOT NULL),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |r AS (SELECT count(*) AS n_reciprocated FROM e a
        |  WHERE EXISTS (SELECT 1 FROM e b
        |    WHERE b.src = a.dst AND b.dst = a.src)),
        |t AS (SELECT count(*) AS n_edges FROM e)
        |SELECT n_edges, n_reciprocated,
        |  round(CAST(n_reciprocated AS DOUBLE) / n_edges, 6)
        |    AS reciprocity
        |FROM t, r""".stripMargin,



    // assortativity replay: labeled synthetic edges, mixing margins,
    // the integer-exact E² common-denominator form
    "q274_lang_assortativity" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents
        |  WHERE text IS NOT NULL),
        |e AS (
        |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
        |  FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn
        |  WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn
        |  WHERE text IS NOT NULL),
        |lab AS (SELECT doc_id AS id, lang AS label FROM documents
        |  WHERE text IS NOT NULL),
        |tg AS (SELECT ls.label AS lx, ld.label AS ly
        |  FROM e JOIN lab ls ON ls.id = e.src
        |  JOIN lab ld ON ld.id = e.dst),
        |mix AS (SELECT lx, ly, count(*) AS nxy FROM tg GROUP BY 1, 2),
        |rs AS (SELECT lx, CAST(sum(nxy) AS BIGINT) AS r FROM mix
        |  GROUP BY lx),
        |cs AS (SELECT ly, CAST(sum(nxy) AS BIGINT) AS c FROM mix
        |  GROUP BY ly),
        |ab AS (SELECT coalesce(CAST(sum(r * c) AS BIGINT), 0) AS ab
        |  FROM rs JOIN cs ON cs.ly = rs.lx),
        |dg AS (SELECT CAST(sum(nxy) AS BIGINT) AS n_edges,
        |    CAST(sum(CASE WHEN lx = ly THEN nxy ELSE 0 END) AS BIGINT)
        |      AS n_same_label
        |  FROM mix)
        |SELECT n_edges, n_same_label,
        |  CASE WHEN n_edges * n_edges = ab THEN NULL
        |    ELSE round(CAST(n_edges * n_same_label - ab AS DOUBLE)
        |      / (n_edges * n_edges - ab), 6) END AS r_assortativity
        |FROM dg, ab""".stripMargin,



    // link-graph replay: the 3 article links per page are doc_id
    // arithmetic; nav links fail the '/doc/' shape filter; the third
    // anchor's '&amp;' must decode
    "q150_link_graph" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
        |e AS (
        |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst, 'ref one' AS anchor
        |  FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+2) % n, 'ref two'
        |  FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+5) % n, 'ref & three'
        |  FROM documents, nn WHERE text IS NOT NULL)
        |SELECT dst % 5 AS bucket, count(*) AS n_edges,
        |  count(DISTINCT dst) AS n_targets,
        |  count(DISTINCT src) AS n_sources,
        |  CAST(sum(dst) AS BIGINT) AS sum_dst,
        |  CAST(sum(CASE WHEN anchor = 'ref & three' THEN 1 ELSE 0 END) AS BIGINT) AS n_amp
        |FROM e GROUP BY 1""".stripMargin,



    // PageRank replay: the same 3 unrolled power iterations as CTEs;
    // (1.0 - 0.85) keeps the teleport constant bit-identical to the
    // Scala side's `1.0 - damping`; dangling mass is 0 by construction
    // (every node has 3 out-links) on BOTH engines
    "q151_pagerank" -> {
      def iter(prev: String, cur: String): String =
        s"""c_$cur AS (
           |  SELECT e.dst AS id, sum(r_$prev.pr / deg.outdeg) AS cin
           |  FROM r_$prev JOIN e ON r_$prev.id = e.src
           |  JOIN deg ON e.src = deg.src
           |  GROUP BY e.dst),
           |r_$cur AS (
           |  SELECT nodes.id,
           |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/nn.nd
           |      + CAST(0.85 AS DOUBLE)*(COALESCE(c_$cur.cin, 0.0)) AS pr
           |  FROM nodes LEFT JOIN c_$cur ON nodes.id = c_$cur.id, nn)""".stripMargin
      s"""WITH nn AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS nd, count(*) AS n
         |  FROM documents WHERE text IS NOT NULL),
         |nodes AS (SELECT doc_id AS id FROM documents WHERE text IS NOT NULL),
         |e AS (
         |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
         |  FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |r_0 AS (SELECT id, 1.0/nd AS pr FROM nodes, nn),
         |${iter("0", "1")},
         |${iter("1", "2")},
         |${iter("2", "3")}
         |SELECT id % 5 AS bucket, count(*) AS n_nodes,
         |  round(sum(pr), 6) AS sum_pr,
         |  round(max(pr), 9) AS max_pr
         |FROM r_3 GROUP BY 1""".stripMargin
    },



    // LPA replay: the same 3 synchronous rounds as CTEs — neighbor
    // votes + one self-vote, argmax = (max count, min label) via a
    // per-node windowed max; pure integer logic, bit-identical
    "q182_label_prop" -> {
      def iter(prev: String, cur: String): String =
        s"""v_$cur AS (
           |  SELECT x.id, x.label, count(*) AS c FROM (
           |    SELECT adj.v AS id, l.label
           |    FROM adj JOIN l_$prev l ON l.id = adj.nbr
           |    UNION ALL SELECT id, label FROM l_$prev) x
           |  GROUP BY x.id, x.label),
           |l_$cur AS (
           |  SELECT id, min(label) AS label FROM (
           |    SELECT id, label, c, max(c) OVER (PARTITION BY id) AS mc
           |    FROM v_$cur) WHERE c = mc GROUP BY id)""".stripMargin
      s"""WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
         |nodes AS (SELECT doc_id AS id FROM documents WHERE text IS NOT NULL),
         |e AS (
         |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
         |  FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM e WHERE src <> dst),
         |adj AS (SELECT a AS v, b AS nbr FROM und
         |        UNION ALL SELECT b, a FROM und),
         |l_0 AS (SELECT id, id AS label FROM nodes),
         |${iter("0", "1")},
         |${iter("1", "2")},
         |${iter("2", "3")}
         |SELECT label % 5 AS bucket, count(*) AS n_nodes,
         |  count(DISTINCT label) AS n_communities,
         |  CAST(sum(label) AS BIGINT) AS sum_labels,
         |  CAST(sum(CASE WHEN label = id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_self
         |FROM l_3 GROUP BY 1""".stripMargin
    },



    // co-citation / coupling replay: distinct (src, dst) edges, pair
    // self-joins on the shared endpoint, the same >=2-strength rollup;
    // the coupling side replays the in-degree cap (non-binding at
    // fixture scale, but the contract is part of the query)
    "q183_link_similarity" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
        |e0 AS (
        |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
        |  FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
        |e AS (SELECT DISTINCT src, dst FROM e0),
        |cc AS (
        |  SELECT ea.dst AS ta, eb.dst AS tb, count(*) AS n_common
        |  FROM e ea JOIN e eb ON ea.src = eb.src AND ea.dst < eb.dst
        |  GROUP BY 1, 2),
        |kept AS (SELECT dst FROM e GROUP BY dst HAVING count(*) <= 1000),
        |ek AS (SELECT e.src, e.dst FROM e JOIN kept USING (dst)),
        |bc AS (
        |  SELECT ea.src AS sa, eb.src AS sb, count(*) AS n_common
        |  FROM ek ea JOIN ek eb ON ea.dst = eb.dst AND ea.src < eb.src
        |  GROUP BY 1, 2)
        |SELECT 'cocite' AS kind, ta % 5 AS bucket, count(*) AS n_pairs,
        |  CAST(sum(n_common) AS BIGINT) AS sum_common,
        |  max(n_common) AS max_common,
        |  CAST(sum(CASE WHEN n_common >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_strong
        |FROM cc GROUP BY 1, 2
        |UNION ALL
        |SELECT 'bibcouple', sa % 5, count(*),
        |  CAST(sum(n_common) AS BIGINT), max(n_common),
        |  CAST(sum(CASE WHEN n_common >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM bc GROUP BY 1, 2""".stripMargin,



    // HITS replay: identical update order (auth from OLD hubs, hub
    // from NEW auths), L2 norms as one-row aggregates
    "q158_hits" -> {
      def iter(prev: String, cur: String): String =
        s"""a${cur}raw AS (
           |  SELECT e.dst AS id, sum(h$prev.hub) AS v
           |  FROM h$prev JOIN e ON h$prev.id = e.src GROUP BY e.dst),
           |a${cur}u AS (
           |  SELECT nodes.id, COALESCE(a${cur}raw.v, 0.0) AS auth
           |  FROM nodes LEFT JOIN a${cur}raw ON nodes.id = a${cur}raw.id),
           |a${cur}n AS (SELECT sqrt(sum(auth*auth)) AS nrm FROM a${cur}u),
           |a$cur AS (
           |  SELECT id, CASE WHEN nrm > 0 THEN auth/nrm ELSE 0.0 END AS auth
           |  FROM a${cur}u, a${cur}n),
           |h${cur}raw AS (
           |  SELECT e.src AS id, sum(a$cur.auth) AS v
           |  FROM a$cur JOIN e ON a$cur.id = e.dst GROUP BY e.src),
           |h${cur}u AS (
           |  SELECT nodes.id, COALESCE(h${cur}raw.v, 0.0) AS hub
           |  FROM nodes LEFT JOIN h${cur}raw ON nodes.id = h${cur}raw.id),
           |h${cur}n AS (SELECT sqrt(sum(hub*hub)) AS nrm FROM h${cur}u),
           |h$cur AS (
           |  SELECT id, CASE WHEN nrm > 0 THEN hub/nrm ELSE 0.0 END AS hub
           |  FROM h${cur}u, h${cur}n)""".stripMargin
      s"""WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
         |nodes AS (SELECT doc_id AS id FROM documents WHERE text IS NOT NULL),
         |e AS (
         |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
         |  FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
         |h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS hub FROM nodes),
         |${iter("0", "1")},
         |${iter("1", "2")}
         |SELECT a2.id % 5 AS bucket, count(*) AS n_nodes,
         |  round(sum(a2.auth), 6) AS sum_auth,
         |  round(sum(h2.hub), 6) AS sum_hub
         |FROM a2 JOIN h2 ON a2.id = h2.id GROUP BY 1""".stripMargin
    },



    // personalized-PageRank replay: teleport = isSeed/|S|, init = t,
    // 3 unrolled iterations, dangling term 0 by construction; the
    // (1.0 − 0.85) CAST discipline matches the Scala double exactly
    "q159_ppr" -> {
      def iter(prev: String, cur: String): String =
        s"""c_$cur AS (
           |  SELECT e.dst AS id, sum(r_$prev.pr / deg.outdeg) AS cin
           |  FROM r_$prev JOIN e ON r_$prev.id = e.src
           |  JOIN deg ON e.src = deg.src
           |  GROUP BY e.dst),
           |r_$cur AS (
           |  SELECT t.id,
           |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * t.t
           |      + CAST(0.85 AS DOUBLE)*(COALESCE(c_$cur.cin, 0.0)) AS pr
           |  FROM t LEFT JOIN c_$cur ON t.id = c_$cur.id)""".stripMargin
      s"""WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
         |ss AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS s
         |  FROM documents WHERE text IS NOT NULL AND doc_id % 100 = 0),
         |t AS (
         |  SELECT doc_id AS id,
         |    CASE WHEN doc_id % 100 = 0 THEN 1.0/s ELSE CAST(0.0 AS DOUBLE) END AS t
         |  FROM documents, ss WHERE text IS NOT NULL),
         |e AS (
         |  SELECT doc_id AS src, (doc_id*2+1) % n AS dst
         |  FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*3+2) % n FROM documents, nn WHERE text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, (doc_id*7+5) % n FROM documents, nn WHERE text IS NOT NULL),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |r_0 AS (SELECT id, t AS pr FROM t),
         |${iter("0", "1")},
         |${iter("1", "2")},
         |${iter("2", "3")}
         |SELECT id % 5 AS bucket, count(*) AS n_nodes,
         |  round(sum(pr), 6) AS sum_pr
         |FROM r_3 GROUP BY 1""".stripMargin
    }
  )
}
