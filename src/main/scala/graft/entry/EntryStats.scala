package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/** stats slice of the [[SparkEntry]] registry — distributional
  * statistics: sketches, sampling, drift, hypothesis metrics,
  * privacy gates, profile diagnostics (event-time analytics live in
  * [[EntryEvents]]).
  * Split by family for maintainability; entries and oracles are
  * verbatim registry content (no behavior change). */
private[graft] trait EntryStats extends EntryContext {

  protected def statsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(



    // ---- window top-k per group
    "q21_topk_per_segment" -> ((s, dir) => {
      val j = T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      j.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("c_mktsegment", "rank", "o_orderkey", "o_totalprice")
    }),




    // ---- deterministic KMV cardinality sketch (bounded-memory typed
    //      Aggregator; md5-derived → bit-reproducible in the oracle).
    //      calibrate=true rides the exact twin along for the oracle
    //      check; the production default is sketch-only (no distinct
    //      shuffle) — see SketchesSpec plan assertion.
    "q35_kmv_distinct" -> ((s, dir) =>
      graft.ops.Sketches.kmvDistinct(T(s, dir, "orders"), "o_custkey", k = 256,
        calibrate = true)),




    // ---- skew handling: salted two-stage aggregation over a 3-value
    //      (maximally skewed) key — results identical to a plain groupBy
    "q30_salted_agg" -> ((s, dir) =>
      Aggregate.saltedRollup(
        T(s, dir, "lineitem"),
        groupBy = Seq("l_returnflag"),
        metrics = Seq(
          Aggregate.SaltedMetric("n_items", "count", "*"),
          Aggregate.SaltedMetric("sum_qty_dec", "sum", "cast(l_quantity as decimal(18,6))"),
          Aggregate.SaltedMetric("max_price", "max", "l_extendedprice")),
        saltBuckets = 8,
        saltOn = Seq("l_orderkey", "l_linenumber"))
        .select(col("l_returnflag"), col("n_items"),
          col("sum_qty_dec").cast("double").as("sum_qty"), col("max_price"))),




    // ---- north-star: corpus-wide heavy hitters (exact top-k tokens;
    //      map-side partial counts, k-row TakeOrdered — never a full
    //      vocabulary sort).
    "q52_heavy_hitters" -> ((s, dir) =>
      graft.ops.Search.topTokens(T(s, dir, "documents"), "text", k = 20)),




    // ---- north-star: count-min sketch — md5-derived buckets make the
    //      whole sketch (cells AND estimates) replayable in the DuckDB
    //      oracle, so unlike typical sketches this one is HASH-checked,
    //      not just bounds-checked. width=32 forces real collisions on
    //      the fixture vocabulary (est > exact for some tokens).
    "q53_cms_counts" -> ((s, dir) =>
      graft.ops.Sketches.cmsTopTokens(
        T(s, dir, "documents"), "text", k = 10, depth = 3, width = 32)),




    // ---- north-star: bloom-pruned exact semi-join — the broadcast
    //      bloom bits prune the big side BEFORE its exchange; the
    //      exact semi-join removes false positives, so the result (and
    //      oracle) is a plain semi-join.
    "q54_bloom_join" -> ((s, dir) => {
      val hot = T(s, dir, "orders")
        .filter(col("o_totalprice") > 450000.0)
        .select("o_orderkey")
      graft.ops.Bloom.prunedSemiJoin(
        T(s, dir, "lineitem"), "l_orderkey", hot, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          expr(s"${dsum("l_quantity")} AS sum_qty"))
    }),




    // ---- north-star: stratified deterministic sampling — the
    //      data-mixing primitive (per-language keep fractions as one
    //      narrow scan-speed filter).
    "q56_stratified_sample" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedSample(
        T(s, dir, "documents"), "lang", "doc_id",
        fractions = Map(
          "en" -> 0.9, "fr" -> 0.5, "es" -> 0.25, "de" -> 0.1, "zh" -> 0.05),
        salt = "mix1")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"))),




    // ---- north-star: leakage-safe train/val/test split — docs hash on
    //      their near-dup CLUSTER representative (q39's components;
    //      singletons on themselves), so a duplicate family can never
    //      straddle the train/test fence and leak training text into
    //      eval through its copies. Same salted fence as q37; the
    //      SamplingSpec integrity case proves zero straddling clusters.
    "q131_leakage_safe_split" -> ((s, dir) => {
      val splits = graft.ops.Sampling.clusterAwareSplit(
        T(s, dir, "documents"), "doc_id", clusterLabels(s, dir),
        Seq(0.8, 0.1, 0.1), salt = "v1")
      splits.zip(Seq("train", "val", "test"))
        .map { case (d, t) => d.select(lit(t).as("split"), col("doc_id")) }
        .reduce(_.unionByName(_))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"))
    }),




    // ---- north-star: keyed-skew diagnostics — the pre-flight report
    //      before any big join/agg: heavy-hitter keys, their share,
    //      skew vs the key-space mean, and the salt fan-out that would
    //      level them (feeds q30's salted path). Decomposable counts +
    //      broadcast 1-row stats + TakeOrdered top-k — no global sort.
    "q133_skew_report" -> ((s, dir) =>
      graft.ops.Diagnostics.skewReport(
        graft.io.Layers.readEvents(s, s"$dir/events.parquet")
          .select("user_id"),
        "user_id", topK = 5)),




    // ---- north-star: weighted sampling without replacement
    //      (Efraimidis–Spirakis keys over the deterministic md5 unit
    //      hash) — per-source top-k by u^(1/w); the oracle replays the
    //      identical keys, so the exact member SET must agree.
    "q160_weighted_sample" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      graft.ops.Sampling.weightedSample(
          docs.withColumn("w", (col("doc_id") % 4 + 1).cast("double")),
          "doc_id", "w", k = 10, salt = "ws1", strataCol = Some("source"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n"),
          sum(col("doc_id")).as("sum_ids"),
          round(sum(col("w")), 6).as("sum_w"))
    }),




    // ---- north-star: k-anonymity / l-diversity release gate — the
    //      aggregate-side privacy audit after the span-level scrub:
    //      quasi-identifier combos covering < k rows are
    //      re-identifiable, k-anonymous combos whose sensitive bucket
    //      takes < l values still leak.
    "q171_k_anonymity" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000))
      graft.ops.Privacy.anonymityReport(
        cust, Seq("c_nationkey", "c_mktsegment"), "bal_bucket", k = 10, l = 3)
    }),




    // ---- north-star: t-closeness audit (q171's missing third gate):
    //      per-group Earth Mover's Distance of the sensitive-bucket
    //      distribution from the global one, over the ordered
    //      equal-spacing metric — integer-exact cumulative numerators
    //      over the common denominator, ONE double division per group.
    "q198_t_closeness" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000))
      graft.ops.Privacy.tClosenessGroups(
        cust, Seq("c_nationkey", "c_mktsegment"), "bal_bucket")
    }),




    // ---- north-star: per-source trimmed length stats — 5%-trimmed
    //      robust means per source (one per-group window, never a
    //      global sort; equal boundary values interchangeable so the
    //      trimmed multiset is deterministic).
    "q227_trimmed_stats" -> ((s, dir) =>
      graft.ops.Stats.trimmedStats(
        T(s, dir, "documents"), "source", "n_chars", trimFrac = 0.05)),




    // ---- north-star: per-source quantile normalization — each doc's
    //      quality score mapped to its within-source rank position
    //      rank/(n+1): "top 10% of each source" becomes the same
    //      predicate everywhere (raw scales drift per source).
    "q228_quantile_norm" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
        .filter(col("text").isNotNull)
        .withColumn("quality", graft.ops.TextOps.qualityScore(col("text")))
      graft.ops.Quality.quantileNormalize(docs, "source", "quality", "doc_id")
    }),




    // ---- north-star: KMV set-operation cardinalities (Beyer et al.
    //      2007) — distinct-customer estimates for the pre/post-1996
    //      order halves AND their union/intersection from two
    //      bottom-256 sketches alone; the sketch algebra behind "how
    //      many NEW users does source B add".
    "q236_kmv_setops" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val cut = lit("1996-01-01 00:00:00").cast("timestamp")
      graft.ops.Sketches.kmvSetCardinalities(
        o.filter(col("o_orderdate") < cut), "o_custkey",
        o.filter(col("o_orderdate") >= cut), "o_custkey", k = 256)
    }),




    // ---- north-star: optimizer-statistics quality — equi-height
    //      histogram selectivity estimates vs TRUE counts for three
    //      range predicates: the report that says whether the cost
    //      model's numbers can be trusted before a join order locks.
    "q240_selectivity" -> ((s, dir) =>
      graft.ops.OptimizerStats.rangeSelectivityReport(
        T(s, dir, "lineitem"), "l_extendedprice", bins = 8,
        predicates = Seq((2000.0, 10000.0), (10000.0, 50000.0),
          (50000.0, 105000.0)))),




    // ---- north-star: System-R join-cardinality estimate vs actual on
    //      the two workhorse TPC-H joins — actual computed from the
    //      per-key count frames, never by materializing the join.
    "q241_join_card" -> ((s, dir) =>
      graft.ops.OptimizerStats.joinCardinalityEstimate(
          T(s, dir, "orders"), "o_orderkey",
          T(s, dir, "lineitem"), "l_orderkey", label = "orders_lineitem")
        .unionByName(graft.ops.OptimizerStats.joinCardinalityEstimate(
          T(s, dir, "customer"), "c_custkey",
          T(s, dir, "orders"), "o_custkey", label = "customer_orders"))),




    // ---- north-star: ε-DP Laplace release counts with SEEDED noise
    //      (salted md5 inverse-CDF draw) — reproducible releases, no
    //      fresh noise leakage on re-runs; per-language doc counts.
    "q243_dp_counts" -> ((s, dir) =>
      graft.ops.Privacy.dpNoisyCounts(
        T(s, dir, "documents"), "lang", epsilon = 1.0, salt = "e1")),




    // ---- north-star: Benford first-digit audit — the fabricated-
    //      data detector: observed first-significant-digit shares vs
    //      log10(1+1/d), per-digit χ² terms; string-derived digits, no
    //      float-boundary risk.
    "q258_benford" -> ((s, dir) =>
      graft.ops.Stats.benfordAudit(
        T(s, dir, "lineitem"), "l_extendedprice")),




    // ---- north-star: weight-of-evidence binning — equi-height score
    //      bins encoded as ln(good-share/bad-share) with per-bin
    //      information value: the scorecard feature-engineering
    //      standard, Laplace-smoothed.
    "q260_woe" -> ((s, dir) =>
      graft.ops.Scoring.woeBinning(
        T(s, dir, "lineitem").withColumn("is_r", col("l_returnflag") === "R"),
        "l_extendedprice", "is_r", bins = 6, smooth = 0.5)),




    // ---- north-star: Hill tail-index of doc lengths — the
    //      extreme-value companion of q212's Zipf rank fit: α̂ ≤ 2
    //      means infinite variance and mean-based planning is wrong;
    //      micro-int ln terms over the top-k order statistics.
    "q262_hill_tail" -> ((s, dir) =>
      graft.ops.Stats.hillTailIndex(
        T(s, dir, "documents"), "n_chars", k = 100)),




    // ---- north-star: largest-remainder apportionment — split 1000
    //      eval slots across sources proportionally with EXACT integer
    //      quotas (truncation alone starves small groups).
    "q266_allocation" -> ((s, dir) =>
      graft.ops.Sampling.largestRemainderAllocation(
        T(s, dir, "documents"), "source", seats = 1000L)),




    // ---- north-star: Cramér's V between language and source — "are
    //      the corpus's categoricals independent", normalized to [0,1]
    //      over the DENSIFIED contingency grid.
    "q273_cramers_v" -> ((s, dir) =>
      graft.ops.Diagnostics.cramersV(
        T(s, dir, "documents"), "lang", "source")),




    // ---- the profiler's 100 TB configuration — approx distincts
    //      (HLL++) remove the Expand row duplication entirely. HLL
    //      estimates aren't replayable in DuckDB, so the dump carries
    //      the estimate FOLDED INTO its sanity envelope (1 ≤ est ≤
    //      non-null rows — a broken sketch reads false and fails the
    //      gate) while every deterministic profile column (counts,
    //      nulls, min/max) is exact-matched; the TIGHT ±error bound
    //      vs exact distincts stays StatsSpec-pinned. The HLL agg
    //      still executes (the envelope column consumes it), so the
    //      bench row keeps timing the sketch path.
    "q63_profile_approx" -> ((s, dir) =>
      graft.ops.Stats.profile(
          T(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_orderkey"),
          approxDistinct = true)
        .select(col("column"), col("n_rows"), col("n_nulls"),
          (col("n_distinct") >= 1L &&
            col("n_distinct") <= col("n_rows") - col("n_nulls"))
            .as("n_distinct_in_bounds"),
          col("min_val"), col("max_val")))
  )

  protected def statsOracles: Map[String, String] = Map(

    // q63: exact replay of the deterministic profile skeleton; the
    // HLL estimate is dumped as its sanity-envelope verdict (the
    // Spark side computes `1 ≤ est ≤ non-null rows` — a broken
    // sketch reads false and hash-mismatches this constant)
    "q63_profile_approx" -> {
      def block(c: String, num: Boolean) = {
        val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  true AS n_distinct_in_bounds, $mn AS min_val, $mx AS max_val
           |FROM lineitem""".stripMargin
      }
      Seq(
        block("l_quantity", num = true),
        block("l_extendedprice", num = true),
        block("l_returnflag", num = false),
        block("l_orderkey", num = true)).mkString("\nUNION ALL\n")
    },



    // k-anonymity replay: identical grouping + identical floor-bucket
    // of the sensitive attribute; l failures counted only among
    // k-anonymous groups
    "q171_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |    count(DISTINCT floor(c_acctbal / 1000)) AS nd
        |  FROM customer GROUP BY 1, 2)
        |SELECT count(*) AS n_groups,
        |  CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_small_groups,
        |  CAST(COALESCE(sum(CASE WHEN n < 10 THEN n END), 0) AS BIGINT)
        |    AS n_rows_at_risk,
        |  CAST(min(n) AS BIGINT) AS min_group,
        |  CAST(sum(CASE WHEN n >= 10 AND nd < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_diversity
        |FROM g""".stripMargin,




    "q21_topk_per_segment" ->
      s"""WITH r AS (
         |  SELECT c_mktsegment, o_orderkey, o_totalprice,
         |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |)
         |SELECT c_mktsegment, rank, o_orderkey, o_totalprice FROM r WHERE rank <= 3""".stripMargin,




    // t-closeness replay: identical integer numerators over the
    // group×value grid, ordered cumulative window, one final division
    "q198_t_closeness" ->
      """WITH rows0 AS (
        |  SELECT c_nationkey, c_mktsegment, floor(c_acctbal / 1000) AS v
        |  FROM customer WHERE floor(c_acctbal / 1000) IS NOT NULL),
        |gv AS (SELECT v, count(*) AS gcnt FROM rows0 GROUP BY v),
        |gvr AS (SELECT v, gcnt, row_number() OVER (ORDER BY v) AS r FROM gv),
        |meta AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n_total, count(*) AS m
        |         FROM gv),
        |grp AS (SELECT c_nationkey, c_mktsegment, count(*) AS ng
        |        FROM rows0 GROUP BY 1, 2),
        |cells AS (SELECT c_nationkey, c_mktsegment, v, count(*) AS cnt
        |          FROM rows0 GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT g.c_nationkey, g.c_mktsegment, g.ng, x.r, m.n_total, m.m,
        |    (coalesce(c.cnt, 0) * m.n_total - x.gcnt * g.ng) AS numer
        |  FROM grp g CROSS JOIN gvr x CROSS JOIN meta m
        |  LEFT JOIN cells c ON c.c_nationkey = g.c_nationkey
        |    AND c.c_mktsegment = g.c_mktsegment AND c.v = x.v),
        |cum AS (SELECT c_nationkey, c_mktsegment, ng, n_total, m,
        |    sum(numer) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY r) AS cum
        |  FROM grid)
        |SELECT c_nationkey, c_mktsegment, CAST(ng AS BIGINT) AS n,
        |  CASE WHEN m <= 1 THEN 0.0
        |       ELSE round(CAST(sum(abs(cum)) AS BIGINT)
        |         / (ng * n_total * (m - 1)), 6) END AS emd
        |FROM cum GROUP BY c_nationkey, c_mktsegment, ng, n_total, m""".stripMargin,




    "q30_salted_agg" ->
      s"""SELECT l_returnflag, count(*) AS n_items,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  max(l_extendedprice) AS max_price
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,




    "q35_kmv_distinct" -> {
      val h = s"(CAST(${PortableSql.minhashBase("CAST(o_custkey AS VARCHAR)", DD)} AS DOUBLE) / 1152921504606846976.0)"
      s"""WITH hs AS (SELECT DISTINCT $h AS h FROM orders),
         |k AS (SELECT h FROM hs ORDER BY h LIMIT 256),
         |agg AS (SELECT count(*) AS n, max(h) AS hk FROM k)
         |SELECT round(CASE WHEN n < 256 THEN CAST(n AS DOUBLE) ELSE 255.0 / hk END, 6) AS est_distinct,
         |  (SELECT count(DISTINCT o_custkey) FROM orders) AS exact_distinct
         |FROM agg""".stripMargin
    },




    // trimmed-stats replay: per-source rank window, floor(n·0.05)
    // cut from each end, exact integer sums
    "q227_trimmed_stats" ->
      """WITH r AS (SELECT source, n_chars AS v,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars)
        |      AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |c AS (SELECT *, CAST(floor(n * 0.05) AS BIGINT) AS cut FROM r)
        |SELECT source, max(n) AS n,
        |  2 * max(cut) AS n_trimmed,
        |  round(CAST(sum(v) AS DOUBLE) / max(n), 6) AS mean_raw,
        |  round(CAST(sum(CASE WHEN rk > cut AND rk <= n - cut
        |      THEN v ELSE 0 END) AS DOUBLE)
        |    / (max(n) - 2 * max(cut)), 6) AS mean_trimmed
        |FROM c GROUP BY source""".stripMargin,




    // quantile-norm replay: per-source rank window, rank/(n+1)
    "q228_quantile_norm" ->
      s"""WITH s AS (SELECT doc_id, source,
         |    ${PortableSql.qualityScore("text", DD)} AS quality
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY quality, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM s)
         |SELECT doc_id, source, quality,
         |  round(CAST(rk AS DOUBLE) / (n + 1), 6) AS q_norm FROM r""".stripMargin,




    // KMV set-ops replay: the q35 hash, bottom-256 per half, merged
    // bottom-256 union, both-sketch membership
    "q236_kmv_setops" -> {
      val h = s"(CAST(${PortableSql.minhashBase("CAST(o_custkey AS VARCHAR)", DD)} AS DOUBLE) / 1152921504606846976.0)"
      def estSel(src: String) =
        s"(SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE) ELSE 255.0 / max(h) END FROM $src)"
      s"""WITH ha AS (SELECT DISTINCT $h AS h FROM orders
         |  WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
         |hb AS (SELECT DISTINCT $h AS h FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'),
         |ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
         |kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
         |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
         |       ORDER BY h LIMIT 256),
         |sh AS (SELECT count(*) AS s FROM ku
         |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
         |un AS (SELECT count(*) AS nu FROM ku)
         |SELECT round(${estSel("ka")}, 6) AS est_a,
         |  round(${estSel("kb")}, 6) AS est_b,
         |  round(${estSel("ku")}, 6) AS est_union,
         |  round(CAST(sh.s AS DOUBLE) / un.nu, 6) AS est_jaccard,
         |  round((CAST(sh.s AS DOUBLE) / un.nu) * ${estSel("ku")}, 6)
         |    AS est_intersection
         |FROM sh, un""".stripMargin
    },




    // histogram-selectivity replay: rank → equal-count bins (floor of
    // the same double quotient), uniform-within-bin overlap estimate,
    // one conditional-aggregation actual; rel_error from the ROUNDED
    // estimate so the report is engine-exact
    "q240_selectivity" ->
      """WITH r AS (SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice) AS rk,
        |    count(*) OVER () AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |h AS (SELECT CAST(floor((rk - 1) * 8.0 / n) AS BIGINT) AS bin,
        |    min(v) AS lo, max(v) AS hi, count(*) AS cnt
        |  FROM r GROUP BY 1),
        |preds AS (SELECT CAST(pl AS DOUBLE) AS pred_lo,
        |    CAST(ph AS DOUBLE) AS pred_hi
        |  FROM (VALUES (2000.0, 10000.0),
        |    (10000.0, 50000.0), (50000.0, 105000.0)) AS t(pl, ph)),
        |est AS (SELECT pred_lo, pred_hi,
        |    round(sum(cnt * CASE WHEN hi = lo
        |      THEN CASE WHEN pred_lo <= lo AND lo < pred_hi
        |        THEN 1.0 ELSE 0.0 END
        |      ELSE greatest(0.0, least((least(hi, pred_hi)
        |        - greatest(lo, pred_lo)) / (hi - lo), 1.0)) END), 4)
        |      AS est_rows
        |  FROM h CROSS JOIN preds GROUP BY 1, 2),
        |act AS (SELECT p.pred_lo, p.pred_hi,
        |    CAST(sum(CASE WHEN l.l_extendedprice >= p.pred_lo
        |      AND l.l_extendedprice < p.pred_hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS actual_rows
        |  FROM preds p CROSS JOIN lineitem l GROUP BY 1, 2)
        |SELECT e.pred_lo, e.pred_hi, e.est_rows, a.actual_rows,
        |  CASE WHEN a.actual_rows = 0 THEN NULL
        |    ELSE round((e.est_rows - a.actual_rows) / a.actual_rows, 6)
        |  END AS rel_error
        |FROM est e JOIN act a
        |  ON a.pred_lo = e.pred_lo AND a.pred_hi = e.pred_hi""".stripMargin,




    // join-cardinality replay: per-key count frames, System-R estimate
    // |A||B|/max(ndv), actual = Σ cnt_a·cnt_b — never the join itself
    "q241_join_card" -> {
      def one(label: String, ta: String, ka: String, tb: String, kb: String) =
        s"""SELECT '$label' AS label, n_a, n_b, ndv_a, ndv_b,
           |  round(CAST(n_a AS DOUBLE) * n_b / greatest(ndv_a, ndv_b), 4)
           |    AS est_rows,
           |  actual_rows,
           |  round(actual_rows / round(CAST(n_a AS DOUBLE) * n_b
           |    / greatest(ndv_a, ndv_b), 4), 6) AS ratio
           |FROM (
           |  SELECT
           |    (SELECT count(*) FROM $ta WHERE $ka IS NOT NULL) AS n_a,
           |    (SELECT count(DISTINCT $ka) FROM $ta) AS ndv_a,
           |    (SELECT count(*) FROM $tb WHERE $kb IS NOT NULL) AS n_b,
           |    (SELECT count(DISTINCT $kb) FROM $tb) AS ndv_b,
           |    (SELECT CAST(coalesce(sum(ca.na * cb.nb), 0) AS BIGINT) FROM
           |      (SELECT $ka AS k, count(*) AS na FROM $ta
           |       WHERE $ka IS NOT NULL GROUP BY 1) ca
           |      JOIN (SELECT $kb AS k, count(*) AS nb FROM $tb
           |       WHERE $kb IS NOT NULL GROUP BY 1) cb USING (k))
           |      AS actual_rows)""".stripMargin
      one("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey") +
        "\nUNION ALL\n" +
        one("customer_orders", "customer", "c_custkey", "orders", "o_custkey")
    },




    // DP-counts replay: the q37 salted md5 unit hash drives the same
    // Laplace inverse CDF at ε = 1
    "q243_dp_counts" -> {
      val h = PortableSql.minhashBase("concat('e1', ':', lang)", DD)
      s"""WITH g AS (SELECT lang, count(*) AS n FROM documents
         |  WHERE lang IS NOT NULL GROUP BY lang),
         |u AS (SELECT lang, n,
         |    CAST($h AS DOUBLE) / 1152921504606846976.0 AS u FROM g)
         |SELECT lang, round(n + (-1.0) * sign(u - 0.5)
         |  * ln(1 - 2 * abs(u - 0.5)), 6) AS n_noisy
         |FROM u""".stripMargin
    },




    // Benford replay: first [1-9] of the string form, the SAME Scala
    // log10 expectation doubles interpolated, per-digit χ² terms
    "q258_benford" -> {
      val shares = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
      val digitRows = shares.map { case (d, e) =>
        s"SELECT $d AS digit, CAST($e AS DOUBLE) AS e"
      }.mkString("\nUNION ALL ")
      s"""WITH c AS (SELECT CAST(regexp_extract(
         |      CAST(abs(l_extendedprice) AS VARCHAR), '[1-9]') AS INT)
         |      AS digit,
         |    count(*) AS n
         |  FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice <> 0
         |    AND regexp_extract(CAST(abs(l_extendedprice) AS VARCHAR),
         |      '[1-9]') <> ''
         |  GROUP BY 1),
         |d AS ($digitRows),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
         |SELECT d.digit, coalesce(c.n, 0) AS n,
         |  round(CAST(coalesce(c.n, 0) AS DOUBLE) / t.t, 6) AS share,
         |  round(d.e, 6) AS expected_share,
         |  round((coalesce(c.n, 0) - d.e * t.t)
         |    * (coalesce(c.n, 0) - d.e * t.t) / (d.e * t.t), 6)
         |    AS chi2_term
         |FROM d LEFT JOIN c ON c.digit = d.digit CROSS JOIN t""".stripMargin
    },




    // WOE replay: rank-cut equal-count bins, smoothed shares, ln
    // evidence and IV terms — same expression shapes
    "q260_woe" ->
      """WITH r AS (SELECT l_extendedprice AS v,
        |    (l_returnflag = 'R') AS g,
        |    row_number() OVER (ORDER BY l_extendedprice,
        |      (l_returnflag = 'R')) AS rk,
        |    count(*) OVER () AS n
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
        |b AS (SELECT CAST(floor((rk - 1) * 6.0 / n) AS BIGINT) AS bin,
        |    v, g FROM r),
        |pb AS (SELECT bin, min(v) AS lo, max(v) AS hi,
        |    CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
        |    CAST(sum(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS n_bad
        |  FROM b GROUP BY bin),
        |t AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
        |    CAST(sum(n_bad) AS BIGINT) AS tb, count(*) AS k FROM pb)
        |SELECT bin, lo, hi, n_good, n_bad,
        |  round(ln(((n_good + CAST(0.5 AS DOUBLE)) / (tg + CAST(0.5 AS DOUBLE) * k))
        |    / ((n_bad + CAST(0.5 AS DOUBLE)) / (tb + CAST(0.5 AS DOUBLE) * k))), 6)
        |    AS woe,
        |  round((((n_good + CAST(0.5 AS DOUBLE)) / (tg + CAST(0.5 AS DOUBLE) * k))
        |    - ((n_bad + CAST(0.5 AS DOUBLE)) / (tb + CAST(0.5 AS DOUBLE) * k)))
        |    * ln(((n_good + CAST(0.5 AS DOUBLE)) / (tg + CAST(0.5 AS DOUBLE) * k))
        |    / ((n_bad + CAST(0.5 AS DOUBLE)) / (tb + CAST(0.5 AS DOUBLE) * k))), 6)
        |    AS iv_term
        |FROM pb CROSS JOIN t""".stripMargin,




    // Hill replay: top-(k+1) order statistics, min threshold,
    // micro-int ln terms over the strictly-above set, /k
    "q262_hill_tail" ->
      """WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0),
        |top AS (SELECT v FROM v ORDER BY v DESC LIMIT 101),
        |thr AS (SELECT min(v) AS t FROM top),
        |s AS (SELECT coalesce(CAST(sum(CAST(round(ln(v / t) * 1e6)
        |      AS BIGINT)) AS BIGINT), 0) AS s
        |  FROM top, thr WHERE v > t)
        |SELECT 100 AS k, t AS threshold,
        |  round(CAST(s AS DOUBLE) / 1e6 / 100, 6) AS hill,
        |  CASE WHEN s = 0 THEN NULL
        |    ELSE round(100 * 1e6 / CAST(s AS DOUBLE), 6) END AS alpha
        |FROM s, thr""".stripMargin,




    // largest-remainder replay: exact integer quota/remainder via //
    // and %, remainder-ranked bonuses, group-ascending tie-break
    "q266_allocation" ->
      """WITH g AS (SELECT source, count(*) AS n_rows FROM documents
        |  WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS N FROM g),
        |b AS (SELECT source, n_rows,
        |    CAST((1000 * n_rows) // N AS BIGINT) AS base,
        |    (1000 * n_rows) % N AS rem
        |  FROM g, t),
        |e AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS extra FROM b),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC)
        |    AS rk FROM b)
        |SELECT source, n_rows, base,
        |  CAST(CASE WHEN rk <= e.extra THEN 1 ELSE 0 END AS BIGINT)
        |    AS bonus,
        |  CAST(base + CASE WHEN rk <= e.extra THEN 1 ELSE 0 END
        |    AS BIGINT) AS allocation
        |FROM r, e""".stripMargin,




    // Cramér's V replay: margins, densified r×c grid, χ² over every
    // cell (absent = observed-0), the min(r−1,c−1) normalization
    "q273_cramers_v" ->
      """WITH rws AS (SELECT lang AS a, source AS b FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS o FROM rws GROUP BY 1, 2),
        |ma AS (SELECT a, count(*) AS ra FROM rws GROUP BY a),
        |mb AS (SELECT b, count(*) AS cb FROM rws GROUP BY b),
        |t AS (SELECT count(*) AS n FROM rws),
        |grid AS (SELECT t.n,
        |    CAST(ma.ra AS DOUBLE) * mb.cb / t.n AS e,
        |    coalesce(c.o, 0) AS o
        |  FROM ma CROSS JOIN mb
        |  LEFT JOIN cells c ON c.a = ma.a AND c.b = mb.b
        |  CROSS JOIN t),
        |x AS (SELECT CAST(max(n) AS BIGINT) AS n,
        |    sum((o - e) * (o - e) / e) AS chi2 FROM grid),
        |d AS (SELECT (SELECT count(*) FROM ma) AS r,
        |    (SELECT count(*) FROM mb) AS c)
        |SELECT n, r, c, round(chi2, 6) AS chi2,
        |  CASE WHEN least(r, c) <= 1 THEN NULL
        |    ELSE round(sqrt(chi2 / (n * (least(r, c) - 1))), 6)
        |  END AS cramers_v
        |FROM x, d""".stripMargin,




    "q52_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($duckToks) AS token FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
         |SELECT token, cnt FROM c ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,




    "q53_cms_counts" -> {
      val depth = 3; val width = 32
      def bucket(d: Int) =
        s"(${PortableSql.minhashBase(s"concat('cms$d:', token)", DD)} % $width)"
      val cellSel = (0 until depth).map(d =>
        s"SELECT $d AS d, ${bucket(d)} AS bucket, exact_cnt FROM cnt").mkString(" UNION ALL ")
      val probeSel = (0 until depth).map(d =>
        s"SELECT token, exact_cnt, $d AS d, ${bucket(d)} AS bucket FROM top").mkString(" UNION ALL ")
      s"""WITH tok AS (SELECT unnest($duckToks) AS token FROM documents),
         |cnt AS (SELECT token, count(*) AS exact_cnt FROM tok GROUP BY token),
         |cells AS (SELECT d, bucket, CAST(sum(exact_cnt) AS BIGINT) AS total
         |          FROM ($cellSel) GROUP BY d, bucket),
         |top AS (SELECT token, exact_cnt FROM cnt ORDER BY exact_cnt DESC, token LIMIT 10),
         |probes AS ($probeSel)
         |SELECT p.token, p.exact_cnt, min(c.total) AS cms_est
         |FROM probes p JOIN cells c USING (d, bucket)
         |GROUP BY p.token, p.exact_cnt""".stripMargin
    },




    "q54_bloom_join" ->
      s"""SELECT l_returnflag, count(*) AS n_rows, ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
         |GROUP BY l_returnflag""".stripMargin,




    "q56_stratified_sample" -> {
      val h = PortableSql.minhashBase("concat('mix1', ':', CAST(doc_id AS VARCHAR))", DD)
      s"""WITH h AS (SELECT doc_id, lang,
         |    CAST($h AS DOUBLE) / 1152921504606846976.0 AS p FROM documents),
         |f AS (SELECT doc_id, lang FROM h WHERE p < CASE lang
         |    WHEN 'de' THEN 0.1 WHEN 'en' THEN 0.9 WHEN 'es' THEN 0.25
         |    WHEN 'fr' THEN 0.5 WHEN 'zh' THEN 0.05 ELSE 0.0 END)
         |SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM f GROUP BY lang""".stripMargin
    },




    // weighted-sample replay: identical Efraimidis–Spirakis keys from
    // the shared salted-md5 unit hash — the exact member set must
    // agree, not just the counts
    "q160_weighted_sample" -> {
      val h = PortableSql.minhashBase("concat('ws1', ':', CAST(doc_id AS VARCHAR))", DD)
      s"""WITH hh AS (
         |  SELECT doc_id, source, CAST(doc_id % 4 + 1 AS DOUBLE) AS w,
         |    CAST($h AS DOUBLE) / 1152921504606846976.0 AS p
         |  FROM documents WHERE text IS NOT NULL),
         |sc AS (SELECT *, power(p, 1.0/w) AS ws FROM hh),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER
         |    (PARTITION BY source ORDER BY ws DESC, doc_id ASC) AS rn
         |  FROM sc)
         |SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |  round(sum(w), 6) AS sum_w
         |FROM r WHERE rn <= 10 GROUP BY source""".stripMargin
    },




    // skew-report replay: decomposable counts, 1-row stats, LIMIT-ed
    // top-k with ascending-key tie-break; arithmetic order mirrored
    // exactly (n*nkeys/total, then /2 for the salt)
    "q133_skew_report" ->
      """WITH sk_c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |sk_s AS (SELECT count(*) AS nkeys, sum(n) AS total FROM sk_c),
        |sk_t AS (SELECT user_id, n FROM sk_c ORDER BY n DESC, user_id ASC LIMIT 5)
        |SELECT t.user_id, t.n,
        |  round(CAST(t.n AS DOUBLE) / s.total, 6) AS share,
        |  round(CAST(s.total AS DOUBLE) / s.nkeys, 6) AS mean_n,
        |  round(CAST(t.n AS DOUBLE) * s.nkeys / s.total, 6) AS skew,
        |  CAST(ceil(CAST(t.n AS DOUBLE) * s.nkeys / s.total / 2) AS BIGINT) AS rec_salt
        |FROM sk_t t, sk_s s""".stripMargin,




    // leakage-safe split replay: closure labels give the cluster
    // representative; every doc hashes on it (singletons on their own
    // id), then q37's salted fence with bit-identical cumulative
    // thresholds
    "q131_leakage_safe_split" -> {
      val cum = Seq(0.8, 0.1, 0.1).scanLeft(0.0)(_ + _)
      val h = PortableSql.minhashBase("concat('v1', ':', CAST(skey AS VARCHAR))", DD)
      s"""WITH RECURSIVE $jaccardCtes,
         |$closureCtes,
         |ls_k AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS skey
         |      FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
         |ls_h AS (SELECT doc_id,
         |    CAST($h AS DOUBLE) / 1152921504606846976.0 AS p FROM ls_k),
         |ls_t AS (SELECT doc_id,
         |    CASE WHEN p < ${cum(1)} THEN 'train'
         |         WHEN p < ${cum(2)} THEN 'val' ELSE 'test' END AS split
         |  FROM ls_h)
         |SELECT split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM ls_t GROUP BY split""".stripMargin
    }
  )
}
