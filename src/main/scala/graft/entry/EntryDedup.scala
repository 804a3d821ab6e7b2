package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/** dedup slice of the [[SparkEntry]] registry — near-dup PAIR
  * detection: MinHash/SimHash/LSH banding, exact Jaccard (PPJoin),
  * weighted/threshold variants, winnowing mirrors, record linkage,
  * semantic dedup (the curation/scrub/durable-index lifecycle lives
  * in [[EntryCuration]]).
  * Split by family for maintainability; entries and oracles are
  * verbatim registry content (no behavior change). */
private[graft] trait EntryDedup extends EntryContext {

  protected def dedupQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- north-star text: fingerprinting
    "q14_fingerprint" -> ((s, dir) =>
      T(s, dir, "documents").selectExpr(
        "doc_id",
        s"${PortableSql.fingerprint("text")} AS fp")),



    // ---- north-star dedup: MinHash + LSH band buckets
    "q15_minhash_bands" -> ((s, dir) =>
      Dedup.lshBuckets(
        Dedup.minhashSignatures(
          T(s, dir, "documents"), "text", "doc_id",
          numHashes = 8, shingleWords = 3),
        "doc_id", numHashes = 8, bands = 4)),



    // ---- north-star dedup: LSH candidates verified by n-gram Jaccard
    //      (builds + memoizes the shared pair index — see verifiedPairs)
    "q16_neardup_pairs" -> ((s, dir) => verifiedPairs(s, dir)),



    // ---- north-star dedup: pairs → DECISIONS (connected components of
    //      the verified near-dup graph; min-id canonical keepers).
    //      Reads the SAME pair index q16 built — a pipeline materializes
    //      the expensive subtree once, not once per consumer.
    "q39_dedup_clusters" -> ((s, dir) =>
      Dedup.components(verifiedPairs(s, dir).select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_keeper"))),



    // ---- north-star dedup: SimHash fingerprint (hash-once explode+agg
    //      plan; the oracle replays the per-bit portable fragment)
    "q17_simhash" -> ((s, dir) =>
      Dedup.simhash(T(s, dir, "documents"), "text", "doc_id", bits = 16)),



    // ---- north-star dedup: SimHash near-dup pairs (hamming-block LSH,
    //      perfect recall for hamming < blocks by pigeonhole). The
    //      32-bit geometry is the documented LEGACY surface and is
    //      collision-saturated by measurement on this small-vocab
    //      corpus (~10 of 32 bits near-unanimous; SimhashAudit,
    //      BASELINE.md r17 density audit: full-corpus sf1 output
    //      9.26M pairs = 111× at 10×, hottest bucket 187M candidate
    //      pairs). It therefore runs on a QUARTER corpus slice
    //      (doc_id % 4 = 0): the md5 oracle surface stays
    //      hash-checked and the plan shape identical, without the
    //      ~38 s of sf1 sweep spent producing output the repo itself
    //      classifies as degenerate (r17 verdict bench-hygiene item);
    //      the slice also sits back under the DEFAULT 25M fence. The
    //      production op is q294's 64-bit / 16-bit-block twin on the
    //      FULL corpus.
    "q31_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashNearDups(
        T(s, dir, "documents").filter(col("doc_id") % 4 === 0),
        "text", "doc_id", bits = 32, blocks = 4, maxHamming = 3)),



    // ---- the production-shaped simhash: 64 bits in four 16-BIT
    //      blocks (65,536 bucket values vs q31's 256) — the "more
    //      bits" fix the q41 entropy note prescribes. Same pigeonhole
    //      recall (maxHamming 3 < 4 blocks); bucket postings stay
    //      hash-thin at scale, UNDER the default 25M fence where the
    //      32-bit shape tripped it (sf1 hottest bucket: 3,032 postings
    //      = 9.19M pairs vs 32-bit's 13,673 = 187M; output 312 →
    //      13,564 true near-dups vs q31's collision-saturated 9.26M —
    //      SimhashAudit, BASELINE.md r17 density audit).
    "q294_simhash64_pairs" -> ((s, dir) =>
      Dedup.simhashNearDups(
        T(s, dir, "documents"), "text", "doc_id",
        bits = 64, blocks = 4, maxHamming = 3)),



    // ---- north-star dedup: corpus-wide keep/drop DECISIONS — the
    //      table a training pipeline consumes. Reads the same shared
    //      pair index as q16/q39; singleton docs keep themselves.
    "q47_dedup_decisions" -> ((s, dir) =>
      Dedup.dedupDecisions(
        T(s, dir, "documents"), "doc_id",
        Dedup.components(verifiedPairs(s, dir).select("id_a", "id_b")))),



    // ---- production-kernel twin of q16: identical plan shape with
    //      the xxhash64 kernel swapped in for md5 (Dedup.Xx64). DuckDB
    //      has no xxhash64, so the oracle is the MD5 TWIN'S replay
    //      (q16's SQL verbatim): verification is hash-free exact
    //      intersection, so the kernel only affects candidate RECALL —
    //      pair-set equality across kernels is spec-pinned (DedupSpec,
    //      both fixture corpora) and now GATE-CHECKED at the verify SF;
    //      a kernel recall divergence surfaces as a loud hash mismatch
    //      (r19 verdict wrong-item #1: the rows-only `err: no_oracle`
    //      driver rows are gone). Bench rows quantify the kernel win.
    //      (q41, the 32-bit SIMHASH xx64 twin, was RETIRED in r18:
    //      measured collision-saturated — sf1 output 24.6M pairs =
    //      106× at 10×, ~58 s of sweep producing degenerate output,
    //      the r17 verdict bench-hygiene item; its kernel seam stays
    //      spec'd in DedupSpec and its density numbers in the
    //      BASELINE.md r17 density-audit row. q294 is the production
    //      simhash surface.)
    "q40_neardup_pairs_xx64" -> ((s, dir) =>
      Dedup.verifiedNearDups(
        T(s, dir, "documents"), "text", "doc_id", threshold = 0.8,
        kind = Dedup.Xx64)),



    // ---- north-star: EXACT all-pairs Jaccard join via prefix
    //      filtering (AllPairs/PPJoin family) — deterministic recall,
    //      no LSH misses; candidates come only from each doc's rarest
    //      shingles, so frequent-shingle posting lists never self-join.
    //      The oracle is a plain all-pairs Jaccard — checking the
    //      exactness guarantee itself, not a replay of the mechanics.
    "q88_exact_jaccard_pairs" -> ((s, dir) =>
      Dedup.prefixFilteredPairs(
        T(s, dir, "documents"), "text", "doc_id", threshold = 0.8)),



    // ---- north-star: SemDeDup — k-means partitions the embedding
    //      space, near-dup pruning runs only WITHIN each cluster
    //      (Σ|cluster|² pairs, cluster-keyed join — never corpus×corpus);
    //      keep = lowest id per semantic dup set.
    "q105_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(
        T(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, iters = 2, threshold = 0.15)),



    // ---- north-star: incremental semantic dedup — the daily batch
    //      screened against the DURABLE vector index (threshold probe:
    //      every corpus match ≥ t in the probed lists, no top-k
    //      truncation; arrival order: corpus wins), then batch
    //      keep-first.
    "q113_incremental_semdedup" -> ((s, dir) =>
      Similarity.incrementalSemanticDedup(
        T(s, dir, "embeddings").filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", corpusVecIndex(s, dir),
        threshold = 0.15, nprobe = 2)),



    // ---- north-star: cross-source duplication matrix — which sources
    //      copy from which: the verified near-dup pairs (shared q16
    //      index) rolled up by normalized source pair. |sources|² rows;
    //      the curation question behind per-source dedup budgets.
    "q91_source_dup_matrix" -> ((s, dir) => {
      val src = T(s, dir, "documents").select(col("doc_id"), col("source"))
      verifiedPairs(s, dir)
        .join(src.select(col("doc_id").as("id_a"), col("source").as("__sa")), Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("__sb")), Seq("id_b"))
        .groupBy(
          least(col("__sa"), col("__sb")).as("source_a"),
          greatest(col("__sa"), col("__sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("cast(sum(cast(jaccard as decimal(18,6))) as double)").as("sum_jaccard"))
    }),



    // ---- production-kernel twin of q88: xx64 shingle hashing in the
    //      prefix join, oracle = q88's kernel-free exact-Jaccard SQL
    //      (valid at EVERY scale, not just the gate SF). The
    //      RESULT is provably IDENTICAL to q88 — the prefix theorem
    //      holds under ANY global total order (each kernel just
    //      induces a different one) and the verify stage compares
    //      shingle STRINGS — so this twin is equality-spec-pinned,
    //      not merely parity-checked.
    "q94_exact_jaccard_xx64" -> ((s, dir) =>
      Dedup.prefixFilteredPairs(
        T(s, dir, "documents"), "text", "doc_id", threshold = 0.8,
        kind = Dedup.Xx64)),



    // ---- north-star: near-containment pairs — the asymmetric
    //      duplicates Jaccard misses (a short doc quoted inside a
    //      longer one: tiny resemblance, near-total containment);
    //      |A∩B|/min(|A|,|B|) ≥ 0.9 over the LSH candidates, exact
    //      overlap verification shared with q16.
    "q169_containment" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      graft.ops.Dedup.containmentPairs(docs, "text", "doc_id", threshold = 0.9)
    }),



    // ---- north-star: soft-dedup mixture weights — near-dup cluster
    //      members keep weight 1/|cluster| instead of being dropped
    //      (each cluster contributes one unit of sampling mass);
    //      reads the SAME shared pair index as q16/q39/q47.
    "q176_soft_dedup" -> ((s, dir) =>
      graft.ops.Sampling.softDedupWeights(
        T(s, dir, "documents"), "doc_id",
        Dedup.components(verifiedPairs(s, dir).select("id_a", "id_b")))),



    // ---- north-star: edit-distance-verified near-dups — the
    //      ORDER-SENSITIVE verifier over the q16 LSH candidates:
    //      Spark's builtin banded levenshtein (Ukkonen cut at
    //      maxDist) separates light-touch edits from same-vocabulary
    //      rewrites that fool set-based Jaccard; DuckDB's builtin
    //      levenshtein replays it exactly on the ASCII corpus.
    "q193_edit_verified" -> ((s, dir) =>
      graft.ops.Dedup.editVerifiedPairs(
        T(s, dir, "documents"), "text", "doc_id", maxDist = 200)
        .groupBy((col("id_a") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("edit_dist")).as("sum_dist"),
          max(col("edit_dist")).as("max_dist"),
          round(sum(col("edit_sim")), 6).as("sum_sim"))),



    // ---- north-star: mirror-host detection (Bharat & Broder 1999) —
    //      host pairs sharing content fingerprints are crawl mirrors;
    //      the pair join is keyed on the FINGERPRINT with a spread cap
    //      (boilerplate on every host carries no mirror signal and
    //      would quadratically dominate), never host × host. The
    //      corpus has no exact-duplicate texts, so the mirror is built
    //      CONSTRUCTIVELY: host m<k> re-serves the even half of host
    //      h<k>'s pages — each (h<k>, m<k>) pair must surface with
    //      containment 1.0 (m ⊂ h) and a partial resemblance, and no
    //      cross pair exists.
    "q209_mirror_hosts" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val fp = graft.ops.TextOps.fingerprint(col("text"))
      val originals = docs.select(
        concat(lit("h"), (col("doc_id") % 6).cast("string")).as("host"),
        fp.as("fp"))
      val mirrors = docs.filter(col("doc_id") % 2 === 0).select(
        concat(lit("m"), (col("doc_id") % 6).cast("string")).as("host"),
        fp.as("fp"))
      Dedup.mirrorHosts(originals.unionByName(mirrors), "host", "fp",
        maxHostsPerFp = 8, minShared = 2)
    }),



    // ---- north-star: MinHash estimation-error report — measured
    //      accuracy of the 8-component signature estimate vs exact
    //      Jaccard over the LSH candidates: the empirical "how many
    //      hashes do I need" answer (stderr ≈ √(J(1−J)/h)).
    "q226_minhash_error" -> ((s, dir) =>
      Dedup.minhashErrorReport(
        T(s, dir, "documents"), "text", "doc_id")),



    // ---- north-star: mirror detection at WINNOWING granularity —
    //      the q209 host-pair overlap re-run over winnowing
    //      fingerprints instead of whole-page md5: the fingerprint
    //      family that also catches NEAR-identical mirrors (template
    //      rewrites), fed through the SAME fingerprint-keyed pair
    //      join with its ubiquity cap.
    "q238_winnow_mirrors" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val fps = graft.ops.TextOps.winnowingFingerprints(
          docs, "text", "doc_id", k = 5, w = 4)
        .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
      val originals = fps.select(
        concat(lit("h"), (col("doc_id") % 6).cast("string")).as("host"),
        col("fp"))
      val mirrors = fps.filter(col("doc_id") % 2 === 0).select(
        concat(lit("m"), (col("doc_id") % 6).cast("string")).as("host"),
        col("fp"))
      Dedup.mirrorHosts(originals.unionByName(mirrors), "host", "fp",
        maxHostsPerFp = 8, minShared = 5)
    }),



    // ---- north-star: IDF-weighted token Jaccard over the exact
    //      PPJoin candidate stem — boilerplate-shared pairs drop, rare
    //      shared content dominates; micro-integer weights keep the
    //      sums engine-exact.
    "q244_weighted_jaccard" -> ((s, dir) =>
      Dedup.weightedJaccardPairs(
        T(s, dir, "documents"), "text", "doc_id", candThreshold = 0.5)),



    // ---- north-star: b-bit minwise hashing (Li & König 2010) — the
    //      32× signature-store compression with its collision-corrected
    //      estimator, graded against full-width and exact Jaccard on
    //      the same candidate pairs.
    "q250_bbit_minhash" -> ((s, dir) =>
      Dedup.bBitMinhashReport(
        T(s, dir, "documents"), "text", "doc_id", numHashes = 8, b = 2)),



    // ---- north-star: Fellegi–Sunter probabilistic record linkage —
    //      per-field m/u log-likelihood evidence over blocked pairs of
    //      the customer table vs its perturbed twin; disagreements
    //      SUBTRACT (what set-overlap dedup can't express).
    "q257_record_linkage" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val dirty = cust.filter(col("c_custkey") % 20 === 0).select(
        (col("c_custkey") + 100000).as("c_custkey"),
        concat(lit(" "), upper(col("c_name")), lit("  ")).as("c_name"),
        col("c_nationkey"),
        (col("c_acctbal") + 0.5).as("c_acctbal"),
        col("c_mktsegment"))
      // maxBlockPairs raised explicitly: the 5-value mktsegment block key
      // is demonstration-grade and exceeds the default fence at the sf1
      // sweep fixture (the fence firing there is by design — a real
      // deployment blocks on a finer key); the pair frame stays a
      // projection, so 10^8 candidates are still join-arithmetic cheap
      graft.ops.Linkage.fellegiSunter(
        dirty, cust, idCol = "c_custkey", blockCol = "c_mktsegment",
        maxBlockPairs = 500_000_000L,
        fields = Seq(
          graft.ops.Linkage.Field("name",
            lower(trim(col("a_c_name"))) === lower(trim(col("b_c_name"))),
            m = 0.95, u = 0.002),
          graft.ops.Linkage.Field("bal",
            abs(col("a_c_acctbal") - col("b_c_acctbal")) <= 1.0,
            m = 0.9, u = 0.05),
          graft.ops.Linkage.Field("nation",
            col("a_c_nationkey") === col("b_c_nationkey"),
            m = 0.95, u = 0.04)),
        upper = 5.0, lower = 0.0)
        .filter(col("decision") =!= "non_match")
    }),



    // ---- north-star: dedup threshold sensitivity — pair counts, doc
    //      reach, and mean similarity at each candidate threshold from
    //      ONE exact stem at the lowest: the tuning table behind THE
    //      dedup knob.
    "q268_threshold_sensitivity" -> ((s, dir) =>
      Dedup.thresholdSensitivity(
        T(s, dir, "documents"), "text", "doc_id",
        thresholds = Seq(0.5, 0.7, 0.9))),



    // ---- north-star: Bloom FPR calibration — measured false-positive
    //      rate on a DISJOINT probe set vs the a-priori theory line and
    //      the actual-fill line (a clumping hash family diverges);
    //      md5 double hashing so the family itself replays.
    "q269_bloom_fpr" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      graft.ops.Bloom.fprCalibration(
        cust.select(col("c_custkey").as("key")),
        cust.select((col("c_custkey") + 1000000).as("key")),
        "key", numBits = 4096, numHashes = 3)
    }),



    // ---- north-star: entity-resolution capstone — q257's probabilistic
    //      matches close transitively into entity clusters with a
    //      min-id canonical per cluster: the golden-record step every
    //      linkage pipeline ends on.
    "q270_linkage_clusters" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val dirty = cust.filter(col("c_custkey") % 20 === 0).select(
        (col("c_custkey") + 100000).as("c_custkey"),
        concat(lit(" "), upper(col("c_name")), lit("  ")).as("c_name"),
        col("c_nationkey"),
        (col("c_acctbal") + 0.5).as("c_acctbal"),
        col("c_mktsegment"))
      val matches = graft.ops.Linkage.fellegiSunter(
        dirty, cust, idCol = "c_custkey", blockCol = "c_mktsegment",
        maxBlockPairs = 500_000_000L, // demonstration-grade key; see q257

        fields = Seq(
          graft.ops.Linkage.Field("name",
            lower(trim(col("a_c_name"))) === lower(trim(col("b_c_name"))),
            m = 0.95, u = 0.002),
          graft.ops.Linkage.Field("bal",
            abs(col("a_c_acctbal") - col("b_c_acctbal")) <= 1.0,
            m = 0.9, u = 0.05),
          graft.ops.Linkage.Field("nation",
            col("a_c_nationkey") === col("b_c_nationkey"),
            m = 0.95, u = 0.04)),
        upper = 5.0, lower = 0.0)
        .filter(col("decision") === "match")
        .select(col("id_a"), col("id_b"))
      Dedup.components(matches)
        .select(col("id"), col("label").as("cluster_id"),
          (col("id") === col("label")).as("is_canonical"))
    }),



    // ---- north-star: posting-list health — the heavy tokens an
    //      isin-prune cannot shrink, with df/tf shares: where stopword
    //      fences and impact-ordered lists get their numbers.
    "q275_index_health" -> ((s, dir) =>
      graft.ops.Search.indexHealth(
        graft.ops.Search.invertedIndex(
          T(s, dir, "documents").filter(col("text").isNotNull),
          "text", "doc_id"),
        topK = 10))
  )

  protected def dedupOracles: Map[String, String] = Map(

    "q14_fingerprint" ->
      s"SELECT doc_id, ${PortableSql.fingerprint("text")} AS fp FROM documents",



    "q15_minhash_bands" ->
      s"""WITH ${minhashCtes}
         |SELECT doc_id, band, bucket FROM buckets""".stripMargin,



    "q16_neardup_pairs" -> neardupPairsOracle,

    // q40 = the xx64 kernel twin: verification is hash-free, kernel
    // recall equality is DedupSpec-pinned and gate-checked here — the
    // md5 replay IS the oracle (see the q40 entry comment)
    "q40_neardup_pairs_xx64" -> neardupPairsOracle,



    // containment replay: the shared LSH-candidate/overlap stem with
    // the min-size denominator instead of the union
    "q169_containment" ->
      s"""WITH $lshInterCtes,
         |cpairs AS (
         |  SELECT it.id_a, it.id_b,
         |    round(it.i / LEAST(sa.n, sb.n), 6) AS containment
         |  FROM inter it JOIN sizes sa ON sa.doc_id = it.id_a
         |  JOIN sizes sb ON sb.doc_id = it.id_b
         |  WHERE round(it.i / LEAST(sa.n, sb.n), 6) >= 0.9)
         |SELECT id_a, id_b, containment FROM cpairs""".stripMargin,



    "q39_dedup_clusters" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |$closureCtes
         |SELECT doc_id, cluster_id, cluster_id = doc_id AS is_keeper
         |FROM labels""".stripMargin,



    "q17_simhash" ->
      s"SELECT doc_id, ${PortableSql.simhash("text", 16, DD)} AS simhash FROM documents",



    // edit-verified replay: the shared LSH candidate CTEs + DuckDB's
    // builtin levenshtein (byte-based, == code-point on this ASCII
    // corpus); the Spark side's banded -1 drop replays as d <= cap
    "q193_edit_verified" ->
      s"""WITH $minhashCtes,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |lv AS (
         |  SELECT p.id_a, p.id_b,
         |    levenshtein(da.text, db.text) AS d,
         |    greatest(strlen(da.text), strlen(db.text)) AS mx
         |  FROM pairs p
         |  JOIN documents da ON da.doc_id = p.id_a
         |  JOIN documents db ON db.doc_id = p.id_b),
         |kept AS (
         |  SELECT id_a, id_b, CAST(d AS BIGINT) AS d,
         |    CASE WHEN mx = 0 THEN 1.0 ELSE round(1.0 - d / mx, 6) END AS sim
         |  FROM lv WHERE d <= 200)
         |SELECT id_a % 5 AS bucket, count(*) AS n_pairs,
         |  CAST(sum(d) AS BIGINT) AS sum_dist,
         |  max(d) AS max_dist,
         |  round(sum(sim), 6) AS sum_sim
         |FROM kept GROUP BY 1""".stripMargin,



    "q31_simhash_pairs" -> {
      val nib = (c: String, i: Int) => s"(instr('0123456789abcdef', substr($c, $i, 1)) - 1)"
      val hamming = (1 to 8).map(i =>
        s"CAST(substr('0112122312232334', xor(${nib("sha", i)}, ${nib("shb", i)}) + 1, 1) AS BIGINT)")
        .mkString(" + ")
      s"""WITH s AS (SELECT doc_id, ${PortableSql.simhash("text", 32, DD)} AS sh
         |           FROM documents WHERE doc_id % 4 = 0),
         |ex AS (
         |  SELECT doc_id, sh, b, substr(sh, b * 2 + 1, 2) AS v
         |  FROM s CROSS JOIN (VALUES (0), (1), (2), (3)) t(b)
         |),
         |p AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, a.sh AS sha, c.sh AS shb
         |  FROM ex a JOIN ex c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
         |),
         |h AS (SELECT id_a, id_b, ($hamming) AS hamming FROM p)
         |SELECT id_a, id_b, hamming FROM h WHERE hamming <= 3""".stripMargin
    },



    // q31's replay at 64 bits / 16-bit blocks: 16 hex chars, blocks of
    // 4 chars, hamming summed over all 16 nibbles
    "q294_simhash64_pairs" -> {
      val nib = (c: String, i: Int) => s"(instr('0123456789abcdef', substr($c, $i, 1)) - 1)"
      val hamming = (1 to 16).map(i =>
        s"CAST(substr('0112122312232334', xor(${nib("sha", i)}, ${nib("shb", i)}) + 1, 1) AS BIGINT)")
        .mkString(" + ")
      s"""WITH s AS (SELECT doc_id, ${PortableSql.simhash("text", 64, DD)} AS sh FROM documents),
         |ex AS (
         |  SELECT doc_id, sh, b, substr(sh, b * 4 + 1, 4) AS v
         |  FROM s CROSS JOIN (VALUES (0), (1), (2), (3)) t(b)
         |),
         |p AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, a.sh AS sha, c.sh AS shb
         |  FROM ex a JOIN ex c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id
         |),
         |h AS (SELECT id_a, id_b, ($hamming) AS hamming FROM p)
         |SELECT id_a, id_b, hamming FROM h WHERE hamming <= 3""".stripMargin
    },



    "q88_exact_jaccard_pairs" -> exactJaccardOracle,

    // q94 = the xx64 prefix-join twin: result provably identical to
    // q88 under ANY kernel's total order — the kernel-free exactness
    // oracle applies verbatim, at every scale
    "q94_exact_jaccard_xx64" -> exactJaccardOracle,



    "q91_source_dup_matrix" ->
      s"""WITH $jaccardCtes
         |SELECT least(da.source, db.source) AS source_a,
         |  greatest(da.source, db.source) AS source_b,
         |  count(*) AS n_pairs,
         |  cast(sum(cast(jaccard as decimal(18,6))) as double) AS sum_jaccard
         |FROM vpairs v
         |JOIN documents da ON da.doc_id = v.id_a
         |JOIN documents db ON db.doc_id = v.id_b
         |GROUP BY 1, 2""".stripMargin,



    // SemDeDup oracle: q55's kmeans CTE chain (same k=4/iters=2 seeds
    // and update) + within-cluster pair probe; keep ⇔ no lower-id
    // cluster-mate with cosine ≥ 0.15
    "q105_semantic_dedup" -> {
      val dims = 64
      def assignCte(cents: String) =
        s"""SELECT vec_id, cid AS cluster FROM (
           |    SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${duckCosine("e.embedding", "c.cemb", dims)} DESC, c.cid ASC) AS rn
           |    FROM embeddings e CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
      s"""WITH c0 AS (SELECT CAST(vec_id AS BIGINT) AS cid,
         |            list_transform(embedding, __x -> CAST(__x AS DOUBLE)) AS cemb
         |            FROM embeddings ORDER BY vec_id LIMIT 4),
         |a0 AS (${assignCte("c0")}),
         |m1 AS (SELECT a0.cluster, d.d, round(avg(CAST(e.embedding[d.d] AS DOUBLE)), 6) AS v
         |       FROM a0 JOIN embeddings e USING (vec_id), generate_series(1, $dims) d(d)
         |       GROUP BY a0.cluster, d.d),
         |c1 AS (SELECT cluster AS cid, list(v ORDER BY d) AS cemb FROM m1 GROUP BY cluster),
         |a1 AS (${assignCte("c1")}),
         |dr AS (SELECT DISTINCT b.vec_id AS id
         |       FROM a1 a JOIN a1 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |       JOIN embeddings ea ON ea.vec_id = a.vec_id
         |       JOIN embeddings eb ON eb.vec_id = b.vec_id
         |       WHERE ${duckCosine("ea.embedding", "eb.embedding", dims)} >= 0.15)
         |SELECT a1.vec_id, a1.cluster, dr.id IS NULL AS keep
         |FROM a1 LEFT JOIN dr ON a1.vec_id = dr.id""".stripMargin
    },



    // incremental semantic dedup oracle: the slice-trained quantizer
    // CTEs, per-query probe of 2 lists, corpus matches ≥ t within
    // probed lists, then batch-internal keep-first pairwise
    "q113_incremental_semdedup" -> {
      val dims = 64
      val corpusSrc = "(SELECT * FROM embeddings WHERE vec_id % 10 <> 0)"
      s"""WITH ${ivfTrainCtes(dims, corpusSrc)},
         |bq AS (SELECT CAST(vec_id AS BIGINT) AS query_id, embedding AS qe
         |       FROM embeddings WHERE vec_id % 10 = 0),
         |probe AS (SELECT query_id, cid AS list_id FROM (
         |    SELECT bq.query_id, c.cid, row_number() OVER (PARTITION BY bq.query_id
         |      ORDER BY ${duckCosine("c.cemb", "bq.qe", dims)} DESC, c.cid ASC) AS rn
         |    FROM c1 c, bq) WHERE rn <= 2),
         |cd AS (SELECT DISTINCT p.query_id
         |       FROM probe p JOIN bq USING (query_id)
         |       JOIN alist a ON a.list_id = p.list_id
         |       JOIN embeddings e ON e.vec_id = a.vec_id
         |       WHERE ${duckCosine("e.embedding", "bq.qe", dims)} >= 0.15),
         |bd AS (SELECT DISTINCT hi.query_id
         |       FROM bq lo JOIN bq hi ON lo.query_id < hi.query_id
         |       WHERE ${duckCosine("lo.qe", "hi.qe", dims)} >= 0.15)
         |SELECT b.query_id AS vec_id,
         |  CASE WHEN cd.query_id IS NOT NULL THEN 'corpus'
         |       WHEN bd.query_id IS NOT NULL THEN 'batch' END AS reason,
         |  cd.query_id IS NULL AND bd.query_id IS NULL AS keep
         |FROM bq b
         |LEFT JOIN cd ON b.query_id = cd.query_id
         |LEFT JOIN bd ON b.query_id = bd.query_id""".stripMargin
    },



    // mirror replay: distinct (host, fp), spread cap 2..8, fp-keyed
    // pair join, resemblance/containment arithmetic
    "q209_mirror_hosts" ->
      """WITH pages AS (
        |  SELECT DISTINCT host, fp FROM (
        |    SELECT 'h' || CAST(doc_id % 6 AS VARCHAR) AS host,
        |      md5(lower(trim(text))) AS fp
        |    FROM documents WHERE text IS NOT NULL
        |    UNION ALL
        |    SELECT 'm' || CAST(doc_id % 6 AS VARCHAR) AS host,
        |      md5(lower(trim(text))) AS fp
        |    FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0)),
        |rare AS (SELECT fp FROM pages GROUP BY fp
        |         HAVING count(*) BETWEEN 2 AND 8),
        |capped AS (SELECT p.host, p.fp FROM pages p JOIN rare USING (fp)),
        |sizes AS (SELECT host, count(*) AS sz FROM pages GROUP BY host),
        |prs AS (SELECT a.host AS host_a, b.host AS host_b,
        |    count(*) AS shared
        |  FROM capped a JOIN capped b
        |    ON a.fp = b.fp AND a.host < b.host
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT host_a, host_b, shared,
        |  sa.sz AS n_a, sb.sz AS n_b,
        |  round(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared), 6)
        |    AS resemblance,
        |  round(CAST(shared AS DOUBLE) / least(sa.sz, sb.sz), 6)
        |    AS containment
        |FROM prs
        |JOIN sizes sa ON sa.host = host_a
        |JOIN sizes sb ON sb.host = host_b""".stripMargin,



    // minhash-error replay: the shared sig/bucket CTEs, candidate
    // pairs, component-match estimate vs the exact candidate Jaccard
    "q226_minhash_error" -> {
      val matches = (0 until 8).map(i =>
        s"(CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH $minhashCtes,
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |      AND a.doc_id < b.doc_id),
         |exsh AS (SELECT DISTINCT doc_id, unnest(s) AS sv FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM exsh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS i
         |  FROM cand c
         |  JOIN exsh ea ON ea.doc_id = c.id_a
         |  JOIN exsh eb ON eb.doc_id = c.id_b AND eb.sv = ea.sv
         |  GROUP BY c.id_a, c.id_b),
         |ex AS (SELECT it.id_a, it.id_b,
         |    round(it.i / (sa.n + sb.n - it.i), 6) AS jaccard
         |  FROM inter it JOIN sizes sa ON sa.doc_id = it.id_a
         |  JOIN sizes sb ON sb.doc_id = it.id_b),
         |est AS (SELECT c.id_a, c.id_b,
         |    CAST(($matches) AS DOUBLE) / 8 AS e
         |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b)
         |SELECT count(*) AS n_pairs,
         |  round(avg(jaccard), 6) AS mean_exact,
         |  round(avg(e), 6) AS mean_est,
         |  round(avg(e - jaccard), 6) AS bias,
         |  round(avg(abs(e - jaccard)), 6) AS mean_abs_err,
         |  round(max(abs(e - jaccard)), 6) AS max_abs_err
         |FROM est JOIN ex USING (id_a, id_b)""".stripMargin
    },



    // winnow-mirror replay: the q49 fingerprint CTE feeding the q209
    // mirror SQL at fingerprint granularity
    "q238_winnow_mirrors" -> {
      val k = 5; val w = 4
      val terms = (0 until k).map { j =>
        val pow = BigInt(257).pow(k - 1 - j).toLong
        s"ascii(substr(text, __i + $j, 1)) * $pow"
      }.mkString("(", " + ", ")")
      s"""WITH hs AS (
         |  SELECT doc_id, CASE WHEN length(text) >= $k THEN list_transform(
         |    generate_series(1, length(text) - ${k - 1}),
         |    __i -> $terms % 1000003) ELSE [] END AS h
         |  FROM documents WHERE text IS NOT NULL),
         |fpl AS (
         |  SELECT doc_id, CASE WHEN len(h) >= 1 THEN list_distinct(list_transform(
         |    generate_series(1, greatest(len(h) - ${w - 1}, 1)),
         |    __t -> list_min(h[__t:__t + ${w - 1}]))) ELSE [] END AS fps
         |  FROM hs),
         |fps AS (SELECT doc_id, unnest(fps) AS fp FROM fpl),
         |pages AS (
         |  SELECT DISTINCT host, fp FROM (
         |    SELECT 'h' || CAST(doc_id % 6 AS VARCHAR) AS host, fp FROM fps
         |    UNION ALL
         |    SELECT 'm' || CAST(doc_id % 6 AS VARCHAR) AS host, fp
         |    FROM fps WHERE doc_id % 2 = 0)),
         |rare AS (SELECT fp FROM pages GROUP BY fp
         |         HAVING count(*) BETWEEN 2 AND 8),
         |capped AS (SELECT p.host, p.fp FROM pages p JOIN rare USING (fp)),
         |sizes AS (SELECT host, count(*) AS sz FROM pages GROUP BY host),
         |prs AS (SELECT a.host AS host_a, b.host AS host_b,
         |    count(*) AS shared
         |  FROM capped a JOIN capped b
         |    ON a.fp = b.fp AND a.host < b.host
         |  GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT host_a, host_b, shared,
         |  sa.sz AS n_a, sb.sz AS n_b,
         |  round(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared), 6)
         |    AS resemblance,
         |  round(CAST(shared AS DOUBLE) / least(sa.sz, sb.sz), 6)
         |    AS containment
         |FROM prs
         |JOIN sizes sa ON sa.host = host_a
         |JOIN sizes sb ON sb.host = host_b""".stripMargin
    },



    // weighted-Jaccard replay: the q88 all-pairs stem at 0.5 for the
    // candidate set, then micro-integer IDF token weights — integer
    // intersection/total sums, one final division
    "q244_weighted_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents
         |  WHERE text IS NOT NULL),
         |sh AS (SELECT doc_id, $duckShingles AS s FROM t),
         |exsh AS (SELECT DISTINCT doc_id, unnest(s) AS sv FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM exsh GROUP BY doc_id),
         |inter AS (
         |  SELECT ea.doc_id AS id_a, eb.doc_id AS id_b, count(*) AS i
         |  FROM exsh ea JOIN exsh eb ON eb.sv = ea.sv
         |    AND ea.doc_id < eb.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b,
         |    round(it.i / (sa.n + sb.n - it.i), 6) AS jaccard
         |  FROM inter it JOIN sizes sa ON sa.doc_id = it.id_a
         |  JOIN sizes sb ON sb.doc_id = it.id_b
         |  WHERE round(it.i / (sa.n + sb.n - it.i), 6) >= 0.5),
         |nd AS (SELECT count(*) AS nd FROM documents WHERE text IS NOT NULL),
         |tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tk FROM t),
         |idf AS (SELECT tk,
         |    CAST(round(ln((nd + 1.0) / (count(*) + 1)) * 1e6) AS BIGINT)
         |      AS w
         |  FROM tok, nd GROUP BY tk, nd.nd),
         |docw AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS sw
         |  FROM tok JOIN idf USING (tk) GROUP BY doc_id),
         |iw AS (SELECT p.id_a, p.id_b, CAST(sum(i.w) AS BIGINT) AS iw
         |  FROM pairs p
         |  JOIN tok ta ON ta.doc_id = p.id_a
         |  JOIN tok tb ON tb.doc_id = p.id_b AND tb.tk = ta.tk
         |  JOIN idf i ON i.tk = ta.tk
         |  GROUP BY 1, 2)
         |SELECT p.id_a, p.id_b, p.jaccard,
         |  round(CAST(coalesce(iw.iw, 0) AS DOUBLE)
         |    / (da.sw + db.sw - coalesce(iw.iw, 0)), 6) AS w_jaccard
         |FROM pairs p
         |LEFT JOIN iw ON iw.id_a = p.id_a AND iw.id_b = p.id_b
         |JOIN docw da ON da.doc_id = p.id_a
         |JOIN docw db ON db.doc_id = p.id_b""".stripMargin,



    // b-bit replay: the q226 chain plus the low-2-bit match fraction
    // and its exact collision correction (E_b − ¼)/¾
    "q250_bbit_minhash" -> {
      val mf = (0 until 8).map(i =>
        s"(CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END)").mkString(" + ")
      val mb = (0 until 8).map(i =>
        s"(CASE WHEN sa.s$i % 4 = sb.s$i % 4 THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashCtes,
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |      AND a.doc_id < b.doc_id),
         |exsh AS (SELECT DISTINCT doc_id, unnest(s) AS sv FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM exsh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS i
         |  FROM cand c
         |  JOIN exsh ea ON ea.doc_id = c.id_a
         |  JOIN exsh eb ON eb.doc_id = c.id_b AND eb.sv = ea.sv
         |  GROUP BY c.id_a, c.id_b),
         |ex AS (SELECT it.id_a, it.id_b,
         |    round(it.i / (sa.n + sb.n - it.i), 6) AS jaccard
         |  FROM inter it JOIN sizes sa ON sa.doc_id = it.id_a
         |  JOIN sizes sb ON sb.doc_id = it.id_b),
         |est AS (SELECT c.id_a, c.id_b,
         |    CAST(($mf) AS DOUBLE) / 8 AS ef,
         |    (CAST(($mb) AS DOUBLE) / 8 - 0.25) / 0.75 AS eb
         |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b)
         |SELECT count(*) AS n_pairs, 2 AS bits_per_component,
         |  round(avg(jaccard), 6) AS mean_exact,
         |  round(avg(ef), 6) AS mean_est_full,
         |  round(avg(eb), 6) AS mean_est_b,
         |  round(avg(abs(ef - jaccard)), 6) AS mae_full,
         |  round(avg(abs(eb - jaccard)), 6) AS mae_b
         |FROM est JOIN ex USING (id_a, id_b)""".stripMargin
    },



    // Fellegi–Sunter replay: the same perturbed twin, blocking join,
    // and the Scala-computed m/u log weights interpolated verbatim so
    // both engines sum identical literals
    "q257_record_linkage" -> {
      val (wnA, wnD) = (math.log(0.95 / 0.002), math.log(0.05 / 0.998))
      val (wbA, wbD) = (math.log(0.9 / 0.05), math.log(0.1 / 0.95))
      val (wkA, wkD) = (math.log(0.95 / 0.04), math.log(0.05 / 0.96))
      s"""WITH dirty AS (SELECT c_custkey + 100000 AS k,
         |    ' ' || upper(c_name) || '  ' AS name, c_nationkey AS nk,
         |    c_acctbal + 0.5 AS bal, c_mktsegment AS seg
         |  FROM customer WHERE c_custkey % 20 = 0),
         |p AS (SELECT d.k AS id_a, c.c_custkey AS id_b,
         |    coalesce(lower(trim(d.name)) = lower(trim(c.c_name)), false)
         |      AS agree_name,
         |    coalesce(abs(d.bal - c.c_acctbal) <= 1.0, false) AS agree_bal,
         |    coalesce(d.nk = c.c_nationkey, false) AS agree_nation
         |  FROM dirty d JOIN customer c ON c.c_mktsegment = d.seg),
         |s AS (SELECT *,
         |    round((CASE WHEN agree_name THEN CAST($wnA AS DOUBLE)
         |        ELSE CAST($wnD AS DOUBLE) END)
         |      + (CASE WHEN agree_bal THEN CAST($wbA AS DOUBLE)
         |        ELSE CAST($wbD AS DOUBLE) END)
         |      + (CASE WHEN agree_nation THEN CAST($wkA AS DOUBLE)
         |        ELSE CAST($wkD AS DOUBLE) END), 6) AS score
         |  FROM p),
         |dec AS (SELECT id_a, id_b, agree_name, agree_bal, agree_nation,
         |    score,
         |    CASE WHEN score >= 5.0 THEN 'match'
         |      WHEN score <= 0.0 THEN 'non_match'
         |      ELSE 'possible' END AS decision
         |  FROM s)
         |SELECT * FROM dec WHERE decision <> 'non_match'""".stripMargin
    },



    // threshold-sensitivity replay: the q88 all-pairs stem at the
    // lowest threshold, melted to (jaccard, doc), per-threshold
    // conditional aggregates
    "q268_threshold_sensitivity" -> {
      def row(t: Double) =
        s"""SELECT CAST($t AS DOUBLE) AS threshold,
           |  CAST((count(*) FILTER (jaccard >= $t)) // 2 AS BIGINT)
           |    AS n_pairs,
           |  count(DISTINCT d) FILTER (jaccard >= $t) AS n_docs,
           |  round(avg(jaccard) FILTER (jaccard >= $t), 6)
           |    AS mean_jaccard
           |FROM mel""".stripMargin
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |sh AS (SELECT doc_id, $duckShingles AS s FROM t),
         |exsh AS (SELECT DISTINCT doc_id, unnest(s) AS sv FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS n FROM exsh GROUP BY doc_id),
         |inter AS (
         |  SELECT ea.doc_id AS id_a, eb.doc_id AS id_b, count(*) AS i
         |  FROM exsh ea JOIN exsh eb ON eb.sv = ea.sv
         |    AND ea.doc_id < eb.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b,
         |    round(it.i / (sa.n + sb.n - it.i), 6) AS jaccard
         |  FROM inter it JOIN sizes sa ON sa.doc_id = it.id_a
         |  JOIN sizes sb ON sb.doc_id = it.id_b
         |  WHERE round(it.i / (sa.n + sb.n - it.i), 6) >= 0.5),
         |mel AS (SELECT jaccard, id_a AS d FROM pairs
         |  UNION ALL SELECT jaccard, id_b FROM pairs)
         |${row(0.5)}
         |UNION ALL ${row(0.7)}
         |UNION ALL ${row(0.9)}""".stripMargin
    },



    // Bloom-FPR replay: the salted md5 double hash per key, the
    // distinct set-position frame, any-position-missing probe test,
    // and both theory lines with the same expression shapes
    "q269_bloom_fpr" -> {
      def h(expr: String) = PortableSql.minhashBase(expr, DD)
      val h1 = s"${h("CAST(key AS VARCHAR)")} % 4096"
      val h2 = s"${h("concat(CAST(key AS VARCHAR), ':bloom2')")} % 4096"
      s"""WITH ik AS (SELECT DISTINCT c_custkey AS key FROM customer),
         |ipos AS (SELECT DISTINCT p FROM (
         |  SELECT unnest(list_transform(generate_series(0, 2),
         |    __j -> (($h1) + __j * ($h2)) % 4096)) AS p
         |  FROM ik)),
         |pk AS (SELECT DISTINCT c_custkey + 1000000 AS key FROM customer),
         |pp AS (SELECT key, unnest(list_transform(generate_series(0, 2),
         |    __j -> (($h1) + __j * ($h2)) % 4096)) AS p
         |  FROM pk),
         |miss AS (SELECT count(DISTINCT key) AS nm FROM pp
         |  WHERE p NOT IN (SELECT p FROM ipos)),
         |meta AS (SELECT (SELECT count(*) FROM ik) AS n_inserted,
         |    (SELECT count(*) FROM pk) AS n_probes,
         |    (SELECT count(*) FROM ipos) AS set_bits,
         |    (SELECT nm FROM miss) AS nm)
         |SELECT n_inserted, n_probes, 4096 AS m_bits, 3 AS k_hashes,
         |  set_bits, n_probes - nm AS n_false_hits,
         |  round(CAST(n_probes - nm AS DOUBLE) / n_probes, 6)
         |    AS fpr_measured,
         |  round(pow(CAST(set_bits AS DOUBLE) / 4096, 3), 6) AS fpr_fill,
         |  round(pow(CAST(1.0 AS DOUBLE) - exp(CAST(-3.0 AS DOUBLE)
         |    * n_inserted / 4096), 3), 6) AS fpr_theory
         |FROM meta""".stripMargin
    },



    // linkage-cluster replay: q257's match pairs + the recursive
    // min-label closure, canonical = cluster minimum
    "q270_linkage_clusters" -> {
      val (wnA, wnD) = (math.log(0.95 / 0.002), math.log(0.05 / 0.998))
      val (wbA, wbD) = (math.log(0.9 / 0.05), math.log(0.1 / 0.95))
      val (wkA, wkD) = (math.log(0.95 / 0.04), math.log(0.05 / 0.96))
      s"""WITH RECURSIVE dirty AS (SELECT c_custkey + 100000 AS k,
         |    ' ' || upper(c_name) || '  ' AS name, c_nationkey AS nk,
         |    c_acctbal + 0.5 AS bal, c_mktsegment AS seg
         |  FROM customer WHERE c_custkey % 20 = 0),
         |pp AS (SELECT d.k AS id_a, c.c_custkey AS id_b,
         |    coalesce(lower(trim(d.name)) = lower(trim(c.c_name)), false)
         |      AS agree_name,
         |    coalesce(abs(d.bal - c.c_acctbal) <= 1.0, false) AS agree_bal,
         |    coalesce(d.nk = c.c_nationkey, false) AS agree_nation
         |  FROM dirty d JOIN customer c ON c.c_mktsegment = d.seg),
         |sc AS (SELECT id_a, id_b,
         |    round((CASE WHEN agree_name THEN CAST($wnA AS DOUBLE)
         |        ELSE CAST($wnD AS DOUBLE) END)
         |      + (CASE WHEN agree_bal THEN CAST($wbA AS DOUBLE)
         |        ELSE CAST($wbD AS DOUBLE) END)
         |      + (CASE WHEN agree_nation THEN CAST($wkA AS DOUBLE)
         |        ELSE CAST($wkD AS DOUBLE) END), 6) AS score
         |  FROM pp),
         |m AS (SELECT id_a, id_b FROM sc WHERE score >= 5.0),
         |${closureCtesOver("m")}
         |SELECT doc_id AS id, cluster_id,
         |  cluster_id = doc_id AS is_canonical
         |FROM labels""".stripMargin
    },



    // index-health replay: per-token df/tf from the text directly,
    // totals, top-10 by df with the token tie-break
    "q275_index_health" ->
      s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |pt AS (SELECT token, count(DISTINCT doc_id) AS df,
         |    count(*) AS tf_sum FROM tok GROUP BY token),
         |t AS (SELECT count(*) AS n_tokens,
         |    CAST(sum(df) AS BIGINT) AS n_postings,
         |    CAST(sum(tf_sum) AS BIGINT) AS ttf FROM pt)
         |SELECT token, df, CAST(tf_sum AS BIGINT) AS tf_sum,
         |  round(CAST(df AS DOUBLE) / n_postings, 6) AS df_share,
         |  round(CAST(tf_sum AS DOUBLE) / ttf, 6) AS tf_share,
         |  n_tokens, n_postings
         |FROM pt, t
         |ORDER BY df DESC, token ASC LIMIT 10""".stripMargin,



    "q47_dedup_decisions" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |$closureCtes
         |SELECT d.doc_id,
         |  coalesce(l.cluster_id, d.doc_id) AS cluster_id,
         |  coalesce(l.cluster_id, d.doc_id) = d.doc_id AS keep
         |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id""".stripMargin,



    // soft-dedup replay: the q47 closure chain plus a cluster-size
    // rollup; weight = 1/|cluster|, singletons weigh 1
    "q176_soft_dedup" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |$closureCtes,
         |clsizes AS (SELECT cluster_id, count(*) AS csize
         |            FROM labels GROUP BY cluster_id)
         |SELECT d.doc_id,
         |  coalesce(l.cluster_id, d.doc_id) AS cluster_id,
         |  round(CAST(1 AS DOUBLE) / coalesce(sz.csize, 1), 6) AS weight
         |FROM documents d
         |LEFT JOIN labels l ON d.doc_id = l.doc_id
         |LEFT JOIN clsizes sz ON l.cluster_id = sz.cluster_id""".stripMargin
  )

  /** q16's LSH-replay oracle — shared verbatim with q40, the xx64
    * production-kernel twin (verification is hash-free exact
    * intersection; kernel recall equality spec-pinned + gate-checked). */
  private lazy val neardupPairsOracle: String =
    s"""WITH $jaccardCtes
       |SELECT id_a, id_b, jaccard FROM vpairs""".stripMargin

  /** q88's EXACTNESS oracle — all pairs with Jaccard ≥ 0.8, computed
    * with no prefix/LSH/kernel mechanics at all, so any miss in either
    * kernel's prefix path surfaces as a row-count/hash mismatch.
    * Shared verbatim with q94 (provably kernel-independent result). */
  private lazy val exactJaccardOracle: String =
    s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |sh AS (SELECT doc_id, $duckShingles AS s FROM t),
       |exsh AS (SELECT DISTINCT doc_id, unnest(s) AS sv FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM exsh GROUP BY doc_id),
       |inter AS (
       |  SELECT ea.doc_id AS id_a, eb.doc_id AS id_b, count(*) AS i
       |  FROM exsh ea JOIN exsh eb ON eb.sv = ea.sv AND ea.doc_id < eb.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, round(it.i / (sa.n + sb.n - it.i), 6) AS jaccard
       |FROM inter it JOIN sizes sa ON sa.doc_id = it.id_a
       |JOIN sizes sb ON sb.doc_id = it.id_b
       |WHERE round(it.i / (sa.n + sb.n - it.i), 6) >= 0.8""".stripMargin
}
