package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/** text slice of the [[SparkEntry]] registry — corpus text analysis:
  * quality/lang/token signals, Gopher/C4 gates, packing, quotas,
  * mixtures, shards, DSIR (subword tokenizers and statistical LMs
  * live in [[EntryTokenize]]).
  * Split by family for maintainability; entries and oracles are
  * verbatim registry content (no behavior change). */
private[graft] trait EntryText extends EntryContext {

  protected def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- north-star text: token counting
    "q11_token_count" -> ((s, dir) =>
      T(s, dir, "documents").selectExpr(
        "doc_id",
        s"${PortableSql.tokenCount("text", SD)} AS n_tokens",
        s"${PortableSql.regexTokenCount("text", SD)} AS n_rtokens")),




    // ---- north-star text: language ID
    "q12_lang_id" -> ((s, dir) =>
      T(s, dir, "documents").selectExpr(
        "doc_id", "lang",
        s"${PortableSql.langId("text", SD)} AS lang_pred")),




    // ---- north-star text: quality scoring
    "q13_quality_score" -> ((s, dir) =>
      T(s, dir, "documents").selectExpr(
        "doc_id",
        s"${PortableSql.qualityScore("text", SD)} AS quality")),




    // ---- composite corpus clean: fingerprint exact-dedup (min-id
    //      keeper) → quality gate → language filter → per-source stats —
    //      the end-to-end training-data cleaning flow in one plan
    "q36_corpus_filter" -> ((s, dir) => {
      val enriched = T(s, dir, "documents").select(
        col("doc_id"), col("source"),
        graft.ops.TextOps.qualityScore(col("text")).as("quality"),
        graft.functions.GraftFunctions.langId(s, col("text")).as("lang_pred"),
        graft.ops.TextOps.fingerprint(col("text")).as("fp"))
      val keepers = enriched.groupBy("fp").agg(min("doc_id").as("doc_id"))
      enriched.join(keepers, Seq("doc_id"), "left_semi")
        .filter(col("quality") >= 0.4 && col("lang_pred") === "en")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          round(expr("cast(sum(cast(quality as decimal(18,6))) as double)")
            / count(lit(1)), 6).as("avg_quality"))
    }),




    // ---- corpus distribution stats: exact interpolated percentiles of
    //      doc token counts per language, one shuffle for all quantiles
    "q38_length_stats" -> ((s, dir) =>
      graft.ops.Stats.exactPercentiles(
        T(s, dir, "documents").selectExpr("lang", "size(split(text, ' ')) AS n_tokens"),
        groupCols = Seq("lang"), valueCol = "n_tokens",
        ps = Seq(0.5, 0.9, 0.99))),




    // ---- deterministic hash split: train/val/test fences that are a
    //      pure function of the key (reproducible across runs/engines)
    "q37_hash_split" -> ((s, dir) => {
      val splits = graft.ops.Sampling.hashSplit(
        T(s, dir, "documents"), "doc_id", Seq(0.8, 0.1, 0.1), salt = "v1")
      splits.zip(Seq("train", "val", "test"))
        .map { case (d, t) => d.select(lit(t).as("split"), col("doc_id")) }
        .reduce(_.unionByName(_))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"))
    }),




    // ---- north-star text: Gopher-style repetition filter signal
    "q43_repetition" -> ((s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"),
        // |shingles| = max(tokens − 2, 1) — arithmetic instead of
        // materializing the shingle array just to take its size. NULL
        // text must stay NULL (the oracle's len() over a NULL list):
        // greatest() SKIPS null arguments, so guard explicitly.
        when(col("text").isNull, lit(null).cast("long")).otherwise(
          greatest(graft.functions.GraftFunctions.tokenCount(s, col("text")) - 2,
            lit(1L))).as("n_grams"),
        round(graft.functions.GraftFunctions.dupShingleRatio(s, col("text"), 3), 6)
          .as("dup_ratio"))),




    // ---- north-star: one-pass column profiler (row/null/distinct
    //      counts + numeric min/max for every column from ONE scan).
    "q58_profile" -> ((s, dir) =>
      graft.ops.Stats.profile(
        T(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_orderkey"))),




    // ---- north-star: GPT-style concat-and-chunk sequence packing —
    //      ONE running-sum window per shard + a bounded explode maps
    //      every doc to the fixed-budget training sequences it fills.
    "q64_sequence_pack" -> ((s, dir) =>
      graft.ops.Packing.packSequences(
        T(s, dir, "documents"), "text", "lang", "doc_id", budget = 512L)),




    // ---- north-star: per-source token quotas (data-mixing caps) —
    //      keep docs in deterministic order while the source's running
    //      token total is inside quota; boundary doc kept (truncate
    //      downstream).
    "q65_token_quota" -> ((s, dir) =>
      graft.ops.Packing.tokenQuota(
        T(s, dir, "documents"), "text", "lang", "doc_id", quota = 5000L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"))),




    // ---- north-star: boilerplate report — the top-20 most frequent
    //      4-token windows with doc/source spread; the audit a pipeline
    //      owner runs before configuring the scrub.
    "q114_boilerplate_report" -> ((s, dir) =>
      graft.ops.TextOps.boilerplateReport(
        T(s, dir, "documents"), "text", "doc_id", "source", n = 4, k = 20)),




    // ---- north-star: quality-signal pack (Gopher/C4-family fences) —
    //      type-token ratio, code-point Shannon entropy (codegen
    //      kernel), mean word length, digit/uppercase density. One
    //      scan-speed projection, zero shuffles.
    "q85_quality_signals" -> ((s, dir) =>
      graft.ops.TextOps.qualitySignals(T(s, dir, "documents"), "text", "doc_id")),




    // ---- north-star: curriculum difficulty bins — per-language exact
    //      quartiles of char entropy broadcast back as a scan-speed
    //      CASE (curriculum schedules read the bin column; nothing
    //      globally sorts the corpus).
    "q86_curriculum_bins" -> ((s, dir) =>
      graft.ops.Sampling.curriculumBins(
        T(s, dir, "documents"), "lang", "doc_id",
        graft.functions.GraftFunctions.charEntropy(s, col("text")), nBins = 4)),




    // ---- north-star: shard manifest / dataset card — per-shard doc
    //      and token counts + source composition over q81's balanced
    //      export; |shards| rows a consumer reads instead of scanning
    //      the export.
    "q87_shard_manifest" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.Packing.shardManifest(
        graft.ops.Packing.exportShards(docs, "text", "doc_id", targetTokens = 2048L),
        docs, "doc_id", "source")
    }),




    // ---- north-star: temperature mixture weights (UniMax shape) —
    //      per-source token counts → α-scaled sampling weights + keep
    //      fractions for a target-size mixture; |strata| rows out.
    "q67_mixture_weights" -> ((s, dir) =>
      graft.ops.Sampling.mixtureWeights(
        T(s, dir, "documents"), "lang",
        graft.functions.GraftFunctions.tokenCount(s, col("text")),
        alpha = 0.5, targetUnits = 50000L)),




    // ---- north-star: feature hashing (hashing-trick term
    //      frequencies) — vocabulary-free fixed-width text features,
    //      sparse row form, one shuffle with map-side partial counts.
    "q66_feature_hash" -> ((s, dir) =>
      graft.ops.TextOps.hashedTermFrequencies(
        T(s, dir, "documents"), "text", "doc_id", dims = 64)),




    // ---- north-star: DSIR importance weights — every raw doc scored
    //      by ln p̂_target − ln p̂_raw over hashed unigram+bigram
    //      features (target = the English slice); two dims-bounded
    //      model aggregations + one broadcast lookup join.
    "q79_dsir_weights" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.LanguageModel.importanceWeights(
        docs, docs.filter(col("lang") === "en"), "text", "doc_id", dims = 128)
    }),




    // ---- north-star: token-balanced shard export — seeded
    //      deterministic global shuffle + contiguous token-budget
    //      shards via a distributed prefix sum (256 salt groups;
    //      constant-size offset state, no corpus-wide window).
    "q81_balanced_shards" -> ((s, dir) =>
      graft.ops.Packing.exportShards(
        T(s, dir, "documents"), "text", "doc_id", targetTokens = 2048L)),




    // ---- north-star: RAG-style document chunking — overlapping
    //      fixed-width token windows (the pre-embedding split for
    //      retrieval corpora); pure narrow explode, scan-speed.
    "q117_chunk_docs" -> ((s, dir) =>
      graft.ops.TextOps.chunkDocuments(
        T(s, dir, "documents"), "text", "doc_id",
        chunkTokens = 32, overlap = 8)),




    // ---- north-star: encoding-health report — Unicode NFC
    //      normalization via the `graft_nfc` codegen kernel (Spark's
    //      function library has NO normalizer; mixed composed/
    //      decomposed forms break exact dedup, fingerprints, and BPE
    //      vocab unification) + mojibake signals (U+FFFD replacement
    //      chars). The fixture corpus is clean ASCII, so decomposed
    //      sequences and replacement chars are seeded deterministically
    //      in-query (the q44 pattern) — the oracle then checks REAL
    //      normalization semantics, not an identity pass.
    "q128_unicode_clean" -> ((s, dir) => {
      val seeded = when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" cafe\u0301 re\u0301sume\u0301")))
        .when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" \uFFFD\uFFFDbroken")))
        .otherwise(col("text"))
      val t = col("t")
      val nt = graft.functions.GraftFunctions.nfc(s, t)
      T(s, dir, "documents")
        .select(col("lang"), seeded.as("t"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(t =!= nt, 1L).otherwise(0L)).as("n_non_nfc"),
          sum((length(t) - length(nt)).cast("long")).as("chars_saved"),
          sum((length(t) - length(replace(t, lit("\uFFFD"), lit(""))))
            .cast("long")).as("repl_chars"))
    }),




    // ---- north-star: token-budget selection — keep the best-quality
    //      docs until a global token budget, WITHOUT a global sort:
    //      quality bins → per-bin token mass (≤100 driver rows) →
    //      threshold bin found driver-side → stateless keep/drop
    //      filters everywhere except the ONE threshold bin, whose
    //      ~corpus/100 rows spend the remainder via a running-sum
    //      window in id order. The "data selection under budget" op
    //      every pretraining run starts with.
    "q132_token_budget" -> ((s, dir) => {
      val scored = T(s, dir, "documents").select(
        col("doc_id"), col("source"),
        graft.ops.TextOps.qualityScore(col("text")).as("q"),
        graft.functions.GraftFunctions.tokenCount(s, col("text")).as("tok"))
      graft.ops.Sampling.tokenBudgetSelect(
          scored, "doc_id", "q", "tok", budget = 12000L, bins = 100)
        .filter(col("keep"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("tok").cast("long").as("n_tokens"),
          min("q").as("min_q"))
    }),




    // ---- north-star: per-source quality calibration — exact p50/p90
    //      quality per source, the threshold table a mixing pipeline
    //      consumes (a global quality fence over uncalibrated
    //      per-domain score distributions systematically starves whole
    //      domains; thresholds must be set per source).
    "q134_quality_calibration" -> ((s, dir) =>
      graft.ops.Stats.exactPercentiles(
        T(s, dir, "documents").select(col("source"),
          graft.ops.TextOps.qualityScore(col("text")).as("q")),
        groupCols = Seq("source"), valueCol = "q",
        ps = Seq(0.5, 0.9))),




    // ---- capstone: multilingual corpus gate — ONE scan evaluates
    //      lang-ID and the script profile side by side, then three
    //      integer drop rules in precedence order: mixed-script,
    //      lang-unsupported (identifier says 'und' but letters are
    //      present — the CCNet keep-only-supported-languages
    //      discipline), digit-heavy (5·digits > chars). Fixture
    //      extends q184's with forced digit-run docs.
    "q189_multilingual_gate" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      val scripted = concat(
        when(id % 7 =!= 0 && id % 3 === 0, lit("")).otherwise(col("text")),
        when(id % 7 === 1, lit(" Привет мир 2024"))
          .when(id % 7 === 2, lit(" Ελληνικά κείμενο"))
          .when(id % 7 === 3, lit(" مرحبا بالعالم"))
          .when(id % 7 === 4, lit(" שלום עולם"))
          .when(id % 7 === 5, lit(" नमस्ते दुनिया"))
          .when(id % 7 === 6, lit(" 你好世界 ありがとう 한국어"))
          .otherwise(lit("")),
        when(id % 23 === 0, lit(
          " 0123456789012345678901234567890123456789012345678" +
            " 0123456789012345678901234567890123456789012345678" +
            " 0123456789012345678901234567890123456789012345678"))
          .otherwise(lit("")))
      val prof = docs
        .select(id.as("doc_id"),
          graft.functions.GraftFunctions.langId(s, scripted).as("lang_pred"),
          graft.functions.GraftFunctions.scriptProfile(s, scripted).as("p"))
        .select(col("doc_id"), col("lang_pred"), col("p.*"))
      val letters = Seq("n_latin", "n_cyrillic", "n_greek", "n_arabic",
        "n_hebrew", "n_devanagari", "n_cjk")
      val nScripts = letters.map(c =>
        when(col(c) > 0, 1L).otherwise(0L)).reduce(_ + _)
      val nLetters = letters.map(col).reduce(_ + _)
      prof
        .withColumn("reason",
          when(nScripts >= 2, "mixed_script")
            .when(col("lang_pred") === "und" && nLetters > 0,
              "lang_unsupported")
            .when(lit(5) * col("n_digit") > col("n_chars"), "digit_heavy")
            .otherwise("kept"))
        .groupBy("reason")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang_pred")).as("n_langs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"))
    }),




    // ---- north-star: the Gopher structural gate (Rae et al. 2021) —
    //      word-shape bounds, symbol density, alpha-word floor, and
    //      the stopword prose test, compiled through the SAME dual-
    //      dialect DSL as q62 (one filter definition is both the Spark
    //      expression and the oracle SQL); per-doc verdict + first
    //      failing rule, scan-speed, zero shuffles.
    "q194_gopher_gate" -> ((s, dir) =>
      graft.ops.CorpusFilters.decide(
        T(s, dir, "documents"), "text", "doc_id",
        graft.ops.CorpusFilters.gopherRules(minTokens = 30L, minStopwords = 1))),




    // ---- north-star: UniMax language-budget allocation (Chung et
    //      al. 2023) — water-filling a token budget across languages
    //      under a per-language epoch ceiling: at this budget every
    //      tail language caps at 4 epochs and the head (en) absorbs
    //      exactly the remainder — the anti-rich-get-richer mixture
    //      temperature sampling cannot express.
    "q210_unimax" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      graft.ops.Sampling.unimaxAllocation(docs, "lang",
        graft.ops.TextOps.tokenCount(col("text")).cast("long"),
        budget = 80000L, epochCap = 4.0)
    }),




    // ---- north-star: Zipf-law head fit — least-squares slope of
    //      ln(freq) on ln(rank) over the top-100 types (the head is
    //      where the law holds AND what keeps ranking a TakeOrdered
    //      top-k instead of a vocabulary sort); the corpus-shape
    //      sibling of q200's Heaps curve.
    "q212_zipf_fit" -> ((s, dir) =>
      graft.ops.TextOps.zipfFit(
        T(s, dir, "documents"), "text", headSize = 100)),




    // ---- north-star: PMI collocations (Church & Hanks 1990) — word
    //      pairs co-occurring far above chance over the bigram TYPE
    //      table; minCount fences the singleton-pair pathology AND the
    //      vocab² tail. The multiword-expression miner.
    "q214_pmi" -> ((s, dir) =>
      graft.ops.LanguageModel.pmiCollocations(
        T(s, dir, "documents"), "text", minCount = 3L, topK = 20)),




    // ---- north-star: empirical-Bayes source quality — per-source
    //      good-doc rates shrunk toward the corpus rate with 20
    //      pseudo-observations; the curation ranking raw rates get
    //      wrong for barely-sampled sources.
    "q215_source_quality" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.Quality.shrunkSourceQuality(docs, "source",
        graft.ops.TextOps.qualityScore(col("text")) >= 0.5,
        priorStrength = 20.0)
    }),




    // ---- north-star: quality-canonical cluster keepers — the q39
    //      clusters re-decided by HIGHEST QUALITY member (tie: min id)
    //      instead of min id: one decomposable max(struct) per
    //      cluster, no corpus window. Reads the SAME shared pair
    //      index as q16/q39/q47.
    "q220_quality_canonical" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val labels = Dedup.components(
        verifiedPairs(s, dir).select("id_a", "id_b"))
      Dedup.qualityCanonical(docs, "doc_id", labels,
        graft.ops.TextOps.qualityScore(col("text")))
    }),




    // ---- north-star: language confusability matrix — pairwise
    //      cosine of per-language char-trigram profiles (Cavnar &
    //      Trenkle 1994): the lang pairs a lang-ID gate confuses;
    //      integer dot products over ONE trigram-keyed join.
    "q225_lang_confusability" -> ((s, dir) =>
      graft.ops.TextOps.langConfusability(
        T(s, dir, "documents"), "text", "lang")),


    // ---- 100 TB twin of q38: one bounded GK sketch per group instead
    //      of a full per-group rank sort. Oracle: at the gate SF every
    //      group holds ≤ accuracy (10k) rows, so the GK summary is
    //      UNCOMPRESSED and query(p) is the exact order statistic at
    //      rank ⌈p·n⌉ (verified cell-for-cell across all 15
    //      group×fraction cells) — the oracle replays that rank pick
    //      directly; the compressed-regime rank-error bound stays
    //      StatsSpec-pinned against exactPercentiles.
    "q42_length_stats_approx" -> ((s, dir) =>
      graft.ops.Stats.approxPercentiles(
        T(s, dir, "documents").selectExpr("lang", "size(split(text, ' ')) AS n_tokens"),
        groupCols = Seq("lang"), valueCol = "n_tokens",
        ps = Seq(0.5, 0.9, 0.99)))
  )

  protected def textOracles: Map[String, String] = Map(

    // GK exact-regime replay (groups ≤ accuracy → the sketch stores
    // every sample and query(p) = the order statistic at rank ⌈p·n⌉,
    // computed in the same IEEE double arithmetic both engines)
    "q42_length_stats_approx" ->
      """WITH v AS (SELECT lang,
        |        CAST(len(string_split(text, ' ')) AS DOUBLE) AS v
        |      FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT lang, v,
        |        row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY lang) AS n FROM v)
        |SELECT lang,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN v END) AS p90,
        |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN v END) AS p99,
        |  CAST(max(n) AS BIGINT) AS n_rows
        |FROM r GROUP BY lang""".stripMargin,

    "q11_token_count" ->
      s"""SELECT doc_id, ${PortableSql.tokenCount("text", DD)} AS n_tokens,
         |  ${PortableSql.regexTokenCount("text", DD)} AS n_rtokens
         |FROM documents""".stripMargin,




    "q12_lang_id" ->
      s"SELECT doc_id, lang, ${PortableSql.langId("text", DD)} AS lang_pred FROM documents",




    "q13_quality_score" ->
      s"SELECT doc_id, ${PortableSql.qualityScore("text", DD)} AS quality FROM documents",




    // Gopher-gate replay: generated from the SAME filter objects as
    // the Spark expression (single source of truth, the q62 pattern)
    "q194_gopher_gate" ->
      graft.ops.CorpusFilters.oracleSql(
        graft.ops.CorpusFilters.gopherRules(minTokens = 30L, minStopwords = 1),
        "documents", "text", "doc_id"),




    "q36_corpus_filter" ->
      s"""WITH q AS (
         |  SELECT doc_id, source, ${PortableSql.qualityScore("text", DD)} AS quality,
         |    ${PortableSql.langId("text", DD)} AS lang_pred, md5(lower(trim(text))) AS fp
         |  FROM documents
         |),
         |k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY fp),
         |f AS (SELECT q.* FROM q JOIN k USING (doc_id)
         |      WHERE quality >= 0.4 AND lang_pred = 'en')
         |SELECT source, count(*) AS n_docs,
         |  round(cast(sum(cast(quality as decimal(18,6))) as double) / count(*), 6) AS avg_quality
         |FROM f GROUP BY source""".stripMargin,




    "q38_length_stats" -> {
      val pcols = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99").map { case (p, name) =>
        s"""round(
           |    max(CASE WHEN rn = CAST(floor((n - 1) * $p) AS BIGINT) + 1 THEN v END) +
           |    (max(CASE WHEN rn = CAST(ceil((n - 1) * $p) AS BIGINT) + 1 THEN v END) -
           |     max(CASE WHEN rn = CAST(floor((n - 1) * $p) AS BIGINT) + 1 THEN v END))
           |    * max((n - 1) * $p - floor((n - 1) * $p)), 6) AS $name""".stripMargin
      }.mkString(",\n  ")
      s"""WITH t AS (SELECT lang, CAST(len(string_split(text, ' ')) AS DOUBLE) AS v FROM documents),
         |r AS (SELECT lang, v,
         |    row_number() OVER (PARTITION BY lang ORDER BY v ASC) AS rn,
         |    CAST(count(*) OVER (PARTITION BY lang) AS DOUBLE) AS n
         |  FROM t)
         |SELECT lang,
         |  $pcols,
         |  CAST(max(n) AS BIGINT) AS n_rows
         |FROM r GROUP BY lang""".stripMargin
    },




    "q37_hash_split" -> {
      // interpolate the EXACT cumulative doubles Spark's scanLeft
      // produces (0.8 + 0.1 != 0.9 in binary) so both engines compare p
      // against bit-identical thresholds
      val cum = Seq(0.8, 0.1, 0.1).scanLeft(0.0)(_ + _)
      val h = PortableSql.minhashBase("concat('v1', ':', CAST(doc_id AS VARCHAR))", DD)
      s"""WITH h AS (SELECT doc_id,
         |    CAST($h AS DOUBLE) / 1152921504606846976.0 AS p FROM documents),
         |t AS (SELECT doc_id,
         |    CASE WHEN p < ${cum(1)} THEN 'train'
         |         WHEN p < ${cum(2)} THEN 'val' ELSE 'test' END AS split
         |  FROM h)
         |SELECT split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM t GROUP BY split""".stripMargin
    },




    "q43_repetition" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |sh AS (SELECT doc_id, $duckShingles AS s FROM t)
         |SELECT doc_id, len(s) AS n_grams,
         |  round(1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / CAST(len(s) AS DOUBLE), 6) AS dup_ratio
         |FROM sh""".stripMargin,




    "q85_quality_signals" ->
      // ttr replays the kernel's exact double ops (1 − (1 − d/t));
      // entropy over code points — DuckDB string_split('') code-point
      // semantics match the kernel's codePointAt walk
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
         |c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
         |f AS (SELECT doc_id, ch, count(*) AS n FROM c GROUP BY doc_id, ch),
         |tt AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS t FROM f GROUP BY doc_id),
         |ent AS (SELECT f.doc_id,
         |    round(-sum((CAST(n AS DOUBLE) / t) * ln(CAST(n AS DOUBLE) / t)), 6) AS char_entropy
         |  FROM f JOIN tt USING (doc_id) GROUP BY f.doc_id)
         |SELECT t.doc_id,
         |  round(1.0 - (1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)), 6) AS ttr,
         |  ent.char_entropy,
         |  round((CAST(length(text) AS DOUBLE) - (CAST(len(toks) AS DOUBLE) - 1.0))
         |    / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
         |  round((CAST(length(text) AS DOUBLE) - length(regexp_replace(text, '[0-9]', '', 'g')))
         |    / CAST(length(text) AS DOUBLE), 6) AS digit_ratio,
         |  round((CAST(length(text) AS DOUBLE) - length(regexp_replace(text, '[A-Z]', '', 'g')))
         |    / CAST(length(text) AS DOUBLE), 6) AS upper_ratio
         |FROM t JOIN ent USING (doc_id)""".stripMargin,




    "q86_curriculum_bins" -> {
      // q38's rank-interpolation percentile replay at 0.25/0.5/0.75,
      // then the same ≤-boundary CASE sum the Spark projection uses
      val pcols = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75").map { case (p, name) =>
        s"""round(
           |    max(CASE WHEN rn = CAST(floor((n - 1) * $p) AS BIGINT) + 1 THEN metric END) +
           |    (max(CASE WHEN rn = CAST(ceil((n - 1) * $p) AS BIGINT) + 1 THEN metric END) -
           |     max(CASE WHEN rn = CAST(floor((n - 1) * $p) AS BIGINT) + 1 THEN metric END))
           |    * max((n - 1) * $p - floor((n - 1) * $p)), 6) AS $name""".stripMargin
      }.mkString(",\n  ")
      s"""WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
         |f AS (SELECT doc_id, ch, count(*) AS n FROM c GROUP BY doc_id, ch),
         |tt AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS t FROM f GROUP BY doc_id),
         |m AS (SELECT d.lang, f.doc_id,
         |    round(-sum((CAST(n AS DOUBLE) / t) * ln(CAST(n AS DOUBLE) / t)), 6) AS metric
         |  FROM f JOIN tt USING (doc_id) JOIN documents d ON d.doc_id = f.doc_id
         |  GROUP BY d.lang, f.doc_id),
         |r AS (SELECT lang, metric,
         |    row_number() OVER (PARTITION BY lang ORDER BY metric ASC) AS rn,
         |    CAST(count(*) OVER (PARTITION BY lang) AS DOUBLE) AS n
         |  FROM m),
         |b AS (SELECT lang,
         |  $pcols
         |FROM r GROUP BY lang)
         |SELECT m.lang, m.doc_id, m.metric,
         |  CAST(CASE WHEN m.metric <= b.p25 THEN 0 ELSE 1 END +
         |       CASE WHEN m.metric <= b.p50 THEN 0 ELSE 1 END +
         |       CASE WHEN m.metric <= b.p75 THEN 0 ELSE 1 END AS BIGINT) AS bin
         |FROM m JOIN b USING (lang)""".stripMargin
    },




    "q87_shard_manifest" -> {
      // q81's salted prefix-sum shard assignment + per-shard rollup;
      // modal source with ties → lexicographically first
      val n = PortableSql.tokenCount("text", DD)
      s"""WITH h AS (SELECT doc_id,
         |    md5(concat('shards', ':', CAST(doc_id AS VARCHAR))) AS k,
         |    CAST($n AS BIGINT) AS n FROM documents),
         |p AS (SELECT doc_id, n,
         |    CAST(sum(n) OVER (ORDER BY k, doc_id) - n AS BIGINT) AS s FROM h),
         |a AS (SELECT p.doc_id, p.n, CAST(s // 2048 AS BIGINT) AS shard_idx, d.source
         |      FROM p JOIN documents d USING (doc_id)),
         |g AS (SELECT shard_idx, source, count(*) AS c, sum(n) AS t
         |      FROM a GROUP BY shard_idx, source),
         |r AS (SELECT shard_idx, source,
         |    row_number() OVER (PARTITION BY shard_idx ORDER BY c DESC, source ASC) AS rn
         |  FROM g)
         |SELECT g.shard_idx,
         |  CAST(sum(g.c) AS BIGINT) AS n_docs,
         |  CAST(sum(g.t) AS BIGINT) AS n_tokens,
         |  count(*) AS n_attrs,
         |  max(r.source) AS top_attr
         |FROM g JOIN r ON r.shard_idx = g.shard_idx AND r.rn = 1
         |GROUP BY g.shard_idx""".stripMargin
    },




    "q79_dsir_weights" -> {
      // hashed unigram+bigram features; smoothed per-bucket log-ratio
      // summed per gram INSTANCE — the same association the Spark side
      // uses (lookup per gram, sum per doc)
      val base = PortableSql.minhashBase("gram", DD)
      val sh2 = DD.shingles("l", 2)
      s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
         |g AS (SELECT doc_id, lang, unnest(list_concat(l, $sh2)) AS gram FROM d),
         |b AS (SELECT doc_id, lang,
         |  ($base % ${PortableSql.minhashP}) % 128 AS bucket FROM g),
         |t AS (SELECT bucket, count(*) AS tc FROM b WHERE lang = 'en' GROUP BY bucket),
         |r AS (SELECT bucket, count(*) AS rc FROM b GROUP BY bucket),
         |s AS (SELECT (SELECT CAST(sum(tc) AS DOUBLE) FROM t) AS tn,
         |             (SELECT CAST(sum(rc) AS DOUBLE) FROM r) AS rn)
         |SELECT b.doc_id,
         |  round(sum(ln(CAST(coalesce(t.tc, 0) + 1 AS DOUBLE) / (s.tn + 128.0)) -
         |            ln(CAST(r.rc + 1 AS DOUBLE) / (s.rn + 128.0))), 6) AS logratio
         |FROM b LEFT JOIN t USING (bucket) JOIN r USING (bucket), s
         |GROUP BY b.doc_id""".stripMargin
    },




    "q81_balanced_shards" -> {
      // ONE global running sum in the oracle — equals Spark's salted
      // prefix-sum decomposition because the salt is a key prefix
      val n = PortableSql.tokenCount("text", DD)
      s"""WITH h AS (SELECT doc_id,
         |    md5(concat('shards', ':', CAST(doc_id AS VARCHAR))) AS k,
         |    CAST($n AS BIGINT) AS n FROM documents),
         |p AS (SELECT doc_id, n,
         |    CAST(sum(n) OVER (ORDER BY k, doc_id) - n AS BIGINT) AS s FROM h)
         |SELECT doc_id, n AS n_toks, s AS tok_start,
         |  CAST(s // 2048 AS BIGINT) AS shard_idx
         |FROM p""".stripMargin
    },




    "q67_mixture_weights" -> {
      val n = PortableSql.tokenCount("text", DD)
      s"""WITH c AS (SELECT lang, CAST(sum($n) AS BIGINT) AS n_units
         |           FROM documents GROUP BY lang),
         |z AS (SELECT sum(pow(n_units, 0.5)) AS z FROM c)
         |SELECT lang, n_units,
         |  round(pow(n_units, 0.5) / z, 6) AS weight,
         |  round(least(1.0, 50000 * (pow(n_units, 0.5) / z) / n_units), 6) AS keep_fraction
         |FROM c, z""".stripMargin
    },




    "q66_feature_hash" -> {
      val base = PortableSql.minhashBase("tok", DD)
      s"""WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |SELECT doc_id, ($base % ${PortableSql.minhashP}) % 64 AS feature_idx,
         |  count(*) AS tf
         |FROM e GROUP BY doc_id, feature_idx""".stripMargin
    },




    "q64_sequence_pack" -> {
      val n = PortableSql.tokenCount("text", DD)
      s"""WITH t AS (SELECT doc_id, lang, CAST($n AS BIGINT) AS n FROM documents),
         |p AS (SELECT doc_id, lang, n,
         |        sum(n) OVER (PARTITION BY lang ORDER BY doc_id) AS e
         |      FROM t WHERE n > 0),
         |x AS (SELECT doc_id, lang, e - n AS s, e FROM p),
         |u AS (SELECT doc_id, lang, s, e,
         |        unnest(generate_series(CAST(s // 512 AS BIGINT),
         |                               CAST((e - 1) // 512 AS BIGINT))) AS seq_idx
         |      FROM x)
         |SELECT doc_id, lang, seq_idx,
         |  CAST(least(e, (seq_idx + 1) * 512) - greatest(s, seq_idx * 512) AS BIGINT) AS toks_in_seq
         |FROM u""".stripMargin
    },




    "q65_token_quota" -> {
      val n = PortableSql.tokenCount("text", DD)
      s"""WITH t AS (SELECT doc_id, lang, CAST($n AS BIGINT) AS n FROM documents),
         |p AS (SELECT doc_id, lang, n,
         |        sum(n) OVER (PARTITION BY lang ORDER BY doc_id) AS e
         |      FROM t WHERE n > 0)
         |SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM p WHERE e - n < 5000 GROUP BY lang""".stripMargin
    },




    "q114_boilerplate_report" ->
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS l FROM documents),
         |w AS (SELECT doc_id, source, unnest(${DD.shingles("l", 4)}) AS "window" FROM t),
         |c AS (SELECT "window", count(*) AS n_occurrences,
         |        count(DISTINCT doc_id) AS n_docs,
         |        count(DISTINCT source) AS n_sources
         |      FROM w GROUP BY "window")
         |SELECT "window", n_occurrences, n_docs, n_sources
         |FROM c ORDER BY n_occurrences DESC, "window" ASC LIMIT 20""".stripMargin,




    // UniMax replay: per-lang exact-double capacities, ascending
    // exclusive prefix sums, theta = max water level, min-clamp
    "q210_unimax" ->
      s"""WITH pl AS (SELECT lang,
         |    CAST(sum(len(${DD.tokens("text")})) AS DOUBLE) AS n_tokens
         |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
         |  GROUP BY lang),
         |c AS (SELECT lang, n_tokens, n_tokens * 4.0 AS capacity FROM pl),
         |w AS (SELECT *,
         |    row_number() OVER (ORDER BY capacity ASC, lang ASC) AS i,
         |    coalesce(sum(capacity) OVER (ORDER BY capacity ASC, lang ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cum,
         |    count(*) OVER () AS n
         |  FROM c),
         |t AS (SELECT max((80000.0 - cum) / (n - i + 1)) AS theta FROM w)
         |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens, capacity,
         |  round(least(capacity, theta), 6) AS alloc_tokens,
         |  round(least(capacity, theta) / n_tokens, 6) AS sample_rate
         |FROM w, t""".stripMargin,




    // Zipf replay: head-100 frequency table, ln-ln least squares with
    // the same multiply-before-divide normal-equation arithmetic
    "q212_zipf_fit" ->
      s"""WITH tok AS (SELECT unnest(${DD.tokens("text")}) AS w
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
         |h AS (SELECT w, n FROM c ORDER BY n DESC, w ASC LIMIT 100),
         |xy AS (SELECT
         |    ln(CAST(row_number() OVER (ORDER BY n DESC, w ASC) AS DOUBLE))
         |      AS x,
         |    ln(CAST(n AS DOUBLE)) AS y
         |  FROM h),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS k,
         |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |    sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM xy)
         |SELECT CAST(k AS BIGINT) AS n_fit,
         |  round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
         |  round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k, 6)
         |    AS intercept,
         |  round(((k * sxy - sx * sy) * (k * sxy - sx * sy))
         |    / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 6) AS r2
         |FROM s""".stripMargin,




    // PMI replay: bigram type table, slot marginals, exact integer
    // ratio under one ln
    "q214_pmi" ->
      s"""WITH d AS (SELECT string_split(text, ' ') AS l FROM documents
         |           WHERE text IS NOT NULL),
         |m AS (SELECT l FROM d WHERE len(l) >= 2),
         |bg AS (SELECT unnest(${DD.shingles("l", 2)}) AS bgm FROM m),
         |bc AS (SELECT bgm, count(*) AS n_pair FROM bg GROUP BY bgm),
         |bt AS (SELECT bgm, n_pair, string_split(bgm, ' ')[1] AS w1,
         |         string_split(bgm, ' ')[-1] AS w2 FROM bc),
         |lft AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_left
         |        FROM bt GROUP BY w1),
         |rgt AS (SELECT w2, CAST(sum(n_pair) AS BIGINT) AS n_right
         |        FROM bt GROUP BY w2),
         |tt AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS t FROM bt)
         |SELECT bgm AS bigram, n_pair, n_left, n_right,
         |  round(ln(CAST(n_pair AS DOUBLE) * t /
         |    (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE))), 6) AS pmi
         |FROM bt JOIN lft USING (w1) JOIN rgt USING (w2), tt
         |WHERE n_pair >= 3
         |ORDER BY pmi DESC, bigram ASC LIMIT 20""".stripMargin,




    // shrinkage replay: integer per-source counts, 1-row global rate,
    // (k·mu + good)/(k + n)
    "q215_source_quality" ->
      s"""WITH s AS (SELECT source,
         |    CASE WHEN ${PortableSql.qualityScore("text", DD)} >= 0.5
         |         THEN 1 ELSE 0 END AS good
         |  FROM documents WHERE source IS NOT NULL),
         |per AS (SELECT source, count(*) AS n_docs,
         |          CAST(sum(good) AS BIGINT) AS n_good
         |        FROM s GROUP BY source),
         |g AS (SELECT CAST(sum(n_good) AS DOUBLE) / sum(n_docs) AS mu
         |      FROM per)
         |SELECT source, n_docs, n_good,
         |  round(CAST(n_good AS DOUBLE) / n_docs, 6) AS raw_rate,
         |  round((20.0 * mu + n_good) / (20.0 + n_docs), 6) AS shrunk_rate
         |FROM per, g""".stripMargin,




    // quality-canonical replay: the q39 closure labels + quality
    // argmax per cluster (qual desc, id asc)
    "q220_quality_canonical" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |$closureCtes,
         |qq AS (SELECT doc_id,
         |    ${PortableSql.qualityScore("text", DD)} AS qual
         |  FROM documents WHERE text IS NOT NULL),
         |lab AS (SELECT qq.doc_id, qq.qual,
         |    coalesce(l.cluster_id, qq.doc_id) AS cluster_id
         |  FROM qq LEFT JOIN labels l ON l.doc_id = qq.doc_id),
         |k AS (SELECT cluster_id, doc_id AS keeper_id,
         |    qual AS keeper_quality,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY qual DESC, doc_id ASC) AS rn
         |  FROM lab)
         |SELECT lab.doc_id, lab.cluster_id, k.keeper_id,
         |  k.keeper_quality, lab.doc_id = k.keeper_id AS is_keeper
         |FROM lab JOIN k ON k.cluster_id = lab.cluster_id AND k.rn = 1""".stripMargin,




    // confusability replay: trigram profiles, integer dots, one sqrt
    "q225_lang_confusability" ->
      """WITH tri AS (SELECT lang AS l,
        |    unnest(list_transform(generate_series(1,
        |      greatest(length(text) - 2, 0)),
        |      __i -> substr(text, CAST(__i AS INT), 3))) AS tg
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |prof AS (SELECT l, tg, count(*) AS c FROM tri GROUP BY l, tg),
        |norms AS (SELECT l, CAST(sum(c * c) AS BIGINT) AS n2
        |          FROM prof GROUP BY l),
        |dots AS (SELECT a.l AS lang_a, b.l AS lang_b,
        |    count(*) AS n_shared, CAST(sum(a.c * b.c) AS BIGINT) AS dot
        |  FROM prof a JOIN prof b ON a.tg = b.tg AND a.l < b.l
        |  GROUP BY 1, 2)
        |SELECT lang_a, lang_b, n_shared,
        |  round(dot / (sqrt(CAST(na.n2 AS DOUBLE))
        |    * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
        |FROM dots
        |JOIN norms na ON na.l = lang_a
        |JOIN norms nb ON nb.l = lang_b""".stripMargin,




    "q58_profile" -> {
      def block(c: String, num: Boolean) = {
        val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct, $mn AS min_val, $mx AS max_val
           |FROM lineitem""".stripMargin
      }
      Seq(
        block("l_quantity", num = true),
        block("l_extendedprice", num = true),
        block("l_returnflag", num = false),
        block("l_orderkey", num = true)).mkString("\nUNION ALL\n")
    },




    // chunking oracle: same start grid (0, stride, …, capped so a
    // window fully contained in its predecessor is dropped), same
    // inclusive list slice
    "q117_chunk_docs" -> {
      val (chunk, ov) = (32, 8)
      val stride = chunk - ov
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |s AS (SELECT doc_id, l,
         |        unnest(generate_series(0, greatest(len(l) - $ov - 1, 0), $stride)) AS st
         |      FROM t)
         |SELECT doc_id, CAST(st / $stride AS BIGINT) AS chunk_index,
         |  array_to_string(l[st + 1 : st + $chunk], ' ') AS chunk_text,
         |  CAST(least($chunk, len(l) - st) AS BIGINT) AS n_tokens
         |FROM s""".stripMargin
    },




    // encoding-health replay: the same deterministic seeding (chr(769)
    // = U+0301 combining acute, chr(65533) = U+FFFD), DuckDB's
    // utf8proc nfc_normalize against the kernel's java.text.Normalizer
    // — both count length in code points
    "q128_unicode_clean" ->
      """WITH seeded AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 7 = 0
        |           THEN text || ' cafe' || chr(769) || ' re' || chr(769)
        |                || 'sume' || chr(769)
        |         WHEN doc_id % 11 = 0
        |           THEN text || ' ' || chr(65533) || chr(65533) || 'broken'
        |         ELSE text END AS t
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN t <> nfc_normalize(t) THEN 1 ELSE 0 END) AS BIGINT) AS n_non_nfc,
        |  CAST(sum(length(t) - length(nfc_normalize(t))) AS BIGINT) AS chars_saved,
        |  CAST(sum(length(t) - length(replace(t, chr(65533), ''))) AS BIGINT) AS repl_chars
        |FROM seeded GROUP BY lang""".stripMargin,




    // gate replay: q184's regex-count chain over the extended fixture
    // + the portable lang-ID CASE + the same precedence rules
    "q189_multilingual_gate" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    (CASE WHEN doc_id % 7 <> 0 AND doc_id % 3 = 0 THEN ''
         |          ELSE text END) ||
         |    CASE WHEN doc_id % 7 = 1 THEN ' Привет мир 2024'
         |         WHEN doc_id % 7 = 2 THEN ' Ελληνικά κείμενο'
         |         WHEN doc_id % 7 = 3 THEN ' مرحبا بالعالم'
         |         WHEN doc_id % 7 = 4 THEN ' שלום עולם'
         |         WHEN doc_id % 7 = 5 THEN ' नमस्ते दुनिया'
         |         WHEN doc_id % 7 = 6 THEN ' 你好世界 ありがとう 한국어'
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 23 = 0 THEN
         |      ' 0123456789012345678901234567890123456789012345678' ||
         |      ' 0123456789012345678901234567890123456789012345678' ||
         |      ' 0123456789012345678901234567890123456789012345678'
         |      ELSE '' END AS tx
         |  FROM documents WHERE text IS NOT NULL),
         |p AS (
         |  SELECT doc_id, ${PortableSql.langId("tx", DD)} AS lang_pred,
         |    length(tx) AS n_chars,
         |    length(regexp_replace(tx, '[^A-Za-z\\x{00C0}-\\x{00D6}\\x{00D8}-\\x{00F6}\\x{00F8}-\\x{00FF}\\x{0100}-\\x{024F}]', '', 'g')) AS n_latin,
         |    length(regexp_replace(tx, '[^\\x{0400}-\\x{04FF}]', '', 'g')) AS n_cyrillic,
         |    length(regexp_replace(tx, '[^\\x{0370}-\\x{03FF}]', '', 'g')) AS n_greek,
         |    length(regexp_replace(tx, '[^\\x{0600}-\\x{06FF}]', '', 'g')) AS n_arabic,
         |    length(regexp_replace(tx, '[^\\x{0590}-\\x{05FF}]', '', 'g')) AS n_hebrew,
         |    length(regexp_replace(tx, '[^\\x{0900}-\\x{097F}]', '', 'g')) AS n_devanagari,
         |    length(regexp_replace(tx, '[^\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7A3}]', '', 'g')) AS n_cjk,
         |    length(regexp_replace(tx, '[^0-9]', '', 'g')) AS n_digit
         |  FROM t),
         |d AS (
         |  SELECT doc_id, lang_pred, n_chars,
         |    CASE
         |      WHEN (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END
         |        + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END
         |        + CASE WHEN n_greek > 0 THEN 1 ELSE 0 END
         |        + CASE WHEN n_arabic > 0 THEN 1 ELSE 0 END
         |        + CASE WHEN n_hebrew > 0 THEN 1 ELSE 0 END
         |        + CASE WHEN n_devanagari > 0 THEN 1 ELSE 0 END
         |        + CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END) >= 2
         |        THEN 'mixed_script'
         |      WHEN lang_pred = 'und' AND
         |        (n_latin + n_cyrillic + n_greek + n_arabic + n_hebrew
         |          + n_devanagari + n_cjk) > 0 THEN 'lang_unsupported'
         |      WHEN 5*n_digit > n_chars THEN 'digit_heavy'
         |      ELSE 'kept' END AS reason
         |  FROM p)
         |SELECT reason, count(*) AS n_docs,
         |  count(DISTINCT lang_pred) AS n_langs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM d GROUP BY 1""".stripMargin,




    // calibration replay: q38's exact interpolated-percentile scheme
    // over the per-source quality distribution
    "q134_quality_calibration" -> {
      val q = PortableSql.qualityScore("text", DD)
      val pcols = Seq(0.5 -> "p50", 0.9 -> "p90").map { case (p, name) =>
        s"""round(
           |    max(CASE WHEN rn = CAST(floor((n - 1) * $p) AS BIGINT) + 1 THEN v END) +
           |    (max(CASE WHEN rn = CAST(ceil((n - 1) * $p) AS BIGINT) + 1 THEN v END) -
           |     max(CASE WHEN rn = CAST(floor((n - 1) * $p) AS BIGINT) + 1 THEN v END))
           |    * max((n - 1) * $p - floor((n - 1) * $p)), 6) AS $name""".stripMargin
      }.mkString(",\n  ")
      s"""WITH qc_t AS (SELECT source, CAST($q AS DOUBLE) AS v
         |  FROM documents WHERE $q IS NOT NULL),
         |qc_r AS (SELECT source, v,
         |    row_number() OVER (PARTITION BY source ORDER BY v ASC) AS rn,
         |    CAST(count(*) OVER (PARTITION BY source) AS DOUBLE) AS n
         |  FROM qc_t)
         |SELECT source,
         |  $pcols,
         |  CAST(max(n) AS BIGINT) AS n_rows
         |FROM qc_r GROUP BY source""".stripMargin
    },




    // token-budget replay: identical two-stage arithmetic — per-bin
    // token mass, window cum-mass from the top bin down (`above` =
    // strictly-higher bins), full bins where above+btok <= B, the one
    // threshold bin spends B-above in doc_id order; all integer math
    "q132_token_budget" -> {
      val budget = 12000L
      val q = PortableSql.qualityScore("text", DD)
      val tok = PortableSql.tokenCount("text", DD)
      s"""WITH tb_d AS (
         |  SELECT doc_id, source, CAST($tok AS BIGINT) AS tok,
         |    CAST(least(greatest(floor($q * 100), 0), 99) AS INT) AS b
         |  FROM documents WHERE $q IS NOT NULL),
         |tb_bs AS (SELECT b, sum(tok) AS btok FROM tb_d GROUP BY b),
         |tb_a AS (SELECT b, btok,
         |    coalesce(sum(btok) OVER (ORDER BY b DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
         |  FROM tb_bs),
         |tb_sel AS (
         |  SELECT d.doc_id, d.source, d.tok, d.b, a.above, a.btok,
         |    sum(d.tok) OVER (PARTITION BY d.b ORDER BY d.doc_id) AS run
         |  FROM tb_d d JOIN tb_a a USING (b)),
         |tb_kept AS (
         |  SELECT * FROM tb_sel
         |  WHERE above + btok <= $budget
         |     OR (above <= $budget AND above + btok > $budget
         |         AND above + run <= $budget))
         |SELECT k.source, count(*) AS n_docs,
         |  CAST(sum(k.tok) AS BIGINT) AS n_tokens,
         |  min($q) AS min_q
         |FROM tb_kept k JOIN documents USING (doc_id)
         |GROUP BY k.source""".stripMargin
    }
  )
}
