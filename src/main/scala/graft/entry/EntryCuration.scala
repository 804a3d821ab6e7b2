package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.ops.{Dedup, Spans}

/** curation slice of the [[SparkEntry]] registry — corpus curation
  * lifecycle: span/line dedup + scrub, decontamination, PII, the
  * durable signature/window/vector index lifecycle (build / append /
  * probe / forget), novelty scoring, curation pipelines and reports.
  * Split out of [[EntryDedup]] by family for maintainability (the
  * r16 registry-split convention); entries and oracles are verbatim
  * registry content (no behavior change). */
private[graft] trait EntryCuration extends EntryContext {

  protected def curationQueries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // ---- north-star text: PII/URL scrubbing. The fixture corpus has no
    //      PII, so deterministic addresses are synthesized per doc INSIDE
    //      the query — the oracle then genuinely checks cross-engine
    //      regexp_replace/extract semantics, not a no-op.
    "q44_scrub" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val enriched = concat(
        col("text"), lit(" contact user"), id, lit("@mail.example.com or "),
        lit("https://site.example/d/"), id, lit(" thanks"))
      T(s, dir, "documents").select(
        col("doc_id"),
        length(enriched).cast("long").as("raw_len"),
        length(graft.ops.TextOps.scrub(enriched)).cast("long").as("clean_len"),
        graft.ops.TextOps.matchCount(enriched, graft.ops.TextOps.emailPattern).as("n_emails"),
        graft.ops.TextOps.matchCount(enriched, graft.ops.TextOps.urlPattern).as("n_urls"))
    }),



    // ---- north-star text: winnowing fingerprints (rolling k-gram
    //      hash + min-per-window, the MOSS scheme) — local fingerprints
    //      robust to edits, exploded to (doc, fp) pairs for bucket-join
    //      candidate generation downstream.
    "q49_winnowing" -> ((s, dir) =>
      graft.ops.TextOps.winnowingFingerprints(
        T(s, dir, "documents"), "text", "doc_id", k = 5, w = 4)
        .select(col("doc_id"), explode(col("fingerprints")).as("fp"))),



    // ---- north-star dedup: INCREMENTAL near-dup (daily-ingest shape).
    //      Corpus = doc_id % 10 != 0 with its signature index built
    //      once (standing in for the persisted sig table); new batch =
    //      doc_id % 10 == 0, hashed alone and probed against the index.
    //      Oracle = the full pipeline's verified pairs filtered to
    //      those touching a new doc.
    "q46_incremental_neardups" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val batch = docs.filter(col("doc_id") % 10 === 0)
      Dedup.incrementalNearDups(
        docs, corpusSigIndex(s, dir), batch, "text", "doc_id", threshold = 0.8)
    }),



    // ---- north-star: DURABLE signature index (q46's production form —
    //      the corpus signatures live in parquet on disk, built once;
    //      the probe reads them back cold. Same result set as q46, but
    //      every signature crosses a real storage round-trip and the
    //      hash parameters come from the index's own committed meta.)
    "q60_durable_index" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val batch = docs.filter(col("doc_id") % 10 === 0)
      graft.io.SignatureIndex.probe(
        docs, batch, "text", durableSigIndex(s, dir), threshold = 0.8)
    }),



    // ---- production-kernel twin of q74: xx64 window hashing on the
    //      full token-window volume — same plan, no md5. Oracle = the
    //      md5 replay (span positions are kernel-independent; parity
    //      spec-pinned in DedupSpec and gate-checked — the q40
    //      convention). Xx64 is DETECTION-grade only; the scrub path
    //      stays on Md5 (see scrubDuplicates scaladoc).
    "q78_dup_spans_xx64" -> ((s, dir) =>
      Spans.duplicateSpans(T(s, dir, "documents"), "text", "doc_id", n = 3,
        kind = Dedup.Xx64)),



    // ---- north-star: benchmark decontamination — docs sharing any
    //      4-word shingle with the benchmark set (doc_id % 50 == 0
    //      stands in for a held-out eval benchmark). The benchmark
    //      gram set is broadcast; the corpus probes it map-side.
    "q50_contamination" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.Search.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "text", "doc_id", n = 4)
    }),



    // ---- north-star: duplicated-line removal (Gopher-style intra-doc
    //      cleanup). The fixture corpus is single-line, so duplicate
    //      lines are synthesized IN-QUERY (q44's recipe) — the oracle
    //      then checks real order-preserving first-occurrence dedup,
    //      not a no-op.
    "q73_line_dedup" -> ((s, dir) => {
      val line1 = concat_ws(" ", slice(split(col("text"), " "), 1, 5))
      val synth = concat_ws("\n", col("text"), line1, line1, col("text"))
      T(s, dir, "documents").select(
        col("doc_id"),
        graft.ops.TextOps.dedupLines(synth).as("clean"),
        size(split(synth, "\n")).cast("long").as("n_before"),
        size(split(graft.ops.TextOps.dedupLines(synth), "\n")).cast("long").as("n_after"))
    }),



    // ---- north-star: exact-substring duplicate spans (token
    //      granularity) — every 3-token window occurring >1 time in
    //      the corpus, merged into maximal per-doc token spans. The
    //      verbatim-boilerplate detector doc-level near-dup can't see.
    "q74_dup_spans" -> ((s, dir) =>
      Spans.duplicateSpans(T(s, dir, "documents"), "text", "doc_id", n = 3)),



    // ---- north-star: INCREMENTAL exact-substring spans — the daily
    //      batch (doc_id % 10 == 0, the q46/q60 convention) probed
    //      against the persisted window-hash index built once over the
    //      standing corpus. Only the batch is hashed; the index is
    //      pruned map-side by the batch's hashes, never reshuffled.
    //      Result ≡ full-corpus q74 restricted to batch docs.
    "q77_incremental_spans" -> ((s, dir) =>
      graft.io.WindowIndex.probe(
        T(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        "text", durableWinIndex(s, dir))),



    // ---- north-star: right-to-be-forgotten on the SIGNATURE index —
    //      every 7th standing-corpus doc deleted from the store (one
    //      index rewrite, the corpus never re-hashed), then the daily
    //      batch probed. No pair may touch a forgotten doc; result ≡
    //      probing an index rebuilt on corpus-minus-deleted.
    "q82_forget_neardups" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.io.SignatureIndex.probe(
        docs, docs.filter(col("doc_id") % 10 === 0), "text",
        forgottenSigIndex(s, dir), threshold = 0.8)
    }),



    // ---- north-star: right-to-be-forgotten on the WINDOW-HASH index —
    //      takedown docs' window counts SUBTRACTED (only the deleted
    //      docs are hashed; one store rewrite), then the batch probed.
    //      A span is still "duplicated" only if surviving docs repeat
    //      it — dup-ness is re-judged against the post-delete corpus.
    "q83_forget_spans" -> ((s, dir) =>
      graft.io.WindowIndex.probe(
        T(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        "text", forgottenWinIndex(s, dir))),



    // ---- north-star: INCREMENTAL dedup decisions — the batch
    //      keep/drop verdict table (q47's daily-ingest twin): arrival
    //      order decides (corpus partner wins regardless of id order,
    //      then batch keep-first). One row per batch doc.
    "q98_incremental_decisions" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val batch = docs.filter(col("doc_id") % 10 === 0)
      Dedup.incrementalDedupDecisions(
        batch,
        graft.io.SignatureIndex.probe(
          docs, batch, "text", durableSigIndex(s, dir), threshold = 0.8),
        "doc_id")
    }),



    // ---- north-star: right-to-be-forgotten on the VECTOR index —
    //      takedown vectors removed by one lists rewrite (quantizer and
    //      probe pruning untouched); the probe simply stops surfacing
    //      them. Query vector 0 is itself forgotten: it can still ASK,
    //      it just no longer appears in anyone's results.
    "q99_forget_vectors" -> ((s, dir) =>
      graft.io.VectorIndex.probe(
        T(s, dir, "embeddings").filter(col("vec_id") === 0),
        forgottenVecIndex(s, dir), k = 10, nprobe = 2)),



    // ---- north-star: eval-set decontamination SCRUB — the action for
    //      q50's report: benchmark-overlapping n-gram spans are cut
    //      (broadcast bench hash set, map-side probe, narrow rebuild);
    //      the rest of a contaminated doc survives.
    "q108_decontaminate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Spans.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0), "text", "doc_id",
        docs.filter(col("doc_id") % 50 === 0), "text", n = 4)
    }),



    // ---- capstone: the INCREMENTAL curation pipeline — what the daily
    //      batch actually runs: quality filters on the batch, near-dup
    //      drops from the durable signature-index probe (arrival-order:
    //      corpus wins, then batch keep-first), incremental scrub of
    //      the survivors against the window index, packed training
    //      sequences. Every stage consumes a PUBLISHED index; the
    //      corpus is never re-read (text enters only for pair verify).
    "q96_incremental_curation" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val quality = graft.ops.CorpusFilters.decide(
        batch, "text", "doc_id",
        graft.config.PipelineConfig.parseCorpusFilters(corpusFilterYaml))
        .filter(col("kept")).select("doc_id")
      val pairs = graft.io.SignatureIndex.probe(
        docs, batch, "text", durableSigIndex(s, dir), threshold = 0.8)
      // arrival-order drop: a batch doc loses to ANY corpus partner
      // (regardless of id order) and to a smaller-id batch partner
      val keepIds = Dedup.incrementalDedupDecisions(batch, pairs, "doc_id")
        .filter(col("keep")).select("doc_id")
      val kept = batch
        .join(broadcast(quality), Seq("doc_id"), "left_semi")
        .join(broadcast(keepIds), Seq("doc_id"), "left_semi")
      val cleaned = graft.io.WindowIndex.scrubProbe(
        kept, "text", durableWinIndex(s, dir))
        .select(col("doc_id"), col("clean"))
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      graft.ops.Packing.packSequences(cleaned, "clean", "lang", "doc_id", budget = 512L)
    }),



    // ---- north-star: INCREMENTAL exact-substring scrubbing — the
    //      batch scrubbed against the standing window index with
    //      ARRIVAL-order keep-first (a window the corpus has seen is
    //      cut from every batch occurrence; a corpus-new window keeps
    //      its first batch occurrence). Completes the incremental
    //      family: detect (q77) / select (q90) / scrub (q95).
    "q95_incremental_scrub" -> ((s, dir) =>
      graft.io.WindowIndex.scrubProbe(
        T(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        "text", durableWinIndex(s, dir))),



    // ---- north-star: corpus n-gram stats FROM THE INDEX ALONE — the
    //      metadata-only read of the q77 window store: distinct/total/
    //      duplicated grams + ledger doc count without touching the
    //      corpus (cost ∝ index, not data). Oracle recomputes the same
    //      numbers from the corpus — index ≡ corpus by construction.
    "q93_index_stats" -> ((s, dir) =>
      graft.io.WindowIndex.stats(s, durableWinIndex(s, dir))),



    // ---- north-star: dup-cluster size histogram — the shape report of
    //      the near-dup graph (how much is pairwise noise vs template
    //      families); consumes the published cluster labels.
    "q92_cluster_sizes" -> ((s, dir) =>
      clusterLabels(s, dir)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))),



    // ---- north-star: per-doc n-gram NOVELTY vs the standing corpus —
    //      the data-selection read of the q77 window index (boilerplate
    //      re-crawls score ~0, genuinely new text ~1); only the batch
    //      is hashed, the index is pruned map-side, never reshuffled.
    "q90_novelty_scores" -> ((s, dir) =>
      graft.io.WindowIndex.noveltyProbe(
        T(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        "text", durableWinIndex(s, dir))),



    // ---- north-star: per-SOURCE novelty rollup — the acquisition
    //      dashboard: which sources still yield n-gram-new text vs
    //      boilerplate re-crawls. Token-weighted (Σnovel/Σwindows) over
    //      the q90 index probe; |sources| rows out.
    "q100_source_novelty" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.io.WindowIndex.noveltyProbe(
        docs.filter(col("doc_id") % 10 === 0), "text", durableWinIndex(s, dir))
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_windows").as("n_windows"),
          sum("n_novel").as("n_novel"),
          round(sum(col("n_novel")).cast("double") / sum(col("n_windows")), 6)
            .as("novelty"))
    }),



    // ---- north-star: corpus-health report — the corpus-level dataset
    //      card: docs, tokens, lang/source cardinalities, normalized
    //      exact-dup rate, decimal-summed mean quality, ONE aggregation
    //      pass (exact distincts; q63's HLL profile is the 100 TB twin).
    "q89_corpus_report" -> ((s, dir) => {
      val t = col("text")
      T(s, dir, "documents")
        .select(
          graft.functions.GraftFunctions.tokenCount(s, t).as("__n"),
          col("lang"), col("source"),
          graft.ops.TextOps.fingerprint(t).as("__fp"),
          graft.ops.TextOps.qualityScore(t).cast("decimal(18,6)").as("__q"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__n")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          round(lit(1.0) - countDistinct(col("__fp")).cast("double") / count(lit(1)), 6)
            .as("dup_rate"),
          round(sum(col("__q")).cast("double") / count(lit(1)), 6).as("mean_quality"))
    }),



    // ---- north-star: exact-substring SCRUBBING — cut every duplicated
    //      3-token window except its first corpus-wide occurrence and
    //      rebuild the text (the keep-first action for q74's detector).
    "q75_span_scrub" -> ((s, dir) =>
      Spans.scrubDuplicates(T(s, dir, "documents"), "text", "doc_id", n = 3)),



    // ---- capstone variant WITH span scrubbing: the production order
    //      (silver clean before gold assembly) — near-dup keepers ∧
    //      quality filters select the docs, THEN exact-substring
    //      scrubbing cuts residual verbatim boilerplate among the
    //      survivors, THEN the cleaned text is packed. Scrub runs over
    //      the CURATED corpus: whole near-dup docs are already gone, so
    //      the span pass only pays for what doc-level dedup can't see.
    "q76_curation_scrubbed" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val keepers = Dedup.dedupDecisions(docs, "doc_id", clusterLabels(s, dir))
        .filter(col("keep")).select("doc_id")
      val quality = graft.ops.CorpusFilters.decide(
        docs, "text", "doc_id",
        graft.config.PipelineConfig.parseCorpusFilters(corpusFilterYaml))
        .filter(col("kept")).select("doc_id")
      val curated = docs
        .join(broadcast(keepers), Seq("doc_id"), "left_semi")
        .join(broadcast(quality), Seq("doc_id"), "left_semi")
      val scrubbed = Spans.scrubDuplicates(curated, "text", "doc_id", n = 3)
        .select(col("doc_id"), col("clean"))
        // re-attach the shard key (scrub projects it away); id-keyed
        // equi-join against the id+lang projection only
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      graft.ops.Packing.packSequences(scrubbed, "clean", "lang", "doc_id", budget = 512L)
    }),



    // ---- capstone: the WHOLE curation pipeline as one declarative
    //      plan — quality-filter chain ∧ near-dup keepers → packed
    //      training sequences. Every stage reuses an operator that is
    //      individually oracle-checked; this query checks their
    //      COMPOSITION end-to-end.
    "q72_curation_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val keepers = Dedup.dedupDecisions(docs, "doc_id", clusterLabels(s, dir))
        .filter(col("keep")).select("doc_id")
      val quality = graft.ops.CorpusFilters.decide(
        docs, "text", "doc_id",
        graft.config.PipelineConfig.parseCorpusFilters(corpusFilterYaml))
        .filter(col("kept")).select("doc_id")
      // both prune lists are id-only and corpus-bounded-small relative
      // to the docs they prune — broadcast them (the static planner
      // sees only stale size estimates through the filter/label joins
      // and falls back to sort-merge)
      val curated = docs
        .join(broadcast(keepers), Seq("doc_id"), "left_semi")
        .join(broadcast(quality), Seq("doc_id"), "left_semi")
      graft.ops.Packing.packSequences(curated, "text", "lang", "doc_id", budget = 512L)
    }),



    // ---- north-star: corpus-level line dedup (CCNet/RefinedWeb
    //      paragraph dedup) — keep each line's first corpus-wide
    //      occurrence, rebuild docs. The fixture corpus is single-line
    //      (q73's note), so multi-line bodies with a GUARANTEED
    //      cross-doc duplicate (a shared header) plus likely ones (the
    //      first-5-token line) are synthesized in-query.
    "q80_corpus_line_dedup" -> ((s, dir) => {
      val line1 = concat_ws(" ", slice(split(col("text"), " "), 1, 5))
      val synth = concat_ws("\n",
        lit("graft shared header line"), col("text"), line1, line1)
      Spans.corpusLineDedup(
        T(s, dir, "documents").select(col("doc_id"), synth.as("body")),
        "body", "doc_id")
    }),



    // ---- north-star: PII redaction — same constructed corpus, but
    //      the scrub must reproduce the EXPECTED text byte-for-byte
    //      (typed tokens replace each span, the Luhn-invalid decoy
    //      survives untouched): n_exact must equal n_docs, the q140
    //      exact-recovery pattern.
    "q149_pii_scrub" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      val expected = concat(col("text"),
        when(id % 3 === 0, lit(" contact <EMAIL>")).otherwise(lit("")),
        when(id % 4 === 0, lit(" call <PHONE>")).otherwise(lit("")),
        when(id % 6 === 0, lit(" host <IP>")).otherwise(lit("")),
        when(id % 5 === 0, lit(" card <CARD>"))
          .when(id % 5 === 1, lit(" ref 4532015112830367")).otherwise(lit("")))
      docs.select((id % 7).as("bucket"),
          graft.functions.GraftFunctions.piiScrub(s, piiMessy(id)).as("scrubbed"),
          expected.as("expected"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("scrubbed") === col("expected"), 1L).otherwise(0L))
            .as("n_exact"),
          sum(length(col("scrubbed"))).as("sum_chars"))
    }),



    // ---- north-star: fuzzy eval decontamination via token LCS
    //      (ROUGE-L) — benchmark items (12-token prefixes of id%53
    //      docs) are candidate-matched by shared word 3-grams, then
    //      VERIFIED by the LCS kernel: 10·lcs >= 8·|item| flags a
    //      leaked-with-edits item that verbatim n-gram checks miss.
    //      The oracle replays the exact DP as an anti-diagonal
    //      recursive CTE.
    "q188_lcs_decontamination" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      val items = toks.filter(col("doc_id") % 53 === 0)
        .select(col("doc_id").as("item_id"),
          slice(col("t"), 1, 12).as("bt"))
        .select(col("item_id"), concat_ws(" ", col("bt")).as("item_text"),
          size(col("bt")).cast("long").as("m"))
      val itemGrams = toks.filter(col("doc_id") % 53 === 0)
        .select(col("doc_id").as("item_id"), slice(col("t"), 1, 12).as("bt"))
        .filter(size(col("bt")) >= 3)
        .select(col("item_id"), explode(expr(
          "transform(sequence(0, size(bt)-3), i -> " +
            "concat_ws(' ', bt[i], bt[i+1], bt[i+2]))")).as("g"))
        .distinct()
      val docGrams = toks.filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t)-3), i -> " +
            "concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("g"))
        .distinct()
      val cands = docGrams.join(broadcast(itemGrams), Seq("g"))
        .filter(col("doc_id") =!= col("item_id"))
        .select("doc_id", "item_id").distinct()
      cands
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .join(broadcast(items), Seq("item_id"))
        .select(col("item_id"), col("m"),
          graft.functions.GraftFunctions
            .lcsCount(s, col("text"), col("item_text")).as("lcs"))
        .groupBy("item_id")
        .agg(
          count(lit(1)).as("n_candidates"),
          sum(when(lit(10) * col("lcs") >= lit(8) * col("m"), 1L)
            .otherwise(0L)).as("n_contaminated"),
          max(col("lcs")).as("max_lcs"),
          sum(col("lcs")).as("sum_lcs"))
    })
  )

  protected def curationOracles: Map[String, String] = Map(


    "q44_scrub" -> {
      // literal single backslashes survive DuckDB standard string
      // literals; the Scala escapes below render e.g. `\.` verbatim
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val url = "https?://[^ \\t\\n\\r\\f]+"
      val enriched = "concat(text, ' contact user', CAST(doc_id AS VARCHAR), " +
        "'@mail.example.com or ', 'https://site.example/d/', CAST(doc_id AS VARCHAR), ' thanks')"
      s"""WITH e AS (SELECT doc_id, $enriched AS x FROM documents)
         |SELECT doc_id,
         |  CAST(length(x) AS BIGINT) AS raw_len,
         |  CAST(length(regexp_replace(regexp_replace(x, '$url', '<scrubbed>', 'g'),
         |    '$email', '<scrubbed>', 'g')) AS BIGINT) AS clean_len,
         |  CAST(len(regexp_extract_all(x, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(x, '$url')) AS BIGINT) AS n_urls
         |FROM e""".stripMargin
    },



    "q46_incremental_neardups" ->
      s"""WITH $jaccardCtes
         |SELECT id_a, id_b, jaccard FROM vpairs
         |WHERE id_a % 10 = 0 OR id_b % 10 = 0""".stripMargin,



    // durable-index probe returns exactly the incremental pair set
    "q60_durable_index" ->
      s"""WITH $jaccardCtes
         |SELECT id_a, id_b, jaccard FROM vpairs
         |WHERE id_a % 10 = 0 OR id_b % 10 = 0""".stripMargin,



    "q73_line_dedup" -> {
      // order-preserving first-occurrence dedup: keep index i iff the
      // line's first position IS i (DuckDB's list_distinct reorders)
      val dedup = "array_to_string(list_transform(" +
        "list_filter(generate_series(1, len(l)), __i -> list_position(l, l[__i]) = __i), " +
        "__i -> l[__i]), chr(10))"
      s"""WITH s AS (SELECT doc_id,
         |  concat(text, chr(10), line1, chr(10), line1, chr(10), text) AS x
         |  FROM (SELECT doc_id, text,
         |    array_to_string((string_split(text, ' '))[1:5], ' ') AS line1
         |    FROM documents)),
         |t AS (SELECT doc_id, x, string_split(x, chr(10)) AS l FROM s)
         |SELECT doc_id, $dedup AS clean,
         |  CAST(len(l) AS BIGINT) AS n_before,
         |  CAST(len(string_split($dedup, chr(10))) AS BIGINT) AS n_after
         |FROM t""".stripMargin
    },



    "q74_dup_spans" -> dupSpansSql(""),

    // q78 = the xx64 window-kernel twin: span positions are
    // kernel-independent values (a window is duplicated iff its token
    // STRING repeats, absent collisions); span-set equality across
    // kernels is DedupSpec-pinned and gate-checked here with the md5
    // replay as the oracle (the q40 convention)
    "q78_dup_spans_xx64" -> dupSpansSql(""),



    // incremental probe returns exactly the full-corpus span set
    // restricted to the batch docs — dup-ness is judged against the
    // WHOLE corpus (index counts + batch counts)
    "q77_incremental_spans" -> dupSpansSql("WHERE doc_id % 10 = 0"),



    // forgetting is endpoint-local for PAIRWISE near-dup: the full
    // pipeline's pairs minus any touching a deleted doc
    "q82_forget_neardups" ->
      s"""WITH $jaccardCtes
         |SELECT id_a, id_b, jaccard FROM vpairs
         |WHERE (id_a % 10 = 0 OR id_b % 10 = 0)
         |  AND NOT (id_a % 10 <> 0 AND id_a % 7 = 0)
         |  AND NOT (id_b % 10 <> 0 AND id_b % 7 = 0)""".stripMargin,



    // forgetting is CORPUS-GLOBAL for exact-substring dup-ness (a
    // window can stop being duplicated when its other occurrence is
    // deleted) — the oracle recomputes spans over corpus-minus-deleted
    "q83_forget_spans" -> dupSpansSql("WHERE doc_id % 10 = 0", 3,
      "WHERE NOT (doc_id % 10 <> 0 AND doc_id % 7 = 0)"),



    // arrival-order verdicts over the incremental pair set (q60's SQL):
    // drop = corpus partner exists OR a smaller-id batch partner exists
    "q98_incremental_decisions" ->
      s"""WITH $jaccardCtes,
         |drops AS (SELECT DISTINCT CASE
         |    WHEN id_a % 10 = 0 AND id_b % 10 = 0 THEN id_b
         |    WHEN id_a % 10 = 0 THEN id_a
         |    ELSE id_b END AS doc_id
         |  FROM vpairs WHERE id_a % 10 = 0 OR id_b % 10 = 0)
         |SELECT d.doc_id, dr.doc_id IS NULL AS keep
         |FROM documents d LEFT JOIN drops dr ON d.doc_id = dr.doc_id
         |WHERE d.doc_id % 10 = 0""".stripMargin,



    "q96_incremental_curation" -> {
      val dropCase = graft.ops.CorpusFilters.dropReasonSql(
        graft.config.PipelineConfig.parseCorpusFilters(corpusFilterYaml),
        "text", graft.functions.PortableSql.DuckDialect)
      val nClean = PortableSql.tokenCount("clean", DD)
      // batch quality gate → arrival-order near-dup drops (vpairs
      // touching the batch) → q95's scrub restricted to the kept docs
      // → q64's packing on the CLEANED token counts. `t` (doc_id, toks)
      // is shared with the jaccard chain.
      s"""WITH $jaccardCtes,
         |quality AS (SELECT doc_id FROM documents
         |            WHERE doc_id % 10 = 0 AND ($dropCase) IS NULL),
         |drops AS (SELECT DISTINCT CASE
         |    WHEN id_a % 10 = 0 AND id_b % 10 = 0 THEN id_b
         |    WHEN id_a % 10 = 0 THEN id_a
         |    ELSE id_b END AS doc_id
         |  FROM vpairs WHERE id_a % 10 = 0 OR id_b % 10 = 0),
         |kept AS (SELECT q.doc_id FROM quality q
         |         LEFT JOIN drops dr ON q.doc_id = dr.doc_id
         |         WHERE dr.doc_id IS NULL),
         |wu AS (SELECT doc_id,
         |        unnest(generate_series(1, len(toks) - 2)) AS pos, toks
         |      FROM t WHERE len(toks) >= 3),
         |wh AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |        md5(array_to_string(toks[pos:pos + 2], ' ')) AS hh
         |      FROM wu),
         |cw AS (SELECT DISTINCT hh FROM wh WHERE doc_id % 10 <> 0),
         |bm AS (SELECT doc_id, pos, hh,
         |    row_number() OVER (PARTITION BY hh ORDER BY doc_id, pos) AS rn
         |  FROM wh JOIN kept USING (doc_id)),
         |cut AS (SELECT bm.doc_id, bm.pos FROM bm LEFT JOIN cw USING (hh)
         |        WHERE cw.hh IS NOT NULL OR bm.rn > 1),
         |ii AS (SELECT doc_id, pos,
         |        CASE WHEN pos <= max(pos + 3) OVER (PARTITION BY doc_id
         |          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |        THEN 0 ELSE 1 END AS brk
         |      FROM cut),
         |gg AS (SELECT doc_id, pos, CAST(sum(brk) OVER (PARTITION BY doc_id
         |        ORDER BY pos) AS BIGINT) AS grp FROM ii),
         |ssp AS (SELECT doc_id, min(pos) AS s, max(pos) + 3 AS e
         |       FROM gg GROUP BY doc_id, grp),
         |sl AS (SELECT doc_id, list(s ORDER BY s) AS ss, list(e ORDER BY s) AS ee
         |       FROM ssp GROUP BY doc_id),
         |bt AS (SELECT t.doc_id, t.toks FROM t JOIN kept USING (doc_id)),
         |kk AS (SELECT bt.doc_id, bt.toks,
         |        list_filter(generate_series(1, len(bt.toks)), __i ->
         |          len(list_filter(generate_series(1, coalesce(len(sl.ss), 0)),
         |            __j -> __i >= sl.ss[__j] AND __i < sl.ee[__j])) = 0) AS kept_i
         |      FROM bt LEFT JOIN sl USING (doc_id)),
         |cleaned AS (SELECT doc_id,
         |  coalesce(array_to_string(list_transform(kept_i, __i -> toks[__i]), ' '),
         |           '') AS clean FROM kk),
         |cur AS (SELECT c.doc_id, d.lang, CAST($nClean AS BIGINT) AS n
         |        FROM cleaned c JOIN documents d USING (doc_id)),
         |pp AS (SELECT doc_id, lang, n,
         |        sum(n) OVER (PARTITION BY lang ORDER BY doc_id) AS e
         |      FROM cur WHERE n > 0),
         |xx AS (SELECT doc_id, lang, e - n AS s, e FROM pp),
         |pu AS (SELECT doc_id, lang, s, e,
         |        unnest(generate_series(CAST(s // 512 AS BIGINT),
         |                               CAST((e - 1) // 512 AS BIGINT))) AS seq_idx
         |      FROM xx)
         |SELECT doc_id, lang, seq_idx,
         |  CAST(least(e, (seq_idx + 1) * 512) - greatest(s, seq_idx * 512) AS BIGINT) AS toks_in_seq
         |FROM pu""".stripMargin
    },



    // arrival-order keep-first: corpus occurrences are canonical (cut
    // every batch occurrence of a corpus-seen window), corpus-new
    // windows keep their first (doc,pos) batch occurrence
    "q95_incremental_scrub" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |u AS (SELECT doc_id,
         |        unnest(generate_series(1, len(toks) - 2)) AS pos, toks
         |      FROM t WHERE len(toks) >= 3),
         |h AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |        md5(array_to_string(toks[pos:pos + 2], ' ')) AS hh
         |      FROM u),
         |cw AS (SELECT DISTINCT hh FROM h WHERE doc_id % 10 <> 0),
         |bm AS (SELECT doc_id, pos, hh,
         |    row_number() OVER (PARTITION BY hh ORDER BY doc_id, pos) AS rn
         |  FROM h WHERE doc_id % 10 = 0),
         |cut AS (SELECT bm.doc_id, bm.pos FROM bm LEFT JOIN cw USING (hh)
         |        WHERE cw.hh IS NOT NULL OR bm.rn > 1),
         |i AS (SELECT doc_id, pos,
         |        CASE WHEN pos <= max(pos + 3) OVER (PARTITION BY doc_id
         |          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |        THEN 0 ELSE 1 END AS brk
         |      FROM cut),
         |g AS (SELECT doc_id, pos, CAST(sum(brk) OVER (PARTITION BY doc_id
         |        ORDER BY pos) AS BIGINT) AS grp FROM i),
         |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 3 AS e
         |       FROM g GROUP BY doc_id, grp),
         |sl AS (SELECT doc_id, list(s ORDER BY s) AS ss, list(e ORDER BY s) AS ee
         |       FROM sp GROUP BY doc_id),
         |bt AS (SELECT doc_id, toks FROM t WHERE doc_id % 10 = 0),
         |k AS (SELECT bt.doc_id, bt.toks,
         |        list_filter(generate_series(1, len(bt.toks)), __i ->
         |          len(list_filter(generate_series(1, coalesce(len(sl.ss), 0)),
         |            __j -> __i >= sl.ss[__j] AND __i < sl.ee[__j])) = 0) AS kept
         |      FROM bt LEFT JOIN sl USING (doc_id))
         |SELECT doc_id,
         |  coalesce(array_to_string(list_transform(kept, __i -> toks[__i]), ' '),
         |           '') AS clean,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
         |FROM k""".stripMargin,



    "q93_index_stats" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |           WHERE doc_id % 10 <> 0),
         |u AS (SELECT doc_id,
         |        unnest(generate_series(1, len(toks) - 2)) AS pos, toks
         |      FROM t WHERE len(toks) >= 3),
         |h AS (SELECT md5(array_to_string(toks[pos:pos + 2], ' ')) AS hh FROM u),
         |g AS (SELECT hh, count(*) AS c FROM h GROUP BY hh)
         |SELECT CAST(count(*) AS BIGINT) AS n_distinct_grams,
         |  CAST(sum(c) AS BIGINT) AS n_windows,
         |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
         |  (SELECT count(*) FROM documents WHERE doc_id % 10 <> 0) AS n_docs
         |FROM g""".stripMargin,



    "q92_cluster_sizes" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |$closureCtes,
         |cs AS (SELECT cluster_id, count(*) AS cluster_size
         |       FROM labels GROUP BY cluster_id)
         |SELECT cluster_size, count(*) AS n_clusters
         |FROM cs GROUP BY cluster_size""".stripMargin,



    "q100_source_novelty" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |u AS (SELECT doc_id,
         |        unnest(generate_series(1, len(toks) - 2)) AS pos, toks
         |      FROM t WHERE len(toks) >= 3),
         |h AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |        md5(array_to_string(toks[pos:pos + 2], ' ')) AS hh
         |      FROM u),
         |cw AS (SELECT DISTINCT hh FROM h WHERE doc_id % 10 <> 0),
         |bw AS (SELECT doc_id, hh FROM h WHERE doc_id % 10 = 0),
         |d AS (SELECT bw.doc_id, count(*) AS w,
         |        sum(CASE WHEN cw.hh IS NULL THEN 1 ELSE 0 END) AS nv
         |      FROM bw LEFT JOIN cw USING (hh) GROUP BY bw.doc_id)
         |SELECT s.source, count(*) AS n_docs,
         |  CAST(sum(d.w) AS BIGINT) AS n_windows,
         |  CAST(sum(d.nv) AS BIGINT) AS n_novel,
         |  round(CAST(sum(d.nv) AS DOUBLE) / sum(d.w), 6) AS novelty
         |FROM d JOIN documents s USING (doc_id)
         |GROUP BY s.source""".stripMargin,



    // novelty judged vs the CORPUS only (batch-internal repeats stay
    // novel): batch windows left-join the corpus's distinct window set
    "q90_novelty_scores" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |u AS (SELECT doc_id,
         |        unnest(generate_series(1, len(toks) - 2)) AS pos, toks
         |      FROM t WHERE len(toks) >= 3),
         |h AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |        md5(array_to_string(toks[pos:pos + 2], ' ')) AS hh
         |      FROM u),
         |cw AS (SELECT DISTINCT hh FROM h WHERE doc_id % 10 <> 0),
         |bw AS (SELECT doc_id, hh FROM h WHERE doc_id % 10 = 0)
         |SELECT bw.doc_id, count(*) AS n_windows,
         |  CAST(sum(CASE WHEN cw.hh IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  round(CAST(sum(CASE WHEN cw.hh IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS novelty
         |FROM bw LEFT JOIN cw USING (hh)
         |GROUP BY bw.doc_id""".stripMargin,



    "q89_corpus_report" -> {
      val n = PortableSql.tokenCount("text", DD)
      val q = PortableSql.qualityScore("text", DD)
      s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum($n) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  round(1.0 - CAST(count(DISTINCT md5(lower(trim(text)))) AS DOUBLE) / count(*), 6) AS dup_rate,
         |  round(cast(sum(cast($q as decimal(18,6))) as double) / count(*), 6) AS mean_quality
         |FROM documents""".stripMargin
    },



    "q75_span_scrub" ->
      s"""WITH ${scrubCtes("documents", 3)}
         |SELECT doc_id, clean, n_tokens, n_removed FROM sc_clean""".stripMargin,



    "q76_curation_scrubbed" -> {
      val dropCase = graft.ops.CorpusFilters.dropReasonSql(
        graft.config.PipelineConfig.parseCorpusFilters(corpusFilterYaml),
        "text", graft.functions.PortableSql.DuckDialect)
      val n = PortableSql.tokenCount("clean", DD)
      // q72's selection (near-dup keepers ∧ quality) → q75's scrub over
      // the curated docs → q72's packing, on the CLEANED token counts
      s"""WITH RECURSIVE $jaccardCtes,
         |$closureCtes,
         |keepers AS (
         |  SELECT d.doc_id FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
         |  WHERE coalesce(l.cluster_id, d.doc_id) = d.doc_id),
         |quality AS (SELECT doc_id FROM documents WHERE ($dropCase) IS NULL),
         |cdocs AS (
         |  SELECT d.doc_id, d.lang, d.text FROM documents d
         |  JOIN keepers USING (doc_id) JOIN quality USING (doc_id)),
         |${scrubCtes("cdocs", 3)},
         |cur AS (SELECT c.doc_id, d.lang, CAST($n AS BIGINT) AS n
         |        FROM sc_clean c JOIN cdocs d USING (doc_id)),
         |p AS (SELECT doc_id, lang, n,
         |        sum(n) OVER (PARTITION BY lang ORDER BY doc_id) AS e
         |      FROM cur WHERE n > 0),
         |x AS (SELECT doc_id, lang, e - n AS s, e FROM p),
         |u AS (SELECT doc_id, lang, s, e,
         |        unnest(generate_series(CAST(s // 512 AS BIGINT),
         |                               CAST((e - 1) // 512 AS BIGINT))) AS seq_idx
         |      FROM x)
         |SELECT doc_id, lang, seq_idx,
         |  CAST(least(e, (seq_idx + 1) * 512) - greatest(s, seq_idx * 512) AS BIGINT) AS toks_in_seq
         |FROM u""".stripMargin
    },



    "q72_curation_pipeline" -> {
      val dropCase = graft.ops.CorpusFilters.dropReasonSql(
        graft.config.PipelineConfig.parseCorpusFilters(corpusFilterYaml),
        "text", graft.functions.PortableSql.DuckDialect)
      val n = PortableSql.tokenCount("text", DD)
      s"""WITH RECURSIVE $jaccardCtes,
         |$closureCtes,
         |keepers AS (
         |  SELECT d.doc_id FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
         |  WHERE coalesce(l.cluster_id, d.doc_id) = d.doc_id),
         |quality AS (SELECT doc_id FROM documents WHERE ($dropCase) IS NULL),
         |cur AS (
         |  SELECT d.doc_id, d.lang, CAST($n AS BIGINT) AS n FROM documents d
         |  JOIN keepers USING (doc_id) JOIN quality USING (doc_id)),
         |p AS (SELECT doc_id, lang, n,
         |        sum(n) OVER (PARTITION BY lang ORDER BY doc_id) AS e
         |      FROM cur WHERE n > 0),
         |x AS (SELECT doc_id, lang, e - n AS s, e FROM p),
         |u AS (SELECT doc_id, lang, s, e,
         |        unnest(generate_series(CAST(s // 512 AS BIGINT),
         |                               CAST((e - 1) // 512 AS BIGINT))) AS seq_idx
         |      FROM x)
         |SELECT doc_id, lang, seq_idx,
         |  CAST(least(e, (seq_idx + 1) * 512) - greatest(s, seq_idx * 512) AS BIGINT) AS toks_in_seq
         |FROM u""".stripMargin
    },



    "q80_corpus_line_dedup" ->
      // keep-first corpus-wide per LINE: row_number over (line, order
      // doc,pos) = 1 ≡ Spark's min(struct(doc,pos)) canonical
      s"""WITH s0 AS (SELECT doc_id, text,
         |    array_to_string((string_split(text, ' '))[1:5], ' ') AS l1
         |  FROM documents),
         |s AS (SELECT doc_id, concat('graft shared header line', chr(10),
         |    text, chr(10), l1, chr(10), l1) AS x FROM s0),
         |t AS (SELECT doc_id, string_split(x, chr(10)) AS l FROM s),
         |e AS (SELECT doc_id, unnest(l) AS line,
         |    unnest(generate_series(1, len(l))) AS pos FROM t),
         |k AS (SELECT doc_id, line, pos,
         |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
         |  FROM e),
         |r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
         |    count(*) AS n_after
         |  FROM k WHERE rn = 1 GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(r.clean, '') AS clean,
         |  CAST(len(t.l) AS BIGINT) AS n_before,
         |  CAST(coalesce(r.n_after, 0) AS BIGINT) AS n_after
         |FROM t LEFT JOIN r USING (doc_id)""".stripMargin,



    // deletion touches only the LISTS: quantizer, probe ranking and
    // scan pruning are unchanged — the scored set just shrinks
    "q99_forget_vectors" -> ivfTrainedSql("WHERE e.vec_id % 7 <> 0"),



    // decontamination oracle: q50's corpus/bench split, the scrub
    // chain's shared islands+rebuild tail, cut = windows whose md5
    // matches any distinct benchmark shingle hash
    "q108_decontaminate" -> {
      val cut =
        s"""sc_bw AS (SELECT unnest(${DD.shingles("toks", 4)}) AS w
           |       FROM (SELECT string_split(text, ' ') AS toks
           |             FROM documents WHERE doc_id % 50 = 0)),
           |sc_bh AS (SELECT DISTINCT md5(w) AS hh FROM sc_bw),
           |sc_cut AS (SELECT doc_id, pos FROM sc_h JOIN sc_bh USING (hh))""".stripMargin
      s"""WITH c108 AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
         |${scrubCtesWith("c108", 4, cut)}
         |SELECT doc_id, clean, n_tokens, n_removed FROM sc_clean""".stripMargin
    },



    "q49_winnowing" -> {
      val k = 5; val w = 4
      val terms = (0 until k).map { j =>
        val pow = BigInt(257).pow(k - 1 - j).toLong
        s"ascii(substr(text, __i + $j, 1)) * $pow"
      }.mkString("(", " + ", ")")
      // short-doc guards mirror the Spark side: < k chars → no k-grams
      s"""WITH hs AS (
         |  SELECT doc_id, CASE WHEN length(text) >= $k THEN list_transform(
         |    generate_series(1, length(text) - ${k - 1}),
         |    __i -> $terms % 1000003) ELSE [] END AS h
         |  FROM documents
         |),
         |fp AS (
         |  SELECT doc_id, CASE WHEN len(h) >= 1 THEN list_distinct(list_transform(
         |    generate_series(1, greatest(len(h) - ${w - 1}, 1)),
         |    __t -> list_min(h[__t:__t + ${w - 1}]))) ELSE [] END AS fps
         |  FROM hs
         |)
         |SELECT doc_id, unnest(fps) AS fp FROM fp""".stripMargin
    },



    "q50_contamination" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |sh AS (SELECT doc_id, ${DD.shingles("toks", 4)} AS s FROM t),
         |cg AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 50 <> 0),
         |bg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0)
         |SELECT cg.doc_id, count(*) AS n_contaminated
         |FROM cg JOIN bg USING (g) GROUP BY cg.doc_id""".stripMargin,



    // PII-scrub replay: expected text is reconstructible (typed token
    // lengths: " contact <EMAIL>"=16, " call <PHONE>"=13,
    // " host <IP>"=10, " card <CARD>"=12, untouched decoy=21), and
    // exactness is asserted by n_exact = n_docs
    "q149_pii_scrub" ->
      """SELECT doc_id % 7 AS bucket, count(*) AS n_docs, count(*) AS n_exact,
        |  CAST(sum(length(text)
        |    + CASE WHEN doc_id % 3 = 0 THEN 16 ELSE 0 END
        |    + CASE WHEN doc_id % 4 = 0 THEN 13 ELSE 0 END
        |    + CASE WHEN doc_id % 6 = 0 THEN 10 ELSE 0 END
        |    + CASE WHEN doc_id % 5 = 0 THEN 12
        |           WHEN doc_id % 5 = 1 THEN 21 ELSE 0 END) AS BIGINT) AS sum_chars
        |FROM documents WHERE text IS NOT NULL GROUP BY 1""".stripMargin,



    // LCS replay: identical 3-gram candidate gen, then the SAME DP as
    // an anti-diagonal recursive CTE — diag d+1 computed from diags d
    // and d-1 with list_transform (out-of-grid cells coalesce to 0);
    // the answer is the single cell of diag n+m
    "q188_lcs_decontamination" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |it AS (SELECT doc_id AS item_id, list_slice(t, 1, 12) AS bt
        |       FROM tk WHERE doc_id % 53 = 0),
        |dg AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)-2+1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        |  FROM tk WHERE len(t) >= 3)),
        |ig AS (SELECT DISTINCT item_id, g FROM (
        |  SELECT item_id, unnest(list_transform(range(1, len(bt)-2+1),
        |    i -> bt[i] || ' ' || bt[i+1] || ' ' || bt[i+2])) AS g
        |  FROM it WHERE len(bt) >= 3)),
        |cand AS (SELECT DISTINCT dg.doc_id, ig.item_id
        |         FROM dg JOIN ig USING (g) WHERE dg.doc_id <> ig.item_id),
        |pm AS (SELECT c.doc_id, c.item_id, tk.t AS a, it.bt AS b,
        |         len(tk.t) AS n, len(it.bt) AS m
        |       FROM cand c JOIN tk ON tk.doc_id = c.doc_id
        |       JOIN it ON it.item_id = c.item_id),
        |dp AS (
        |  SELECT doc_id, item_id, 1 AS d, CAST([] AS BIGINT[]) AS prev2,
        |         CAST([] AS BIGINT[]) AS prev, n, m, a, b FROM pm
        |  UNION ALL
        |  SELECT doc_id, item_id, d+1,
        |    prev,
        |    list_transform(range(greatest(1, (d+1)-m), least(n, d)+1),
        |      i -> CASE WHEN a[i] = b[(d+1)-i]
        |        THEN coalesce(prev2[(i-1) - greatest(1, (d-1)-m) + 1], 0) + 1
        |        ELSE greatest(
        |          coalesce(prev[(i-1) - greatest(1, d-m) + 1], 0),
        |          coalesce(prev[i - greatest(1, d-m) + 1], 0)) END),
        |    n, m, a, b
        |  FROM dp WHERE d < n + m),
        |res AS (SELECT item_id, m, coalesce(prev[1], 0) AS lcs
        |        FROM dp WHERE d = n + m)
        |SELECT item_id, count(*) AS n_candidates,
        |  CAST(sum(CASE WHEN 10*lcs >= 8*m THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_contaminated,
        |  max(lcs) AS max_lcs, CAST(sum(lcs) AS BIGINT) AS sum_lcs
        |FROM res GROUP BY 1""".stripMargin
  )
}
