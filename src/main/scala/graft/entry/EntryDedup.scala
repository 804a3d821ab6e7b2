package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/** dedup slice of the [[SparkEntry]] registry — deduplication: MinHash/SimHash/LSH, exact Jaccard (PPJoin), span scrub, durable signature/window indexes, linkage, curation.
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
    //      perfect recall for hamming < blocks by pigeonhole).
    //      maxBucketPairs is raised EXPLICITLY above the 25M default:
    //      32-bit simhash on this small-vocab corpus has ~10 of 32
    //      bits near-unanimous (the q41 entropy note), so 8-bit block
    //      values concentrate AND the hamming-≤3 ball saturates —
    //      measured (SimhashAudit, BASELINE.md r17 density audit): at
    //      sf1 the hottest (blk,v) bucket holds 13,673 postings =
    //      187M candidate pairs (default fence fired for real on the
    //      sf1 sweep) and the TRUE output is 83,078 → 9,262,736 pairs
    //      sf0.1→sf1 (111× at 10× corpus — the output itself is
    //      quadratic; the 29× runtime is BELOW output growth). Keeping
    //      the 32-bit surface is a deliberate, capped decision; the
    //      production fix is q294's 64-bit/16-bit-block twin, which
    //      stays under the default cap.
    "q31_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashNearDups(
        T(s, dir, "documents"), "text", "doc_id",
        bits = 32, blocks = 4, maxHamming = 3,
        maxBucketPairs = 1_000_000_000L)),


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


    // ---- north-star dedup: corpus-wide keep/drop DECISIONS — the
    //      table a training pipeline consumes. Reads the same shared
    //      pair index as q16/q39; singleton docs keep themselves.
    "q47_dedup_decisions" -> ((s, dir) =>
      Dedup.dedupDecisions(
        T(s, dir, "documents"), "doc_id",
        Dedup.components(verifiedPairs(s, dir).select("id_a", "id_b")))),


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


    // ---- production-kernel twins of q16/q31: identical plan shape with
    //      the xxhash64 kernel swapped in for md5 (Dedup.Xx64). No SQL
    //      oracle (DuckDB has no xxhash64) → driver records a rows-only
    //      check; pair-set parity with the md5 kernel is asserted in
    //      DedupSpec, and the bench rows quantify the kernel speedup.
    //      NOTE q41 returns ~3× MORE pairs than q31 (and costs
    //      proportionally more): simhash bits are majority votes
    //      dominated by the corpus's highest-frequency tokens, so on
    //      this small-vocabulary synthetic corpus the per-bit 1-rates
    //      are far from 0.5 under EITHER kernel (measured at sf0.1:
    //      md5 ~10 of 32 bits ≥0.9 or ≤0.1, xx64 ~14), and the kernel
    //      that draws more near-unanimous bits has less effective
    //      entropy → more hamming-≤3 collisions. A property of 32-bit
    //      simhash on this corpus, not of the kernel: the production
    //      fix is more bits (64) or idf-weighted votes.
    "q40_neardup_pairs_xx64" -> ((s, dir) =>
      Dedup.verifiedNearDups(
        T(s, dir, "documents"), "text", "doc_id", threshold = 0.8,
        kind = Dedup.Xx64)),


    "q41_simhash_pairs_xx64" -> ((s, dir) =>
      Dedup.simhashNearDups(
        T(s, dir, "documents"), "text", "doc_id",
        bits = 32, blocks = 4, maxHamming = 3, kind = Dedup.Xx64,
        // same explicit 32-bit-entropy cap decision as q31 (xx64 draws
        // MORE near-unanimous bits: sf1 hottest bucket 14,848 postings
        // = 220M candidates; output 232,138 → 24,599,549 = 106× at
        // 10× — SimhashAudit, BASELINE.md r17 density audit)
        maxBucketPairs = 1_000_000_000L)),


    // ---- production-kernel twin of q74 (rows-only bench row, like
    //      q40/q41): xx64 window hashing on the full token-window
    //      volume — same plan, no md5. Span-set parity with Md5 is
    //      spec-pinned (DedupSpec duplicateSpans xx64 case). Xx64 is
    //      DETECTION-grade only; the scrub path stays on Md5
    //      (see scrubDuplicates scaladoc).
    "q78_dup_spans_xx64" -> ((s, dir) =>
      Dedup.duplicateSpans(T(s, dir, "documents"), "text", "doc_id", n = 3,
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
      Dedup.duplicateSpans(T(s, dir, "documents"), "text", "doc_id", n = 3)),


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


    // ---- north-star: EXACT all-pairs Jaccard join via prefix
    //      filtering (AllPairs/PPJoin family) — deterministic recall,
    //      no LSH misses; candidates come only from each doc's rarest
    //      shingles, so frequent-shingle posting lists never self-join.
    //      The oracle is a plain all-pairs Jaccard — checking the
    //      exactness guarantee itself, not a replay of the mechanics.
    "q88_exact_jaccard_pairs" -> ((s, dir) =>
      Dedup.prefixFilteredPairs(
        T(s, dir, "documents"), "text", "doc_id", threshold = 0.8)),


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


    // ---- north-star: SemDeDup — k-means partitions the embedding
    //      space, near-dup pruning runs only WITHIN each cluster
    //      (Σ|cluster|² pairs, cluster-keyed join — never corpus×corpus);
    //      keep = lowest id per semantic dup set.
    "q105_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(
        T(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, iters = 2, threshold = 0.15)),


    // ---- north-star: eval-set decontamination SCRUB — the action for
    //      q50's report: benchmark-overlapping n-gram spans are cut
    //      (broadcast bench hash set, map-side probe, narrow rebuild);
    //      the rest of a contaminated doc survives.
    "q108_decontaminate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0), "text", "doc_id",
        docs.filter(col("doc_id") % 50 === 0), "text", n = 4)
    }),


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


    // ---- production-kernel twin of q88 (rows-only bench row, like
    //      q40/q78): xx64 shingle hashing in the prefix join. The
    //      RESULT is provably IDENTICAL to q88 — the prefix theorem
    //      holds under ANY global total order (each kernel just
    //      induces a different one) and the verify stage compares
    //      shingle STRINGS — so this twin is equality-spec-pinned,
    //      not merely parity-checked.
    "q94_exact_jaccard_xx64" -> ((s, dir) =>
      Dedup.prefixFilteredPairs(
        T(s, dir, "documents"), "text", "doc_id", threshold = 0.8,
        kind = Dedup.Xx64)),


    // ---- north-star: exact-substring SCRUBBING — cut every duplicated
    //      3-token window except its first corpus-wide occurrence and
    //      rebuild the text (the keep-first action for q74's detector).
    "q75_span_scrub" -> ((s, dir) =>
      Dedup.scrubDuplicates(T(s, dir, "documents"), "text", "doc_id", n = 3)),


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
      val scrubbed = Dedup.scrubDuplicates(curated, "text", "doc_id", n = 3)
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
      Dedup.corpusLineDedup(
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
    }),


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


    "q16_neardup_pairs" ->
      s"""WITH $jaccardCtes
         |SELECT id_a, id_b, jaccard FROM vpairs""".stripMargin,


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
      s"""WITH s AS (SELECT doc_id, ${PortableSql.simhash("text", 32, DD)} AS sh FROM documents),
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


    // the EXACTNESS oracle: all pairs with Jaccard ≥ 0.8, computed with
    // no prefix/LSH mechanics at all — any miss in the prefix path
    // would surface here as a row-count/hash mismatch
    "q88_exact_jaccard_pairs" ->
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
         |WHERE round(it.i / (sa.n + sb.n - it.i), 6) >= 0.8""".stripMargin,


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
         |LEFT JOIN clsizes sz ON l.cluster_id = sz.cluster_id""".stripMargin,


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
