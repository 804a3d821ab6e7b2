package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}

/** tokenizer/LM slice of the [[SparkEntry]] registry — subword
  * tokenizers (BPE / WordPiece / unigram: train, encode, durable
  * models, packing, equity/coverage reports) and statistical language
  * models (unigram/bigram/Kneser-Ney/stupid-backoff NLL, held-out
  * scoring, perplexity buckets, vocab growth). Split out of
  * [[EntryText]] by family for maintainability (the r16
  * registry-split convention); entries and oracles are verbatim
  * registry content (no behavior change). */
private[graft] trait EntryTokenize extends EntryContext {

  protected def tokenizeQueries: Map[String, (SparkSession, String) => DataFrame] = Map(



    // ---- north-star: interpolated bigram LM NLL (KenLM-lite) — word
    //      ORDER enters the fluency fence; vocab-bounded count tables,
    //      one bigram explode + broadcast joins + per-doc mean.
    "q107_bigram_nll" -> ((s, dir) =>
      graft.ops.LanguageModel.bigramNll(
        T(s, dir, "documents"), "text", "doc_id", lambda = 0.75)),




    // ---- north-star: corpus unigram LM scoring (CCNet-style fence) —
    //      per-doc mean negative log-likelihood under the corpus's own
    //      token distribution; vocabulary broadcast, scoring narrow.
    "q68_unigram_nll" -> ((s, dir) =>
      graft.ops.LanguageModel.meanNegLogLik(
        T(s, dir, "documents"), "text", "doc_id")),




    // ---- north-star: held-out LM scoring — batch docs scored against
    //      the FROZEN corpus model with add-one smoothing (OOV-safe);
    //      the daily-ingest quality fence companion to q60's index.
    "q69_heldout_nll" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.LanguageModel.scoreHeldOut(
        graft.ops.LanguageModel.unigramCounts(
          docs.filter(col("doc_id") % 10 =!= 0), "text"),
        docs.filter(col("doc_id") % 10 === 0), "text", "doc_id")
    }),




    // ---- north-star: distributed BPE tokenizer training — ONE corpus
    //      pass builds the (word, count) vocabulary, then every merge
    //      iteration is vocab-bounded (pair agg + 1-row collect +
    //      narrow merge projection, checkpointed lineage).
    "q118_bpe_merges" -> ((s, dir) =>
      graft.ops.Bpe.train(T(s, dir, "documents"), "text", merges = 6)),




    // ---- north-star: BPE encoding with the learned merge list — the
    //      codegen kernel loops the (broadcast-as-literal) merge array
    //      per word; scan-speed, parity-pinned against the portable
    //      fold-of-replace form the oracle replays.
    "q119_bpe_encode" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val merges = graft.ops.Bpe.mergeList(
        graft.ops.Bpe.train(docs, "text", merges = 6))
      docs.select(col("doc_id"),
        graft.functions.GraftFunctions.bpeCount(s, col("text"), merges)
          .as("n_bpe_tokens"),
        graft.functions.GraftFunctions.tokenCount(s, col("text"))
          .as("n_ws_tokens"))
    }),




    // ---- north-star: BPE vocabulary — the token frequency table a
    //      tokenizer ships beside its merges; vocab-bounded after the
    //      one corpus word-count pass.
    "q123_bpe_vocab" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.Bpe.vocabulary(docs, "text",
        graft.ops.Bpe.mergeList(graft.ops.Bpe.train(docs, "text", 6)))
    }),




    // ---- north-star: DURABLE BPE model — train on the even half,
    //      publish the merge table as parquet, encode the odd half
    //      from the STORED model (the q69/q116 frozen-model lifecycle
    //      for the tokenizer).
    "q124_durable_bpe" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val modelDir = tmp("q124_bpe_model")
      graft.ops.Bpe.train(docs.filter(col("doc_id") % 2 === 0), "text", 6)
        .write.mode("overwrite").parquet(modelDir)
      val merges = graft.ops.Bpe.mergeList(s.read.parquet(modelDir))
      docs.filter(col("doc_id") % 2 =!= 0).select(col("doc_id"),
        graft.functions.GraftFunctions.bpeCount(s, col("text"), merges)
          .as("n_bpe_tokens"))
    }),




    // ---- north-star composition: tokenizer-aware sequence packing —
    //      q64's concat-and-chunk, but budgeted in the tokens the
    //      MODEL will see (the learned BPE), not whitespace words.
    "q125_bpe_pack" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val merges = graft.ops.Bpe.mergeList(
        graft.ops.Bpe.train(docs, "text", 6))
      graft.ops.Packing.packSequencesBy(docs,
        graft.functions.GraftFunctions.bpeCount(s, col("text"), merges),
        "lang", "doc_id", budget = 512L)
    }),




    // ---- north-star: tokenizer equity report — per-language
    //      compression (chars per BPE token) of the learned tokenizer;
    //      the fairness/efficiency audit run before shipping a vocab.
    "q126_tokenizer_report" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val merges = graft.ops.Bpe.mergeList(
        graft.ops.Bpe.train(docs, "text", 6))
      docs.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(graft.functions.GraftFunctions.tokenCount(s, col("text")))
            .as("ws_tokens"),
          sum(length(replace(col("text"), lit(" ")))).as("n_chars"),
          sum(graft.functions.GraftFunctions.bpeCount(s, col("text"), merges))
            .as("bpe_tokens"))
        .withColumn("chars_per_bpe_token",
          round(col("n_chars").cast("double") / col("bpe_tokens"), 6))
    }),




    // ---- north-star: unigram-LM (SentencePiece-style) tokenizer
    //      training — seed substrings → hard-EM Viterbi re-counts →
    //      prune; integer-micronat log-probs make every Viterbi
    //      comparison an exact integer sum, so the oracle replays
    //      training bit-for-bit (chained DP CTEs + recursive
    //      backtrace). One corpus pass; everything after is
    //      vocab-bounded.
    "q172_unigram_model" -> ((s, dir) =>
      graft.ops.Unigram.train(T(s, dir, "documents"), "text",
        maxPieceLen = 3, seedSize = 30, emIters = 2, keepSize = 12)),




    // ---- north-star: DURABLE unigram model — train on the even half,
    //      publish (piece, cnt, logp_micro) as parquet, encode the odd
    //      half from the STORED model (the q124 frozen-model lifecycle
    //      for the second tokenizer; odd-half-only characters exercise
    //      the deterministic UNK path).
    "q173_unigram_encode" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val modelDir = tmp("q173_unigram_model")
      graft.ops.Unigram.train(docs.filter(col("doc_id") % 2 === 0), "text",
          maxPieceLen = 3, seedSize = 30, emIters = 2, keepSize = 12)
        .write.mode("overwrite").parquet(modelDir)
      val model = graft.ops.Unigram.modelTable(s.read.parquet(modelDir))
      docs.filter(col("doc_id") % 2 =!= 0 && col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.unigramCount(s, col("text"), model)
            .as("n_unigram_tokens"))
    }),




    // ---- north-star: tokenizer equity report over BOTH tokenizers —
    //      per-language compression (chars per token) of the learned
    //      BPE AND unigram vocabularies side by side; the fairness
    //      audit that decides which tokenizer ships.
    "q174_tokenizer_equity2" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      // shared trained stems (the audioPairs convention): built once
      // per app run, untimed under the q174/q199 indexWarmers — the
      // bench row prices the equity REPORT, not a model re-training
      val bpeMerges = bpeMergesFull(s, dir)
      val uniModel = unigramModelFull(s, dir)
      docs.filter(col("text").isNotNull).groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(length(replace(col("text"), lit(" ")))).as("n_chars"),
          sum(graft.functions.GraftFunctions.bpeCount(s, col("text"), bpeMerges))
            .as("bpe_tokens"),
          sum(graft.functions.GraftFunctions.unigramCount(s, col("text"), uniModel))
            .as("unigram_tokens"))
        .withColumn("chars_per_bpe_token",
          round(col("n_chars").cast("double") / col("bpe_tokens"), 6))
        .withColumn("chars_per_unigram_token",
          round(col("n_chars").cast("double") / col("unigram_tokens"), 6))
    }),




    // ---- north-star: tokenizer coverage / OOV audit — per-language
    //      UNK-piece rate of the unigram model on HELD-OUT text (train
    //      even half, measure odd half: characters unique to the
    //      held-out side surface as UNK pieces). The coverage report a
    //      multilingual release reads before freezing a vocab. One
    //      piece-explode scan + a |langs|-group decomposable rollup.
    //      OOV is INJECTED constructively (every 11th held-out doc
    //      gains a token of characters absent from the corpus
    //      alphabet), so the UNK path is exercised and its per-lang
    //      rate is known by design.
    "q177_unigram_coverage" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      // shared held-out stem (trained once per app run, untimed under
      // the q177 indexWarmer — the bench row prices the coverage scan)
      val model = unigramModelEven(s, dir)
      val known = model.map(_._1)
      docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" zxz"))).otherwise(col("text")))
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        .select(col("lang"),
          explode(graft.functions.GraftFunctions.unigramPieces(
            s, col("word"), model)).as("piece"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_pieces"),
          sum(when(!col("piece").isInCollection(known), 1L).otherwise(0L))
            .as("n_unk"),
          countDistinct(col("piece")).as("n_distinct_pieces"))
        .withColumn("unk_rate",
          round(col("n_unk").cast("double") / col("n_pieces"), 6))
    }),




    // ---- north-star: CCNet-style perplexity bucketing — per-language
    //      head/middle/tail terciles by unigram-LM mean NLL (lowest
    //      perplexity = head). Rank ties break on doc_id; tercile
    //      boundaries are pure integer comparisons (3·(rn−1) vs cnt) —
    //      no float division, replays exactly. One per-lang window +
    //      a broadcast per-lang count join; NLL sums travel as exact
    //      integer micronats.
    "q185_perplexity_buckets" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val nll = graft.ops.LanguageModel.meanNegLogLik(docs, "text", "doc_id")
      val byLang = nll.join(docs.select("doc_id", "lang"), Seq("doc_id"))
      val cnt = byLang.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("nll"), col("doc_id"))
      byLang
        .withColumn("rn", row_number().over(w).cast("long"))
        .join(broadcast(cnt), Seq("lang"))
        .withColumn("bucket",
          when(lit(3) * (col("rn") - 1) < col("cnt"), "head")
            .when(lit(3) * (col("rn") - 1) < lit(2) * col("cnt"), "middle")
            .otherwise("tail"))
        .groupBy("lang", "bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(round(col("nll") * 1e6, 0).cast("long")).as("sum_nll_micro"),
          min(col("nll")).as("min_nll"),
          max(col("nll")).as("max_nll"))
    }),




    // ---- north-star: WordPiece trainer (Schuster & Nakajima 2012 —
    //      the third public tokenizer algorithm beside BPE and the
    //      unigram LM): the BPE merge loop with the LIKELIHOOD
    //      objective pc/(cl·cr); the oracle replays every round's
    //      symbol counts, pair counts, score argmax, and ##-aware
    //      merge application bit-identically.
    "q195_wordpiece_train" -> ((s, dir) =>
      graft.ops.WordPiece.train(T(s, dir, "documents"), "text", 6)),




    // ---- north-star: DURABLE WordPiece vocabulary — train on the
    //      even half, publish alphabet+merges as parquet, greedy-
    //      encode the odd half from the STORED vocab via the codegen
    //      kernel (the q124/q173 frozen-model lifecycle; longest-
    //      match-first with the whole-word [UNK] fallback).
    "q196_durable_wordpiece" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val even = docs.filter(col("doc_id") % 2 === 0)
      val modelDir = tmp("q196_wp_vocab")
      graft.ops.WordPiece.vocab(even, "text",
        graft.ops.WordPiece.train(even, "text", 6))
        .write.mode("overwrite").parquet(modelDir)
      val pieces = graft.ops.WordPiece.pieceList(s.read.parquet(modelDir))
      // text IS NOT NULL pins the row universe to the oracle's: its
      // string_split unnest silently drops null-text docs, so an
      // unfiltered Spark side would emit an extra null-count row
      docs.filter(col("doc_id") % 2 =!= 0 && col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.wordPieceCount(s, col("text"), pieces)
            .as("n_wp_tokens"))
    }),




    // ---- north-star: THREE-tokenizer equity report — q174 extended
    //      with the WordPiece column: per-language chars/token under
    //      BPE, unigram-LM, and greedy WordPiece side by side, all
    //      three trained on the same corpus in the same job. The
    //      fairness dashboard a multilingual pipeline publishes when
    //      CHOOSING its tokenizer, not just shipping one.
    "q199_tokenizer_equity3" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      // the three trained stems are SHARED with q174 (BPE + unigram)
      // and published once per app run — q199 prices the three-way
      // report, not three model re-trainings (r18 verdict finding #2)
      val bpeMerges = bpeMergesFull(s, dir)
      val uniModel = unigramModelFull(s, dir)
      val wpPieces = wpPiecesFull(s, dir)
      docs.filter(col("text").isNotNull).groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(length(replace(col("text"), lit(" ")))).as("n_chars"),
          sum(graft.functions.GraftFunctions.bpeCount(s, col("text"), bpeMerges))
            .as("bpe_tokens"),
          sum(graft.functions.GraftFunctions.unigramCount(s, col("text"), uniModel))
            .as("unigram_tokens"),
          sum(graft.functions.GraftFunctions.wordPieceCount(s, col("text"), wpPieces))
            .as("wp_tokens"))
        .withColumn("chars_per_bpe_token",
          round(col("n_chars").cast("double") / col("bpe_tokens"), 6))
        .withColumn("chars_per_unigram_token",
          round(col("n_chars").cast("double") / col("unigram_tokens"), 6))
        .withColumn("chars_per_wp_token",
          round(col("n_chars").cast("double") / col("wp_tokens"), 6))
    }),




    // ---- north-star: Heaps-law vocabulary growth — distinct word
    //      types vs corpus size at 10 ingestion-order checkpoints; a
    //      flattening curve means the crawl is re-reading itself. One
    //      (word -> first bucket) aggregation; everything after is
    //      buckets-bounded integers.
    "q200_vocab_growth" -> ((s, dir) =>
      graft.ops.TextOps.vocabularyGrowth(
        T(s, dir, "documents"), "text", "doc_id", buckets = 10)),




    // ---- north-star: Kneser–Ney bigram NLL — THE standard n-gram
    //      smoothing (absolute discount + continuation unigram); the
    //      "San Francisco" effect the q107 add-one interpolation
    //      cannot express. All model statistics are decomposable
    //      aggregations over the bigram TYPE table.
    "q206_kneser_ney" -> ((s, dir) =>
      graft.ops.LanguageModel.kneserNeyNll(
        T(s, dir, "documents"), "text", "doc_id", discount = 0.75)),




    // ---- north-star: stupid-backoff trigram NLL (Brants 2007) over a
    //      real train/heldout split — the web-scale unnormalized
    //      backoff beside q206's Kneser–Ney; the heldout side actually
    //      exercises all three backoff branches.
    "q248_stupid_backoff" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      graft.ops.LanguageModel.stupidBackoffNll(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", alpha = 0.4)
    })
  )

  protected def tokenizeOracles: Map[String, String] = Map(



    // unigram training replay: substring seed, two hard-EM Viterbi
    // rounds (integer-micronat DP chains + recursive backtraces),
    // count-based prune — the model arithmetic step for step
    "q172_unigram_model" ->
      s"""WITH RECURSIVE ${unigramTrainCtes(3, 30, 2, 12, 16)}
         |SELECT piece, cnt, logp_micro FROM ulpf""".stripMargin,




    // durable unigram replay: train chain restricted to the even half,
    // then ONE more segmentation chain over the odd half's distinct
    // words under the final model — storage must change nothing
    "q173_unigram_encode" ->
      s"""WITH RECURSIVE ${unigramTrainCtes(3, 30, 2, 12, 16, "WHERE doc_id % 2 = 0")},
         |ew AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS n, len(word) AS wl FROM (
         |    SELECT DISTINCT word FROM (
         |      SELECT unnest(string_split(text, ' ')) AS word
         |      FROM documents WHERE doc_id % 2 <> 0 AND text IS NOT NULL)))
         |${unigramSegCtes("en", "ew", "ulpf", 3, 16)},
         |upc AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS pc
         |        FROM enbt WHERE piece IS NOT NULL GROUP BY word)
         |SELECT dw.doc_id, CAST(sum(coalesce(p.pc, 0)) AS BIGINT)
         |    AS n_unigram_tokens
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |      FROM documents WHERE doc_id % 2 <> 0 AND text IS NOT NULL) dw
         |LEFT JOIN upc p ON p.word = dw.word
         |GROUP BY dw.doc_id""".stripMargin,




    // dual-tokenizer equity replay: the q126 BPE chain and the unigram
    // train+encode chains rolled up per language side by side
    "q174_tokenizer_equity2" -> {
      val k = 6
      s"""WITH RECURSIVE ${unigramTrainCtes(3, 30, 2, 12, 16)},
         |${bpeTrainCtes(k).stripPrefix("WITH ")},
         |ew AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS n, len(word) AS wl FROM (
         |    SELECT DISTINCT word FROM (
         |      SELECT unnest(string_split(text, ' ')) AS word
         |      FROM documents WHERE text IS NOT NULL)))
         |${unigramSegCtes("en", "ew", "ulpf", 3, 16)},
         |upc AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS pc
         |        FROM enbt WHERE piece IS NOT NULL GROUP BY word),
         |udoc AS (
         |  SELECT dw.doc_id, sum(coalesce(p.pc, 0)) AS un
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents WHERE text IS NOT NULL) dw
         |  LEFT JOIN upc p ON p.word = dw.word
         |  GROUP BY dw.doc_id),
         |base AS (
         |  SELECT d.doc_id, d.lang,
         |    len(replace(d.text, ' ', '')) AS ch,
         |    list_sum(list_transform(string_split(d.text, ' '), __w ->
         |      len(string_split(trim(${bpeMergedExpr(k)}, chr(1)),
         |        chr(1) || chr(1))))) AS bpe
         |  FROM documents d, ${(1 to k).map(i => s"b$i").mkString(", ")}
         |  WHERE d.text IS NOT NULL)
         |SELECT b.lang, count(*) AS n_docs,
         |  CAST(sum(b.ch) AS BIGINT) AS n_chars,
         |  CAST(sum(b.bpe) AS BIGINT) AS bpe_tokens,
         |  CAST(sum(u.un) AS BIGINT) AS unigram_tokens,
         |  round(CAST(sum(b.ch) AS DOUBLE) / sum(b.bpe), 6)
         |    AS chars_per_bpe_token,
         |  round(CAST(sum(b.ch) AS DOUBLE) / sum(u.un), 6)
         |    AS chars_per_unigram_token
         |FROM base b JOIN udoc u ON u.doc_id = b.doc_id
         |GROUP BY b.lang""".stripMargin
    },




    // coverage replay: the q173 train+encode chains over the
    // OOV-injected held-out text, pieces kept with their words,
    // UNK = piece absent from the final model table
    "q177_unigram_coverage" ->
      s"""WITH RECURSIVE ${unigramTrainCtes(3, 30, 2, 12, 16, "WHERE doc_id % 2 = 0")},
         |odocs AS MATERIALIZED (
         |  SELECT lang, CASE WHEN doc_id % 11 = 0 THEN text || ' zxz'
         |                    ELSE text END AS text
         |  FROM documents WHERE doc_id % 2 <> 0 AND text IS NOT NULL),
         |ew AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS n,
         |    len(word) AS wl FROM (
         |    SELECT DISTINCT word FROM (
         |      SELECT unnest(string_split(text, ' ')) AS word FROM odocs)))
         |${unigramSegCtes("en", "ew", "ulpf", 3, 16)},
         |wpieces AS MATERIALIZED (SELECT word, piece FROM enbt
         |                         WHERE piece IS NOT NULL),
         |docw AS (SELECT lang, word FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS word FROM odocs)
         |  WHERE len(word) >= 1),
         |pieces AS (SELECT d.lang, w.piece
         |           FROM docw d JOIN wpieces w ON w.word = d.word)
         |SELECT p.lang, count(*) AS n_pieces,
         |  CAST(sum(CASE WHEN m.piece IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unk,
         |  count(DISTINCT p.piece) AS n_distinct_pieces,
         |  round(CAST(sum(CASE WHEN m.piece IS NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*), 6) AS unk_rate
         |FROM pieces p LEFT JOIN ulpf m ON m.piece = p.piece
         |GROUP BY p.lang""".stripMargin,




    // WordPiece training replay: per-round symbol/pair aggregations,
    // the likelihood-score argmax (double of exact ints — identically
    // rounded), and the ##-aware merge, unrolled per rank
    "q195_wordpiece_train" -> {
      val k = 6
      s"""${wordPieceTrainCtes(k)}
         |${(1 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, left_sym, right_sym, " +
          s"merged_sym, pair_count, left_count, right_count FROM b$i")
        .mkString(" UNION ALL ")}""".stripMargin
    },




    // durable-WordPiece replay: train on the even half, vocabulary =
    // seeded alphabet + merged pieces, then the recursive greedy
    // longest-match walk over the odd half's distinct words (whole-
    // word [UNK] on a matchless position), summed back per doc
    "q196_durable_wordpiece" -> {
      val k = 6
      s"""${wordPieceTrainCtes(k, "WHERE doc_id % 2 = 0")},
         |tw AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |       FROM documents WHERE doc_id % 2 <> 0)${wordPieceEncodeCtes(k, "tw")}
         |SELECT t.doc_id, CAST(coalesce(sum(f.n), 0) AS BIGINT) AS n_wp_tokens
         |FROM tw t JOIN fin f ON f.word = t.word
         |GROUP BY t.doc_id""".stripMargin
    },




    // three-tokenizer equity replay: the q174 BPE+unigram chains plus
    // the "wp"-prefixed WordPiece train + greedy-walk chains, per-doc
    // WordPiece sums joined into the same per-language rollup
    "q199_tokenizer_equity3" -> {
      val k = 6
      s"""WITH RECURSIVE ${unigramTrainCtes(3, 30, 2, 12, 16)},
         |${bpeTrainCtes(k).stripPrefix("WITH ")},
         |${wordPieceTrainCtes(k, "", "wp").stripPrefix("WITH RECURSIVE ")},
         |ew AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS n, len(word) AS wl FROM (
         |    SELECT DISTINCT word FROM (
         |      SELECT unnest(string_split(text, ' ')) AS word
         |      FROM documents WHERE text IS NOT NULL)))
         |${unigramSegCtes("en", "ew", "ulpf", 3, 16)},
         |upc AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS pc
         |        FROM enbt WHERE piece IS NOT NULL GROUP BY word),
         |dw AS MATERIALIZED (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents WHERE text IS NOT NULL)${wordPieceEncodeCtes(k, "dw", 16, "wp")},
         |udoc AS (
         |  SELECT dw.doc_id, sum(coalesce(p.pc, 0)) AS un
         |  FROM dw LEFT JOIN upc p ON p.word = dw.word
         |  GROUP BY dw.doc_id),
         |wdoc AS (
         |  SELECT dw.doc_id, CAST(coalesce(sum(f.n), 0) AS BIGINT) AS wp
         |  FROM dw JOIN wpfin f ON f.word = dw.word
         |  GROUP BY dw.doc_id),
         |base AS (
         |  SELECT d.doc_id, d.lang,
         |    len(replace(d.text, ' ', '')) AS ch,
         |    list_sum(list_transform(string_split(d.text, ' '), __w ->
         |      len(string_split(trim(${bpeMergedExpr(k)}, chr(1)),
         |        chr(1) || chr(1))))) AS bpe
         |  FROM documents d, ${(1 to k).map(i => s"b$i").mkString(", ")}
         |  WHERE d.text IS NOT NULL)
         |SELECT b.lang, count(*) AS n_docs,
         |  CAST(sum(b.ch) AS BIGINT) AS n_chars,
         |  CAST(sum(b.bpe) AS BIGINT) AS bpe_tokens,
         |  CAST(sum(u.un) AS BIGINT) AS unigram_tokens,
         |  CAST(sum(w.wp) AS BIGINT) AS wp_tokens,
         |  round(CAST(sum(b.ch) AS DOUBLE) / sum(b.bpe), 6)
         |    AS chars_per_bpe_token,
         |  round(CAST(sum(b.ch) AS DOUBLE) / sum(u.un), 6)
         |    AS chars_per_unigram_token,
         |  round(CAST(sum(b.ch) AS DOUBLE) / sum(w.wp), 6)
         |    AS chars_per_wp_token
         |FROM base b JOIN udoc u ON u.doc_id = b.doc_id
         |JOIN wdoc w ON w.doc_id = b.doc_id
         |GROUP BY b.lang""".stripMargin
    },




    // vocab-growth replay: identical bucket arithmetic (double
    // division + floor), first-bucket-per-type aggregation, and the
    // buckets-bounded cumulative window
    "q200_vocab_growth" ->
      """WITH rows0 AS (SELECT doc_id, text FROM documents
        |               WHERE text IS NOT NULL),
        |mx AS (SELECT max(doc_id) AS mx FROM rows0),
        |words AS (SELECT doc_id,
        |    least(CAST(floor(doc_id * 10 / (mx + 1)) AS BIGINT), 9) AS b,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM rows0, mx),
        |pb AS (SELECT b, count(DISTINCT doc_id) AS n_docs,
        |         count(*) AS n_tokens FROM words GROUP BY b),
        |nt AS (SELECT b, count(*) AS n_new_types FROM (
        |    SELECT w, min(b) AS b FROM words GROUP BY w) GROUP BY b)
        |SELECT pb.b AS bucket, pb.n_docs, pb.n_tokens,
        |  coalesce(nt.n_new_types, 0) AS n_new_types,
        |  CAST(sum(pb.n_tokens) OVER (ORDER BY pb.b) AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(nt.n_new_types, 0)) OVER (ORDER BY pb.b)
        |    AS BIGINT) AS cum_types
        |FROM pb LEFT JOIN nt ON nt.b = pb.b""".stripMargin,




    "q68_unigram_nll" ->
      s"""WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |c AS (SELECT tok, count(*) AS c FROM e GROUP BY tok),
         |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c)
         |SELECT doc_id, round(avg(-ln(CAST(c AS DOUBLE) / n)), 6) AS nll
         |FROM e JOIN c USING (tok), n GROUP BY doc_id""".stripMargin,




    "q69_heldout_nll" ->
      s"""WITH m AS (SELECT unnest(string_split(text, ' ')) AS tok
         |           FROM documents WHERE doc_id % 10 != 0),
         |c AS (SELECT tok, count(*) AS c FROM m GROUP BY tok),
         |s AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM c),
         |b AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |      FROM documents WHERE doc_id % 10 = 0)
         |SELECT doc_id,
         |  round(avg(-ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) / (n + v))), 6) AS nll
         |FROM b LEFT JOIN c USING (tok), s GROUP BY doc_id""".stripMargin,




    // interpolated bigram NLL oracle: same smoothing arithmetic, the
    // bigram's context/next words recovered from the shingle string
    "q107_bigram_nll" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |m AS (SELECT doc_id, l FROM d WHERE len(l) >= 2),
         |u AS (SELECT unnest(l) AS token FROM d),
         |uc AS (SELECT token, count(*) AS c FROM u GROUP BY token),
         |st AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM uc),
         |bg AS (SELECT doc_id, unnest(${DD.shingles("l", 2)}) AS bgm FROM m),
         |bc AS (SELECT bgm, count(*) AS bc FROM bg GROUP BY bgm),
         |sc AS (SELECT g.doc_id,
         |    0.75 * (CAST(coalesce(b.bc, 0) + 1 AS DOUBLE) /
         |            (CAST(coalesce(u1.c, 0) AS DOUBLE) + st.v)) +
         |    (1.0 - 0.75) * (CAST(coalesce(u2.c, 0) + 1 AS DOUBLE) / (st.n + st.v)) AS p
         |  FROM bg g
         |  LEFT JOIN bc b USING (bgm)
         |  LEFT JOIN uc u1 ON u1.token = string_split(g.bgm, ' ')[1]
         |  LEFT JOIN uc u2 ON u2.token = string_split(g.bgm, ' ')[-1], st)
         |SELECT doc_id, round(avg(-ln(p)), 6) AS nll2 FROM sc GROUP BY doc_id""".stripMargin,




    // Kneser-Ney oracle: replay the absolute-discount + continuation
    // arithmetic from the same bigram TYPE table (w1/w2 recovered from
    // the shingle string, as q107)
    "q206_kneser_ney" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |m AS (SELECT doc_id, l FROM d WHERE len(l) >= 2),
         |bg AS (SELECT doc_id, unnest(${DD.shingles("l", 2)}) AS bgm FROM m),
         |bc AS (SELECT bgm, count(*) AS bc FROM bg GROUP BY bgm),
         |bt AS (SELECT bgm, bc, string_split(bgm, ' ')[1] AS w1,
         |         string_split(bgm, ' ')[-1] AS w2 FROM bc),
         |hist AS (SELECT w1, CAST(sum(bc) AS DOUBLE) AS h,
         |           CAST(count(*) AS DOUBLE) AS fert FROM bt GROUP BY w1),
         |cont AS (SELECT w2, CAST(count(*) AS DOUBLE) AS pre FROM bt GROUP BY w2),
         |tt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM bt),
         |sc AS (SELECT g.doc_id,
         |    greatest(CAST(t.bc AS DOUBLE) - 0.75, 0.0) / h.h +
         |    0.75 * h.fert / h.h * (c.pre / tt.b) AS p
         |  FROM bg g
         |  JOIN bt t USING (bgm)
         |  JOIN hist h ON h.w1 = t.w1
         |  JOIN cont c ON c.w2 = t.w2, tt)
         |SELECT doc_id, round(avg(-ln(p)), 6) AS nll_kn FROM sc GROUP BY doc_id""".stripMargin,




    // stupid-backoff replay: model-half n-gram count tables, heldout
    // trigram positions, the same three-branch CASE (α interpolated as
    // the exact Scala doubles so both engines score identical floats)
    "q248_stupid_backoff" -> {
      val a = 0.4
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l
         |  FROM documents WHERE text IS NOT NULL),
         |mdl AS (SELECT * FROM d WHERE doc_id % 2 = 0),
         |hld AS (SELECT * FROM d WHERE doc_id % 2 = 1),
         |tc AS (SELECT g, count(*) AS c3 FROM (
         |    SELECT unnest(${DD.shingles("l", 3)}) AS g FROM mdl
         |    WHERE len(l) >= 3) GROUP BY g),
         |bc AS (SELECT g, count(*) AS c2 FROM (
         |    SELECT unnest(${DD.shingles("l", 2)}) AS g FROM mdl
         |    WHERE len(l) >= 2) GROUP BY g),
         |uc AS (SELECT w, count(*) AS c1 FROM (
         |    SELECT unnest(l) AS w FROM mdl) GROUP BY w),
         |st AS (SELECT CAST(sum(c1) AS DOUBLE) AS n,
         |    CAST(count(*) AS DOUBLE) AS v FROM uc),
         |px AS (SELECT doc_id, tg,
         |    array_to_string(string_split(tg, ' ')[1:2], ' ') AS h12,
         |    array_to_string(string_split(tg, ' ')[2:3], ' ') AS g23,
         |    string_split(tg, ' ')[2] AS w2,
         |    string_split(tg, ' ')[3] AS w3
         |  FROM (SELECT doc_id, unnest(${DD.shingles("l", 3)}) AS tg
         |        FROM hld WHERE len(l) >= 3)),
         |sc AS (SELECT p.doc_id,
         |    CASE WHEN coalesce(t.c3, 0) > 0
         |      THEN CAST(t.c3 AS DOUBLE) / bh.c2
         |    WHEN coalesce(bg.c2, 0) > 0
         |      THEN $a * CAST(bg.c2 AS DOUBLE) / u2.c1
         |    ELSE ${a * a} * (coalesce(u3.c1, 0) + 1) / (st.n + st.v)
         |    END AS s
         |  FROM px p
         |  LEFT JOIN tc t ON t.g = p.tg
         |  LEFT JOIN bc bh ON bh.g = p.h12
         |  LEFT JOIN bc bg ON bg.g = p.g23
         |  LEFT JOIN uc u2 ON u2.w = p.w2
         |  LEFT JOIN uc u3 ON u3.w = p.w3, st)
         |SELECT doc_id, round(avg(-ln(s)), 6) AS nll_sb
         |FROM sc GROUP BY doc_id""".stripMargin
    },




    // BPE training replay: the v0…v6 merge chain, one row per rank
    "q118_bpe_merges" -> {
      val k = 6
      s"""${bpeTrainCtes(k)}
         |${(1 to k).map(i =>
            s"SELECT CAST($i AS BIGINT) AS rank, left_sym, right_sym, pair_count FROM b$i")
            .mkString("\nUNION ALL\n")}""".stripMargin
    },




    // BPE encoding replay: the same training chain learns b1…b6, then
    // every doc's words run the 6 padded replaces in rank order and
    // the surviving symbols are counted — the portable form of the
    // graft_bpe_count kernel
    "q119_bpe_encode" -> {
      val k = 6
      s"""${bpeTrainCtes(k)}
         |SELECT d.doc_id,
         |  CAST(list_sum(list_transform(string_split(d.text, ' '), __w ->
         |    len(string_split(trim(${bpeMergedExpr(k)}, chr(1)), chr(1) || chr(1))))) AS BIGINT)
         |    AS n_bpe_tokens,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_ws_tokens
         |FROM documents d, ${(1 to k).map(i => s"b$i").mkString(", ")}""".stripMargin
    },




    // BPE vocabulary replay: the trained chain's FINAL vocab state v6
    // already holds every word's surviving symbols — unnest and roll up
    "q123_bpe_vocab" -> {
      val k = 6
      s"""${bpeTrainCtes(k)}
         |SELECT symbol, CAST(sum(n) AS BIGINT) AS n_occurrences FROM (
         |  SELECT unnest(string_split(wsym, chr(1) || chr(1))) AS symbol, n
         |  FROM v$k)
         |GROUP BY symbol""".stripMargin
    },




    // durable BPE replay: train chain restricted to the even half,
    // encode chain over the odd half — storage must change nothing
    "q124_durable_bpe" -> {
      val k = 6
      s"""${bpeTrainCtes(k, "WHERE doc_id % 2 = 0")}
         |SELECT d.doc_id,
         |  CAST(list_sum(list_transform(string_split(d.text, ' '), __w ->
         |    len(string_split(trim(${bpeMergedExpr(k)}, chr(1)), chr(1) || chr(1))))) AS BIGINT)
         |    AS n_bpe_tokens
         |FROM documents d, ${(1 to k).map(i => s"b$i").mkString(", ")}
         |WHERE d.doc_id % 2 <> 0""".stripMargin
    },




    // tokenizer-aware packing replay: q64's running-sum chain with n =
    // the BPE count (training replay + 6 chained replaces per word)
    "q125_bpe_pack" -> {
      val k = 6
      s"""${bpeTrainCtes(k)},
         |t AS (SELECT d.doc_id, d.lang,
         |  CAST(list_sum(list_transform(string_split(d.text, ' '), __w ->
         |    len(string_split(trim(${bpeMergedExpr(k)}, chr(1)), chr(1) || chr(1))))) AS BIGINT) AS n
         |  FROM documents d, ${(1 to k).map(i => s"b$i").mkString(", ")}),
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




    // tokenizer-equity replay: the q119 per-doc encode rolled up per
    // language; compression = chars (spaces removed) per BPE token
    "q126_tokenizer_report" -> {
      val k = 6
      s"""${bpeTrainCtes(k)},
         |t AS (SELECT d.lang,
         |  len(string_split(d.text, ' ')) AS ws,
         |  len(replace(d.text, ' ', '')) AS ch,
         |  list_sum(list_transform(string_split(d.text, ' '), __w ->
         |    len(string_split(trim(${bpeMergedExpr(k)}, chr(1)), chr(1) || chr(1))))) AS bpe
         |  FROM documents d, ${(1 to k).map(i => s"b$i").mkString(", ")})
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
         |  CAST(sum(ch) AS BIGINT) AS n_chars,
         |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         |  round(CAST(sum(ch) AS DOUBLE) / sum(bpe), 6) AS chars_per_bpe_token
         |FROM t GROUP BY lang""".stripMargin
    },




    // perplexity-bucket replay: the q68 NLL chain (rounded 6dp both
    // engines), per-lang rank with doc_id tie-break, integer tercile
    // comparisons, micronat sums
    "q185_perplexity_buckets" ->
      s"""WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |           FROM documents),
         |c AS (SELECT tok, count(*) AS c FROM e GROUP BY tok),
         |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c),
         |nll AS (SELECT doc_id, round(avg(-ln(CAST(c AS DOUBLE) / n)), 6) AS nll
         |        FROM e JOIN c USING (tok), n GROUP BY doc_id),
         |r AS (SELECT d.lang, nll.doc_id, nll.nll,
         |        CAST(row_number() OVER (PARTITION BY d.lang
         |          ORDER BY nll.nll, nll.doc_id) AS BIGINT) AS rn,
         |        count(*) OVER (PARTITION BY d.lang) AS cnt
         |      FROM nll JOIN documents d ON d.doc_id = nll.doc_id)
         |SELECT lang,
         |  CASE WHEN 3*(rn-1) < cnt THEN 'head'
         |       WHEN 3*(rn-1) < 2*cnt THEN 'middle'
         |       ELSE 'tail' END AS bucket,
         |  count(*) AS n_docs,
         |  CAST(sum(CAST(round(nll*1000000, 0) AS BIGINT)) AS BIGINT)
         |    AS sum_nll_micro,
         |  min(nll) AS min_nll, max(nll) AS max_nll
         |FROM r GROUP BY 1, 2""".stripMargin
  )
}
