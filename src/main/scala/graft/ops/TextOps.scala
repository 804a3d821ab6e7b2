package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for LLM-training-data pipelines (north-star
 * extension; BASELINE.json). All are pure Column expressions — no UDFs —
 * so they stay inside whole-stage codegen and scale linearly with zero
 * shuffles: at 100 TB these run at scan speed.
 *
 * Every function is also expressible in ANSI SQL (the DuckDB oracle), so
 * each gets a hash-checked correctness query. That constraint drove two
 * choices: occurrence counting via `replace`-length deltas (identical in
 * every engine, no regex-dialect drift), and md5 as the only hash
 * primitive (bit-identical everywhere).
 */
object TextOps {

  /** Whitespace tokenization (single-space delimited corpus). */
  def tokens(c: Column): Column = split(c, " ")

  /** Token count — `size(split(text,' '))`. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish regex token count: alpha runs, digit runs, single
    * punctuation marks each count as one token. The pattern uses only
    * regex constructs with identical semantics in Java and RE2. */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Occurrences of literal `needle` via replace-length delta —
    * engine-portable (no regex at all), codegen-friendly. */
  def occurrencesPlain(c: Column, needle: String): Column =
    (length(c) - length(replace(c, lit(needle)))) / lit(needle.length)

  /** Language-ID stopword tables: tiny per-language marker words.
    * Space-padded so matches are whole-token. Order = tie-break priority. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " with "),
    "es" -> Seq(" el ", " los ", " con "),
    "de" -> Seq(" der ", " und ", " mit "),
    "fr" -> Seq(" le ", " les ", " avec "),
    "zh" -> Seq(" de4 ", " he2 ", " yu3 "))

  /** Score for one language = total marker occurrences in the padded,
    * lowercased text. */
  def langScore(c: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    markers.map(m => occurrencesPlain(padded, m)).reduce(_ + _)
  }

  /**
   * N-gram-heuristic language ID: argmax of marker scores with a fixed
   * priority order for ties, `und` (undetermined) when all scores are 0.
   * Expressed as a CASE chain so the DuckDB oracle is the literal same
   * expression.
   */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(c, ms) }
    val maxScore = greatest(scores.map(_._2): _*)
    val chain = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === maxScore, lit(lang)).otherwise(acc)
    }
    when(maxScore <= 0, lit("und")).otherwise(chain)
  }

  /**
   * Heuristic quality score in [0,1]: blend of length saturation,
   * mean word length sanity, and punctuation-density penalty.
   * Deterministic double arithmetic (identical expression both
   * engines). NULL text → NULL, guarded explicitly — the NULL-skipping
   * `least`/`when` chain would otherwise score a textless doc a
   * phantom 0.55 (see [[graft.functions.PortableSql.qualityScore]]).
   */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val nTok = tokenCount(c).cast("double")
    val meanWordLen = (nChars - (nTok - lit(1.0))) / nTok
    val lengthScore = least(nChars / lit(500.0), lit(1.0))
    val wordLenScore =
      when(meanWordLen >= 3.0 && meanWordLen <= 8.0, lit(1.0)).otherwise(lit(0.5))
    val punct = Seq(".", ",", "!", "?", ";")
      .map(p => occurrencesPlain(c, p))
      .reduce(_ + _)
      .cast("double")
    val punctScore = lit(1.0) - least(punct / nTok, lit(1.0))
    when(c.isNull, lit(null).cast("double")).otherwise(
      round(lit(0.4) * lengthScore + lit(0.3) * wordLenScore + lit(0.3) * punctScore, 6))
  }

  /** Document fingerprint: md5 of the casefolded, trimmed text. Identical
    * hex in every engine; use for exact-dup detection after
    * normalization. */
  def fingerprint(c: Column): Column = md5(lower(trim(c)))

  /** Production fingerprint: xxhash64 of the same normalization — no
    * cryptographic rounds, no hex materialization; equality semantics
    * identical for exact-dup grouping (64-bit collision odds are
    * negligible below ~10⁹ docs; use [[fingerprint]] when cross-engine
    * reproducibility matters more than scan speed). */
  def fingerprintFast(c: Column): Column = xxhash64(lower(trim(c)))

  /** N-word shingles (the MinHash input): overlapping n-grams of the
    * token array, joined with single spaces. PARITY/ORACLE REFERENCE
    * form — `transform` is CodegenFallback and the interpreted
    * evaluator re-splits the document once per shingle (O(tokens²) per
    * doc); every shingle-explode hot path uses the codegen kernel
    * [[graft.functions.TextKernels.wordShingles]] instead (identical
    * output array, spec-pinned). */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
  }

  /**
   * Boilerplate report: the top-k most frequent n-token windows with
   * their occurrence, document and source counts — what a pipeline
   * owner eyeballs BEFORE configuring the scrub (q74/q75/q108): which
   * templates dominate, and whether they are one source's navigation
   * chrome or corpus-wide. One explode ([[graft.functions.TextKernels
   * .wordShingles]] kernel) → one hash aggregation with map-side
   * partials (per-mapper combine collapses each window to one partial
   * row, so window TEXT ships once per mapper, not per occurrence) →
   * `TakeOrderedAndProject` for the k winners — never a full sort.
   *
   * Output: (window, n_occurrences, n_docs, n_sources), top `k` by
   * (occurrences desc, window asc).
   */
  def boilerplateReport(
      df: DataFrame,
      textCol: String,
      idCol: String,
      srcCol: String,
      n: Int,
      k: Int): DataFrame = {
    df.select(col(srcCol), col(idCol),
        explode(graft.functions.GraftFunctions
          .wordShingles(df.sparkSession, col(textCol), n)).as("window"))
      .groupBy("window")
      .agg(
        count(lit(1)).as("n_occurrences"),
        count_distinct(col(idCol)).as("n_docs"),
        count_distinct(col(srcCol)).as("n_sources"))
      .orderBy(col("n_occurrences").desc, col("window").asc)
      .limit(k)
  }

  /** Gopher-style repetition signal: the fraction of a document's
    * n-gram occurrences that are repeats of an earlier n-gram —
    * `1 − |distinct n-grams| / |n-grams|`. Boilerplate, SEO spam and
    * looping generations score high; use as a quality-filter fence.
    * Pure array arithmetic on the shingle list — scan speed, zero
    * shuffles. */
  def duplicateShingleRatio(c: Column, n: Int): Column = {
    val sh = wordShingles(c, n)
    // explicit NULL propagation: wordShingles' short-doc floor
    // (greatest, which SKIPS null args) turns NULL text into [""] and
    // would score it 0.0 — but the codegen kernel (nullSafeEval) and
    // the DuckDB oracle (len over a NULL list) both yield NULL
    when(c.isNull, lit(null).cast("double")).otherwise(
      round(
        lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"),
        6))
  }

  /** PII patterns, constrained to constructs with identical semantics
    * in Java regex (Spark) and RE2 (DuckDB oracle): character classes,
    * greedy `+`, bounded `{m,}`. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // Explicit whitespace class, not [^ ] and not [^\s]: a URL at
  // end-of-line must stop at the line break (matching past it would
  // swallow the newline and the next line's first word), and `\s`
  // itself is NOT portable — Java's includes vertical tab U+000B,
  // RE2's does not. The listed escapes mean the same thing in both.
  val urlPattern: String = "https?://[^ \\t\\n\\r\\f]+"

  /** PII/URL scrubbing for training corpora: replaces every URL, then
    * every email, with `token`. URLs go first so an address embedded in
    * a query string is swallowed by the URL match. `regexp_replace` is
    * codegen'd with a cached compiled pattern — scan speed. */
  def scrub(c: Column, token: String = "<scrubbed>"): Column =
    regexp_replace(
      regexp_replace(c, urlPattern, token),
      emailPattern, token)

  /** Occurrences of a regex pattern (for scrub-rate reporting). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Rolling-hash parameters (Rabin-Karp polynomial over char codes):
    * base B and modulus M, both small enough that the k-term sum stays
    * far below 2⁶³ in either engine. */
  val rollingB: Long = 257L
  val rollingM: Long = 1000003L

  /** Char codes of `c` as an array — decoded ONCE per row. The rolling
    * hash below indexes this array with O(1) `element_at`; calling
    * `substr(c, i, 1)` per position instead would re-walk the UTF8
    * string from the start each time (O(len) per extraction, O(len²·k)
    * per document — measured ~40 ms/doc on the fixture). */
  def charCodes(c: Column): Column =
    transform(split(c, ""), ch => ascii(ch))

  /** Per-position polynomial hash of the `k`-char gram starting at each
    * position (1-based): `Σ_j code(c[i+j])·B^(k−1−j) mod M`, over a
    * char-codes ARRAY column (see [[charCodes]]). The k terms are
    * unrolled flat — no incremental state — and the SAME arithmetic is
    * expressible verbatim in the DuckDB oracle. */
  def rollingHashesFromCodes(codes: Column, k: Int): Column = {
    // upper bound is an OVERFLOW fence, not taste: the unrolled sum
    // peaks at k·255·257^(k−1) before the mod — k = 7 stays under
    // Long.Max (5.2e17), k = 8 does not (1.5e20, an ANSI-mode throw
    // on high-codepoint input)
    require(k >= 2 && k <= 7, s"k must be in [2, 7] (overflow fence), got $k")
    // explicit short-input guard: element_at past the end THROWS under
    // ANSI mode, and sequence(1, 0) would generate a DESCENDING range —
    // a doc shorter than k simply has no k-grams
    when(
      size(codes) >= k,
      transform(
        sequence(lit(1), size(codes) - lit(k - 1)),
        i => (0 until k).map { j =>
          val pow = BigInt(rollingB).pow(k - 1 - j).toLong
          element_at(codes, i + lit(j)).cast("long") * lit(pow)
        }.reduce(_ + _) % rollingM))
      .otherwise(array().cast("array<long>"))
  }

  /**
   * Winnowing fingerprints (the MOSS scheme): from the rolling k-gram
   * hashes, keep the MINIMUM of every `w`-hash window, deduplicated.
   * Guarantees: any shared substring of length ≥ k+w−1 contributes at
   * least one SHARED fingerprint (detection), and an edit only disturbs
   * the fingerprints of windows overlapping it (locality) — the
   * rolling-hash dedup primitive that whole-doc digests can't provide.
   * Pure array arithmetic per document: zero shuffles; downstream
   * near-dup candidates come from the usual bucket join on the
   * exploded (doc, fingerprint) pairs — same scale shape as MinHash
   * bands.
   *
   * Runs through the custom Catalyst expression
   * [[graft.functions.WinnowingFingerprints]] (`graft_winnow`): ONE
   * primitive-loop eval per document. The Column/HOF formulation
   * ([[rollingHashesFromCodes]] + window mins) is kept as the portable
   * reference — it is the template for the DuckDB oracle SQL and the
   * parity check — but it is NOT the execution path: interpreted HOFs
   * pay per-element lambda dispatch and are one optimizer inlining away
   * from re-evaluating the upstream array per element (an O(len²·k)
   * per-doc blow-up, measured ~300× on the fixture corpus — the same
   * pathology documented at [[graft.ops.Dedup.minhashSignatures]]).
   *
   * Output: idCol + `fingerprints` array&lt;long&gt;.
   */
  def winnowingFingerprints(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      k: Int, w: Int): org.apache.spark.sql.DataFrame =
    df.select(
      col(idCol),
      graft.functions.GraftFunctions
        .winnow(df.sparkSession, col(textCol), k, w).as("fingerprints"))

  /** Window-min winnowing over a MATERIALIZED hash-array column — the
    * portable reference formulation (small inputs / parity tests only;
    * see [[winnowingFingerprints]] for why this is not the execution
    * path). */
  def winnowingFromHashes(h: Column, w: Int): Column = {
    require(w >= 1)
    when(
      size(h) >= 1,
      array_distinct(
        transform(
          sequence(lit(1), greatest(size(h) - lit(w - 1), lit(1))),
          t => array_min(slice(h, t, lit(w))))))
      .otherwise(array().cast("array<long>"))
  }

  /** Duplicated-line removal (the Gopher/CCNet intra-document cleanup):
    * keep each line's FIRST occurrence, preserving document order —
    * `array_distinct` is order-preserving in Spark (the DuckDB oracle
    * needs an explicit first-occurrence filter; its `list_distinct`
    * reorders). Pure array arithmetic at scan speed. */
  def dedupLines(c: Column): Column =
    concat_ws("\n", array_distinct(split(c, "\n")))

  /**
   * Feature hashing (the "hashing trick"): token → one of `dims` hash
   * buckets, term frequency per (doc, bucket). The fixed-width feature
   * space needs no vocabulary pass — the classic one-scan text
   * featurizer for linear quality models at corpus scale.
   *
   * Output is the SPARSE row form (idCol, feature_idx, tf) — directly
   * joinable/aggregable; assembling dense vectors is one further
   * groupBy the caller pays only if a model needs it. Plan: explode →
   * hash in a projection → ONE shuffle keyed (doc, bucket) with
   * map-side partial counts. Collisions sum into the shared bucket
   * (standard hashing-trick semantics). md5-derived bucket for oracle
   * parity, same [[Dedup.HashKind]] swap story as MinHash.
   */
  def hashedTermFrequencies(
      df: DataFrame, textCol: String, idCol: String, dims: Int): DataFrame = {
    require(dims >= 2, "feature space needs at least 2 buckets")
    df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .select(col(idCol),
        pmod(graft.ops.Dedup.Md5.base(col("__tok")), lit(dims.toLong)).as("feature_idx"))
      .groupBy(col(idCol), col("feature_idx"))
      .agg(count(lit(1)).as("tf"))
  }

  /**
   * Per-document quality SIGNALS beyond the q13 composite score — the
   * standard Gopher/C4-family fences, one scan-speed projection:
   *
   *  - `ttr` type-token ratio (distinct words / words; low = loops),
   *    derived from the n=1 shingle kernel;
   *  - `char_entropy` Shannon entropy in nats over code points
   *    ([[graft.functions.TextKernels.charEntropy]], codegen kernel;
   *    low = repeated chars / degenerate text);
   *  - `mean_word_len` (chars excluding the n−1 separators / words;
   *    junk corpora sit far from natural-language ~4–6);
   *  - `digit_ratio`, `upper_ratio` (char-class density fences).
   *
   * All rounded to 6 decimals (cross-engine float-sum association).
   * Zero shuffles — at 100 TB this runs at scan speed next to the
   * other corpus filters.
   */
  def qualitySignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val s = df.sparkSession
    val t = col(textCol)
    val len = length(t).cast("double")
    val nToks = graft.functions.GraftFunctions.tokenCount(s, t).cast("double")
    df.select(col(idCol),
      round(lit(1.0) - graft.functions.GraftFunctions.dupShingleRatio(s, t, 1), 6)
        .as("ttr"),
      round(graft.functions.GraftFunctions.charEntropy(s, t), 6)
        .as("char_entropy"),
      round((len - (nToks - lit(1.0))) / nToks, 6).as("mean_word_len"),
      round((len - length(regexp_replace(t, lit("[0-9]"), lit("")))) / len, 6)
        .as("digit_ratio"),
      round((len - length(regexp_replace(t, lit("[A-Z]"), lit("")))) / len, 6)
        .as("upper_ratio"))
  }

  /**
   * RAG-style document chunking: overlapping fixed-size token windows
   * (`chunkTokens` wide, consecutive chunks sharing `overlap` tokens),
   * the standard pre-embedding split for retrieval corpora. Output is
   * one row per (doc, chunk): `chunk_index`, `chunk_text`, `n_tokens`.
   *
   * Window starts step by `stride = chunkTokens − overlap`; the final
   * stride positions whose window would be fully contained in its
   * predecessor (start ≥ nTokens − overlap, start ≠ 0) are dropped, so
   * every emitted chunk contributes at least one new token and every
   * token appears in ≥ 1 chunk. The trailing chunk may be shorter than
   * `chunkTokens` (`n_tokens` carries the true width).
   *
   * Plan: pure narrow projection + explode — zero shuffles, stays in
   * whole-stage codegen; at 100 TB this is a scan-speed map whose
   * output volume is the (1 + overlap/stride)× token blow-up the
   * caller chose.
   */
  def chunkDocuments(
      df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): got $overlap of $chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    val starts = sequence(lit(0), greatest(n - overlap - 1, lit(0)), lit(stride))
    df.select(col(idCol),
        explode(transform(starts, s => struct(
          (s.cast("long") / stride).cast("long").as("chunk_index"),
          concat_ws(" ", slice(toks, s + 1, lit(chunkTokens))).as("chunk_text"),
          least(lit(chunkTokens), n - s).cast("long").as("n_tokens"))))
          .as("__c"))
      .select(col(idCol), col("__c.chunk_index"), col("__c.chunk_text"),
        col("__c.n_tokens"))
  }

  /**
   * Dense L2-normalized tf-idf vectors over the hashed feature space —
   * the TEXT-derived embedding: [[hashedTermFrequencies]] weighted by
   * `ln(N / df)` in the hashed space (standard hashing-trick practice:
   * colliding terms share one df), normalized, and assembled into a
   * fixed `dims`-wide `array<float>` ready for the embedding operators
   * ([[Similarity.bandedNeighbors]], k-means, ANN). This closes the
   * text→vector→cosine-near-dup path for corpora that ship no
   * embedding column.
   *
   * Plan: the tf shuffle, a dims-bounded df aggregation joined back as
   * a broadcast, a ONE-ROW corpus-size aggregate broadcast in, and one
   * per-doc assembly shuffle — nothing grows with the vocabulary.
   * Normalized weights are rounded to 6 decimals BEFORE the float
   * cast (both engines), so cross-engine float-sum association in the
   * norm cannot flip a stored component. Docs whose every feature has
   * zero idf (term in every doc) have no direction and are dropped.
   */
  def hashedTfidfVectors(
      df: DataFrame, textCol: String, idCol: String, dims: Int,
      vecCol: String = "tvec"): DataFrame = {
    val tf = hashedTermFrequencies(df, textCol, idCol, dims)
      .localCheckpoint() // feeds df-counts AND the weight projection
    // one row per (doc, bucket) ⇒ count(*) per bucket IS the doc freq
    val dfreq = tf.groupBy("feature_idx").agg(count(lit(1)).as("__df"))
    val nDocs = tf.agg(countDistinct(col(idCol)).cast("double").as("__n"))
    tf.join(broadcast(dfreq), Seq("feature_idx"))
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("feature_idx"),
        (col("tf") * log(col("__n") / col("__df"))).as("__w"))
      .groupBy(col(idCol))
      .agg(
        map_from_entries(collect_list(struct(col("feature_idx"), col("__w"))))
          .as("__m"),
        sqrt(sum(col("__w") * col("__w"))).as("__norm"))
      .filter(col("__norm") > 0)
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dims - 1L)),
          i => coalesce(round(element_at(col("__m"), i) / col("__norm"), 6),
            lit(0.0)))
          .cast("array<float>").as(vecCol))
  }

  /**
   * Vocabulary growth curve (Heaps'/Herdan's law, public): distinct
   * word types as a function of corpus size, measured at `buckets`
   * equal id-range checkpoints in ingestion order. The corpus-health
   * dial a crawl pipeline watches: a vocabulary that keeps growing at
   * the Heaps exponent is ingesting genuinely new content; a curve
   * that flattens early means the crawl is re-reading itself (and a
   * super-linear jag flags an encoding break or spam flood).
   *
   * Scale shape: a word contributes through its FIRST occurrence only
   * — one (word → min doc) aggregation over the exploded token stream,
   * then everything is buckets-bounded: per-bucket new-type counts,
   * per-bucket token counts, and one window over `buckets` rows for
   * the cumulative curve. All integers — replays exactly. Requires a
   * dense-ish id space (bucket = id·buckets/(max+1)); the id ORDER is
   * the ingestion order being measured.
   *
   * @return one row per non-empty bucket: (bucket, n_docs, n_tokens,
   *         n_new_types, cum_tokens, cum_types)
   */
  def vocabularyGrowth(
      df: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"need at least 2 checkpoints, got $buckets")
    val rows = df.filter(col(textCol).isNotNull)
    val mx = rows.agg(max(col(idCol)).as("__mx"))
    val words = rows
      .crossJoin(broadcast(mx))
      .select(col(idCol),
        least(floor(col(idCol) * buckets / (col("__mx") + 1)), lit(buckets - 1))
          .cast("long").as("__b"),
        explode(tokens(col(textCol))).as("__w"))
    val perBucket = words.groupBy("__b")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_tokens"))
    val newTypes = words.groupBy("__w").agg(min(col("__b")).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("n_new_types"))
    // single-partition window over the `buckets`-row rollup (bounded
    // by the bucket count, never the corpus)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
    perBucket.join(newTypes, Seq("__b"), "left_outer")
      .select(col("__b").as("bucket"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_types", sum(col("n_new_types")).over(w))
  }

  /**
   * Host-scoped boilerplate line removal — the CCNet/FineWeb-style
   * cleaner the window-based [[boilerplateReport]] diagnoses for:
   * lines appearing on ≥ `maxFrac` of a HOST's pages are navigation/
   * footer chrome, not content ("Home | About | Contact" repeats on
   * every page of ITS site — corpus-wide line dedup misses it when
   * each host words it differently, and keep-first would keep one
   * copy per host). Hosts with fewer than `minPages` pages are left
   * untouched (a 2-page host has no frequency signal).
   *
   * Scale shape: line identity is a per-(host, md5-line) DISTINCT-page
   * count joined back to the exploded lines — all aggregations
   * decomposable on (host, hash); the rebuild collects surviving
   * positions per doc (doc-bounded) and re-splits the text in one
   * narrow projection, the [[graft.ops.Spans.corpusLineDedup]]
   * rebuild contract.
   *
   * Output: (idCol, clean, n_before, n_after).
   */
  def hostBoilerplateScrub(
      df: DataFrame,
      textCol: String,
      idCol: String,
      hostCol: String,
      minPages: Long = 3L,
      maxFrac: Double = 0.5): DataFrame = {
    require(minPages >= 2, "minPages must be >= 2")
    require(maxFrac > 0 && maxFrac <= 1, "maxFrac must be in (0, 1]")
    val lines = df
      .select(col(idCol), col(hostCol).as("__host"),
        posexplode(split(col(textCol), "\n")))
      .select(col(idCol), col("__host"),
        (col("pos") + 1).cast("long").as("__p"), md5(col("col")).as("__h"))
      .localCheckpoint() // feeds the frequency table AND the rebuild
    val hostPages = df.groupBy(col(hostCol).as("__host"))
      .agg(countDistinct(col(idCol)).as("__np"))
    val boiler = lines
      .groupBy("__host", "__h")
      .agg(countDistinct(col(idCol)).as("__nl"))
      .join(hostPages, "__host")
      .filter(col("__np") >= minPages &&
        col("__nl").cast("double") >= lit(maxFrac) * col("__np"))
      .select("__host", "__h")
    val keptPos = lines
      .join(boiler, Seq("__host", "__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("__keep"))
    val arr = split(col(textCol), "\n")
    val keep = coalesce(col("__keep"), array().cast("array<bigint>"))
    df.join(keptPos, Seq(idCol), "left")
      .select(col(idCol),
        concat_ws("\n",
          transform(keep, i => element_at(arr, i.cast("int")))).as("clean"),
        size(arr).cast("long").as("n_before"),
        size(keep).cast("long").as("n_after"))
  }

  /**
   * Language confusability matrix — pairwise cosine of per-language
   * character-trigram profiles (the Cavnar & Trenkle 1994 n-gram
   * representation): language pairs whose character statistics are
   * near-indistinguishable are exactly where a lang-ID gate's errors
   * concentrate, so the matrix tells you which per-language corpora
   * are cross-contaminated BEFORE per-doc auditing.
   *
   * Profiles are (lang, trigram, count) rows — trigram-vocabulary-
   * bounded, never corpus-∝; the pair dot products ride ONE join keyed
   * on the trigram (fanout ≤ |langs| per key), norms are per-lang
   * integer sums. Everything is exact integers until sqrt and one
   * division (round 6).
   *
   * Output: (lang_a, lang_b, n_shared, cosine), lang_a < lang_b.
   */
  def langConfusability(
      df: DataFrame,
      textCol: String,
      langCol: String): DataFrame = {
    val tri = df
      .filter(col(textCol).isNotNull && col(langCol).isNotNull)
      .select(col(langCol).as("__lang"),
        explode(expr(
          s"transform(sequence(1, greatest(length($textCol) - 2, 0)), " +
            s"__i -> substring($textCol, __i, 3))")).as("__tg"))
    val prof = tri.groupBy("__lang", "__tg").agg(count(lit(1)).as("__c"))
      .localCheckpoint() // feeds dots AND norms
    val norms = prof.groupBy("__lang")
      .agg(sum(col("__c") * col("__c")).as("__n2"))
    val dots = prof.select(col("__lang").as("lang_a"), col("__tg"),
        col("__c").as("__ca"))
      .join(prof.select(col("__lang").as("lang_b"), col("__tg"),
        col("__c").as("__cb")), Seq("__tg"))
      .filter(col("lang_a") < col("lang_b"))
      .groupBy("lang_a", "lang_b")
      .agg(count(lit(1)).as("n_shared"), sum(col("__ca") * col("__cb")).as("__dot"))
    dots
      .join(broadcast(norms.withColumnRenamed("__lang", "lang_a")
        .withColumnRenamed("__n2", "__na")), "lang_a")
      .join(broadcast(norms.withColumnRenamed("__lang", "lang_b")
        .withColumnRenamed("__n2", "__nb")), "lang_b")
      .select(col("lang_a"), col("lang_b"), col("n_shared"),
        round(col("__dot") /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))), 6)
          .as("cosine"))
  }

  /**
   * Zipf-law fit over the frequency head (Zipf 1949; the companion of
   * [[vocabularyGrowth]]'s Heaps curve): least-squares slope of
   * `ln(freq)` against `ln(rank)` for the top `headSize` word types.
   * A healthy natural-language corpus slopes ≈ −1; a flatter head
   * means template/boilerplate flooding (many words artificially
   * equally frequent), a steeper one a degenerate vocabulary — the
   * corpus-shape diagnostic beside the growth curve.
   *
   * Fitting the HEAD is deliberate and standard (the tail bends away
   * from the power law and is Heaps-noise-dominated) — and it is what
   * makes the op scale-safe: ranking is a `TakeOrderedAndProject`
   * top-k of the (vocab-bounded) frequency table, never a global sort
   * of the vocabulary, and the regression runs over `headSize` rows.
   * Ties rank deterministically (count desc, word asc). The ln/product
   * sums are the only doubles (round 6 on the published stats, the
   * usual sum-order bound).
   *
   * Output: one row (n_fit, slope, intercept, r2).
   */
  def zipfFit(
      df: DataFrame,
      textCol: String,
      headSize: Int = 100): DataFrame = {
    require(headSize >= 3, "zipfFit needs at least 3 head ranks")
    val freqs = df
      .filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w").asc)
      .limit(headSize)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__n").desc, col("__w").asc)
    val xy = freqs
      .withColumn("__x", log(row_number().over(w).cast("double")))
      .withColumn("__y", log(col("__n").cast("double")))
    val s = xy.agg(
      count(lit(1)).cast("double").as("__k"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    val cov = col("__k") * col("__sxy") - col("__sx") * col("__sy")
    val varX = col("__k") * col("__sxx") - col("__sx") * col("__sx")
    val varY = col("__k") * col("__syy") - col("__sy") * col("__sy")
    s.select(
      col("__k").cast("long").as("n_fit"),
      round(cov / varX, 6).as("slope"),
      round((col("__sy") - (cov / varX) * col("__sx")) / col("__k"), 6)
        .as("intercept"),
      round((cov * cov) / (varX * varY), 6).as("r2"))
  }
}
