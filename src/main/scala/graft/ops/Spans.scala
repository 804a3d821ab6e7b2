package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup.{HashKind, Md5}

/**
 * Exact-substring SPAN dedup at token granularity — the
 * "deduplicating training data" family (Lee et al. ACL 2022): find
 * every exact n-token window duplicated across or within documents,
 * merge windows into maximal spans, scrub or score them, incrementally
 * against a standing window-hash index ([[graft.io.WindowIndex]]).
 * Split out of [[Dedup]] by the ~2k-line file cap (r19) — every member
 * VERBATIM from the pre-split object (no behavior change; callers
 * renamed `Dedup.x` → `Spans.x`).
 */
object Spans {
  /**
   * Exact-substring duplicate spans at token granularity — the
   * "deduplicating training data" primitive (find every exact n-token
   * window whose text occurs MORE THAN ONCE anywhere in the corpus —
   * other docs or elsewhere in the same doc — and merge each document's
   * duplicated windows into maximal token spans). Doc-level near-dup
   * (MinHash/SimHash) can't see a verbatim boilerplate paragraph inside
   * two otherwise-different documents; this can.
   *
   * Output: (idCol, span_start, span_end, n_windows) — token positions,
   * 1-based, end EXCLUSIVE; `n_windows` = duplicated n-gram windows the
   * span merged. Downstream policy (cut the span, drop the doc, keep
   * first occurrence) is the caller's.
   *
   * Plan shape and 100 TB behavior:
   *  1. one row per n-gram window position — ∝ corpus tokens, the
   *     irreducible price of EXACT substring dedup (a suffix array
   *     reads the same volume; this shape is shuffle-friendly instead
   *     of memory-resident) — materialized ONCE (`localCheckpoint`, the
   *     [[candidatePairs]] pattern) because it feeds both the dup-hash
   *     aggregation and the position probe; without it the semi-join
   *     re-runs the n-gram explode + hash over the whole corpus
   *     (measured 4× at sf0.1);
   *  2. windows carry only (id, pos, 128-bit hash) — never the n-gram
   *     text — so the dup-detection shuffle moves a constant ~48 bytes
   *     per token regardless of n;
   *  3. dup detection = `groupBy(hash).count > 1`, a DECOMPOSABLE
   *     aggregation: map-side partials collapse a hot hash (a license
   *     header repeated on a billion docs) per-mapper, and the
   *     semi-join back on the hash is a plain equi-join AQE's skew
   *     split can rewrite. A `count() over (partition by hash)` window
   *     would be one shuffle cheaper but is a scale hazard: a window
   *     partition cannot be split, so the hottest boilerplate n-gram
   *     — exactly what this operator exists to find — becomes one
   *     task's sorted partition;
   *  4. per-doc interval merge = ONE window function pass partitioned
   *     by doc (gaps-and-islands with a running max of window ends);
   *     doc size bounds that partition.
   *
   * Hashing goes through the [[HashKind]] seam: [[Md5]] (default) is
   * oracle-checkable; [[Xx64]] is the production kernel (same plan).
   */
  def duplicateSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      kind: HashKind = Md5): DataFrame = {
    val windows = windowPositions(df, textCol, idCol, n, kind).localCheckpoint()
    val dupHashes = windows
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select("__h")
    val dupWindows = windows
      .join(dupHashes, Seq("__h"), "left_semi")
      .select(col(idCol), col("pos"))
    mergeIslands(dupWindows, idCol, n)
  }

  /**
   * Incremental [[duplicateSpans]]: duplicated spans of a NEW BATCH of
   * documents, judged against batch ∪ indexed corpus, WITHOUT
   * re-hashing the corpus — the daily-ingest form
   * ([[graft.io.WindowIndex]] is the parquet-backed store; this is the
   * algorithm, mirroring the [[incrementalNearDups]] /
   * [[graft.io.SignatureIndex]] split).
   *
   * `indexCounts` holds per-hash occurrence counts of the already-
   * indexed corpus — columns (`hh`, `cnt`), possibly several rows per
   * hash (appends accrete; they are summed here). A batch window is
   * duplicated iff its hash's total count across batch + index exceeds
   * one; islands merge exactly as in [[duplicateSpans]]. Output ≡ the
   * full-corpus [[duplicateSpans]] restricted to batch docs (provided
   * the index covers corpus ∖ batch with the same (n, kind)).
   *
   * Scale shape: only the BATCH is hashed; the stored index is pruned
   * with a broadcast of the batch's distinct hashes (a map-side scan —
   * the index is never shuffled) and only the pruned remainder joins.
   */
  def incrementalDuplicateSpans(
      newDocs: DataFrame,
      indexCounts: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      kind: HashKind = Md5): DataFrame = {
    val batchWins = windowPositions(newDocs, textCol, idCol, n, kind).localCheckpoint()
    val batchCounts = batchWins
      .groupBy(col("__h")).agg(count(lit(1)).as("__bc"))
      .localCheckpoint() // feeds the index prune AND the dup decision
    val idxPruned = indexCounts
      .join(broadcast(batchCounts.select("__h")), col("hh") === col("__h"), "left_semi")
      .groupBy(col("hh")).agg(sum(col("cnt")).as("__ic"))
    val dupHashes = batchCounts
      .join(idxPruned, col("__h") === col("hh"), "left")
      .filter(col("__bc") + coalesce(col("__ic"), lit(0L)) > 1)
      .select("__h")
    val dupWindows = batchWins
      .join(dupHashes, Seq("__h"), "left_semi")
      .select(col(idCol), col("pos"))
    mergeIslands(dupWindows, idCol, n)
  }

  /**
   * Novelty scoring against a standing window-hash index — the
   * data-selection twin of [[incrementalDuplicateSpans]]: instead of
   * asking "which batch spans duplicate the corpus", ask per batch doc
   * "how much of this text is n-gram-NOVEL relative to the corpus"
   * (the high-signal docs a selection policy wants to keep; boilerplate
   * re-crawls score ~0). Output: (idCol, n_windows, n_novel,
   * novelty [rounded 6dp]) for every batch doc with ≥ n tokens.
   *
   * Same scale shape as the span probe: only the BATCH is hashed, the
   * index is pruned map-side by a broadcast of the batch's distinct
   * hashes and never reshuffled; novelty is judged against the CORPUS
   * only (batch-internal repeats stay novel — a deliberate contrast
   * with the span probe's batch∪index dup rule, since selection runs
   * BEFORE the batch itself is deduped).
   */
  def noveltyScores(
      newDocs: DataFrame,
      indexCounts: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      kind: HashKind = Md5): DataFrame = {
    val batchWins = windowPositions(newDocs, textCol, idCol, n, kind).localCheckpoint()
    val batchCounts = batchWins
      .groupBy(col("__h")).agg(count(lit(1)).as("__bc"))
      .localCheckpoint() // feeds the index prune AND the per-doc rollup
    val idxPruned = indexCounts
      .join(broadcast(batchCounts.select("__h")), col("hh") === col("__h"), "left_semi")
      .groupBy(col("hh")).agg(sum(col("cnt")).as("__ic"))
    val seen = batchCounts
      .join(idxPruned, col("__h") === col("hh"), "left")
      .select(col("__h"), (coalesce(col("__ic"), lit(0L)) > 0).as("__seen"))
    batchWins
      .join(seen, Seq("__h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("__seen"), 0L).otherwise(1L)).as("n_novel"))
      .select(col(idCol), col("n_windows"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_windows"), 6).as("novelty"))
  }

  /** Per-hash occurrence counts of `docs`' n-token windows: (hh, cnt)
    * — the build/append payload of [[graft.io.WindowIndex]]. One row
    * per DISTINCT window hash (∝ distinct n-grams, not tokens), via the
    * same decomposable aggregation as [[duplicateSpans]]' detection. */
  def windowHashCounts(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      kind: HashKind = Md5): DataFrame =
    windowPositions(docs, textCol, idCol, n, kind)
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("__h").as("hh"), col("cnt"))

  /** One row per n-token window: (idCol, pos [1-based long], __h).
    * Strict window semantics: docs with fewer than n tokens have no
    * windows (no short-doc floor — a 2-token doc cannot contain a
    * duplicated 3-token substring). */
  private def windowPositions(
      df: DataFrame, textCol: String, idCol: String, n: Int,
      kind: HashKind): DataFrame = {
    require(n >= 2 && n <= 64, "window width must be in [2, 64]")
    val toks = split(col(textCol), " ")
    df.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), size(col("__toks")) - lit(n - 1)),
          i => concat_ws(" ", slice(col("__toks"), i, lit(n))))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        kind.bucket(col("col")).as("__h"))
  }

  /** Gaps-and-islands merge of (idCol, pos) n-token windows into
    * maximal spans: a window starts a new span unless it overlaps or
    * touches the running max end of earlier windows in the doc. ONE
    * window-function pass partitioned by doc. */
  private def mergeIslands(
      dupWindows: DataFrame, idCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prior = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val running = Window.partitionBy(idCol).orderBy("pos")
    dupWindows
      .withColumn("__brk",
        when(col("pos") <= max(col("pos") + lit(n)).over(prior), lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__grp", sum(col("__brk")).over(running))
      .groupBy(col(idCol), col("__grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__grp")
  }

  /**
   * Exact-substring scrubbing — the ACTION for [[duplicateSpans]]:
   * remove every duplicated n-token window from the corpus EXCEPT its
   * first occurrence (canonical = smallest `(idCol, pos)` corpus-wide,
   * the deterministic keep-first policy), and rebuild each document's
   * text without the cut tokens.
   *
   * Output: (idCol, clean, n_tokens, n_removed) — `clean` is the
   * space-rejoined surviving tokens (may be empty when a doc is pure
   * boilerplate), `n_tokens` the original count, `n_removed` how many
   * tokens were cut. Every input doc keeps a row.
   *
   * Plan: window positions as in [[duplicateSpans]] (materialized once
   * — they feed the canonical aggregation AND the cut-set probe);
   * keep-first canonical per hash = `min(struct(id, pos))`, a
   * decomposable skew-immune aggregation (same reasoning as
   * [[duplicateSpans]] step 3 — a per-hash `row_number` window cannot
   * split the hottest boilerplate hash's partition), joined back on
   * the hash: a window is CUT iff its hash is duplicated and it is not
   * the canonical occurrence. Cut windows merge per doc (islands); the
   * rebuild is a narrow projection — token i survives iff no cut span
   * covers it, evaluated against the doc's own (bounded, merged) span
   * list.
   *
   * Use [[Md5]] (128-bit, default) for scrubbing. [[Xx64]] is a
   * DETECTION-grade kernel: at trillions of windows, 64-bit birthday
   * collisions are expected in the millions, and here a false hash
   * match irreversibly cuts unique legitimate text (in
   * [[duplicateSpans]] it only adds a spurious report row).
   */
  def scrubDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      kind: HashKind = Md5): DataFrame = {
    require(kind == Md5,
      "scrubbing requires the 128-bit Md5 kernel (xx64 is detection-grade: " +
        "a 64-bit birthday collision here irreversibly cuts legitimate text)")
    val windows = windowPositions(df, textCol, idCol, n, kind).localCheckpoint()
    val canon = windows
      .groupBy(col("__h"))
      .agg(
        min(struct(col(idCol).as("i"), col("pos").as("p"))).as("__first"),
        count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(col("__h"), col("__first"))
    val cut = windows
      .join(canon, Seq("__h"))
      .filter(col(idCol) =!= col("__first.i") || col("pos") =!= col("__first.p"))
      .select(col(idCol), col("pos"))
    rebuildScrubbed(df, cut, textCol, idCol, n)
  }

  /**
   * Benchmark decontamination scrub — the ACTION for
   * [[graft.ops.Search.contamination]]: every n-token window of a
   * corpus doc whose text appears anywhere in the benchmark set is cut
   * (islands-merged), and the doc is rebuilt without it — the standard
   * eval-set n-gram scrub (the GPT-3-style 13-gram recipe), keeping
   * the REST of a contaminated doc instead of dropping it wholesale.
   *
   * Scale shape: the benchmark's distinct window hashes are
   * benchmark-sized (≪ corpus) and BROADCAST into the probe join, so
   * corpus windows stream map-side and the corpus is never reshuffled
   * on a hash; the rebuild is the shared narrow projection. [[Md5]]
   * enforced — this path is destructive, and a 64-bit collision
   * against a benchmark gram would silently cut legitimate text.
   *
   * Output: (idCol, clean, n_tokens, n_removed) — one row per corpus
   * doc, including untouched ones.
   */
  def decontaminate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      kind: HashKind = Md5): DataFrame = {
    require(kind == Md5,
      "decontamination is destructive and requires the 128-bit Md5 kernel " +
        "(xx64 is detection-grade: a collision silently cuts legitimate text)")
    val benchH = bench
      .select(explode(array_distinct(graft.functions.GraftFunctions
        .wordShingles(bench.sparkSession, col(benchTextCol), n))).as("__w"))
      .select(kind.bucket(col("__w")).as("__h"))
      .distinct()
    val cut = windowPositions(df, textCol, idCol, n, kind)
      .join(broadcast(benchH), Seq("__h"))
      .select(col(idCol), col("pos"))
    rebuildScrubbed(df, cut, textCol, idCol, n)
  }

  /** Shared scrub tail: merge the cut windows into maximal spans and
    * rebuild every doc's text in a narrow projection (token survives
    * iff no cut span covers it). Every doc of `df` keeps a row. */
  private def rebuildScrubbed(
      df: DataFrame, cut: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    val spans = mergeIslands(cut, idCol, n)
      .groupBy(idCol)
      .agg(collect_list(struct(
        col("span_start").as("s"), col("span_end").as("e"))).as("__spans"))
    val toks = split(col(textCol), " ")
    val spansOrEmpty = coalesce(col("__spans"),
      array().cast("array<struct<s:bigint,e:bigint>>"))
    val keptToks = transform(
      filter(
        sequence(lit(1L), size(toks).cast("long")),
        i => !exists(spansOrEmpty, sp => i >= sp("s") && i < sp("e"))),
      i => element_at(toks, i.cast("int")))
    df.join(spans, Seq(idCol), "left")
      .select(
        col(idCol),
        concat_ws(" ", keptToks).as("clean"),
        size(toks).cast("long").as("n_tokens"),
        (size(toks).cast("long") - size(keptToks)).as("n_removed"))
  }

  /**
   * Incremental exact-substring scrubbing — [[scrubDuplicates]] for
   * the daily batch against a standing [[graft.io.WindowIndex]]:
   * completes the incremental family (detect = q77, select = q90,
   * scrub = this). Keep-first follows ARRIVAL order, which is what
   * production means by "first": the corpus was published before the
   * batch, so a window the corpus has seen is cut from EVERY batch
   * occurrence (the corpus copy is canonical even when a batch doc id
   * happens to sort lower), and a window new to the corpus keeps only
   * its first `(id, pos)` batch occurrence. Only the batch is hashed;
   * the index is pruned map-side by a broadcast of the batch's
   * distinct hashes, never reshuffled. Md5 only for the destructive
   * path (the [[scrubDuplicates]] collision caveat).
   */
  def incrementalScrub(
      newDocs: DataFrame,
      indexCounts: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      kind: HashKind = Md5): DataFrame = {
    val windows = windowPositions(newDocs, textCol, idCol, n, kind).localCheckpoint()
    val batchFirst = windows
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("i"), col("pos").as("p"))).as("__first"))
      .localCheckpoint() // feeds the index prune AND the cut decision
    val idxPruned = indexCounts
      .join(broadcast(batchFirst.select("__h")), col("hh") === col("__h"), "left_semi")
      .groupBy(col("hh")).agg(sum(col("cnt")).as("__ic"))
    val hashInfo = batchFirst
      .join(idxPruned, col("__h") === col("hh"), "left")
      .select(col("__h"), col("__first"),
        (coalesce(col("__ic"), lit(0L)) > 0).as("__inCorpus"))
    val cut = windows
      .join(hashInfo, Seq("__h"))
      .filter(col("__inCorpus") ||
        col(idCol) =!= col("__first.i") || col("pos") =!= col("__first.p"))
      .select(col(idCol), col("pos"))
    rebuildScrubbed(newDocs, cut, textCol, idCol, n)
  }

  /**
   * Corpus-level duplicated-line removal — the CCNet/RefinedWeb
   * paragraph dedup: keep each distinct line's FIRST corpus-wide
   * occurrence (canonical = smallest `(idCol, position)`), drop every
   * other occurrence — across documents and within them — and rebuild
   * each document from its surviving lines in order.
   * [[TextOps.dedupLines]] is the intra-document form; this is the
   * corpus-wide one that kills a boilerplate header/footer line shared
   * by millions of pages, which no single document can see.
   *
   * Output: (idCol, clean, n_before, n_after) — every input doc keeps
   * a row; a doc of pure boilerplate rebuilds to `''`.
   *
   * Plan ([[scrubDuplicates]]' shape at line granularity):
   *  1. one (id, pos, 128-bit line hash) row per line — the line TEXT
   *     never shuffles anywhere — materialized once
   *     (`localCheckpoint`: the frame feeds the canonical aggregation
   *     AND the keep-set probe);
   *  2. keep-first canonical per hash = `min(struct(id, pos))`, a
   *     DECOMPOSABLE aggregation: the hottest header line on a billion
   *     docs collapses map-side (never a window over the hash — an
   *     unsplittable partition under exactly this operator's target
   *     data shape), and the join back is AQE-splittable;
   *  3. rebuild = surviving positions collected per doc (bounded by
   *     doc size), then a NARROW projection re-splits the text and
   *     keeps the listed positions.
   *
   * Line identity is hash equality: [[Md5]] (128-bit, default) for
   * the destructive path; [[Xx64]] is detection-grade only (same
   * birthday-collision caveat as [[scrubDuplicates]]).
   */
  def corpusLineDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      kind: HashKind = Md5): DataFrame = {
    require(kind == Md5,
      "line dedup is destructive and requires the 128-bit Md5 kernel " +
        "(xx64 is detection-grade: a collision silently drops a unique line)")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        kind.bucket(col("col")).as("__h"))
      .localCheckpoint()
    val canon = lines
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("i"), col("pos").as("p"))).as("__first"))
    val keptPos = lines
      .join(canon, Seq("__h"))
      .filter(col(idCol) === col("__first.i") && col("pos") === col("__first.p"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__keep"))
    val arr = split(col(textCol), "\n")
    val keep = coalesce(col("__keep"), array().cast("array<bigint>"))
    df.join(keptPos, Seq(idCol), "left")
      .select(
        col(idCol),
        concat_ws("\n",
          transform(keep, i => element_at(arr, i.cast("int")))).as("clean"),
        size(arr).cast("long").as("n_before"),
        size(keep).cast("long").as("n_after"))
  }
}
