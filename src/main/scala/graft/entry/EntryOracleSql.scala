package graft

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD}
import graft.ops.Similarity
import graft.ops.Nsw

/** The engine-portable ORACLE SQL stems of the [[SparkEntry]] registry
  * — DuckDB CTE builders the family traits compose into `oracleSql`
  * twins (BM25/minhash/tokenizer-training chains, IVF/PQ replay, the
  * graph-ANN walk unrolls, media formula stems). Split out of
  * [[EntryContext]] by the ~2k-line registry-hygiene cap (r19):
  * every member is VERBATIM from the pre-split trait (no behavior
  * change — Registry keyset diff empty; [[EntryContext]] extends this
  * trait, so family traits see the same members). */
private[graft] trait EntryOracleSql {
  // ------------------------------------------------------------ oracleSql

  protected val custSchemaCols = "c_custkey, c_name, c_mktsegment, c_acctbal"

  /** DuckDB shingle list for documents.text (3-word shingles). */
  protected val duckToks = DD.tokens("text")

  /** Shared BM25 scoring CTEs (q51/q181): terms spark/hash/window,
    * k1 = 1.2, b = 0.75, ending in `sc(doc_id, bm25)`. Constants
    * appear as the same IEEE ops Spark's literals compute ((1.2 + 1.0),
    * not 2.2 — addition is deterministic, literal parsing of the
    * pre-summed decimal need not equal it). */
  protected def bm25Ctes: String = {
    val terms = Seq("spark", "hash", "window")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, __t -> __t = '$t')) AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    val score = terms.indices.map { i =>
      val tf = s"CAST(tf$i AS DOUBLE)"
      val dfT = s"CAST(df$i AS DOUBLE)"
      s"ln((CAST(n AS DOUBLE) - $dfT + 0.5) / ($dfT + 0.5) + 1.0) * ($tf * (1.2 + 1.0)) / " +
        s"($tf + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(len AS DOUBLE) / (CAST(sumlen AS DOUBLE) / CAST(n AS DOUBLE))))"
    }.mkString("(", " + ", ")")
    s"""t AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |f AS (SELECT doc_id, len(toks) AS len, $tfCols FROM t),
       |s AS (SELECT count(*) AS n, CAST(sum(len) AS BIGINT) AS sumlen, $dfCols FROM f),
       |sc AS (SELECT doc_id, round($score, 6) AS bm25 FROM f, s)""".stripMargin
  }
  protected val duckShingles = DD.shingles("toks", 3)

  /** DuckDB CTEs shared by the MinHash queries. */
  protected def minhashCtes: String = {
    val sigCols = (0 until 8)
      .map(i => s"${PortableSql.minhashSig("s", i, DD)} AS s$i").mkString(", ")
    val bandRows = (0 until 4).map { b =>
      val lo = 2 * b; val hi = 2 * b + 1
      s"SELECT doc_id, $b AS band, md5(concat(s$lo, '|', s$hi)) AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    s"""t AS (SELECT doc_id, $duckToks AS toks FROM documents),
       |sh AS (SELECT doc_id, $duckShingles AS s FROM t),
       |sig AS (SELECT doc_id, $sigCols FROM sh),
       |buckets AS ($bandRows)""".stripMargin
  }

  /** Shared CTE chain for the MinHash→LSH→Jaccard-verified near-dup
    * pipeline, ending in `vpairs(id_a, id_b, jaccard ≥ 0.8)` — used by
    * q16 (pairs) and q39 (clusters). */
  /** Candidate generation + exact overlap counts (`inter`/`sizes`) —
    * the shared stem of the Jaccard and containment oracles. */
  protected def lshInterCtes: String =
    s"""${minhashCtes},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |),
       |exsh AS (SELECT DISTINCT doc_id, unnest(s) AS sv FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM exsh GROUP BY doc_id),
       |inter AS (
       |  SELECT p.id_a, p.id_b, count(*) AS i
       |  FROM pairs p
       |  JOIN exsh ea ON ea.doc_id = p.id_a
       |  JOIN exsh eb ON eb.doc_id = p.id_b AND eb.sv = ea.sv
       |  GROUP BY p.id_a, p.id_b
       |)""".stripMargin

  protected def jaccardCtes: String =
    s"""$lshInterCtes,
       |vpairs AS (
       |  SELECT it.id_a, it.id_b, round(it.i / (sa.n + sb.n - it.i), 6) AS jaccard
       |  FROM inter it JOIN sizes sa ON sa.doc_id = it.id_a JOIN sizes sb ON sb.doc_id = it.id_b
       |  WHERE round(it.i / (sa.n + sb.n - it.i), 6) >= 0.8
       |)""".stripMargin

  /** DuckDB oracle CTE chain replaying [[graft.ops.Bpe.train]]
    * verbatim: `w` word counts, `v0` the char-symbol seeding (symbols
    * joined by the doubled `chr(1)` separator), then per merge rank i
    * the pair aggregation `p_i`, the deterministic winner `b_i`
    * (count desc, left asc, right asc — the exact Spark ordering), and
    * the merge application `v_i` via the SAME padded-`replace` both
    * engines share (leftmost non-overlapping = greedy BPE). */
  protected def bpeTrainCtes(k: Int, corpusWhere: String = ""): String = {
    val ss = "chr(1) || chr(1)"
    val sb = new StringBuilder
    sb ++=
      s"""WITH w AS (SELECT word, count(*) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word
         |        FROM documents $corpusWhere)
         |  GROUP BY word),
         |v0 AS (SELECT rtrim(regexp_replace(word, '(.)', '\\1' || $ss, 'g'), chr(1)) AS wsym, n
         |       FROM w)""".stripMargin
    for (i <- 1 to k) {
      val prev = s"v${i - 1}"
      sb ++=
        s""",
           |p$i AS MATERIALIZED (SELECT pair, sum(n) AS cnt FROM (
           |    SELECT n, unnest(list_transform(generate_series(1, len(l) - 1),
           |      __j -> l[__j] || chr(2) || l[__j + 1])) AS pair
           |    FROM (SELECT n, string_split(wsym, $ss) AS l FROM $prev))
           |  GROUP BY pair),
           |b$i AS (SELECT string_split(pair, chr(2))[1] AS left_sym,
           |         string_split(pair, chr(2))[2] AS right_sym,
           |         CAST(cnt AS BIGINT) AS pair_count
           |       FROM p$i ORDER BY cnt DESC, left_sym ASC, right_sym ASC LIMIT 1),
           |v$i AS (SELECT trim(replace(chr(1) || wsym || chr(1),
           |          chr(1) || b.left_sym || $ss || b.right_sym || chr(1),
           |          chr(1) || b.left_sym || b.right_sym || chr(1)), chr(1)) AS wsym, n
           |        FROM $prev, b$i b)""".stripMargin
    }
    sb.toString
  }

  /** DuckDB oracle CTE chain replaying [[graft.ops.WordPiece.train]]
    * verbatim — [[bpeTrainCtes]]'s loop with the WordPiece objective:
    * per rank i a symbol-count aggregation `sy_i`, the pair counts
    * `p_i`, the winner `b_i` by likelihood score `pc/(cl·cr)` (double
    * of exact ints — identically rounded in both engines; ties left
    * asc, right asc), and the merge application `v_i` where the fused
    * symbol drops the right side's `##` marker. Starts the WITH list
    * as RECURSIVE so [[wordPieceEncodeCtes]] can append its walk. */
  protected def wordPieceTrainCtes(
      k: Int, corpusWhere: String = "", pfx: String = ""): String = {
    val ss = "chr(1) || chr(1)"
    val sb = new StringBuilder
    sb ++=
      s"""WITH RECURSIVE ${pfx}w AS (SELECT word, count(*) AS n
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word
         |        FROM documents $corpusWhere)
         |  GROUP BY word),
         |${pfx}v0 AS MATERIALIZED (SELECT regexp_replace(rtrim(regexp_replace(word, '(.)',
         |         '##\\1' || $ss, 'g'), chr(1)), '^##', '') AS wsym, n
         |       FROM ${pfx}w)""".stripMargin
    for (i <- 1 to k) {
      val prev = s"${pfx}v${i - 1}"
      sb ++=
        s""",
           |${pfx}sy$i AS MATERIALIZED (SELECT sym, sum(n) AS cnt FROM (
           |    SELECT n, unnest(string_split(wsym, $ss)) AS sym FROM $prev)
           |  GROUP BY sym),
           |${pfx}p$i AS MATERIALIZED (SELECT pair, sum(n) AS cnt FROM (
           |    SELECT n, unnest(list_transform(generate_series(1, len(l) - 1),
           |      __j -> l[__j] || chr(2) || l[__j + 1])) AS pair
           |    FROM (SELECT n, string_split(wsym, $ss) AS l FROM $prev))
           |  GROUP BY pair),
           |${pfx}b$i AS MATERIALIZED (SELECT left_sym, right_sym, pair_count, left_count, right_count,
           |         left_sym || CASE WHEN right_sym LIKE '##%' THEN substr(right_sym, 3)
           |                          ELSE right_sym END AS merged_sym
           |       FROM (SELECT string_split(pair, chr(2))[1] AS left_sym,
           |               string_split(pair, chr(2))[2] AS right_sym,
           |               CAST(p.cnt AS BIGINT) AS pair_count,
           |               CAST(sl.cnt AS BIGINT) AS left_count,
           |               CAST(sr.cnt AS BIGINT) AS right_count
           |             FROM ${pfx}p$i p
           |             JOIN ${pfx}sy$i sl ON sl.sym = string_split(p.pair, chr(2))[1]
           |             JOIN ${pfx}sy$i sr ON sr.sym = string_split(p.pair, chr(2))[2])
           |       ORDER BY CAST(pair_count AS DOUBLE) /
           |           (CAST(left_count AS DOUBLE) * CAST(right_count AS DOUBLE)) DESC,
           |         left_sym ASC, right_sym ASC LIMIT 1),
           |${pfx}v$i AS MATERIALIZED (SELECT trim(replace(chr(1) || wsym || chr(1),
           |          chr(1) || b.left_sym || $ss || b.right_sym || chr(1),
           |          chr(1) || b.merged_sym || chr(1)), chr(1)) AS wsym, n
           |        FROM $prev, ${pfx}b$i b)""".stripMargin
    }
    sb.toString
  }

  /** Greedy WordPiece encode replay (appends to [[wordPieceTrainCtes]]):
    * `vocab` = training alphabet (every seeded piece of `v0`) + the k
    * merged pieces; the longest-match-first walk over `wordsCte`'s
    * DISTINCT words is UNROLLED as `maxW` chained step CTEs against a
    * precomputed per-(word, position) best-match-length table `wsub`
    * (each step consumes >= 1 char, so `maxW` >= the max word length
    * bounds the walk — 16 vs the fixture's 8, the q173 margin). A
    * matchless position kills the word to one [UNK] token (`fin`).
    * Deliberately NOT a recursive CTE: DuckDB 1.0 mis-evaluates
    * correlated lookups against MATERIALIZED CTEs inside recursion
    * (observed: every lookup NULL -> all words [UNK]), and without
    * materialization the chained train CTEs re-inline exponentially.
    * Character positions replay the kernel's code points exactly on
    * ASCII corpora (spec-pinned). */
  protected def wordPieceEncodeCtes(
      k: Int, wordsCte: String, maxW: Int = 16, pfx: String = ""): String = {
    val ss = "chr(1) || chr(1)"
    val merged = (1 to k).map(i => s"SELECT merged_sym FROM ${pfx}b$i").mkString(" UNION ")
    val sb = new StringBuilder
    sb ++=
      s""",
         |${pfx}walpha AS (SELECT DISTINCT unnest(string_split(wsym, $ss)) AS piece
         |           FROM ${pfx}v0 WHERE wsym <> ''),
         |${pfx}vocab AS (SELECT piece FROM ${pfx}walpha UNION $merged),
         |${pfx}vraw AS MATERIALIZED (SELECT piece, piece NOT LIKE '##%' AS init,
         |    CASE WHEN piece LIKE '##%' THEN substr(piece, 3) ELSE piece END AS raw
         |  FROM ${pfx}vocab),
         |${pfx}words AS MATERIALIZED (SELECT word, length(word) AS wl
         |  FROM (SELECT DISTINCT word FROM $wordsCte WHERE word <> '')),
         |${pfx}wsub AS MATERIALIZED (
         |  SELECT w.word, q.i AS pos, max(length(v.raw)) AS bl
         |  FROM ${pfx}words w
         |  JOIN (SELECT unnest(generate_series(1, $maxW)) AS i) q ON q.i <= w.wl
         |  JOIN ${pfx}vraw v ON v.init = (q.i = 1)
         |    AND substr(w.word, q.i, length(v.raw)) = v.raw
         |  GROUP BY w.word, q.i),
         |${pfx}g0 AS (SELECT word, wl, 1 AS pos, 0 AS np, FALSE AS dead FROM ${pfx}words)""".stripMargin
    for (j <- 1 to maxW) {
      sb ++=
        s""",
           |${pfx}g$j AS MATERIALIZED (
           |  SELECT g.word, g.wl,
           |    CASE WHEN g.pos > g.wl OR g.dead THEN g.pos
           |         ELSE g.pos + coalesce(s.bl, 1) END AS pos,
           |    CASE WHEN g.pos > g.wl OR g.dead THEN g.np ELSE g.np + 1 END AS np,
           |    CASE WHEN g.pos > g.wl THEN g.dead
           |         ELSE g.dead OR s.bl IS NULL END AS dead
           |  FROM ${pfx}g${j - 1} g LEFT JOIN ${pfx}wsub s
           |    ON s.word = g.word AND s.pos = g.pos)""".stripMargin
    }
    sb ++=
      s""",
         |${pfx}fin AS (SELECT word, CASE WHEN dead THEN 1 ELSE np END AS n
         |        FROM ${pfx}g$maxW)""".stripMargin
    sb.toString
  }

  /**
   * Viterbi-segmentation replay chain (q172+): DP over `wordCte`
   * (word, n, wl) under model `modelCte` (piece, lp) — integer
   * micronat scores, so every comparison is exact. Emits CTEs
   * `{p}sub` (end-position piece-score lookups), `{p}d0…{p}dW` (the
   * position-chained DP: best-score list `b`, chosen-length list `c`),
   * and `{p}bt` (recursive backtrace; piece rows have piece NOT NULL).
   * Starts with a comma — appends to an open WITH RECURSIVE list.
   */
  protected def unigramSegCtes(
      p: String, wordCte: String, modelCte: String,
      maxPieceLen: Int, maxW: Int): String = {
    val unk = graft.functions.UnigramKernels.UnkMicro
    val sb = new StringBuilder
    val eCols = (1 to maxPieceLen).map { l =>
      if (l == 1)
        s"(SELECT lp FROM $modelCte x WHERE x.piece = substr(q.word, q.i, 1)) AS e1"
      else
        s"CASE WHEN q.i >= $l THEN (SELECT lp FROM $modelCte x " +
          s"WHERE x.piece = substr(q.word, q.i - ${l - 1}, $l)) END AS e$l"
    }.mkString(",\n    ")
    sb ++=
      s""",
         |${p}sub AS MATERIALIZED (
         |  SELECT q.word, q.i,
         |    $eCols
         |  FROM (SELECT word, unnest(generate_series(1, wl)) AS i FROM $wordCte) q),
         |${p}d0 AS MATERIALIZED (SELECT word, n, wl, [CAST(0 AS BIGINT)] AS b,
         |           CAST([] AS INTEGER[]) AS c FROM $wordCte)""".stripMargin
    for (i <- 1 to maxW) {
      val cands = (1 to maxPieceLen).map { l =>
        if (l == 1) s"d.b[$i] + coalesce(s.e1, $unk) AS cand1"
        else if (l <= i) s"d.b[${i - l + 1}] + s.e$l AS cand$l"
        else s"CAST(NULL AS BIGINT) AS cand$l"
      }.mkString(", ")
      val bestArgs = (1 to maxPieceLen).map(l => s"cand$l").mkString(", ")
      val multi = (2 to maxPieceLen).map(l => s"cand$l").mkString(", ")
      val tie = (maxPieceLen to 2 by -1)
        .map(l => s"WHEN cand$l = best THEN $l").mkString(" ")
      sb ++=
        s""",
           |${p}d$i AS MATERIALIZED (
           |  SELECT word, n, wl,
           |    CASE WHEN wl >= $i THEN list_append(b, best) ELSE b END AS b,
           |    CASE WHEN wl >= $i
           |      THEN list_append(c, CASE $tie ELSE 1 END) ELSE c END AS c
           |  FROM (SELECT word, n, wl, b, c, greatest($bestArgs) AS best, $multi
           |        FROM (SELECT d.word, d.n, d.wl, d.b, d.c, $cands
           |              FROM ${p}d${i - 1} d LEFT JOIN ${p}sub s
           |                ON s.word = d.word AND s.i = $i) z1) z2)""".stripMargin
    }
    sb ++=
      s""",
         |${p}bt AS (
         |  SELECT word, n, c, wl AS i, CAST(NULL AS VARCHAR) AS piece FROM ${p}d$maxW
         |  UNION ALL
         |  SELECT word, n, c, i - c[i], substr(word, i - c[i] + 1, c[i])
         |  FROM ${p}bt WHERE i > 0)""".stripMargin
    sb.toString
  }

  /**
   * Unigram-LM training replay (q172+), mirroring
   * [[graft.ops.Unigram.train]] step for step: substring seed → hard-EM
   * Viterbi re-counts (one [[unigramSegCtes]] chain per round) → prune
   * → `ulpf` (piece, cnt, logp_micro). Must open under WITH RECURSIVE
   * (the backtrace CTEs recurse).
   */
  protected def unigramTrainCtes(
      maxPieceLen: Int, seedSize: Int, emIters: Int, keepSize: Int,
      maxWordLen: Int, corpusWhere: String = ""): String = {
    val sb = new StringBuilder
    sb ++=
      s"""uw AS MATERIALIZED (SELECT word, count(*) AS n FROM (
         |    SELECT unnest(string_split(text, ' ')) AS word
         |    FROM documents $corpusWhere)
         |  GROUP BY word),
         |uwf AS MATERIALIZED (SELECT word, CAST(n AS BIGINT) AS n, len(word) AS wl
         |        FROM uw WHERE len(word) BETWEEN 1 AND $maxWordLen),
         |usubs AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM (
         |    SELECT n, unnest(flatten(list_transform(generate_series(1, wl), __s ->
         |      list_transform(generate_series(__s, least(__s + ${maxPieceLen - 1}, wl)),
         |        __e -> substr(word, __s, __e - __s + 1))))) AS piece
         |    FROM uwf)
         |  GROUP BY piece),
         |usingles AS MATERIALIZED (SELECT piece, cnt FROM usubs WHERE len(piece) = 1),
         |um0 AS MATERIALIZED (SELECT piece, cnt FROM usingles
         |        UNION ALL SELECT piece, cnt FROM (
         |          SELECT piece, cnt FROM usubs WHERE len(piece) > 1
         |          ORDER BY cnt DESC, piece ASC LIMIT $seedSize)),
         |ulp0 AS MATERIALIZED (SELECT piece, cnt,
         |    CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1000000) AS BIGINT) AS lp
         |  FROM um0, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM um0) t)""".stripMargin
    for (k <- 1 to emIters) {
      sb ++= unigramSegCtes(s"ue$k", "uwf", s"ulp${k - 1}", maxPieceLen, maxWordLen)
      sb ++=
        s""",
           |ucnt$k AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
           |  FROM ue${k}bt WHERE piece IS NOT NULL GROUP BY piece),
           |um$k AS MATERIALIZED (
           |  SELECT s.piece, greatest(coalesce(cc.cnt, 0), 1) AS cnt
           |  FROM usingles s LEFT JOIN ucnt$k cc ON cc.piece = s.piece
           |  UNION ALL
           |  SELECT p.piece, cc.cnt
           |  FROM ulp${k - 1} p JOIN ucnt$k cc ON cc.piece = p.piece
           |  WHERE len(p.piece) > 1),
           |ulp$k AS MATERIALIZED (SELECT piece, cnt,
           |    CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1000000) AS BIGINT) AS lp
           |  FROM um$k, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM um$k) t)""".stripMargin
    }
    sb ++=
      s""",
         |ufin AS MATERIALIZED (SELECT piece, cnt FROM ulp$emIters WHERE len(piece) = 1
         |         UNION ALL SELECT piece, cnt FROM (
         |           SELECT piece, cnt FROM ulp$emIters WHERE len(piece) > 1
         |           ORDER BY cnt DESC, piece ASC LIMIT $keepSize)),
         |ulpf AS MATERIALIZED (SELECT piece, CAST(cnt AS BIGINT) AS cnt,
         |    CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1000000) AS BIGINT)
         |      AS logp_micro,
         |    CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1000000) AS BIGINT) AS lp
         |  FROM ufin, (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM ufin) t)""".stripMargin
    sb.toString
  }

  /** Per-word BPE encode expression over the learned b1…bk CTE rows:
    * seed chars (doubled chr(1) separators), then the k merges applied
    * in rank order as padded replaces — the portable twin of
    * `graft_bpe_count` (q119/q124). */
  protected def bpeMergedExpr(k: Int): String = {
    val seed = "chr(1) || rtrim(regexp_replace(__w, '(.)', '\\1' || chr(1) || chr(1), 'g'), chr(1)) || chr(1)"
    (1 to k).foldLeft(seed) { (acc, i) =>
      s"""replace($acc,
         |  chr(1) || b$i.left_sym || chr(1) || chr(1) || b$i.right_sym || chr(1),
         |  chr(1) || b$i.left_sym || b$i.right_sym || chr(1))""".stripMargin
    }
  }

  /** DuckDB oracle for exact-substring duplicate spans — the same
    * gaps-and-islands construction as the Spark plan: windows whose md5
    * occurs >1 time anywhere in the corpus, merged per doc on
    * overlap-or-touch. `finalWhere` filters the final span rows (empty
    * for the full corpus, q74; a doc predicate for the incremental
    * probe, q77 — dup-ness itself is ALWAYS judged corpus-wide). */
  protected def dupSpansSql(
      finalWhere: String, n: Int = 3, corpusWhere: String = ""): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents $corpusWhere),
       |u AS (SELECT doc_id,
       |        unnest(generate_series(1, len(toks) - ${n - 1})) AS pos, toks
       |      FROM t WHERE len(toks) >= $n),
       |h AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |        md5(array_to_string(toks[pos:pos + ${n - 1}], ' ')) AS hh
       |      FROM u),
       |d AS (SELECT hh FROM h GROUP BY hh HAVING count(*) > 1),
       |m AS (SELECT doc_id, pos FROM h JOIN d USING (hh)),
       |i AS (SELECT doc_id, pos,
       |        CASE WHEN pos <= max(pos + $n) OVER (PARTITION BY doc_id
       |          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |        THEN 0 ELSE 1 END AS brk
       |      FROM m),
       |g AS (SELECT doc_id, pos, CAST(sum(brk) OVER (PARTITION BY doc_id
       |        ORDER BY pos) AS BIGINT) AS grp FROM i)
       |SELECT doc_id, min(pos) AS span_start, max(pos) + $n AS span_end,
       |  count(*) AS n_windows
       |FROM g $finalWhere GROUP BY doc_id, grp""".stripMargin

  /** DuckDB CTE chain for exact-substring scrubbing (q75's shape) over
    * `src(doc_id, text)`: windows → keep-first marking (row_number per
    * hash) → cut set → merged spans → rebuild (token i survives iff no
    * span covers it). Ends in `sc_clean(doc_id, clean, n_tokens,
    * n_removed)`; all CTE names are `sc_`-prefixed so the chain
    * composes with the jaccard/closure/packing CTEs (q76). Shared by
    * q75 and q76 so their scrub semantics can never desynchronize. */
  protected def scrubCtes(src: String, n: Int): String = scrubCtesWith(src, n,
    s"""sc_mk AS (SELECT doc_id, pos,
       |         row_number() OVER (PARTITION BY hh ORDER BY doc_id, pos) AS rn,
       |         count(*) OVER (PARTITION BY hh) AS c
       |       FROM sc_h),
       |sc_cut AS (SELECT doc_id, pos FROM sc_mk WHERE c > 1 AND rn > 1)""".stripMargin)

  /** [[scrubCtes]] with a caller-supplied cut rule: `cutCtes` must end
    * in `sc_cut(doc_id, pos)` over the window frame `sc_h(doc_id, pos,
    * hh)`; the islands merge + narrow rebuild tail is shared verbatim
    * (q75/q76 keep-first vs q108 benchmark-match can never drift). */
  protected def scrubCtesWith(src: String, n: Int, cutCtes: String): String =
    s"""sc_t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $src),
       |sc_u AS (SELECT doc_id,
       |        unnest(generate_series(1, len(toks) - ${n - 1})) AS pos, toks
       |      FROM sc_t WHERE len(toks) >= $n),
       |sc_h AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |        md5(array_to_string(toks[pos:pos + ${n - 1}], ' ')) AS hh
       |      FROM sc_u),
       |$cutCtes,
       |sc_i AS (SELECT doc_id, pos,
       |        CASE WHEN pos <= max(pos + $n) OVER (PARTITION BY doc_id
       |          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |        THEN 0 ELSE 1 END AS brk
       |      FROM sc_cut),
       |sc_g AS (SELECT doc_id, pos, CAST(sum(brk) OVER (PARTITION BY doc_id
       |        ORDER BY pos) AS BIGINT) AS grp FROM sc_i),
       |sc_sp AS (SELECT doc_id, min(pos) AS s, max(pos) + $n AS e
       |       FROM sc_g GROUP BY doc_id, grp),
       |sc_sl AS (SELECT doc_id, list(s ORDER BY s) AS ss, list(e ORDER BY s) AS ee
       |       FROM sc_sp GROUP BY doc_id),
       |sc_k AS (SELECT t.doc_id, t.toks,
       |        list_filter(generate_series(1, len(t.toks)), __i ->
       |          len(list_filter(generate_series(1, coalesce(len(sl.ss), 0)),
       |            __j -> __i >= sl.ss[__j] AND __i < sl.ee[__j])) = 0) AS kept
       |      FROM sc_t t LEFT JOIN sc_sl sl USING (doc_id)),
       |sc_clean AS (SELECT doc_id,
       |  -- coalesce: DuckDB's array_to_string of an empty list is NULL,
       |  -- Spark's concat_ws is '' — a fully-scrubbed doc must agree
       |  coalesce(array_to_string(list_transform(kept, __i -> toks[__i]), ' '),
       |           '') AS clean,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
       |FROM sc_k)""".stripMargin

  /** Recursive-CTE transitive closure + min-label clustering over a
    * pair CTE with (id_a, id_b) columns — shared by q39/q47 (over
    * [[jaccardCtes]]'s `vpairs`) and q59 (over [[embPairCtes]]'s `p`)
    * so the closure semantics can never desynchronize between their
    * oracles. Ends in `labels(doc_id, cluster_id)`. */
  /** DuckDB oracle for the trained-IVF probe (q61) — reused verbatim by
    * q97 (the durable [[graft.io.VectorIndex]] probe must return the
    * identical result through the storage round-trip) and, with a scan
    * filter, by q99 (deletion leaves the quantizer and probe ranking
    * untouched; only the scored lists shrink). */
  /** Shared k-means-training + list-assignment CTE prefix of the
    * trained-IVF oracles (q61/q97/q99 single-query, q102/q104 batch):
    * ends in `c1` (trained centroids) and `alist(vec_id, list_id)`. */
  protected def ivfTrainCtes(dims: Int, src: String = "embeddings"): String = {
    def assignCte(cents: String) =
      s"""SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${duckCosine("e.embedding", "c.cemb", dims)} DESC, c.cid ASC) AS rn
         |    FROM $src e CROSS JOIN $cents c""".stripMargin
    s"""c0 AS (SELECT CAST(vec_id AS BIGINT) AS cid,
       |            list_transform(embedding, __x -> CAST(__x AS DOUBLE)) AS cemb
       |            FROM $src ORDER BY vec_id LIMIT 8),
       |a0 AS (SELECT vec_id, cid AS cluster FROM (${assignCte("c0")}) WHERE rn = 1),
       |m1 AS (SELECT a0.cluster, d.d, round(avg(CAST(e.embedding[d.d] AS DOUBLE)), 6) AS v
       |       FROM a0 JOIN $src e USING (vec_id), generate_series(1, $dims) d(d)
       |       GROUP BY a0.cluster, d.d),
       |cm AS (SELECT cluster AS cid, list(v ORDER BY d) AS cemb FROM m1 GROUP BY cluster),
       |c1 AS (SELECT c0.cid, coalesce(cm.cemb, c0.cemb) AS cemb
       |       FROM c0 LEFT JOIN cm ON c0.cid = cm.cid),
       |alist AS (SELECT vec_id, cid AS list_id FROM (${assignCte("c1")}) WHERE rn = 1)"""
      .stripMargin
  }

  protected def ivfTrainedSql(scanWhere: String = ""): String = {
    val dims = 64
    s"""WITH ${ivfTrainCtes(dims)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT cid AS list_id FROM (
       |    SELECT c.cid, row_number() OVER (
       |      ORDER BY ${duckCosine("c.cemb", "q.qe", dims)} DESC, c.cid ASC) AS rn
       |    FROM c1 c, q) WHERE rn <= 2),
       |s AS (SELECT e.vec_id, ${duckCosine("e.embedding", "q.qe", dims)} AS cosine_sim
       |      FROM embeddings e
       |      JOIN alist a ON e.vec_id = a.vec_id
       |      JOIN probe p ON a.list_id = p.list_id, q $scanWhere)
       |SELECT vec_id, cosine_sim FROM s ORDER BY cosine_sim DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Multi-query trained-IVF oracle (q102; reused verbatim by q104 —
    * the durable batch probe must equal the in-memory pipeline through
    * the storage round-trip): same training CTEs, then every query
    * ranks its own nprobe lists and its own candidates. The Spark
    * side's salted two-stage ranking is salt-invariant (the final rank
    * is the global total order), so the oracle replays it as ONE plain
    * window per query. */
  // batch brute-force oracle: one plain window per query over the full
  // cross score (salt-invariant replay of the Spark side's two-stage rank)
  protected def bruteBatchSql(dims: Int = 64): String =
    s"""WITH q AS (SELECT CAST(vec_id AS BIGINT) AS query_id, embedding AS qe
       |      FROM embeddings WHERE vec_id < 3),
       |s AS (SELECT q.query_id, e.vec_id,
       |        ${duckCosine("e.embedding", "q.qe", dims)} AS cosine_sim
       |      FROM embeddings e, q),
       |r AS (SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine_sim DESC, vec_id ASC) AS BIGINT) AS rank,
       |        vec_id, cosine_sim FROM s)
       |SELECT query_id, rank, vec_id, cosine_sim FROM r WHERE rank <= 10""".stripMargin

  protected def ivfTrainedBatchSql(): String = {
    val dims = 64
    s"""WITH ${ivfTrainCtes(dims)},
       |q AS (SELECT CAST(vec_id AS BIGINT) AS query_id, embedding AS qe
       |      FROM embeddings WHERE vec_id < 3),
       |probe AS (SELECT query_id, cid AS list_id FROM (
       |    SELECT q.query_id, c.cid, row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${duckCosine("c.cemb", "q.qe", dims)} DESC, c.cid ASC) AS rn
       |    FROM c1 c, q) WHERE rn <= 2),
       |s AS (SELECT p.query_id, e.vec_id,
       |        ${duckCosine("e.embedding", "q.qe", dims)} AS cosine_sim
       |      FROM probe p JOIN q USING (query_id)
       |      JOIN alist a ON a.list_id = p.list_id
       |      JOIN embeddings e ON e.vec_id = a.vec_id),
       |r AS (SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine_sim DESC, vec_id ASC) AS BIGINT) AS rank,
       |        vec_id, cosine_sim FROM s)
       |SELECT query_id, rank, vec_id, cosine_sim FROM r WHERE rank <= 10""".stripMargin
  }

  protected def closureCtes: String = closureCtesOver("vpairs")

  protected def closureCtesOver(src: String): String =
    s"""edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM $src
       |  UNION SELECT id_b, id_a FROM $src
       |),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |),
       |labels AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src
       |)""".stripMargin

  /** DuckDB ±1-hyperplane projection sign-bucket for `embCol`. */
  protected def duckSignBucket(embCol: String, numPlanes: Int, dims: Int): String =
    duckSignBucketP(embCol, Similarity.planes(numPlanes, dims), dims)

  protected def duckSignBucketP(embCol: String, planes: Seq[Seq[Int]], dims: Int): String = {
    val bits = planes.map { hp =>
      val lst = hp.mkString("[", ", ", "]")
      val proj = s"list_sum(list_transform(generate_series(1, $dims), " +
        s"__i -> CAST(($embCol)[__i] AS DOUBLE) * ($lst)[__i]))"
      // round-before-sign mirrors Similarity.signBucket (cross-engine
      // float-sum association can differ by ~1e-13 near zero)
      s"(CASE WHEN round($proj, 6) >= 0 THEN '1' ELSE '0' END)"
    }
    bits.mkString("concat(", ", ", ")")
  }

  /** Shared CTE chain for banded embedding near-dup pairs (the q24
    * pipeline: 2 bands × 8 planes, capped buckets, cosine ≥ 0.15),
    * ending in `p(id_a, id_b, cosine_sim)` — used by q24 (pairs) and
    * q59 (semantic clusters) so the pair semantics can never
    * desynchronize between their oracles. */
  protected def embPairCtes: String = {
    val all = Similarity.planes(16, 64)
    val bandSelects = (0 until 2).map { b =>
      val bucket = duckSignBucketP("embedding", all.slice(b * 8, (b + 1) * 8), 64)
      s"SELECT vec_id, embedding, $b AS band, $bucket AS bucket FROM embeddings"
    }.mkString(" UNION ALL ")
    s"""embm AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |bb AS ($bandSelects),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY band, bucket ORDER BY vec_id) AS rn FROM bb
       |  ) WHERE rn <= 1000
       |),
       |p AS (
       |  SELECT * FROM (
       |    SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
       |      ${duckCosine("a.embedding", "c.embedding", 64)} AS cosine_sim
       |    FROM capped a JOIN capped c
       |      ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id
       |  ) WHERE cosine_sim >= 0.15
       |)""".stripMargin
  }

  /** Shared q283–q287 oracle graph stem: 4×4-band LSH candidates (no
    * cosine floor — navigation edges) → per-vertex top-8 kNN edges
    * (`kg$sfx`, plus `kgc$sfx` retaining the edge cosines for the
    * q287 degree-re-prune) + the 4 lowest-id entries (`ent$sfx`).
    * `src` is the corpus relation (a table or a parenthesized
    * subquery); `sfx` namespaces the CTEs so two stems (full corpus +
    * standing slice) can coexist. Composed with
    * [[graphAnnWalkCtes]] per query. */
  protected def graphAnnStemCtes(
      src: String = "embeddings", sfx: String = "", k: Int = 8): String = {
    val dims = 64
    val all = Similarity.planes(24, dims)
    val bandSelects = (0 until 4).map { b =>
      val bucket = duckSignBucketP("embedding", all.slice(b * 6, (b + 1) * 6), dims)
      s"SELECT vec_id, embedding, $b AS band, $bucket AS bucket FROM embm$sfx"
    }.mkString(" UNION ALL ")
    s"""embm$sfx AS MATERIALIZED (SELECT vec_id, embedding FROM $src),
       |bb$sfx AS ($bandSelects),
       |capped$sfx AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY band, bucket
       |      ORDER BY vec_id) AS rn FROM bb$sfx
       |  ) WHERE rn <= 400),
       |cp$sfx AS (
       |  SELECT * FROM (
       |    SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
       |      ${duckCosine("a.embedding", "c.embedding", dims)} AS cosine_sim
       |    FROM capped$sfx a JOIN capped$sfx c
       |      ON a.band = c.band AND a.bucket = c.bucket AND a.vec_id < c.vec_id
       |  ) WHERE cosine_sim >= -1.0),
       |sym$sfx AS (SELECT id_a AS id, id_b AS nbr, cosine_sim FROM cp$sfx
       |  UNION ALL SELECT id_b, id_a, cosine_sim FROM cp$sfx),
       |kr$sfx AS (SELECT id, nbr, cosine_sim,
       |    row_number() OVER (PARTITION BY id
       |      ORDER BY round(cosine_sim*1000000, 0) DESC, nbr) AS rank
       |  FROM sym$sfx),
       |kgc$sfx AS MATERIALIZED (SELECT id, nbr, cosine_sim FROM kr$sfx
       |  WHERE rank <= $k),
       |kg$sfx AS (SELECT id, nbr FROM kgc$sfx),
       |ent$sfx AS (SELECT vec_id AS node FROM embm$sfx
       |  ORDER BY vec_id LIMIT 4)""".stripMargin
  }

  /** One query's beam walk over a [[graphAnnStemCtes]] graph:
    * `steps` unrolled rounds (neighbor scoring + top-`beam` cut) from
    * the `ent` entries; ends in `res_$ns` (node, sim, rn ≤ k — the
    * ranked answer). `graph`/`ent`/`emb` name the stem CTEs to walk;
    * `qsrc` is the relation holding the query vector (q287's inserted
    * vectors live outside the standing stem). Replays the SEARCH PATH
    * of Nsw.graphSearch/graphSearchBatch, cut by cut. */
  protected def graphAnnWalkCtes(
      qid: Long, steps: Int = 10, beam: Int = 16, k: Int = 10,
      graph: String = "kg", ent: String = "ent", emb: String = "embm",
      qsrc: String = "embm", ns0: String = ""): String = {
    val dims = 64
    val ns = if (ns0.nonEmpty) ns0 else s"q$qid"
    def c(n: String) = s"${n}_$ns" // per-walk CTE namespace
    val stepCtes = (1 to steps).map { i =>
      val prev = s"${c("p")}_${i - 1}"
      s"""${c("n")}_$i AS (SELECT DISTINCT g.nbr AS node FROM $prev pp
         |  JOIN $graph g ON g.id = pp.node),
         |${c("ns")}_$i AS MATERIALIZED (SELECT n.node,
         |    ${duckCosine("e.embedding", s"${c("qv")}.qe", dims)} AS sim
         |  FROM ${c("n")}_$i n JOIN $emb e ON e.vec_id = n.node, ${c("qv")}),
         |${c("u")}_$i AS (SELECT node, max(sim) AS sim FROM (
         |    SELECT node, sim FROM $prev
         |    UNION ALL SELECT node, sim FROM ${c("ns")}_$i)
         |  GROUP BY node),
         |${c("p")}_$i AS MATERIALIZED (SELECT node, sim FROM (
         |    SELECT node, sim,
         |      row_number() OVER (ORDER BY sim DESC, node ASC) AS rn
         |    FROM ${c("u")}_$i) WHERE rn <= $beam)""".stripMargin
    }.mkString(",\n")
    val visUnions = (1 to steps)
      .map(i => s"SELECT node, sim FROM ${c("ns")}_$i").mkString(" UNION ALL ")
    s"""${c("qv")} AS (SELECT embedding AS qe FROM $qsrc WHERE vec_id = $qid),
       |${c("p")}_0 AS MATERIALIZED (SELECT e.node,
       |    ${duckCosine("emb.embedding", s"${c("qv")}.qe", dims)} AS sim
       |  FROM $ent e JOIN $emb emb ON emb.vec_id = e.node, ${c("qv")}),
       |$stepCtes,
       |${c("vis")} AS (SELECT node, max(sim) AS sim FROM (
       |    SELECT node, sim FROM ${c("p")}_0 UNION ALL $visUnions)
       |  GROUP BY node),
       |res_$ns AS (SELECT node, sim, rn FROM (
       |    SELECT node, sim,
       |      row_number() OVER (ORDER BY sim DESC, node ASC) AS rn
       |    FROM ${c("vis")}) WHERE rn <= $k)""".stripMargin
  }

  /** Stride-entry seed CTEs ([[Nsw.strideEntries]]'s integer
    * arithmetic — n id-range cuts, conditional min per cut). Emits
    * `ent$sfx(node)`. */
  protected def strideEntCtes(
      n: Int, sfx: String, emb: String = "embm"): String =
    s"""mm$sfx AS (SELECT min(vec_id) AS lo, max(vec_id) AS hi FROM $emb),
       |ent$sfx AS (SELECT DISTINCT node FROM (
       |    SELECT (SELECT min(e2.vec_id) FROM $emb e2
       |        WHERE e2.vec_id >= m.lo + (i.i * (m.hi - m.lo + 1)) // $n)
       |      AS node
       |    FROM mm$sfx m, generate_series(0, ${n - 1}) i(i))
       |  WHERE node IS NOT NULL)""".stripMargin

  /** α-RNG RobustPrune replay over a [[graphAnnStemCtes]] candidate
    * graph (`kgc$sfx`, rank ≤ k): the greedy unrolls as k
    * MATERIALIZED kept-set CTEs — candidate rank i joins while its
    * node's kept count < r and no kept better-ranked neighbor
    * occludes it (alphaNum·d(p,c) ≤ alphaDen·d(node,c) in
    * micro-cosine distance — [[graft.ops.GraphNav.alphaPrunedGraph]]'s
    * exact integer arithmetic, so the pruned edge set replays
    * edge-for-edge). Emits `kgp$sfx(id, nbr)`. */
  protected def alphaPruneCtes(
      k: Int, r: Int, alphaNum: Int = 12, alphaDen: Int = 10,
      sfx: String = "", emb: String = "embm"): String = {
    val steps = (2 to k).map { i =>
      s"""kp${sfx}_$i AS MATERIALIZED (
         |  SELECT id, nbr, cm FROM kp${sfx}_${i - 1}
         |  UNION ALL
         |  SELECT cd.id, cd.nbr, cd.cm FROM candP$sfx cd
         |  WHERE cd.rank = $i
         |    AND (SELECT count(*) FROM kp${sfx}_${i - 1} kk
         |         WHERE kk.id = cd.id) < $r
         |    AND NOT EXISTS (SELECT 1 FROM kp${sfx}_${i - 1} kk
         |      JOIN pwP$sfx w ON w.id = cd.id AND w.p = kk.nbr
         |        AND w.c = cd.nbr
         |      WHERE kk.id = cd.id
         |        AND $alphaNum * (1000000 - w.pcm)
         |          <= $alphaDen * (1000000 - cd.cm)))""".stripMargin
    }.mkString(",\n")
    s"""candP$sfx AS MATERIALIZED (SELECT id, nbr,
       |    CAST(round(cosine_sim*1000000, 0) AS BIGINT) AS cm,
       |    row_number() OVER (PARTITION BY id
       |      ORDER BY round(cosine_sim*1000000, 0) DESC, nbr) AS rank
       |  FROM kgc$sfx),
       |pwP$sfx AS MATERIALIZED (SELECT a.id, a.nbr AS p, b.nbr AS c,
       |    CAST(round(${duckCosine("ea.embedding", "eb.embedding", 64)}
       |      * 1000000, 0) AS BIGINT) AS pcm
       |  FROM candP$sfx a JOIN candP$sfx b
       |    ON a.id = b.id AND a.nbr <> b.nbr
       |    AND (a.cm > b.cm OR (a.cm = b.cm AND a.nbr < b.nbr))
       |  JOIN $emb ea ON ea.vec_id = a.nbr
       |  JOIN $emb eb ON eb.vec_id = b.nbr),
       |kp${sfx}_1 AS MATERIALIZED (SELECT id, nbr, cm FROM candP$sfx
       |  WHERE rank = 1),
       |$steps,
       |kgp$sfx AS (SELECT id, nbr FROM kp${sfx}_$k)""".stripMargin
  }

  /** Per-block PQ training CTE chain (q70/q71): replays
    * `Clustering.train` + the final argmax for each slice — the
    * q55/q61 recipe applied per block. Emits `c0_b`, `a0_b`, `m1_b`,
    * `cm_b`, `c1_b` (trained codebook), `ab_b` (codes). */
  protected def pqBlockCtes(blocks: Int, d: Int, k: Int, src: String = "embeddings"): String =
    (0 until blocks).map { b =>
      val lo = b * d + 1
      val hi = (b + 1) * d
      val sl = s"(e.embedding)[$lo:$hi]"
      def assignCte(cents: String) =
        s"""SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${duckCosine(sl, "c.cemb", d)} DESC, c.cid ASC) AS rn
           |    FROM $src e CROSS JOIN $cents c""".stripMargin
      s"""c0_$b AS (SELECT CAST(vec_id AS BIGINT) AS cid,
         |  list_transform((embedding)[$lo:$hi], __x -> CAST(__x AS DOUBLE)) AS cemb
         |  FROM $src ORDER BY vec_id LIMIT $k),
         |a0_$b AS (SELECT vec_id, cid AS cluster FROM (${assignCte(s"c0_$b")}) WHERE rn = 1),
         |m1_$b AS (SELECT a.cluster, d.d,
         |    round(avg(CAST((e.embedding)[${lo - 1} + d.d] AS DOUBLE)), 6) AS v
         |  FROM a0_$b a JOIN $src e USING (vec_id), generate_series(1, $d) d(d)
         |  GROUP BY a.cluster, d.d),
         |cm_$b AS (SELECT cluster AS cid, list(v ORDER BY d) AS cemb FROM m1_$b GROUP BY cluster),
         |c1_$b AS (SELECT c0.cid, coalesce(cm.cemb, c0.cemb) AS cemb
         |  FROM c0_$b c0 LEFT JOIN cm_$b cm ON c0.cid = cm.cid),
         |ab_$b AS (SELECT vec_id, cid AS code_$b FROM (${assignCte(s"c1_$b")}) WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")

  /** Naive Bayes oracle (q106; reused verbatim by q116 — the stored
    * model table must change nothing through the parquet roundtrip):
    * per-class smoothed bucket log-liks over the q79 hashed-gram chain
    * + log priors; argmax replayed as a rank window (score DESC, class
    * ASC = the Spark min-struct tie-break). */
  protected def nbOracleSql: String = {
    val base = PortableSql.minhashBase("gram", DD)
    val sh2 = DD.shingles("l", 2)
    s"""WITH tr AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0),
       |te AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 <> 0),
       |dtr AS (SELECT lang AS cls, string_split(text, ' ') AS l FROM tr),
       |gtr AS (SELECT cls, unnest(list_concat(l, $sh2)) AS gram FROM dtr),
       |btr AS (SELECT cls, ($base % ${PortableSql.minhashP}) % 128 AS bucket FROM gtr),
       |cnt AS (SELECT cls, bucket, count(*) AS c FROM btr GROUP BY cls, bucket),
       |tot AS (SELECT cls, CAST(sum(c) AS DOUBLE) AS n FROM cnt GROUP BY cls),
       |bkt AS (SELECT unnest(generate_series(0, 127)) AS bucket),
       |lut AS (SELECT t.cls, b.bucket,
       |        ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / (t.n + 128.0)) AS ll
       |        FROM tot t CROSS JOIN bkt b
       |        LEFT JOIN cnt c ON c.cls = t.cls AND c.bucket = b.bucket),
       |dt AS (SELECT CAST(count(*) AS DOUBLE) AS dt FROM tr),
       |pri AS (SELECT lang AS cls, ln(CAST(count(*) AS DOUBLE) / dt.dt) AS lp
       |        FROM tr, dt GROUP BY lang, dt.dt),
       |dte AS (SELECT doc_id, string_split(text, ' ') AS l FROM te),
       |gte AS (SELECT doc_id, unnest(list_concat(l, $sh2)) AS gram FROM dte),
       |bte AS (SELECT doc_id, ($base % ${PortableSql.minhashP}) % 128 AS bucket FROM gte),
       |sc AS (SELECT bte.doc_id, l.cls, round(sum(l.ll) + p.lp, 6) AS score
       |       FROM bte JOIN lut l USING (bucket) JOIN pri p ON p.cls = l.cls
       |       GROUP BY bte.doc_id, l.cls, p.lp),
       |r AS (SELECT doc_id, cls, score, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, cls ASC) AS rn FROM sc)
       |SELECT doc_id, cls AS predicted, score FROM r WHERE rn = 1""".stripMargin
  }

  protected def duckCosine(a: String, b: String, dims: Int): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, $dims), " +
        s"__i -> CAST(($x)[__i] AS DOUBLE) * CAST(($y)[__i] AS DOUBLE)))"
    s"round(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})), 6)"
  }


  /** Shared q278/q279 oracle stem: demoTone samples from the formula →
    * framed square-wave filter-bank responses → per-frame peak bin
    * (CTEs par, smp, corr, pk — composed by each query's final
    * SELECT). */
  protected val audioPeaksSql: String =
    """WITH par AS (
      |  SELECT d.doc_id AS id, 2 + (d.doc_id // 10) % 7 AS p1,
      |    3 + (5 * (d.doc_id // 10)) % 11 AS p2,
      |    (d.doc_id // 10) % 5 AS ph1, (d.doc_id // 10) % 13 AS ph2,
      |    9000 - 100 * ((d.doc_id // 10) % 23) AS a1,
      |    5000 + 100 * ((d.doc_id // 10) % 29) AS a2,
      |    200 + d.doc_id % 50 AS n
      |  FROM documents d WHERE d.doc_id % 13 <> 0),
      |smp AS (
      |  SELECT id, i.i // 32 AS t, i.i % 32 AS j,
      |    a1 * (1 - 2 * (((i.i + ph1) // p1) % 2))
      |      + a2 * (1 - 2 * (((i.i + ph2) // p2) % 2))
      |      + ((id // 10) * 2654435761 + i.i * 40503) % 4001 - 2000
      |      + CASE WHEN (id * 37 + i.i * 13) % 89 = 0 THEN 800 ELSE 0 END AS s
      |  FROM par, generate_series(0, 248) i(i)
      |  WHERE i.i < (n // 32) * 32),
      |corr AS (
      |  SELECT id, t, k.k AS k,
      |    SUM(s * (1 - 2 * ((j // (k.k + 1)) % 2))) AS corr
      |  FROM smp, generate_series(0, 15) k(k)
      |  GROUP BY id, t, k.k),
      |pkr AS (
      |  SELECT id, t, k, corr, row_number()
      |    OVER (PARTITION BY id, t ORDER BY abs(corr) DESC, k ASC) AS rn
      |  FROM corr),
      |pk AS (
      |  SELECT a.id, a.t,
      |    ((a.k * 2 + CASE WHEN a.corr >= 0 THEN 1 ELSE 0 END) * 16 + b.k) * 2
      |      + CASE WHEN b.corr >= 0 THEN 1 ELSE 0 END AS sig
      |  FROM pkr a JOIN pkr b ON b.id = a.id AND b.t = a.t AND b.rn = 2
      |  WHERE a.rn = 1)""".stripMargin

  /** Shared q288/q289 oracle stem: sampled-frame pixels from the
    * demoY4m luma formula (t even, t < nf = 4 + id%5) → 4×4 integer
    * block means → per-frame aHash BIGINTs (CTEs vpar, vpx, vgrid,
    * vmn, vah — composed by each query's final SELECT). Raw video is
    * lossless, so this replays the REAL decode end to end. */
  protected val videoPhashSql: String =
    """WITH vpar AS (
      |  SELECT d.doc_id AS id, d.doc_id // 10 AS k, 4 + d.doc_id % 5 AS nf
      |  FROM documents d WHERE d.doc_id % 13 <> 0),
      |vpx AS (
      |  SELECT id, t.t AS t, x.x AS x, y.y AS y,
      |    ((3 + k % 199) * x.x + (5 + k % 193) * y.y + (11 + k % 7) * t.t
      |      + CASE WHEN (id * 131 + x.x * 7 + y.y * 3 + t.t * 17) % 97 = 0
      |             THEN 40 ELSE 0 END) % 256 AS v
      |  FROM vpar, generate_series(0, 7) t(t),
      |    generate_series(0, 35) x(x), generate_series(0, 31) y(y)
      |  WHERE t.t < nf AND t.t % 2 = 0),
      |vgrid AS (
      |  SELECT id, t, y // 4 AS r, x // 4 AS c,
      |    CAST(SUM(v) // 16 AS BIGINT) AS g
      |  FROM vpx GROUP BY id, t, y // 4, x // 4),
      |vmn AS (
      |  SELECT id, t, CAST(SUM(g) // 64 AS BIGINT) AS mean
      |  FROM vgrid WHERE r < 8 AND c < 8 GROUP BY id, t),
      |vah AS (
      |  SELECT g.id, g.t, COALESCE(bit_or(CASE WHEN g.g > m.mean THEN
      |      CASE WHEN g.r * 8 + g.c = 63 THEN (-9223372036854775807 - 1)
      |           ELSE (CAST(1 AS BIGINT) << CAST(g.r * 8 + g.c AS INTEGER))
      |      END END), 0) AS ahash
      |  FROM vgrid g JOIN vmn m ON m.id = g.id AND m.t = g.t
      |  WHERE g.r < 8 AND g.c < 8 GROUP BY g.id, g.t)""".stripMargin

  /** Shared q276/q277 oracle stem: pixels from the demoPng formula →
    * 4×4 integer block means → aHash/dHash BIGINTs (CTEs px, grid, m,
    * ah, dh — composed by each query's final SELECT). */
  protected val imagePhashSql: String =
    """WITH px AS (
      |  SELECT d.doc_id AS id, x.x AS x, y.y AS y,
      |    ((3 + (d.doc_id // 10) % 199) * x.x
      |      + (5 + (d.doc_id // 10) % 193) * y.y
      |      + CASE WHEN (d.doc_id * 131 + x.x * 7 + y.y * 3) % 97 = 0
      |             THEN 40 ELSE 0 END) % 256 AS v
      |  FROM documents d,
      |    generate_series(0, 35) x(x), generate_series(0, 31) y(y)
      |  WHERE d.doc_id % 13 <> 0),
      |grid AS (
      |  SELECT id, y // 4 AS r, x // 4 AS c,
      |    CAST(SUM(v) // 16 AS BIGINT) AS g
      |  FROM px GROUP BY id, y // 4, x // 4),
      |m AS (
      |  SELECT id, CAST(SUM(g) // 64 AS BIGINT) AS mean
      |  FROM grid WHERE r < 8 AND c < 8 GROUP BY id),
      |ah AS (
      |  SELECT g.id, COALESCE(bit_or(CASE WHEN g.g > m.mean THEN
      |      CASE WHEN g.r * 8 + g.c = 63 THEN (-9223372036854775807 - 1)
      |           ELSE (CAST(1 AS BIGINT) << CAST(g.r * 8 + g.c AS INTEGER))
      |      END END), 0) AS ahash
      |  FROM grid g JOIN m ON m.id = g.id
      |  WHERE g.r < 8 AND g.c < 8 GROUP BY g.id),
      |dh AS (
      |  SELECT a.id, COALESCE(bit_or(CASE WHEN b.g > a.g THEN
      |      CASE WHEN a.r * 8 + a.c = 63 THEN (-9223372036854775807 - 1)
      |           ELSE (CAST(1 AS BIGINT) << CAST(a.r * 8 + a.c AS INTEGER))
      |      END END), 0) AS dhash
      |  FROM grid a JOIN grid b
      |    ON b.id = a.id AND b.r = a.r AND b.c = a.c + 1
      |  WHERE a.r < 8 AND a.c < 8 GROUP BY a.id)""".stripMargin
}
