package graft.functions

/**
 * Generator of SQL expression fragments that evaluate IDENTICALLY in
 * Spark SQL (via `selectExpr`) and DuckDB (the driver's correctness
 * oracle). One source of truth per operator kills Spark-vs-oracle
 * drift: the exact same generated math runs on both engines, with a
 * tiny [[Dialect]] seam for the few functions whose names differ
 * (list/array HOFs, split).
 *
 * Portability rules baked in here:
 *  - md5 is the only hash (identical hex everywhere);
 *  - occurrence counting via replace-length deltas (no regex dialects);
 *  - `/` is float division in both engines (Spark and DuckDB ≥0.9);
 *  - hex-digit→int via `instr('0123456789abcdef', c) - 1` (both);
 *  - min over string lists = lexicographic on ASCII hex (both).
 */
object PortableSql {

  sealed trait Dialect {
    /** split on single space → list of tokens */
    def tokens(text: String): String
    /** sum of `body` (int) over elements of `arr`, bound to `v` */
    def sumOver(arr: String, v: String, body: String): String
    /** overlapping n-word shingles of token list `toks`, space-joined */
    def shingles(toks: String, n: Int): String
  }

  case object SparkDialect extends Dialect {
    def tokens(text: String) = s"split($text, ' ')"
    def sumOver(arr: String, v: String, body: String) =
      s"aggregate($arr, 0, (__acc, $v) -> __acc + ($body))"
    def shingles(toks: String, n: Int) =
      s"transform(sequence(1, greatest(size($toks) - ${n - 1}, 1)), " +
        s"__i -> concat_ws(' ', slice($toks, __i, $n)))"
  }

  case object DuckDialect extends Dialect {
    def tokens(text: String) = s"string_split($text, ' ')"
    def sumOver(arr: String, v: String, body: String) =
      s"CAST(list_sum(list_transform($arr, $v -> ($body))) AS BIGINT)"
    def shingles(toks: String, n: Int) =
      s"list_transform(generate_series(1, greatest(len($toks) - ${n - 1}, 1)), " +
        s"__i -> array_to_string(($toks)[__i:__i+${n - 1}], ' '))"
  }

  /** Occurrences of literal `needle` in `s` (both engines: replace +
    * length delta; integer division is exact because the delta is a
    * multiple of the needle length). */
  def occurrences(s: String, needle: String): String =
    s"CAST((length($s) - length(replace($s, '$needle', ''))) / ${needle.length} AS BIGINT)"

  /** Language-marker tables (mirrors `TextOps.langMarkers`). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " with "),
    "es" -> Seq(" el ", " los ", " con "),
    "de" -> Seq(" der ", " und ", " mit "),
    "fr" -> Seq(" le ", " les ", " avec "),
    "zh" -> Seq(" de4 ", " he2 ", " yu3 "))

  /** N-gram-heuristic language ID fragment: argmax of stopword scores,
    * fixed tie priority, 'und' when nothing matches. Valid in BOTH
    * engines (the Spark parity reference for the kernel below), but
    * each marker occurrence is a full `replace` copy of the text —
    * ~45 text scans per row. */
  def langIdPortable(text: String): String = {
    val padded = s"concat(' ', lower($text), ' ')"
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => occurrences(padded, m)).mkString("(", " + ", ")")
    }
    val maxE = scores.map(_._2).mkString("greatest(", ", ", ")")
    val whens = scores
      .map { case (lang, s) => s"WHEN $s = $maxE THEN '$lang'" }
      .mkString(" ")
    s"CASE WHEN $maxE <= 0 THEN 'und' $whens ELSE 'und' END"
  }

  /** Language ID, per dialect: the Spark side runs the single-pass
    * codegen kernel [[graft.functions.LangIdKernel]] (requires
    * [[GraftFunctions.register]] on the session — [[graft.ops
    * .CorpusFilters.decide]] and the entry queries do this); the DuckDB
    * oracle keeps the portable argmax CASE. Bit-identical results —
    * oracle-checked by q12 and every corpus-filter query. */
  def langId(text: String, d: Dialect): String = d match {
    case SparkDialect => s"graft_lang_id($text)"
    case DuckDialect  => langIdPortable(text)
  }

  /** Heuristic quality score in [0,1] (see `TextOps.qualityScore`);
    * `tokCount` is the dialect-specific token-count expression.
    * NULL text → NULL, guarded EXPLICITLY: without the guard both
    * engines' NULL-skipping `least`/`CASE` would agree on a phantom
    * 0.55 for a NULL doc — parity-safe but semantically wrong (a
    * quality-only fence would keep a doc with no text). */
  def qualityScore(text: String, d: Dialect): String = {
    val nTok = s"CAST(${tokenCount(text, d)} AS DOUBLE)"
    val nChars = s"CAST(length($text) AS DOUBLE)"
    val meanWordLen = s"(($nChars - ($nTok - 1.0)) / $nTok)"
    val lengthScore = s"least($nChars / 500.0, 1.0)"
    val wordLenScore =
      s"(CASE WHEN $meanWordLen >= 3.0 AND $meanWordLen <= 8.0 THEN 1.0 ELSE 0.5 END)"
    val punct = Seq(".", ",", "!", "?", ";")
      .map(p => occurrences(text, p))
      .mkString("(", " + ", ")")
    val punctScore = s"(1.0 - least(CAST($punct AS DOUBLE) / $nTok, 1.0))"
    s"(CASE WHEN $text IS NULL THEN NULL ELSE " +
      s"round(0.4 * $lengthScore + 0.3 * $wordLenScore + 0.3 * $punctScore, 6) END)"
  }

  /** Token count, per dialect. The Spark side runs the byte-scan
    * kernel [[graft.functions.TokenCountKernel]] (split-free, zero
    * allocation); the portable `size(split(…))` form is kept below as
    * the parity reference. Both = (space count) + 1. */
  def tokenCount(text: String, d: Dialect): String = d match {
    case SparkDialect => s"graft_token_count($text)"
    case DuckDialect  => s"len(${d.tokens(text)})"
  }

  /** The portable Spark token count (parity reference for the kernel). */
  def tokenCountPortable(text: String): String =
    s"CAST(size(${SparkDialect.tokens(text)}) AS BIGINT)"

  /** Regex-token count ("BPE-ish"): alpha runs / digit runs / single
    * other-chars. Pattern constrained to constructs with identical
    * Java-vs-RE2 semantics. */
  def regexTokenCount(text: String, d: Dialect): String = d match {
    case SparkDialect =>
      s"CAST(size(regexp_extract_all($text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS BIGINT)"
    case DuckDialect =>
      s"len(regexp_extract_all($text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))"
  }

  /** md5 fingerprint of casefolded text. Portable. */
  def fingerprint(text: String): String = s"md5(lower(trim($text)))"

  /** MinHash universal-hash parameters: `h_i(x) = (a_i·(H(x) mod P) +
    * b_i) mod P` over the prime P = 2³¹−1, with one shared 60-bit base
    * hash H = first 15 hex chars of md5(shingle). ONE md5 per shingle
    * feeds all permutations — hashing cost is independent of
    * `numHashes` (the dominant cost at corpus scale). a_i, b_i are
    * fixed odd multipliers < P so `a_i·(H mod P)` stays under 2⁶²
    * (no 64-bit overflow in either engine). */
  val minhashP: Long = 2147483647L
  def minhashA(i: Int): Long = (2654435761L * (2 * i + 1)) % minhashP
  def minhashB(i: Int): Long = (40503L * (i + 1) * 2654435761L) % minhashP

  /** 60-bit numeric base hash of a shingle, identical in both engines.
    * Spark parses the 15 hex chars with `conv`; DuckDB (no conv) sums
    * digit values — same number. */
  def minhashBase(shingleExpr: String, d: Dialect): String = d match {
    case SparkDialect =>
      s"CAST(conv(substr(md5($shingleExpr), 1, 15), 16, 10) AS BIGINT)"
    case DuckDialect =>
      val digits = (1 to 15).map { j =>
        val pow = java.math.BigInteger.valueOf(16L).pow(15 - j)
        s"(instr('0123456789abcdef', substr(__m, $j, 1)) - 1) * $pow"
      }.mkString(" + ")
      // bind __m via a nested list_transform over the single md5 value so
      // the md5 is written (and computed) once per shingle
      s"list_transform([md5($shingleExpr)], __m -> $digits)[1]"
  }

  /** MinHash signature element `i`: numeric min over shingles of the
    * universal hash `h_i`. */
  def minhashSig(shinglesExpr: String, i: Int, d: Dialect): String = {
    val h = s"(${minhashA(i)} * (${minhashBase("__s", d)} % $minhashP) + ${minhashB(i)}) % $minhashP"
    d match {
      case SparkDialect =>
        s"array_min(transform($shinglesExpr, __s -> $h))"
      case DuckDialect =>
        s"list_min(list_transform($shinglesExpr, __s -> $h))"
    }
  }

  /**
   * SimHash fragment: `bits`-bit token-vote fingerprint as a hex string.
   * Bit b = sign of Σ_tokens ±1 where the vote is bit b of md5(token)
   * (hex digit b/4, bit 3-(b%4) within the nibble, extracted with pure
   * arithmetic so both engines agree).
   */
  def simhash(text: String, bits: Int, d: Dialect): String = {
    require(bits % 4 == 0 && bits <= 64)
    val toks = d.tokens(text)
    val bitExprs = (0 until bits).map { b =>
      val hexPos = b / 4 + 1
      val m1 = 1 << (3 - (b % 4)) // bit weight within the nibble
      val m2 = m1 * 2
      val nibble = s"(instr('0123456789abcdef', substr(md5(__t), $hexPos, 1)) - 1)"
      val vote = s"CASE WHEN ($nibble % $m2) >= $m1 THEN 1 ELSE -1 END"
      val votes = d.sumOver(toks, "__t", vote)
      s"(CASE WHEN $votes > 0 THEN 1 ELSE 0 END)"
    }
    val nibbleChars = bitExprs.grouped(4).map { g =>
      val v = g.zipWithIndex.map { case (bit, i) => s"$bit * ${8 >> i}" }.mkString(" + ")
      s"substr('0123456789abcdef', ($v) + 1, 1)"
    }
    nibbleChars.mkString("concat(", ", ", ")")
  }
}
