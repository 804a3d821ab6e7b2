package graft.ops

import org.apache.spark.sql.DataFrame

import graft.functions.PortableSql
import graft.functions.PortableSql.{Dialect, DuckDialect, SparkDialect}

/**
 * Declarative corpus-quality filtering (Gopher-style) — the
 * training-data analog of the reference's YAML `quality_rules`
 * (`configs/breweries_gold_pipeline.yml:62-69`): a document-level
 * keep/drop DECISION composed from configurable thresholds over the
 * text-quality primitives (token count, language ID, quality score,
 * repetition ratio).
 *
 * Filters compile through the [[PortableSql]] dialect seam, so ONE
 * filter definition yields both the Spark execution expression and the
 * DuckDB oracle SQL — the config surface itself is correctness-gated,
 * not just the primitives underneath it.
 *
 * Decision semantics mirror [[Dedup.dedupDecisions]]: every document
 * keeps a row, `kept` is the verdict, and `drop_reason` names the
 * FIRST failing filter in config order (evaluation is one CASE chain —
 * cheap filters first is the caller's ordering lever, exactly like
 * Gopher's staged fences). The whole decision is a single narrow
 * projection: scan-speed, zero shuffles, trivially partitionable at
 * 100 TB.
 */
object CorpusFilters {

  sealed trait Filter {
    /** Name recorded in `drop_reason` when this filter rejects. */
    def name: String
    /** Boolean pass-predicate over the text expression, in dialect `d`. */
    def pass(text: String, d: Dialect): String
  }

  final case class MinTokens(min: Long) extends Filter {
    val name = "min_tokens"
    def pass(text: String, d: Dialect): String =
      s"${PortableSql.tokenCount(text, d)} >= $min"
  }

  final case class MaxTokens(max: Long) extends Filter {
    val name = "max_tokens"
    def pass(text: String, d: Dialect): String =
      s"${PortableSql.tokenCount(text, d)} <= $max"
  }

  final case class AllowLangs(langs: Seq[String]) extends Filter {
    require(langs.nonEmpty, "languages filter needs at least one language")
    require(langs.forall(_.matches("[a-z]{2,8}")),
      s"language codes must be plain lowercase tags, got $langs")
    val name = "languages"
    def pass(text: String, d: Dialect): String =
      s"${PortableSql.langId(text, d)} IN (${langs.map(l => s"'$l'").mkString(", ")})"
  }

  final case class MinQuality(min: Double) extends Filter {
    val name = "min_quality"
    def pass(text: String, d: Dialect): String =
      s"${PortableSql.qualityScore(text, d)} >= $min"
  }

  final case class MaxRepetition(max: Double, shingleWords: Int = 3) extends Filter {
    val name = "max_repetition"
    def pass(text: String, d: Dialect): String = d match {
      // Spark: the single-pass kernel (unrounded ratio; the shared
      // round(…, 6) keeps both engines' comparison identical)
      case SparkDialect =>
        s"round(graft_dup_ratio($text, $shingleWords), 6) <= $max"
      case DuckDialect =>
        val sh = d.shingles(d.tokens(text), shingleWords)
        // shingles() floors at one element, so the ratio never divides by 0
        s"round(1.0 - CAST(len(list_distinct($sh)) AS DOUBLE) / " +
          s"CAST(len($sh) AS DOUBLE), 6) <= $max"
    }
  }

  // --- Gopher structural rules (Rae et al. 2021 appendix A1.1,
  // public) — the non-repetition document gates a web-scale corpus
  // ships beside the token fence: word-shape bounds, symbol density,
  // and the stopword floor that separates prose from keyword soup.
  // Each compiles to a pure per-row predicate in BOTH dialects
  // (scan-speed, no shuffle, inside whole-stage codegen on Spark).

  /** Mean space-token length must sit in [min, max]: too short is
    * symbol soup / character-split text, too long is code or
    * concatenated junk. mean = (chars − (ntok − 1)) / ntok — exact,
    * split-free on the Spark side. */
  final case class MeanWordLenBand(min: Double, max: Double) extends Filter {
    require(min <= max, s"mean_word_len band is empty: [$min, $max]")
    val name = "mean_word_len"
    def pass(text: String, d: Dialect): String = {
      val nt = s"CAST(${PortableSql.tokenCount(text, d)} AS DOUBLE)"
      val m = s"((CAST(length($text) AS DOUBLE) - ($nt - 1.0)) / $nt)"
      s"($m >= $min AND $m <= $max)"
    }
  }

  /** Symbol-to-word ratio cap: occurrences of '#' and '...' (the
    * Gopher symbol set) per token must not exceed `max`. */
  final case class MaxSymbolRatio(max: Double) extends Filter {
    val name = "max_symbol_ratio"
    def pass(text: String, d: Dialect): String = {
      val nt = s"CAST(${PortableSql.tokenCount(text, d)} AS DOUBLE)"
      val sym = s"(${PortableSql.occurrences(text, "#")} + " +
        s"${PortableSql.occurrences(text, "...")})"
      s"(CAST($sym AS DOUBLE) / $nt <= $max)"
    }
  }

  /** At least `min` of the space tokens must contain an alphabetic
    * character — drops tables of numbers, markup fragments, and
    * delimiter runs that survive the token-count fence. */
  final case class MinAlphaWordRatio(min: Double) extends Filter {
    val name = "min_alpha_word_ratio"
    def pass(text: String, d: Dialect): String = d match {
      case SparkDialect =>
        s"(CAST(size(filter(split($text, ' '), __t -> __t rlike '[A-Za-z]')) AS DOUBLE)" +
          s" / CAST(${PortableSql.tokenCount(text, d)} AS DOUBLE) >= $min)"
      case DuckDialect =>
        s"(CAST(len(list_filter(string_split($text, ' '), " +
          s"__t -> regexp_matches(__t, '[A-Za-z]'))) AS DOUBLE)" +
          s" / CAST(len(string_split($text, ' ')) AS DOUBLE) >= $min)"
    }
  }

  /** Prose floor: at least `min` DISTINCT words from the Gopher
    * stopword list must appear as whole tokens (case-folded) —
    * keyword-stuffed pages and word salads rarely clear it. */
  final case class MinStopwordHits(
      min: Int,
      stopwords: Seq[String] = MinStopwordHits.gopherStopwords) extends Filter {
    require(min >= 1 && min <= stopwords.length,
      s"min_stopword_hits needs 1 <= min <= ${stopwords.length}, got $min")
    require(stopwords.forall(_.matches("[a-z]+")),
      s"stopwords must be plain lowercase words, got $stopwords")
    val name = "min_stopword_hits"
    def pass(text: String, d: Dialect): String = {
      val toks = d.tokens(s"lower($text)")
      val contains = d match {
        case SparkDialect => "array_contains"
        case DuckDialect  => "list_contains"
      }
      val hits = stopwords
        .map(w => s"(CASE WHEN $contains($toks, '$w') THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
      s"($hits >= $min)"
    }
  }

  object MinStopwordHits {
    /** The Gopher paper's stopword set. */
    val gopherStopwords: Seq[String] =
      Seq("the", "be", "to", "of", "and", "that", "have", "with")
  }

  /** The Gopher structural chain with the paper's thresholds — token
    * fence first (cheapest), stopword floor last (most text scans).
    * `minStopwords` is the floor the paper sets at 2; corpora with a
    * constrained vocabulary (or non-English text routed here by
    * mistake) tune it rather than fork the chain. */
  def gopherRules(
      minTokens: Long = 50L,
      maxTokens: Long = 100000L,
      minStopwords: Int = 2): Seq[Filter] = Seq(
    MinTokens(minTokens), MaxTokens(maxTokens),
    MeanWordLenBand(3.0, 10.0), MaxSymbolRatio(0.1),
    MinAlphaWordRatio(0.8), MinStopwordHits(minStopwords))

  /** The `drop_reason` expression: first failing filter's name in
    * config order, NULL when every filter passes. */
  def dropReasonSql(filters: Seq[Filter], text: String, d: Dialect): String = {
    require(filters.nonEmpty, "corpus filter chain is empty")
    filters.map(f => s"WHEN NOT (${f.pass(text, d)}) THEN '${f.name}'")
      .mkString("CASE ", " ", " ELSE NULL END")
  }

  /** Apply the chain: (idCol, kept, drop_reason) — one row per input
    * document. `kept` derives from `drop_reason` in a second projection
    * so the CASE chain is evaluated ONCE per row. */
  def decide(
      df: DataFrame,
      textCol: String,
      idCol: String,
      filters: Seq[Filter]): DataFrame = {
    // both names are interpolated into generated SQL — reject anything
    // that is not a plain identifier rather than emit broken expressions
    Seq(textCol, idCol).foreach(c =>
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"column '$c' must be a plain identifier (used in generated SQL)"))
    // the Spark dialect compiles to graft_* kernel calls
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.selectExpr(
      idCol,
      s"${dropReasonSql(filters, textCol, SparkDialect)} AS drop_reason")
      .selectExpr(idCol, "drop_reason IS NULL AS kept", "drop_reason")
  }

  /** The DuckDB oracle for [[decide]] over table `table` — generated
    * from the SAME filter objects, single source of truth. */
  def oracleSql(
      filters: Seq[Filter],
      table: String,
      textCol: String,
      idCol: String): String =
    s"""WITH r AS (SELECT $idCol,
       |  ${dropReasonSql(filters, textCol, DuckDialect)} AS drop_reason FROM $table)
       |SELECT $idCol, drop_reason IS NULL AS kept, drop_reason FROM r""".stripMargin
}
