package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * URL hygiene for web-scale corpus ingestion — the step between a web
 * source ([[graft.sources.WarcSource]] → [[graft.functions.HtmlExtract]])
 * and corpus dedup: crawls carry the SAME page under uppercase hosts,
 * explicit default ports, tracking parameters, and fragments, so URL
 * canonicalization is what makes URL-level dedup and per-domain
 * accounting mean anything. (The reference has no web ingestion —
 * north-star surface.)
 *
 * Everything here is pure `Column` arithmetic over Spark built-ins
 * (`parse_url`, regex, array HOFs) — codegen'd, scan-speed, no UDFs,
 * no shuffles until an operator genuinely aggregates.
 *
 *  - [[normalizeUrl]]: RFC 3986 §6 syntax-based normalization plus the
 *    crawl-standard extras — lowercase scheme+host (case-insensitive
 *    by spec; path/query case PRESERVED, they are not), strip default
 *    ports (:80 http, :443 https), drop fragments, drop tracking
 *    parameters (utm_*, fbclid, gclid, msclkid by default) while
 *    preserving the order of the rest. Null/unparseable input → null.
 *  - [[registrableDomain]]: the per-site grouping key. Full
 *    public-suffix-list resolution needs the (large, mutable) PSL
 *    database; this uses the documented two-label heuristic with the
 *    common second-level set (`co/com/net/org/gov/ac/edu` under a
 *    2-char TLD → three labels, e.g. `site.co.uk`), which resolves the
 *    dominant crawl patterns and is exactly replayable in the oracle.
 *    Swap point for a broadcast PSL lookup if exactness on exotic
 *    suffixes ever matters.
 *  - [[domainCap]]: at most `cap` pages per registrable domain, chosen
 *    by salted-hash order — deterministic across runs/partitionings
 *    (the [[Sampling.unitPos]] discipline), no favored crawl order.
 *    One shuffle: the count join and the row_number window share the
 *    domain hash-partitioning, so Spark plans a single exchange.
 *    Small domains (≤ cap, the overwhelming mass of the web) take the
 *    count-join fast path and SKIP the window entirely; only
 *    above-cap domains sort, and `prefilterMargin` optionally fences
 *    a pathological mega-domain's window partition down to
 *    ~margin·cap hash-selected survivors (keep the margin generous:
 *    the fence is probabilistic — an under-selected domain would keep
 *    fewer than cap; margin 8 at cap ≥ 100 puts that beyond 1e-12).
 */
object UrlOps {

  /** Tracking parameters dropped by [[normalizeUrl]]: `name(=…)?`. */
  val DefaultDropParams = "^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$"

  /** Lowercased host of a URL (hosts are case-insensitive, RFC 3986
    * §3.2.2); null for unparseable input. */
  def hostOf(url: Column): Column = lower(try_parse_url(url, lit("HOST")))

  def normalizeUrl(url: Column, dropParams: String = DefaultDropParams): Column = {
    val scheme = lower(try_parse_url(url, lit("PROTOCOL")))
    val host = hostOf(url)
    val port = regexp_extract(try_parse_url(url, lit("AUTHORITY")), ":([0-9]+)$", 1)
    val isDefault = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || isDefault, lit(""))
      .otherwise(concat(lit(":"), port))
    val path = coalesce(try_parse_url(url, lit("PATH")), lit(""))
    val query = try_parse_url(url, lit("QUERY"))
    val kept = filter(split(coalesce(query, lit("")), "&"),
      p => p =!= "" && !p.rlike(dropParams))
    val queryPart = when(query.isNull || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    // an unparseable URL has null scheme/host → whole concat null
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /**
   * Query-parameter audit — the DATA-DRIVEN companion of
   * [[normalizeUrl]]'s static drop list: tracking/session parameters
   * are an open set, and the ones that actually fragment a crawl are
   * corpus-specific. Per (host, parameter): how many URLs carry it and
   * how many DISTINCT values it takes. A parameter whose value is
   * unique-ish per URL (`distinct_ratio ≥ stripRatio`) is a session
   * id / cache buster by behavior — every value maps to the same page,
   * so keeping it multiplies the frontier; the audit recommends
   * `strip` and the result feeds a per-host canonicalization list.
   * Low-occurrence parameters stay `low_evidence` rather than
   * guessing (`minUrls` fence).
   *
   * Scale shape: one parse + explode (∝ URL count × params/URL, narrow),
   * one decomposable (host, param) count + distinct — the output is
   * parameter-vocabulary-sized, never crawl-∝. Pure integer counts +
   * one division (round 6).
   *
   * Output: (host, param, n_urls, n_values, distinct_ratio, verdict).
   */
  def paramAudit(
      df: DataFrame,
      urlCol: String,
      minUrls: Long = 10L,
      stripRatio: Double = 0.9): DataFrame = {
    require(minUrls >= 1, "minUrls must be >= 1")
    require(stripRatio > 0 && stripRatio <= 1, "stripRatio must be in (0, 1]")
    val host = hostOf(col(urlCol))
    val query = try_parse_url(col(urlCol), lit("QUERY"))
    val pairs = df
      .select(host.as("host"), explode(filter(
        split(coalesce(query, lit("")), "&"), p => p =!= "")).as("__kv"))
      .filter(col("host").isNotNull)
      .select(col("host"),
        substring_index(col("__kv"), "=", 1).as("param"),
        // value = everything after the FIRST '=' (values may embed '=');
        // a bare flag parameter has a NULL value
        when(col("__kv").contains("="),
          expr("substring(__kv, instr(__kv, '=') + 1)")).as("__value"))
    pairs.groupBy("host", "param")
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("__value")).as("n_values"))
      .select(col("host"), col("param"), col("n_urls"), col("n_values"),
        round(col("n_values").cast("double") / col("n_urls"), 6)
          .as("distinct_ratio"))
      .withColumn("verdict",
        when(col("n_urls") < minUrls, lit("low_evidence"))
          .when(col("distinct_ratio") >= stripRatio, lit("strip"))
          .otherwise(lit("keep")))
  }

  /** Second-level labels that usually sit under a country TLD. */
  private val CommonSlds = Seq("co", "com", "net", "org", "gov", "ac", "edu")

  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val sld = element_at(labels, -2)
    when(host.isNull, lit(null).cast("string"))
      .when(n >= 3 && sld.isin(CommonSlds: _*) && length(tld) === 2,
        concat_ws(".", element_at(labels, -3), sld, tld))
      .when(n >= 2, concat_ws(".", sld, tld))
      .otherwise(host)
  }

  /**
   * Keep at most `cap` rows per registrable domain, selected by salted
   * hash order over the URL (ties broken by the URL itself — total
   * order, bit-replayable). Output keeps the input columns.
   */
  def domainCap(
      df: DataFrame,
      urlCol: String,
      cap: Int,
      salt: String = "domcap",
      prefilterMargin: Option[Double] = None): DataFrame = {
    require(cap >= 1, "cap must keep at least one page per domain")
    prefilterMargin.foreach(m => require(m > 1.0, "prefilterMargin must exceed 1"))
    val inCols = df.columns.map(col).toSeq
    val withDom = df
      .withColumn("__dom", registrableDomain(hostOf(col(urlCol))))
      .withColumn("__pos", Sampling.unitPos(col(urlCol), salt))
    val counts = withDom.groupBy("__dom").agg(count(lit(1)).as("__n"))
    val joined = withDom.join(counts, Seq("__dom")) // hash-partitioned by __dom
    val small = joined.filter(col("__n") <= cap).select(inCols: _*)
    val bigAll = joined.filter(col("__n") > cap)
    // optional mega-domain fence: the window partition shrinks from __n
    // to ~margin·cap hash-selected rows (uniform hash ⇒ binomial tail)
    val big = prefilterMargin.fold(bigAll) { m =>
      bigAll.filter(col("__pos") < lit(m * cap) / col("__n"))
    }
    val w = Window.partitionBy("__dom").orderBy(col("__pos"), col(urlCol))
    val kept = big.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .select(inCols: _*)
    small.unionByName(kept)
  }

  /**
   * Crawl-trap audit — the URL-shape fence a frontier runs BEFORE
   * fetching (public crawl-engineering lore: calendar pages, session-id
   * loops, and mirrored path cycles generate unbounded URL spaces that
   * all fetch fine and say nothing new). Three structural signals per
   * URL, each cheap and parser-exact:
   *
   *  - `depth`: non-empty path segments — runaway nesting;
   *  - `max_repeat`: the most-repeated path segment (`/a/b/a/b/a` ⇒ 3)
   *    — the mirrored-cycle signature;
   *  - `n_params`: query parameters — the facet/session explosion.
   *
   * `is_trap` fires when any signal crosses its threshold. Pure narrow
   * projection over Spark's HOFs (`try_parse_url` + array lambdas, all
   * codegen): no UDF, no shuffle; the per-URL repeat scan is O(depth²)
   * on depth capped by the trap fence itself. Per-host rollups are the
   * caller's one aggregation.
   *
   * @return input columns + (host, depth, max_repeat, n_params, is_trap)
   */
  def trapAudit(
      df: DataFrame,
      urlCol: String,
      maxDepth: Int = 8,
      minRepeat: Int = 3,
      maxParams: Int = 10): DataFrame = {
    require(maxDepth >= 1 && minRepeat >= 2 && maxParams >= 1,
      s"nonsense thresholds: depth $maxDepth, repeat $minRepeat, params $maxParams")
    val u = col(urlCol)
    val segs = filter(split(coalesce(try_parse_url(u, lit("PATH")), lit("")),
      "/"), x => x =!= "")
    val q = try_parse_url(u, lit("QUERY"))
    df
      .withColumn("host", hostOf(u))
      .withColumn("depth", size(segs).cast("long"))
      .withColumn("max_repeat",
        coalesce(
          array_max(transform(array_distinct(segs),
            s0 => size(filter(segs, x => x === s0)))),
          lit(0)).cast("long"))
      .withColumn("n_params",
        when(q.isNull || q === "", lit(0L))
          .otherwise(size(split(q, "&")).cast("long")))
      .withColumn("is_trap",
        col("depth") > maxDepth || col("max_repeat") >= minRepeat ||
          col("n_params") > maxParams)
  }
}
