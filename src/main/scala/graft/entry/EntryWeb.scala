package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/** web slice of the [[SparkEntry]] registry — web ingestion + crawl: WARC/HTML/URL/robots/sitemaps, crawl planning and traps, PII, payload triage.
  * Split by family for maintainability; entries and oracles are
  * verbatim registry content (no behavior change). */
private[graft] trait EntryWeb extends EntryContext {

  protected def webQueries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // ---- north-star: excess-loss domain mixture (DoReMi-lite) — the
    //      reference LM's per-source mean NLL → softmax upweighting of
    //      hard domains; |sources| rows of broadcast arithmetic.
    "q111_domain_mixture" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      graft.ops.Sampling.excessLossWeights(
        graft.ops.LanguageModel.meanNegLogLik(docs, "text", "doc_id")
          .join(docs.select("doc_id", "source"), "doc_id"),
        "source", "nll", temperature = 0.25)
    }),



    // ---- north-star: HTML main-content extraction — jusText-family
    //      block classification (ancestor tags + link density + length
    //      floor) as a codegen kernel; the synthesized page buries each
    //      doc's text in nav/header/aside/footer soup and extraction
    //      must recover it byte-for-byte, which the oracle checks
    //      without parsing HTML (n_exact must equal n_docs).
    "q140_html_extract" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      docs.select(col("doc_id"), col("text"),
          graft.functions.GraftFunctions.htmlMain(
            s, syntheticPage(col("doc_id"), col("text")), minChars = 5)
            .as("extracted"))
        .groupBy((col("doc_id") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("extracted") === col("text"), 1L).otherwise(0L))
            .as("n_exact"),
          sum(length(col("extracted"))).as("sum_chars"))
    }),



    // ---- north-star: web-corpus pipeline composition — render (with a
    //      seeded duplicate crawl of every 3rd doc) → extract main
    //      content → token-count quality fence → exact-dedup count; the
    //      whole chain replays in the oracle AS IF extraction were
    //      identity, which q140 proves it is.
    "q141_web_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val pages = docs.unionByName(docs.filter(col("doc_id") % 3 === 0))
      val extracted = pages.select(
        graft.functions.GraftFunctions.htmlMain(
          s, syntheticPage(col("doc_id"), col("text")), minChars = 5)
          .as("text"))
      extracted
        .filter(graft.functions.GraftFunctions.tokenCount(s, col("text")) >= 20)
        .agg(
          count(lit(1)).as("n_pages_kept"),
          countDistinct(col("text")).as("n_unique"))
    }),



    // ---- north-star: URL canonicalization — RFC 3986 syntax
    //      normalization + crawl extras (case, default ports,
    //      fragments, tracking params) and registrable-domain
    //      extraction; messy URLs are synthesized constructively so
    //      the oracle knows the clean form WITHOUT normalizing
    //      (n_exact must equal n_urls — the q140 pattern).
    "q142_url_normalize" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val tlds = array(lit("com"), lit("org"), lit("net"), lit("co.uk"), lit("de"))
      val tld = element_at(tlds, (col("doc_id") % 5 + 1).cast("int"))
      val subs = array(lit(""), lit("WWW."), lit("CDN.Assets."))
      val sub = element_at(subs, (col("doc_id") % 3 + 1).cast("int"))
      val port = when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(""))
      val messy = concat(lit("HTTP://"), sub, lit("Site"), col("doc_id") % 11,
        lit("."), upper(tld), port, lit("/Doc/"), col("doc_id"),
        lit("?utm_source=feed&id="), col("doc_id"), lit("&gclid=XYZ#frag"))
      val expected = concat(lit("http://"), lower(sub), lit("site"),
        col("doc_id") % 11, lit("."), tld, lit("/Doc/"), col("doc_id"),
        lit("?id="), col("doc_id"))
      docs.select(col("doc_id"), tld.as("tld"),
          graft.ops.UrlOps.normalizeUrl(messy).as("norm"),
          expected.as("expected"),
          graft.ops.UrlOps.registrableDomain(
            graft.ops.UrlOps.hostOf(messy)).as("dom"))
        .groupBy("tld")
        .agg(
          count(lit(1)).as("n_urls"),
          sum(when(col("norm") === col("expected"), 1L).otherwise(0L))
            .as("n_exact"),
          countDistinct(col("dom")).as("n_domains"),
          sum(col("doc_id")).as("sum_ids"))
    }),



    // ---- north-star: per-domain page caps — the crawl-balance step
    //      (no domain may dominate the corpus); selection by salted
    //      md5 hash order so the oracle replays the winner set exactly,
    //      small domains skip the window, seeded hot domains exercise
    //      the capped path.
    "q143_domain_cap" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val domNum = when(col("doc_id") % 3 === 0, col("doc_id") % 10)
        .otherwise(col("doc_id") % 200)
      val urls = docs.select(col("doc_id"),
        concat(lit("http://d"), domNum, lit(".com/p/"), col("doc_id")).as("url"))
      graft.ops.UrlOps.domainCap(urls, "url", cap = 5, salt = "domcap")
        .agg(
          count(lit(1)).as("n_kept"),
          countDistinct(graft.ops.UrlOps.registrableDomain(
            graft.ops.UrlOps.hostOf(col("url")))).as("n_domains"),
          sum(col("doc_id")).as("sum_ids"))
    }),



    // ---- north-star: robots.txt crawl-policy gate (RFC 9309) — rules
    //      parse once per host, per-URL decisions at scan speed;
    //      synthesized policies exercise group selection (specific
    //      agent over *), longest-match allow-over-disallow, wildcard
    //      + end-anchor patterns, and the missing-robots default. The
    //      oracle replays the DECISIONS constructively (it knows which
    //      (host, path) cases are legal by design), never parsing.
    "q144_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents")
      val stdPolicy =
        """# graft crawl policy
          |User-Agent: *
          |Disallow: /private/
          |Allow: /private/pub*
          |Disallow: /*.tmp$""".stripMargin
      val botPolicy =
        "User-agent: graftbot\nDisallow: /\n\nUser-agent: *\nAllow: /"
      val robots = Seq(
        ("h0.com", stdPolicy), ("h1.com", stdPolicy), ("h3.com", botPolicy))
        .toDF("host", "robots_txt")
      val path = element_at(array(
          concat(lit("/public/doc"), col("doc_id")),
          concat(lit("/private/doc"), col("doc_id")),
          concat(lit("/private/pub"), col("doc_id")),
          concat(lit("/cache/doc"), col("doc_id"), lit(".tmp")),
          concat(lit("/docs/doc"), col("doc_id"), lit(".html"))),
        (col("doc_id") % 5 + 1).cast("int"))
      val urls = docs.select(col("doc_id"),
        concat(lit("http://h"), col("doc_id") % 4, lit(".com"), path).as("url"))
      graft.ops.Robots.filterAllowed(s, urls, "url", robots, "graftbot")
        .groupBy(regexp_extract(col("url"), "http://([^/]+)/", 1).as("host"))
        .agg(count(lit(1)).as("n_allowed"), sum(col("doc_id")).as("sum_ids"))
    }),



    // ---- north-star: crawl-payload triage — magic-byte MIME sniffing
    //      (WHATWG pattern set), charset cascade (BOM → meta charset →
    //      UTF-8 validation → windows-1252), per-row-charset decode;
    //      payloads synthesized constructively per doc (plain text,
    //      HTML, BOM'd text, PNG magic, PDF header, latin-1 bytes) so
    //      every sniff/detect/decode outcome is known by design.
    "q145_payload_triage" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val m = col("doc_id") % 6
      val utf8 = encode(col("text"), "UTF-8")
      val bom = lit(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
      val pngJunk = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G',
        0x0d, 0x0a, 0x1a, 0x0a, 1, 2, 3, 4))
      val latin1Tail = lit(Array(0xE9.toByte)) // 'é' in windows-1252
      val payload = when(m === 0, utf8)
        .when(m === 1, encode(concat(lit("<html><body>"), col("text")), "UTF-8"))
        .when(m === 2, concat(bom, utf8))
        .when(m === 3, pngJunk)
        .when(m === 4, encode(concat(lit("%PDF-1.4 "), col("text")), "UTF-8"))
        .otherwise(concat(utf8, latin1Tail))
      val expectMime = element_at(array(
        lit("text/plain"), lit("text/html"), lit("text/plain"),
        lit("image/png"), lit("application/pdf"), lit("text/plain")),
        (m + 1).cast("int"))
      val expectCs = element_at(array(
        lit("utf-8"), lit("utf-8"), lit("utf-8"),
        lit("windows-1252"), lit("utf-8"), lit("windows-1252")),
        (m + 1).cast("int"))
      val expectText = when(m === 0 || m === 2, col("text"))
        .when(m === 1, concat(lit("<html><body>"), col("text")))
        .when(m === 4, concat(lit("%PDF-1.4 "), col("text")))
        .when(m === 5, concat(col("text"), lit("é")))
      val g = graft.functions.GraftFunctions
      docs.select(m.as("bucket"),
          g.sniffMime(s, payload).as("mime"),
          g.detectCharset(s, payload).as("cs"),
          g.decodeText(s, payload).as("decoded"),
          expectMime.as("em"), expectCs.as("ec"), expectText.as("et"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_payloads"),
          sum(when(col("mime") === col("em"), 1L).otherwise(0L)).as("n_mime_ok"),
          sum(when(col("cs") === col("ec"), 1L).otherwise(0L)).as("n_charset_ok"),
          sum(when(col("bucket") === 3 || col("decoded") === col("et"), 1L)
            .otherwise(0L)).as("n_decode_ok"))
    }),



    // ---- north-star: page-title metadata extraction — the corpus
    //      record's metadata field beside the extracted body
    //      (trafilatura's metadata step); the synthesized page titles
    //      each doc "Doc <id>", so recovery is constructive.
    "q147_html_title" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      docs.select(col("doc_id"),
          graft.functions.GraftFunctions.htmlTitle(
            s, syntheticPage(col("doc_id"), col("text"))).as("title"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("title") === concat(lit("Doc "), col("doc_id")), 1L)
            .otherwise(0L)).as("n_title_ok"),
          countDistinct(col("title")).as("n_unique"))
    }),



    // ---- north-star: PII audit — the privacy-prevalence report a
    //      corpus release runs first. PII is synthesized
    //      constructively (modular conditions pick which docs get an
    //      email / structured phone / IPv4 / Luhn-valid card — plus a
    //      Luhn-INVALID 16-digit decoy that must count as NOTHING), so
    //      the oracle is pure arithmetic on doc_id while the kernel
    //      must actually find every span.
    "q148_pii_audit" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      docs.select((id % 7).as("bucket"),
          graft.functions.GraftFunctions.piiStats(s, piiMessy(id)).as("st"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(element_at(col("st"), 1)).as("n_email"),
          sum(element_at(col("st"), 2)).as("n_phone"),
          sum(element_at(col("st"), 3)).as("n_ipv4"),
          sum(element_at(col("st"), 4)).as("n_card"))
    }),



    // ---- north-star: crawl-snapshot delta — the monthly-recrawl
    //      diff (drop 1/13, edit 1/5, add 1/11 by construction) that
    //      gates incremental ingest; classification is scan-side
    //      xxhash64 + one full-outer key join, and the oracle knows
    //      every status from the arithmetic.
    "q153_crawl_delta" -> ((s, dir) => {
      val base = T(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val id = col("doc_id")
      val next = base.filter(id % 13 =!= 0)
        .select(id.as("doc_id"),
          when(id % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(base.filter(id % 11 === 0)
          .select((id + 1000000L).as("doc_id"), col("text")))
      graft.ops.SnapshotDiff.diff(base, next, "doc_id", Seq("text"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum(col("key")).as("sum_keys"))
    }),



    // ---- north-star: sitemap staleness — crawl DISCOVERY: each host
    //      publishes a constructive urlset (entities in locs, absent
    //      lastmod on 1/9 of entries, namespace/priority noise); the
    //      kernel's extraction joins the fetch ledger to find stale
    //      pages. Dates are day-of-month arithmetic, so staleness is
    //      known by construction.
    "q154_sitemap_stale" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      val host = concat(lit("h"), id % 10, lit(".example"))
      val lastmodDay = id % 27 + 1
      val entry = concat(
        lit("<url>\n  <loc>https://"), host, lit("/doc/"), id,
        lit("?a=1&amp;b=2</loc>"),
        when(id % 9 =!= 0,
          concat(lit("<lastmod>2026-01-"), lpad(lastmodDay.cast("string"), 2, "0"),
            lit("</lastmod>"))).otherwise(lit("")),
        lit("<priority>0.5</priority></url>"))
      val sitemaps = docs
        .groupBy((id % 10).as("hostnum"))
        .agg(concat(
          lit("<?xml version=\"1.0\"?><urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          array_join(collect_list(entry), "\n"), lit("</urlset>")).as("xml"))
      val extracted = sitemaps.select(col("hostnum"),
          explode(graft.functions.GraftFunctions.sitemapUrls(s, col("xml"))).as("u"))
        .select(col("hostnum"),
          regexp_extract(col("u.loc"), "/doc/([0-9]+)\\?", 1).cast("long").as("doc_id"),
          col("u.lastmod").as("lastmod"))
      val ledger = docs.select(id.as("doc_id"),
        concat(lit("2026-01-"),
          lpad(((id * 3) % 27 + 1).cast("string"), 2, "0")).as("fetched"))
      extracted.join(ledger, "doc_id")
        .groupBy("hostnum")
        .agg(
          count(lit(1)).as("n_urls"),
          sum(when(col("lastmod") === "", 1L).otherwise(0L)).as("n_nolastmod"),
          sum(when(col("lastmod") > col("fetched"), 1L).otherwise(0L)).as("n_stale"),
          sum(when(col("lastmod") > col("fetched"), col("doc_id"))).as("sum_stale"))
    }),



    // ---- north-star: politeness schedule — per-host fetch slots
    //      (seq within host by URL order, eta = seq × crawl-delay) and
    //      the capacity rollup; the oracle replays the same
    //      row_number arithmetic.
    "q155_crawl_schedule" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      val frontier = docs.select(
        concat(lit("d"), id % 50, lit(".example")).as("host"),
        concat(lit("https://d"), id % 50, lit(".example/p/"),
          lpad(id.cast("string"), 6, "0")).as("url"),
        (id % 50 % 5 + 1).cast("long").as("delay_s"))
      val sched = graft.ops.Crawl.politeSchedule(
        frontier, "host", "url", "delay_s")
      graft.ops.Crawl.hostLoad(sched, "host", "delay_s")
        .groupBy((length(col("host")) % 3).as("bucket"))
        .agg(
          count(lit(1)).as("n_hosts"),
          sum(col("n_urls")).as("n_urls"),
          sum(col("makespan_s")).as("sum_makespan"),
          round(sum(col("mean_wait_s")), 6).as("sum_mean_wait"),
          sum(col("delay_s")).as("sum_delay"))
    }),



    // ---- north-star: crawl-PLANNING capstone — discover (sitemap
    //      kernel) → staleness fence (refetch stale or lastmod-less)
    //      → robots policy (per-host mix: std rules on even hosts,
    //      bot-ban on h3/h7, no robots = allow on the rest) →
    //      stale-first politeness schedule capped at 30 slots/host.
    //      Every stage is constructive, so the oracle replays the
    //      whole plan arithmetically.
    "q156_crawl_plan" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      val h = id % 10
      val host = concat(lit("h"), h, lit(".example"))
      // path case from id/10 so EVERY host sees all five path shapes
      // (id%5 would be constant per host: id ≡ h (mod 10) ⇒ mod 5 too)
      val pc = floor(id / 10) % 5
      val path = element_at(array(
        concat(lit("/public/doc"), id),
        concat(lit("/private/doc"), id),
        concat(lit("/private/pub"), id),
        concat(lit("/cache/doc"), id, lit(".tmp")),
        concat(lit("/docs/doc"), id, lit(".html"))), (pc + 1).cast("int"))
      val entry = concat(lit("<url><loc>https://"), host, path, lit("</loc>"),
        when(id % 9 =!= 0,
          concat(lit("<lastmod>2026-01-"), lpad((id % 27 + 1).cast("string"), 2, "0"),
            lit("</lastmod>"))).otherwise(lit("")),
        lit("</url>"))
      val sitemaps = docs.groupBy(h.as("hostnum"))
        .agg(concat(lit("<urlset>"), array_join(collect_list(entry), ""),
          lit("</urlset>")).as("xml"))
      val urls = sitemaps.select(col("hostnum"),
          explode(graft.functions.GraftFunctions.sitemapUrls(s, col("xml"))).as("u"))
        .select(col("hostnum"), col("u.loc").as("url"), col("u.lastmod").as("lastmod"),
          regexp_extract(col("u.loc"), "([0-9]+)(?:\\.tmp|\\.html)?$", 1)
            .cast("long").as("doc_id"))
      val ledger = docs.select(id.as("doc_id"),
        concat(lit("2026-01-"),
          lpad(((id * 3) % 27 + 1).cast("string"), 2, "0")).as("fetched"))
      val due = urls.join(ledger, "doc_id")
        .filter(col("lastmod") === "" || col("lastmod") > col("fetched"))
      val stdPolicy =
        """# graft crawl policy
          |User-Agent: *
          |Disallow: /private/
          |Allow: /private/pub*
          |Disallow: /*.tmp$""".stripMargin
      val botPolicy =
        "User-agent: graftbot\nDisallow: /\n\nUser-agent: *\nAllow: /"
      val robots = (0 to 9).flatMap { hh =>
        if (hh % 4 == 3) Some((s"h$hh.example", botPolicy))
        else if (hh % 2 == 0) Some((s"h$hh.example", stdPolicy))
        else None
      }.toDF("host", "robots_txt")
      val allowed = graft.ops.Robots.filterAllowed(s, due, "url", robots, "graftbot")
      val prioritized = allowed
        .withColumn("prio", when(col("lastmod") === "", 1).otherwise(0))
        .withColumn("host", concat(lit("h"), col("hostnum"), lit(".example")))
        .withColumn("delay_s", (col("hostnum") % 5 + 1))
      val sched = graft.ops.Crawl.politeSchedule(
        prioritized, "host", "url", "delay_s", Some("prio"))
      sched.filter(col("seq") < 30)
        .groupBy("hostnum")
        .agg(
          count(lit(1)).as("n_fetch"),
          max(col("eta_s")).as("makespan_s"),
          sum(col("doc_id")).as("sum_ids"),
          sum(when(col("prio") === 0, 1L).otherwise(0L)).as("n_stale"))
    }),



    // ---- north-star: anchor-text aggregation — the web's description
    //      of each page (modal anchor per target with deterministic
    //      tie-break); targets collect 'ref one'/'ref two'/'ref &
    //      three' votes through q150's formulas, and the oracle
    //      replays the same mode arithmetic.
    "q157_anchor_text" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val nRow = docs.agg(count(lit(1)).as("__n"))
      val id = col("doc_id")
      val page = concat(
        lit("<html><body><article><p>See <a href=\"/doc/"), (id * 2 + 1) % col("__n"),
        lit("\">ref one</a> <a href=\"/doc/"), (id * 3 + 2) % col("__n"),
        lit("\">ref two</a> and <a href=\"/doc/"), (id * 7 + 5) % col("__n"),
        lit("\">ref &amp; three</a>.</p></article></body></html>"))
      val edges = docs.crossJoin(broadcast(nRow))
        .select(id.as("src"),
          explode(graft.functions.GraftFunctions.htmlAnchors(s, page)).as("a"))
        .select(col("src"),
          regexp_extract(col("a.href"), "^/doc/([0-9]+)$", 1).cast("long").as("dst"),
          col("a.anchor").as("anchor"))
      graft.ops.LinkGraph.topAnchors(edges, "dst", "anchor")
        .groupBy((col("id") % 5).as("bucket"))
        .agg(
          count(lit(1)).as("n_targets"),
          sum(col("n_links")).as("n_links"),
          sum(col("n_distinct_anchors")).as("sum_distinct"),
          sum(when(col("top_anchor") === "ref one", 1L).otherwise(0L)).as("n_top_one"),
          sum(when(col("top_anchor") === "ref & three", 1L).otherwise(0L)).as("n_top_amp"),
          sum(col("top_count")).as("sum_top"))
    }),



    // ---- north-star: robots-fed politeness — Crawl-delay parsed per
    //      host (agent-specific group beats '*'; absent → crawler
    //      default) feeds the schedule, closing the robots → scheduler
    //      loop; makespans are slot-set arithmetic for the oracle.
    "q163_robots_politeness" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      val robots = (0 to 9).flatMap { h =>
        if (h % 3 == 0) Some((s"d$h.example",
          s"User-agent: *\nCrawl-delay: ${h % 5 + 2}\nDisallow: /private/"))
        else if (h % 3 == 1) Some((s"d$h.example",
          "User-agent: graftbot\nCrawl-delay: 10\n\nUser-agent: *\nCrawl-delay: 1"))
        else None // h%3==2: no robots -> crawler default
      }.toDF("host", "robots_txt")
      val frontier = docs.select(
        concat(lit("d"), id % 10, lit(".example")).as("host"),
        concat(lit("https://d"), id % 10, lit(".example/p/"),
          lpad(id.cast("string"), 6, "0")).as("url"))
      val delays = robots.select(col("host"),
        graft.ops.Robots.crawlDelayFor(s, col("robots_txt"), "graftbot").as("rd"))
      val planned = frontier.join(broadcast(delays), Seq("host"), "left")
        .withColumn("delay_s", coalesce(col("rd"), lit(1.0)))
      val sched = graft.ops.Crawl.politeSchedule(planned, "host", "url", "delay_s")
      graft.ops.Crawl.hostLoad(sched, "host", "delay_s")
        .withColumn("hostnum",
          regexp_extract(col("host"), "^d([0-9]+)\\.", 1).cast("long"))
        .groupBy((col("hostnum") % 3).as("bucket"))
        .agg(
          count(lit(1)).as("n_hosts"),
          sum(col("n_urls")).as("n_urls"),
          round(sum(col("makespan_s")), 6).as("sum_makespan"),
          round(sum(col("delay_s")), 6).as("sum_delay"))
    }),



    // ---- north-star: accent-fold canonicalization — accents are
    //      INJECTED constructively (translate aeiou→áéíóü on half the
    //      corpus), so the fold must recover the original text
    //      byte-exactly (n_exact = n_docs) while the untouched half
    //      proves the ASCII fast path returns identity; cross-accent
    //      dedup is the composition: distinct folded == distinct raw.
    "q164_accent_fold" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      val accented = when(id % 2 === 0,
        translate(col("text"), "aeiou", "áéíóü"))
        .otherwise(col("text"))
      docs.select((id % 7).as("bucket"), col("text"),
          graft.functions.GraftFunctions.foldAccents(s, accented).as("folded"),
          accented.as("accented"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("folded") === col("text"), 1L).otherwise(0L)).as("n_exact"),
          countDistinct(col("folded")).as("n_distinct_folded"),
          countDistinct(col("text")).as("n_distinct_raw"),
          sum(length(col("accented"))).as("sum_acc_chars"))
    }),



    // ---- north-star: meta-robots / rel=canonical corpus fence — the
    //      page-level directives robots.txt cannot express: pages
    //      served with "noindex" (or the "none" shorthand) must not
    //      enter the corpus, and pages declaring a DIFFERENT canonical
    //      URL are self-identified duplicates. Directives injected
    //      constructively (messy case, unquoted/single-quoted attrs),
    //      so the oracle is pure doc_id arithmetic while the kernel
    //      must actually parse every page.
    "q175_meta_robots_fence" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      val url = concat(lit("https://corpus.local/d/"), id)
      val meta = when(id % 5 === 0,
          lit("<meta name=\"robots\" content=\"noindex, follow\">"))
        .when(id % 5 === 1, lit("<meta NAME=\"ROBOTS\" Content=\"nofollow\">"))
        .when(id % 5 === 2, lit("<meta name=robots content=none>"))
        .otherwise(lit(""))
      val link = when(id % 7 === 0,
          concat(lit("<link rel=\"canonical\" href=\"https://corpus.local/d/"),
            floor(id / 7).cast("long"), lit("\">")))
        .when(id % 7 === 3,
          concat(lit("<link REL=\"Canonical\" HREF='https://corpus.local/d/"),
            id, lit("'>")))
        .otherwise(lit(""))
      val page = concat(syntheticPage(id, col("text")), meta, link)
      val keep = !col("noindex") &&
        (col("canonical").isNull || col("canonical") === col("url"))
      docs.select(id.as("doc_id"), url.as("url"),
          graft.functions.GraftFunctions.pageDirectives(s, page).as("d"))
        .select(col("doc_id"), col("url"),
          col("d.noindex").as("noindex"), col("d.nofollow").as("nofollow"),
          col("d.canonical").as("canonical"))
        .agg(
          count(lit(1)).as("n_pages"),
          sum(when(col("noindex"), 1L).otherwise(0L)).as("n_noindex"),
          sum(when(col("nofollow"), 1L).otherwise(0L)).as("n_nofollow"),
          sum(when(col("canonical").isNotNull &&
            col("canonical") =!= col("url"), 1L).otherwise(0L))
            .as("n_cross_canonical"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
          sum(when(keep, col("doc_id")).otherwise(0L)).as("sum_kept_ids"))
    }),



    // ---- north-star: Unicode-script audit — one-pass per-script
    //      code-point counts (pinned BMP block ranges, kernel codegen)
    //      with constructively injected multilingual suffixes; the
    //      dominant-script argmax and mixed-script flag are the same
    //      CASE arithmetic on both engines, and the oracle recovers
    //      each count with one [^range] regex per class.
    "q184_script_audit" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val id = col("doc_id")
      // id%3=0 docs keep ONLY the injected script (their dominant IS
      // the script); the rest append it to the latin base (mixed, but
      // latin-dominant) — so every class appears as a dominant group
      val scripted = concat(
        when(id % 7 =!= 0 && id % 3 === 0, lit("")).otherwise(col("text")),
        when(id % 7 === 1, lit(" Привет мир 2024"))
          .when(id % 7 === 2, lit(" Ελληνικά κείμενο"))
          .when(id % 7 === 3, lit(" مرحبا بالعالم"))
          .when(id % 7 === 4, lit(" שלום עולם"))
          .when(id % 7 === 5, lit(" नमस्ते दुनिया"))
          .when(id % 7 === 6, lit(" 你好世界 ありがとう 한국어"))
          .otherwise(lit("")))
      val prof = docs
        .select(id.as("doc_id"),
          graft.functions.GraftFunctions.scriptProfile(s, scripted).as("p"))
        .select(col("doc_id"), col("p.*"))
      val letters = Seq("n_latin", "n_cyrillic", "n_greek", "n_arabic",
        "n_hebrew", "n_devanagari", "n_cjk")
      // first class >= all LATER classes = deterministic argmax with
      // ties toward the earlier class — identical chain in the oracle
      val dominant = expr(
        """CASE
          |  WHEN n_latin >= n_cyrillic AND n_latin >= n_greek
          |    AND n_latin >= n_arabic AND n_latin >= n_hebrew
          |    AND n_latin >= n_devanagari AND n_latin >= n_cjk THEN 'latin'
          |  WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_arabic
          |    AND n_cyrillic >= n_hebrew AND n_cyrillic >= n_devanagari
          |    AND n_cyrillic >= n_cjk THEN 'cyrillic'
          |  WHEN n_greek >= n_arabic AND n_greek >= n_hebrew
          |    AND n_greek >= n_devanagari AND n_greek >= n_cjk THEN 'greek'
          |  WHEN n_arabic >= n_hebrew AND n_arabic >= n_devanagari
          |    AND n_arabic >= n_cjk THEN 'arabic'
          |  WHEN n_hebrew >= n_devanagari AND n_hebrew >= n_cjk THEN 'hebrew'
          |  WHEN n_devanagari >= n_cjk THEN 'devanagari'
          |  ELSE 'cjk' END""".stripMargin)
      val mixed = letters.map(c =>
        when(col(c) > 0, 1L).otherwise(0L)).reduce(_ + _) >= 2
      prof
        .withColumn("dominant", dominant)
        .withColumn("mixed", when(mixed, 1L).otherwise(0L))
        .groupBy("dominant")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("mixed")).as("n_mixed"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_digit")).as("sum_digits"),
          sum(col("n_other")).as("sum_other"))
    }),



    // ---- north-star: crawl-trap audit — the URL-shape fence a
    //      frontier runs BEFORE fetching: mirrored path cycles,
    //      runaway depth, and facet/session parameter explosions are
    //      detected per URL by real parsing (try_parse_url + codegen
    //      array lambdas); the fixture builds each trap shape
    //      constructively, so the oracle is pure doc_id arithmetic
    //      while the Spark side must actually parse.
    "q204_crawl_traps" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val id = col("doc_id")
      val (m3, m12, m15) = (id % 3, id % 12, id % 15)
      val host = concat(lit("h"), (id % 7).cast("string"), lit(".example"))
      val path = when(id % 4 === 0,
          array_join(transform(sequence(lit(1), m3 + 2), _ => lit("a/b")), "/"))
        .when(id % 4 === 1,
          array_join(transform(sequence(lit(0), m12),
            i => concat(lit("s"), i.cast("string"))), "/"))
        .when(id % 4 === 2,
          concat(lit("p?"), array_join(transform(sequence(lit(1), m15 + 1),
            i => concat(lit("p"), i.cast("string"), lit("=1"))), "&")))
        .otherwise(concat(lit("docs/x"), id.cast("string")))
      val urls = docs.select(id, concat(lit("http://"), host, lit("/"), path)
        .as("url"))
      graft.ops.UrlOps.trapAudit(urls, "url")
        .groupBy("host")
        .agg(
          count(lit(1)).as("n_urls"),
          sum(when(col("is_trap"), 1L).otherwise(0L)).as("n_traps"),
          sum(col("depth")).as("sum_depth"),
          max(col("depth")).as("max_depth"),
          sum(col("n_params")).as("sum_params"),
          max(col("max_repeat")).as("max_rep"),
          sum(id).as("sum_ids"))
    }),



    // ---- north-star: host-scoped boilerplate removal (the
    //      CCNet/FineWeb cleaner) — NAV chrome injected on every page
    //      of its host (freq 1.0 → scrubbed), PROMO on 25% of pages
    //      (kept), the unique content line always kept; per-(host,
    //      line) distinct-page frequencies, doc-bounded rebuild.
    "q234_host_boilerplate" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val host = concat(lit("h"), (col("doc_id") % 5).cast("string"))
      val page = concat(lit("NAV "), host, lit("\n"), col("text"),
        when(col("doc_id") % 4 === 0, lit("\nPROMO")).otherwise(lit("")))
      graft.ops.TextOps.hostBoilerplateScrub(
        docs.select(col("doc_id"), host.as("host"), page.as("page")),
        "page", "doc_id", "host", minPages = 3L, maxFrac = 0.5)
    }),



    // ---- north-star: URL query-parameter audit — the data-driven
    //      strip list beside q142's static one: per-URL-unique params
    //      (session ids / cache busters) flag `strip`, low-cardinality
    //      ones keep, thin evidence abstains.
    "q252_param_audit" -> ((s, dir) => {
      val urls = T(s, dir, "documents").select(concat(
        lit("https://h"), (col("doc_id") % 4).cast("string"),
        lit(".example.com/p/"), (col("doc_id") % 7).cast("string"),
        lit("?sid="), md5(col("doc_id").cast("string")),
        lit("&page="), (col("doc_id") % 3).cast("string"),
        when(col("doc_id") % 5 === 0, lit("&ref=mail")).otherwise(lit("")))
        .as("url"))
      graft.ops.UrlOps.paramAudit(urls, "url",
        minUrls = 10L, stripRatio = 0.9)
    }),



    // ---- north-star: freshness-aware revisit scheduling (Cho &
    //      Garcia-Molina) — Poisson change-rate MLE from synthetic
    //      visit histories → clamped re-crawl cadence; continuity
    //      correction at the always-changed boundary.
    "q259_revisit" -> ((s, dir) => {
      val hist = T(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 13 === 0, lit(2L))
          .otherwise(lit(4L) + col("doc_id") % 10).as("visits"),
        when(col("doc_id") % 17 === 0,
          when(col("doc_id") % 13 === 0, lit(2L))
            .otherwise(lit(4L) + col("doc_id") % 10))
          .otherwise(col("doc_id") % 5).as("changes"))
      graft.ops.Crawl.revisitSchedule(hist, "visits", "changes",
        baseDays = 1.0, minDays = 0.25, maxDays = 60.0, minVisits = 4L)
    })
  )

  protected def webOracles: Map[String, String] = Map(


    // meta-robots fence replay: the injected directives are modular in
    // doc_id, so the fence is pure arithmetic — noindex for %5 in
    // {0 ("noindex, follow"), 2 ("none")}, nofollow for %5 in {1, 2},
    // cross-canonical for %7 = 0 except the self-targeting doc 0
    "q175_meta_robots_fence" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    (doc_id % 5 = 0 OR doc_id % 5 = 2) AS noindex,
        |    (doc_id % 5 = 1 OR doc_id % 5 = 2) AS nofollow,
        |    CASE WHEN doc_id % 7 = 0
        |           THEN 'https://corpus.local/d/' || CAST(doc_id // 7 AS VARCHAR)
        |         WHEN doc_id % 7 = 3
        |           THEN 'https://corpus.local/d/' || CAST(doc_id AS VARCHAR)
        |    END AS canonical,
        |    'https://corpus.local/d/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents WHERE text IS NOT NULL),
        |k AS (SELECT doc_id, noindex, nofollow, canonical, url,
        |        (NOT noindex AND (canonical IS NULL OR canonical = url)) AS keep
        |      FROM p)
        |SELECT count(*) AS n_pages,
        |  CAST(sum(CASE WHEN noindex THEN 1 ELSE 0 END) AS BIGINT) AS n_noindex,
        |  CAST(sum(CASE WHEN nofollow THEN 1 ELSE 0 END) AS BIGINT) AS n_nofollow,
        |  CAST(sum(CASE WHEN canonical IS NOT NULL AND canonical <> url
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_canonical,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT)
        |    AS sum_kept_ids
        |FROM k""".stripMargin,



    // crawl-trap replay: every trap shape is constructive, so depth /
    // repeat / params are doc_id arithmetic; thresholds depth>8,
    // repeat>=3, params>10
    "q204_crawl_traps" ->
      """WITH x AS (
        |  SELECT doc_id,
        |    'h' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 2 * (doc_id % 3 + 2)
        |      WHEN 1 THEN doc_id % 12 + 1
        |      WHEN 2 THEN 1
        |      ELSE 2 END AS depth,
        |    CASE WHEN doc_id % 4 = 0 THEN doc_id % 3 + 2 ELSE 1 END AS rep,
        |    CASE WHEN doc_id % 4 = 2 THEN doc_id % 15 + 1 ELSE 0 END AS params
        |  FROM documents)
        |SELECT host, count(*) AS n_urls,
        |  CAST(sum(CASE WHEN depth > 8 OR rep >= 3 OR params > 10
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_traps,
        |  CAST(sum(depth) AS BIGINT) AS sum_depth,
        |  CAST(max(depth) AS BIGINT) AS max_depth,
        |  CAST(sum(params) AS BIGINT) AS sum_params,
        |  CAST(max(rep) AS BIGINT) AS max_rep,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM x GROUP BY host""".stripMargin,



    // domain-mixture oracle: q68's corpus NLL per doc → per-source
    // means → exact softmax over the excess vs the easiest source
    "q111_domain_mixture" ->
      s"""WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |c AS (SELECT tok, count(*) AS c FROM e GROUP BY tok),
         |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c),
         |nll AS (SELECT doc_id, round(avg(-ln(CAST(c AS DOUBLE) / n)), 6) AS nll
         |        FROM e JOIN c USING (tok), n GROUP BY doc_id),
         |ms AS (SELECT d.source, round(avg(nll.nll), 6) AS mean_score
         |       FROM nll JOIN documents d USING (doc_id) GROUP BY d.source),
         |mn AS (SELECT min(mean_score) AS m FROM ms),
         |ex AS (SELECT source, mean_score, exp((mean_score - mn.m) / 0.25) AS e
         |       FROM ms, mn),
         |z AS (SELECT sum(e) AS z FROM ex)
         |SELECT source, mean_score, round(e / z.z, 6) AS weight FROM ex, z""".stripMargin,



    // host-boilerplate replay: constructive pages, per-(host, line)
    // distinct-page frequencies, ordered surviving-line rebuild
    "q234_host_boilerplate" ->
      """WITH pages AS (SELECT doc_id,
        |    'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
        |    'NAV h' || CAST(doc_id % 5 AS VARCHAR) || chr(10) || text ||
        |      CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'PROMO'
        |           ELSE '' END AS page
        |  FROM documents WHERE text IS NOT NULL),
        |split0 AS (SELECT doc_id, host, string_split(page, chr(10)) AS l
        |           FROM pages),
        |lines AS (SELECT doc_id, host, gi AS p,
        |    md5(l[CAST(gi AS INT)]) AS h
        |  FROM split0, unnest(generate_series(1, len(l))) AS u(gi)),
        |hp AS (SELECT host, count(DISTINCT doc_id) AS np
        |       FROM pages GROUP BY host),
        |lf AS (SELECT host, h, count(DISTINCT doc_id) AS nl
        |       FROM lines GROUP BY host, h),
        |boiler AS (SELECT lf.host, lf.h
        |  FROM lf JOIN hp ON hp.host = lf.host
        |  WHERE hp.np >= 3 AND CAST(lf.nl AS DOUBLE) >= 0.5 * hp.np),
        |kept AS (SELECT li.doc_id, li.p, li.h
        |  FROM lines li LEFT JOIN boiler b
        |    ON b.host = li.host AND b.h = li.h
        |  WHERE b.h IS NULL),
        |rebuilt AS (SELECT s.doc_id,
        |    coalesce(string_agg(s.l[CAST(k.p AS INT)], chr(10)
        |      ORDER BY k.p), '') AS clean,
        |    any_value(len(s.l)) AS n_before,
        |    count(k.p) AS n_after
        |  FROM split0 s LEFT JOIN kept k ON k.doc_id = s.doc_id
        |  GROUP BY s.doc_id)
        |SELECT doc_id, clean, CAST(n_before AS BIGINT) AS n_before,
        |  CAST(n_after AS BIGINT) AS n_after
        |FROM rebuilt""".stripMargin,



    // param-audit replay: the constructive URL recipe re-derived as
    // (host, param, value) rows directly, then the same counts and
    // rounded-ratio verdicts
    "q252_param_audit" ->
      """WITH b AS (SELECT doc_id,
        |    'h' || CAST(doc_id % 4 AS VARCHAR) || '.example.com' AS host
        |  FROM documents),
        |p AS (
        |  SELECT host, 'sid' AS param,
        |    md5(CAST(doc_id AS VARCHAR)) AS value FROM b
        |  UNION ALL
        |  SELECT host, 'page', CAST(doc_id % 3 AS VARCHAR) FROM b
        |  UNION ALL
        |  SELECT host, 'ref', 'mail' FROM b WHERE doc_id % 5 = 0),
        |g AS (SELECT host, param, count(*) AS n_urls,
        |    count(DISTINCT value) AS n_values FROM p GROUP BY 1, 2)
        |SELECT host, param, n_urls, n_values,
        |  round(CAST(n_values AS DOUBLE) / n_urls, 6) AS distinct_ratio,
        |  CASE WHEN n_urls < 10 THEN 'low_evidence'
        |    WHEN round(CAST(n_values AS DOUBLE) / n_urls, 6) >= 0.9
        |      THEN 'strip'
        |    ELSE 'keep' END AS verdict
        |FROM g""".stripMargin,



    // revisit replay: the same synthetic history, the Poisson MLE with
    // the continuity-corrected boundary, clamps, and verdict fences
    "q259_revisit" ->
      """WITH h AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN 2
        |      ELSE 4 + doc_id % 10 END AS visits,
        |    CASE WHEN doc_id % 17 = 0 THEN
        |        CASE WHEN doc_id % 13 = 0 THEN 2 ELSE 4 + doc_id % 10 END
        |      ELSE doc_id % 5 END AS changes
        |  FROM documents),
        |x AS (SELECT doc_id, visits, changes,
        |    CAST(visits AS DOUBLE) AS v, CAST(changes AS DOUBLE) AS c
        |  FROM h),
        |l AS (SELECT *,
        |    -ln(1.0 - CASE WHEN c >= v THEN (v - 0.5) / v
        |      ELSE c / v END) AS lam
        |  FROM x)
        |SELECT doc_id, visits, changes,
        |  CASE WHEN visits < 4 OR c = 0 THEN NULL
        |    ELSE round(lam, 6) END AS change_rate,
        |  CASE WHEN visits < 4 THEN NULL
        |    WHEN c = 0 THEN 60.0
        |    ELSE round(least(60.0, greatest(0.25,
        |      CAST(1.0 AS DOUBLE) / lam)), 6) END AS revisit_days,
        |  CASE WHEN visits < 4 THEN 'insufficient'
        |    WHEN c = 0 THEN 'static'
        |    ELSE 'scheduled' END AS verdict
        |FROM l""".stripMargin,



    // HTML-extract replay: q140's page is rendered FROM documents and
    // extraction is exact recovery, so the oracle needs no HTML — every
    // doc must come back byte-identical (n_exact = n_docs = count)
    "q140_html_extract" ->
      """SELECT doc_id % 5 AS bucket, count(*) AS n_docs,
        |  count(*) AS n_exact,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents WHERE text IS NOT NULL GROUP BY 1""".stripMargin,



    // web-pipeline replay: extraction is identity (q140), so the
    // filter+dedup chain runs directly on documents; the duplicate
    // crawl is the same doc_id % 3 union
    "q141_web_pipeline" ->
      """WITH pages AS (
        |  SELECT text FROM documents WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT text FROM documents WHERE text IS NOT NULL AND doc_id % 3 = 0),
        |kept AS (
        |  SELECT text FROM pages WHERE len(string_split(text, ' ')) >= 20)
        |SELECT count(*) AS n_pages_kept,
        |  count(DISTINCT text) AS n_unique
        |FROM kept""".stripMargin,



    // URL-normalize replay: the messy URL is built FROM the clean
    // parts, so the oracle reconstructs expected forms without any URL
    // parsing — every normalization must land exactly (n_exact=n_urls)
    "q142_url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    ['com','org','net','co.uk','de'][CAST(doc_id % 5 AS INT) + 1] AS tld,
        |    'site' || CAST(doc_id % 11 AS VARCHAR) || '.'
        |      || ['com','org','net','co.uk','de'][CAST(doc_id % 5 AS INT) + 1] AS dom
        |  FROM documents)
        |SELECT tld, count(*) AS n_urls, count(*) AS n_exact,
        |  count(DISTINCT dom) AS n_domains,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM u GROUP BY tld""".stripMargin,



    // domain-cap replay: identical salted-md5 unit positions on both
    // engines (the q37 hash discipline), row_number over (pos, url)
    "q143_domain_cap" -> {
      val h = PortableSql.minhashBase("concat('domcap', ':', url)", DD)
      """WITH urls AS (
        |  SELECT doc_id,
        |    'http://d' || CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 10
        |      ELSE doc_id % 200 END AS VARCHAR)
        |      || '.com/p/' || CAST(doc_id AS VARCHAR) AS url,
        |    'd' || CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 10
        |      ELSE doc_id % 200 END AS VARCHAR) || '.com' AS dom
        |  FROM documents),
        |h AS (SELECT doc_id, url, dom,
        |    CAST(""".stripMargin + h +
        """ AS DOUBLE) / 1152921504606846976.0 AS p FROM urls),
        |r AS (SELECT doc_id, dom,
        |    ROW_NUMBER() OVER (PARTITION BY dom ORDER BY p, url) AS rn
        |  FROM h)
        |SELECT count(*) AS n_kept, count(DISTINCT dom) AS n_domains,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM r WHERE rn <= 5""".stripMargin
    },



    // robots replay: decisions are known by construction — host h2 has
    // no robots (allow all), h3's agent-specific group denies all,
    // h0/h1 allow exactly path cases 0/2/4 (public, allow-override,
    // no-match default); the oracle never parses robots.txt
    "q144_robots_filter" ->
      """WITH u AS (
        |  SELECT doc_id, CAST(doc_id % 4 AS INT) AS hostnum,
        |    CAST(doc_id % 5 AS INT) AS pc
        |  FROM documents),
        |a AS (
        |  SELECT * FROM u
        |  WHERE hostnum = 2 OR (hostnum <> 3 AND pc IN (0, 2, 4)))
        |SELECT 'h' || CAST(hostnum AS VARCHAR) || '.com' AS host,
        |  count(*) AS n_allowed, CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM a GROUP BY 1""".stripMargin,



    // triage replay: payloads are synthesized so every sniff, charset,
    // and decode outcome is known by construction — all counters must
    // equal the bucket size
    "q145_payload_triage" ->
      """SELECT doc_id % 6 AS bucket, count(*) AS n_payloads,
        |  count(*) AS n_mime_ok, count(*) AS n_charset_ok,
        |  count(*) AS n_decode_ok
        |FROM documents WHERE text IS NOT NULL GROUP BY 1""".stripMargin,



    // title replay: the synthesized page titles each doc "Doc <id>",
    // so every title must come back exactly and titles are as distinct
    // as doc ids
    "q147_html_title" ->
      """SELECT count(*) AS n_docs, count(*) AS n_title_ok,
        |  count(DISTINCT doc_id) AS n_unique
        |FROM documents WHERE text IS NOT NULL""".stripMargin,



    // PII-audit replay: every span is placed (or withheld — the Luhn
    // decoy) by a modular condition, so the counts are arithmetic;
    // the kernel must agree exactly
    "q148_pii_audit" ->
      """SELECT doc_id % 7 AS bucket, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
        |  CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
        |  CAST(sum(CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ipv4,
        |  CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_card
        |FROM documents WHERE text IS NOT NULL GROUP BY 1""".stripMargin,



    // script-profile replay: per-class counts via one [^range] regex
    // each over the SAME pinned BMP blocks the kernel sweeps; other =
    // chars minus all classes; identical argmax CASE chain
    "q184_script_audit" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 7 <> 0 AND doc_id % 3 = 0 THEN ''
        |          ELSE text END) ||
        |    CASE WHEN doc_id % 7 = 1 THEN ' Привет мир 2024'
        |         WHEN doc_id % 7 = 2 THEN ' Ελληνικά κείμενο'
        |         WHEN doc_id % 7 = 3 THEN ' مرحبا بالعالم'
        |         WHEN doc_id % 7 = 4 THEN ' שלום עולם'
        |         WHEN doc_id % 7 = 5 THEN ' नमस्ते दुनिया'
        |         WHEN doc_id % 7 = 6 THEN ' 你好世界 ありがとう 한국어'
        |         ELSE '' END AS tx
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (
        |  SELECT doc_id, length(tx) AS n_chars,
        |    length(regexp_replace(tx, '[^A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{00FF}\x{0100}-\x{024F}]', '', 'g')) AS n_latin,
        |    length(regexp_replace(tx, '[^\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
        |    length(regexp_replace(tx, '[^\x{0370}-\x{03FF}]', '', 'g')) AS n_greek,
        |    length(regexp_replace(tx, '[^\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic,
        |    length(regexp_replace(tx, '[^\x{0590}-\x{05FF}]', '', 'g')) AS n_hebrew,
        |    length(regexp_replace(tx, '[^\x{0900}-\x{097F}]', '', 'g')) AS n_devanagari,
        |    length(regexp_replace(tx, '[^\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7A3}]', '', 'g')) AS n_cjk,
        |    length(regexp_replace(tx, '[^0-9]', '', 'g')) AS n_digit
        |  FROM t),
        |d AS (
        |  SELECT *,
        |    n_chars - n_latin - n_cyrillic - n_greek - n_arabic - n_hebrew
        |      - n_devanagari - n_cjk - n_digit AS n_other,
        |    CASE
        |      WHEN n_latin >= n_cyrillic AND n_latin >= n_greek
        |        AND n_latin >= n_arabic AND n_latin >= n_hebrew
        |        AND n_latin >= n_devanagari AND n_latin >= n_cjk THEN 'latin'
        |      WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_arabic
        |        AND n_cyrillic >= n_hebrew AND n_cyrillic >= n_devanagari
        |        AND n_cyrillic >= n_cjk THEN 'cyrillic'
        |      WHEN n_greek >= n_arabic AND n_greek >= n_hebrew
        |        AND n_greek >= n_devanagari AND n_greek >= n_cjk THEN 'greek'
        |      WHEN n_arabic >= n_hebrew AND n_arabic >= n_devanagari
        |        AND n_arabic >= n_cjk THEN 'arabic'
        |      WHEN n_hebrew >= n_devanagari AND n_hebrew >= n_cjk THEN 'hebrew'
        |      WHEN n_devanagari >= n_cjk THEN 'devanagari'
        |      ELSE 'cjk' END AS dominant,
        |    CASE WHEN (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN n_greek > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN n_arabic > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN n_hebrew > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN n_devanagari > 0 THEN 1 ELSE 0 END
        |      + CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END) >= 2
        |      THEN 1 ELSE 0 END AS mixed
        |  FROM p)
        |SELECT dominant, count(*) AS n_docs,
        |  CAST(sum(mixed) AS BIGINT) AS n_mixed,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_digit) AS BIGINT) AS sum_digits,
        |  CAST(sum(n_other) AS BIGINT) AS sum_other
        |FROM d GROUP BY 1""".stripMargin,



    // sitemap replay: lastmod/fetched are day-of-month arithmetic, the
    // 1/9 no-lastmod entries are never stale, and string date compare
    // ("" on the Spark side, NULL-cased here) agrees by construction
    "q154_sitemap_stale" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
        |x AS (
        |  SELECT doc_id, doc_id % 10 AS hostnum,
        |    CASE WHEN doc_id % 9 <> 0 THEN doc_id % 27 + 1 END AS lm,
        |    (doc_id*3) % 27 + 1 AS f
        |  FROM d)
        |SELECT hostnum, count(*) AS n_urls,
        |  CAST(sum(CASE WHEN lm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nolastmod,
        |  CAST(sum(CASE WHEN lm > f THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
        |  CAST(sum(CASE WHEN lm > f THEN doc_id END) AS BIGINT) AS sum_stale
        |FROM x GROUP BY hostnum""".stripMargin,



    // schedule replay: per-host aggregates depend only on the slot SET
    // {0..n-1} × delay, so the rollup is exact arithmetic; mean waits
    // are exact multiples of 0.5×delay and survive round(…,6) intact
    "q155_crawl_schedule" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    'd' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS host,
        |    (doc_id % 50 % 5 + 1) AS delay_s
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (
        |  SELECT host, count(*) AS n_urls,
        |    (count(*) - 1) * min(delay_s) AS makespan_s,
        |    round((count(*) - 1) * min(delay_s) / 2.0, 6) AS mean_wait_s,
        |    min(delay_s) AS delay_s
        |  FROM f GROUP BY host)
        |SELECT length(host) % 3 AS bucket, count(*) AS n_hosts,
        |  CAST(sum(n_urls) AS BIGINT) AS n_urls,
        |  CAST(sum(makespan_s) AS BIGINT) AS sum_makespan,
        |  round(sum(mean_wait_s), 6) AS sum_mean_wait,
        |  CAST(sum(delay_s) AS BIGINT) AS sum_delay
        |FROM h GROUP BY 1""".stripMargin,



    // crawl-plan replay: discovery/staleness/robots/schedule are all
    // constructive — robots decisions mirror q144's pinned semantics
    // (even hosts: path cases 0/2/4 allowed; h3/h7: bot-banned; odd
    // non-ban hosts: no robots = allow), the schedule is the same
    // (prio, url) row_number
    "q156_crawl_plan" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 10 AS h, (doc_id // 10) % 5 AS pc
        |  FROM documents WHERE text IS NOT NULL),
        |u AS (
        |  SELECT doc_id, h, pc,
        |    'https://h' || CAST(h AS VARCHAR) || '.example' ||
        |    CASE pc WHEN 0 THEN '/public/doc' || CAST(doc_id AS VARCHAR)
        |            WHEN 1 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
        |            WHEN 2 THEN '/private/pub' || CAST(doc_id AS VARCHAR)
        |            WHEN 3 THEN '/cache/doc' || CAST(doc_id AS VARCHAR) || '.tmp'
        |            ELSE '/docs/doc' || CAST(doc_id AS VARCHAR) || '.html' END AS url,
        |    CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END AS prio,
        |    (doc_id % 27) > ((doc_id*3) % 27) AS stale
        |  FROM d),
        |due AS (SELECT * FROM u WHERE prio = 1 OR stale),
        |alw AS (
        |  SELECT * FROM due
        |  WHERE h % 4 <> 3 AND (h % 2 <> 0 OR pc IN (0, 2, 4))),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY prio, url) AS rn
        |  FROM alw)
        |SELECT h AS hostnum, count(*) AS n_fetch,
        |  CAST(max((rn-1) * (h % 5 + 1)) AS BIGINT) AS makespan_s,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(CASE WHEN prio = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_stale
        |FROM r WHERE rn <= 30 GROUP BY h""".stripMargin,



    // anchor-mode replay: per-(dst, anchor) counts then the same
    // deterministic mode (count desc, anchor asc)
    "q157_anchor_text" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
        |e AS (
        |  SELECT (doc_id*2+1) % n AS dst, 'ref one' AS anchor
        |  FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT (doc_id*3+2) % n, 'ref two'
        |  FROM documents, nn WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT (doc_id*7+5) % n, 'ref & three'
        |  FROM documents, nn WHERE text IS NOT NULL),
        |c AS (SELECT dst, anchor, count(*) AS cnt FROM e GROUP BY dst, anchor),
        |t AS (
        |  SELECT dst, anchor, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, anchor ASC) AS rn,
        |    sum(cnt) OVER (PARTITION BY dst) AS total,
        |    count(*) OVER (PARTITION BY dst) AS ndis
        |  FROM c)
        |SELECT dst % 5 AS bucket, count(*) AS n_targets,
        |  CAST(sum(total) AS BIGINT) AS n_links,
        |  CAST(sum(ndis) AS BIGINT) AS sum_distinct,
        |  CAST(sum(CASE WHEN anchor = 'ref one' THEN 1 ELSE 0 END) AS BIGINT) AS n_top_one,
        |  CAST(sum(CASE WHEN anchor = 'ref & three' THEN 1 ELSE 0 END) AS BIGINT) AS n_top_amp,
        |  CAST(sum(cnt) AS BIGINT) AS sum_top
        |FROM t WHERE rn = 1 GROUP BY 1""".stripMargin,



    // robots-politeness replay: delays are known per host class
    // (h%3==0 declares h%5+2 for '*', h%3==1 overrides graftbot to 10,
    // h%3==2 has no robots -> default 1.0); makespan = (n-1)·delay
    "q163_robots_politeness" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 10 AS h
        |  FROM documents WHERE text IS NOT NULL),
        |hn AS (SELECT h, count(*) AS n FROM d GROUP BY h),
        |del AS (
        |  SELECT h, n,
        |    CASE WHEN h % 3 = 0 THEN CAST(h % 5 + 2 AS DOUBLE)
        |         WHEN h % 3 = 1 THEN CAST(10.0 AS DOUBLE)
        |         ELSE CAST(1.0 AS DOUBLE) END AS delay
        |  FROM hn)
        |SELECT h % 3 AS bucket, count(*) AS n_hosts,
        |  CAST(sum(n) AS BIGINT) AS n_urls,
        |  round(sum((n-1) * delay), 6) AS sum_makespan,
        |  round(sum(delay), 6) AS sum_delay
        |FROM del GROUP BY 1""".stripMargin,



    // accent-fold replay: folding recovers the pre-injection text
    // exactly, so every aggregate is the raw table's (translate is
    // 1:1 in chars, so even the accented char sum is the raw sum)
    "q164_accent_fold" ->
      """SELECT doc_id % 7 AS bucket, count(*) AS n_docs, count(*) AS n_exact,
        |  count(DISTINCT text) AS n_distinct_folded,
        |  count(DISTINCT text) AS n_distinct_raw,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_acc_chars
        |FROM documents WHERE text IS NOT NULL GROUP BY 1""".stripMargin,



    // crawl-delta replay: every status is decided by the construction
    // arithmetic (drop %13, edit %5 of the survivors, add %11 under
    // shifted keys)
    "q153_crawl_delta" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
        |s AS (
        |  SELECT 'removed' AS status, doc_id AS key FROM d WHERE doc_id % 13 = 0
        |  UNION ALL
        |  SELECT 'changed', doc_id FROM d
        |  WHERE doc_id % 13 <> 0 AND doc_id % 5 = 0
        |  UNION ALL
        |  SELECT 'added', doc_id + 1000000 FROM d WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT 'unchanged', doc_id FROM d
        |  WHERE doc_id % 13 <> 0 AND doc_id % 5 <> 0)
        |SELECT status, count(*) AS n, CAST(sum(key) AS BIGINT) AS sum_keys
        |FROM s GROUP BY status""".stripMargin
  )
}
