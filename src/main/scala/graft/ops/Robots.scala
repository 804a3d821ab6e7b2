package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Crawl-policy filtering (robots.txt, RFC 9309) over a URL frontier —
 * the step a lawful web-corpus pipeline runs between URL discovery and
 * fetching. (The reference has no web ingestion — north-star surface.)
 *
 * Scale shape: robots bodies are parsed ONCE PER HOST by the
 * `graft_robots_rules` kernel (a projection over the robots table —
 * |hosts| rows, never the frontier), then the frontier equi-joins the
 * parsed rule arrays on host and the per-URL `graft_robots_allowed`
 * kernel is a scan-speed primitive loop. The join degrades gracefully:
 * AQE broadcasts a small robots side, shuffles a web-scale one; URLs
 * whose host has no robots row pass (no policy = allowed), via the
 * left join's null rules.
 */
object Robots {

  /** Parsed rule list (`"A:…"`/`"D:…"`) governing `agent`. */
  def rulesFor(spark: SparkSession, robotsBody: Column, agent: String): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_robots_rules", robotsBody, lit(agent))
  }

  /** RFC 9309 decision for `path` under a parsed rule list. */
  def isAllowed(spark: SparkSession, path: Column, rules: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_robots_allowed", path, rules)
  }

  /** De-facto `Crawl-delay` (seconds) governing `agent`; null when the
    * host declares none — coalesce the crawler's politeness default.
    * See [[graft.functions.RobotsKernels.crawlDelay]]. */
  def crawlDelayFor(spark: SparkSession, robotsBody: Column, agent: String): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_robots_delay", robotsBody, lit(agent))
  }

  /**
   * Filter a URL frontier to the crawl-allowed subset. `robots` has one
   * row per host: (`host` string, `robots_txt` string). Output keeps
   * the input columns.
   */
  def filterAllowed(
      spark: SparkSession,
      urls: DataFrame,
      urlCol: String,
      robots: DataFrame,
      agent: String): DataFrame = {
    val inCols = urls.columns.map(col).toSeq
    val parsed = robots.select(
      col("host").as("__rb_host"),
      rulesFor(spark, col("robots_txt"), agent).as("__rb_rules"))
    val path = coalesce(try_parse_url(col(urlCol), lit("PATH")), lit("/"))
    urls
      .withColumn("__rb_host", UrlOps.hostOf(col(urlCol)))
      .join(parsed, Seq("__rb_host"), "left")
      .filter(isAllowed(spark, path, col("__rb_rules")))
      .select(inCols: _*)
  }
}
