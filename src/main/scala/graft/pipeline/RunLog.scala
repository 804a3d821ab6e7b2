package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persistent run tracking — the engine-native analog of the reference's
 * MLflow run-per-stage store (`src/libs/observability.py:9-89`: one
 * tracked run per stage with params, duration, row-count metrics and a
 * SUCCESS/FAILED tag).
 *
 * Instead of an external tracking server, the store is an append-only
 * JSONL file under the pipeline's own base dir — which makes run
 * history just DATA: `history` reads it back with `spark.read.json`,
 * so the same engine that ran the pipeline can aggregate over its runs
 * (success rates, duration trends, per-stage metric drift) with the
 * same operators it applies to any other table. A 100 TB deployment
 * would point `append` at the object store next to the published
 * layers; one small line per run keeps it driver-side.
 *
 * `recordedAt` is caller-provided (like `transformationDate`) so run
 * records stay deterministic and replayable.
 */
object RunLog {

  private def logPath(baseDir: String) = Paths.get(baseDir, "_runs", "log.jsonl")

  /** Append one run record. Line shape:
    * `{"run_id": …, "pipeline": …, "recorded_at": …, "succeeded": …,
    *   "total_duration_ms": …, "stages": [<StageResult json>…]}`. */
  def append(
      baseDir: String,
      pipeline: String,
      runId: String,
      recordedAt: String,
      report: Runner.PipelineReport): Unit = {
    val line =
      s"""{"run_id": ${Runner.jsonStr(runId)}, "pipeline": ${Runner.jsonStr(pipeline)}, """ +
        s""""recorded_at": ${Runner.jsonStr(recordedAt)}, "succeeded": ${report.succeeded}, """ +
        s""""total_duration_ms": ${report.results.map(_.durationMs).sum}, """ +
        s""""stages": ${report.toJsonLine}}"""
    val p = logPath(baseDir)
    Files.createDirectories(p.getParent)
    Files.writeString(p, line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** The run history as a DataFrame (one row per recorded run, stages
    * as a nested array) — query it like any other table. Empty schema
    * if nothing was recorded yet. */
  def history(spark: SparkSession, baseDir: String): DataFrame = {
    val p = logPath(baseDir)
    if (!Files.exists(p)) spark.emptyDataFrame
    else spark.read.json(p.toString)
  }

  /** Reverse of `Runner.jsonStr`'s escaping. */
  private def jsonUnescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'  => out += '\n'; i += 2
          case 'r'  => out += '\r'; i += 2
          case 't'  => out += '\t'; i += 2
          case 'u' if i + 6 <= s.length =>
            out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => out += other; i += 2
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Most recent successful run, if any — the run-store twin of
    * `Layers.latestSuccessfulRun`'s `_SUCCESS` scan. "Most recent" is
    * APPEND order (the last successful line in the log), not
    * lexicographic run_id order — run ids carry no ordering contract
    * ("9" sorts after "10"), while the append-only log is inherently
    * chronological. Driver-side scan: the log is one small line per
    * run by design.
    *
    * Reader contract: parses exactly the line shape [[append]] writes
    * (this file is a SINGLE-WRITER store — only `append` produces it).
    * Records written by anything else are visible to the general
    * [[history]] reader but are not consulted here. */
  def lastSuccessful(baseDir: String): Option[String] = {
    val p = logPath(baseDir)
    if (!Files.exists(p)) return None
    // anchored to the exact structural prefix `append` writes — a
    // greedy `.*"succeeded":` scan could instead latch onto hostile
    // stage error text later in the line
    val str = """"((?:[^"\\]|\\.)*)""""
    val Line = (s"""^\\{"run_id": $str, "pipeline": $str, """ +
      s""""recorded_at": $str, "succeeded": (true|false),.*""").r
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p).asScala.foldLeft(Option.empty[String]) {
      case (acc, Line(id, _, _, "true")) => Some(jsonUnescape(id))
      case (acc, _)                      => acc
    }
  }
}
