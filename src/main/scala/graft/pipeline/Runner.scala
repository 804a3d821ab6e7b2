package graft.pipeline

import org.apache.spark.sql.SparkSession

import scala.util.{Failure, Success, Try}

/**
 * Minimal sequential stage runner — the engine-native replacement for
 * the reference's YAML→Airflow DAG factory
 * (`dags/breweries_ingestion_dag.py:12-105`,
 * `dags/breweries_gold_dag.py:45-185`): linear task chain, per-stage
 * retry with exponential backoff (reference `default_args`
 * `dags/breweries_ingestion_dag.py:53-66`), structured per-stage events
 * (reference `src/libs/dag_utils.py:33-57`), and per-stage metrics
 * (reference MLflow tracking `src/libs/observability.py:9-89`) — all
 * in-process, no orchestrator.
 *
 * Cross-DAG sensing (reference `ExternalTaskSensor`,
 * `dags/breweries_gold_dag.py:118-139`) is replaced by ordinary dataflow:
 * a downstream stage reads its upstream's published path via
 * `Layers.latestSuccessfulRun`.
 */
object Runner {

  final case class Stage(
      id: String,
      run: SparkSession => Map[String, Long],
      retries: Int = 0,
      retryDelayMs: Long = 1000,
      backoff: Double = 2.0)

  sealed trait Status
  case object Succeeded extends Status
  final case class Failed(error: String) extends Status

  final case class StageResult(
      id: String,
      status: Status,
      attempts: Int,
      durationMs: Long,
      metrics: Map[String, Long])

  /** JSON string escape: quote, backslash, and all control chars —
    * stage ids, metric keys, and error messages are arbitrary caller
    * strings and must not be able to break the report document. */
  private[pipeline] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  final case class PipelineReport(results: Seq[StageResult]) {
    def succeeded: Boolean = results.forall(_.status == Succeeded)

    /** One stage as a single-line JSON object. */
    def stageJson(r: StageResult): String = {
      val status = r.status match {
        case Succeeded => jsonStr("success")
        case Failed(e) => jsonStr(s"failed: $e")
      }
      val ms = r.metrics.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jsonStr(k)}: $v" }.mkString("{", ", ", "}")
      s"""{"stage": ${jsonStr(r.id)}, "status": $status, "attempts": ${r.attempts}, """ +
        s""""duration_ms": ${r.durationMs}, "metrics": $ms}"""
    }

    def toJson: String = results.map(stageJson).mkString("[", ",\n ", "]")

    /** Single-line stages array (JSONL-safe — raw newlines would break a
      * line-per-record store like [[RunLog]]). */
    def toJsonLine: String = results.map(stageJson).mkString("[", ", ", "]")
  }

  /** Run stages sequentially; stop at the first exhausted-retries
    * failure (downstream stages depend on upstream outputs).
    *
    * `onStageFailure` is the alerting surface (O6): the engine-native
    * seam for the reference's failure callbacks
    * (`src/libs/alerts.py:30-87` email + Prometheus counters) — this
    * sandbox has no egress, so the default is a no-op and callers plug
    * in their transport (mail, pager, metrics push). It fires once per
    * FINAL stage failure, after retries are exhausted, with the
    * complete StageResult. A throwing alert hook is swallowed: failure
    * REPORTING must never change pipeline control flow. */
  def run(
      spark: SparkSession,
      stages: Seq[Stage],
      sleep: Long => Unit = Thread.sleep,
      onStageFailure: StageResult => Unit = _ => ())
      : PipelineReport = {
    val results = Seq.newBuilder[StageResult]
    var halted = false
    stages.foreach { st =>
      if (!halted) {
        var attempt = 0
        var delay = st.retryDelayMs
        var result: Option[StageResult] = None
        val t0 = System.nanoTime()
        while (result.isEmpty) {
          attempt += 1
          Try(st.run(spark)) match {
            case Success(metrics) =>
              result = Some(StageResult(
                st.id, Succeeded, attempt, (System.nanoTime() - t0) / 1000000, metrics))
            case Failure(e) if attempt <= st.retries =>
              sleep(delay)
              delay = (delay * st.backoff).toLong
            case Failure(e) =>
              val failed = StageResult(
                st.id, Failed(Option(e.getMessage).getOrElse(e.getClass.getName)),
                attempt, (System.nanoTime() - t0) / 1000000, Map.empty)
              // alerting must never alter control flow — but a broken
              // alert transport must not fail SILENTLY either, or
              // operators believe alerting is live while nothing is
              // delivered
              Try(onStageFailure(failed)).failed.foreach(he =>
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"onStageFailure hook threw for stage ${st.id} " +
                    s"(alert likely NOT delivered): $he"))
              result = Some(failed)
              halted = true
          }
        }
        results += result.get
      }
    }
    PipelineReport(results.result())
  }
}
