package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Runner
import graft.pipeline.Runner.{Failed, Stage, Succeeded}

class RunnerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("all stages succeed in order with metrics") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val report = Runner.run(spark, Seq(
      Stage("a", _ => { seen += "a"; Map("rows" -> 1L) }),
      Stage("b", _ => { seen += "b"; Map("rows" -> 2L) })))
    assert(report.succeeded)
    assert(seen.toSeq == Seq("a", "b"))
    assert(report.results.map(_.id) == Seq("a", "b"))
    assert(report.results(1).metrics == Map("rows" -> 2L))
  }

  test("flaky stage: retries with exponential backoff, then succeeds") {
    var attempts = 0
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val report = Runner.run(spark, Seq(
      Stage("flaky", _ => {
        attempts += 1
        if (attempts < 3) sys.error(s"boom $attempts")
        Map("ok" -> 1L)
      }, retries = 3, retryDelayMs = 100, backoff = 2.0)),
      sleep = delays += _)
    assert(report.succeeded)
    assert(attempts == 3)
    assert(report.results(0).attempts == 3)
    assert(delays.toSeq == Seq(100L, 200L), "exponential backoff 100ms then 200ms")
  }

  test("exhausted retries: failure recorded, downstream stages halted") {
    var downstreamRan = false
    val report = Runner.run(spark, Seq(
      Stage("dies", _ => sys.error("always"), retries = 1, retryDelayMs = 1),
      Stage("after", _ => { downstreamRan = true; Map.empty })),
      sleep = _ => ())
    assert(!report.succeeded)
    assert(!downstreamRan, "stage after a hard failure must not run")
    assert(report.results.length == 1)
    report.results(0).status match {
      case Failed(msg) => assert(msg.contains("always"))
      case Succeeded   => fail("expected failure")
    }
    assert(report.results(0).attempts == 2)
  }

  test("onStageFailure fires once per FINAL failure with the full StageResult") {
    var alerts = List.empty[Runner.StageResult]
    val report = Runner.run(spark, Seq(
      Stage("ok", _ => Map("n" -> 1L)),
      Stage("flaky_dies", _ => sys.error("boom"), retries = 2, retryDelayMs = 1)),
      sleep = _ => (),
      onStageFailure = r => alerts ::= r)
    assert(!report.succeeded)
    // retried 3 attempts, but ONE alert, after retries were exhausted
    assert(alerts.length == 1)
    assert(alerts.head.id == "flaky_dies" && alerts.head.attempts == 3)
    alerts.head.status match {
      case Failed(msg) => assert(msg.contains("boom"))
      case Succeeded   => fail("alert must carry the failure status")
    }
  }

  test("a throwing alert hook never alters pipeline control flow") {
    val report = Runner.run(spark, Seq(
      Stage("dies", _ => sys.error("real failure")),
      Stage("after", _ => Map.empty)),
      sleep = _ => (),
      onStageFailure = _ => sys.error("alert transport down"))
    // the REAL failure is still reported; the hook's own crash is swallowed
    assert(!report.succeeded)
    assert(report.results.length == 1)
    report.results(0).status match {
      case Failed(msg) => assert(msg.contains("real failure"))
      case Succeeded   => fail("expected failure")
    }
  }

  test("no alert when every stage succeeds") {
    var fired = false
    val report = Runner.run(spark, Seq(Stage("ok", _ => Map.empty)),
      sleep = _ => (), onStageFailure = _ => fired = true)
    assert(report.succeeded && !fired)
  }

  test("toJson escapes hostile stage ids, metric keys and error messages") {
    val report = Runner.run(spark, Seq(
      Stage("""sta"ge\one""", _ => Map("""k"ey""" -> 1L)),
      Stage("dies", _ => sys.error("line1\nline2 \"quoted\""))),
      sleep = _ => ())
    val json = report.toJson
    // must parse as JSON: quotes/newlines escaped, not stripped
    assert(json.contains("sta\\\"ge\\\\one"))
    assert(json.contains("k\\\"ey"))
    assert(json.contains("line1\\nline2 \\\"quoted\\\""))
    // structural sanity: balanced braces, one object per stage
    assert(json.trim.startsWith("[") && json.trim.endsWith("]"))
    assert(json.split("\"stage\"").length == 3)
  }
}
