package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

class StatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("pName renders clean percentile column names") {
    assert(Stats.pName(0.5) == "p50")
    assert(Stats.pName(0.9) == "p90")
    assert(Stats.pName(0.999) == "p99_9")
    assert(Stats.pName(0.05) == "p5")
  }

  test("exact percentiles on a known tiny group") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10)).toDF("g", "v")
    val out = Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.5, 1.0))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out("a") == ((2.5, 4.0, 4L))) // median of 1..4 interpolates to 2.5
    assert(out("b") == ((10.0, 10.0, 1L)))
  }

  test("matches a sorted-array reference implementation on random data") {
    def ref(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * p
      val lo = s(math.floor(pos).toInt)
      val hi = s(math.ceil(pos).toInt)
      val raw = lo + (hi - lo) * (pos - math.floor(pos))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val data = Seq.tabulate(500)(i => (s"g${rnd.nextInt(4)}", rnd.nextInt(1000).toDouble))
      val df = data.toDF("g", "v")
      val out = Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.25, 0.9))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      data.groupBy(_._1).foreach { case (g, rows) =>
        val vs = rows.map(_._2)
        assert(out(g)._1 == ref(vs, 0.25), s"seed=$seed g=$g p25")
        assert(out(g)._2 == ref(vs, 0.9), s"seed=$seed g=$g p90")
      }
    }
  }

  test("null values are excluded from percentiles and n_rows") {
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(3)), ("a", None))
      .toDF("g", "v")
    val out = Stats.exactPercentiles(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // nulls neither rank (which would select/shift order statistics) nor
    // count toward n — median of {1, 3} is 2
    assert(out("a") == ((2.0, 2L)))
  }

  test("single shuffle: window and final aggregation share the group partitioning") {
    val df = TestSpark.table("documents")
      .selectExpr("lang", "size(split(text, ' ')) AS n")
    val plan = Stats.exactPercentiles(df, Seq("lang"), "n", Seq(0.5, 0.99))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
  }
}
