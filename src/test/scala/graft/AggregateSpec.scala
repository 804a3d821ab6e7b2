package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Aggregate
import graft.ops.Aggregate.{AggSpec, Metric}

class AggregateSpec extends AnyFunSuite {
  import TestSpark.spark

  private val date = "2025-10-15"

  test("run: grouped aggregation with metric expressions and tag") {
    val out = Aggregate.run(
      TestSpark.table("orders"),
      AggSpec(Seq("o_orderstatus"), Seq(Metric("n", "count(*)")), "by_status"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("aggregation") == "by_status"))
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == TestSpark.table("orders").count())
  }

  test("run: global (no group-by) aggregation") {
    val out = Aggregate.run(
      TestSpark.table("orders"),
      AggSpec(Nil, Seq(Metric("n", "count(*)")), "global")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n") == TestSpark.table("orders").count())
  }

  test("unionRollups pads missing grouping columns with null and orders columns canonically") {
    val out = Aggregate.unionRollups(
      TestSpark.table("orders"),
      Seq(
        AggSpec(Seq("o_orderstatus"), Seq(Metric("n", "count(*)")), "a"),
        AggSpec(Seq("o_orderstatus", "o_orderpriority"), Seq(Metric("n", "count(*)")), "b")),
      date)
    assert(out.columns.toSeq ==
      Seq("o_orderstatus", "o_orderpriority", "n", "aggregation", "transformation_date"))
    val byTag = out.collect().groupBy(_.getAs[String]("aggregation"))
    assert(byTag("a").forall(_.isNullAt(1)), "branch 'a' must null-pad o_orderpriority")
    assert(byTag("b").forall(!_.isNullAt(1)))
    assert(out.collect().forall(_.getAs[String]("transformation_date") == date))
  }

  test("groupingSetsRollup produces the same rows as unionRollups (single-scan twin)") {
    val orders = TestSpark.table("orders")
    val sets = Seq(
      "g_status" -> Seq("o_orderstatus"),
      "g_ps" -> Seq("o_orderstatus", "o_orderpriority"))
    val metrics = Seq(Metric("n", "count(*)"))
    val viaUnion = Aggregate.unionRollups(
      orders,
      sets.map { case (tag, cols) => AggSpec(cols, metrics, tag) },
      date)
    val viaGs = Aggregate.groupingSetsRollup(orders, sets, metrics, date)
      .select(viaUnion.columns.map(col): _*)
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    assert(viaGs.collect().map(key).sorted.toSeq ==
      viaUnion.collect().map(key).sorted.toSeq)
  }

  test("metric expressions run through Catalyst expr (derived metrics)") {
    val out = Aggregate.run(
      TestSpark.table("lineitem"),
      AggSpec(Seq("l_returnflag"),
        Seq(Metric("avg_qty", "sum(l_quantity) / count(*)")), "t"))
    assert(out.collect().forall(_.getAs[Double]("avg_qty") > 0))
  }
}
