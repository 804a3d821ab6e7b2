package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("bucketed tables join with ZERO exchange under either join side") {
    val liPath = TestSpark.tmpDir("bj_li")
    val ordPath = TestSpark.tmpDir("bj_ord")
    spark.sql("DROP TABLE IF EXISTS bj_li")
    spark.sql("DROP TABLE IF EXISTS bj_ord")
    (1L to 200L).map(i => (i % 40, i, i * 2.0)).toDF("k", "v", "price")
      .write.format("parquet").bucketBy(4, "k").sortBy("k")
      .option("path", liPath).saveAsTable("bj_li")
    (0L until 40L).map(i => (i, s"o$i")).toDF("ok", "name")
      .write.format("parquet").bucketBy(4, "ok").sortBy("ok")
      .option("path", ordPath).saveAsTable("bj_ord")

    val joined = spark.table("bj_li").hint("merge")
      .join(spark.table("bj_ord"), col("k") === col("ok"))
    val agg = joined.groupBy("name").agg(count(lit(1)).as("n"))
    agg.collect() // execute so the final (adaptive) plan is real

    // AQE wraps the real plan: flatten through adaptive/query-stage
    // nodes so collect sees the physical operators
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(agg.queryExecution.executedPlan)
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a sort-merge join:\n${nodes.head}")
    // the ONLY exchange allowed is the one above the join feeding the
    // final groupBy — neither join INPUT may shuffle
    val exchangesUnderJoin = flatten(smj.head).tail
      .collect { case e: ShuffleExchangeExec => e }
    assert(exchangesUnderJoin.isEmpty,
      s"bucketed join inputs must not shuffle:\n${smj.head}")
    assert(smj.head.toString.contains("Bucketed: true"),
      "join inputs must be the bucketed scans")
    // correctness of the co-located join
    assert(joined.count() == 200L)
    assert(agg.count() == 40L)
  }
}
