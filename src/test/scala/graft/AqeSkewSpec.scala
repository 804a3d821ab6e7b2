package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the LAST line of defense for adversarial bucket skew in the
 * near-dup joins. The operators bound skew structurally first — banding
 * spreads candidates over `bands × 2^planes` buckets, and
 * `Similarity.bandedNeighbors` caps any bucket at `maxBucketSize` — but
 * a residual hot (band, bucket) partition is handled by AQE's runtime
 * skew-join split, because every candidate join in Dedup/Similarity is
 * a plain EQUI-join on the bucket key (`candidatePairs`,
 * `simhashNearDups`, `bandedNeighbors`), which is exactly the shape
 * `OptimizeSkewedJoin` can rewrite. This spec proves that rewrite
 * actually fires on the bucket-join shape: thresholds lowered to
 * fixture scale, one engineered hot bucket, and the executed
 * (adaptive, final) plan must carry the `skew=true` marker with more
 * shuffle-read splits than a 1:1 partition mapping.
 */
class AqeSkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val tuned = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // fixture-scale thresholds: production defaults (256 MB / 5×median)
    // trigger on real skew; here we shrink them so a ~1 MB hot bucket
    // counts as skewed
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
    // keep the join a shuffle join — a broadcast would dodge the skew path
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](kvs: Seq[(String, String)])(body: => A): A = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hot (band, bucket) is split by AQE skew join in the candidate-pair join shape") {
    withConfs(tuned) {
      // one pathological bucket (4 000 ids + padding ⇒ ~1 MB of shuffle
      // bytes) among many uniform ones — the distribution the per-bucket
      // cap and banding normally prevent, engineered on purpose
      val hot = spark.range(4000).select(
        lit(0).as("band"), lit("hot").as("bucket"), col("id").as("id"),
        lit("x" * 200).as("pad"))
      val cold = spark.range(200).select(
        lit(0).as("band"), concat(lit("b"), (col("id") % 50)).as("bucket"),
        col("id").as("id"), lit("x" * 200).as("pad"))
      val buckets = hot.unionByName(cold)
      val a = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = buckets.select(col("band"), col("bucket"), col("id").as("id_b"))
      // the exact join shape of Dedup.candidatePairs / simhashNearDups
      val pairs = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      // execute THIS plan (count() would build a separate QueryExecution
      // and leave pairs' adaptive plan unfinalized)
      val n = pairs.queryExecution.toRdd.count()
      // hot: C(4000,2); cold: 50 buckets × C(4,2)
      assert(n == 4000L * 3999 / 2 + 50L * 6, "join result is exact despite the split")
      // the FINAL adaptive plan must show the skew-split join
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"adaptive plan did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"hot bucket was not skew-split — scale guardrail regressed:\n$plan")
    }
  }

  test("uniform buckets do not trigger the skew rewrite (no false positives)") {
    withConfs(tuned) {
      val buckets = spark.range(4200).select(
        lit(0).as("band"), concat(lit("b"), (col("id") % 60)).as("bucket"),
        col("id").as("id"))
      val a = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = buckets.select(col("band"), col("bucket"), col("id").as("id_b"))
      val pairs = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      pairs.queryExecution.toRdd.count()
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(!plan.contains("skew=true"), s"uniform data must not be skew-split:\n$plan")
    }
  }
}
