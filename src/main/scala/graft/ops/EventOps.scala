package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over the events table: ordered funnels and
 * cohort retention — the two reporting primitives event pipelines ship
 * beside windows/sessionization (SparkEntry q18/q19) and the as-of /
 * range joins (q33/q34).
 *
 * Both ops are join/aggregate formulations — no per-user loops, no
 * `collect_list` of unbounded event arrays, no global sorts:
 *  - funnel: one `groupBy(user).min` per step, chained by a same-key
 *    equi-join — each stage shuffles on the user key once, and every
 *    aggregation is decomposable (map-side combined);
 *  - retention: first-activity cohort + distinct (user, period) frame,
 *    joined on user — cohort/period cardinality is tiny, the heavy
 *    frames are both user-keyed.
 */
object EventOps {

  /**
   * Greedy-earliest ordered funnel: step 1 anchors at the user's FIRST
   * `steps(0)` event; step i+1 matches the first `steps(i+1)` event
   * strictly after step i and within `windowSeconds` of the ANCHOR
   * (the whole chain must fit the window, the standard product-funnel
   * contract). Returns one row per step: (step, step_idx, n_users,
   * conversion vs step 1, rounded 6).
   */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(windowSeconds > 0, "window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.select(
      col(userCol).as("u"), col(typeCol).as("t"), col(tsCol).as("ts"))
    // anchor: first occurrence of the entry step. Each stage is
    // localCheckpoint'ed: the per-step reach counts are driver actions,
    // and without the checkpoint counting step i would re-execute every
    // earlier stage's shuffle through the lineage.
    var reached = base.filter(col("t") === steps.head)
      .groupBy("u").agg(min(col("ts")).as("anchor"))
      .withColumn("prev", col("anchor"))
      .localCheckpoint()
    val counts = Array.newBuilder[(String, Long)]
    counts += steps.head -> reached.count()
    steps.tail.foreach { step =>
      val prevStage = reached.withColumnRenamed("u", "__ru")
      reached = base.filter(col("t") === step)
        .join(prevStage, col("u") === col("__ru")).drop("__ru")
        .filter(col("ts") > col("prev") &&
          col("ts") <= col("anchor") + expr(s"INTERVAL $windowSeconds SECONDS"))
        .groupBy("u")
        .agg(min(col("ts")).as("__step_ts"),
          min(col("anchor")).as("anchor")) // constant per user
        .withColumn("prev", col("__step_ts")).drop("__step_ts")
        .localCheckpoint()
      counts += step -> reached.count()
    }
    val rows = counts.result()
    val n1 = rows.head._2.toDouble
    rows.zipWithIndex.map { case ((step, n), i) =>
      (step, i + 1, n, if (n1 == 0) 0.0 else
        BigDecimal(n / n1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.toDF("step", "step_idx", "n_users", "conversion")
  }

  /**
   * Weekly cohort retention: a user's cohort is the period (integer
   * `floor(days-since-epochDate / periodDays)`) of their FIRST event;
   * for every (cohort, k ≥ 0) the report counts users with any
   * activity k periods after their cohort period, plus the retention
   * rate vs the cohort's own size (k = 0 row ≡ cohort size, rate 1.0).
   * Pure integer period arithmetic — replayable bit-exactly in SQL.
   */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      epochDate: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "periodDays must be at least 1")
    val period = floor(
      datediff(col(tsCol).cast("date"), lit(epochDate).cast("date")) /
        periodDays).cast("long")
    val activity = events
      .select(col(userCol).as("u"), period.as("p")).distinct()
    val cohorts = activity.groupBy("u").agg(min(col("p")).as("cohort"))
    val joined = activity.join(cohorts, "u")
      .select(col("u"), col("cohort"), (col("p") - col("cohort")).as("k"))
    val byK = joined.groupBy("cohort", "k")
      .agg(count(lit(1)).as("n_users")) // (u, p) already distinct
    val sizes = cohorts.groupBy("cohort").agg(count(lit(1)).as("__size"))
    byK.join(sizes, "cohort")
      .select(col("cohort"), col("k"), col("n_users"),
        round(col("n_users").cast("double") / col("__size"), 6).as("retention"))
  }
}
