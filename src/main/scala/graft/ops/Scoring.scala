package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Batched model-scoring seam — the production path for quality signals
 * that outgrow the pure-Column heuristics in [[TextOps]] (perplexity
 * from a language model, a fastText-style classifier, a learned
 * quality head). The heuristics stay as the oracle-checkable fast
 * fences; THIS is where a real model plugs in.
 *
 * Spark shape (the JVM analog of `mapInPandas`):
 *  - ONE scorer per partition (`mkScorer` runs inside the task, so
 *    model weights load once per task, never on the driver, never
 *    serialized into the closure);
 *  - fixed-size micro-batches (`batchSize`) — models amortize over a
 *    batch dimension, and bounded batches bound peak memory no matter
 *    how large the partition is;
 *  - streaming iterators end-to-end: no partition-wide buffering.
 *
 * Scale: decoder parallelism = partition count; repartition upstream to
 * balance text volume per task before a heavy model. A scorer that
 * can't keep up is a partition-count problem, not an operator problem.
 */
object Scoring {

  /** A batch-scoring model. Implementations load their weights in the
    * constructor (invoked per partition, on the executor). */
  trait DocScorer extends Serializable {
    def scoreBatch(texts: Array[String]): Array[Double]
  }

  /** Deterministic stand-in "model" (the sandbox has no ML runtime):
    * a fixed integer-arithmetic hash of the text length into [0, 1).
    * Both factors of the final division are exactly-representable
    * integers, and IEEE division is bit-identical in any engine — so
    * the SEAM is oracle-checkable end-to-end with no rounding step.
    * Swap for a real model in production; the plan shape does not
    * change. */
  final class StubScorer extends DocScorer {
    def scoreBatch(texts: Array[String]): Array[Double] =
      texts.map { t =>
        val h = (t.length.toLong * 2654435761L) % 1000003L
        h.toDouble / 1000003.0
      }
  }

  /**
   * Score `textCol` per row: output (idCol, score). `mkScorer` is
   * called once per partition; rows stream through in `batchSize`
   * micro-batches. NULL text scores NULL (the SQL convention — real
   * corpora contain missing text, and one null must not NPE a model
   * or kill the job); scorers only ever see non-null strings.
   */
  def scoreDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      mkScorer: () => DocScorer,
      batchSize: Int = 64): DataFrame = {
    require(batchSize > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    typed.mapPartitions { it =>
      val scorer = mkScorer() // per-partition init: load weights HERE
      it.grouped(batchSize).flatMap { batch =>
        // pair by batch POSITION, not id — ids need not be unique
        val indexed = batch.zipWithIndex
        val present = indexed.filter(_._1._2 != null)
        if (present.isEmpty) {
          // never call a model with an empty batch — backends that
          // allocate fixed-size tensors or assert non-empty input
          // would throw on a run of all-null rows
          indexed.iterator.map { case ((id, _), _) => (id, Option.empty[Double]) }
        } else {
          val scores = scorer.scoreBatch(present.map(_._1._2).toArray)
          require(scores.length == present.length,
            s"scorer returned ${scores.length} scores for ${present.length} texts")
          val byPos = present.map(_._2).zip(scores).toMap
          indexed.iterator.map { case ((id, _), i) => (id, byPos.get(i)) }
        }
      }
    }.toDF(idCol, "score")
  }

  /**
   * Weight-of-evidence binning (the credit-scoring/feature-engineering
   * standard, public — Siddiqi, "Credit Risk Scorecards") — turn a
   * continuous score into a monotone-evidence categorical: equi-height
   * bins of `scoreCol`, and per bin
   *
   *   WOE_i = ln( (good_i/G) / (bad_i/B) )
   *   IV_i  = (good_i/G − bad_i/B) · WOE_i
   *
   * (G/B = global label totals). The information-value sum is the
   * standard "is this feature worth keeping" gauge (< 0.02 useless,
   * > 0.3 strong); the per-bin WOE is the encoding a downstream model
   * consumes. Laplace-smooths both counts by `smooth` so empty cells
   * stay finite (the practitioner default).
   *
   * Bin assignment is the [[OptimizerStats.equiHeightHistogram]] rank
   * cut (order statistics — tie-deterministic); all counts are exact
   * integers, WOE/IV are `ln`/products of exact ratios (round 6).
   *
   * Output: one row per bin: (bin, lo, hi, n_good, n_bad, woe,
   * iv_term).
   */
  /**
   * Split-conformal calibration report (Vovk et al.; the
   * distribution-free prediction-set recipe, public) — given a
   * CALIBRATION sample of nonconformity scores (higher = worse) and a
   * miscoverage budget α, the threshold is the
   * `⌈(n+1)(1−α)⌉`-th smallest calibration score; accepting test
   * points at-or-under it guarantees ≥ 1−α coverage with NO
   * distributional assumption — the principled way to turn a raw
   * quality/novelty score into an accept gate with a stated error
   * rate.
   *
   * The rank is exact integer arithmetic on the calibration count
   * (`⌈·⌉` of an exact product); when it exceeds n (α too small for
   * the sample) the threshold is undefined → null, coverage null —
   * fail-visible, not a silently-infinite gate. The rank selection is
   * one order-statistic window over the CALIBRATION frame (sample-
   * bounded by design — calibration sets are drawn, never corpus-∝);
   * the coverage check is one conditional aggregation over test.
   *
   * Output: one row (n_cal, rank, threshold, n_test, n_covered,
   * coverage).
   */
  def conformalReport(
      cal: DataFrame,
      test: DataFrame,
      scoreCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s").asc)
    val ranked = cal
      .select(col(scoreCol).cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .withColumn("__rk", row_number().over(w))
    val nCal = ranked.agg(count(lit(1)).as("n_cal"))
      .withColumn("rank",
        ceil((col("n_cal") + 1) * lit(1.0 - alpha)).cast("long"))
    val thr = nCal.join(ranked, col("__rk") === col("rank"), "left_outer")
      .select(col("n_cal"), col("rank"), col("__s").as("threshold"))
    val cover = test
      .select(col(scoreCol).cast("double").as("__t"))
      .filter(col("__t").isNotNull)
      .crossJoin(broadcast(thr))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__t") <= col("threshold"), 1L).otherwise(0L))
          .as("__nc"))
    thr.crossJoin(cover)
      .select(col("n_cal"), col("rank"), col("threshold"), col("n_test"),
        when(col("threshold").isNull, lit(null).cast("long"))
          .otherwise(col("__nc")).as("n_covered"),
        when(col("threshold").isNull, lit(null).cast("double"))
          .otherwise(round(col("__nc").cast("double") / col("n_test"), 6))
          .as("coverage"))
  }

  def woeBinning(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int,
      smooth: Double = 0.5): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(smooth > 0, "smoothing must be positive")
    // rank ties break on the label: equal scores straddling a bin
    // boundary would otherwise split good/bad counts arbitrarily
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v"), col("__g"))
    val n = org.apache.spark.sql.expressions.Window.partitionBy()
    val binned = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__v"),
        col(labelCol).cast("boolean").as("__g"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .select(floor((col("__rk") - 1) * bins / col("__n")).as("bin"),
        col("__v"), col("__g"))
    val perBin = binned.groupBy("bin")
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
        sum(when(col("__g"), 1L).otherwise(0L)).as("n_good"),
        sum(when(!col("__g"), 1L).otherwise(0L)).as("n_bad"))
    val tot = perBin.agg(sum(col("n_good")).as("__tg"),
      sum(col("n_bad")).as("__tb"),
      count(lit(1)).as("__k"))
    val gShare = (col("n_good") + smooth) /
      (col("__tg") + lit(smooth) * col("__k"))
    val bShare = (col("n_bad") + smooth) /
      (col("__tb") + lit(smooth) * col("__k"))
    perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("lo"), col("hi"), col("n_good"),
        col("n_bad"),
        round(log(gShare / bShare), 6).as("woe"),
        round((gShare - bShare) * log(gShare / bShare), 6).as("iv_term"))
  }
}
