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
}
