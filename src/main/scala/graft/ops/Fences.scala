package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shared fail-loud skew fences for bucket-keyed candidate joins (the
 * `/root/reference` pipeline has no joins at all — this is scale
 * armor for the north-star near-dup family).
 *
 * Every near-dup stem in this repo reduces the O(n²) pair space to
 * per-bucket self-joins (LSH bands, SimHash blocks, Hamming bands,
 * prefix postings, blocking keys). AQE's skew split can re-balance the
 * SHUFFLE for a hot bucket, but nothing in the engine bounds the pair
 * OUTPUT: one degenerate bucket value (a constant hash block across a
 * mass-duplicated template corpus) makes the candidate join quadratic
 * on its own. The repo convention — established by
 * [[Dedup.prefixFilteredPairs]]'s `maxPrefixPairs` and
 * [[Linkage]]'s `maxBlockPairs` — is to fail LOUDLY naming the hot
 * key before burning the cluster, instead of silently running an
 * n² job. This object is the one shared implementation of that fence
 * for the banded Hamming family (SimHash text, image perceptual-hash,
 * video aligned-frame).
 */
object Fences {

  /**
   * Stop-bucket CONTINUE path for the banded Hamming stems — the
   * recall-accounted alternative to raising [[assertBucketPairs]]'s
   * cap when a deployment saturates ([[graft.ops.AudioDedup]]'s
   * `maxDocsPerFp` convention applied to bucket keys): buckets whose
   * posting count exceeds `maxPostings` are DROPPED before the
   * candidate join, bounding per-bucket pairs at `maxPostings²`.
   *
   * Unlike a saturated audio landmark (which genuinely carries no
   * discriminative signal), a dropped Hamming bucket CAN cost recall:
   * a pair whose ONLY shared block/band was the dropped one loses its
   * candidate, and the pigeonhole completeness guarantee no longer
   * covers it. The trade is deliberate and must be accounted —
   * [[bucketDropReport]] enumerates exactly what was dropped for
   * monitoring, and the measured recall cost at scale is a
   * SimhashAudit row in BASELINE.md. `maxPostings <= 0` disables
   * (the default everywhere — fail-loud stays the default posture).
   *
   * Cost: one DECOMPOSABLE groupBy count over the bucket key (map-side
   * partials collapse the hot key per-mapper) + a broadcast anti-join
   * against the tiny over-cap key set. Deliberately NOT a window
   * count: a window partitioned by the bucket key would funnel the
   * saturated bucket — the exact input this path exists to survive —
   * through a single task, payload columns and all (the
   * [[graft.ops.AudioDedup]] `maxDocsPerFp` lesson).
   */
  def stopBuckets(
      ex: DataFrame, keyCols: Seq[String], maxPostings: Long): DataFrame =
    if (maxPostings <= 0L) ex
    else ex.join(
      broadcast(bucketDropReport(ex, keyCols, maxPostings)
        .select(keyCols.map(col): _*)),
      keyCols, "left_anti")

  /**
   * [[stopBuckets]] for the PROBE shape (a batch joined against a
   * standing store): the standing side is first SEMI-JOINED to the
   * batch's bucket keys (broadcast — a batch has few distinct
   * buckets) and only the probed buckets are counted, so a capped
   * incremental drain stays O(drain) instead of group-scanning the
   * whole store every drain (the [[assertProbePairs]] cost contract
   * applied to the continue path). Output-equivalent to capping the
   * full store: a bucket the batch never probes contributes no
   * candidate pairs whether it is dropped or kept, and a saturated
   * bucket is dropped on every drain that touches it. The returned
   * frame is the standing side RESTRICTED to the batch's surviving
   * buckets — exactly the rows the candidate join can match.
   */
  def stopProbeBuckets(
      standing: DataFrame,
      probe: DataFrame,
      keyCols: Seq[String],
      maxPostings: Long): DataFrame =
    if (maxPostings <= 0L) standing
    else {
      val probed = standing.join(
        broadcast(probe.select(keyCols.map(col): _*).distinct()),
        keyCols, "left_semi")
      probed.join(
        broadcast(bucketDropReport(probed, keyCols, maxPostings)
          .select(keyCols.map(col): _*)),
        keyCols, "left_anti")
    }

  /** The buckets [[stopBuckets]] would drop at `maxPostings` —
    * (keyCols…, n_postings), the drop-accounting readout a capped
    * deployment monitors alongside its recall budget. O(buckets). */
  def bucketDropReport(
      ex: DataFrame, keyCols: Seq[String], maxPostings: Long): DataFrame =
    ex.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_postings"))
      .filter(col("n_postings") > maxPostings)

  /**
   * Hot-bucket candidate-pair fence: counts postings per bucket key in
   * the exploded frame `ex` and fails loudly — naming the hottest key
   * and its pair count — if any single bucket would form more than
   * `maxPairs` candidate pairs (count² per bucket, the
   * [[Dedup.prefixFilteredPairs]] convention). The product is computed
   * in decimal: a Long count² overflows past ~3e9 postings and would
   * silently DISABLE the fence on exactly the degenerate corpus it
   * exists for. `maxPairs >= Long.MaxValue` disables the fence.
   *
   * Cost: one decomposable groupBy over `ex` (map-side partials
   * collapse hot keys per-mapper) + a limit-1 collect — O(buckets)
   * driver traffic, never data-proportional.
   */
  def assertBucketPairs(
      ex: DataFrame,
      keyCols: Seq[String],
      maxPairs: Long,
      op: String,
      remedy: String): Unit = {
    if (maxPairs >= Long.MaxValue) return
    val np2 = col("__np").cast("decimal(20,0)") * col("__np")
    val hot = ex.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__np"))
      .filter(np2 > lit(maxPairs).cast("decimal(38,0)"))
      .select(
        concat_ws(",", keyCols.map(c => col(c).cast("string")): _*)
          .as("__key"),
        np2.cast("decimal(38,0)").as("__pairs"))
      .limit(1).collect()
    require(hot.isEmpty, {
      val r = hot.head
      s"$op bucket (${keyCols.mkString(",")})=(${r.getString(0)}) would " +
        s"form ${r.getDecimal(1)} candidate pairs (> maxBucketPairs=" +
        s"$maxPairs): one hot bucket makes the candidate join quadratic " +
        s"— $remedy (or raise the cap explicitly)"
    })
  }

  /**
   * [[assertBucketPairs]] for the PROBE shape (batch buckets joined
   * against a standing store): the per-bucket candidate count is
   * `batch postings × standing postings`, so a saturated standing
   * bucket makes EVERY future drain that touches it pay
   * store-proportional work — the incremental regime's version of the
   * quadratic hazard. Same decimal arithmetic, same fail-loud
   * contract; `maxPairs >= Long.MaxValue` disables.
   *
   * Cost: the probe-side groupBy is batch-sized; the standing side is
   * first SEMI-JOINED to the batch's bucket keys (broadcast — a batch
   * has few distinct buckets) so only buckets the batch actually lands
   * in are counted: against a (key)-bucketed store that filter prunes
   * the read, and the fence never group-scans the whole standing side
   * per drain (which would have made every drain store-proportional —
   * exactly the cost shape the probe contract exists to avoid).
   */
  def assertProbePairs(
      probe: DataFrame,
      standing: DataFrame,
      keyCols: Seq[String],
      maxPairs: Long,
      op: String,
      remedy: String): Unit = {
    if (maxPairs >= Long.MaxValue) return
    val pc = probe.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__npb"))
    val sc = standing
      .join(broadcast(pc.select(keyCols.map(col): _*)), keyCols, "left_semi")
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__nps"))
    val pairs = col("__npb").cast("decimal(20,0)") * col("__nps")
    val hot = pc.join(sc, keyCols)
      .filter(pairs > lit(maxPairs).cast("decimal(38,0)"))
      .select(
        concat_ws(",", keyCols.map(c => col(c).cast("string")): _*)
          .as("__key"),
        pairs.cast("decimal(38,0)").as("__pairs"))
      .limit(1).collect()
    require(hot.isEmpty, {
      val r = hot.head
      s"$op probe bucket (${keyCols.mkString(",")})=(${r.getString(0)}) " +
        s"would form ${r.getDecimal(1)} batch×standing candidate pairs " +
        s"(> maxBucketPairs=$maxPairs): a saturated standing bucket " +
        s"taxes every future drain — $remedy (or raise the cap explicitly)"
    })
  }
}
