package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bloom-filter join pruning — the scale pattern for semi-joins where
 * the key set is too large to broadcast as an exact hash set but its
 * BLOOM FILTER is not (100M keys ≈ 120 MB exact vs ~180 KB of bloom
 * bits at 1% fpp). The big side is filtered at SCAN time against the
 * broadcast bits, so the join exchange moves only probable-match rows;
 * the exact join afterwards removes the false positives, keeping the
 * result EXACT (and therefore oracle-checkable — the bloom changes the
 * plan, never the answer).
 *
 * Everything is pure `Column` arithmetic (no UDF, no custom
 * expression): positions come from double hashing
 * `pos_i = (h1 + i·h2) mod m` over two independent xxhash64 draws, the
 * bit array is `m/64` longs built with ONE tiny aggregation
 * (`explode positions → bit_or per word`), and the membership test is
 * an AND of `numHashes` codegen'd bit probes. Spark's own runtime
 * bloom (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies
 * the same idea automatically to shuffle joins; this operator makes it
 * explicit, tunable, and reusable against a PERSISTED key set (the
 * daily-ingest case: yesterday's key bloom prunes today's scan without
 * re-reading yesterday's keys).
 */
object Bloom {

  /** Second-draw salt for double hashing (any constant works; fixed so
    * build and probe agree forever, including across runs). */
  private val seed2 = 0x9e3779b97f4a7c15L

  // Kirsch-Mitzenmacher double hashing with both draws pre-reduced
  // mod m: (h1 + i·h2) mod m ≡ (h1 mod m + i·(h2 mod m)) mod m, and the
  // reduced operands keep every intermediate below numHashes·m — no
  // 64-bit wraparound (which ANSI mode rejects as overflow).
  private def reduced(key: Column, numBits: Int): (Column, Column) = (
    pmod(xxhash64(key), lit(numBits.toLong)),
    pmod(xxhash64(key, lit(seed2)), lit(numBits.toLong)))

  private def positions(key: Column, numBits: Int, numHashes: Int): Column = {
    val (h1, h2) = reduced(key, numBits)
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => pmod(h1 + i * h2, lit(numBits.toLong)))
  }

  /**
   * Build the bit array: ONE row holding `numBits/64` longs. The build
   * aggregates at most `numBits/64` groups regardless of key count —
   * the shuffle is constant-size.
   */
  def bits(keys: DataFrame, keyCol: String, numBits: Int, numHashes: Int): DataFrame = {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
    require(numHashes >= 1)
    val words = numBits / 64
    keys
      .select(explode(positions(col(keyCol), numBits, numHashes)).as("__pos"))
      .select(
        (col("__pos") / 64).cast("int").as("__w"),
        call_function("shiftleft", lit(1L), (col("__pos") % 64).cast("int")).as("__bit"))
      .groupBy("__w")
      .agg(bit_or(col("__bit")).as("__word"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__word")))).as("__m"))
      .select(
        transform(
          sequence(lit(0), lit(words - 1)),
          w => coalesce(element_at(col("__m"), w.cast("int")), lit(0L))).as("bloom_bits"))
  }

  /** Membership test against a `bloom_bits` array column: AND of
    * `numHashes` bit probes — pure codegen'd arithmetic at scan speed. */
  def mightContain(bitsCol: Column, key: Column, numBits: Int, numHashes: Int): Column = {
    val (h1, h2) = reduced(key, numBits)
    (0 until numHashes).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong))
      element_at(bitsCol, (pos / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /**
   * Exact semi-join with bloom pre-pruning: rows of `big` whose
   * `bigKey` appears in `small`'s `smallKey` set. The bloom bits are
   * built distributed, pulled to the driver as CONSTANT-SIZE state
   * (`numBits/64` longs — 8 KB at the default, invariant in the key
   * count; same contract as k-means centroids), and embedded as a
   * literal predicate on `big` — a plain filter Catalyst keeps BELOW
   * the join exchange, exactly how Spark's own
   * `spark.sql.optimizer.runtime.bloomFilter` injects its filter. (An
   * earlier broadcast-row formulation let the optimizer reorder the
   * semi-join underneath the bloom probe, shuffling `big` unpruned —
   * BloomSpec pins the filter-below-exchange shape.) The exact
   * semi-join (shuffle-hash — at the scale this operator targets,
   * neither the broadcast of the full key set nor a sort-merge of the
   * unpruned big side is on the table) then removes false positives.
   * Result is bit-identical to a plain semi-join.
   */
  def prunedSemiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      numBits: Int = 1 << 16,
      numHashes: Int = 5): DataFrame = {
    val bitsArr = bits(small.select(col(smallKey)), smallKey, numBits, numHashes)
      .collect()(0).getSeq[Long](0)
    big
      .filter(mightContain(typedlit(bitsArr), col(bigKey), numBits, numHashes))
      .join(
        small.select(col(smallKey)).hint("shuffle_hash"),
        col(bigKey) === col(smallKey),
        "left_semi")
  }
}
