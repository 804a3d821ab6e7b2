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

  /** md5-derived double-hash positions — the ORACLE-REPLAYABLE twin of
    * [[positions]] (xxhash64 has no cross-engine replay; the salted
    * md5 base does — the q37/q243 mechanism). Used by the calibration
    * report, where the HASH FAMILY itself is under measurement. */
  private def md5Positions(
      key: Column, numBits: Int, numHashes: Int): Column = {
    def base(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val h1 = pmod(base(key.cast("string")), lit(numBits.toLong))
    val h2 = pmod(base(concat(key.cast("string"), lit(":bloom2"))),
      lit(numBits.toLong))
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => pmod(h1 + i * h2, lit(numBits.toLong)))
  }

  /**
   * False-positive-rate calibration — MEASURE the filter the planner
   * will trust: insert one key set, probe with a DISJOINT one (every
   * hit is a false positive by construction), and report the measured
   * FPR against two theory lines:
   *
   *  - `fpr_theory` = (1 − e^(−k·n/m))^k — the textbook a-priori rate;
   *  - `fpr_fill`   = (set_bits/m)^k — the rate implied by the ACTUAL
   *    fill (catches a bad hash family: clumped positions set fewer
   *    bits than theory assumes and the measured rate diverges).
   *
   * Scale shape: the distinct set-position frame is ≤ m rows (the
   * filter's own size — never key-∝); the probe check is an explode +
   * one anti-join against it (a probe is a false positive iff NONE of
   * its k positions is missing), then integer counting. Exponentials
   * are single scalar evaluations (round 6).
   *
   * Output: one row (n_inserted, n_probes, m_bits, k_hashes, set_bits,
   * n_false_hits, fpr_measured, fpr_fill, fpr_theory).
   */
  def fprCalibration(
      insert: DataFrame,
      probe: DataFrame,
      keyCol: String,
      numBits: Int,
      numHashes: Int): DataFrame = {
    require(numBits >= 64 && numHashes >= 1, "need m >= 64, k >= 1")
    val ins = insert.select(col(keyCol).as("__k")).distinct()
      .localCheckpoint() // feeds n and the position set
    val setPos = ins
      .select(explode(md5Positions(col("__k"), numBits, numHashes))
        .as("__p"))
      .distinct()
      .localCheckpoint() // ≤ m rows; probed twice below
    val nIns = ins.agg(count(lit(1)).as("n_inserted"))
    val nBits = setPos.agg(count(lit(1)).as("set_bits"))
    val probes = probe.select(col(keyCol).as("__k")).distinct()
      .join(ins, Seq("__k"), "left_anti") // disjoint by construction
      .localCheckpoint()
    val nProbe = probes.agg(count(lit(1)).as("n_probes"))
    // a probe misses iff ANY of its positions is unset
    val misses = probes
      .select(col("__k"),
        explode(md5Positions(col("__k"), numBits, numHashes)).as("__p"))
      .join(setPos, Seq("__p"), "left_anti")
      .select(col("__k")).distinct()
      .agg(count(lit(1)).as("__nmiss"))
    nIns.crossJoin(nProbe).crossJoin(nBits).crossJoin(misses)
      .select(col("n_inserted"), col("n_probes"),
        lit(numBits).as("m_bits"), lit(numHashes).as("k_hashes"),
        col("set_bits"),
        (col("n_probes") - col("__nmiss")).as("n_false_hits"),
        // an all-overlapping probe set measures nothing: null, not 0/0
        when(col("n_probes") === 0, lit(null).cast("double"))
          .otherwise(round((col("n_probes") - col("__nmiss"))
            .cast("double") / col("n_probes"), 6)).as("fpr_measured"),
        round(pow(col("set_bits").cast("double") / numBits, numHashes), 6)
          .as("fpr_fill"),
        round(pow(lit(1.0) - exp(lit(-1.0 * numHashes) *
          col("n_inserted") / numBits), numHashes), 6).as("fpr_theory"))
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
