package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines (north-star
 * extension): exact, normalized-exact, and MinHash-LSH near-dup.
 *
 * Scale design (100 TB):
 *  - exact dedup = hash-aggregate on the dup key → ONE shuffle, with
 *    map-side partial aggregation collapsing duplicates before the wire.
 *  - near-dup avoids the O(n²) pair space entirely: shingle → per-doc
 *    MinHash signature (narrow, scan-speed) → band buckets (explode ×
 *    #bands) → self-join *within buckets only* (shuffle keyed on
 *    (band, bucket-hash); bucket sizes are small by construction, and a
 *    degenerate hot bucket is AQE-skew-split) → exact Jaccard verify on
 *    the candidate pairs only.
 *  - all hashing is md5-based (deterministic, seedless, identical across
 *    engines) so every stage is DuckDB-oracle-checkable. At production
 *    scale you'd swap md5 for xxhash64 (same plan shape, ~5× faster
 *    hashing) — the seam is [[hashShingle]].
 */
object Dedup {

  /** Exact dedup on a key set (dropDuplicates parity). */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Normalized-exact dedup: canonical keeper (min id) per casefolded
    * fingerprint. Deterministic → oracle-checkable. */
  def normalizedKeepers(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Deterministic per-shingle hash for permutation `i`:
    * `md5(i || ':' || shingle)`. Lexicographic min over hex strings
    * plays the MinHash role (any total order works for min-hashing). */
  def hashShingle(i: Int, shingle: Column): Column =
    md5(concat(lit(s"$i:"), shingle))

  /** Numeric shingle hash: first 15 hex chars of [[hashShingle]] as a
    * 60-bit long. `min(long)` runs in a HashAggregate with map-side
    * partials — `min(string)` would fall back to SortAggregate (a full
    * sort of the exploded shingle rows). Fixed-width lowercase hex
    * orders lexicographically exactly like its numeric value, so
    * rendering the numeric min back to padded hex equals the string-min
    * of the truncated hashes. */
  def hashShingleLong(i: Int, shingle: Column): Column =
    conv(substring(hashShingle(i, shingle), 1, 15), 16, 10).cast("long")

  /** Render the numeric minhash back to the canonical 15-hex-char form. */
  private def sigHex(c: Column): Column =
    lpad(lower(conv(c.cast("string"), 10, 16)), 15, "0")

  /**
   * Per-document MinHash signature: for each of `numHashes` virtual
   * permutations, the min hash (15-hex-char truncated md5) over the
   * document's `n`-word shingles. Output: (idCol, sig: array&lt;string&gt;).
   *
   * Plan shape: explode shingles → `numHashes` numeric md5s per
   * (doc, shingle) row → `groupBy(doc).agg(min…)` → render hex. Each
   * shingle string is CONSTRUCTED once and hashed `numHashes` times —
   * the alternative single-projection formulation
   * (`array(array_min(transform(shingles, md5)) × N)`) rebuilds the
   * shingle array once per hash function because codegen subexpression
   * elimination does not reach across higher-order-function lambdas
   * (measured ~5× slower at sf0.1). The shuffle moves only map-side
   * partially-aggregated rows: ~docs × numHashes longs per partition,
   * independent of document length — the scan dominates at 100 TB.
   */
  def minhashSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      shingleWords: Int): DataFrame = {
    val ex = df.select(
      col(idCol),
      explode(TextOps.wordShingles(col(textCol), shingleWords)).as("__sh"))
    val mins = (0 until numHashes).map(i =>
      min(hashShingleLong(i, col("__sh"))).as(s"__s$i"))
    ex.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => sigHex(col(s"__s$i"))): _*).as("sig"))
  }

  /**
   * LSH banding: split the signature into `bands` bands of
   * `numHashes/bands` rows each; bucket key = md5 of the concatenated
   * band slice. Output: (idCol, band: int, bucket: string) — one row per
   * (doc, band), i.e. a bounded ×bands row expansion.
   */
  def lshBuckets(sigDf: DataFrame, idCol: String, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val bandRows = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws("|", (0 until rowsPerBand).map(r =>
          col("sig").getItem(b * rowsPerBand + r)): _*)).as("bucket"))
    }
    sigDf
      .select(col(idCol), explode(array(bandRows: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /**
   * Candidate near-dup pairs: docs sharing any (band, bucket). The join
   * is keyed on (band, bucket) so co-bucketed docs land in the same
   * shuffle partition; output pairs are distinct and ordered (a &lt; b)
   * for determinism.
   */
  def candidatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 8,
      bands: Int = 4,
      shingleWords: Int = 3): DataFrame = {
    // Materialize the signature frame (docs × numHashes 15-hex strings —
    // tiny) before the self-join: it feeds BOTH sides, and neither
    // exchange reuse nor persist() helps here (no exchange to reuse in a
    // narrow plan; persist's cache build bypasses codegen CSE and costs
    // ~8× — measured at sf0.1). localCheckpoint materializes through the
    // normal codegen path and truncates lineage, so the join probes read
    // stored rows. This is the "LSH index" build; a production pipeline
    // would write it to durable storage once and share it across runs
    // (localCheckpoint trades executor-loss recovery for speed).
    val sigs = minhashSignatures(df, textCol, idCol, numHashes, shingleWords)
      .localCheckpoint()
    val buckets = lshBuckets(sigs, idCol, numHashes, bands)
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /**
   * Exact n-gram Jaccard verification of candidate pairs: explode each
   * side's distinct shingles, count intersections with a co-partitioned
   * join on the shingle string, and divide by the union size. Only
   * candidate docs are exploded — at scale this touches a tiny fraction
   * of the corpus.
   *
   * Output: (id_a, id_b, jaccard) for pairs ≥ `threshold`, rounded to 6
   * decimals for cross-engine float stability.
   */
  def verifiedNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      numHashes: Int = 8,
      bands: Int = 4,
      shingleWords: Int = 3): DataFrame = {
    // Candidate pairs are a tiny fraction of the corpus; materialize them
    // so the MinHash subtree runs once, not once per downstream use.
    val pairs = candidatePairs(df, textCol, idCol, numHashes, bands, shingleWords)
      .localCheckpoint()
    // Prune BEFORE the explode: only docs that appear in some candidate
    // pair get shingled/exploded. At 100 TB this is the difference between
    // shuffling the whole corpus's shingles and shuffling ~|pairs| docs.
    val candIds = pairs.select(col("id_a").as("sid"))
      .union(pairs.select(col("id_b").as("sid")))
      .distinct()
    val shingled = df
      .select(
        col(idCol).as("sid"),
        array_distinct(TextOps.wordShingles(col(textCol), shingleWords)).as("shset"))
      .join(candIds, Seq("sid"), "left_semi")
      .localCheckpoint() // reused by both explode sides and the size lookup
    val ex = shingled.select(col("sid"), explode(col("shset")).as("s"))
    val sizes = shingled.select(col("sid"), size(col("shset")).as("n"))
    val inter = pairs
      .join(ex.as("ea"), col("id_a") === col("ea.sid"))
      .join(ex.as("eb"), col("id_b") === col("eb.sid") && col("ea.s") === col("eb.s"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.sid"))
      .join(sizes.as("sb"), col("id_b") === col("sb.sid"))
      .select(
        col("id_a"),
        col("id_b"),
        round(col("i") / (col("sa.n") + col("sb.n") - col("i")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * SimHash-64: per-token md5-derived 64-bit vectors, majority vote per
   * bit. Hamming-close simhashes ⇒ similar docs. Returned as a 16-hex
   * string (bit-identical across engines; avoids signed-long pitfalls).
   */
  def simhash(c: Column, bits: Int = 64): Column = {
    require(bits % 4 == 0 && bits <= 64, "bits must be a multiple of 4 ≤ 64")
    val toks = TextOps.tokens(c)
    // Vote per bit: bit b (hex char b/4, bit 3-(b%4) within the nibble)
    // of md5(token) set → +1 else -1; majority across tokens wins.
    val bitCols = (0 until bits).map { b =>
      val hexPos = b / 4 + 1
      val bitInNibble = 3 - (b % 4)
      val votes = aggregate(
        toks,
        lit(0),
        (acc, t) => {
          val nib = conv(substring(md5(t), hexPos, 1), 16, 10).cast("int")
          acc + when(shiftright(nib, bitInNibble).mod(2) === 1, 1).otherwise(-1)
        })
      when(votes > 0, lit(1)).otherwise(lit(0))
    }
    // Pack bits → hex string, 4 at a time.
    val nibbles = bitCols.grouped(4).toSeq.map { g =>
      val v = g.zipWithIndex.map { case (bit, i) => bit * (8 >> i) }.reduce(_ + _)
      lower(conv(v.cast("string"), 10, 16))
    }
    concat(nibbles: _*)
  }
}
