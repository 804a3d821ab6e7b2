package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Deterministic cardinality sketch: KMV (k-minimum-values). Hash every
 * value to a unit double, keep only the k smallest DISTINCT hashes, and
 * estimate |distinct| as `(k−1)/h_k` (the classic bottom-k estimator).
 *
 * Two properties make it fit this engine:
 *  - SCALE: the state is a bounded k-array per partition (a typed
 *    [[Aggregator]] with map-side partial merge) — no shuffle of the
 *    distinct values themselves, unlike exact `count(distinct)` whose
 *    exchange grows with cardinality. At 100 TB that is the difference
 *    between a fixed few KB per task and a full dedup shuffle.
 *  - DETERMINISM: the hash is md5-derived (no seed, no randomness), so
 *    the k-th smallest distinct hash — and therefore the estimate — is
 *    a pure function of the input set, reproducible in the DuckDB
 *    oracle down to the last bit (unlike HLL-based
 *    `approx_count_distinct`, whose sketch is engine-specific).
 */
object Sketches {

  /** 2⁶⁰ — exactly representable as a double (power of two). */
  private val Pow60 = 1152921504606846976.0d

  /** Value → unit-interval hash: first 15 hex chars of md5 of the
    * string form, as a 60-bit integer, scaled to (0, 1]. */
  def unitHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("double") / lit(Pow60)

  /** Bottom-k distinct-hash state as a sorted array (bounded at k).
    * Production note: the per-row path copies the array (fine for
    * k ≤ a few hundred); swap the buffer for a mutable tree if k grows. */
  /** Sorted-array bottom-k insert with distinct semantics (shared by
    * the estimate and sketch-array aggregators). */
  private def kmvInsert(k: Int)(buf: Array[Double], h: Double): Array[Double] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present (distinct semantics)
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Double](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Double](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf // h larger than the current k-th minimum
    }
  }

  final case class KMinValues(k: Int) extends Aggregator[Double, Array[Double], Double] {
    require(k >= 2, "KMV needs k >= 2")

    override def zero: Array[Double] = Array.empty

    private val insert = kmvInsert(k) _

    override def reduce(buf: Array[Double], h: Double): Array[Double] = insert(buf, h)

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      b.foldLeft(a)(insert)

    /** Fewer distinct hashes than k ⇒ the buffer IS the distinct set
      * (exact count); otherwise the bottom-k estimator. */
    override def finish(buf: Array[Double]): Double =
      if (buf.length < k) buf.length.toDouble
      else (k - 1).toDouble / buf(k - 1)

    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** md5-derived count-min-sketch bucket of a value for hash row `d`:
    * first 15 hex chars of md5("cms&lt;d&gt;:" + value) as a 60-bit long,
    * mod `width`. Seedless and engine-portable — the whole sketch is
    * replayable in the DuckDB oracle. */
  def cmsBucket(c: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$d:"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long") % width

  /**
   * Count-min sketch over token occurrences, applied to the exact
   * top-`k` tokens: (token, exact_cnt, cms_est) with est ≥ exact
   * always (CMS never underestimates) and equality when none of the
   * token's `depth` cells collides.
   *
   * The sketch STATE is the `depth × width` cell table — built here as
   * a distributed aggregation (explode tokens → per-token counts with
   * map-side partials → `depth` cell keys per token → cell sums), which
   * produces exactly the counters a single-pass streaming CMS holds:
   * CMS is linear, so building cells from pre-aggregated counts equals
   * incrementing per occurrence. At 100 TB the shuffle carries
   * partial token counts (vocabulary-sized, not corpus-sized) and the
   * cell table itself is `depth·width` rows — constant. The exact
   * per-token counts here double as the accuracy reference (the same
   * role the exact twin plays for [[kmvDistinct]]); a production
   * pipeline keeps only the cell table.
   */
  def cmsTopTokens(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      k: Int,
      depth: Int,
      width: Int): org.apache.spark.sql.DataFrame = {
    require(depth >= 1 && width >= 2)
    // token counts feed BOTH the cell build and the top-k probe —
    // materialize once (vocabulary-sized, tiny)
    val counts = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("exact_cnt"))
      .localCheckpoint()
    def cellKeys(tok: Column) = array((0 until depth).map(d =>
      struct(lit(d).as("d"), cmsBucket(tok, d, width).as("bucket"))): _*)
    val cells = counts
      .select(explode(cellKeys(col("token"))).as("db"), col("exact_cnt"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(sum("exact_cnt").as("total"))
    val top = counts
      .orderBy(col("exact_cnt").desc, col("token").asc)
      .limit(k)
    top
      .select(col("token"), col("exact_cnt"), explode(cellKeys(col("token"))).as("db"))
      .join(broadcast(cells),
        col("db.d") === cells("d") && col("db.bucket") === cells("bucket"))
      .groupBy("token", "exact_cnt")
      .agg(min("total").as("cms_est"))
  }

  /** Estimated distinct count of `valueCol` — single row. The default
    * path is SKETCH-ONLY: one bounded-state aggregation, no distinct
    * shuffle. `calibrate = true` additionally computes the exact
    * `count_distinct` twin (a second scan + full dedup exchange — the
    * cost the sketch exists to avoid) for accuracy monitoring; keep it
    * off on the production path. */
  def kmvDistinct(
      df: org.apache.spark.sql.DataFrame, valueCol: String, k: Int,
      calibrate: Boolean = false): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val est = df.select(unitHash(col(valueCol)).as("h")).as[Double]
      .select(KMinValues(k).toColumn.name("est_raw"))
      .select(round(col("est_raw"), 6).as("est_distinct"))
    if (calibrate)
      est.crossJoin(df.agg(count_distinct(col(valueCol)).as("exact_distinct")))
    else est
  }

  /** Bottom-k sketch finishing to the sorted hash ARRAY itself —
    * the mergeable state published for cross-set comparisons
    * ([[overlapMatrix]]) rather than collapsed to one estimate. */
  final case class KMinValuesSketch(k: Int)
      extends Aggregator[Double, Array[Double], Array[Double]] {
    require(k >= 2, "KMV sketch needs k >= 2")
    private val insert = kmvInsert(k) _
    override def zero: Array[Double] = Array.empty
    override def reduce(buf: Array[Double], h: Double): Array[Double] = insert(buf, h)
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      b.foldLeft(a)(insert)
    override def finish(buf: Array[Double]): Array[Double] = buf
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /**
   * Pairwise overlap matrix between groups (e.g. corpus sources) from
   * bottom-k sketches — "how much does CommonCrawl repeat what's
   * already in Wikipedia?" answered WITHOUT a doc-level join.
   *
   * One corpus pass builds a bounded k-array sketch per group
   * (map-side mergeable — no shuffle of the values); pair scoring then
   * touches only the |groups|-row sketch frame. The estimator is the
   * standard bottom-k Jaccard: among the k smallest distinct hashes of
   * the pair's UNION, the fraction present in both group sketches.
   * When the union has fewer than k distinct hashes the sketches are
   * the complete sets and the result is the exact Jaccard. md5-derived
   * hashing keeps every value engine-portable (oracle-replayable).
   *
   * At 100 TB: the corpus pass is a narrow scan + bounded-state agg;
   * the quadratic part runs over |groups|² sketch rows (a handful),
   * never over documents.
   */
  def overlapMatrix(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val sketchUdaf = udaf(KMinValuesSketch(k), Encoders.scalaDouble)
    // tiny (|groups| rows) but the product of a full corpus scan — pin
    // it so the self-join's two sides don't each rescan the corpus
    val sk = df
      .groupBy(col(groupCol).as("g"))
      .agg(sketchUdaf(unitHash(col(valueCol))).as("sketch"))
      .localCheckpoint()
    val a = sk.select(col("g").as(s"${groupCol}_a"), col("sketch").as("__sa"))
    val b = sk.select(col("g").as(s"${groupCol}_b"), col("sketch").as("__sb"))
    val bottom = slice(array_sort(array_union(col("__sa"), col("__sb"))), 1, k)
    val both = array_intersect(col("__sa"), col("__sb"))
    a.crossJoin(b)
      .filter(col(s"${groupCol}_a") < col(s"${groupCol}_b"))
      .select(
        col(s"${groupCol}_a"), col(s"${groupCol}_b"),
        size(bottom).cast("long").as("sketch_size"),
        size(array_intersect(bottom, both)).cast("long").as("shared_in_sketch"))
      .withColumn("est_jaccard",
        round(col("shared_in_sketch").cast("double") / col("sketch_size"), 6))
  }

  /**
   * KMV set-operation cardinalities (Beyer et al., SIGMOD 2007,
   * public): distinct-count estimates for two sets AND their
   * union/intersection from two bottom-k sketches alone — the sketch
   * algebra that answers "how many NEW users would source B add on
   * top of A" without ever joining the sets. Union sketch = bottom-k
   * of the merged hashes; `D̂ = (k−1)/h₍ₖ₎` (exact count when the
   * sketch holds the whole set); Jaccard = fraction of the union
   * sketch present in both sides; intersection = Jaccard · D̂(∪).
   *
   * Plan shape: two bounded-state sketch aggregations (map-side
   * mergeable, constant shuffle) cross-joined into ONE row; the merge
   * arithmetic runs on ≤ 2k doubles. All estimates replay
   * bit-identically (md5-derived hashes, exact sorts, one division).
   *
   * Output: one row (est_a, est_b, est_union, est_jaccard,
   * est_intersection).
   */
  def kmvSetCardinalities(
      a: org.apache.spark.sql.DataFrame, colA: String,
      b: org.apache.spark.sql.DataFrame, colB: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val sketchUdaf = udaf(KMinValuesSketch(k), Encoders.scalaDouble)
    val sa = a.agg(sketchUdaf(unitHash(col(colA))).as("__sa"))
    val sb = b.agg(sketchUdaf(unitHash(col(colB))).as("__sb"))
    def est(sketch: Column): Column =
      when(size(sketch) < k, size(sketch).cast("double"))
        .otherwise(lit((k - 1).toDouble) / element_at(sketch, k))
    val uni = slice(array_sort(array_union(col("__sa"), col("__sb"))), 1, k)
    val shared = array_intersect(uni,
      array_intersect(col("__sa"), col("__sb")))
    sa.crossJoin(sb)
      .select(
        round(est(col("__sa")), 6).as("est_a"),
        round(est(col("__sb")), 6).as("est_b"),
        round(est(uni), 6).as("est_union"),
        round(size(shared).cast("double") / size(uni), 6).as("est_jaccard"),
        round((size(shared).cast("double") / size(uni)) * est(uni), 6)
          .as("est_intersection"))
  }
}
