package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Probabilistic record linkage — Fellegi & Sunter 1969 (public), the
 * canonical model behind every entity-resolution system (census
 * linkage, Splink, dedupe.io): two records' field-level agreements are
 * evidence, weighted by how likely that agreement is among true
 * matches (`m`) versus random pairs (`u`). The log-likelihood-ratio
 * score
 *
 *   score = Σ_fields  ln(m/u)            if the field agrees
 *                     ln((1−m)/(1−u))    if it disagrees
 *
 * bands into match / possible / non-match by two thresholds — the
 * "possible" band is the clerical-review queue, the part rule-based
 * dedup doesn't have.
 *
 * This differs from the text near-dup family ([[Dedup]]): records are
 * STRUCTURED (name + numeric + categorical fields), the evidence
 * model is per-field, and a disagreement actively SUBTRACTS — a
 * same-name pair with a contradicting account balance scores lower
 * than name-only evidence, which set-overlap similarity cannot
 * express.
 *
 * Scale shape: candidate pairs come ONLY from the blocking join
 * (equality on a caller-chosen block key — the standard linkage
 * fence; a cross join is never formed), then the score is pure
 * projection arithmetic over the pair frame. The field weights are
 * Scala-computed constants folded into the plan, so the score is a
 * fixed-order sum of literals — engine-exact; round 6.
 *
 * Hot-key fence: blocking only bounds the pair space while every
 * block stays small — ONE pathological key (an empty-string city, a
 * null-ish placeholder date) silently turns the join quadratic. So
 * the pair build first audits per-block pair counts (a key-∝
 * aggregation, trivial next to the pair join it protects) and FAILS
 * LOUDLY when any block would form more than `maxBlockPairs`
 * candidates, naming the offending key — the caller salts or refines
 * the blocking key instead of OOM-ing hours into a 100 TB run.
 *
 * @param fields (name, agreement predicate over the prefixed pair
 *               frame `a_*`/`b_*`, m, u) — m, u ∈ (0,1), m > u
 */
object Linkage {

  final case class Field(
      name: String, agrees: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1,
      s"m/u must be in (0,1) for $name")
    require(m > u, s"agreement must be more likely among matches ($name)")
    def wAgree: Double = math.log(m / u)
    def wDisagree: Double = math.log((1 - m) / (1 - u))
  }

  /**
   * Score all blocked pairs of `a` × `b`. Columns of `a` arrive in the
   * pair frame as `a_<name>`, of `b` as `b_<name>`; `fields`
   * predicates are written against those. A NULL on either side of a
   * predicate evaluates as disagreement (null-safe via coalesce) —
   * absent evidence must not silently count as agreement.
   *
   * Output: (id_a, id_b, per-field agreement booleans `agree_<name>`,
   * score, decision) — decision ∈ match / possible / non_match by
   * `upper` / `lower`.
   *
   * @param maxBlockPairs hot-key fence (see the object docblock): the
   *        largest |a-block|·|b-block| any single block key may form.
   *        The default caps one block's pairs at 25M (~a few seconds
   *        of score arithmetic per executor core); pass
   *        `Long.MaxValue` to opt out for a key already proven safe.
   */
  def fellegiSunter(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      blockCol: String,
      fields: Seq[Field],
      upper: Double,
      lower: Double,
      maxBlockPairs: Long = 25_000_000L): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(upper >= lower, "upper threshold must be >= lower")
    if (maxBlockPairs < Long.MaxValue) {
      // key-∝ audit; null keys never join, so they never form pairs
      // decimal product: a Long __na·__nb overflows past ~3e9-row
      // sides and would silently disable the fence at exactly the
      // scale it exists for
      val pairs2 = col("__na").cast("decimal(20,0)") * col("__nb")
      val hot = a.filter(col(blockCol).isNotNull)
        .groupBy(col(blockCol).as("__k")).agg(count(lit(1)).as("__na"))
        .join(b.filter(col(blockCol).isNotNull)
          .groupBy(col(blockCol).as("__k")).agg(count(lit(1)).as("__nb")),
          Seq("__k"))
        .filter(pairs2 > lit(maxBlockPairs).cast("decimal(38,0)"))
        .select(col("__k").cast("string"), pairs2.cast("decimal(38,0)"))
        .limit(1).collect()
      require(hot.isEmpty, {
        val r = hot.head
        s"blocking key '${r.getString(0)}' would form ${r.getDecimal(1)} " +
          s"candidate pairs (> maxBlockPairs=$maxBlockPairs): one hot " +
          "block makes the linkage join quadratic — salt or refine the " +
          "blocking key (or raise the cap explicitly)"
      })
    }
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    val pairs = prefixed(a, "a_")
      .join(prefixed(b, "b_"),
        col(s"a_$blockCol") === col(s"b_$blockCol"))
    val withAgrees = fields.foldLeft(pairs) { (d, f) =>
      d.withColumn(s"agree_${f.name}", coalesce(f.agrees, lit(false)))
    }
    val score = fields.map { f =>
      when(col(s"agree_${f.name}"), lit(f.wAgree)).otherwise(lit(f.wDisagree))
    }.reduce(_ + _)
    withAgrees
      .withColumn("score", round(score, 6))
      .withColumn("decision",
        when(col("score") >= upper, lit("match"))
          .when(col("score") <= lower, lit("non_match"))
          .otherwise(lit("possible")))
      .select(Seq(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b")) ++
        fields.map(f => col(s"agree_${f.name}")) ++
        Seq(col("score"), col("decision")): _*)
  }
}
