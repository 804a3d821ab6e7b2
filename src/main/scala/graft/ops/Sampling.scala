package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling and splitting. `df.sample()` draws
 * from a per-partition RNG, so results change with partitioning, task
 * retries, and reruns — unacceptable for training-data splits, where a
 * document must land on the SAME side of the train/eval fence in every
 * pipeline run forever (else eval contaminates training across
 * versions). Hashing a stable key into the unit interval makes
 * membership a pure function of the key:
 *
 *  - reproducible across runs, engines (md5), partitionings, and scale;
 *  - consistent: `fraction=0.25` is a SUBSET of `fraction=0.5` for the
 *    same salt, so growing a sample never resamples old members;
 *  - disjoint splits come from interval partitioning of the same hash.
 *
 * `salt` decorrelates different sampling decisions over the same keys.
 * All narrow (no shuffle) — filters evaluate at scan speed.
 */
object Sampling {

  /** Stable unit-interval position of a key (md5, salted). */
  def unitPos(key: Column, salt: String): Column =
    Sketches.unitHash(concat_ws(":", lit(salt), key.cast("string")))

  /** Keep rows whose salted key hash falls below `fraction`. */
  def deterministicSample(
      df: DataFrame, keyCol: String, fraction: Double, salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(unitPos(col(keyCol), salt) < fraction)
  }

  /**
   * Stratified deterministic sampling — the data-MIXING primitive: each
   * stratum (domain, language, source…) keeps its own fraction of rows,
   * so a training mix like "90% en, 25% es, 5% zh" is one narrow filter
   * over the corpus. Membership is a pure function of (salt, key):
   * reruns, repartitions, and scale-ups keep every row on the same side,
   * and because all strata share one hash position, RAISING a stratum's
   * fraction strictly grows its sample (consistent mixture evolution).
   * Strata absent from `fractions` keep `defaultFraction`.
   */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    // deterministic CASE order (sorted keys) — evaluation order never
    // matters semantically (strata are disjoint) but a canonical plan
    // keeps explains and oracle SQL stable
    val frac = fractions.toSeq.sortBy(_._1).foldRight(lit(defaultFraction): Column) {
      case ((s, f), acc) => when(col(strataCol) === s, lit(f)).otherwise(acc)
    }
    df.filter(unitPos(col(keyCol), salt) < frac)
  }

  /**
   * Temperature-scaled mixture weights (the UniMax/multilingual-
   * sampling primitive): stratum `s` with `c_s` units (tokens, docs)
   * gets weight `c_s^α / Σ c^α` — α = 1 reproduces natural proportions,
   * α → 0 flattens toward uniform — and a per-stratum keep fraction
   * `min(1, target·w_s / c_s)` that realizes a `targetUnits`-sized
   * mixture when fed to [[stratifiedSample]].
   *
   * Plan: one partial-aggregated groupBy for the counts, a one-row
   * normalizer broadcast back — the result is |strata| rows; nothing
   * here grows with the corpus. Doubles rounded to 6 decimals at the
   * output boundary (cross-engine sum-order jitter is ~1e-16).
   *
   * Output: (strataCol, n_units, weight, keep_fraction).
   */
  def mixtureWeights(
      df: DataFrame,
      strataCol: String,
      unitCol: Column,
      alpha: Double,
      targetUnits: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, "temperature exponent must be in (0, 1]")
    require(targetUnits > 0, "target mixture size must be positive")
    val counts = df.groupBy(col(strataCol))
      .agg(sum(unitCol).cast("long").as("n_units"))
    val z = counts.agg(sum(pow(col("n_units"), alpha)).as("__z"))
    val w = pow(col("n_units"), alpha) / col("__z")
    counts.crossJoin(broadcast(z))
      .select(
        col(strataCol),
        col("n_units"),
        round(w, 6).as("weight"),
        round(least(lit(1.0), lit(targetUnits.toDouble) * w / col("n_units")), 6)
          .as("keep_fraction"))
  }

  /**
   * Leakage-safe split: split by the near-dup CLUSTER, not the
   * document. A plain per-doc [[hashSplit]] routinely lands two
   * near-duplicates on opposite sides of the train/test fence —
   * training text leaks into evaluation through its copies. Here every
   * doc hashes on its cluster representative (`labels` = the
   * [[graft.ops.Dedup.components]] output; singletons represent
   * themselves), so an entire duplicate family always falls in ONE
   * split; weights then govern CLUSTER mass, which for bounded cluster
   * sizes converges to the same doc-level proportions.
   *
   * Scale shape: `labels` is pair-bounded (only clustered docs appear),
   * so the left join is broadcast-sized in practice; the fence itself
   * is the same stateless salted-hash interval test as [[hashSplit]] —
   * no shuffle beyond the label join, no per-split data pass.
   */
  def clusterAwareSplit(
      df: DataFrame,
      idCol: String,
      labels: DataFrame,
      weights: Seq[Double],
      salt: String = ""): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0) &&
      math.abs(weights.sum - 1.0) < 1e-9, "weights must be positive and sum to 1")
    val l = labels.select(col("id").as(idCol), col("label"))
    val keyed = df.join(l, Seq(idCol), "left")
      .withColumn("__skey", coalesce(col("label"), col(idCol)))
    val cum = weights.scanLeft(0.0)(_ + _)
    val pos = unitPos(col("__skey"), salt)
    val n = weights.size
    cum.sliding(2).toSeq.zipWithIndex.map { case (Seq(lo, hi), i) =>
      val b = if (i == n - 1) keyed.filter(pos >= lo)
              else keyed.filter(pos >= lo && pos < hi)
      b.drop("label", "__skey")
    }
  }

  /**
   * Token-budget selection — "keep the best docs until the budget is
   * spent". Given per-doc (score ∈ [0,1], tokens), selects the
   * highest-scoring subset whose token sum fits `budget`, WITHOUT the
   * global sort the naive `ORDER BY score DESC` formulation implies
   * (totally ordering 100 TB is the one thing a distributed engine
   * must never do). Three stages:
   *
   *  1. scores bin into `bins` fixed-width cells (stateless map);
   *  2. one decomposable groupBy yields per-bin token mass — ≤ `bins`
   *     rows to the driver, which walks them top-down to find the
   *     threshold bin and the remainder;
   *  3. bins above the threshold keep by a stateless filter; ONLY the
   *     threshold bin's docs (≈ corpus/bins rows) enter a running-sum
   *     window (ascending id — deterministic) to spend the remainder;
   *     bins below drop by filter.
   *
   * Selection granularity is by-bin, then by-id inside the threshold
   * bin — fully deterministic and replayable in plain SQL (q132's
   * oracle). Rows with a NULL score are never kept (no text ⇒ no
   * quality claim). Returns the input columns plus `keep`.
   */
  def tokenBudgetSelect(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      tokCol: String,
      budget: Long,
      bins: Int = 100): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(bins >= 1 && bins <= 100000, "bins must be in [1, 100000]")
    import org.apache.spark.sql.expressions.Window
    val bin = least(greatest(floor(col(scoreCol) * bins), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
    val cands = df.withColumn("__bin",
      when(col(scoreCol).isNotNull, bin))
    val mass = cands.filter(col("__bin").isNotNull)
      .groupBy("__bin").agg(sum(col(tokCol).cast("long")).as("btok"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(-_._1)
    var acc = 0L
    var cutoff = Option.empty[(Int, Long)] // (threshold bin, remainder)
    val it = mass.iterator
    while (it.hasNext && cutoff.isEmpty) {
      val (b, t) = it.next()
      if (acc + t <= budget) acc += t
      else cutoff = Some((b, budget - acc))
    }
    val out = cutoff match {
      case None => // everything fits
        cands.withColumn("keep", col("__bin").isNotNull)
      case Some((c, remaining)) =>
        val w = Window.partitionBy("__bin").orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val full = cands.filter(col("__bin").isNotNull && col("__bin") > c)
          .withColumn("keep", lit(true))
        val partial = cands.filter(col("__bin") === c)
          .withColumn("keep", sum(col(tokCol).cast("long")).over(w) <= remaining)
        val dropped = cands.filter(col("__bin").isNull || col("__bin") < c)
          .withColumn("keep", lit(false))
        full.unionByName(partial).unionByName(dropped)
    }
    out.drop("__bin")
  }

  /**
   * Disjoint covering split: row goes to bucket i when its hash lands in
   * `[cum_{i-1}, cum_i)` of the cumulative weight intervals. Returns one
   * DataFrame per weight (e.g. `Seq(0.8, 0.1, 0.1)` → train/val/test).
   */
  def hashSplit(
      df: DataFrame, keyCol: String, weights: Seq[Double], salt: String = ""): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0) &&
      math.abs(weights.sum - 1.0) < 1e-9, "weights must be positive and sum to 1")
    val cum = weights.scanLeft(0.0)(_ + _)
    val pos = unitPos(col(keyCol), salt)
    val n = weights.size
    cum.sliding(2).toSeq.zipWithIndex.map { case (Seq(lo, hi), i) =>
      // The LAST bucket is unbounded above (like a SQL CASE ... ELSE):
      // the floating cumulative sum can land just below 1.0, and the
      // hash itself reaches 1.0 inclusive — a `pos < hi` fence on the
      // final bucket would silently drop keys hashing into [hi, 1],
      // breaking the disjoint-COVERING contract.
      if (i == n - 1) df.filter(pos >= lo)
      else df.filter(pos >= lo && pos < hi)
    }
  }

  /**
   * Curriculum binning: assign every row to one of `nBins` difficulty
   * quantile bins of `metric` WITHIN its group — the
   * easy-to-hard-ordering primitive (curriculum learning schedules
   * consume the bin column, not a global sort: totally ordering 100 TB
   * is the one thing a distributed engine must never do).
   *
   * Two stages: per-group exact quantile boundaries
   * ([[Stats.exactPercentiles]] — one shuffle, |groups| rows out;
   * swap in `approxPercentiles` at extreme scale), broadcast back and
   * compared in a scan-speed CASE projection. The metric is rounded to
   * 6 decimals BEFORE ranking so both engines bin the identical value
   * against the identical boundary. Bins: 0 = lowest metric quantile.
   */
  def curriculumBins(
      df: DataFrame, groupCol: String, idCol: String, metric: Column,
      nBins: Int = 4, approx: Boolean = false): DataFrame = {
    require(nBins >= 2 && nBins <= 100, "need 2..100 bins")
    val scored = df.select(col(groupCol), col(idCol),
      round(metric.cast("double"), 6).as("metric"))
    val ps = (1 until nBins).map(_.toDouble / nBins)
    // approx = the extreme-scale configuration: GK-sketch boundaries
    // (bounded state, sort-free) instead of the per-group rank sort;
    // same output shape, bins shift only within the sketch's rank error
    val bounds = (if (approx) Stats.approxPercentiles(scored, Seq(groupCol), "metric", ps)
      else Stats.exactPercentiles(scored, Seq(groupCol), "metric", ps))
      .drop("n_rows")
    val bin = ps.map(p => when(col("metric") <= col(Stats.pName(p)), 0L).otherwise(1L))
      .reduce(_ + _)
    scored.join(broadcast(bounds), Seq(groupCol))
      .select(col(groupCol), col(idCol), col("metric"), bin.as("bin"))
  }

  /**
   * Cluster-capped diversity sampling: at most `cap` docs survive per
   * near-dup cluster (ranked `orderCol` DESC, id ASC — "keep the
   * longest/best few of each template family"), singletons always
   * survive. The anti-mode-collapse knob between full dedup (cap = 1 ≡
   * [[graft.ops.Dedup.dedupDecisions]]) and no dedup (cap = ∞): near-dup
   * families still contribute VARIANTS, just not their whole volume.
   *
   * Scale shape: only CLUSTERED docs (∝ verified pairs, ≪ corpus)
   * enter the ranking window; singletons bypass it entirely via an
   * anti-join, so the window partition count is the cluster count and
   * partition size the cluster size — never corpus-keyed. `labels` is
   * [[graft.ops.Dedup.components]] output (id, label).
   *
   * Output: (idCol, cluster_id, keep) — one row per input doc.
   */
  def clusterCapped(
      df: DataFrame,
      idCol: String,
      labels: DataFrame,
      cap: Int,
      orderCol: String): DataFrame = {
    require(cap >= 1, "cap must keep at least one doc per cluster")
    import org.apache.spark.sql.expressions.Window
    val l = labels.select(col("id").as(idCol), col("label"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col(orderCol).desc, col(idCol).asc)
    val ranked = df.join(l, Seq(idCol))
      .select(col(idCol), col(orderCol), col("label").as("cluster_id"))
      .withColumn("__rk", row_number().over(w))
      .select(col(idCol), col("cluster_id"), (col("__rk") <= cap).as("keep"))
    val singles = df.join(l, Seq(idCol), "left_anti")
      .select(col(idCol), col(idCol).as("cluster_id"), lit(true).as("keep"))
    ranked.union(singles)
  }

  /**
   * Excess-loss mixture weights (DoReMi-lite): upweight the domains a
   * reference model finds HARD. Per group: mean of the (already
   * rounded) per-item scores — typically [[graft.ops.LanguageModel
   * .meanNegLogLik]] per doc — then `excess = mean − min(means)` and
   * `weight = softmax(excess / T)` over the groups. T → 0 puts all
   * mass on the hardest domain; T → ∞ flattens to uniform.
   *
   * Scale shape: one groupBy over (group, score) pairs, then
   * |groups|-row arithmetic against two broadcast one-row stats — the
   * corpus-sized input is whatever produced the scores.
   *
   * Output: (groupCol, mean_score, weight), |groups| rows.
   */
  def excessLossWeights(
      scored: DataFrame,
      groupCol: String,
      scoreCol: String,
      temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, "softmax temperature must be positive")
    val means = scored.groupBy(col(groupCol))
      .agg(round(avg(col(scoreCol)), 6).as("mean_score"))
      .localCheckpoint() // feeds the min stat AND the weight projection
    val minStat = means.agg(min("mean_score").as("__min"))
    val expw = means.crossJoin(broadcast(minStat))
      .select(col(groupCol), col("mean_score"),
        exp((col("mean_score") - col("__min")) / lit(temperature)).as("__e"))
    val z = expw.agg(sum("__e").as("__z"))
    expw.crossJoin(broadcast(z))
      .select(col(groupCol), col("mean_score"),
        round(col("__e") / col("__z"), 6).as("weight"))
  }

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
   * public): each row draws key `u^(1/w)` and the k LARGEST keys per
   * stratum win — inclusion probability proportional to weight, no
   * sequential pass. The uniform `u` is [[unitPos]]'s salted md5 hash,
   * NOT an RNG, so the sample is a pure function of (salt, key,
   * weight): reruns, repartitions, task retries, and engines agree on
   * the exact member set — the property that makes a weighted training
   * mix reproducible. Rows with null or non-positive weight never
   * sample (a zero-weight row has key 0).
   *
   * Scale: one stratum-keyed window (rank over the score) — the same
   * single exchange every per-group top-k pays; for a GLOBAL sample
   * pass `strataCol = None` and the plan is a `TakeOrderedAndProject`
   * (k-row reduce, no global sort, no window).
   */
  /**
   * SOFT deduplication for mixture weighting: instead of hard-dropping
   * near-duplicate cluster members ([[Dedup.dedupDecisions]]'s
   * keep/drop), every member of a duplicate cluster gets weight
   * `1/|cluster|`, so each cluster contributes ONE unit of sampling
   * mass to the training mixture while keeping its internal variation
   * available — the documented alternative to hard dedup in the dedup
   * literature (duplicates signal quality as well as redundancy).
   * Singletons weigh 1. The output feeds [[weightedSample]]'s
   * Efraimidis–Spirakis keys directly (`weightCol = "weight"`).
   *
   * `labels` is [[Dedup.components]] output (`id`, `label`) — pair-∝
   * small. Scale shape: one decomposable cluster-size aggregation over
   * the labels (never the corpus), then two broadcast-sized joins onto
   * the corpus ids; weights round at 6 for oracle parity.
   */
  /**
   * Largest-remainder (Hare-quota) apportionment — the exact integer
   * allocator for "split `seats` eval/sample slots across groups
   * proportionally": each group gets ⌊seats·n_g/N⌋ outright, and the
   * leftover slots go to the largest FRACTIONAL remainders (the
   * election-apportionment standard; proportional-rounding by
   * truncation alone systematically starves small groups). The
   * deterministic backbone of eval-set construction — per-group
   * quotas that sum EXACTLY to the budget, bias-free.
   *
   * ENTIRELY integer: base = (seats·n_g) div N, remainder =
   * (seats·n_g) mod N — no floating quotas anywhere, so the
   * allocation replays bit-identically. Remainder ties break on the
   * group ascending (total order). One decomposable count + ONE
   * |groups|-row window.
   *
   * Output: (groupCol, n_rows, base, bonus, allocation);
   * Σ allocation = min(seats, …) — exactly `seats` by construction.
   */
  def largestRemainderAllocation(
      df: DataFrame,
      groupCol: String,
      seats: Long): DataFrame = {
    require(seats >= 1, s"seats must be >= 1, got $seats")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val withBase = counts
      .crossJoin(broadcast(counts.agg(sum(col("n_rows")).as("__N"))))
      .select(col(groupCol), col("n_rows"),
        (lit(seats) * col("n_rows")).as("__scaled"), col("__N"))
      .select(col(groupCol), col("n_rows"),
        expr("__scaled div __N").as("base"),
        (col("__scaled") % col("__N")).as("__rem"))
      .localCheckpoint() // feeds the leftover count AND the ranking
    val leftover = withBase
      .agg((lit(seats) - sum(col("base"))).as("__extra"))
    // single-partition window over the per-GROUP remainder rows
    // (group-bounded, never the corpus)
    val w = Window.orderBy(col("__rem").desc, col(groupCol).asc)
    withBase
      .withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(leftover))
      .select(col(groupCol), col("n_rows"), col("base"),
        when(col("__rk") <= col("__extra"), 1L).otherwise(0L).as("bonus"))
      .withColumn("allocation", col("base") + col("bonus"))
  }

  def softDedupWeights(
      df: DataFrame, idCol: String, labels: DataFrame): DataFrame = {
    val l = labels.select(col("id").as(idCol), col("label"))
    val sizes = l.groupBy("label").agg(count(lit(1)).as("__csize"))
    df.select(col(idCol))
      .join(l, Seq(idCol), "left")
      .join(sizes, Seq("label"), "left")
      .select(
        col(idCol),
        coalesce(col("label"), col(idCol)).as("cluster_id"),
        round(lit(1.0) / coalesce(col("__csize"), lit(1L)), 6).as("weight"))
  }

  /**
   * UniMax language-budget allocation (Chung et al., "UniMax: Fairer
   * and More Effective Language Sampling for Large-Scale Multilingual
   * Pretraining", 2023, public): given a total token budget `B` and a
   * per-language repeat ceiling (`epochCap` epochs over that
   * language's `tokens`), spread the budget as UNIFORMLY across
   * languages as the ceilings allow — head languages stop absorbing
   * the budget the moment every tail language is capped, instead of
   * proportional/temperature sampling's rich-get-richer allocation.
   *
   * This is water-filling with per-language capacity `cap_l =
   * epochCap · tokens_l`: allocate `alloc_l = min(cap_l, θ)` where θ
   * solves `Σ min(cap_l, θ) = B` (θ = ∞ when `Σ cap ≤ B` — everyone
   * is capped). Closed form over languages sorted ASCENDING by
   * capacity (ties: language asc): with `cum_i` the exclusive prefix
   * sum of capacities, `θ = max_i (B − cum_i)/(n − i + 1)` — one
   * window pass + a 1-row max, no driver loop.
   *
   * Determinism: capacities are `tokens × epochCap` — exact doubles
   * when epochCap is a small dyadic rational (the practical values: 1,
   * 2, 4, 0.5) — and the prefix sums of exact doubles are exact in any
   * order, so θ and every allocation replay bit-identically in the
   * oracle; the only rounding is the final 6-dp on the published rate.
   *
   * Scale shape: one corpus aggregation to (lang, tokens) — |langs|
   * rows — then all arithmetic happens on that frame; the window
   * partitions by a constant over |langs| rows, which is the POINT
   * (languages number in the hundreds, never corpus-∝). The per-doc
   * application is a broadcast join of the |langs|-row rate table.
   *
   * Output: (lang, n_tokens, capacity, alloc_tokens, sample_rate =
   * alloc/tokens — the per-language inclusion rate a sampler applies;
   * rate > 1 means the language repeats for that many epochs).
   */
  def unimaxAllocation(
      df: DataFrame,
      langCol: String,
      tokensCol: Column,
      budget: Long,
      epochCap: Double): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(epochCap > 0, "epochCap must be positive")
    import org.apache.spark.sql.expressions.Window
    val perLang = df
      .filter(col(langCol).isNotNull)
      .groupBy(col(langCol).as("lang"))
      .agg(sum(tokensCol).cast("double").as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * lit(epochCap))
    // |langs|-row frame from here on: the single-partition window is
    // deliberate (languages are bounded; the corpus never enters it)
    val ord = Window.orderBy(col("capacity").asc, col("lang").asc)
    val cum = Window.orderBy(col("capacity").asc, col("lang").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val n = Window.partitionBy(lit(1))
    val withTheta = perLang
      .withColumn("__i", row_number().over(ord))
      .withColumn("__cum", coalesce(sum(col("capacity")).over(cum), lit(0.0)))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("__r",
        (lit(budget.toDouble) - col("__cum")) / (col("__n") - col("__i") + 1))
      .withColumn("__theta", max(col("__r")).over(n))
    withTheta
      .select(col("lang"), col("n_tokens").cast("long").as("n_tokens"),
        col("capacity"),
        least(col("capacity"), col("__theta")).as("alloc_tokens"))
      .withColumn("sample_rate",
        round(col("alloc_tokens") / col("n_tokens"), 6))
      .withColumn("alloc_tokens", round(col("alloc_tokens"), 6))
  }

  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: String = "",
      strataCol: Option[String] = None): DataFrame = {
    require(k > 0, "sample size must be positive")
    val score = pow(unitPos(col(keyCol), salt),
      lit(1.0) / col(weightCol).cast("double"))
    // NaN guard is load-bearing: Spark ORDERS NaN above every numeric,
    // so `w > 0` alone would admit NaN weights (and their NaN keys
    // would then win every stratum's top-k)
    val eligible = df.filter(col(weightCol).isNotNull &&
        !isnan(col(weightCol).cast("double")) && col(weightCol) > 0)
      .withColumn("__ws", score)
    strataCol match {
      case Some(sc) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(sc)).orderBy(col("__ws").desc, col(keyCol).asc)
        eligible.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= k)
          .drop("__rk", "__ws")
      case None =>
        eligible.orderBy(col("__ws").desc, col(keyCol).asc)
          .limit(k)
          .drop("__ws")
    }
  }
}
