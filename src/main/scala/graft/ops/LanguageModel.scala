package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus unigram language model scoring (north-star extension) — the
 * CCNet-style quality fence: score every document by its mean negative
 * log-likelihood under the corpus's own unigram distribution. Rote /
 * boilerplate text (common tokens) scores low, lexically unusual text
 * scores high; thresholding either tail is a standard corpus-curation
 * fence, one rung up from [[TextOps.qualityScore]]'s surface
 * heuristics and one below a real LM ([[Scoring]]'s seam).
 *
 * Plan shape: token counts are ONE explode + hash-aggregate (map-side
 * partials, shuffle ∝ vocabulary); scoring re-explodes the corpus and
 * joins each token to its count. With `broadcastVocab` the count table
 * ships to every executor and scoring is a narrow map-side join —
 * right whenever the vocabulary fits in memory (always true after
 * hashed bucketing). At raw-token 100 TB scale set it false: the join
 * shuffles on the token key and AQE's skew splitting handles stopword
 * keys; or pre-bucket tokens with [[TextOps.hashedTermFrequencies]]'s
 * hash to bound the vocabulary first.
 *
 * MLE probabilities (`c/N`) — every scored token exists in the model
 * corpus by construction when scoring the corpus itself; smoothing
 * becomes necessary only when scoring held-out text against a frozen
 * model. Output rounded to 6 decimals (double-sum association is the
 * only cross-engine/partitioning jitter, ~1e-14 at these magnitudes).
 */
object LanguageModel {

  /** Corpus unigram counts: (token, c). */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("c"))

  /**
   * Good–Turing frequency mass estimates (Good 1953; the Gale–Sampson
   * "simple Good–Turing" presentation, public) — how much probability
   * mass belongs to words seen exactly r times, including the UNSEEN
   * (r = 0) mass every open-vocabulary consumer needs (KN's discount,
   * OOV budgets, "how much of the language have we crawled"):
   *
   *   mass(r) = (r+1) · n_{r+1} / N      (n_r = #types with count r)
   *
   * — so mass(0) = n₁/N: the singleton share IS the unseen-mass
   * estimate, the classic result. Reported for r = 0…maxR next to the
   * raw counts, so the tail where the estimate gets noisy (n_r sparse)
   * is visible rather than smoothed over.
   *
   * Scale shape: one token count (vocab-bounded), one
   * count-of-counts aggregation (≤ distinct-count-values rows), a
   * bounded self-join on r+1. All integers; each mass is one division
   * (round 6).
   *
   * Output: (r, n_types, gt_mass), maxR+1 rows (absent n_r → 0).
   */
  def goodTuringMass(
      df: DataFrame,
      textCol: String,
      maxR: Int = 5): DataFrame = {
    require(maxR >= 1, s"maxR must be >= 1, got $maxR")
    val counts = unigramCounts(df, textCol)
    val fof = counts.groupBy(col("c").as("__r"))
      .agg(count(lit(1)).as("__nr"))
      .localCheckpoint() // joined twice below
    val total = counts.agg(sum(col("c")).as("__tot"))
    val rs = df.sparkSession.createDataFrame((0 to maxR).map(Tuple1(_)))
      .toDF("r")
    rs
      .join(fof.select(col("__r").cast("int").as("r"),
        col("__nr").as("n_types")), Seq("r"), "left_outer")
      .join(fof.select((col("__r") - 1).cast("int").as("r"),
        col("__nr").as("__nr1")), Seq("r"), "left_outer")
      .crossJoin(broadcast(total))
      .select(col("r"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        round((col("r") + 1) * coalesce(col("__nr1"), lit(0L))
          .cast("double") / col("__tot"), 6).as("gt_mass"))
  }

  /** Per-doc mean negative log-likelihood: (idCol, nll). */
  def meanNegLogLik(
      df: DataFrame,
      textCol: String,
      idCol: String,
      broadcastVocab: Boolean = true): DataFrame = {
    val toks = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
    // vocab-sized; read TWICE (scoring join + normalizer) — materialize
    // so the count aggregation over the corpus runs once
    val counts = unigramCounts(df, textCol).localCheckpoint()
    val vocab = if (broadcastVocab) broadcast(counts) else counts
    val n = counts.agg(sum("c").cast("double").as("__n"))
    toks.join(vocab, "token")
      .crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(round(avg(-log(col("c").cast("double") / col("__n"))), 6).as("nll"))
  }

  /**
   * Score held-out documents against a FROZEN model (`modelCounts` =
   * some corpus's [[unigramCounts]], typically persisted parquet next
   * to the [[graft.io.SignatureIndex]]): add-one (Laplace) smoothing
   * handles out-of-vocabulary tokens — `p = (c+1)/(N+V)`, `c = 0` when
   * unseen — which is exactly what MLE cannot do and why the frozen-
   * model path needs its own operator. LEFT join keeps OOV tokens
   * flowing; same broadcast/shuffle vocabulary trade as
   * [[meanNegLogLik]]. Output: (idCol, nll).
   */
  def scoreHeldOut(
      modelCounts: DataFrame,
      df: DataFrame,
      textCol: String,
      idCol: String,
      broadcastVocab: Boolean = true): DataFrame = {
    // the model is read twice (scoring join + smoothing stats); a
    // parquet-backed model re-scans cheaply, but an UNMATERIALIZED
    // counts pipeline would re-aggregate its corpus — checkpoint
    val model = modelCounts.localCheckpoint()
    val vocab = if (broadcastVocab) broadcast(model) else model
    val stats = model.agg(
      sum("c").cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .join(vocab, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(round(avg(-log(
        (coalesce(col("c"), lit(0L)) + 1).cast("double") / (col("__n") + col("__v")))),
        6).as("nll"))
  }

  /** Hashed n-gram features (unigrams + bigrams → one of `dims` hash
    * buckets), one row per gram INSTANCE: (idCol, bucket). The fixed-
    * width feature space needs no vocabulary pass — [[TextOps
    * .hashedTermFrequencies]]'s hashing trick, widened to bigrams so
    * word ORDER contributes (the feature set of the DSIR selector
    * below). md5-derived bucket for oracle parity ([[Dedup.HashKind]]
    * swap story for production). Short docs: the bigram list floors to
    * the whole text ([[TextOps.wordShingles]]'s 1-element floor),
    * mirrored verbatim in the oracle SQL. */
  def hashedGrams(df: DataFrame, textCol: String, idCol: String, dims: Int): DataFrame = {
    require(dims >= 2, "feature space needs at least 2 buckets")
    val t = col(textCol)
    df.select(
        col(idCol),
        explode(concat(
          TextOps.tokens(t),
          graft.functions.GraftFunctions.wordShingles(df.sparkSession, t, 2))).as("__g"))
      .select(col(idCol), pmod(Dedup.Md5.base(col("__g")), lit(dims.toLong)).as("bucket"))
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling"): score every raw
   * document by how much more likely its hashed-n-gram bag is under
   * the TARGET domain's distribution than under the raw corpus's own —
   * `Σ_grams ln p̂_target(b) − ln p̂_raw(b)`, with add-one smoothing
   * over the `dims` hash buckets (`p̂(b) = (c_b + 1)/(N + dims)`).
   * Selecting the top weights (or Gumbel-top-k resampling on them)
   * tilts a generic crawl toward a target domain with nothing but two
   * bag-of-hashed-ngrams passes — the standard cheap alternative to a
   * trained quality classifier ([[Scoring]]'s seam).
   *
   * Plan shape: both models are ONE explode + hash-aggregate each
   * (map-side partials; shuffle ∝ `dims`, NOT vocabulary). The scorer
   * joins each raw gram instance to a `dims`-row broadcast lookup of
   * per-bucket log-ratios (never more than `dims` rows ship anywhere)
   * and sums per doc — one doc-keyed shuffle with partial aggregation.
   * Nothing here holds state proportional to the corpus: at 100 TB the
   * raw corpus is scanned twice (model fit + scoring), which is the
   * DSIR algorithm's own shape.
   *
   * Output: (idCol, logratio) — one row per raw doc, rounded 6 (double
   * sum-order jitter ~1e-12 at these magnitudes).
   */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      dims: Int): DataFrame = {
    // The gram explode (2× token volume — the dominant cost) feeds BOTH
    // the raw-count model fit and the final scoring join; materialize it
    // once (same convention as the shared frames in Dedup).
    val rawG = hashedGrams(raw, textCol, idCol, dims).localCheckpoint()
    val tgtC = hashedGrams(target, textCol, idCol, dims)
      .groupBy("bucket").agg(count(lit(1)).as("tc"))
    val rawC = rawG.groupBy("bucket").agg(count(lit(1)).as("rc"))
    val stats = tgtC.agg(sum("tc").cast("double").as("__tn"))
      .crossJoin(rawC.agg(sum("rc").cast("double").as("__rn")))
    val d = lit(dims.toDouble)
    // ≤ dims rows; buckets the target never saw still need their raw
    // count (smoothed target prob) → full outer over the bucket key
    val lut = tgtC.join(rawC, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(stats))
      .select(
        col("bucket"),
        (log((coalesce(col("tc"), lit(0L)) + lit(1)).cast("double") / (col("__tn") + d)) -
          log((coalesce(col("rc"), lit(0L)) + lit(1)).cast("double") / (col("__rn") + d)))
          .as("__lr"))
    rawG.join(broadcast(lut), "bucket")
      .groupBy(col(idCol))
      .agg(round(sum("__lr"), 6).as("logratio"))
  }

  /**
   * Hashed-feature multinomial Naive Bayes — the fastText-style
   * corpus classifier seam (quality filtering against a curated seed
   * set, domain routing, large-scale language ID) as pure
   * aggregations. Train on a LABELED slice: per-class gram-bucket
   * counts with add-one smoothing over the `dims` buckets
   * (`ln (c(class,b)+1)/(n_class+dims)`) plus log class priors from
   * doc counts — the whole model is a `classes × dims`-row table.
   * Score: one gram explode + one broadcast LUT join + one doc-keyed
   * aggregation; prediction = argmax of joint log-likelihood, ties →
   * lexicographically smallest class (deterministic, the oracle
   * replays it as a rank window).
   *
   * Scale shape: training shuffles ≤ classes×dims count partials
   * (map-side combine); scoring broadcasts the model and shuffles one
   * row per (doc, class) partial — never anything corpus-∝. The
   * features are [[hashedGrams]]' unigram+bigram buckets, so the
   * classifier shares the DSIR selector's feature space.
   *
   * Output: (idCol, predicted, score) — score = winning class's
   * rounded joint log-likelihood.
   */
  def naiveBayesClassify(
      train: DataFrame,
      test: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: String,
      dims: Int): DataFrame =
    naiveBayesScore(
      naiveBayesModel(train, textCol, labelCol, dims), test, textCol, idCol)

  private def nbGrams(
      df: DataFrame, textCol: String, key: Column, keyName: String,
      dims: Int): DataFrame = {
    val t = col(textCol)
    df.select(key.as(keyName),
        explode(concat(
          TextOps.tokens(t),
          graft.functions.GraftFunctions.wordShingles(df.sparkSession, t, 2)))
          .as("__g"))
      .select(col(keyName), pmod(Dedup.Md5.base(col("__g")), lit(dims.toLong)).as("bucket"))
  }

  /**
   * The trained Naive Bayes model as a PERSISTABLE table — classes ×
   * dims rows of `(cls, bucket, ll, lp)`: the add-one-smoothed bucket
   * log-likelihood and the class log-prior (denormalized per row, so
   * one parquet write captures the whole model). Train once on the
   * labeled slice, publish next to the other durable layers, score
   * any later batch with [[naiveBayesScore]] — the frozen-model
   * lifecycle [[scoreHeldOut]] gives the unigram LM, for the
   * classifier.
   */
  def naiveBayesModel(
      train: DataFrame,
      textCol: String,
      labelCol: String,
      dims: Int): DataFrame = {
    val spark = train.sparkSession
    // (class, bucket) counts feed the totals AND the LUT — materialize
    val counts = nbGrams(train, textCol, col(labelCol), "__cls", dims)
      .groupBy("__cls", "bucket").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val totals = counts.groupBy("__cls").agg(sum("__c").cast("double").as("__n"))
    val docTotal = train.agg(count(lit(1)).cast("double").as("__dt"))
    val priors = train.groupBy(col(labelCol).as("__cls"))
      .agg(count(lit(1)).as("__docs"))
      .crossJoin(broadcast(docTotal))
      .select(col("__cls"), log(col("__docs").cast("double") / col("__dt")).as("lp"))
    // every (class, bucket) cell gets a row: unseen buckets still
    // carry smoothing mass when a scored doc hashes into them
    totals
      .crossJoin(spark.range(dims).select(col("id").as("bucket")))
      .join(counts, Seq("__cls", "bucket"), "left")
      .select(col("__cls"), col("bucket"),
        log((coalesce(col("__c"), lit(0L)) + lit(1)).cast("double") /
          (col("__n") + lit(dims.toDouble))).as("ll"))
      .join(broadcast(priors), "__cls")
      .select(col("__cls").as("cls"), col("bucket"), col("ll"), col("lp"))
  }

  /** Score a corpus against a (possibly parquet-read) [[naiveBayesModel]]:
    * one gram explode + broadcast model join + doc-keyed argmax (ties →
    * smallest class). `dims` is implied by the model's bucket range.
    * Output: (idCol, predicted, score). */
  def naiveBayesScore(
      model: DataFrame,
      df: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val m = model.localCheckpoint() // read for dims probe + the join
    // dims is inferred as max(bucket)+1 — sound ONLY on the complete
    // classes×dims grid naiveBayesModel writes. Validate that shape so
    // a filtered/compacted model (e.g. zero-count rows pruned before
    // persisting) fails loudly instead of silently shrinking the hash
    // space and misbucketing every scored gram.
    val shape = m.agg(
      max("bucket").as("mb"),
      countDistinct("cls").as("nc"),
      count(lit(1)).as("n")).first()
    val dims = shape.getLong(0) + 1
    require(
      shape.getLong(2) == shape.getLong(1) * dims,
      s"naiveBayesScore: model is not the complete classes×dims grid " +
        s"(${shape.getLong(1)} classes × $dims dims implies " +
        s"${shape.getLong(1) * dims} rows, found ${shape.getLong(2)}); " +
        "a pruned/filtered model would misbucket every gram — rebuild " +
        "with naiveBayesModel, which writes every (class, bucket) cell")
    nbGrams(df, textCol, col(idCol), idCol, dims.toInt)
      .join(broadcast(m), "bucket")
      .groupBy(col(idCol), col("cls"))
      .agg(sum("ll").as("__gll"), max("lp").as("__lp"))
      .select(col(idCol), col("cls"),
        round(col("__gll") + col("__lp"), 6).as("__score"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__score")).as("ns"), col("cls").as("cls"))).as("__best"))
      .select(col(idCol),
        col("__best.cls").as("predicted"),
        (-col("__best.ns")).as("score"))
  }

  /**
   * Interpolated bigram LM NLL (KenLM-lite): per-doc mean
   * `−ln [λ·P̂(w₂|w₁) + (1−λ)·P̂(w₂)]` over the doc's bigram
   * positions, both components add-one smoothed — `P̂(w) =
   * (c(w)+1)/(N+V)`, `P̂(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V)`. One step
   * beyond [[meanNegLogLik]]'s unigram fence: word ORDER now matters,
   * so shuffled/templated word salad that sails through a unigram
   * model scores high here.
   *
   * State: vocabulary- and bigram-vocabulary-sized count tables
   * (broadcast at fixture scale; the same broadcast/shuffle seam as
   * [[meanNegLogLik]] governs at 100 TB where the bigram vocabulary
   * outgrows a broadcast). Docs with fewer than 2 tokens have no
   * bigram positions and are excluded (document the contract rather
   * than invent a score).
   *
   * Output: (idCol, nll2).
   */
  def bigramNll(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, "interpolation weight must be in (0, 1)")
    val spark = df.sparkSession
    val multi = df.filter(size(TextOps.tokens(col(textCol))) >= 2)
    val bi = multi.select(col(idCol),
        explode(graft.functions.GraftFunctions.wordShingles(spark, col(textCol), 2))
          .as("__bg"))
      .select(col(idCol), col("__bg"),
        substring_index(col("__bg"), " ", 1).as("__w1"),
        substring_index(col("__bg"), " ", -1).as("__w2"))
    val uni = unigramCounts(df, textCol).localCheckpoint()
    val biC = multi.select(
        explode(graft.functions.GraftFunctions.wordShingles(spark, col(textCol), 2))
          .as("__bg"))
      .groupBy("__bg").agg(count(lit(1)).as("__bc"))
    val stats = uni.agg(
      sum("c").cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    val pU = (coalesce(col("__c2"), lit(0L)) + lit(1)).cast("double") /
      (col("__n") + col("__v"))
    val pB = (coalesce(col("__bc"), lit(0L)) + lit(1)).cast("double") /
      (coalesce(col("__c1"), lit(0L)).cast("double") + col("__v"))
    bi
      .join(broadcast(uni.select(col("token").as("__w2"), col("c").as("__c2"))),
        Seq("__w2"), "left")
      .join(broadcast(uni.select(col("token").as("__w1"), col("c").as("__c1"))),
        Seq("__w1"), "left")
      .join(broadcast(biC), Seq("__bg"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(round(avg(-log(lit(lambda) * pB + (lit(1.0) - lit(lambda)) * pU)), 6)
        .as("nll2"))
  }

  /**
   * Interpolated Kneser–Ney bigram NLL (Kneser & Ney 1995; the
   * formulation in Chen & Goodman 1998 §2.7) — THE standard n-gram
   * smoothing, one rung above [[bigramNll]]'s add-one interpolation:
   * absolute discounting plus the CONTINUATION unigram. The lower-order
   * weight of a word is how many distinct contexts it follows, not how
   * often it occurs — the classic "San Francisco" effect ("Francisco"
   * is frequent but only ever follows "San", so its continuation
   * probability is tiny and novel contexts stop backing off to it).
   *
   *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/h(w₁)
   *              + D·N₁₊(w₁·)/h(w₁) · N₁₊(·w₂)/B
   *
   * with `h(w₁) = Σ_w c(w₁w)` (bigram instances with history w₁),
   * `N₁₊(w₁·)`/`N₁₊(·w₂)` the distinct-successor/-predecessor type
   * counts, and `B` the total number of distinct bigram types. Scoring
   * the model corpus itself: every bigram position is in-model by
   * construction, so the max(·,0) guard is belt only.
   *
   * Scale shape: every model statistic is a decomposable aggregation
   * over the bigram TYPE table (vocab-bounded, never corpus-∝); the
   * history/continuation tables are sub-vocabulary-sized. Scoring joins
   * each bigram position against three broadcast LUTs — the same
   * broadcast/shuffle seam as [[bigramNll]] governs when the bigram
   * vocabulary outgrows a broadcast at raw-crawl scale. All counts are
   * exact integers; the only doubles are the final per-position
   * probability and the per-doc mean (round 6 — the usual sum-order
   * jitter bound).
   *
   * Docs with fewer than 2 tokens have no bigram positions and are
   * excluded ([[bigramNll]]'s contract). Output: (idCol, nll_kn).
   */
  def kneserNeyNll(
      df: DataFrame,
      textCol: String,
      idCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "absolute discount must be in (0, 1)")
    val spark = df.sparkSession
    val multi = df.filter(size(TextOps.tokens(col(textCol))) >= 2)
    val bg = multi.select(col(idCol),
        explode(graft.functions.GraftFunctions.wordShingles(spark, col(textCol), 2))
          .as("__bg"))
    // bigram TYPE table — feeds all four model statistics; materialize
    // so the corpus explode aggregates once
    val biC = bg.groupBy("__bg").agg(count(lit(1)).as("__bc"))
      .select(col("__bg"), col("__bc"),
        substring_index(col("__bg"), " ", 1).as("__w1"),
        substring_index(col("__bg"), " ", -1).as("__w2"))
      .localCheckpoint()
    // per-history: h(w1) = Σ c(w1 ·) and fertility N1+(w1 ·)
    val hist = biC.groupBy("__w1").agg(
      sum("__bc").as("__h"), count(lit(1)).as("__fert"))
    // per-continuation: N1+(· w2)
    val cont = biC.groupBy("__w2").agg(count(lit(1)).as("__pre"))
    val totTypes = biC.agg(count(lit(1)).cast("double").as("__bt"))
    val d = lit(discount)
    val p = greatest(col("__bc").cast("double") - d, lit(0.0)) /
        col("__h").cast("double") +
      d * col("__fert").cast("double") / col("__h").cast("double") *
        (col("__pre").cast("double") / col("__bt"))
    bg
      .join(broadcast(biC), "__bg")
      .join(broadcast(hist), "__w1")
      .join(broadcast(cont), "__w2")
      .crossJoin(broadcast(totTypes))
      .groupBy(col(idCol))
      .agg(round(avg(-log(p)), 6).as("nll_kn"))
  }

  /**
   * Stupid-backoff trigram NLL (Brants et al. 2007, "Large Language
   * Models in Machine Translation" — the web-scale n-gram scorer) —
   * the deliberately unnormalized backoff Google shipped for
   * trillion-token counts because proper discounting (the
   * [[kneserNeyNll]] machinery) stops mattering at that scale:
   *
   *   S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂)          if the trigram is seen
   *              = α·c(w₂w₃)/c(w₂)             else if the bigram is
   *              = α²·(c(w₃)+1)/(N+V)          else (add-one unigram
   *                                             floor so unseen words
   *                                             still score finitely)
   *
   * with the fixed backoff penalty α = 0.4 from the paper. Counts come
   * from `model`; `score` is the held-out side — scoring the model
   * corpus on itself would never leave the first branch, so the
   * backoff path only means something across a real train/heldout
   * split (the q69 discipline).
   *
   * Scale shape: three vocabulary-bounded count tables (trigram,
   * bigram, unigram types — never corpus-∝) joined as broadcast LUTs
   * against the held-out trigram positions; the same broadcast/shuffle
   * seam as [[bigramNll]] governs when the n-gram vocabulary outgrows
   * a broadcast. All counts exact integers; S is exact-integer ratios
   * (one double division per branch), −ln and the per-doc mean are the
   * only float accumulations (round 6).
   *
   * Held-out docs with fewer than 3 tokens have no trigram positions
   * and are excluded (the [[bigramNll]] contract). Output:
   * (idCol, nll_sb).
   */
  def stupidBackoffNll(
      model: DataFrame,
      score: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, "backoff penalty must be in (0, 1)")
    val spark = model.sparkSession
    def grams(df: DataFrame, n: Int, out: String) = df
      .filter(size(TextOps.tokens(col(textCol))) >= n)
      .select(col(idCol),
        explode(graft.functions.GraftFunctions
          .wordShingles(spark, col(textCol), n)).as(out))
    val triC = grams(model, 3, "__tg")
      .groupBy("__tg").agg(count(lit(1)).as("__c3"))
    val biC = grams(model, 2, "__bg")
      .groupBy("__bg").agg(count(lit(1)).as("__c2"))
    val uni = unigramCounts(model, textCol)
    val stats = uni.agg(
      sum("c").cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    val pos = grams(score, 3, "__tg").select(col(idCol), col("__tg"),
      substring_index(col("__tg"), " ", 2).as("__h12"),
      substring_index(col("__tg"), " ", -2).as("__g23"),
      substring_index(substring_index(col("__tg"), " ", 2), " ", -1)
        .as("__w2"),
      substring_index(col("__tg"), " ", -1).as("__w3"))
    val s = when(coalesce(col("__c3"), lit(0L)) > 0,
        col("__c3").cast("double") / col("__ch"))
      .when(coalesce(col("__cg"), lit(0L)) > 0,
        lit(alpha) * col("__cg").cast("double") / col("__cw2"))
      .otherwise(lit(alpha * alpha) *
        (coalesce(col("__c1"), lit(0L)) + lit(1)).cast("double") /
        (col("__n") + col("__v")))
    pos
      .join(broadcast(triC), Seq("__tg"), "left")
      .join(broadcast(biC.select(col("__bg").as("__h12"),
        col("__c2").as("__ch"))), Seq("__h12"), "left")
      .join(broadcast(biC.select(col("__bg").as("__g23"),
        col("__c2").as("__cg"))), Seq("__g23"), "left")
      .join(broadcast(uni.select(col("token").as("__w2"),
        col("c").as("__cw2"))), Seq("__w2"), "left")
      .join(broadcast(uni.select(col("token").as("__w3"),
        col("c").as("__c1"))), Seq("__w3"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(round(avg(-log(s)), 6).as("nll_sb"))
  }

  /**
   * PMI collocations (Church & Hanks 1990, public) — word pairs that
   * co-occur far above chance: `pmi(x,y) = ln(c(xy)·T / (c(x·)·c(·y)))`
   * over adjacent-bigram positions, with `T` the total positions and
   * the marginals counted in the SAME position table (left-slot /
   * right-slot counts, so Σ marginals ≡ T exactly). The multiword-
   * expression miner of the tokenizer/phrase-table world: "San
   * Francisco" surfaces long before raw frequency would find it.
   *
   * `minCount` fences the classic PMI pathology — singleton pairs of
   * two rare words score arbitrarily high — and is also the scale
   * fence: the output candidate set is (pairs with c ≥ minCount),
   * collapsing the vocab² tail before the join. Everything is exact
   * integer counts aggregated decomposably over the bigram TYPE table
   * (vocab-bounded, never corpus-∝); `ln` of an exact integer ratio is
   * the only double (round 6). Top-k is `TakeOrderedAndProject`
   * (pmi desc, bigram asc — deterministic).
   *
   * Output: (bigram, n_pair, n_left, n_right, pmi), topK rows.
   */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 3L,
      topK: Int = 20): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val spark = df.sparkSession
    val bg = df
      .filter(size(TextOps.tokens(col(textCol))) >= 2)
      .select(explode(
        graft.functions.GraftFunctions.wordShingles(spark, col(textCol), 2))
        .as("__bg"))
    val biC = bg.groupBy("__bg").agg(count(lit(1)).as("n_pair"))
      .select(col("__bg"), col("n_pair"),
        substring_index(col("__bg"), " ", 1).as("__w1"),
        substring_index(col("__bg"), " ", -1).as("__w2"))
      .localCheckpoint() // feeds marginals, total, AND the candidates
    val left = biC.groupBy("__w1").agg(sum("n_pair").as("n_left"))
    val right = biC.groupBy("__w2").agg(sum("n_pair").as("n_right"))
    val total = biC.agg(sum(col("n_pair")).cast("double").as("__t"))
    biC.filter(col("n_pair") >= minCount)
      .join(broadcast(left), "__w1")
      .join(broadcast(right), "__w2")
      .crossJoin(broadcast(total))
      .select(col("__bg").as("bigram"), col("n_pair"),
        col("n_left"), col("n_right"),
        round(log(col("n_pair").cast("double") * col("__t") /
          (col("n_left").cast("double") * col("n_right").cast("double"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(topK)
  }
}
