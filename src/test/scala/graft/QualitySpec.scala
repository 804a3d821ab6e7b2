package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quality

class QualitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (Some(1L), Some(5.0), "ok"),
    (None: Option[Long], Some(-2.0), "bad"),
    (Some(3L), None: Option[Double], "mixed")
  ).toDF("id", "amount", "label")

  private val rules = Seq(
    Quality.NotNull("id_not_null", "id"),
    Quality.GreaterThanZero("amount_positive", "amount"),
    Quality.ExprRule("label_short", "length(label) <= 4"))

  test("violationCounts: one row, one count column per rule, single pass") {
    val row = Quality.violationCounts(fixture, rules).collect()(0)
    assert(row.getAs[Long]("id_not_null") == 1)
    // only -2 counts: NULL amount gives a null predicate, and the rule
    // counts definite violations, mirroring the reference's filter().count()
    assert(row.getAs[Long]("amount_positive") == 1)
    assert(row.getAs[Long]("label_short") == 1) // "mixed" has length 5
  }

  test("ExprRule: null condition result counts as a violation") {
    val df = Seq(Some(0.05), None, Some(0.5)).toDF("d")
    val row = Quality.violationCounts(df,
      Seq(Quality.ExprRule("range", "d >= 0 and d <= 0.1"))).collect()(0)
    assert(row.getAs[Long]("range") == 2) // 0.5 out of range + NULL unknown
  }

  test("report: tall shape with passed flags") {
    val rep = Quality.report(fixture, rules).collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("invalid_count"), r.getAs[Boolean]("passed")))).toMap
    assert(rep("id_not_null") == ((1L, false)))
    assert(rep("amount_positive") == ((1L, false)))
    assert(rep("label_short") == ((1L, false)))
    val clean = Quality.report(fixture.filter("id = 1"), rules).collect()
    assert(clean.forall(_.getAs[Boolean]("passed")))
  }

  test("report on real data matches direct per-rule filter counts") {
    val li = TestSpark.table("lineitem")
    val rep = Quality.report(li, Seq(
      Quality.GreaterThanZero("positive_qty", "l_quantity"),
      Quality.ExprRule("discount_range", "l_discount >= 0 and l_discount <= 0.1")))
      .collect().map(r => r.getAs[String]("rule") -> r.getAs[Long]("invalid_count")).toMap
    assert(rep("positive_qty") == li.filter("l_quantity <= 0").count())
    assert(rep("discount_range") ==
      li.filter("not coalesce(l_discount >= 0 and l_discount <= 0.1, false)").count())
  }

  test("observed: metrics piggy-back on an unrelated action, zero extra scans") {
    val obs = Observation("q_test")
    val observed = Quality.observed(fixture, obs, rules)
    val n = observed.count() // the action that carries the metrics
    assert(n == 3)
    val m = obs.get
    assert(m("id_not_null") == 1L)
    assert(m("amount_positive") == 1L)
    assert(m("label_short") == 1L)
  }

  test("agreementKappa: hand-computed 2x2 confusion; nulls excluded") {
    // cells: (T,T)=20 (T,F)=5 (F,T)=10 (F,F)=15 -> n=50, agree=35,
    // po=0.7; marginals row (25,25) col (30,20) -> pe=(750+500)/2500=0.5
    // -> kappa = (0.7-0.5)/0.5 = 0.4
    val rows: Seq[(Option[Boolean], Option[Boolean])] =
      Seq.fill(20)((Some(true), Some(true))) ++
        Seq.fill(5)((Some(true), Some(false))) ++
        Seq.fill(10)((Some(false), Some(true))) ++
        Seq.fill(15)((Some(false), Some(false))) :+
        (None, Some(true)) // half-labeled row must not count
    val df = rows.toDF("a", "b")
    val got = Quality.agreementKappa(df, "a", "b").collect().head
    assert(got.getLong(0) == 50L && got.getLong(1) == 35L)
    assert(got.getDouble(2) == 0.7 && got.getDouble(3) == 0.5)
    assert(got.getDouble(4) == 0.4)
  }

  test("shrunkSourceQuality: small samples shrink hard, large ones barely move") {
    // big: 90/100 good, tiny: 3/3, junk: 10/100 -> mu = 103/203 ≈ 0.51
    val rows = Seq.fill(90)(("big", true)) ++ Seq.fill(10)(("big", false)) ++
      Seq.fill(3)(("tiny", true)) ++
      Seq.fill(10)(("junk", true)) ++ Seq.fill(90)(("junk", false)) :+
      ((null: String, true))
    val df = rows.toDF("source", "good")
    val got = Quality.shrunkSourceQuality(df, "source", col("good"),
        priorStrength = 20.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mu = 103.0 / 203.0
    assert(got("big") == ((100L, 90L, 0.9, r6((20.0 * mu + 90) / 120.0))))
    assert(got("tiny") == ((3L, 3L, 1.0, r6((20.0 * mu + 3) / 23.0))))
    assert(got("junk")._4 > got("junk")._3, "junk shrinks UP toward mu")
    // the POINT: tiny's raw 100% (highest raw rate) must rank BELOW
    // big's 90% once both shrink — 3 observations cannot beat 100
    assert(got("tiny")._3 > got("big")._3 && got("tiny")._4 < got("big")._4)
    assert(!got.contains(null), "null sources excluded")
    intercept[IllegalArgumentException] {
      Quality.shrunkSourceQuality(df, "source", col("good"), priorStrength = 0.0)
    }
  }

  test("quantileNormalize: rank positions per group, cross-group comparability, tie order by id") {
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.1), (3L, "a", 0.5),
      (4L, "b", 100.0), (5L, "b", 200.0),          // wildly different scale
      (6L, "a", 0.5)                                // tie with doc 3
    ).toDF("doc_id", "src", "score")
    val got = Quality.quantileNormalize(df, "src", "score", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // group a (n=4): ranks 2=1, 3=2, 6=3 (tie -> id), 1=4 over n+1=5
    assert(got(2L) == 0.2 && got(3L) == 0.4 && got(6L) == 0.6 && got(1L) == 0.8)
    // group b (n=2): the raw-scale gap vanishes — positions only
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(4L) == r6(1.0 / 3) && got(5L) == r6(2.0 / 3))
    // the comparability claim: "top score of its source" is the same
    // predicate in both groups despite scales 0.9 vs 200
    assert(got(1L) == got.filterKeys(Set(1L, 2L, 3L, 6L)).values.max)
    assert(got(5L) == got.filterKeys(Set(4L, 5L)).values.max)
  }

  test("agreementKappa: perfect agreement, chance-level labels, degenerate pe=1") {
    val perfect = Seq((1, 1), (2, 2), (3, 3), (1, 1)).toDF("a", "b")
    assert(Quality.agreementKappa(perfect, "a", "b")
      .collect().head.getDouble(4) == 1.0)
    // independent coin flips at 50/50: po == pe -> kappa 0
    val chance = Seq((true, true), (true, false), (false, true),
      (false, false)).toDF("a", "b")
    assert(Quality.agreementKappa(chance, "a", "b")
      .collect().head.getDouble(4) == 0.0)
    // both sides constant and equal: pe = 1, kappa undefined -> null
    val const = Seq((1, 1), (1, 1)).toDF("a", "b")
    assert(Quality.agreementKappa(const, "a", "b").collect().head.isNullAt(4))
  }

  test("krippendorffAlpha: hand values, missing tolerance, degenerate null") {
    import TestSpark.spark
    import spark.implicits._
    // 2 raters, 3 units: (a,a) (b,b) (a,b)
    // d_o = 2, d_e = 36 − 18 = 18, α = 1 − 5·2/18 = 0.444444
    val two = Seq((1L, "a", "a"), (2L, "b", "b"), (3L, "a", "b"))
      .toDF("u", "r1", "r2")
    val g = Quality.krippendorffAlpha(two, "u", Seq("r1", "r2")).head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((6L, 3L, 2L, 18L)))
    assert(g.getDouble(4) == 0.444444)
    // perfect agreement -> 1.0 (two categories so d_e > 0)
    val perfect = Seq((1L, "a", "a"), (2L, "b", "b")).toDF("u", "r1", "r2")
    assert(Quality.krippendorffAlpha(perfect, "u", Seq("r1", "r2"))
      .head.getDouble(4) == 1.0)
    // a third rater who abstains everywhere changes nothing except L;
    // a unit with ONE rating drops entirely
    val miss = Seq(
      (1L, Some("a"), Some("a"), Option.empty[String]),
      (2L, Some("b"), Some("b"), None),
      (3L, Some("a"), Some("b"), None),
      (4L, Some("a"), None, None)) // single rating: no information
      .toDF("u", "r1", "r2", "r3")
    val m = Quality.krippendorffAlpha(miss, "u", Seq("r1", "r2", "r3")).head
    assert(m.getLong(1) == 3L && m.getDouble(4) == 0.444444)
    // all ratings one category: d_e = 0 -> α undefined -> null
    val const = Seq((1L, "a", "a"), (2L, "a", "a")).toDF("u", "r1", "r2")
    assert(Quality.krippendorffAlpha(const, "u", Seq("r1", "r2"))
      .head.isNullAt(4))
    intercept[IllegalArgumentException] {
      Quality.krippendorffAlpha(two, "u", Seq("r1"))
    }
  }
}
