package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftFunctions, PiiKernels}

class PiiSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def stats(s: String): Seq[Long] =
    PiiKernels.piiStats(UTF8String.fromString(s)) match {
      case a => (0 until 4).map(a.getLong)
    }

  private def scrub(s: String): String =
    PiiKernels.piiScrub(UTF8String.fromString(s)).toString

  test("luhn checksum: public test vectors") {
    assert(PiiKernels.luhnValid("4532015112830366"))
    assert(PiiKernels.luhnValid("4111111111111111"))
    assert(PiiKernels.luhnValid("5500005555555559"))
    assert(PiiKernels.luhnValid("378282246310005")) // 15-digit Amex shape
    assert(!PiiKernels.luhnValid("4532015112830367"))
    assert(!PiiKernels.luhnValid("4111111111111112"))
  }

  test("emails: shape, truncation, boundaries") {
    assert(stats("mail me at jo.doe+spam@sub.example.co.uk today") ==
      Seq(1L, 0L, 0L, 0L))
    // trailing junk after the TLD is not part of the address
    assert(scrub("x a@b.com. y") == "x <EMAIL>. y")
    // digits inside a matched email are never phone candidates
    assert(stats("user1234567@example.com") == Seq(1L, 0L, 0L, 0L))
    // no TLD, no match
    assert(stats("not an email: a@b, a@, @b.com") == Seq(0L, 0L, 0L, 0L))
    // '@' with a 1-letter TLD shape fails the >=2-letter rule
    assert(stats("a@b.c") == Seq(0L, 0L, 0L, 0L))
    // truncation that lands mid-run fails the trailing boundary rule:
    // 'a@b.com' inside 'a@b.com2x' is a partial email, not a match
    assert(stats("a@b.com2x") == Seq(0L, 0L, 0L, 0L))
    assert(scrub("write a@b.com2x soon") == "write a@b.com2x soon")
    // but a non-alnum char after the truncated span is a real boundary
    assert(scrub("a@b.com-x") == "<EMAIL>-x")
  }

  test("phones: structure required, bare digit runs excluded") {
    assert(stats("call +1 555 123 4567 now") == Seq(0L, 1L, 0L, 0L))
    assert(stats("call (555) 123-4567 now") == Seq(0L, 1L, 0L, 0L))
    assert(stats("call 555-123-4567 now") == Seq(0L, 1L, 0L, 0L))
    assert(stats("call 555.123.4567 now") == Seq(0L, 1L, 0L, 0L))
    assert(stats("+442071838750") == Seq(0L, 1L, 0L, 0L)) // + alone is structure
    // bare 10-digit run: no structural signal, not a phone
    assert(stats("order 5551234567 shipped") == Seq(0L, 0L, 0L, 0L))
    // decimals stay untouched: dot-separated needs >=3 groups
    assert(stats("pi is 3.14159265 ok") == Seq(0L, 0L, 0L, 0L))
    // too few digits
    assert(stats("room 12-34-5 x") == Seq(0L, 0L, 0L, 0L))
    // adjacent alnum breaks the boundary
    assert(stats("id:x555-123-4567") == Seq(0L, 0L, 0L, 0L))
  }

  test("ipv4: four dotted octets <= 255") {
    assert(stats("host 192.168.0.1 up") == Seq(0L, 0L, 1L, 0L))
    assert(stats("host 10.0.0.255 up") == Seq(0L, 0L, 1L, 0L))
    // octet out of range: falls through (here: dotted 4-group phone FP
    // territory, but only 9 digits w/ 3 dot seps -> phone needs >=3
    // groups which holds, digits 10 in range -> classified phone)
    assert(stats("v 10.20.30.4567 x")(2) == 0L)
    // version strings: 3 groups but < 7 digits
    assert(stats("spark 3.5.1 rocks") == Seq(0L, 0L, 0L, 0L))
  }

  test("cards: Luhn-gated 13-19 digit runs, space/dash grouping") {
    assert(stats("pay 4532015112830366 now") == Seq(0L, 0L, 0L, 1L))
    assert(stats("pay 4532 0151 1283 0366 now") == Seq(0L, 0L, 0L, 1L))
    assert(stats("pay 4532-0151-1283-0366 now") == Seq(0L, 0L, 0L, 1L))
    // Luhn-invalid: not a card, and >15 digits is not a phone either
    assert(stats("ref 4532015112830367 x") == Seq(0L, 0L, 0L, 0L))
    // Luhn-valid 16-digit with '+' prefix is a phone-shaped span, not
    // a card (cards never carry '+') — 16 digits > 15 exceeds phone too
    assert(stats("n +4532015112830366 x") == Seq(0L, 0L, 0L, 0L))
  }

  test("scrub: typed tokens, mixed document, idempotence") {
    val doc = "Write jo@ex.com or call (555) 123-4567; server 10.0.0.1, " +
      "card 4111 1111 1111 1111."
    val expect = "Write <EMAIL> or call <PHONE>; server <IP>, card <CARD>."
    assert(scrub(doc) == expect)
    assert(scrub(expect) == expect) // idempotent: tokens contain no PII
    assert(scrub("no pii here at all") == "no pii here at all")
  }

  test("kernel parity: column API == object methods, null propagates") {
    val df = Seq(
      (1L, "a@b.com and +1 555 123 4567"),
      (2L, null.asInstanceOf[String]),
      (3L, "4111111111111111 at 8.8.8.8")).toDF("id", "text")
    val got = df.select(col("id"),
        GraftFunctions.piiStats(spark, col("text")).as("s"),
        GraftFunctions.piiScrub(spark, col("text")).as("t"))
      .orderBy("id").collect()
    assert(got(0).getSeq[Long](1) == Seq(1L, 1L, 0L, 0L))
    assert(got(0).getString(2) == "<EMAIL> and <PHONE>")
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(got(2).getSeq[Long](1) == Seq(0L, 0L, 1L, 1L))
    assert(got(2).getString(2) == "<CARD> at <IP>")
  }

  test("sql registration: callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_pii_scrub('mail a@b.org now') AS t").head.getString(0)
    assert(r == "mail <EMAIL> now")
  }

  test("anonymityReport: hand-computed k and l violations") {
    // combos: (A,x): 12 rows / 4 sensitive values — fine;
    //         (A,y): 3 rows — k violation (rows at risk);
    //         (B,x): 10 rows / 1 sensitive value — l violation only
    val rows =
      (1 to 12).map(i => ("A", "x", i % 4)) ++
        (1 to 3).map(i => ("A", "y", i)) ++
        (1 to 10).map(_ => ("B", "x", 7))
    val df = rows.toDF("q1", "q2", "s")
    val r = graft.ops.Privacy.anonymityReport(df, Seq("q1", "q2"), "s",
      k = 10, l = 3).head
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_small_groups") == 1L)
    assert(r.getAs[Long]("n_rows_at_risk") == 3L)
    assert(r.getAs[Long]("min_group") == 3L)
    assert(r.getAs[Long]("n_low_diversity") == 1L)
    // a fully-anonymous release gates clean
    val clean = graft.ops.Privacy.anonymityReport(
      (1 to 40).map(i => ("A", "x", i % 5)).toDF("q1", "q2", "s"),
      Seq("q1", "q2"), "s", k = 10, l = 3).head
    assert(clean.getAs[Long]("n_small_groups") == 0L)
    assert(clean.getAs[Long]("n_rows_at_risk") == 0L)
    assert(clean.getAs[Long]("n_low_diversity") == 0L)
  }

  test("tCloseness: hand EMD over the ordered metric, densified grid") {
    // global: v1:3 v2:3 v3:2 (N=8, m=3)
    // A=[1,1]: cum numerators 10, 4, 0  -> EMD 14/(2*8*2) = 0.4375
    // B=[2,2]: cum numerators -6, 4, 0  -> EMD 10/32      = 0.3125
    // C=[1,2,3,3]: cum -4, -8, 0        -> EMD 12/64      = 0.1875
    val rows = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2),
      ("C", 1), ("C", 2), ("C", 3), ("C", 3))
    val df = rows.toDF("q", "s")
    val got = graft.ops.Privacy.tClosenessGroups(df, Seq("q"), "s")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == Map("A" -> ((2L, 0.4375)), "B" -> ((2L, 0.3125)),
      "C" -> ((4L, 0.1875))))
    // partitioning-invariant (integer core; one final division)
    val got7 = graft.ops.Privacy.tClosenessGroups(df.repartition(7), Seq("q"), "s")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got7 == got)
    // constant sensitive attribute: every group matches global, EMD 0
    val const = graft.ops.Privacy.tClosenessGroups(
      Seq(("A", 5), ("B", 5)).toDF("q", "s"), Seq("q"), "s")
      .collect().map(_.getDouble(2))
    assert(const.toSeq == Seq(0.0, 0.0))
  }

  test("tClosenessReport: violations among k-anonymous groups only") {
    val rows = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2),
      ("C", 1), ("C", 2), ("C", 3), ("C", 3), ("D", 3))
    // D has n=1 < k: its (large) EMD must NOT count as a violation
    val r = graft.ops.Privacy.tClosenessReport(
      rows.toDF("q", "s"), Seq("q"), "s", k = 2, t = 0.3).head()
    assert(r.getAs[Long]("n_groups") == 4L)
    assert(r.getAs[Long]("n_tclose_violations") == 2L) // A and B
    val mx = r.getAs[Double]("max_emd_anonymous")
    assert(mx > 0.3 && mx < 1.0)
    assert(r.getAs[Long]("sum_emd_micro") > 0L)
    intercept[IllegalArgumentException] {
      graft.ops.Privacy.tClosenessReport(rows.toDF("q", "s"), Seq("q"), "s",
        k = 2, t = 1.5)
    }
  }

  test("dpNoisyCounts: seeded Laplace — reproducible, bounded, ε-scaled") {
    import TestSpark.spark
    import spark.implicits._
    val df = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c"))
      .toDF("g")
    def run(eps: Double, salt: String) =
      graft.ops.Privacy.dpNoisyCounts(df, "g", eps, salt)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r1 = run(1.0, "s1")
    // same (salt, group) -> the SAME draw, run over run
    assert(run(1.0, "s1") == r1)
    // a fresh release epoch re-draws (md5 of a different preimage)
    assert(run(1.0, "s2") != r1)
    // noise is bounded by the hash granularity: |noise| <= 60·ln2/ε
    val truth = Map("a" -> 40.0, "b" -> 25.0, "c" -> 9.0)
    truth.foreach { case (g, n) =>
      assert(math.abs(r1(g) - n) <= 60 * math.log(2) + 1e-6) }
    // at least one group actually moved (u = exactly 0.5 is measure-0)
    assert(truth.exists { case (g, n) => math.abs(r1(g) - n) > 1e-6 })
    // ε = 2 halves the SAME draw's magnitude (identical u, b = 1/ε)
    val r2 = run(2.0, "s1")
    truth.foreach { case (g, n) =>
      assert(math.abs((r1(g) - n) - 2.0 * (r2(g) - n)) < 2e-6) }
    intercept[IllegalArgumentException] {
      graft.ops.Privacy.dpNoisyCounts(df, "g", 0.0, "s1")
    }
  }
}
