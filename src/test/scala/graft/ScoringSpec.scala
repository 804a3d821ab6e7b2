package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scoring

/** Top-level (serializable-closure-safe) tracking instrumentation:
  * counts scorer inits and batch sizes — JVM-local statics are
  * task-visible under local[]. */
object ScoringSpecTracking {
  val inits = new AtomicInteger(0)
  val batches = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  class TrackingScorer extends Scoring.DocScorer {
    inits.incrementAndGet()
    def scoreBatch(texts: Array[String]): Array[Double] = {
      batches.add(texts.length)
      texts.map(_ => 0.5)
    }
  }
  class BrokenScorer extends Scoring.DocScorer {
    def scoreBatch(texts: Array[String]): Array[Double] = Array(1.0)
  }
}

class ScoringSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs = TestSpark.table("documents").select("doc_id", "text")

  test("scoreDocs: one row per doc, stub scores match the closed form") {
    val out = Scoring.scoreDocs(docs, "doc_id", "text",
      () => new Scoring.StubScorer).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val src = docs.as[(Long, String)].collect()
    assert(out.size == src.length)
    src.foreach { case (id, text) =>
      val h = (text.length.toLong * 2654435761L) % 1000003L
      assert(out(id) == h.toDouble / 1000003.0, s"doc $id")
    }
  }

  test("batching contract: one scorer init per non-empty partition, batches capped") {
    ScoringSpecTracking.inits.set(0)
    ScoringSpecTracking.batches.clear()
    val df = docs.limit(300).repartition(4)
    Scoring.scoreDocs(df, "doc_id", "text",
      () => new ScoringSpecTracking.TrackingScorer, batchSize = 32)
      .foreach(_ => ()) // force execution
    import scala.jdk.CollectionConverters._
    val sizes = ScoringSpecTracking.batches.asScala.map(_.toInt).toSeq
    assert(ScoringSpecTracking.inits.get() <= 4, "at most one init per partition")
    assert(sizes.sum == 300)
    assert(sizes.forall(_ <= 32), s"micro-batches must respect batchSize, got $sizes")
    assert(sizes.exists(_ == 32), "full batches where the partition allows")
  }

  test("null text scores null; the scorer never sees nulls") {
    val df = Seq(
      (1L, "real text"),
      (2L, null: String),
      (3L, "more text")).toDF("doc_id", "text")
    val out = Scoring.scoreDocs(df, "doc_id", "text",
      () => new Scoring.StubScorer, batchSize = 2).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(2L) == None, "null text -> null score, not an NPE")
    assert(out(1L).isDefined && out(3L).isDefined)
  }

  test("an all-null micro-batch never calls the scorer with an empty array") {
    // batchSize 2 and 4 leading nulls -> two batches that are entirely
    // null; a model backend asserting non-empty input must not be hit
    val df = Seq[(Long, String)](
      (1L, null), (2L, null), (3L, null), (4L, null), (5L, "text"))
      .toDF("doc_id", "text").coalesce(1)
    ScoringSpecTracking.inits.set(0)
    ScoringSpecTracking.batches.clear()
    val out = Scoring.scoreDocs(df, "doc_id", "text",
      () => new ScoringSpecTracking.TrackingScorer, batchSize = 2).collect()
    assert(out.length == 5)
    import scala.jdk.CollectionConverters._
    val sizes = ScoringSpecTracking.batches.asScala.map(_.toInt).toSeq
    assert(sizes.forall(_ > 0), s"scorer saw an empty batch: $sizes")
    assert(sizes.sum == 1, "only the single non-null text is ever scored")
  }

  test("a scorer returning the wrong batch size fails loudly") {
    val e = intercept[org.apache.spark.SparkException] {
      Scoring.scoreDocs(docs.limit(10), "doc_id", "text",
        () => new ScoringSpecTracking.BrokenScorer, 8).collect()
    }
    assert(e.getMessage.contains("scorer returned") ||
      Option(e.getCause).exists(_.getMessage.contains("scorer returned")))
  }

  test("fingerprintFast: equal iff md5 fingerprint equal on real docs") {
    val d = docs.select(
      graft.ops.TextOps.fingerprint(col("text")).as("fp"),
      graft.ops.TextOps.fingerprintFast(col("text")).as("fpx"))
    val groups = d.groupBy("fp").agg(countDistinct("fpx").as("n")).collect()
    assert(groups.forall(_.getLong(1) == 1), "same md5 group -> same xx64 value")
    val rev = d.groupBy("fpx").agg(countDistinct("fp").as("n")).collect()
    assert(rev.forall(_.getLong(1) == 1), "no xx64 collisions across md5 groups here")
  }

  test("woeBinning: hand shares, monotone evidence, tie-safe boundary") {
    import TestSpark.spark
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // scores 1..8: lows mostly bad, highs mostly good; 2 bins of 4
    val df = Seq(
      (1.0, false), (2.0, false), (3.0, false), (4.0, true),
      (5.0, true), (6.0, true), (7.0, true), (8.0, false))
      .toDF("s", "g")
    val got = graft.ops.Scoring.woeBinning(df, "s", "g", bins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    // bin 0: 1 good / 3 bad; bin 1: 3 good / 1 bad; G = B = 4, k = 2
    def woe(good: Long, bad: Long) =
      math.log(((good + 0.5) / 5.0) / ((bad + 0.5) / 5.0))
    assert(got(0) == ((0L, 1L, 3L, r6(woe(1, 3)),
      r6((1.5 / 5 - 3.5 / 5) * woe(1, 3)))))
    assert(got(1) == ((1L, 3L, 1L, r6(woe(3, 1)),
      r6((3.5 / 5 - 1.5 / 5) * woe(3, 1)))))
    assert(got(0)._4 < 0 && got(1)._4 > 0, "evidence signs")
    // equal scores at a boundary: label tie-break keeps counts stable
    val ties = Seq((1.0, false), (1.0, true), (1.0, false), (1.0, true))
      .toDF("s", "g")
    val t = graft.ops.Scoring.woeBinning(ties, "s", "g", bins = 2)
      .orderBy("bin").collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(t.toSeq == Seq((0L, 2L), (2L, 0L)), "false ranks before true")
    intercept[IllegalArgumentException] {
      graft.ops.Scoring.woeBinning(df, "s", "g", bins = 1)
    }
  }

  test("conformalReport: rank arithmetic, order-statistic threshold, α fence") {
    import TestSpark.spark
    import spark.implicits._
    // n = 9, α = 0.2: rank = ⌈10·0.8⌉ = 8 → threshold = 8th smallest
    val cal = (1 to 9).map(_.toDouble).toDF("s")
    val test9 = Seq(7.5, 8.0, 8.5, 100.0).toDF("s")
    val r = graft.ops.Scoring.conformalReport(cal, test9, "s", alpha = 0.2)
      .head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((9L, 8L, 8.0)))
    assert((r.getLong(3), r.getLong(4), r.getDouble(5)) == ((4L, 2L, 0.5)))
    // α smaller than the sample can certify: rank > n → null gate,
    // null coverage — fail-visible, not an accept-everything gate
    val tiny = graft.ops.Scoring.conformalReport(
      Seq(1.0, 2.0).toDF("s"), test9, "s", alpha = 0.1).head
    assert(tiny.getLong(1) == 3L && tiny.isNullAt(2) && tiny.isNullAt(5))
    intercept[IllegalArgumentException] {
      graft.ops.Scoring.conformalReport(cal, test9, "s", alpha = 0.0)
    }
  }
}
