package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableSql
import graft.functions.PortableSql.{SparkDialect => SD}
import graft.ops.TextOps

class TextOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs = TestSpark.table("documents").limit(200)

  test("tokenCount counts single-space tokens") {
    val df = Seq("one two three", "solo", "").toDF("text")
    assert(df.select(TextOps.tokenCount(col("text"))).as[Int].collect().toSeq ==
      Seq(3, 1, 1)) // split("", " ") = [""]
  }

  test("regexTokenCount: alpha runs, digit runs, single punctuation") {
    val df = Seq("abc 123 x!y", "hello, world.").toDF("text")
    assert(df.select(TextOps.regexTokenCount(col("text"))).as[Int].collect().toSeq ==
      Seq(5, 4)) // abc|123|x|!|y ; hello|,|world|.
  }

  test("langId: obvious markers win; empty score → und") {
    val df = Seq(
      "the cat and the dog with a hat",
      "el gato y los perros con sombrero",
      "der hund und die katze mit hut",
      "xyzzy plugh").toDF("text")
    assert(df.select(TextOps.langId(col("text"))).as[String].collect().toSeq ==
      Seq("en", "es", "de", "und"))
  }

  test("qualityScore stays in [0,1]") {
    val scores = docs.select(TextOps.qualityScore(col("text"))).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("fingerprint is casefold-and-trim invariant") {
    val df = Seq(("  Hello World ", "hello world")).toDF("a", "b")
    val r = df.select(
      TextOps.fingerprint(col("a")).as("fa"),
      TextOps.fingerprint(col("b")).as("fb")).collect()(0)
    assert(r.getString(0) == r.getString(1))
  }

  test("wordShingles: overlapping n-grams; short docs yield one shingle") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TextOps.wordShingles(col("text"), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
  }

  // Parity specs: the Column implementations and the PortableSql string
  // fragments (used by the oracle-checked queries) must never diverge.
  test("parity: tokenCount Column == PortableSql fragment") {
    val d = docs.selectExpr("doc_id", s"${PortableSql.tokenCount("text", SD)} AS a")
      .join(docs.select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("parity: langId Column == PortableSql fragment") {
    val d = docs.selectExpr("doc_id", s"${PortableSql.langId("text")} AS a")
      .join(docs.select(col("doc_id"), TextOps.langId(col("text")).as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("parity: qualityScore Column == PortableSql fragment") {
    val d = docs.selectExpr("doc_id", s"${PortableSql.qualityScore("text", SD)} AS a")
      .join(docs.select(col("doc_id"), TextOps.qualityScore(col("text")).as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("parity: fingerprint Column == PortableSql fragment") {
    val d = docs.selectExpr("doc_id", s"${PortableSql.fingerprint("text")} AS a")
      .join(docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("parity: wordShingles == PortableSql shingles fragment") {
    val frag = SD.shingles(SD.tokens("text"), 3)
    val d = docs.selectExpr("doc_id", s"$frag AS a")
      .join(docs.select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("duplicateShingleRatio: known values, 0 for unique text, high for loops") {
    val df = Seq(
      (1L, "a b c a b c"), // 4 shingles, 3 distinct -> 0.25
      (2L, "w x y z"), // all distinct -> 0.0
      (3L, "spam spam spam spam spam spam") // 4 shingles, 1 distinct -> 0.75
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextOps.duplicateShingleRatio(col("text"), 3).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.25 && out(2L) == 0.0 && out(3L) == 0.75)
  }

  test("scrub removes emails and urls, counts report the matches") {
    val df = Seq(
      (1L, "reach bob.smith+x@sub.example.co or https://a.example/p?q=1&r=2 today"),
      (2L, "no pii here at all"),
      (3L, "https://one.example/x then two@ex.io and three.four@ex.org end")
    ).toDF("doc_id", "text")
    val out = df.select(
      col("doc_id"),
      TextOps.scrub(col("text")).as("clean"),
      TextOps.matchCount(col("text"), TextOps.emailPattern).as("ne"),
      TextOps.matchCount(col("text"), TextOps.urlPattern).as("nu"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L)._1 == "reach <scrubbed> or <scrubbed> today")
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(2L) == (("no pii here at all", 0L, 0L)))
    assert(out(3L)._1 == "<scrubbed> then <scrubbed> and <scrubbed> end")
    assert(out(3L)._2 == 2 && out(3L)._3 == 1)
  }

  test("scrub stops URL matches at any whitespace, not just spaces") {
    val df = Seq((1L, "see https://a.example\nNext line intact\tand https://b.example/x\tkept"))
      .toDF("doc_id", "text")
    val clean = df.select(TextOps.scrub(col("text"))).collect()(0).getString(0)
    // newline/tab and the words after them must survive the scrub
    assert(clean == "see <scrubbed>\nNext line intact\tand <scrubbed>\tkept")
  }
}
