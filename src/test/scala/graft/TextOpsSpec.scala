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
}
