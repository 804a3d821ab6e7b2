package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SnapshotDiff, Search}

class SnapshotDiffSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "t", "v")
    val next = Seq((2L, "b", 20), (3L, "CHANGED", 30), (4L, "d", 40)).toDF("k", "t", "v")
    val got = SnapshotDiff.diff(base, next, "k", Seq("t", "v"))
      .select("key", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("diff hashes nulls distinctly from values and from each other") {
    val base = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("k", "t")
    val next = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "t")
    val got = SnapshotDiff.diff(base, next, "k", Seq("t"))
      .select("key", "status").as[(Long, String)].collect().toMap
    assert(got(1L) == "changed") // value -> null is a change
    assert(got(2L) == "unchanged") // null == null content
  }

  test("changedExact verifies suspects without hashes") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "t")
    val next = Seq((1L, "a"), (2L, "B")).toDF("k", "t")
    val suspects = Seq(1L, 2L).toDF("key")
    val got = SnapshotDiff.changedExact(base, next, "k", Seq("t"), suspects)
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true))
  }

  test("inverted index: postings carry sorted positions and tf") {
    val docs = Seq((1L, "a b a c a"), (2L, "b b")).toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs, "text", "doc_id")
    val a1 = idx.filter(col("token") === "a" && col("doc_id") === 1).head
    assert(a1.getSeq[Int](2) == Seq(0, 2, 4) && a1.getLong(3) == 3L)
    val b2 = idx.filter(col("token") === "b" && col("doc_id") === 2).head
    assert(b2.getSeq[Int](2) == Seq(0, 1) && b2.getLong(3) == 2L)
    assert(idx.count() == 4) // (a,1) (b,1) (c,1) (b,2)
  }

  test("phrase search: adjacency, multiplicity, repeated tokens") {
    val docs = Seq(
      (1L, "spark window merge"),
      (2L, "the spark window spark window x"),
      (3L, "window spark"),
      (4L, "spark spark spark")).toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs, "text", "doc_id").localCheckpoint()

    val m1 = Search.phraseSearch(idx, Seq("spark", "window"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(m1 == Seq((1L, 1L, 0), (2L, 2L, 1)))

    // repeated-token phrase: "spark spark" occurs at 0 and 1 in doc 4
    val m2 = Search.phraseSearch(idx, Seq("spark", "spark"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(m2 == Seq((4L, 2L, 0)))

    // single-token phrase degenerates to the posting list
    val m3 = Search.phraseSearch(idx, Seq("merge"))
      .as[(Long, Long, Int)].collect().toSeq
    assert(m3 == Seq((1L, 1L, 2)))

    // present tokens, absent adjacency: empty result
    assert(Search.phraseSearch(idx, Seq("merge", "spark")).count() == 0)
  }
}
