package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.WindowIndex
import graft.ops.Dedup

class WindowIndexSpec extends AnyFunSuite {
  import TestSpark.spark

  import spark.implicits._

  private val docs = TestSpark.table("documents")
  private def corpus = docs.filter($"doc_id" % 10 =!= 0)
  private def batch = docs.filter($"doc_id" % 10 === 0)

  private def spanSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "span_start", "span_end", "n_windows")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("build → meta round-trips the index identity") {
    val dir = TestSpark.tmpDir("winidx_meta")
    WindowIndex.build(corpus, "text", "doc_id", dir, n = 4, kind = Dedup.Xx64)
    assert(WindowIndex.meta(spark, dir) == WindowIndex.Meta("doc_id", 4, Dedup.Xx64))
    val err = intercept[IllegalArgumentException] {
      WindowIndex.meta(spark, TestSpark.tmpDir("winidx_empty"))
    }
    assert(err.getMessage.contains("no window index"))
  }

  test("probe == full-corpus duplicateSpans restricted to the batch docs") {
    // THE incremental contract: dup-ness judged against index ∪ batch
    // equals dup-ness judged against the whole corpus, because the
    // index's per-hash counts cover corpus ∖ batch exactly
    val dir = TestSpark.tmpDir("winidx_probe")
    WindowIndex.build(corpus, "text", "doc_id", dir, n = 3)
    val incremental = spanSet(WindowIndex.probe(batch, "text", dir))
    val full = spanSet(
      Dedup.duplicateSpans(docs, "text", "doc_id", n = 3)
        .filter($"doc_id" % 10 === 0))
    assert(incremental == full)
    assert(incremental.nonEmpty, "fixture must exercise cross-batch duplication")
  }

  test("probe finds batch-internal dups even when the index has no hits") {
    val dir = TestSpark.tmpDir("winidx_internal")
    WindowIndex.build(
      Seq((100L, "totally unrelated standing corpus content here")).toDF("doc_id", "text"),
      "text", "doc_id", dir, n = 3)
    val b = Seq(
      (1L, "a b shared run c d"),
      (2L, "e f shared run c g")).toDF("doc_id", "text")
    // "shared run c" occurs in both batch docs — a dup the index never saw
    val spans = spanSet(WindowIndex.probe(b, "text", dir))
    assert(spans == Set((1L, 3L, 6L, 1L), (2L, 3L, 6L, 1L)))
  }

  test("ingestBatch appends: the NEXT batch sees this batch's windows") {
    val dir = TestSpark.tmpDir("winidx_ingest")
    WindowIndex.build(
      Seq((100L, "standing corpus with no boilerplate at all")).toDF("doc_id", "text"),
      "text", "doc_id", dir, n = 3)
    val dayA = Seq((1L, "x y boiler plate text z")).toDF("doc_id", "text")
    val dayB = Seq((2L, "p q boiler plate text r")).toDF("doc_id", "text")
    // day A: nothing duplicated yet (corpus has no overlap with A)
    assert(spanSet(WindowIndex.ingestBatch(dayA, "text", dir)).isEmpty)
    // day B: the shared "boiler plate text" must be found — which only
    // happens if day A's counts were appended (append visibility)
    assert(spanSet(WindowIndex.ingestBatch(dayB, "text", dir)) ==
      Set((2L, 3L, 6L, 1L)))
  }

  test("compact preserves probe results and collapses accreted rows") {
    val dir = TestSpark.tmpDir("winidx_compact")
    WindowIndex.build(corpus, "text", "doc_id", dir, n = 3)
    // accrete: append two more slices so some hashes carry >1 row
    WindowIndex.append(batch.limit(10), "text", dir)
    WindowIndex.append(batch.limit(10), "text", dir)
    val before = WindowIndex.counts(spark, dir)
      .groupBy("hh").agg(sum("cnt").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    WindowIndex.compact(spark, dir, numFiles = 2)
    val after = WindowIndex.counts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before, "compaction must not change per-hash totals")
    // one row per hash after compaction
    assert(WindowIndex.counts(spark, dir).groupBy("hh").count()
      .filter($"count" > 1).count() == 0)
  }

  test("compactIfFragmented is a no-op until appends accrete") {
    val dir = TestSpark.tmpDir("winidx_frag")
    WindowIndex.build(corpus.limit(20), "text", "doc_id", dir, n = 3)
    val nBuild = spark.read.parquet(s"$dir/counts").inputFiles.length
    assert(!WindowIndex.compactIfFragmented(spark, dir, targetFiles = nBuild))
    (1 to 2 * nBuild + 1).foreach { _ =>
      WindowIndex.append(batch.limit(3), "text", dir)
    }
    assert(WindowIndex.compactIfFragmented(spark, dir, targetFiles = nBuild))
    assert(spark.read.parquet(s"$dir/counts").inputFiles.length <= nBuild)
  }
}
