package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Search
import graft.streaming.SearchIngest

class SearchIngestSpec extends AnyFunSuite {
  import TestSpark.spark

  private val schema = graft.schema.Metadata.structFromSpec(
    """
    doc_id: long
    text: string
    """)

  private def land(dir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(dir, name))
    try rows.foreach { case (id, text) =>
      w.println(s"""{"doc_id": $id, "text": "$text"}""")
    } finally w.close()
  }

  test("maintainIndex: bootstrap, re-crawl replacement, merge-on-read") {
    val base = TestSpark.tmpDir("search_ingest")
    val landing = new java.io.File(base, "landing"); landing.mkdirs()
    def drain() = SearchIngest.maintainIndex(
      spark, landing.getPath, schema, "doc_id", "text",
      silverDir = s"$base/silver", checkpointDir = s"$base/ckpt",
      indexDir = s"$base/index", buckets = 4)
    assert(drain() == 0L, "empty landing zone is a clean no-op")

    land(landing.getPath, "wave1.jsonl",
      Seq(1L -> "red fox jumps", 2L -> "blue fox sleeps"))
    assert(drain() == 2L)
    val idx1 = SearchIngest.readIndex(spark, s"$base/index")
    assert(Search.phraseSearch(idx1, Seq("red", "fox"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))

    // wave 2: doc 2 re-crawled with CHANGED text (now matches the
    // phrase), doc 1 re-delivered unchanged (must cost nothing),
    // doc 3 new
    land(landing.getPath, "wave2.jsonl",
      Seq(1L -> "red fox jumps", 2L -> "red fox returns",
        3L -> "green owl"))
    assert(drain() == 2L, "unchanged re-delivery is not re-indexed")
    val idx2 = SearchIngest.readIndex(spark, s"$base/index")
    assert(Search.phraseSearch(idx2, Seq("red", "fox"))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // stale postings of doc 2's generation 0 are invisible: its old
    // token 'sleeps' resolves to nothing live
    assert(idx2.filter(org.apache.spark.sql.functions.col("token") ===
      "sleeps").count() == 0L)
    // the live index equals a fresh rebuild over current text
    import spark.implicits._
    val current = Seq((1L, "red fox jumps"), (2L, "red fox returns"),
      (3L, "green owl")).toDF("doc_id", "text")
    val rebuilt = Search.invertedIndex(current, "text", "doc_id")
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("doc_id"), r.getAs[Seq[Int]]("positions"))).toSet
    assert(dump(idx2.select("token", "doc_id", "positions")) ==
      dump(rebuilt.select("token", "doc_id", "positions")))

    // an orphan generation (postings committed, ledger crash before
    // update) is invisible to the reader
    Seq((99L, "zombie", Seq(0), 1L, 0L, 99))
      .toDF("doc_id", "token", "positions", "tf", "tbucket", "gen")
      .write.mode("append").partitionBy("gen", "tbucket")
      .parquet(s"$base/index/postings")
    val idx3 = SearchIngest.readIndex(spark, s"$base/index")
    assert(idx3.filter(org.apache.spark.sql.functions.col("doc_id") === 99L)
      .count() == 0L, "orphan generations never surface")

    // compaction: folds live postings into one generation, prunes the
    // rest (incl. the orphan), answers unchanged
    val before = dump(idx3.select("token", "doc_id", "positions"))
    val pruned = SearchIngest.compactIndex(spark, s"$base/index")
    assert(pruned >= 2, s"dead generations must be pruned, got $pruned")
    val idx4 = SearchIngest.readIndex(spark, s"$base/index")
    assert(dump(idx4.select("token", "doc_id", "positions")) == before,
      "compaction must not change the live index")
    val genDirs = new java.io.File(s"$base/index/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
    assert(genDirs.length == 1, "exactly one live generation remains")
    // a drain after compaction continues the generation sequence
    land(landing.getPath, "wave3.jsonl", Seq(4L -> "red fox again"))
    assert(drain() == 1L)
    assert(Search.phraseSearch(SearchIngest.readIndex(spark, s"$base/index"),
      Seq("red", "fox")).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 4L))
  }
}
