package graft

import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Packing

class PackingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // token counts: doc1=3, doc2=4, doc3=2, doc5=1 (shard "s"; note the
  // whitespace tokenizer counts "" as ONE token — split('', ' ') = ['']
  // in Spark AND DuckDB, the q11-verified semantics), doc4=2 (shard "t")
  private def docs = Seq(
    (1L, "s", "one two three"),
    (2L, "s", "four five six seven"),
    (3L, "s", "eight nine"),
    (4L, "t", "ten eleven"),
    (5L, "s", "")).toDF("doc_id", "shard", "text")

  test("packSequences: boundary docs contribute to BOTH sequences, budget respected") {
    val out = Packing.packSequences(docs, "text", "shard", "doc_id", budget = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // shard s intervals: doc1 [0,3), doc2 [3,7), doc3 [7,9), doc5 [9,10);
    // budget 5 → seq0 = [0,5): doc1×3 + doc2×2; seq1 = [5,10): doc2×2 +
    // doc3×2 + doc5×1. shard t: doc4 [0,2) → seq0×2.
    assert(out == Set(
      (1L, "s", 0L, 3L),
      (2L, "s", 0L, 2L),
      (2L, "s", 1L, 2L),
      (3L, "s", 1L, 2L),
      (5L, "s", 1L, 1L),
      (4L, "t", 0L, 2L)))
  }

  test("packSequences: every sequence except a shard's last is exactly full") {
    val out = Packing.packSequences(
      TestSpark.table("documents"), "text", "lang", "doc_id", budget = 512L)
    val perSeq = out.groupBy("lang", "seq_idx")
      .agg(org.apache.spark.sql.functions.sum("toks_in_seq").as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(perSeq.nonEmpty)
    val lastPerShard = perSeq.keys.groupBy(_._1).map { case (l, ks) => l -> ks.map(_._2).max }
    perSeq.foreach { case ((lang, seq), toks) =>
      if (seq < lastPerShard(lang)) assert(toks == 512L, s"$lang seq $seq not full: $toks")
      else assert(toks <= 512L)
    }
  }

  test("tokenQuota: kept in order while the running total starts inside quota") {
    // shard s cumulative: doc1 ends 3, doc2 ends 7, doc3 ends 9
    val kept = Packing.tokenQuota(docs, "text", "shard", "doc_id", quota = 4L)
      .select("doc_id").as[Long].collect().toSet
    // doc2 starts at 3 < 4 → kept (boundary doc, truncated downstream);
    // doc3 starts at 7 → dropped; doc4 (shard t) starts at 0 → kept
    assert(kept == Set(1L, 2L, 4L))
  }

  test("packing is partitioning-invariant") {
    def run(parts: Int) = Packing.packSequences(
      TestSpark.table("documents").repartition(parts), "text", "lang", "doc_id", 512L)
      .collect().map(_.mkString("|")).toSeq.sorted
    assert(run(3) == run(17))
  }

  test("property: token conservation and seq fullness hold for random corpora") {
    import org.scalacheck.Gen
    val gen = for {
      nDocs <- Gen.choose(1, 40)
      budget <- Gen.choose(2L, 17L)
      toks <- Gen.listOfN(nDocs, Gen.choose(1, 25))
    } yield (budget, toks)
    // deterministic sample of generator space (fixed seed params)
    val cases = Gen.listOfN(15, gen).apply(
      org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(42L)).get
    cases.foreach { case (budget, toks) =>
      val rows = toks.zipWithIndex.map { case (n, i) =>
        (i.toLong, "s", Seq.fill(n)("w").mkString(" "))
      }
      val out = Packing.packSequences(
        rows.toDF("doc_id", "shard", "text"), "text", "shard", "doc_id", budget)
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      val total = toks.map(_.toLong).sum
      assert(out.map(_._2).sum == total, s"token conservation: budget=$budget toks=$toks")
      val perSeq = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val last = perSeq.keys.max
      perSeq.foreach { case (seq, t) =>
        if (seq < last) assert(t == budget, s"seq $seq not full: budget=$budget toks=$toks")
        else assert(t <= budget)
      }
      assert(perSeq.keySet == (0L to last).toSet, "no sequence gaps")
    }
  }

  test("exportShards: distributed prefix sum equals the single-window reference") {
    import org.apache.spark.sql.functions._
    val d = TestSpark.table("documents")
    val out = Packing.exportShards(d, "text", "doc_id", targetTokens = 2048L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // independent replay: collect (key, n), one global running sum
    val rows = d.select(
        col("doc_id"),
        md5(concat_ws(":", lit("shards"), col("doc_id").cast("string"))).as("k"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    var cum = 0L
    val expected = rows.map { case (id, _, n) =>
      val start = cum; cum += n
      (id, n, start, start / 2048L)
    }.toSet
    assert(out == expected)
  }

  test("exportShards: every shard except the last is token-balanced within one doc") {
    val out = Packing.exportShards(
      TestSpark.table("documents"), "text", "doc_id", targetTokens = 2048L)
      .collect().map(r => (r.getLong(1), r.getLong(3))) // (n_toks, shard)
    val maxDoc = out.map(_._1).max
    val perShard = out.groupBy(_._2).view.mapValues(_.map(_._1).sum).toMap
    val last = perShard.keys.max
    assert(perShard.size > 3, "fixture must produce several shards")
    perShard.foreach { case (shard, toks) =>
      if (shard < last)
        assert(toks > 2048L - maxDoc && toks < 2048L + maxDoc,
          s"shard $shard carries $toks tokens (target 2048, max doc $maxDoc)")
    }
    assert(perShard.keySet == (0L to last).toSet, "contiguous shard ids")
  }

  test("exportShards: deterministic, partitioning-invariant, seed-sensitive") {
    val d = TestSpark.table("documents").limit(200)
    def run(parts: Int, seed: String) =
      Packing.exportShards(d.repartition(parts), "text", "doc_id", 1024L, seed)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val a = run(3, "shards")
    assert(a == run(19, "shards"), "same seed → same global order everywhere")
    assert(a != run(3, "v2"), "a different seed reshuffles the order")
  }

  test("shardManifest: conserves docs/tokens, modal attr ties break lexicographically") {
    val docs = TestSpark.table("documents")
    val shards = Packing.exportShards(docs, "text", "doc_id", targetTokens = 2048L)
    val manifest = Packing.shardManifest(shards, docs, "doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // conservation: manifest totals equal the shard assignment's totals
    val assigned = shards.collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(manifest.map(_._2).sum == assigned.length)
    assert(manifest.map(_._3).sum == assigned.map(_._1).sum)
    assert(manifest.map(_._1).toSet == assigned.map(_._2).toSet)
    // crafted tie: two attrs with equal counts → lexicographically first
    import TestSpark.spark.implicits._
    val tied = Packing.shardManifest(
      Seq((1L, 5L, 0L, 0L), (2L, 5L, 5L, 0L)).toDF("doc_id", "n_toks", "tok_start", "shard_idx"),
      Seq((1L, "zeta"), (2L, "alpha")).toDF("doc_id", "source"),
      "doc_id", "source")
      .collect().map(r => r.getString(4))
    assert(tied.toSeq == Seq("alpha"))
  }

  test("packSequencesBy: whitespace counter reproduces packSequences; a custom counter changes the budget basis") {
    val docs = TestSpark.table("documents").limit(150)
    val ws = graft.functions.GraftFunctions
      .tokenCount(TestSpark.spark, col("text"))
    val a = Packing.packSequences(docs, "text", "lang", "doc_id", 256L)
      .collect().toSet
    val b = Packing.packSequencesBy(docs, ws, "lang", "doc_id", 256L)
      .collect().toSet
    assert(a == b)
    // a doubled counter halves how many docs fit a sequence: total
    // packed tokens double while conservation still holds per doc
    val doubled = Packing.packSequencesBy(docs, ws * 2, "lang", "doc_id", 256L)
      .groupBy("doc_id").agg(sum("toks_in_seq").as("t"))
    val direct = docs.select(col("doc_id"), (ws * 2).as("n"))
    val joined = doubled.join(direct, "doc_id")
      .filter(col("t") =!= col("n")).count()
    assert(joined == 0, "custom-counter packing must conserve the counter's tokens")
  }
}
