package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Sampling, Sketches, Stats}

/**
 * Partitioning-invariance: every operator that feeds an oracle check
 * must produce IDENTICAL results no matter how the input happens to be
 * partitioned — the classic scale-up hazard (a result that silently
 * depends on partition count works at sf0.1 and drifts on a
 * 1000-executor cluster, task retries, or AQE re-plans). Each case
 * runs the op on a 3-partition and a 23-partition copy of the same
 * input and requires exact row-set equality.
 */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs = TestSpark.table("documents")

  /** MULTISET comparison (sorted seq, not Set): a duplicate row emitted
    * under one partitioning but not the other is exactly the drift this
    * spec exists to catch, and a Set would collapse it. */
  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  private def invariant(name: String)(op: DataFrame => DataFrame): Unit = {
    val few = rows(op(docs.repartition(3)))
    val many = rows(op(docs.repartition(23)))
    assert(few == many, s"$name must not depend on partitioning")
    assert(few.nonEmpty, s"$name fixture must be non-trivial")
  }

  test("minhash signatures are partitioning-invariant") {
    invariant("minhashSignatures")(d =>
      Dedup.minhashSignatures(d, "text", "doc_id", 8, 3)
        .select(col("doc_id"), col("sig").cast("string")))
  }

  test("verified near-dup pairs are partitioning-invariant") {
    invariant("verifiedNearDups")(d =>
      Dedup.verifiedNearDups(d, "text", "doc_id", 0.8))
  }

  test("connected components are partitioning-invariant") {
    invariant("components") { d =>
      val pairs = Dedup.verifiedNearDups(d, "text", "doc_id", 0.8)
      Dedup.components(pairs.select("id_a", "id_b"))
    }
  }

  test("hash splits are partitioning-invariant") {
    invariant("hashSplit")(d =>
      Sampling.hashSplit(d.select("doc_id"), "doc_id", Seq(0.8, 0.1, 0.1), "s1").head)
  }

  test("KMV estimate is partitioning-invariant (merge order cannot move it)") {
    invariant("kmvDistinct")(d =>
      Sketches.kmvDistinct(d.select("doc_id"), "doc_id", 64))
  }

  test("exact percentiles are partitioning-invariant") {
    invariant("exactPercentiles")(d =>
      Stats.exactPercentiles(
        d.selectExpr("lang", "size(split(text, ' ')) AS n"),
        Seq("lang"), "n", Seq(0.5, 0.99)))
  }

  test("simhash near-dup pairs are partitioning-invariant") {
    invariant("simhashNearDups")(d =>
      Dedup.simhashNearDups(d, "text", "doc_id", 32, 4, 3))
  }

  test("corpus-filter decisions are partitioning-invariant") {
    invariant("CorpusFilters.decide")(d =>
      graft.ops.CorpusFilters.decide(d, "text", "doc_id", Seq(
        graft.ops.CorpusFilters.MinTokens(20),
        graft.ops.CorpusFilters.AllowLangs(Seq("en", "fr")),
        graft.ops.CorpusFilters.MaxRepetition(0.5))))
  }

  test("k-means assignments are partitioning-invariant (rounded means absorb sum order)") {
    val emb = TestSpark.table("embeddings")
    def run(parts: Int) =
      graft.ops.Clustering.kmeans(emb.repartition(parts), "vec_id", "embedding", 4, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(run(3) == run(23), "kmeans must not depend on partitioning")
  }
}
