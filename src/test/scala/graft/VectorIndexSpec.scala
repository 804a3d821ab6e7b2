package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VectorIndex
import graft.ops.Similarity

class VectorIndexSpec extends AnyFunSuite {
  import TestSpark.spark

  import spark.implicits._

  private val emb = TestSpark.table("embeddings")

  test("build → meta round-trips the index identity; missing index fails cleanly") {
    val dir = TestSpark.tmpDir("vecidx_meta")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    assert(VectorIndex.meta(spark, dir) ==
      VectorIndex.Meta("vec_id", "embedding", 64, 8, 2,
        emb.select("vec_id", "embedding").schema.toDDL))
    val err = intercept[IllegalArgumentException] {
      VectorIndex.meta(spark, TestSpark.tmpDir("vecidx_empty"))
    }
    assert(err.getMessage.contains("no vector index"))
  }

  test("probe == the in-memory trained-IVF pipeline through the storage round-trip") {
    val dir = TestSpark.tmpDir("vecidx_probe")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val q = emb.filter($"vec_id" === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaIndex = rows(VectorIndex.probe(q, dir, k = 10, nprobe = 2))
    val direct = rows(Similarity.ivfTopKTrained(
      emb, q, "vec_id", "embedding", k = 10, nlist = 8, nprobe = 2, iters = 2))
    assert(viaIndex == direct)
    assert(viaIndex.size == 10)
  }

  test("probe scans ONLY the nprobe winning list directories (static partition pruning)") {
    val dir = TestSpark.tmpDir("vecidx_prune")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val probe = VectorIndex.probe(emb.filter($"vec_id" === 0), dir, k = 5, nprobe = 2)
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("lists")).getOrElse("")
    // the list_id IN-filter must land in PartitionFilters (planning-time
    // directory pruning), NOT in the post-scan DataFilters
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    val df = "DataFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(pf.contains("list_id"), s"expected list_id in PartitionFilters:\n$scan")
    assert(!df.contains("list_id"), s"list_id leaked into DataFilters:\n$scan")
  }

  test("delete: probe == the full probe minus forgotten ids (quantizer untouched)") {
    val dir = TestSpark.tmpDir("vecidx_forget")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val q = emb.filter($"vec_id" === 3)
    val full = VectorIndex.probe(q, dir, k = 1000000, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    VectorIndex.delete(
      emb.filter($"vec_id" % 7 === 0).select("vec_id"), dir)
    val after = VectorIndex.probe(q, dir, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // same centroids ⇒ same probed lists ⇒ the scored set just shrank
    assert(after.toSeq == full.filter(_._1 % 7 != 0).take(10).toSeq)
    assert(after.forall(_._1 % 7 != 0))
    // meta (and dims validation) survives the rewrite
    assert(VectorIndex.meta(spark, dir).dims == 64)
  }

  test("dims validation: malformed batches and queries fail loudly") {
    val dir = TestSpark.tmpDir("vecidx_dims")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val short = Seq((777L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val appendErr = intercept[IllegalArgumentException] {
      VectorIndex.append(short, dir)
    }
    assert(appendErr.getMessage.contains("width != index dims"))
    val probeErr = intercept[IllegalArgumentException] {
      VectorIndex.probe(short, dir, k = 5, nprobe = 2)
    }
    assert(probeErr.getMessage.contains("width != index dims"))
  }

  test("append: a new vector enters its list and becomes findable") {
    val dir = TestSpark.tmpDir("vecidx_append")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    // a verbatim copy of vector 0 under a fresh id: lands in the same
    // list, ties vector 0 at cosine 1.0
    val clone = emb.filter($"vec_id" === 0)
      .select(lit(900000L).as("vec_id"), $"embedding")
    VectorIndex.append(clone, dir)
    val top = VectorIndex.probe(emb.filter($"vec_id" === 0), dir, k = 2, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq == Seq((0L, 1.0), (900000L, 1.0)),
      s"appended clone must rank beside the original, got ${top.toSeq}")
  }

  test("append is idempotent: a retried batch overwrites itself, never double-inserts") {
    val dir = TestSpark.tmpDir("vecidx_retry")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val batch = emb.filter($"vec_id" === 0)
      .select(lit(900001L).as("vec_id"), $"embedding")
    VectorIndex.append(batch, dir) // first drain
    VectorIndex.append(batch, dir) // replayed drain (same delta, same tag)
    val hits = VectorIndex.probe(emb.filter($"vec_id" === 0), dir,
        k = 1000000, nprobe = 1)
      .filter($"vec_id" === 900001L).count()
    assert(hits == 1L, s"retried append must not duplicate the vector, got $hits rows")
  }

  test("single-query contract: a multi-row queryDf is rejected, not silently interleaved") {
    val dir = TestSpark.tmpDir("vecidx_guard")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val err = intercept[IllegalArgumentException] {
      VectorIndex.probe(emb.filter($"vec_id" < 2), dir, k = 5, nprobe = 2)
    }
    assert(err.getMessage.contains("probeBatch"))
  }

  test("probeBatch == one probe per query, in one job") {
    val dir = TestSpark.tmpDir("vecidx_batch")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val got = VectorIndex.probeBatch(
        emb.filter($"vec_id" < 3), "vec_id", dir, k = 10, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    val expected = (0L until 3L).flatMap { qid =>
      VectorIndex.probe(emb.filter($"vec_id" === qid), dir, k = 10, nprobe = 2)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1)) }
    }
    assert(got.toSeq == expected)
  }

  test("deleting every vector leaves a valid empty index; appends revive it") {
    val dir = TestSpark.tmpDir("vecidx_empty_all")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    VectorIndex.delete(emb.select("vec_id"), dir)
    val q = emb.filter($"vec_id" === 0)
    assert(VectorIndex.probe(q, dir, k = 10, nprobe = 2).count() == 0L)
    // the frozen quantizer still accepts new batches
    VectorIndex.append(q, dir)
    assert(VectorIndex.probe(q, dir, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("delete dedupes the takedown request; build rejects an empty corpus") {
    val dir = TestSpark.tmpDir("vecidx_del_dup")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    // the same id twice in one request must behave as once
    VectorIndex.delete(Seq(3L, 3L).toDF("vec_id"), dir)
    val left = VectorIndex.probe(emb.filter($"vec_id" === 3), dir,
      k = 1000000, nprobe = 8)
    assert(left.filter($"vec_id" === 3L).count() == 0L)
    val err = intercept[IllegalArgumentException] {
      VectorIndex.build(emb.limit(0), "vec_id", "embedding",
        TestSpark.tmpDir("vecidx_build_empty"), nlist = 8, iters = 2)
    }
    assert(err.getMessage.contains("empty corpus"))
  }

  test("probeThreshold returns ALL matches >= t (no top-k truncation); incremental dedup reasons") {
    val dir = TestSpark.tmpDir("vecidx_thresh")
    VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = 8, iters = 2)
    val q = emb.filter($"vec_id" === 0)
    // every threshold match must appear even when k=1 would truncate:
    // compare against the exhaustive probe at huge k
    val viaK = VectorIndex.probe(q, dir, k = 1000000, nprobe = 2)
      .filter($"cosine_sim" >= 0.1)
      .as[(Long, Double)].collect().toSet
    val viaT = VectorIndex
      .probeThreshold(q.withColumn("qid", $"vec_id"), "qid", dir, 0.1, nprobe = 2)
      .select($"vec_id", $"cosine_sim").as[(Long, Double)].collect().toSet
    assert(viaT == viaK && viaT.nonEmpty)
    // incremental dedup: corpus-dup wins over batch-dup; novel keeps
    def unit(axis: Int, eps: Double): Array[Float] = {
      val v = Array.fill(4)(eps.toFloat); v(axis) = 1.0f; v
    }
    val corpus = Seq((1L, unit(0, 0.0)), (2L, unit(1, 0.0)), (3L, unit(1, 0.002)))
      .toDF("vec_id", "embedding")
    val cdir = TestSpark.tmpDir("vecidx_inc")
    VectorIndex.build(corpus, "vec_id", "embedding", cdir, nlist = 2, iters = 2)
    val batch = Seq(
      (10L, unit(0, 0.001)), // near-copy of corpus 1 → 'corpus'
      (20L, unit(2, 0.0)), // novel axis → keep
      (21L, unit(2, 0.001)) // near-copy of batch 20 → 'batch'
    ).toDF("vec_id", "embedding")
    val got = Similarity.incrementalSemanticDedup(
        batch, "vec_id", "embedding", cdir, threshold = 0.9, nprobe = 2)
      .as[(Long, Option[String], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((Some("corpus"), false)))
    assert(got(20L) == ((None, true)))
    assert(got(21L) == ((Some("batch"), false)))
    // a batch whose embedding column name differs from the index's
    // stored vecCol must probe the SAME vectors (the op aligns the
    // caller's column to the index meta before the probe)
    val renamed = Similarity.incrementalSemanticDedup(
        batch.withColumnRenamed("embedding", "day_emb"),
        "vec_id", "day_emb", cdir, threshold = 0.9, nprobe = 2)
      .as[(Long, Option[String], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(renamed == got, "decisions must not depend on the batch's column name")
  }
}
