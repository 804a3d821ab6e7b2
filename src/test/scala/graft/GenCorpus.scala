package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling-fixture generator (test tooling, like Scratch):
 * `Test/runMain graft.GenCorpus <outDir> <nDocs> <nVecs>` writes
 * `documents.parquet` + `embeddings.parquet` whose statistical regime
 * matches the driver fixture (`FIXTURES.md`: 31-word vocab, 10–100
 * uniform doc length, 5 langs at ~40/15/15/15/15, 20 sources, ~1/625
 * exact-dup rate, unit-norm 64-dim embeddings around 10 cluster
 * centers) so the volume-dominant queries can be measured one decade
 * beyond sf0.1. Everything derives from `xxhash64(id, tag, …)` — no
 * RNG state, so any row is reproducible from its id alone and
 * generation is partitioning-invariant. Near-dups are injected at
 * ~1/500 (a copy of the previous doc with the tail rewritten), giving
 * the LSH/Jaccard paths a linear planted component on top of the
 * chance-collision growth the small vocabulary produces — the same
 * two ingredients the driver corpus shows.
 *
 * Used for BASELINE.md's three-point scaling table only; the oracle
 * gate keeps running on the read-only driver fixtures.
 */
object GenCorpus {

  private val vocab = Seq(
    "spark", "data", "table", "row", "column", "value", "key", "hash",
    "join", "agg", "scan", "sort", "merge", "filter", "group", "order",
    "window", "stream", "batch", "query", "part", "line", "customer",
    "vector", "fast", "slow", "small", "big", "the", "a", ".")

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: GenCorpus <outDir> <nDocs> <nVecs>")
    val (outDir, nDocs, nVecs) = (args(0), args(1).toLong, args(2).toLong)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocabLit = typedlit(vocab)
    def h(id: org.apache.spark.sql.Column, tag: Int) =
      abs(xxhash64(id, lit(tag)))
    // text is a pure function of the SOURCE id, so duplicate injection
    // just evaluates it at a neighbor id — no cross-row dependency
    def textOf(src: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(
        sequence(lit(1), (h(src, 1) % 91 + 10).cast("int")),
        i => element_at(vocabLit, (abs(xxhash64(src, i)) % vocab.size).cast("int") + 1)))

    val ids = spark.range(0, nDocs).toDF("doc_id")
    val base = col("doc_id")
    // ~1/625 verbatim dup of the previous doc; ~1/500 near-dup (same
    // prefix, rewritten 8-word tail via a shifted hash tag)
    val srcId = when(base > 0 && h(base, 2) % 625 === 0, base - 1)
      .when(base > 0 && h(base, 3) % 500 === 0, base - 1)
      .otherwise(base)
    val nearTail = when(
      base > 0 && h(base, 2) % 625 =!= 0 && h(base, 3) % 500 === 0,
      concat_ws(" ", transform(sequence(lit(1), lit(8)),
        i => element_at(vocabLit, (abs(xxhash64(base, i, lit(99))) % vocab.size).cast("int") + 1))))
    val langBucket = h(base, 4) % 20
    val docs = ids.select(
      base,
      when(nearTail.isNotNull, concat(textOf(srcId), lit(" "), nearTail))
        .otherwise(textOf(srcId)).as("text"),
      when(langBucket < 8, "en").when(langBucket < 11, "zh")
        .when(langBucket < 14, "es").when(langBucket < 17, "fr")
        .otherwise("de").as("lang"),
      concat(lit("src"), (h(base, 5) % 20).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")))
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    val dims = 64
    val vids = spark.range(0, nVecs).toDF("vec_id")
    val vid = col("vec_id")
    val label = (h(vid, 6) % 10).cast("int")
    // cluster center ± noise, then L2-normalized (driver fixture is
    // unit-norm); center/noise components are uniform in [-0.5, 0.5)
    def u(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, tag: Int) =
      (abs(xxhash64(a, b, lit(tag))) % 1000).cast("double") / 1000.0 - 0.5
    val raw = transform(sequence(lit(0), lit(dims - 1)),
      d => u(label, d, 7) + u(vid, d, 8) * 0.3)
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    val embs = vids.select(
      vid,
      transform(raw, x => (x / norm).cast("float")).as("embedding"),
      label.as("label"))
    embs.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    println(s"[gencorpus] wrote $nDocs docs + $nVecs vecs to $outDir")
    spark.stop()
  }
}
