package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Deterministic scale-up generator for the `documents` / `embeddings`
  * fixtures: extends the driver corpus's synthesis recipe (uniform
  * 30-word vocab, 10–100 words/doc, 20 round-robin sources, weighted
  * 5-lang mix, ~5% of docs a near-dup of an earlier doc, ~0.2% exact
  * dups, occasional template-chunk splicing — the mechanism behind the
  * observed LSH pair-density growth) to larger scale factors, so the
  * per-regime scaling table in BASELINE.md gets a third decade of
  * evidence without touching the read-only driver fixtures.
  *
  * Usage: `runMain graft.tools.ScaleGen <mult> <outDir>` — generates
  * `mult × sf0.1` rows (5000·mult docs, 2000·mult vectors) into
  * `outDir/documents.parquet` and `outDir/embeddings.parquet`
  * (directories — Spark reads them identically to the driver's single
  * files). Deterministic for a given mult: a single seeded PRNG drives
  * the whole generation, so reruns byte-match.
  *
  * The remaining TPC-H-ish tables are NOT scaled here (the scaling
  * targets are the corpus/vector ops); copy them from sf0.1 so every
  * `SparkEntry.queries` entry still runs against the scaled dir.
  */
object ScaleGen {
  private val Vocab: Array[String] = Array(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch")

  private val Langs: Array[(String, Double)] =
    Array("en" -> 0.41, "zh" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "de" -> 0.14)

  private def pickLang(rng: Random): String = {
    val p = rng.nextDouble()
    var acc = 0.0
    Langs.foreach { case (l, w) => acc += w; if (p < acc) return l }
    Langs.last._1
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <mult> <outDir>")
    val mult = args(0).toInt
    val outDir = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = 5000 * mult
    val rng = new Random(20260401L + mult)

    // --- documents ---------------------------------------------------
    val texts = new ArrayBuffer[String](nDocs)
    var i = 0
    while (i < nDocs) {
      val p = rng.nextDouble()
      val text =
        if (p < 0.05 && texts.nonEmpty) {
          // near-dup of an earlier doc: mutate ~8% of tokens (this is
          // what keeps verified-pair count ∝ docs, the sf0.01→sf0.1
          // observed regime)
          val base = texts(rng.nextInt(texts.length)).split(" ")
          base.map(w =>
            if (rng.nextDouble() < 0.08) Vocab(rng.nextInt(Vocab.length)) else w)
            .mkString(" ")
        } else if (p < 0.052 && texts.nonEmpty) {
          texts(rng.nextInt(texts.length)) // exact dup (~0.2%)
        } else {
          val len = 10 + rng.nextInt(91)
          val words = Array.fill(len)(Vocab(rng.nextInt(Vocab.length)))
          // template splice: share a contiguous chunk with an earlier
          // doc (the boilerplate mechanism behind dup-span detection)
          if (rng.nextDouble() < 0.20 && texts.nonEmpty) {
            val src = texts(rng.nextInt(texts.length)).split(" ")
            if (src.length >= 12) {
              val cl = 8 + rng.nextInt(math.min(13, src.length - 8))
              val from = rng.nextInt(src.length - cl + 1)
              val at = rng.nextInt(math.max(1, words.length - cl))
              System.arraycopy(src, from, words, at, math.min(cl, words.length - at))
            }
          }
          words.mkString(" ")
        }
      texts += text
      i += 1
    }
    val docRows = (0 until nDocs).map { id =>
      val t = texts(id)
      Row(id.toLong, t, pickLang(rng), s"src${id % 20}", t.length.toLong)
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(docRows, 32), docSchema)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // --- embeddings --------------------------------------------------
    // 64-dim unit vectors in 10 weak clusters (per-label mean norm
    // ~0.07 in the driver fixture): v = normalize(0.07·μ_l + g/‖g‖)
    val dims = 64
    val centers = Array.tabulate(10) { l =>
      val cr = new Random(777L + l)
      val c = Array.fill(dims)(cr.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x / n).toFloat)
    }
    val nVecs = 2000 * mult
    val vecRows = (0 until nVecs).map { id =>
      val label = rng.nextInt(10)
      val g = Array.fill(dims)(rng.nextGaussian())
      val gn = math.sqrt(g.map(x => x * x).sum)
      val raw = Array.tabulate(dims)(d => 0.07 * centers(label)(d) + g(d) / gn)
      val rn = math.sqrt(raw.map(x => x * x).sum)
      Row(id.toLong, raw.map(x => (x / rn).toFloat).toSeq, label)
    }
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("label", IntegerType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(vecRows, 32), vecSchema)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    println(s"[scalegen] wrote $nDocs docs + $nVecs vectors to $outDir")
    spark.stop()
  }
}
