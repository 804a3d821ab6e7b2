package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-timing harness for plan investigations (not part of
  * the driver surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val filters = graft.config.PipelineConfig.parseCorpusFilters("""corpus_filters:
      |  - filter: min_tokens
      |    min: 20
      |  - filter: max_tokens
      |    max: 100000
      |  - filter: languages
      |    allow: ["en", "fr", "es"]
      |  - filter: min_quality
      |    min: 0.3
      |  - filter: max_repetition
      |    max: 0.5
      |""".stripMargin)
    t("tokens-only") {
      docs.filter(graft.ops.TextOps.tokenCount(col("text")).between(20, 100000)).count()
    }
    t("langid-only") {
      docs.filter(graft.ops.TextOps.langId(col("text")).isin("en", "fr", "es")).count()
    }
    t("quality-only") {
      docs.filter(graft.ops.TextOps.qualityScore(col("text")) >= 0.3).count()
    }
    t("repetition-only") {
      docs.filter(graft.ops.TextOps.duplicateShingleRatio(col("text"), 3) <= 0.5).count()
    }
    t("decide-only") {
      graft.ops.CorpusFilters.decide(docs, "text", "doc_id", filters)
        .filter(col("kept")).select("doc_id").count()
    }
    spark.stop()
  }
}
